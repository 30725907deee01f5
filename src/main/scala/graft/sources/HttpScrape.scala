package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.time.Duration
import java.util.concurrent.atomic.AtomicLong
import java.util.concurrent.{Executors, ScheduledExecutorService, TimeUnit}

/**
 * S7: the scrape loop itself. The reference runs Prometheus with
 * `scrape_interval: 5s` against an HTTP metrics endpoint
 * (prometheus/prometheus.yml:2-4,34-37; fastapi/main.py:18-63 renders the
 * exposition text). This is the engine-side counterpart: a periodic GET
 * per target whose response bodies land as files in the spool directory
 * `PromTextSource` reads — so the already-gated parse/relabel/aggregate
 * pipeline (q33/q45/q50) runs unchanged, batch or streaming.
 *
 * Landing protocol (the part Spark cares about): each body is written to
 * a dot-prefixed temp file in the SAME directory, then atomically renamed
 * into place. Spark's file sources ignore `.`/`_`-prefixed files, and an
 * atomic same-directory rename means a concurrent FileStreamSource can
 * never list a partially-written scrape. File names are
 * `<job>-<epochMillis>-<seq>.prom`: job identity stays recoverable via
 * `input_file_name()` without touching the body, mirroring Prometheus's
 * scrape-time `job`/`instance` labels.
 *
 * Control-plane only: one driver-side thread and one tiny GET per target
 * per tick — data-plane scale (parsing millions of samples) stays in the
 * distributed parse, exactly like the reference where Prometheus's own
 * scraper is a single process in front of the TSDB.
 */
final class HttpScrapeLoop(
    targets: Seq[HttpScrapeLoop.Target],
    spoolDir: String,
    interval: Duration,
    timeout: Duration = Duration.ofSeconds(10)) extends AutoCloseable {

  require(targets.nonEmpty, "at least one scrape target")

  private val client = HttpClient.newBuilder()
    .connectTimeout(timeout)
    .followRedirects(HttpClient.Redirect.NORMAL)
    .build()
  private val seq = new AtomicLong(0)
  @volatile private var scheduler: Option[ScheduledExecutorService] = None

  /** One scrape pass over every target; returns the landed files.
    * A failed target is skipped (scrape loops tolerate down targets —
    * the next tick retries); failures surface in `lastErrors`. */
  def scrapeOnce(): Seq[Path] = {
    val dir = Paths.get(spoolDir)
    Files.createDirectories(dir)
    targets.flatMap { t =>
      try {
        val req = HttpRequest.newBuilder(URI.create(t.url))
          .timeout(timeout).GET().build()
        val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
        if (resp.statusCode() / 100 != 2)
          throw new java.io.IOException(s"HTTP ${resp.statusCode()}")
        val n = seq.incrementAndGet()
        val fin = dir.resolve(s"${t.job}-${System.currentTimeMillis()}-$n.prom")
        val tmp = dir.resolve(s".${fin.getFileName}.tmp")
        Files.write(tmp, resp.body().getBytes(StandardCharsets.UTF_8))
        Files.move(tmp, fin, StandardCopyOption.ATOMIC_MOVE)
        errors.remove(t.job)
        Some(fin)
      } catch {
        case e: Exception =>
          errors.put(t.job, s"${e.getClass.getSimpleName}: ${e.getMessage}")
          None
      }
    }
  }

  private val errors = new java.util.concurrent.ConcurrentHashMap[String, String]

  /** Last error per job name, cleared on the next successful scrape. */
  def lastErrors: Map[String, String] = {
    import scala.jdk.CollectionConverters._
    errors.asScala.toMap
  }

  /** Start the periodic loop (idempotent). First scrape fires immediately,
    * like Prometheus's initial scrape on target discovery. */
  def start(): Unit = synchronized {
    if (scheduler.isEmpty) {
      val s = Executors.newSingleThreadScheduledExecutor { r =>
        val th = new Thread(r, "graft-scrape-loop"); th.setDaemon(true); th
      }
      // The tick body must never throw: per ScheduledExecutorService
      // contract an escaping throwable (e.g. createDirectories on a
      // full/unwritable spool disk) would cancel the schedule and the
      // loop would die silently. Record it under a reserved key instead
      // and let the next tick retry, like a down target.
      s.scheduleAtFixedRate(() => {
        try {
          scrapeOnce(): Unit
          errors.remove(HttpScrapeLoop.LoopErrorKey): Unit
        } catch {
          case t: Throwable =>
            errors.put(HttpScrapeLoop.LoopErrorKey,
              s"${t.getClass.getSimpleName}: ${t.getMessage}"): Unit
        }
      }, 0, math.max(1, interval.toMillis), TimeUnit.MILLISECONDS)
      scheduler = Some(s)
    }
  }

  override def close(): Unit = synchronized {
    scheduler.foreach { s =>
      s.shutdownNow(): Unit
      s.awaitTermination(5, TimeUnit.SECONDS): Unit
    }
    scheduler = None
  }
}

object HttpScrapeLoop {
  /** Reserved `lastErrors` key for failures of the scrape tick itself
    * (spool-dir I/O, OOM-adjacent errors) as opposed to a per-target
    * fetch failure. Never collides with a job name via the `__` prefix. */
  val LoopErrorKey = "__scrape_loop"

  /** A scrape target: `job` names the target in landed file names
    * (Prometheus `job_name`), `url` is the full metrics endpoint. */
  final case class Target(job: String, url: String)

  /** Loop + file-landed source over the same spool dir, pre-wired: the
    * common deployment shape (scrape loop feeding the streaming parse). */
  def withSource(targets: Seq[Target], spoolDir: String, interval: Duration)
      : (HttpScrapeLoop, PromTextSource) =
    (new HttpScrapeLoop(targets, spoolDir, interval),
      PromTextSource(spoolDir))
}
