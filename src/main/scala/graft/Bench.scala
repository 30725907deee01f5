package graft
import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.codec.ConnectJson
import graft.core.Tables
import graft.operators.Relational

/** Per-round benchmark: runs every registered query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query wall
  * seconds — the MEDIAN of 3 timed runs each (`n_runs`/`stat` fields;
  * `wall_sec` carries the honest end-to-end cost of the whole timed
  * section). Results are materialized through the noop sink (full
  * execution incl. result production — `count()` alone lets Spark skip
  * projections); failed queries are reported in `failed`, never as
  * fake timings.
  *
  * An untimed warm-up pass runs the full set first, so the timed pass
  * measures steady-state plans instead of charging JVM/codegen/parquet-
  * footer warm-up to whichever query sorts first (BENCH_r03's q01
  * absorbed ~5 s of it).
  *
  * `throughput_rps` is the ingest micro-bench: events rows through the
  * reference's JDBC-source task shape — mask SMT + Connect JSON envelope
  * encode + parquet file sink (SURVEY §3.2) — giving BASELINE.md's
  * 2.98–4.04 kops/s Source Record Write rate a measured counterpart. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Optional arg: comma-separated query names to bench (dev loop —
    // timing one operator's change without the full 100-query sweep).
    val queries = {
      val all = SparkEntry.queries.toSeq.sortBy(_._1)
      if (args.isEmpty) all
      else {
        val only = args(0).split(",").toSet
        val known = all.map(_._1).toSet
        val unknown = only.diff(known)
        require(unknown.isEmpty,
          s"unknown query name(s): ${unknown.toSeq.sorted.mkString(",")} — " +
            "a typo here would silently bench a partial set")
        all.filter { case (n, _) => only(n) }
      }
    }

    // Drop state a query leaves behind: the dedup/CC family localCheckpoints
    // shingle/edge RDDs that linger in the block manager until GC. Inside a
    // 68-query JVM those blocks accumulate and taxed later queries 4-5×
    // (BENCH_r06 q55/q56 recorded ~8 s vs ~2 s isolated). Scrubbing between
    // queries (never inside a timed window) makes each measurement
    // approximate an isolated run.
    def scrub(): Unit = {
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      spark.catalog.clearCache()
      System.gc()
    }

    var failed = List.empty[String]

    // -------- ingest throughput FIRST, before the query sweep ages the
    // JVM: measured in-run-after-124-queries vs isolated on the same box,
    // the identical best-of-3 read 187 k vs 235 k rows/s — code-cache and
    // GC aging taxed the pass by ~25% even with the scrub. Running it
    // first (its own warm-up + scrub unchanged) keeps the official
    // number at the isolated-run standard the bench documents.
    // (mask + envelope encode + parquet sink; best of 3 with an untimed
    // warm-up write and a scrub before every timed pass. BENCH_r07's
    // official number halved vs the round's clean sweep run because
    // best-of-2 with no scrub let whatever shared the box tax both
    // passes; the count() warm-up keeps parquet footer reads and the
    // first-touch page cache outside every timed window.)
    val throughput = try {
      val out = Files.createTempDirectory("graft-ingest-bench").toString
      val events = Tables.events(spark, sfDir)
      val rows = events.count()
      def once(): Double = {
        val t0 = System.nanoTime()
        Relational.maskColumn(events, "props")
          .select(ConnectJson.encodeEnvelope(
            events.schema, "events").as("value"))
          .write.mode("overwrite").parquet(out)
        rows / ((System.nanoTime() - t0) / 1e9)
      }
      once() // untimed warm-up: codegen + shuffle-free plan compile
      Seq.fill(3) { scrub(); once() }.max
    } catch {
      case e: Throwable =>
        System.err.println(s"[bench] ingest throughput FAILED: ${e.getMessage}")
        failed ::= "ingest_throughput"
        0.0
    }

    // -------- warm-up pass (untimed; failures deferred to the timed pass)
    queries.foreach { case (_, fn) =>
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
      scrub()
    }

    // -------- timed passes: MEDIAN of 3 per query (single runs on a
    // busy shared box show multi-second GC/scheduling outliers —
    // BENCH_r05 recorded one query 10× over its quiet-box time even at
    // min-of-2, and r12's two same-box full runs disagreed up to 2.2×
    // per query; the median rejects one outlier in either direction
    // where min systematically flatters). The honest end-to-end cost
    // is reported separately as `wall_sec` (the whole timed section,
    // all runs + scrubs included).
    val wallT0 = System.nanoTime()
    val results = queries.flatMap { case (name, fn) =>
      def once(): Option[Double] = {
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          Some((System.nanoTime() - t0) / 1e9)
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            None
        }
      }
      val runs = Seq(once(), once(), once()).flatten.sorted
      scrub() // this query's checkpoints must not tax the next query
      if (runs.isEmpty) { failed ::= name; None }
      else {
        if (runs.length < 3) failed ::= name
        // median of what survived: mid of 3, lower-mid of 2, the 1
        Some(name -> runs((runs.length - 1) / 2))
      }
    }
    val wallSec = (System.nanoTime() - wallT0) / 1e9

    // keep the one-line JSON compact (3 decimals ≈ ms precision): the
    // driver's capture window truncated the head of BENCH_r06's longer line
    def f3(d: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, d)
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f3(v) }
      .mkString("{", ",", "}")
    val fj = failed.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).sum
    val line = s"""{"metric":"total","value":${f3(total)},"unit":"sec","n_runs":3,"stat":"median","wall_sec":${f3(wallSec)},"queries":$qs,"failed":$fj,"throughput_rps":${f3(throughput)},"sf":"$sfDir"}"""
    println(line)
    // Truncation-proof artifact: the driver's stdout capture has clipped
    // the tail of longer lines (BENCH_r08 kept per-query times for only
    // 73/106 queries), so the full line also lands in a file the repo
    // commits. Overridable for per-round snapshots (bench_full_rN.json).
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_full.json")
    try Files.writeString(java.nio.file.Paths.get(outFile), line + "\n")
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $outFile: ${e.getMessage}")
    }
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
