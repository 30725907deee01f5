package graft.sources

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.time.Duration
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.HttpServer
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

/** S7 end-to-end: a real HTTP GET loop against a live (embedded JDK)
  * server shaped like the reference's FastAPI metrics app, landing
  * bodies into the spool dir the file-landed source parses. */
class HttpScrapeSpec extends SparkTestBase with Matchers {

  /** fastapi/main.py:18-63-shaped exposition body; the counter advances
    * per scrape so successive scrape files are distinguishable. */
  private def body(hits: Int): String =
    s"""# HELP app_request_count Total requests
       |# TYPE app_request_count counter
       |app_request_count $hits
       |# TYPE app_temperature gauge
       |app_temperature 21.5
       |kafka_connect_worker_task_count{connector="jdbc",status="running"} 3
       |""".stripMargin

  private def withServer[A](f: (String, AtomicInteger) => A): A = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val hits = new AtomicInteger(0)
    server.createContext("/metrics", ex => {
      val b = body(hits.incrementAndGet()).getBytes(StandardCharsets.UTF_8)
      ex.sendResponseHeaders(200, b.length)
      ex.getResponseBody.write(b)
      ex.close()
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}/metrics", hits)
    finally server.stop(0)
  }

  test("scrapeOnce lands one parseable file per target, atomically named") {
    withServer { (url, _) =>
      val spool = Files.createTempDirectory("graft-scrape").toString
      val (loop, source) = HttpScrapeLoop.withSource(
        Seq(HttpScrapeLoop.Target("app", url),
            HttpScrapeLoop.Target("worker", url)),
        spool, Duration.ofMillis(50))
      try {
        val landed = loop.scrapeOnce()
        landed.length shouldBe 2
        landed.map(_.getFileName.toString).foreach { n =>
          n should fullyMatch regex "(app|worker)-\\d+-\\d+\\.prom"
        }
        // no temp droppings: everything visible is a finished scrape
        val visible = Files.list(landed.head.getParent).iterator()
        visible.forEachRemaining { p =>
          p.getFileName.toString should not startWith "."
        }
        val parsed = source.batch(spark)
        parsed.count() shouldBe 6 // 3 samples x 2 targets
        parsed.filter("name = 'app_request_count'").count() shouldBe 2
        loop.lastErrors shouldBe empty
      } finally loop.close()
    }
  }

  test("started loop scrapes repeatedly until closed; down target is skipped, not fatal") {
    withServer { (url, hits) =>
      val spool = Files.createTempDirectory("graft-scrape").toString
      val loop = new HttpScrapeLoop(
        Seq(HttpScrapeLoop.Target("app", url),
            // unroutable RFC5737 address: connect fails fast-ish; the
            // loop must keep scraping the healthy target regardless
            HttpScrapeLoop.Target("down", "http://127.0.0.1:1/metrics")),
        // 2 s timeout: tight enough to fail the unroutable target fast
        // (connect refuses immediately anyway), loose enough that the
        // healthy target's scrape doesn't time out on a loaded box —
        // a transient app timeout on the LAST tick before close left
        // its (correctly last-attempt-scoped) error visible and failed
        // the old strict equality assert below.
        spool, Duration.ofMillis(50), timeout = Duration.ofMillis(2000))
      try {
        loop.start()
        loop.start() // idempotent
        // Wait on LANDED FILES, not server hits: close() may interrupt a
        // scrape after the server counted the request but before its
        // file lands (atomic landing means it simply doesn't land), so
        // a hits-based wait can close with only 2 files on a loaded box.
        def appFiles(): Long = Files.list(java.nio.file.Paths.get(spool))
          .filter(p => p.getFileName.toString.startsWith("app-")).count()
        val deadline = System.nanoTime() + 20e9.toLong
        while (appFiles() < 3 && System.nanoTime() < deadline) Thread.sleep(20)
        hits.get() should be >= 3
        loop.close()
        val afterClose = hits.get()
        Thread.sleep(200)
        hits.get() shouldBe afterClose // loop really stopped
        // healthy target landed >= 3 files; down target landed none
        val names = Files.list(java.nio.file.Paths.get(spool)).iterator()
        var app = 0; var down = 0
        names.forEachRemaining { p =>
          val n = p.getFileName.toString
          if (n.startsWith("app-")) app += 1
          if (n.startsWith("down-")) down += 1
        }
        app should be >= 3
        down shouldBe 0
        // the down target must carry an error; the app target USUALLY
        // has none, but a transient timeout on the final tick is not a
        // product defect (errors are last-attempt-scoped and would
        // clear on the next success) — so assert containment, not
        // equality
        loop.lastErrors.keySet should contain("down")
      } finally loop.close()
    }
  }
}
