package graft.core

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files

import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

/** The reference's curl workflow against the REST facade: create via
  * POST, watch status, pause/resume/restart, reject bad configs with
  * the old pipeline kept running, delete. */
class RestFacadeSpec extends SparkTestBase with Matchers {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private val http = HttpClient.newHttpClient()

  private def req(method: String, url: String, body: String = ""): HttpResponse[String] = {
    val b = HttpRequest.newBuilder(URI.create(url))
    val withBody =
      if (body.isEmpty) b.method(method, HttpRequest.BodyPublishers.noBody())
      else b.method(method, HttpRequest.BodyPublishers.ofString(body))
    http.send(withBody.build(), HttpResponse.BodyHandlers.ofString())
  }

  private def specJson(name: String, inDir: String, ckpt: String, outDir: String): String =
    s"""{
       |  "name": "$name",
       |  "source": {"type": "file", "options": {
       |    "format": "parquet", "path": "$inDir",
       |    "schema": "id BIGINT, secret STRING"}},
       |  "transforms": [{"type": "mask", "options": {"field": "secret"}}],
       |  "sink": {"type": "file", "options": {
       |    "format": "parquet", "path": "$outDir", "checkpoint": "$ckpt",
       |    "trigger.ms": "50"}}
       |}""".stripMargin

  test("full curl lifecycle: POST, status, pause/resume/restart, bad config 400, DELETE") {
    val ss = spark
    import ss.implicits._
    val inDir = tmp("graft-rest-in")
    val ckpt = tmp("graft-rest-ckpt")
    val out = tmp("graft-rest-out")
    Seq((1L, "s1")).toDF("id", "secret").write.mode("overwrite").parquet(inDir)

    val reg = new PipelineRegistry(spark)
    val facade = new RestFacade(reg)
    facade.start()
    val base = s"http://127.0.0.1:${facade.boundPort}/connectors"
    try {
      req("GET", base).body() shouldBe "[]"

      val created = req("POST", base, specJson("p1", inDir, ckpt, out))
      created.statusCode() shouldBe 201
      created.body() shouldBe """{"name":"p1"}"""
      req("GET", base).body() shouldBe """["p1"]"""
      req("GET", s"$base/p1/status").body() shouldBe
        """{"name":"p1","state":"RUNNING"}"""
      reg.drain("p1") shouldBe true
      spark.read.parquet(out).count() shouldBe 1

      // POST is create-only: re-POSTing a live name is 409 Conflict
      // (Connect semantics — replacement goes through PUT .../config)
      req("POST", base, specJson("p1", inDir, ckpt, out))
        .statusCode() shouldBe 409
      req("GET", s"$base/p1/status").body() should include("RUNNING")

      // name mismatch and unparseable config are 400s; the running
      // pipeline is untouched either way (registry validate-first)
      req("PUT", s"$base/other/config",
        specJson("p1", inDir, ckpt, out)).statusCode() shouldBe 400
      req("POST", base, """{"name": "p2", "source": {}}""")
        .statusCode() shouldBe 400
      val badTransform = specJson("p1", inDir, ckpt, out)
        .replace("\"mask\"", "\"no_such_transform\"")
      req("PUT", s"$base/p1/config", badTransform).statusCode() shouldBe 400
      req("GET", s"$base/p1/status").body() should include("RUNNING")

      // Connect's expanded listing: map name → requested objects
      val expanded = req("GET", s"$base?expand=info,status")
      expanded.statusCode() shouldBe 200
      expanded.body() should startWith("""{"p1":{"info":{"name":"p1","config":{""")
      expanded.body() should include(""""status":{"name":"p1","state":"RUNNING"}""")
      val statusOnly = req("GET", s"$base?expand=status").body()
      statusOnly should include(""""status"""")
      (statusOnly should not).include(""""info"""")
      // unknown expand keys are ignored, Connect-style
      req("GET", s"$base?expand=bogus").body() shouldBe """{"p1":{}}"""

      // GET config is PUT-able back verbatim (fromJson∘toJson identity)
      val cfg = req("GET", s"$base/p1/config")
      cfg.statusCode() shouldBe 200
      PipelineSpec.fromJson(cfg.body()) shouldBe
        PipelineSpec.fromJson(specJson("p1", inDir, ckpt, out))
      req("PUT", s"$base/p1/config", cfg.body()).statusCode() shouldBe 200
      req("GET", s"$base/p1").body() should startWith("""{"name":"p1","config":{""")
      req("GET", s"$base/nope").statusCode() shouldBe 404

      req("PUT", s"$base/p1/pause").statusCode() shouldBe 202
      req("GET", s"$base/p1/status").body() should include("PAUSED")
      req("PUT", s"$base/p1/resume").statusCode() shouldBe 202
      req("GET", s"$base/p1/status").body() should include("RUNNING")
      req("POST", s"$base/p1/restart").statusCode() shouldBe 204
      req("GET", s"$base/p1/status").body() should include("RUNNING")

      // unknown names: 404 across the lifecycle
      req("GET", s"$base/nope/status").statusCode() shouldBe 404
      req("PUT", s"$base/nope/pause").statusCode() shouldBe 404
      req("PUT", s"$base/nope/resume").statusCode() shouldBe 404
      req("POST", s"$base/nope/restart").statusCode() shouldBe 404
      req("DELETE", s"$base/nope").statusCode() shouldBe 404

      req("DELETE", s"$base/p1").statusCode() shouldBe 204
      req("GET", s"$base/p1/status").statusCode() shouldBe 404
      req("GET", base).body() shouldBe "[]"
    } finally facade.close()
  }

  test("corpus-prep by config: dedup_exact -> quality_gate -> lang_id " +
    "-> hash_sample -> upsert sink, submitted as JSON over HTTP") {
    val ss = spark
    import ss.implicits._
    val inDir = tmp("graft-prep-in")
    val ckpt = tmp("graft-prep-ckpt")
    val out = tmp("graft-prep-out")
    Seq(
      // a replayed record (at-least-once delivery): dedup drops it
      (1L, "the cat sat on the mat today", java.sql.Timestamp.valueOf("2024-01-01 00:00:00")),
      (1L, "the cat sat on the mat today", java.sql.Timestamp.valueOf("2024-01-01 00:00:01")),
      (3L, "el gato y la casa y los perros", java.sql.Timestamp.valueOf("2024-01-01 00:00:02")),
      // all stopwords: the quality gate drops it
      (4L, "the a of and in to is", java.sql.Timestamp.valueOf("2024-01-01 00:00:03")))
      .toDF("doc_id", "text", "ts").coalesce(1)
      .write.mode("overwrite").parquet(inDir)

    val prepSpec =
      s"""{
         |  "name": "prep1",
         |  "source": {"type": "file", "options": {
         |    "format": "parquet", "path": "$inDir",
         |    "schema": "doc_id BIGINT, text STRING, ts TIMESTAMP"}},
         |  "transforms": [
         |    {"type": "dedup_exact", "options": {"id.field": "doc_id", "text.field": "text",
         |      "watermark.field": "ts", "watermark.delay": "10 seconds"}},
         |    {"type": "quality_gate", "options": {"text.field": "text", "min.tokens": "3"}},
         |    {"type": "lang_id", "options": {"text.field": "text", "as": "predicted"}},
         |    {"type": "hash_sample", "options": {"id.field": "doc_id", "permille": "1000"}}],
         |  "sink": {"type": "upsert", "options": {
         |    "path": "$out", "pk": "doc_id", "order": "ts",
         |    "checkpoint": "$ckpt", "trigger.ms": "50"}}
         |}""".stripMargin

    val reg = new PipelineRegistry(spark)
    val facade = new RestFacade(reg)
    facade.start()
    val base = s"http://127.0.0.1:${facade.boundPort}/connectors"
    try {
      // the plugin catalog advertises the corpus-prep vocabulary
      val plugins = req("GET",
        s"http://127.0.0.1:${facade.boundPort}/connector-plugins")
      Seq("dedup_exact", "quality_gate", "lang_id", "hash_sample")
        .foreach { s =>
          plugins.body() should include(s"""{"class":"$s","type":"transform"}""")
        }

      val created = req("POST", base, prepSpec)
      created.statusCode() shouldBe 201
      reg.drain("prep1") shouldBe true

      val table = new graft.sinks.ParquetKeyedTable(out, Seq("doc_id"))
        .read(spark).get
      val rows = table.select("doc_id", "predicted")
        .as[(Long, String)].collect().sorted
      // replay collapsed, stopword doc gated out, labels attached
      rows shouldBe Seq((1L, "en"), (3L, "es"))
    } finally facade.close()
  }

  test("KIP-875 offsets: GET reads the checkpoint, DELETE resets only when paused") {
    val ss = spark
    import ss.implicits._
    val inDir = tmp("graft-off-in")
    val ckpt = tmp("graft-off-ckpt")
    val out = tmp("graft-off-out")
    Seq((1L, "s1"), (2L, "s2")).toDF("id", "secret")
      .write.mode("overwrite").parquet(inDir)

    val reg = new PipelineRegistry(spark)
    val facade = new RestFacade(reg)
    facade.start()
    val base = s"http://127.0.0.1:${facade.boundPort}/connectors"
    try {
      req("POST", base, specJson("p_off", inDir, ckpt, out)).statusCode() shouldBe 201
      reg.drain("p_off") shouldBe true
      spark.read.parquet(out).count() shouldBe 2

      val got = req("GET", s"$base/p_off/offsets")
      got.statusCode() shouldBe 200
      got.body() should include(""""name":"p_off"""")
      got.body() should include(""""batchId":0""")
      got.body() should include(""""committed":true""")
      got.body() should include(""""offsets":[{"source":0,""")

      // a second input file advances the committed position to batch 1
      Seq((3L, "s3")).toDF("id", "secret").write.mode("append").parquet(inDir)
      reg.drain("p_off") shouldBe true
      req("GET", s"$base/p_off/offsets").body() should include(""""batchId":1""")

      // Connect's precondition: resetting a RUNNING connector is 400
      req("DELETE", s"$base/p_off/offsets").statusCode() shouldBe 400

      req("PUT", s"$base/p_off/pause").statusCode() shouldBe 202
      req("DELETE", s"$base/p_off/offsets").statusCode() shouldBe 200
      // the checkpoint is gone: a fresh GET reports the empty position
      req("GET", s"$base/p_off/offsets").body() should include(""""batchId":-1""")
      // resume restarts from a clean slate: the whole input re-plans as
      // batch 0 of a NEW offsets log (down from 1 — the reset is visible
      // in the durable position, not in duplicate rows: the file sink's
      // own _spark_metadata log deduplicates the re-delivery, which is
      // Spark's exactly-once guarantee composing with at-least-once
      // source replay)
      req("PUT", s"$base/p_off/resume").statusCode() shouldBe 202
      reg.drain("p_off") shouldBe true
      val after = req("GET", s"$base/p_off/offsets").body()
      after should include(""""batchId":0""")
      after should include(""""committed":true""")

      req("GET", s"$base/nope/offsets").statusCode() shouldBe 404
      req("DELETE", s"$base/nope/offsets").statusCode() shouldBe 404
    } finally facade.close()
  }

  test("root, tasks and KIP-558 topics: the remaining Connect read surface") {
    val ss = spark
    import ss.implicits._
    val inDir = tmp("graft-task-in")
    val out = tmp("graft-task-out")
    Seq((1L, "s1")).toDF("id", "secret").write.mode("overwrite").parquet(inDir)

    val reg = new PipelineRegistry(spark)
    val facade = new RestFacade(reg)
    facade.start()
    val root = s"http://127.0.0.1:${facade.boundPort}"
    val base = s"$root/connectors"
    try {
      // Connect root: version info, null cluster id (no broker here)
      val info = req("GET", root + "/")
      info.statusCode() shouldBe 200
      info.body() should include(""""kafka_cluster_id":null""")
      info.body() should include(""""version":""")
      // the "/" context is the longest-prefix fallthrough: unknown → 404
      req("GET", s"$root/no-such-route").statusCode() shouldBe 404

      req("POST", base,
        specJson("t1", inDir, tmp("graft-task-ck"), out)).statusCode() shouldBe 201

      // single-task model: exactly one task whose config is the
      // connector config
      val tasks = req("GET", s"$base/t1/tasks")
      tasks.statusCode() shouldBe 200
      tasks.body() should startWith("""[{"id":{"connector":"t1","task":0},"config":""")
      tasks.body() should include(""""name":"t1"""")

      val st = req("GET", s"$base/t1/tasks/0/status")
      st.statusCode() shouldBe 200
      st.body() should include(""""id":0""")
      st.body() should include(""""state":"RUNNING"""")
      st.body() should include(""""worker_id"""")
      req("GET", s"$base/t1/tasks/7/status").statusCode() shouldBe 404

      // task restart = pipeline restart (the one task IS the query)
      req("POST", s"$base/t1/tasks/0/restart").statusCode() shouldBe 204
      req("GET", s"$base/t1/status").body() should include("RUNNING")

      // KIP-558 topics: the endpoints the spec reads and writes
      val topics = req("GET", s"$base/t1/topics")
      topics.statusCode() shouldBe 200
      topics.body() shouldBe s"""{"t1":{"topics":["$inDir","$out"]}}"""
      req("PUT", s"$base/t1/topics/reset").statusCode() shouldBe 200
      req("GET", s"$base/nope/tasks").statusCode() shouldBe 404
      req("GET", s"$base/nope/topics").statusCode() shouldBe 404
    } finally {
      try reg.delete("t1") finally facade.close()
    }
  }

  test("admin/loggers: read and set live log levels, KIP-495 shape") {
    val reg = new PipelineRegistry(spark)
    val facade = new RestFacade(reg)
    facade.start()
    val root = s"http://127.0.0.1:${facade.boundPort}"
    try {
      // the listing starts with just the root logger
      val before = req("GET", s"$root/admin/loggers")
      before.statusCode() shouldBe 200
      before.body() should startWith("""{"root":{"level":""")

      // set a specific logger and see log4j2 agree
      val put = req("PUT", s"$root/admin/loggers/graft.test.dynamic",
        """{"level":"DEBUG"}""")
      put.statusCode() shouldBe 200
      put.body() shouldBe """["graft.test.dynamic"]"""
      org.apache.logging.log4j.LogManager.getLogger("graft.test.dynamic")
        .getLevel.toString shouldBe "DEBUG"
      req("GET", s"$root/admin/loggers/graft.test.dynamic").body() shouldBe
        """{"level":"DEBUG"}"""
      // it now appears in the listing alongside root
      req("GET", s"$root/admin/loggers").body() should
        include(""""graft.test.dynamic":{"level":"DEBUG"}""")

      // bad level and bad route
      req("PUT", s"$root/admin/loggers/graft.test.dynamic",
        """{"level":"LOUD"}""").statusCode() shouldBe 400
      req("DELETE", s"$root/admin/loggers").statusCode() shouldBe 405
    } finally facade.close()
  }

  test("connector-plugins: GET lists the stage vocabulary, PUT validate dry-runs a config") {
    val ss = spark
    import ss.implicits._
    val inDir = tmp("graft-plug-in")
    Seq((1L, "s1")).toDF("id", "secret").write.mode("overwrite").parquet(inDir)

    val reg = new PipelineRegistry(spark)
    val facade = new RestFacade(reg)
    facade.start()
    val root = s"http://127.0.0.1:${facade.boundPort}"
    try {
      val plugins = req("GET", s"$root/connector-plugins")
      plugins.statusCode() shouldBe 200
      plugins.body() should include("""{"class":"file","type":"source"}""")
      plugins.body() should include("""{"class":"regex_router","type":"transform"}""")
      plugins.body() should include("""{"class":"jdbc_upsert","type":"sink"}""")

      // a clean spec validates with zero errors — and starts nothing
      val good = specJson("v1", inDir, tmp("graft-plug-ck"), tmp("graft-plug-out"))
      val ok = req("PUT", s"$root/connector-plugins/pipeline/config/validate", good)
      ok.statusCode() shouldBe 200
      ok.body() should include(""""error_count":0""")
      req("GET", s"$root/connectors").body() shouldBe "[]" // dry run

      // one round trip reports BOTH a bad transform and a bad sink
      val bad = good.replace("\"mask\"", "\"no_such_transform\"")
        .replace("\"file\", \"options\": {\n    \"format\": \"parquet\", \"path\"", "\"file\", \"options\": {\"path\"")
        .replace(""""sink": {"type": "file"""", """"sink": {"type": "no_such_sink"""")
      val res = req("PUT", s"$root/connector-plugins/pipeline/config/validate", bad)
      res.statusCode() shouldBe 200
      res.body() should include(""""error_count":2""")
      res.body() should include("no_such_transform")
      res.body() should include("no_such_sink")

      // unparseable body is a 400, unknown route 405
      req("PUT", s"$root/connector-plugins/pipeline/config/validate", "{nope")
        .statusCode() shouldBe 400
      req("GET", s"$root/connector-plugins/pipeline").statusCode() shouldBe 405
    } finally facade.close()
  }
}
