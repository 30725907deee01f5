package graft.core

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase
import graft.codec.ConnectJson
import graft.sources.{IncrementalPollSource, KafkaRelaySource}

/** Control-plane spec model + sources: JSON config → running pipeline
  * (§3.1), incremental hwm polling (S1/S2), Kafka relay plumbing (S6). */
class PipelineSpecTest extends SparkTestBase with Matchers {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("PipelineSpec.fromJson parses the connector-shaped config") {
    val spec = PipelineSpec.fromJson(
      """{
        |  "name": "users-masked",
        |  "source": {"type": "file", "options": {"path": "/in", "schema": "id BIGINT, name STRING"}},
        |  "transforms": [
        |    {"type": "mask", "options": {"field": "name"}},
        |    {"type": "filter", "options": {"predicate": "id > 10"}}
        |  ],
        |  "sink": {"type": "file", "options": {"path": "/out", "checkpoint": "/ckpt"}}
        |}""".stripMargin)
    spec.name shouldBe "users-masked"
    spec.source.stageType shouldBe "file"
    spec.transforms.map(_.stageType) shouldBe Seq("mask", "filter")
    spec.sink.option("path") shouldBe "/out"
    an[IllegalArgumentException] should be thrownBy spec.sink.option("nope")
  }

  test("KafkaRelaySource assembles reader/writer options (config-gated, S6)") {
    val relay = KafkaRelaySource("broker1:9092", "events.*",
      maxOffsetsPerTrigger = Some(10000L))
    relay.readerOptions("kafka.bootstrap.servers") shouldBe "broker1:9092"
    relay.readerOptions("subscribe") shouldBe "events.*"
    relay.readerOptions("maxOffsetsPerTrigger") shouldBe "10000"
    relay.readerOptions("includeHeaders") shouldBe "true"
    relay.writerOptions("broker2:9092")("kafka.bootstrap.servers") shouldBe "broker2:9092"
  }

  test("JdbcSource assembles pushed-down poll queries and chunked readers (S1-S3, gated)") {
    import graft.sources.JdbcSource
    val src = JdbcSource("jdbc:postgresql://db:5432/app", "users",
      "u", "p", hwmCol = Some("updated_at"),
      partitionColumn = Some("id"), lowerBound = Some(0L),
      upperBound = Some(1000000L), numPartitions = 8)
    // bulk mode: plain table
    src.pollQuery(None) shouldBe "users"
    // incremental: predicate pushed into a DB-side subquery
    src.pollQuery(Some("2024-01-01 00:00:00")) shouldBe
      "(SELECT * FROM users WHERE updated_at > '2024-01-01 00:00:00') AS __graft_poll"
    src.connectionProperties.getProperty("user") shouldBe "u"
    an[UnsupportedOperationException] should be thrownBy src.stream(spark)
  }

  test("IncrementalPollSource: hwm advances on commit and survives restart (S1)") {
    val ss = spark
    import ss.implicits._
    val dataDir = tmp("graft-poll-data")
    val stateDir = tmp("graft-poll-state")
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
      .write.mode("overwrite").parquet(dataDir)

    def mkSource = new IncrementalPollSource(
      s => s.read.parquet(dataDir), "id", stateDir)

    val src = mkSource
    // poll 1: everything; commit advances hwm to 3
    val p1 = src.poll(spark)
    p1.count() shouldBe 3
    src.commit(p1)
    src.currentHwm shouldBe Some("3")

    // poll 2: nothing new; commit on empty batch is a no-op
    val p2 = src.poll(spark)
    p2.count() shouldBe 0
    src.commit(p2)
    src.currentHwm shouldBe Some("3")

    // new rows land (id 4, 5); a RESTARTED source resumes from stateDir
    Seq((4L, "d"), (5L, "e")).toDF("id", "v")
      .write.mode("append").parquet(dataDir)
    val restarted = mkSource
    val p3 = restarted.poll(spark)
    p3.select("id").collect().map(_.getLong(0)).sorted shouldBe Array(4L, 5L)
    restarted.commit(p3)
    restarted.currentHwm shouldBe Some("5")
  }

  test("runBatch executes the same spec one-shot (S3 bulk mode)") {
    val ss = spark
    import ss.implicits._
    val inDir = tmp("graft-batch-in")
    val outDir = tmp("graft-batch-out")
    Seq((1L, "x", "s1"), (2L, "y", "s2"), (11L, "z", "s3"))
      .toDF("id", "name", "private_info")
      .write.mode("overwrite").parquet(inDir)
    val spec = PipelineSpec.fromJson(
      s"""{
         |  "name": "bulk-masked",
         |  "source": {"type": "file", "options": {
         |    "path": "$inDir", "schema": "id BIGINT, name STRING, private_info STRING"}},
         |  "transforms": [
         |    {"type": "mask", "options": {"field": "private_info"}},
         |    {"type": "filter", "options": {"predicate": "id > 10"}}
         |  ],
         |  "sink": {"type": "file", "options": {"path": "$outDir", "mode": "overwrite"}}
         |}""".stripMargin)
    Pipeline.runBatch(spark, spec)
    val rows = spark.read.parquet(outDir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    rows shouldBe Array((11L, "z", "CENSORED"))
  }

  test("end-to-end: spec-driven CDC pipeline — Debezium file stream -> unwrap -> upsert table") {
    val inDir = tmp("graft-cdc-in")
    val tableDir = tmp("graft-cdc-table")
    def env(id: Long, name: String, op: String, tsMs: Long): String = {
      val row = s"""{"id": $id, "name": "$name"}"""
      val (before, after) = if (op == "d") (row, "null") else ("null", row)
      s"""{"before": $before, "after": $after, "source": {"ts_ms": $tsMs, "lsn": $tsMs}, "op": "$op", "ts_ms": $tsMs}"""
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(inDir, "batch1.jsonl"),
      Seq(env(1, "alice", "c", 100), env(2, "bob", "c", 101),
        env(1, "alice2", "u", 200), env(2, "bob", "d", 300))
        .mkString("\n").getBytes("UTF-8"))

    val spec = PipelineSpec.fromJson(
      s"""{
         |  "name": "cdc-upsert",
         |  "source": {"type": "file", "options": {
         |    "format": "text", "path": "$inDir", "schema": "value STRING"}},
         |  "transforms": [
         |    {"type": "debezium_unwrap", "options": {"column": "value", "schema": "id BIGINT, name STRING"}},
         |    {"type": "op_filter", "options": {"ops": "c,u,d"}}
         |  ],
         |  "sink": {"type": "upsert", "options": {
         |    "path": "$tableDir", "pk": "id", "order": "__ts_ms",
         |    "checkpoint": "${tmp("graft-cdc-ckpt")}", "trigger.ms": "50"}}
         |}""".stripMargin)
    val q = Pipeline.runStream(spark, spec)
    try q.processAllAvailable() finally q.stop()

    val table = new graft.sinks.ParquetKeyedTable(tableDir, Seq("id"))
    val rows = table.read(spark).get.select("id", "name")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    rows shouldBe Map(1L -> "alice2") // bob deleted, alice updated
  }

  test("end-to-end: file source -> mask -> envelope encode -> file sink, checkpoint-resumable") {
    val ss = spark
    import ss.implicits._
    val inDir = tmp("graft-pipe-in")
    val outDir = tmp("graft-pipe-out")
    val ckptDir = tmp("graft-pipe-ckpt")

    val specJson =
      s"""{
         |  "name": "events-masked-envelope",
         |  "source": {"type": "file", "options": {
         |    "format": "parquet", "path": "$inDir",
         |    "schema": "id BIGINT, name STRING, private_info STRING",
         |    "maxFilesPerTrigger": "1"}},
         |  "transforms": [
         |    {"type": "mask", "options": {"field": "private_info"}},
         |    {"type": "envelope_encode", "options": {"name": "users"}}
         |  ],
         |  "sink": {"type": "file", "options": {
         |    "format": "parquet", "path": "$outDir", "checkpoint": "$ckptDir",
         |    "trigger.ms": "50"}}
         |}""".stripMargin
    val spec = PipelineSpec.fromJson(specJson)

    Seq((1L, "alice", "ssn-1"), (2L, "bob", "ssn-2"))
      .toDF("id", "name", "private_info")
      .write.mode("overwrite").parquet(inDir)

    val q1 = Pipeline.runStream(spark, spec)
    try q1.processAllAvailable() finally q1.stop()

    // restart from the same checkpoint after new input arrives
    Seq((3L, "carol", "ssn-3")).toDF("id", "name", "private_info")
      .write.mode("append").parquet(inDir)
    val q2 = Pipeline.runStream(spark, spec)
    try q2.processAllAvailable() finally q2.stop()

    // decode the envelopes back: every input row exactly once, masked
    val schema = StructType.fromDDL("id BIGINT, name STRING, private_info STRING")
    val decoded = spark.read.parquet(outDir)
      .select(ConnectJson.decodeEnvelope(col("value"), schema).as("p"))
      .select("p.id", "p.name", "p.private_info")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sortBy(_._1)
    decoded shouldBe Array(
      (1L, "alice", "CENSORED"), (2L, "bob", "CENSORED"), (3L, "carol", "CENSORED"))

    // the envelope itself carries the constant schema half
    val raw = spark.read.parquet(outDir).select("value").head().getString(0)
    raw should include(""""schema"""")
    raw should include(""""payload"""")
  }

  test("end-to-end: spooldir-style CSV source -> redact -> JSON-lines sink (format-generic S5)") {
    // The reference ecosystem's spooldir workflow: a directory of CSV
    // drops streams through transforms into line-oriented JSON. The
    // file stage is format-generic (Spark DataSource names in the
    // spec), so csv-in/json-out is config, not code.
    val inDir = tmp("graft-csv-in")
    val outDir = tmp("graft-json-out")
    val ckptDir = tmp("graft-csv-ckpt")

    java.nio.file.Files.write(
      java.nio.file.Paths.get(inDir, "drop1.csv"),
      "1,alice,reach me at alice@example.com\n2,bob,plain note\n"
        .getBytes("UTF-8"))

    val spec = PipelineSpec.fromJson(
      s"""{
         |  "name": "csv-redact-json",
         |  "source": {"type": "file", "options": {
         |    "format": "csv", "path": "$inDir",
         |    "schema": "id BIGINT, name STRING, note STRING"}},
         |  "transforms": [
         |    {"type": "redact", "options": {"field": "note"}}
         |  ],
         |  "sink": {"type": "file", "options": {
         |    "format": "json", "path": "$outDir", "checkpoint": "$ckptDir",
         |    "trigger.ms": "50"}}
         |}""".stripMargin)
    val q = Pipeline.runStream(spark, spec)
    try q.processAllAvailable() finally q.stop()

    val lines = java.nio.file.Files.list(java.nio.file.Paths.get(outDir))
      .toArray.map(_.toString).filter(_.endsWith(".json"))
      .flatMap(p => scala.io.Source.fromFile(p).getLines().toSeq)
      .sorted
    lines.length shouldBe 2
    lines(0) shouldBe """{"id":1,"name":"alice","note":"reach me at <EMAIL>"}"""
    lines(1) shouldBe """{"id":2,"name":"bob","note":"plain note"}"""
  }
}
