package graft.core

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

/** Declarative error policy on the keyed sinks (ST3 as CONFIG, not just
  * combinators): `errors.tolerance=all` + DLQ path/predicate and
  * `errors.retry.*` are plain sink options in the JSON spec, the way
  * the reference worker configures `errors.*` on a connector. */
class SinkErrorPolicySpec extends SparkTestBase with Matchers {
  import spark.implicits._

  private def tmp(p: String): String = Files.createTempDirectory(p).toString

  test("errors.tolerance=all routes predicate-matching rows to the DLQ, clean rows merge") {
    val in = tmp("graft-errpol-in")
    val tableDir = tmp("graft-errpol-table")
    val dlqDir = tmp("graft-errpol-dlq")
    Seq(
      (1L, "alice", 100L, "false"),
      (2L, null.asInstanceOf[String], 101L, "false"), // poison: null name
      (3L, "carol", 102L, "false"))
      .toDF("id", "name", "ord", "__deleted")
      .write.mode("overwrite").parquet(in)

    val json =
      s"""{"name": "err-policy",
         |  "source": {"type": "file", "options": {"format": "parquet", "path": "$in",
         |    "schema": "id BIGINT, name STRING, ord BIGINT, __deleted STRING"}},
         |  "transforms": [],
         |  "sink": {"type": "upsert", "options": {
         |    "path": "$tableDir", "pk": "id", "order": "ord",
         |    "checkpoint": "${tmp("graft-errpol-ckpt")}",
         |    "trigger": "availableNow",
         |    "errors.tolerance": "all",
         |    "errors.dlq.path": "$dlqDir",
         |    "errors.predicate": "name IS NULL",
         |    "errors.reason": "'null name'",
         |    "errors.retry.attempts": "2"}}}""".stripMargin
    val spec = PipelineSpec.fromJson(json)
    Pipeline.validateStreamSink(spec.sink) // the config must pass the gate it runs under
    val q = Pipeline.runStream(spark, spec)
    try q.awaitTermination(60000L) finally q.stop()

    val table = new graft.sinks.ParquetKeyedTable(tableDir, Seq("id"))
    table.read(spark).get.select("id").as[Long].collect().sorted shouldBe Array(1L, 3L)
    val dlq = spark.read.parquet(dlqDir)
    dlq.count() shouldBe 1L
    dlq.select("id", "__error").as[(Long, String)].head() shouldBe ((2L, "null name"))
  }

  test("submit-time validation rejects bad or misplaced errors.* configs") {
    def sink(opts: (String, String)*): StageSpec =
      StageSpec("upsert", Map("path" -> "/t", "pk" -> "id",
        "checkpoint" -> "/c") ++ opts.toMap)
    // tolerance=all demands the DLQ path and the predicate
    an[IllegalArgumentException] should be thrownBy
      Pipeline.validateStreamSink(sink("errors.tolerance" -> "all"))
    an[IllegalArgumentException] should be thrownBy
      Pipeline.validateStreamSink(sink(
        "errors.tolerance" -> "all", "errors.dlq.path" -> "/dlq"))
    // unknown tolerance value
    an[IllegalArgumentException] should be thrownBy
      Pipeline.validateStreamSink(sink("errors.tolerance" -> "some"))
    // zero retry attempts
    an[IllegalArgumentException] should be thrownBy
      Pipeline.validateStreamSink(sink("errors.retry.attempts" -> "0"))
    // errors.* on a sink that cannot honor them (file is not foreachBatch)
    an[IllegalArgumentException] should be thrownBy
      Pipeline.validateStreamSink(StageSpec("file", Map(
        "path" -> "/t", "checkpoint" -> "/c", "errors.tolerance" -> "all")))
    // a well-formed policy passes
    Pipeline.validateStreamSink(sink(
      "errors.tolerance" -> "all", "errors.dlq.path" -> "/dlq",
      "errors.predicate" -> "id IS NULL", "errors.retry.attempts" -> "3"))
  }
}
