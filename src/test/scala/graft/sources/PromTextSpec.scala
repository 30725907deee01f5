package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase
import graft.core.{Pipeline, StageSpec}

/** S7/S8 Prometheus exposition-format ingestion + the P2/P4/P5/P6
  * transform vocabulary added to the pipeline. */
class PromTextSpec extends SparkTestBase with Matchers {

  test("PromText.parse handles the reference's exposition format") {
    val ss = spark
    import ss.implicits._
    // shaped like fastapi/main.py's rendered output
    val body = Seq(
      "# HELP app_request_count Total requests",
      "# TYPE app_request_count counter",
      "app_request_count 42",
      "# TYPE app_temperature gauge",
      "app_temperature 21.5",
      """kafka_connect_worker_task_count{connector="jdbc",status="running"} 3 1700000000000""",
      "",
      "not a metric line at all !!!")
    val parsed = PromText.parse(body.toDF("value"), "value")
      .orderBy("name").collect()
    parsed.length shouldBe 3
    val byName = parsed.map(r => r.getString(0) ->
      ((r.getMap[String, String](1), r.getDouble(2), Option(r.get(3))))).toMap
    byName("app_request_count")._2 shouldBe 42.0
    byName("app_temperature")._2 shouldBe 21.5
    val (labels, v, ts) = byName("kafka_connect_worker_task_count")
    v shouldBe 3.0
    labels("connector") shouldBe "jdbc"
    labels("status") shouldBe "running"
    ts shouldBe Some(1700000000000L)
    byName("app_request_count")._1.isEmpty shouldBe true
  }

  test("PromText.parse: escaped quotes/commas/equals in label values, ±Inf samples") {
    val ss = spark
    import ss.implicits._
    val body = Seq(
      // legal exposition format: comma, equals, escaped quote, escaped
      // backslash and \n inside label values
      """m1{path="/a,b=c",msg="say \"hi\"",dir="C:\\tmp",nl="x\ny"} 1""",
      "m2 +Inf",
      "m3 -Inf",
      "m4 NaN")
    val parsed = PromText.parse(body.toDF("value"), "value")
      .orderBy("name").collect()
    // NaN parses but the sample survives only if non-null — NaN is not null
    parsed.length shouldBe 4
    val labels = parsed(0).getMap[String, String](1)
    labels("path") shouldBe "/a,b=c"
    labels("msg") shouldBe "say \"hi\""
    labels("dir") shouldBe "C:\\tmp"
    labels("nl") shouldBe "x\ny"
    parsed(1).getDouble(2) shouldBe Double.PositiveInfinity
    parsed(2).getDouble(2) shouldBe Double.NegativeInfinity
    parsed(3).getDouble(2).isNaN shouldBe true
  }

  test("pipeline transforms: mask_when, whitelist, op_filter, drop_fields guard") {
    val ss = spark
    import ss.implicits._
    val df = Seq(
      (1L, "users", "c", "alice"),
      (2L, "users", "d", "bob"),
      (3L, "audit", "c", "carol"))
      .toDF("id", "topic", "__op", "name")

    // P6: conditional mask — only delete records get censored
    val masked = Pipeline.applyTransform(df,
      StageSpec("mask_when", Map("field" -> "name", "predicate" -> "__op = 'd'")))
    masked.filter(col("id") === 2).head().getString(3) shouldBe "CENSORED"
    masked.filter(col("id") === 1).head().getString(3) shouldBe "alice"

    // P2: topic whitelist
    val wl = Pipeline.applyTransform(df,
      StageSpec("whitelist", Map("values" -> "users")))
    wl.select("id").collect().map(_.getLong(0)).sorted shouldBe Array(1L, 2L)

    // P4: operation filter
    val ops = Pipeline.applyTransform(df,
      StageSpec("op_filter", Map("ops" -> "c")))
    ops.select("id").collect().map(_.getLong(0)).sorted shouldBe Array(1L, 3L)

    // P5: drop with schema guard — compatible drop passes...
    val dropped = Pipeline.applyTransform(df, StageSpec("drop_fields",
      Map("fields" -> "name",
        "keep.schema.compatible.ddl" -> "id BIGINT, topic STRING, __op STRING")))
    dropped.columns shouldBe Array("id", "topic", "__op")
    // ...incompatible contract fails loudly
    an[IllegalArgumentException] should be thrownBy
      Pipeline.applyTransform(df, StageSpec("drop_fields",
        Map("fields" -> "name,topic",
          "keep.schema.compatible.ddl" -> "id BIGINT, topic STRING, __op STRING")))
  }

  test("pipeline transform: redact scrubs PII inside free text, keeps the rest") {
    val ss = spark
    import ss.implicits._
    val df = Seq(
      (1L, "mail alice@example.com or call +1 (555) 123-4567 now"),
      (2L, "server at 10.0.0.17 responded"),
      (3L, "nothing sensitive here"))
      .toDF("id", "note")

    val red = Pipeline.applyTransform(df,
        StageSpec("redact", Map("field" -> "note")))
      .orderBy("id").collect().map(_.getString(1))
    red(0) shouldBe "mail <EMAIL> or call <PHONE> now"
    red(1) shouldBe "server at <IP> responded"
    red(2) shouldBe "nothing sensitive here"

    // custom pattern rides along; unknown class fails loudly
    val custom = Pipeline.applyTransform(df,
        StageSpec("redact", Map("field" -> "note", "classes" -> "email",
          "pattern" -> "server", "replacement" -> "<HOST>")))
      .orderBy("id").collect().map(_.getString(1))
    custom(1) should startWith("<HOST> at 10.0.0.17")
    an[IllegalArgumentException] should be thrownBy
      Pipeline.applyTransform(df,
        StageSpec("redact", Map("field" -> "note", "classes" -> "ssn")))
  }
}
