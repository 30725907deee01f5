package graft.core

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

/** The worker's built-in SMT catalog as Pipeline transforms (§2.10
  * `transforms.*.type` seam — the reference's cp-kafka-connect image
  * ships every `org.apache.kafka.connect.transforms.*` class, which is
  * how `MaskField$Value` resolves at reference `README.md:105`).
  * Each test pins the Connect-documented semantic, not just "runs". */
class SmtCatalogSpec extends SparkTestBase with Matchers {
  import spark.implicits._

  private def t(ty: String, opts: (String, String)*): StageSpec =
    StageSpec(ty, opts.toMap)
  private def apply1(df: DataFrame, s: StageSpec): DataFrame =
    Pipeline.applyTransform(df, s)

  private lazy val people =
    Seq((1L, "ann", 12.5, "2024-03-05"), (2L, "bob", 7.25, "2024-12-31"))
      .toDF("id", "name", "score", "day")

  test("cast coerces listed fields using Connect's type vocabulary") {
    val out = apply1(people, t("cast", "spec" -> "id:int32, score:string"))
    out.schema("id").dataType shouldBe IntegerType
    out.schema("score").dataType shouldBe StringType
    out.schema("name").dataType shouldBe StringType // untouched
    out.orderBy("id").select("id", "score").as[(Int, String)].collect() shouldBe
      Array((1, "12.5"), (2, "7.25"))
    an[IllegalArgumentException] should be thrownBy
      apply1(people, t("cast", "spec" -> "id:uuid"))
    an[IllegalArgumentException] should be thrownBy
      apply1(people, t("cast", "spec" -> "id"))
  }

  test("insert_field adds a static constant; timestamp.field stamps wall-clock") {
    val out = apply1(people, t("insert_field",
      "static.field" -> "src", "static.value" -> "crm"))
    out.columns should contain("src")
    out.select("src").distinct().as[String].collect() shouldBe Array("crm")
    val stamped = apply1(people, t("insert_field", "timestamp.field" -> "seen_at"))
    stamped.schema("seen_at").dataType shouldBe TimestampType
    stamped.filter(col("seen_at").isNull).count() shouldBe 0L
  }

  test("extract_field on a scalar yields the single column; nested paths resolve") {
    val out = apply1(people, t("extract_field", "field" -> "name"))
    out.columns shouldBe Array("name")
    out.as[String].collect().sorted shouldBe Array("ann", "bob")
    val nested = people.select(struct($"id", struct($"name", $"score").as("who")).as("rec"))
    val who = apply1(nested, t("extract_field", "field" -> "rec.who"))
    who.columns shouldBe Array("name", "score") // struct value expands to its members
    val leaf = apply1(nested, t("extract_field", "field" -> "rec.who.name", "as" -> "n"))
    leaf.columns shouldBe Array("n")
  }

  test("hoist_field wraps the whole value; extract_field is its exact inverse") {
    val hoisted = apply1(people, t("hoist_field", "field" -> "payload"))
    hoisted.columns shouldBe Array("payload")
    hoisted.schema("payload").dataType shouldBe a[StructType]
    val back = apply1(hoisted, t("extract_field", "field" -> "payload"))
    back.columns shouldBe people.columns
    back.orderBy("id").collect() shouldBe people.orderBy("id").collect()
  }

  test("flatten lifts nested struct leaves with the configured delimiter") {
    val nested = people.select($"id",
      struct(struct($"name", $"score").as("inner"), $"day".as("d")).as("rec"))
    val flat = apply1(nested, t("flatten", "delimiter" -> "_"))
    flat.columns shouldBe Array("id", "rec_inner_name", "rec_inner_score", "rec_d")
    flat.orderBy("id").select("rec_inner_name").as[String].collect() shouldBe
      Array("ann", "bob")
    // Connect default delimiter is "."
    apply1(nested, t("flatten")).columns should contain("rec.inner.name")
  }

  test("replace_field excludes, renames, then includes (post-rename names, ordered)") {
    val out = apply1(people, t("replace_field",
      "exclude" -> "day", "renames" -> "id:user_id, name:user_name",
      "include" -> "user_name,user_id"))
    out.columns shouldBe Array("user_name", "user_id")
    out.orderBy("user_id").as[(String, Long)].collect() shouldBe
      Array(("ann", 1L), ("bob", 2L))
    an[IllegalArgumentException] should be thrownBy
      apply1(people, t("replace_field", "renames" -> "id"))
  }

  test("regex_router rewrites only on a whole-value match, like matcher.matches()") {
    val topics = Seq("db.users", "db.orders", "audit").toDF("topic")
    val routed = apply1(topics, t("regex_router",
      "regex" -> "db\\.(.*)", "replacement" -> "cdc-$1"))
    routed.orderBy("topic").as[String].collect() shouldBe
      Array("audit", "cdc-orders", "cdc-users") // non-matching value untouched
    // a partial match must NOT rewrite (anchored semantics)
    val partial = apply1(Seq("xdb.users").toDF("topic"),
      t("regex_router", "regex" -> "db\\.(.*)", "replacement" -> "cdc-$1"))
    partial.as[String].collect() shouldBe Array("xdb.users")
  }

  test("timestamp_converter round-trips unix/string/Timestamp/Date in place") {
    val epochMs = Seq((1L, 1709600000000L)).toDF("id", "ts")
    val asTs = apply1(epochMs, t("timestamp_converter",
      "field" -> "ts", "target.type" -> "Timestamp"))
    asTs.schema("ts").dataType shouldBe TimestampType
    asTs.select("ts").as[Timestamp].head().getTime shouldBe 1709600000000L
    // string target with format; string source parses with the same format
    val asStr = apply1(asTs, t("timestamp_converter",
      "field" -> "ts", "target.type" -> "string", "format" -> "yyyy-MM-dd HH:mm:ss"))
    asStr.schema("ts").dataType shouldBe StringType
    val backToUnix = apply1(asStr, t("timestamp_converter",
      "field" -> "ts", "target.type" -> "unix",
      "format" -> "yyyy-MM-dd HH:mm:ss", "unix.precision" -> "seconds"))
    backToUnix.select("ts").as[Long].head() shouldBe 1709600000L
    val asDate = apply1(asTs, t("timestamp_converter",
      "field" -> "ts", "target.type" -> "Date"))
    asDate.schema("ts").dataType shouldBe DateType
    asDate.select("ts").as[Date].head().toString shouldBe "2024-03-05"
    an[IllegalArgumentException] should be thrownBy
      apply1(asTs, t("timestamp_converter", "field" -> "ts", "target.type" -> "nope"))
  }

  test("timestamp_router formats the routing column from an explicit field") {
    val df = Seq(("orders", Timestamp.valueOf("2024-03-05 10:00:00")))
      .toDF("topic", "ts")
    val routed = apply1(df, t("timestamp_router",
      "timestamp.field" -> "ts"))
    routed.select("topic").as[String].head() shouldBe "orders-20240305"
    val custom = apply1(df, t("timestamp_router",
      "timestamp.field" -> "ts", "format" -> "yyyy.MM",
      "topic.format" -> "${timestamp}.${topic}.v1"))
    custom.select("topic").as[String].head() shouldBe "2024.03.orders.v1"
    // Connect reads the record's Kafka timestamp; a batch row has none,
    // so the field is required (also keeps the transform deterministic)
    an[IllegalArgumentException] should be thrownBy
      apply1(df, t("timestamp_router"))
  }

  test("value_to_key builds the struct key the keyed sinks consume") {
    val out = apply1(people, t("value_to_key", "fields" -> "id,name"))
    out.columns should contain("__key")
    out.schema("__key").dataType shouldBe
      StructType(Seq(StructField("id", LongType, nullable = false),
        StructField("name", StringType)))
    out.orderBy("id").select("__key.id", "__key.name").as[(Long, String)]
      .collect() shouldBe Array((1L, "ann"), (2L, "bob"))
  }

  test("insert_header appends ordered duplicate-allowing (key,value) pairs") {
    val one = apply1(people, t("insert_header",
      "header" -> "origin", "value.literal" -> "crm"))
    one.schema("__headers").dataType shouldBe
      ArrayType(StructType(Seq(StructField("key", StringType),
        StructField("value", StringType))))
    // a second insert with the SAME key appends — Connect headers are a
    // list, not a map, so duplicates survive in insertion order
    val two = apply1(one, t("insert_header",
      "header" -> "origin", "value.literal" -> "crm2"))
    two.select("__headers").as[Seq[(String, String)]].head() shouldBe
      Seq("origin" -> "crm", "origin" -> "crm2")
  }

  test("header_from copies or moves record fields into headers positionally") {
    val copied = apply1(people, t("header_from",
      "fields" -> "name,score", "headers" -> "h.name,h.score"))
    copied.columns should contain allOf ("name", "score") // copy keeps sources
    copied.orderBy("id").select("__headers").as[Seq[(String, String)]]
      .head() shouldBe Seq("h.name" -> "ann", "h.score" -> "12.5")
    val moved = apply1(people, t("header_from",
      "fields" -> "day", "headers" -> "h.day", "operation" -> "move"))
    moved.columns should not contain "day"
    moved.orderBy("id").select("__headers").as[Seq[(String, String)]]
      .head() shouldBe Seq("h.day" -> "2024-03-05")
    an[IllegalArgumentException] should be thrownBy
      apply1(people, t("header_from", "fields" -> "a,b", "headers" -> "x"))
    an[IllegalArgumentException] should be thrownBy
      apply1(people, t("header_from",
        "fields" -> "day", "headers" -> "h", "operation" -> "rename"))
  }

  test("drop_headers removes every duplicate of the listed keys, keeping order") {
    val built = Seq("insert_header" -> ("trace" -> "t1"),
      "insert_header" -> ("origin" -> "crm"),
      "insert_header" -> ("trace" -> "t2"))
      .foldLeft(people) { case (df, (ty, (k, v))) =>
        apply1(df, t(ty, "header" -> k, "value.literal" -> v)) }
    val dropped = apply1(built, t("drop_headers", "headers" -> "trace"))
    dropped.select("__headers").as[Seq[(String, String)]].head() shouldBe
      Seq("origin" -> "crm")
    // dropping from a frame with no headers column is a no-op, not an error
    apply1(people, t("drop_headers", "headers" -> "trace"))
      .columns shouldBe people.columns
  }

  test("headers ride BESIDE the envelope: encode excludes them, decode restores them") {
    val withH = apply1(people, t("insert_header",
      "header" -> "origin", "value.literal" -> "crm"))
    val encoded = apply1(withH, t("envelope_encode"))
    encoded.columns shouldBe Array("value", "__headers")
    // the value envelope must not smuggle the headers in its payload
    val v = encoded.select("value").as[String].head()
    v should not include "origin"
    v should not include "__headers"
    v should include(""""payload"""")
    val back = apply1(encoded, t("envelope_decode",
      "schema" -> "id BIGINT, name STRING, score DOUBLE, day STRING"))
    back.columns shouldBe Array("id", "name", "score", "day", "__headers")
    back.orderBy("id").select("id", "name").as[(Long, String)].collect() shouldBe
      Array((1L, "ann"), (2L, "bob"))
    back.select("__headers").as[Seq[(String, String)]].head() shouldBe
      Seq("origin" -> "crm")
    // headerless frames encode exactly as before
    apply1(people, t("envelope_encode")).columns shouldBe Array("value")
  }

  test("'when' gates any value transform; unmatched rows pass through unchanged") {
    // mask only short names — the generic-framework twin of mask_when
    val masked = apply1(people, t("mask",
      "field" -> "name", "when" -> "length(name) <= 3", "negate" -> "false"))
    masked.orderBy("id").select("name").as[String].collect() shouldBe
      Array("CENSORED", "CENSORED")
    val negated = apply1(people, t("mask",
      "field" -> "name", "when" -> "id = 1", "negate" -> "true"))
    negated.orderBy("id").select("name").as[String].collect() shouldBe
      Array("ann", "CENSORED")
    // agrees with the fused mask_when fast path
    val fused = apply1(people, t("mask_when",
      "field" -> "name", "predicate" -> "id = 2"))
    val gated = apply1(people, t("mask", "field" -> "name", "when" -> "id = 2"))
    gated.orderBy("id").collect() shouldBe fused.orderBy("id").collect()
  }

  test("'when' on the filter family rewrites the keep-condition — no row loss outside the gate") {
    // drop low scores, but only for rows the predicate selects
    val out = apply1(people, t("filter",
      "predicate" -> "score > 10", "when" -> "name = 'bob'"))
    // ann (unmatched) survives regardless of score; bob fails score>10
    out.select("name").as[String].collect() shouldBe Array("ann")
    // single scan: the gate must not union two branches of the source
    out.queryExecution.executedPlan.toString should not include "Union"
    val wl = apply1(people, t("whitelist",
      "field" -> "name", "values" -> "ann", "when" -> "id >= 2"))
    wl.count() shouldBe 1L // id=1 passes ungated; id=2 fails the whitelist
  }

  test("'when' on insert_field pads unmatched rows with typed NULL (Connect's absent field)") {
    val out = apply1(people, t("insert_field",
      "static.field" -> "tier", "static.value" -> "gold", "when" -> "score > 10"))
    out.schema("tier").dataType shouldBe StringType
    out.orderBy("id").select("tier").as[Option[String]].collect() shouldBe
      Array(Some("gold"), None)
  }

  test("'when' rejects schema-changing transforms with a clear error") {
    val e = intercept[IllegalArgumentException] {
      apply1(people, t("cast", "spec" -> "id:string", "when" -> "id = 1")).collect()
    }
    e.getMessage should include("schema-changing")
    e.getMessage should include("retyped")
    val e2 = intercept[IllegalArgumentException] {
      apply1(people, t("replace_field", "exclude" -> "day", "when" -> "id = 1")).collect()
    }
    e2.getMessage should include("removed")
  }

  test("a 'when'-gated transform runs unchanged on a stream (union path is stream-safe)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val gate = t("insert_field",
      "static.field" -> "tier", "static.value" -> "gold", "when" -> "score > 10")
    val input = MemoryStream[(Long, String, Double, String)]
    val streamed = apply1(input.toDF().toDF("id", "name", "score", "day"), gate)
    val q = streamed.writeStream.format("memory").queryName("smt_gated_stream")
      .outputMode("append").start()
    try {
      input.addData((1L, "ann", 12.5, "2024-03-05"), (2L, "bob", 7.25, "2024-12-31"))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("smt_gated_stream").orderBy("id").collect()
    got shouldBe apply1(people, gate).orderBy("id").collect()
  }

  test("the chained catalog runs from a JSON connector config end-to-end") {
    val json =
      """{"name": "catalog-chain",
        |  "source": {"type": "file", "options": {"format": "parquet",
        |    "path": "/root/testdata/sf0.001/customer.parquet",
        |    "schema": "c_custkey BIGINT, c_name STRING, c_acctbal DOUBLE"}},
        |  "transforms": [
        |    {"type": "cast", "options": {"spec": "c_custkey:int32"}},
        |    {"type": "hoist_field", "options": {"field": "rec"}},
        |    {"type": "flatten", "options": {"delimiter": "_"}},
        |    {"type": "replace_field", "options": {
        |      "renames": "rec_c_custkey:id, rec_c_name:name, rec_c_acctbal:bal",
        |      "include": "id,name,bal"}},
        |    {"type": "insert_field", "options": {"static.field": "src", "static.value": "crm"}},
        |    {"type": "filter", "options": {"predicate": "id <= 10"}}],
        |  "sink": {"type": "noop"}}""".stripMargin
    val out = Pipeline.build(spark, PipelineSpec.fromJson(json), streaming = false)
    out.columns shouldBe Array("id", "name", "bal", "src")
    out.schema("id").dataType shouldBe IntegerType
    out.count() shouldBe 11L // c_custkey is 0-based: 0..10 inclusive
    // the whole 6-transform chain must collapse to ONE codegen stage with
    // the filter sitting on the scan (the cast SMT wraps the key so the
    // comparison stays a DataFilter, not a parquet PushedFilter — still
    // scan-adjacent, no exchange, no second stage)
    val plan = out.queryExecution.executedPlan.toString
    plan should include("DataFilters: [isnotnull(c_custkey")
    plan should not include "*(2)" // a second codegen stage would mean a barrier snuck in
  }
}
