package graft.codec

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkTestBase

/** Codec properties (SURVEY §5 item 3): Connect envelope encode→decode
  * roundtrip over random rows; Debezium unwrap semantics incl. delete
  * rewrite, tombstone retention, and `__` metadata (FIXTURES.md §B). */
class CodecSpec extends SparkTestBase {
  import spark.implicits._

  private def samples[A](gen: Gen[A], n: Int = 6, seed: Long = 42L): Seq[A] =
    Gen.listOfN(n, gen).pureApply(Gen.Parameters.default, Seed(seed))

  /** B1 `users` row schema (reference README.md:79-84). */
  private val usersSchema = StructType(Seq(
    StructField("id", IntegerType, nullable = false),
    StructField("name", StringType, nullable = true),
    StructField("updated_at", TimestampType, nullable = false),
    StructField("private_info", StringType, nullable = true)))

  private val usersRowGen: Gen[(Int, Option[String], Long, Option[String])] = for {
    id <- Gen.chooseNum(0, 1000000)
    name <- Gen.option(Gen.alphaNumStr.map(_.take(12)))
    // epoch millis in a sane range; envelope wire precision IS millis
    ms <- Gen.chooseNum(0L, 4102444800000L)
    pi <- Gen.option(Gen.alphaNumStr.map(_.take(12)))
  } yield (id, name, ms, pi)

  private def usersDf(rows: Seq[(Int, Option[String], Long, Option[String])]) = {
    val data = rows.map { case (id, name, ms, pi) =>
      Row(id, name.orNull, new Timestamp(ms), pi.orNull)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(data, 2), usersSchema)
  }

  test("Connect envelope schema JSON matches the B2 fixture shape") {
    val json = ConnectJson.connectSchemaJson(usersSchema, "users")
    assert(json.contains(""""field": "id", "type": "int32", "optional": false"""))
    assert(json.contains(""""field": "updated_at", "type": "int64""""))
    assert(json.contains("org.apache.kafka.connect.data.Timestamp"))
    assert(json.contains(""""name": "users""""))
    // it must itself be valid JSON per Spark's parser
    val parsed = usersDf(Seq((1, Some("n"), 0L, None)))
      .select(schema_of_json(lit(json)).as("s")).head().getString(0)
    assert(parsed.startsWith("STRUCT"))
  }

  test("envelope encode→decode roundtrips random users rows exactly") {
    for (rows <- samples(Gen.listOfN(25, usersRowGen))) {
      val df = usersDf(rows)
      val decoded = df
        .select(ConnectJson.encodeEnvelope(usersSchema, "users").as("value"))
        .select(ConnectJson.decodeEnvelope($"value", usersSchema).as("p"))
        .select($"p.id", $"p.name", $"p.updated_at", $"p.private_info")
      assert(decoded.except(df).isEmpty && df.except(decoded).isEmpty)
    }
  }

  test("encoded envelope carries the constant schema half on every record") {
    val df = usersDf(samples(usersRowGen, n = 10).map(r => r))
    val envs = df.select(ConnectJson.encodeEnvelope(usersSchema, "users").as("v"))
      .select(get_json_object($"v", "$.schema.type").as("t"),
        get_json_object($"v", "$.payload.id").as("id"))
    assert(envs.filter($"t" =!= "struct" || $"id".isNull).isEmpty)
  }

  // ------------------------------------------------------------- Debezium

  private val rowSchema = StructType(Seq(
    StructField("id", IntegerType),
    StructField("name", StringType)))

  /** Hand-built change events: insert, update, delete, tombstone. */
  private val changelog = Seq(
    ("k1", """{"before": null, "after": {"id": 1, "name": "a"}, "source": {"connector": "postgresql", "db": "d", "table": "t", "ts_ms": 10, "lsn": 1}, "op": "c", "ts_ms": 100}"""),
    ("k1", """{"before": {"id": 1, "name": "a"}, "after": {"id": 1, "name": "b"}, "source": {"connector": "postgresql", "db": "d", "table": "t", "ts_ms": 20, "lsn": 2}, "op": "u", "ts_ms": 200}"""),
    ("k2", """{"before": {"id": 2, "name": "x"}, "after": null, "source": {"connector": "postgresql", "db": "d", "table": "t", "ts_ms": 30, "lsn": 3}, "op": "d", "ts_ms": 300}"""),
    ("k2", null))

  test("unwrap: c/u emit after-state with __deleted=false") {
    val df = changelog.toDF("key", "value")
    val out = Debezium.unwrap(df, "value", rowSchema, keep = Seq("key"))
      .filter($"__op".isin("c", "u"))
      .select("key", "id", "name", "__deleted", "__op", "__ts_ms")
      .as[(String, Int, String, String, String, Long)]
      .collect().toSet
    assert(out == Set(
      ("k1", 1, "a", "false", "c", 100L),
      ("k1", 1, "b", "false", "u", 200L)))
  }

  test("unwrap: delete is rewritten from before-state with __deleted=true") {
    val df = changelog.toDF("key", "value")
    val out = Debezium.unwrap(df, "value", rowSchema, keep = Seq("key"))
      .filter($"__op" === "d")
      .select("key", "id", "name", "__deleted")
      .as[(String, Int, String, String)]
      .collect().toSeq
    assert(out == Seq(("k2", 2, "x", "true")))
  }

  test("unwrap: tombstones are kept by default (drop.tombstones=false), droppable on demand") {
    val df = changelog.toDF("key", "value")
    val kept = Debezium.unwrap(df, "value", rowSchema, keep = Seq("key"))
    assert(kept.count() == 4)
    val tomb = kept.filter($"__op".isNull)
      .select("key", "id", "__deleted").as[(String, Option[Int], Option[String])]
      .collect().toSeq
    assert(tomb == Seq(("k2", None, None)))
    assert(Debezium.unwrap(df, "value", rowSchema, dropTombstones = true).count() == 3)
  }

  test("unwrap without metadata has no __op/__ts_ms, rewrite flag stays") {
    val df = changelog.toDF("key", "value")
    val out = Debezium.unwrap(df, "value", rowSchema, addMetadata = false, keep = Seq("key"))
    assert(out.columns.toSeq == Seq("key", "id", "name", "__deleted"))
  }
}
