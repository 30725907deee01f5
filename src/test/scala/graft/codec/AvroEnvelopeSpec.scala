package graft.codec

import java.nio.ByteBuffer

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

/** §1.2 Schema-Registry envelope: framing layout, encode/decode
  * roundtrip on random rows, writer-schema resolution by id, and loud
  * failures on bad frames. */
class AvroEnvelopeSpec extends SparkTestBase with Matchers {

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("name", StringType, nullable = true),
    StructField("score", DoubleType, nullable = false),
    StructField("ok", BooleanType, nullable = false),
    StructField("blob", BinaryType, nullable = true)))

  private def samples[A](gen: Gen[A], n: Int, seed: Long = 7L): Seq[A] =
    Gen.listOfN(n, gen).pureApply(Gen.Parameters.default, Seed(seed))

  private val rowGen: Gen[Row] = for {
    id <- Gen.chooseNum(Long.MinValue + 1, Long.MaxValue)
    name <- Gen.option(Gen.alphaNumStr.map(_.take(24)))
    score <- Gen.chooseNum(-1e9, 1e9)
    ok <- Gen.oneOf(true, false)
    blob <- Gen.option(Gen.listOfN(8, Gen.chooseNum(-128, 127).map(_.toByte)).map(_.toArray))
  } yield Row(id, name.orNull, score, ok, blob.orNull)

  test("frame layout: magic 0x00 + big-endian schema id + avro body") {
    val df = spark.createDataFrame(
      java.util.List.of(Row(1L, "a", 1.5, true, Array[Byte](1, 2))), schema)
    val bytes = AvroEnvelope.encode(df, schemaId = 0x01020304)
      .collect().head.getAs[Array[Byte]](0)
    bytes(0) shouldBe AvroEnvelope.Magic
    ByteBuffer.wrap(bytes, 1, 4).getInt shouldBe 0x01020304
    bytes.length should be > 5
  }

  test("encode → decode roundtrips random rows exactly") {
    val rows = samples(rowGen, 64)
    val df = spark.createDataFrame(rows.asJava, schema)
    val registry = Map(7 -> AvroEnvelope.avroSchemaFor(schema))
    val back = AvroEnvelope.decode(
      AvroEnvelope.encode(df, schemaId = 7), "value", registry, schema)
    def canon(r: Row): (Long, Option[String], Double, Boolean, Option[Seq[Byte]]) =
      (r.getLong(0), Option(r.getString(1)), r.getDouble(2), r.getBoolean(3),
        Option(r.getAs[Array[Byte]](4)).map(_.toSeq))
    back.collect().map(canon).sortBy(_._1) shouldBe
      df.collect().map(canon).sortBy(_._1)
  }

  test("decode resolves each frame's WRITER schema by id (evolution-safe)") {
    // writer v1 lacks `score`; the reader schema must fill the union's
    // null branch via Avro schema resolution... Avro requires a reader
    // DEFAULT for missing fields, so evolve the nullable `name` instead:
    // v1 wrote (id, name); v2 writes (id, name, score-as-null-union).
    val v1Schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", StringType, nullable = true)))
    val readerSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", StringType, nullable = true)))
    val dfV1 = spark.createDataFrame(
      java.util.List.of(Row(1L, "old"), Row(2L, null)), v1Schema)
    val dfV2 = spark.createDataFrame(
      java.util.List.of(Row(3L, "new")), readerSchema)
    val mixed = AvroEnvelope.encode(dfV1, schemaId = 1)
      .unionByName(AvroEnvelope.encode(dfV2, schemaId = 2))
    val registry = Map(
      1 -> AvroEnvelope.avroSchemaFor(v1Schema),
      2 -> AvroEnvelope.avroSchemaFor(readerSchema))
    val got = AvroEnvelope.decode(mixed, "value", registry, readerSchema)
      .collect().map(r => (r.getLong(0), Option(r.getString(1)))).sortBy(_._1)
    got shouldBe Array((1L, Some("old")), (2L, None), (3L, Some("new")))
  }

  test("bad magic and unknown schema ids fail loudly") {
    val ss = spark
    import ss.implicits._
    val registry = Map(7 -> AvroEnvelope.avroSchemaFor(schema))
    val badMagic = Seq(Array[Byte](1, 0, 0, 0, 7, 0)).toDF("value")
    val e1 = intercept[Exception](
      AvroEnvelope.decode(badMagic, "value", registry, schema).collect())
    e1.getMessage should include("bad frame")

    val good = spark.createDataFrame(
      java.util.List.of(Row(1L, "a", 1.0, true, null)), schema)
    val unknownId = AvroEnvelope.encode(good, schemaId = 99)
    val e2 = intercept[Exception](
      AvroEnvelope.decode(unknownId, "value", registry, schema).collect())
    e2.getMessage should include("99")
  }

  test("HttpResolver decodes against a live registry fixture, cached per id") {
    import java.net.InetSocketAddress
    import java.nio.charset.StandardCharsets
    import java.util.concurrent.atomic.AtomicInteger
    import com.sun.net.httpserver.HttpServer

    // Confluent-wire fixture: GET /schemas/ids/{id} → {"schema": "..."}
    // (reference deploys the real service at schema-registry:8081,
    // docker-compose.yaml:63-75). Counts hits to prove the cache.
    val hits = new AtomicInteger(0)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val known = Map(
      41 -> AvroEnvelope.avroSchemaFor(schema),
      42 -> AvroEnvelope.avroSchemaFor(schema))
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/schemas/ids/", { ex =>
      hits.incrementAndGet()
      val id = ex.getRequestURI.getPath.stripPrefix("/schemas/ids/").toInt
      val (code, body) = known.get(id) match {
        case Some(s) =>
          val node = mapper.createObjectNode()
          node.put("schema", s)
          (200, mapper.writeValueAsString(node))
        case None => (404, """{"error_code":40403,"message":"Schema not found"}""")
      }
      val bytes = body.getBytes(StandardCharsets.UTF_8)
      ex.getResponseHeaders.set("Content-Type",
        "application/vnd.schemaregistry.v1+json")
      ex.sendResponseHeaders(code, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      val resolver = AvroEnvelope.HttpResolver(base)

      val rows = samples(rowGen, 48, seed = 11L)
      val df = spark.createDataFrame(rows.asJava, schema)
      // two writer ids across many partitions: resolution must happen
      // once per id JVM-wide, not once per frame or per partition
      val mixed = AvroEnvelope.encode(df, schemaId = 41)
        .unionByName(AvroEnvelope.encode(df, schemaId = 42))
        .repartition(8)
      val back = AvroEnvelope.decode(mixed, "value", resolver, schema)
      back.count() shouldBe 96
      val misses = hits.get()
      misses shouldBe 2 // one fetch per distinct id (local[32] = one JVM)

      // map path unchanged: same frames, same rows through MapResolver
      def canon(r: Row) =
        (r.getLong(0), Option(r.getString(1)), r.getDouble(2), r.getBoolean(3),
          Option(r.getAs[Array[Byte]](4)).map(_.toSeq))
      AvroEnvelope.decode(mixed, "value", known, schema)
        .collect().map(canon).sortBy(_.toString) shouldBe
        back.collect().map(canon).sortBy(_.toString)
      hits.get() shouldBe misses // the re-decode resolved from cache only

      // unknown id → loud 404 failure, not a dropped record
      val unknown = AvroEnvelope.encode(df.limit(1), schemaId = 77)
      val e = intercept[Exception](
        AvroEnvelope.decode(unknown, "value", resolver, schema).collect())
      e.getMessage should include("77")
    } finally server.stop(0)
  }

  private implicit class SeqAsJava[A](s: Seq[A]) {
    def asJava: java.util.List[A] = {
      val l = new java.util.ArrayList[A](s.length)
      s.foreach(l.add)
      l
    }
  }
}
