package graft.multimodal

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

/** Multimodal plumbing: schema, partition batching, determinism, and
  * the Catalyst frame-sampling/resize paths. The decode itself is the
  * documented stub — these tests pin everything around the seam. */
class MultimodalSpec extends SparkTestBase with Matchers {

  private def mkAssets(n: Int): Seq[Asset] =
    (0 until n).map { i =>
      // deterministic pseudo-random payload per asset
      val rng = new scala.util.Random(1000 + i)
      val bytes = Array.fill(64 + i * 17)(rng.nextInt(256).toByte)
      Asset(i.toLong, if (i % 2 == 0) "image/png" else "audio/wav",
        bytes, 640 + i, 480)
    }

  test("decodeFeatures: 1:1 rows, schema, determinism, no shuffle") {
    val ss = spark
    import ss.implicits._
    val assets = mkAssets(20).toDS().repartition(4)
    val feats = Multimodal.decodeFeatures(assets)

    feats.columns shouldBe Array(
      "asset_id", "media_type", "n_bytes", "mean_byte", "histogram", "embedding")
    // mapPartitions must not shuffle: partitioning preserved
    feats.rdd.getNumPartitions shouldBe assets.rdd.getNumPartitions

    val rows = feats.collect().sortBy(_.asset_id)
    rows.length shouldBe 20
    rows.foreach { f =>
      f.histogram.length shouldBe Multimodal.HistogramBins
      f.histogram.sum shouldBe f.n_bytes // every byte lands in one bin
      f.embedding.length shouldBe Multimodal.HistogramBins
    }
    // deterministic: a second run produces identical features
    val again = Multimodal.decodeFeatures(assets).collect().sortBy(_.asset_id)
    rows.map(_.histogram.toSeq) shouldBe again.map(_.histogram.toSeq)
  }

  test("frameSample keeps every Nth fixed-size frame, 1-based binary slicing") {
    val ss = spark
    import ss.implicits._
    val payload = Array.tabulate(100)(_.toByte) // 100 bytes → 10 frames of 10
    val df = Seq((1L, payload)).toDF("asset_id", "bytes")
    val frames = Multimodal.frameSample(df, "bytes", frameSize = 10, everyN = 3)
      .select("frame_idx", "frame")
      .collect().map(r => (r.getLong(0), r.getAs[Array[Byte]](1)))
      .sortBy(_._1)
    frames.map(_._1) shouldBe Array(0L, 3L, 6L, 9L)
    frames.head._2 shouldBe Array.tabulate(10)(_.toByte)
    frames(1)._2 shouldBe Array.tabulate(10)(i => (30 + i).toByte)
  }

  test("frameSample emits no frames for an empty payload") {
    val ss = spark
    import ss.implicits._
    // regression: sequence(0, -1) generates a DESCENDING [0, -1] in
    // Spark, which produced one phantom frame for empty payloads
    val df = Seq((1L, Array.empty[Byte]), (2L, Array.tabulate(5)(_.toByte)))
      .toDF("asset_id", "bytes")
    val frames = Multimodal.frameSample(df, "bytes", frameSize = 10, everyN = 1)
      .select("asset_id").collect().map(_.getLong(0))
    frames shouldBe Array(2L)
  }

  test("resizeMeta scales metadata down to the bound, never up") {
    val ss = spark
    import ss.implicits._
    val df = Seq((1L, 4000, 3000), (2L, 320, 240)).toDF("asset_id", "width", "height")
    val out = Multimodal.resizeMeta(df, maxDim = 1000)
      .select("asset_id", "out_width", "out_height")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).sortBy(_._1)
    out(0) shouldBe ((1L, 1000, 750))
    out(1) shouldBe ((2L, 320, 240)) // already small: untouched
  }

  test("features join back to the documents/embeddings tables (multimodal columns)") {
    val ss = spark
    import ss.implicits._
    val assets = mkAssets(10).toDS()
    val feats = Multimodal.decodeFeatures(assets)
    // typed features join relational metadata — the lakehouse shape
    val joined = feats.toDF().join(
      assets.toDF().select(col("asset_id"), col("width")), "asset_id")
    joined.count() shouldBe 10
    joined.filter(col("n_bytes") <= 0).count() shouldBe 0
  }

  test("dispatchDecode: magic bytes route decoders; claims are reported, corrupt blobs classify") {
    val ss = spark
    import ss.implicits._
    val bmp = Bmp.encodeGray(4, 3, Array.tabulate(12)(i => (i * 10).toByte))
    val wav = Wav.encode(8000, 1, Array[Short](5, -5, 7))
    val junk = "not a media file at all".getBytes
    val assets = Seq(
      Asset(1L, "image/bmp", bmp, 0, 0),     // claim right
      Asset(2L, "image/bmp", wav, 0, 0),     // claim WRONG: actually WAV
      Asset(3L, "audio/wav", junk, 0, 0)     // corrupt blob under a claim
    ).toDS()
    val out = Multimodal.dispatchDecode(assets)
      .collect().map(r => r.getAs[Long]("asset_id") ->
        ((r.getAs[String]("claimed"), r.getAs[String]("sniffed"),
          r.getAs[Long]("n_units"), r.getAs[Long]("checksum")))).toMap
    // id 1: decoded as image, 12 pixels, luma sum = sum of grays
    out(1L) shouldBe (("image/bmp", "image/bmp", 12L,
      (0 until 12).map(_ * 10).sum.toLong))
    // id 2: routed by MAGIC to the wav decoder despite the claim
    out(2L) shouldBe (("image/bmp", "audio/wav", 3L, (25 + 25 + 49).toLong))
    // id 3: classified, not thrown
    out(3L) shouldBe (("audio/wav", "application/octet-stream", 0L, 0L))
  }
}
