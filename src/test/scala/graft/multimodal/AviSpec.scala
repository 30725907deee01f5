package graft.multimodal

import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

/** The REAL video decode path: `Avi` is an actual AVI (RIFF)
  * container codec with uncompressed 24-bit DIB frames. Pins the
  * container format — RIFF tree walk, avih/strf header parse,
  * bottom-up row flip with stride padding per frame, word alignment —
  * loud rejection of non-AVI bytes, and the frame-sampling seam. */
class AviSpec extends SparkTestBase with Matchers {

  test("encode/decode round-trips BGR frames, header fields, frame order") {
    val rng = new scala.util.Random(7)
    // width 3 -> stride 12 vs row 9: padding is actually exercised
    val frames = Seq.fill(4)(Array.fill(3 * 2 * 3)(rng.nextInt(256).toByte))
    val v = Avi.decode(Avi.encode(3, 2, 40000, frames))
    v.width shouldBe 3
    v.height shouldBe 2
    v.usecPerFrame shouldBe 40000
    v.frames.size shouldBe 4
    v.frames.zip(frames).foreach { case (got, want) => got shouldBe want }
  }

  test("encodeGray replicates channels; luma of gray == the gray byte") {
    val gray = Array.tabulate(8 * 5)(i => (i * 7 % 256).toByte)
    val v = Avi.decode(Avi.encodeGray(8, 5, 33333, Seq(gray)))
    val px = v.frames.head
    (0 until gray.length).foreach { i =>
      px(i * 3) shouldBe gray(i)
      px(i * 3 + 1) shouldBe gray(i)
      px(i * 3 + 2) shouldBe gray(i)
      Bmp.luma(px(i * 3) & 0xff, px(i * 3 + 1) & 0xff,
        px(i * 3 + 2) & 0xff) shouldBe (gray(i) & 0xff)
    }
  }

  test("rejects non-AVI bytes loudly: wrong magic, WAV RIFF, truncation") {
    an[IllegalArgumentException] should be thrownBy
      Avi.decode("not a video".getBytes)
    // a valid RIFF that is WAVE, not AVI
    an[IllegalArgumentException] should be thrownBy
      Avi.decode(Wav.encode(8000, 1, Array[Short](1, 2, 3)))
    // truncated mid-frame: the chunk walker must not read past the end
    val good = Avi.encode(3, 2, 40000,
      Seq(Array.fill(18)(1.toByte), Array.fill(18)(2.toByte)))
    an[IllegalArgumentException] should be thrownBy
      Avi.decode(good.take(good.length - 30))
  }

  test("decodeAviFrames samples every kth frame with exact luma sums") {
    val ss = spark
    import ss.implicits._
    // 5 frames of 2x1 gray: frame f is all bytes (10*f+1); sampled
    // frames {0,2,4} -> luma sum = 2*(1 + 21 + 41) = 126
    val frames = (0 until 5).map(f => Array.fill(2)((10 * f + 1).toByte))
    val bytes = Avi.encodeGray(2, 1, 40000, frames)
    val assets = Seq(Asset(7L, "video/avi", bytes, 2, 1)).toDS()
    val out = Multimodal.decodeAviFrames(assets, sampleEvery = 2).head()
    out.asset_id shouldBe 7L
    out.width shouldBe 2
    out.height shouldBe 1
    out.n_frames shouldBe 5
    out.usec_per_frame shouldBe 40000
    out.n_sampled shouldBe 3
    out.sampled_pixels shouldBe 6L
    out.sampled_luma_sum shouldBe 126L
    // sampleEvery = 1 sees every frame: 2*(1+11+21+31+41) = 210
    Multimodal.decodeAviFrames(assets, sampleEvery = 1)
      .head().sampled_luma_sum shouldBe 210L
  }

  test("sniffMediaType recognizes the AVI container beside WAV") {
    val ss = spark
    import ss.implicits._
    val avi = Avi.encode(3, 2, 40000, Seq(Array.fill(18)(0.toByte)))
    val wav = Wav.encode(8000, 1, Array[Short](0, 1))
    val out = Seq(("avi", avi), ("wav", wav), ("junk", "RIFFxxxxJUNK".getBytes))
      .toDF("tag", "bytes")
      .select(org.apache.spark.sql.functions.col("tag"),
        Multimodal.sniffMediaType(
          org.apache.spark.sql.functions.col("bytes")).as("sniffed"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    out("avi") shouldBe "video/avi"
    out("wav") shouldBe "audio/wav"
    out("junk") shouldBe "application/octet-stream"
  }
}
