package graft.multimodal

import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

/** The REAL decode path: `Bmp` is an actual 24-bit BMP codec, not a
  * stand-in. These tests pin the file format itself — magic,
  * little-endian headers, bottom-up row order, stride padding,
  * top-down (negative-height) files, and loud rejection of anything
  * the decoder cannot faithfully decode. */
class BmpSpec extends SparkTestBase with Matchers {

  test("encode/decode round-trips arbitrary BGR pixels across padded strides") {
    // widths 1..6 cover every stride-padding residue (w*3 mod 4)
    for (w <- 1 to 6; h <- Seq(1, 3, 5)) {
      val rng = new scala.util.Random(42 + w * 10 + h)
      val bgr = Array.fill(w * h * 3)(rng.nextInt(256).toByte)
      val raster = Bmp.decode(Bmp.encode(w, h, bgr))
      raster.width shouldBe w
      raster.height shouldBe h
      raster.pixels shouldBe bgr
    }
  }

  test("decode handles a hand-authored top-down (negative height) file") {
    // 2x2 top-down BMP built byte by byte — the layout an external
    // tool could hand us, never produced by our own encoder
    val stride = 8 // 2*3 rounded up to 4
    val bytes = new Array[Byte](14 + 40 + stride * 2)
    bytes(0) = 'B'; bytes(1) = 'M'
    def i32(off: Int, v: Int): Unit = {
      bytes(off) = (v & 0xff).toByte
      bytes(off + 1) = ((v >> 8) & 0xff).toByte
      bytes(off + 2) = ((v >> 16) & 0xff).toByte
      bytes(off + 3) = ((v >> 24) & 0xff).toByte
    }
    i32(2, bytes.length); i32(10, 54); i32(14, 40)
    i32(18, 2); i32(22, -2) // width 2, height -2 => top-down
    bytes(26) = 1; bytes(28) = 24
    // row 0 (image top, first in file because top-down)
    val px = Array[Byte](10, 20, 30, 40, 50, 60)
    px.copyToArray(bytes, 54)
    val px2 = Array[Byte](70, 80, 90, 100, 110, 120)
    px2.copyToArray(bytes, 54 + stride)
    val raster = Bmp.decode(bytes)
    raster.width shouldBe 2
    raster.height shouldBe 2
    raster.pixels shouldBe (px ++ px2)
  }

  test("decode rejects non-BMP and unsupported variants loudly") {
    val good = Bmp.encode(3, 2, Array.fill(18)(7.toByte))
    an[IllegalArgumentException] should be thrownBy
      Bmp.decode("not a bitmap at all".getBytes)
    an[IllegalArgumentException] should be thrownBy
      Bmp.decode(good.take(30)) // truncated mid-header
    val badBpp = good.clone(); badBpp(28) = 32
    an[IllegalArgumentException] should be thrownBy Bmp.decode(badBpp)
    val badComp = good.clone(); badComp(30) = 1 // BI_RLE8
    an[IllegalArgumentException] should be thrownBy Bmp.decode(badComp)
    val badMagic = good.clone(); badMagic(0) = 'X'
    an[IllegalArgumentException] should be thrownBy Bmp.decode(badMagic)
  }

  test("gray pixels round-trip bit-exact through BT.601 luma") {
    for (g <- 0 until 256) Bmp.luma(g, g, g) shouldBe g
    // and a non-gray sanity point: pure red
    Bmp.luma(0, 0, 255) shouldBe (255 * 299) / 1000
  }

  test("lumaStats: histogram covers every pixel, sum is exact") {
    val gray = Array.tabulate(256)(_.toByte) // one pixel per gray level
    val raster = Bmp.decode(Bmp.encodeGray(16, 16, gray))
    val (hist, sum) = Bmp.lumaStats(raster, 16)
    hist.sum shouldBe 256L
    hist.toSeq shouldBe Seq.fill(16)(16L) // 16 levels per bin
    sum shouldBe (0 until 256).sum.toLong
  }

  test("resizeNearest floor-samples the source grid") {
    // 4x2 gray ramp: row0 = 0,10,20,30; row1 = 100,110,120,130
    val src = Bmp.decode(Bmp.encodeGray(4, 2,
      Array[Byte](0, 10, 20, 30, 100, 110, 120, 130.toByte)))
    val out = Bmp.resizeNearest(src, 2, 1)
    out.pixels.grouped(3).map(_.head).toSeq shouldBe Seq(0.toByte, 20.toByte)
    // identity resize is a no-op
    Bmp.resizeNearest(src, 4, 2).pixels shouldBe src.pixels
  }

  test("resizeBmp bounds the longest side, never upscales, file matches metadata") {
    val ss = spark
    import ss.implicits._
    val assets = Seq(
      Asset(1L, "image/bmp", Bmp.encodeGray(8, 4,
        Array.tabulate(32)(_.toByte)), 0, 0), // downscaled to 4x2
      Asset(2L, "image/bmp", Bmp.encodeGray(3, 2,
        Array.tabulate(6)(_.toByte)), 0, 0)   // already within bound
    ).toDS()
    val out = Multimodal.resizeBmp(assets, maxDim = 4)
      .collect().sortBy(_.asset_id)
    out(0).width shouldBe 4
    out(0).height shouldBe 2
    val r1 = Bmp.decode(out(0).bytes) // re-encoded file agrees with metadata
    (r1.width, r1.height) shouldBe ((4, 2))
    // floor sampling: out(x,y) = src(2x, 2y) -> gray = 2x + 16y
    r1.pixels.grouped(3).map(_.head & 0xff).toSeq shouldBe
      Seq(0, 2, 4, 6, 16, 18, 20, 22)
    out(1).width shouldBe 3 // untouched, but metadata now reflects the file
    out(1).bytes shouldBe assets.collect().sortBy(_.asset_id).apply(1).bytes
  }

  test("decodeBmpFeatures: dimensions come from the parsed header, no shuffle") {
    val ss = spark
    import ss.implicits._
    val assets = (1 to 12).map { i =>
      val w = 3 + i % 5; val h = 2 + i % 3
      val gray = Array.tabulate(w * h)(j => ((i * 31 + j * 7) % 256).toByte)
      // metadata width/height deliberately wrong: the decoder must
      // report what the FILE says, not what the row claims
      Asset(i.toLong, "image/bmp", Bmp.encodeGray(w, h, gray), 0, 0)
    }.toDS().repartition(3)
    val feats = Multimodal.decodeBmpFeatures(assets)
    feats.rdd.getNumPartitions shouldBe 3
    val rows = feats.collect().sortBy(_.asset_id)
    rows.length shouldBe 12
    rows.foreach { f =>
      val i = f.asset_id.toInt
      f.width shouldBe 3 + i % 5
      f.height shouldBe 2 + i % 3
      f.n_pixels shouldBe f.width.toLong * f.height
      f.histogram.sum shouldBe f.n_pixels
      // gray image: luma == gray, so the exact sum replays from the source
      f.sum_luma shouldBe (0 until f.n_pixels.toInt)
        .map(j => (i * 31 + j * 7) % 256).sum.toLong
    }
  }

  test("dhash64: hand computation on an already-9x8 gray raster") {
    // gray(x, y) = x * 10 + y: strictly increasing rightward, so EVERY
    // right neighbor is brighter and all 64 bits set
    val up = Array.tabulate(72)(i => ((i % 9) * 10 + i / 9).toByte)
    Bmp.dhash64(Bmp.decode(Bmp.encodeGray(9, 8, up))) shouldBe -1L
    // strictly decreasing rightward: no bit set
    val down = Array.tabulate(72)(i => (200 - (i % 9) * 10).toByte)
    Bmp.dhash64(Bmp.decode(Bmp.encodeGray(9, 8, down))) shouldBe 0L
    // one brighter pixel at thumbnail (x=3, y=2): bit 2*8+3 set from
    // the rise into it, bit 2*8+2... rise is at comparison x=2 (p[3]>p[2])
    // and fall at x=3 (p[4]<p[3]) => only bit k=2*8+2 is set
    val flat = Array.fill(72)(50.toByte)
    flat(2 * 9 + 3) = 90.toByte
    Bmp.dhash64(Bmp.decode(Bmp.encodeGray(9, 8, flat))) shouldBe (1L << 18)
  }

  test("dhash64: invariant under uniform brightness shift, flips few bits on local edits") {
    val rng = new scala.util.Random(7)
    for (_ <- 1 to 5) {
      val w = 10 + rng.nextInt(20); val h = 8 + rng.nextInt(12)
      val gray = Array.fill(w * h)((32 + rng.nextInt(90)).toByte)
      val code = Bmp.dhash64(Bmp.decode(Bmp.encodeGray(w, h, gray)))
      // +20 everywhere: every gradient comparison unchanged
      val lifted = gray.map(g => ((g & 0xff) + 20).toByte)
      Bmp.dhash64(Bmp.decode(Bmp.encodeGray(w, h, lifted))) shouldBe code
      // one edited source pixel flips at most 2 of the 64 bits (it can
      // reach at most one thumbnail cell => 2 adjacent comparisons)
      val edited = gray.clone(); edited(rng.nextInt(w * h)) = 255.toByte
      val hd = java.lang.Long.bitCount(
        code ^ Bmp.dhash64(Bmp.decode(Bmp.encodeGray(w, h, edited))))
      hd should be <= 2
    }
  }

  test("decodeBmpPatches: exact grid cells, partial edges, " +
    "luma sums replay from the source bytes") {
    val ss = spark
    import ss.implicits._
    // 5x3 gray image, gray(x, y) = y*5 + x; patch=2 -> 2x3 grid with
    // partial right column (w=1) and partial bottom row (h=1)
    val gray = Array.tabulate(15)(_.toByte)
    val assets = Seq(
      Asset(1L, "image/bmp", Bmp.encodeGray(5, 3, gray), 5, 3)).toDS()
    val out = Multimodal.decodeBmpPatches(assets, patch = 2)
      .collect().map(p => (p.patch_row, p.patch_col) ->
        ((p.n_px, p.luma_sum))).toMap
    assert(out.size == 6)
    // (0,0): pixels {0,1,5,6} sum 12; (0,2): col 4, rows 0-1: 4+9
    assert(out((0, 0)) == ((4L, 12L)))
    assert(out((0, 1)) == ((4L, 2L + 3L + 7L + 8L)))
    assert(out((0, 2)) == ((2L, 13L)))
    // bottom row partial: (1,0): {10,11}; (1,1): {12,13}; (1,2): {14}
    assert(out((1, 0)) == ((2L, 21L)))
    assert(out((1, 1)) == ((2L, 25L)))
    assert(out((1, 2)) == ((1L, 14L)))
  }
}
