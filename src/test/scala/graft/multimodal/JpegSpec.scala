package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Baseline JPEG decoder against fixtures built from the published
  * spec tables (T.81 Annex K.3.1 DC Huffman table, hand-assembled
  * markers, DC-only blocks whose IDCT is EXACT) plus the JDK's own
  * ImageIO codec as an independent encoder/decoder reference. */
class JpegSpec extends AnyFunSuite with Matchers {

  // ---- fixture builder: markers + Huffman bit writer (test-only) ----

  /** T.81 Annex K.3.1: typical luminance DC table (categories 0-11). */
  private val DcBits = Array(0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcVals = (0 to 11).toArray
  /** Minimal AC table: two 2-bit codes — 00 = EOB (0x00), 01 = 0x01. */
  private val AcBits = Array(0, 0, 2, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
  private val AcVals = Array(0x00, 0x01)

  /** Canonical code assignment (same construction the decoder uses). */
  private def codesOf(bits: Array[Int], vals: Array[Int]): Map[Int, (Int, Int)] = {
    var code = 0; var k = 0
    val m = scala.collection.mutable.Map.empty[Int, (Int, Int)]
    for (l <- 1 to 16) {
      for (_ <- 0 until bits(l)) { m(vals(k)) = (code, l); code += 1; k += 1 }
      code <<= 1
    }
    m.toMap
  }

  private final class BitWriter {
    private val out = new ByteArrayOutputStream
    private var cur = 0; private var n = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        cur = (cur << 1) | ((code >> i) & 1); n += 1
        if (n == 8) { out.write(cur); if (cur == 0xff) out.write(0x00); cur = 0; n = 0 }
        i -= 1
      }
    }
    def flushOnes(): Unit = if (n > 0) put((1 << (8 - n)) - 1, 8 - n)
    def bytes: Array[Byte] = out.toByteArray
  }

  private def seg(marker: Int, body: Array[Int]): Array[Byte] = {
    val len = body.length + 2
    (Array(0xff, marker, len >> 8, len & 0xff) ++ body).map(_.toByte)
  }
  private def dht(tc: Int, th: Int, bits: Array[Int], vals: Array[Int]) =
    seg(0xc4, Array((tc << 4) | th) ++ bits.drop(1) ++ vals)

  /** Grayscale baseline JPEG of whole 8×8 blocks, each flat at the
    * given gray — DC-only, quant all 1s, so decode is EXACT:
    * DC = 8·(g−128) ⇒ IDCT = g everywhere. Optional restart interval
    * exercises RSTn handling + DC-predictor resets. */
  private def dcJpeg(blocksW: Int, blocksH: Int, grays: Seq[Int],
                     dri: Int = 0, quant: Array[Int] = Array.fill(64)(1),
                     acSyms: Seq[(Int, Int)] = Nil): Array[Byte] = {
    require(grays.length == blocksW * blocksH)
    val w = blocksW * 8; val h = blocksH * 8
    val dcCodes = codesOf(DcBits, DcVals)
    val acCodes = codesOf(AcBits, AcVals)
    val head = Array(0xff.toByte, 0xd8.toByte) ++
      seg(0xdb, Array(0x00) ++ quant) ++
      (if (dri > 0) seg(0xdd, Array(dri >> 8, dri & 0xff)) else Array.empty[Byte]) ++
      seg(0xc0, Array(8, h >> 8, h & 0xff, w >> 8, w & 0xff, 1, 1, 0x11, 0)) ++
      dht(0, 0, DcBits, DcVals) ++ dht(1, 0, AcBits, AcVals) ++
      seg(0xda, Array(1, 1, 0x00, 0, 63, 0))
    var bw = new BitWriter
    val ecs = new ByteArrayOutputStream
    var pred = 0; var sinceRst = 0; var rstN = 0
    grays.foreach { g =>
      if (dri > 0 && sinceRst == dri) {
        bw.flushOnes(); ecs.write(bw.bytes)
        ecs.write(0xff); ecs.write(0xd0 + rstN)
        bw = new BitWriter
        rstN = (rstN + 1) % 8; sinceRst = 0; pred = 0
      }
      val dc = 8 * (g - 128)
      val diff = dc - pred; pred = dc
      val t = if (diff == 0) 0 else 32 - Integer.numberOfLeadingZeros(math.abs(diff))
      val (c, l) = dcCodes(t)
      bw.put(c, l)
      if (t > 0) bw.put(if (diff < 0) diff + (1 << t) - 1 else diff, t)
      acSyms.foreach { case (sym, vbits) => // (run/size symbol, raw value bits)
        val (ac, al) = acCodes(sym); bw.put(ac, al)
        bw.put(vbits, sym & 0xf)
      }
      val (ec, el) = acCodes(0x00) // EOB
      bw.put(ec, el)
      sinceRst += 1
    }
    bw.flushOnes(); ecs.write(bw.bytes)
    head ++ ecs.toByteArray ++ Array(0xff.toByte, 0xd9.toByte)
  }

  test("DC-only fixture decodes EXACTLY: per-block flat grays, " +
    "DC prediction chain across blocks") {
    val grays = Seq(0, 128, 200, 255)
    val r = Jpeg.decode(dcJpeg(2, 2, grays))
    r.width shouldBe 16; r.height shouldBe 16
    for (y <- 0 until 16; x <- 0 until 16) {
      val want = grays((y / 8) * 2 + x / 8)
      val o = (y * 16 + x) * 3
      (r.pixels(o) & 0xff, r.pixels(o + 1) & 0xff, r.pixels(o + 2) & 0xff)
        .shouldBe((want, want, want))
    }
  }

  test("encodeGrayBlocks (the production fixture encoder) round-trips " +
    "exactly through decode") {
    val grays = Array(7, 130, 255, 0, 64, 199)
    val r = Jpeg.decode(Jpeg.encodeGrayBlocks(3, 2, grays))
    r.width shouldBe 24; r.height shouldBe 16
    for (y <- 0 until 16; x <- 0 until 24)
      (r.pixels((y * 24 + x) * 3) & 0xff) shouldBe grays((y / 8) * 3 + x / 8)
  }

  test("restart intervals: RSTn consumed at boundaries, DC predictors reset") {
    val grays = Seq(10, 250, 60, 130, 201, 7)
    val r = Jpeg.decode(dcJpeg(3, 2, grays, dri = 2))
    for (bi <- grays.indices) {
      val bx = bi % 3; val by = bi / 3
      val o = ((by * 8 + 3) * 24 + bx * 8 + 4) * 3 // sample mid-block
      (r.pixels(o) & 0xff) shouldBe grays(bi)
    }
  }

  test("single AC coefficient through a real quant table: hand IDCT row") {
    // F(u=1,v=0) = +1, dequantized by q[zigzag 1] = 255 -> the
    // hand-computed horizontal cosine ramp, identical on every row
    val quant = Array.fill(64)(1); quant(1) = 255
    val bytes = dcJpeg(1, 1, Seq(128), quant = quant,
      acSyms = Seq((0x01, 1))) // run 0, size 1, value bit 1 -> +1
    val r = Jpeg.decode(bytes)
    val want = Seq(172, 165, 153, 137, 119, 103, 91, 84)
    for (y <- 0 until 8; x <- 0 until 8)
      (r.pixels((y * 8 + x) * 3) & 0xff) shouldBe want(x)
  }

  test("ImageIO cross-validation: gray and RGB round through the JDK " +
    "encoder into this decoder within codec tolerance") {
    def viaImageIo(img: BufferedImage): (Array[Byte], BufferedImage) = {
      val bos = new ByteArrayOutputStream
      ImageIO.write(img, "jpg", bos) shouldBe true
      val b = bos.toByteArray
      (b, ImageIO.read(new ByteArrayInputStream(b)))
    }
    // grayscale: single component, no chroma upsampling in play —
    // only IDCT implementation variance remains (spec allows ±1-2).
    // Compare RAW raster samples: TYPE_BYTE_GRAY is a LINEAR color
    // space, so getRGB would run an sRGB transform this decoder
    // (correctly) does not.
    val gray = new BufferedImage(24, 16, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 16; x <- 0 until 24)
      gray.getRaster.setSample(x, y, 0, (x * 7 + y * 5) % 256)
    val (gb, gref) = viaImageIo(gray)
    val gr = Jpeg.decode(gb)
    gr.width shouldBe 24; gr.height shouldBe 16
    var gMax = 0
    for (y <- 0 until 16; x <- 0 until 24) {
      val mine = gr.pixels((y * 24 + x) * 3) & 0xff
      val ref = gref.getRaster.getSample(x, y, 0)
      gMax = math.max(gMax, math.abs(mine - ref))
    }
    gMax should be <= 2

    // smooth RGB gradient: 4:2:0 chroma + fancy-vs-nearest upsampling
    // differences stay small on smooth content
    val rgb = new BufferedImage(32, 24, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 24; x <- 0 until 32)
      rgb.setRGB(x, y, ((x * 8) << 16) | ((y * 10) << 8) | (255 - x * 4))
    val (cb, cref) = viaImageIo(rgb)
    val cr = Jpeg.decode(cb)
    cr.width shouldBe 32; cr.height shouldBe 24
    var sum = 0L; var n = 0; var cMax = 0
    for (y <- 0 until 24; x <- 0 until 32; ch <- 0 until 3) {
      val o = (y * 32 + x) * 3
      val mine = cr.pixels(o + ch) & 0xff // BGR
      val rr = cref.getRGB(x, y)
      val ref = ch match {
        case 0 => rr & 0xff; case 1 => (rr >> 8) & 0xff
        case _ => (rr >> 16) & 0xff
      }
      sum += math.abs(mine - ref); n += 1
      cMax = math.max(cMax, math.abs(mine - ref))
    }
    (sum.toDouble / n) should be <= 2.0
    cMax should be <= 24 // chroma-edge upsampling differences, bounded
  }

  test("loud rejections: progressive, arithmetic, truncation, bad magic") {
    val progressive = Array(0xff, 0xd8, 0xff, 0xc2, 0x00, 0x0b,
      8, 0, 8, 0, 8, 1, 1, 0x11, 0).map(_.toByte)
    intercept[IllegalArgumentException](Jpeg.decode(progressive))
      .getMessage should include("progressive")
    val arith = Array(0xff, 0xd8, 0xff, 0xc9, 0x00, 0x0b,
      8, 0, 8, 0, 8, 1, 1, 0x11, 0).map(_.toByte)
    intercept[IllegalArgumentException](Jpeg.decode(arith))
      .getMessage should include("arithmetic")
    intercept[IllegalArgumentException](
      Jpeg.decode(Array(0x00, 0x01, 0x02, 0x03, 0x04).map(_.toByte)))
      .getMessage should include("magic")
    val ok = dcJpeg(1, 1, Seq(100))
    intercept[IllegalArgumentException](Jpeg.decode(ok.dropRight(6)))
  }

  test("sniffMediaType classifies JPEG bytes") {
    import org.apache.spark.sql.functions.col
    val spark = graft.SparkTestBase.spark
    import spark.implicits._
    val df = Seq(dcJpeg(1, 1, Seq(1))).toDF("bytes")
    df.select(Multimodal.sniffMediaType(col("bytes")))
      .head().getString(0) shouldBe "image/jpeg"
  }
}
