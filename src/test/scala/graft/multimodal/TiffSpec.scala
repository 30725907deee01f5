package graft.multimodal

import java.io.ByteArrayOutputStream

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Baseline TIFF codec: lossless RGB roundtrips through the
  * little-endian encoder, a hand-assembled BIG-endian multi-strip
  * grayscale fixture (the path the encoder never exercises), and loud
  * rejection of everything outside the supported baseline. */
class TiffSpec extends AnyFunSuite with Matchers {

  // ---- big-endian fixture writer (test-only) ----
  private final class BE {
    val out = new ByteArrayOutputStream
    def b(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { b(v >>> 8); b(v) }
    def u32(v: Int): Unit = { u16(v >>> 16); u16(v & 0xffff) }
    def bytes: Array[Byte] = out.toByteArray
  }

  /** 3x2 grayscale, TWO strips of one row each, "MM" byte order:
    * row0 = 10,20,30; row1 = 200,210,220. Strip offset/count arrays
    * live OUTSIDE the IFD (count 2 LONGs > 4 bytes), exercising the
    * offset-indirection path. */
  private def mmGrayFixture: Array[Byte] = {
    val w = new BE
    w.b('M'); w.b('M'); w.u16(42); w.u32(30) // header; IFD at 30
    Seq(10, 20, 30, 200, 210, 220).foreach(w.b) // strips at 8 and 11
    w.u32(8); w.u32(11)  // strip offsets array at 14
    w.u32(3); w.u32(3)   // strip byte counts array at 22
    // IFD at 30: 9 entries
    w.u16(9)
    def shortEntry(tag: Int, v: Int): Unit = {
      w.u16(tag); w.u16(3); w.u32(1); w.u16(v); w.u16(0)
    }
    shortEntry(256, 3)                         // width
    shortEntry(257, 2)                         // height
    shortEntry(258, 8)                         // bits
    shortEntry(259, 1)                         // no compression
    shortEntry(262, 1)                         // gray BlackIsZero
    w.u16(273); w.u16(4); w.u32(2); w.u32(14)  // strip offsets -> 14
    shortEntry(277, 1)                         // samples per pixel
    shortEntry(278, 1)                         // rows per strip
    w.u16(279); w.u16(4); w.u32(2); w.u32(22)  // byte counts -> 22
    w.u32(0)                                   // no next IFD
    w.bytes
  }

  test("decode: big-endian multi-strip grayscale hand fixture") {
    val r = Tiff.decode(mmGrayFixture)
    r.width shouldBe 3
    r.height shouldBe 2
    val px = r.pixels.grouped(3).map(g =>
      (g(2) & 0xff, g(1) & 0xff, g(0) & 0xff)).toSeq
    // gray expands to b = g = r
    px shouldBe Seq((10, 10, 10), (20, 20, 20), (30, 30, 30),
      (200, 200, 200), (210, 210, 210), (220, 220, 220))
  }

  test("roundtrip: decode(encode(x)) == x for chunky RGB") {
    for ((w, h) <- Seq((1, 1), (7, 4), (16, 9))) {
      val n = w * h
      val bgr = Array.tabulate(n * 3)(i => ((i * 37 + 11) % 256).toByte)
      val decoded = Tiff.decode(Tiff.encode(w, h, bgr))
      decoded.width shouldBe w
      decoded.height shouldBe h
      decoded.pixels.toSeq shouldBe bgr.toSeq
    }
  }

  test("encode: odd strip lengths pad so IFD/value-array offsets stay " +
    "word-aligned (TIFF 6.0 offset rule)") {
    for ((w, h) <- Seq((1, 1), (3, 3), (5, 1))) { // w*h*3 odd
      val bgr = Array.tabulate(w * h * 3)(i => ((i * 31 + 3) % 256).toByte)
      val b = Tiff.encode(w, h, bgr)
      val ifd = (b(4) & 0xff) | ((b(5) & 0xff) << 8) |
        ((b(6) & 0xff) << 16) | ((b(7) & 0xff) << 24)
      ifd % 2 shouldBe 0
      // the out-of-entry BitsPerSample array sits 6 bytes before the IFD
      (ifd - 6) % 2 shouldBe 0
      Tiff.decode(b).pixels.toSeq shouldBe bgr.toSeq // padding is inert
    }
  }

  test("rejects: value-array offset past EOF fails loudly, not AIOOBE") {
    val good = Tiff.encode(4, 3, Array.fill(36)(5.toByte))
    val b = good.clone()
    val ifd = (b(4) & 0xff) | ((b(5) & 0xff) << 8) |
      ((b(6) & 0xff) << 16) | ((b(7) & 0xff) << 24)
    val n = (b(ifd) & 0xff) | ((b(ifd + 1) & 0xff) << 8)
    (0 until n).foreach { k =>
      val e = ifd + 2 + k * 12
      val t = (b(e) & 0xff) | ((b(e + 1) & 0xff) << 8)
      if (t == 258) { // BitsPerSample: count 3 SHORTs -> offset-valued
        b(e + 8) = 0xff.toByte; b(e + 9) = 0xff.toByte
        b(e + 10) = 0xff.toByte; b(e + 11) = 0x7f.toByte
      }
    }
    val ex = the[IllegalArgumentException] thrownBy Tiff.decode(b)
    ex.getMessage should include("out of bounds")
  }

  test("rejects: compression, tiles, planar, palette, 16-bit, bad header") {
    val good = Tiff.encode(4, 3, Array.fill(36)(5.toByte))
    an[IllegalArgumentException] should be thrownBy
      Tiff.decode("XX".getBytes ++ good.drop(2))
    an[IllegalArgumentException] should be thrownBy
      Tiff.decode(good.take(6))
    def patched(tag: Int, newValue: Int): Array[Byte] = {
      // entries start at ifd+2; SHORT value sits at entry+8 (LE)
      val b = good.clone()
      val ifd = (b(4) & 0xff) | ((b(5) & 0xff) << 8) |
        ((b(6) & 0xff) << 16) | ((b(7) & 0xff) << 24)
      val n = (b(ifd) & 0xff) | ((b(ifd + 1) & 0xff) << 8)
      (0 until n).foreach { k =>
        val e = ifd + 2 + k * 12
        val t = (b(e) & 0xff) | ((b(e + 1) & 0xff) << 8)
        if (t == tag) {
          b(e + 8) = (newValue & 0xff).toByte
          b(e + 9) = ((newValue >>> 8) & 0xff).toByte
        }
      }
      b
    }
    an[IllegalArgumentException] should be thrownBy
      Tiff.decode(patched(259, 5))   // LZW compression
    an[IllegalArgumentException] should be thrownBy
      Tiff.decode(patched(284, 2))   // planar layout
    an[IllegalArgumentException] should be thrownBy
      Tiff.decode(patched(262, 3))   // palette
  }

  test("sniff magic: encoder output starts II*\\0") {
    Tiff.encode(1, 1, Array[Byte](1, 2, 3)).take(4).toSeq shouldBe
      Seq('I'.toByte, 'I'.toByte, 42.toByte, 0.toByte)
  }
}
