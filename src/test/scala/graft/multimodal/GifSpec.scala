package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** GIF codec: LZW roundtrips (dict growth, cScSc, full-dictionary
  * CLEAR reset), palette mapping to the shared BGR raster, extension
  * walking, and loud structural rejection. */
class GifSpec extends AnyFunSuite with Matchers {

  private def palette(f: Int => (Int, Int, Int)): Array[Byte] =
    Array.tabulate(768) { j =>
      val (r, g, b) = f(j / 3)
      (j % 3 match { case 0 => r; case 1 => g; case 2 => b }).toByte
    }

  private val testPal = palette(i => (i, (i * 7) % 256, 255 - i))

  test("indexed roundtrip is bit-exact on mixed content") {
    val (w, h) = (13, 9)
    val idx = Array.tabulate(w * h)(i => ((i * 31 + 7) % 256).toByte)
    val d = Gif.decodeIndexed(Gif.encode(w, h, idx, testPal))
    d.width shouldBe w
    d.height shouldBe h
    d.indices shouldBe idx
    d.palette shouldBe testPal
  }

  test("decode maps indices through the file's own palette to BGR") {
    val idx = Array[Byte](0, 1, 100.toByte, 255.toByte)
    val r = Gif.decode(Gif.encode(4, 1, idx, testPal))
    r.width shouldBe 4
    for (p <- 0 until 4) {
      val i = idx(p) & 0xff
      (r.pixels(p * 3) & 0xff) shouldBe (255 - i)       // B
      (r.pixels(p * 3 + 1) & 0xff) shouldBe ((i * 7) % 256) // G
      (r.pixels(p * 3 + 2) & 0xff) shouldBe i           // R
    }
  }

  test("cScSc corner: long single-symbol runs roundtrip") {
    // 'aaaa...' makes the decoder hit code == next repeatedly
    val idx = Array.fill(1000)(65.toByte)
    Gif.decodeIndexed(Gif.encode(100, 10, idx, testPal)).indices shouldBe idx
  }

  test("dictionary overflow forces a CLEAR reset and still roundtrips") {
    // ~26k pixels of high-variety content blows past 4096 dict slots
    val (w, h) = (160, 163)
    val idx = Array.tabulate(w * h)(i => (((i * i + 13 * i + 5) >> 3) % 256).toByte)
    Gif.decodeIndexed(Gif.encode(w, h, idx, testPal)).indices shouldBe idx
  }

  test("1x1 and single-row/column images roundtrip") {
    for ((w, h) <- Seq((1, 1), (1, 7), (7, 1))) {
      val idx = Array.tabulate(w * h)(i => ((i * 53) % 256).toByte)
      Gif.decodeIndexed(Gif.encode(w, h, idx, testPal)).indices shouldBe idx
    }
  }

  test("decoder walks extension blocks it did not write") {
    val idx = Array.tabulate(24)(i => (i * 11 % 256).toByte)
    val enc = Gif.encode(6, 4, idx, testPal)
    // splice a graphic-control extension between GCT and descriptor:
    // header 6 + LSD 7 + GCT 768 = 781
    val ext = Array[Byte](0x21, 0xf9.toByte, 4, 0, 10, 0, 0, 0)
    val spliced = enc.take(781) ++ ext ++ enc.drop(781)
    Gif.decodeIndexed(spliced).indices shouldBe idx
  }

  test("corruption fails loudly: bad signature, interlace flag, truncation") {
    val good = Gif.encode(5, 5, Array.tabulate(25)(_.toByte), testPal)
    val badSig = good.clone(); badSig(0) = 'X'.toByte
    an[IllegalArgumentException] should be thrownBy Gif.decode(badSig)
    val interlaced = good.clone()
    interlaced(781 + 9) = (interlaced(781 + 9) | 0x40).toByte
    an[IllegalArgumentException] should be thrownBy Gif.decode(interlaced)
    an[Exception] should be thrownBy Gif.decode(good.take(600))
  }

  test("sniff recognizes GIF magic and dispatch routes it (shared seam)") {
    Gif.encode(2, 2, Array[Byte](1, 2, 3, 4), testPal)
      .take(4) shouldBe "GIF8".getBytes
  }
}
