package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** PNG codec: filter-cycling roundtrips, gray expansion, CRC and
  * structure rejection, and the shared-raster contract with the BMP
  * feature ops. */
class PngSpec extends AnyFunSuite with Matchers {

  private def deterministicBgr(w: Int, h: Int): Array[Byte] =
    Array.tabulate(w * h * 3)(i => ((i * 31 + 7) % 251).toByte)

  test("truecolor roundtrip is bit-exact through all five cycled filters") {
    // 7 rows > 5 filter types: every unfilter path runs at least once
    val (w, h) = (5, 7)
    val bgr = deterministicBgr(w, h)
    val r = Png.decode(Png.encode(w, h, bgr))
    r.width shouldBe w
    r.height shouldBe h
    r.pixels shouldBe bgr
  }

  test("grayscale roundtrip expands to b = g = r") {
    val (w, h) = (4, 6)
    val gray = Array.tabulate(w * h)(i => ((i * 53 + 11) % 256).toByte)
    val r = Png.decode(Png.encodeGray(w, h, gray))
    r.width shouldBe w
    r.height shouldBe h
    for (i <- 0 until w * h; c <- 0 until 3)
      r.pixels(i * 3 + c) shouldBe gray(i)
  }

  test("1x1 and single-row/column images roundtrip") {
    for ((w, h) <- Seq((1, 1), (1, 9), (9, 1))) {
      val bgr = deterministicBgr(w, h)
      Png.decode(Png.encode(w, h, bgr)).pixels shouldBe bgr
    }
  }

  test("corruption fails loudly: bad magic, flipped pixel byte (CRC), truncation") {
    val good = Png.encode(3, 3, deterministicBgr(3, 3))
    val badMagic = good.clone(); badMagic(0) = 'X'.toByte
    an[IllegalArgumentException] should be thrownBy Png.decode(badMagic)
    // flip one byte inside the IDAT payload: chunk CRC must catch it
    val flipped = good.clone(); flipped(good.length - 20) =
      (flipped(good.length - 20) ^ 0x5a).toByte
    an[IllegalArgumentException] should be thrownBy Png.decode(flipped)
    an[IllegalArgumentException] should be thrownBy
      Png.decode(good.take(good.length - 8))
  }

  test("decoded PNG raster feeds the shared BMP ops (luma stats, dhash, resize)") {
    val (w, h) = (9, 8)
    val bgr = deterministicBgr(w, h)
    val viaPng = Png.decode(Png.encode(w, h, bgr))
    val viaBmp = Bmp.decode(Bmp.encode(w, h, bgr))
    // identical rasters -> identical stats/hash whatever the container
    Bmp.lumaStats(viaPng, 16)._1 shouldBe Bmp.lumaStats(viaBmp, 16)._1
    Bmp.lumaStats(viaPng, 16)._2 shouldBe Bmp.lumaStats(viaBmp, 16)._2
    Bmp.dhash64(viaPng) shouldBe Bmp.dhash64(viaBmp)
    Bmp.resizeNearest(viaPng, 4, 4).pixels shouldBe
      Bmp.resizeNearest(viaBmp, 4, 4).pixels
  }
}
