package graft.multimodal

import java.io.ByteArrayOutputStream

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** QOI codec against a hand-assembled fixture that exercises every
  * chunk op (RGB, RUN, DIFF, INDEX, LUMA) with spec-table byte values,
  * plus lossless roundtrips and loud rejection of malformed streams. */
class QoiSpec extends AnyFunSuite with Matchers {

  private def header(w: Int, h: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream
    out.write("qoif".getBytes("US-ASCII"))
    def be(v: Int): Unit = {
      out.write((v >>> 24) & 0xff); out.write((v >>> 16) & 0xff)
      out.write((v >>> 8) & 0xff); out.write(v & 0xff)
    }
    be(w); be(h); out.write(3); out.write(0)
    out.toByteArray
  }
  private val endMarker = Array[Byte](0, 0, 0, 0, 0, 0, 0, 1)

  test("decode: hand-assembled stream exercising all five RGB-path ops") {
    // 8x1, pixels (r,g,b):
    //  1-3: (10,20,30)  RGB op then RUN(2)
    //  4:   (11,21,31)  DIFF (+1,+1,+1)
    //  5:   (10,20,30)  INDEX (hash = 9)
    //  6-8: (30,40,50)  LUMA (dg=20, dr-dg=0, db-dg=0) then RUN(2)
    val chunks = Array[Byte](
      0xFE.toByte, 10, 20, 30, // QOI_OP_RGB
      0xC1.toByte,             // QOI_OP_RUN len 2
      0x7F.toByte,             // QOI_OP_DIFF (+1,+1,+1)
      0x09.toByte,             // QOI_OP_INDEX slot 9
      0xB4.toByte, 0x88.toByte, // QOI_OP_LUMA dg=20, offsets 0/0
      0xC1.toByte)             // QOI_OP_RUN len 2
    val bytes = header(8, 1) ++ chunks ++ endMarker
    val r = Qoi.decode(bytes)
    r.width shouldBe 8
    r.height shouldBe 1
    val px = r.pixels.grouped(3).map(g =>
      (g(2) & 0xff, g(1) & 0xff, g(0) & 0xff)).toSeq
    px shouldBe Seq((10, 20, 30), (10, 20, 30), (10, 20, 30),
      (11, 21, 31), (10, 20, 30), (30, 40, 50), (30, 40, 50), (30, 40, 50))
  }

  test("decode: RGBA chunk and wrapping DIFF arithmetic") {
    // px1 via RGBA (alpha 7 — dropped in BGR), px2 DIFF wraps 0 - 2 = 254
    val chunks = Array[Byte](
      0xFF.toByte, 0, 0, 0, 7, // QOI_OP_RGBA (0,0,0,7)
      0x40.toByte)             // QOI_OP_DIFF (-2,-2,-2) -> wraps to 254
    val bytes = header(2, 1) ++ chunks ++ endMarker
    val r = Qoi.decode(bytes)
    val px = r.pixels.grouped(3).map(g =>
      (g(2) & 0xff, g(1) & 0xff, g(0) & 0xff)).toSeq
    px shouldBe Seq((0, 0, 0), (254, 254, 254))
  }

  test("roundtrip: decode(encode(x)) == x across op-triggering content") {
    for ((w, h) <- Seq((1, 1), (8, 5), (17, 3), (63, 2))) {
      val n = w * h
      val bgr = new Array[Byte](n * 3)
      var i = 0
      while (i < n) {
        // long runs, small diffs, repeats (index hits), and jumps (rgb)
        val v = if (i % 11 < 4) 100
          else if (i % 11 < 6) 101 + (i % 3)
          else if (i % 11 < 8) 100
          else (i * 97) % 256
        bgr(i * 3) = v.toByte
        bgr(i * 3 + 1) = ((v + i) % 256).toByte
        bgr(i * 3 + 2) = ((v * 3 + 7) % 256).toByte
        i += 1
      }
      val decoded = Qoi.decode(Qoi.encode(w, h, bgr))
      decoded.width shouldBe w
      decoded.height shouldBe h
      decoded.pixels.toSeq shouldBe bgr.toSeq
    }
    // a 130-px constant raster forces the 62-run cap to split
    val flat = Array.fill(130 * 3)(77.toByte)
    Qoi.decode(Qoi.encode(130, 1, flat)).pixels.toSeq shouldBe flat.toSeq
  }

  test("decode: RUN-first stream indexes the implicit start pixel " +
    "(reference-decoder index bookkeeping after EVERY chunk)") {
    // RUN(1) emits the implicit (0,0,0,255) and must store it at slot
    // hash(0,0,0,255) = 53 with alpha 255. OP_INDEX(53) then recalls it
    // — a pre-fix decoder yields (0,0,0,0) from the empty slot, whose
    // alpha=0 poisons the NEXT hash: RGB(9,9,9) would index at slot 7
    // instead of 60, so the final OP_INDEX(60) reads an empty slot.
    val chunks = Array[Byte](
      0xC0.toByte,             // QOI_OP_RUN len 1 -> implicit px
      0x35.toByte,             // QOI_OP_INDEX slot 53
      0xFE.toByte, 9, 9, 9,    // QOI_OP_RGB (9,9,9)
      0x3C.toByte)             // QOI_OP_INDEX slot 60 = hash(9,9,9,255)
    val r = Qoi.decode(header(4, 1) ++ chunks ++ endMarker)
    val px = r.pixels.grouped(3).map(g =>
      (g(2) & 0xff, g(1) & 0xff, g(0) & 0xff)).toSeq
    px shouldBe Seq((0, 0, 0), (0, 0, 0), (9, 9, 9), (9, 9, 9))
  }

  test("rejects bad magic, truncation, reserved tags, bad end marker") {
    val good = Qoi.encode(4, 4, Array.fill(48)(9.toByte))
    an[IllegalArgumentException] should be thrownBy
      Qoi.decode("nope".getBytes ++ good.drop(4))
    an[IllegalArgumentException] should be thrownBy
      Qoi.decode(good.dropRight(3))
    an[IllegalArgumentException] should be thrownBy {
      val bad = good.clone(); bad(bad.length - 1) = 0; Qoi.decode(bad)
    }
    // run overruns the raster: 1x1 image with a run of 2
    an[IllegalArgumentException] should be thrownBy
      Qoi.decode(header(1, 1) ++ Array[Byte](0xC1.toByte) ++ endMarker)
  }

  test("sniffMediaType recognizes the qoif magic") {
    // exercised through the column function in MultimodalSpec's style:
    // a direct byte check here keeps the codec spec self-contained
    new String(Qoi.encode(1, 1, Array[Byte](1, 2, 3)).take(4),
      "US-ASCII") shouldBe "qoif"
  }
}
