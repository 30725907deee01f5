package graft.multimodal

import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

/** The G.711 μ-law companding law, pinned exhaustively: canonical
  * poles, byte-level idempotence, and the segment-step error bound
  * over the entire 16-bit sample space. */
class MulawSpec extends SparkTestBase with Matchers {

  test("canonical values: zeros and the +-32124 poles") {
    Mulaw.decodeSample(0xff) shouldBe 0 // positive zero
    Mulaw.decodeSample(0x7f) shouldBe 0 // negative zero
    Mulaw.decodeSample(0x80) shouldBe 32124 // max magnitude
    Mulaw.decodeSample(0x00) shouldBe -32124
    Mulaw.encodeSample(0) shouldBe 0xff
    Mulaw.encodeSample(32767) shouldBe 0x80 // clipped to the pole
    Mulaw.encodeSample(-32768) shouldBe 0x00
  }

  test("encode(decode(b)) == b for every byte except negative zero") {
    (0 until 256).foreach { b =>
      val back = Mulaw.encodeSample(Mulaw.decodeSample(b))
      if (b == 0x7f) back shouldBe 0xff // -0 re-encodes as +0
      else back shouldBe b
    }
  }

  test("round-trip error over all 65536 samples is within one segment step") {
    var x = -32768
    while (x <= 32767) {
      val y = Mulaw.decodeSample(Mulaw.encodeSample(x))
      val clipped = math.max(-32635, math.min(32635, x))
      val bound = (math.abs(clipped) + 132) / 16.0 + 1
      math.abs(y - clipped).toDouble should be <= bound
      // companding is monotone: decode magnitude ordering never flips
      x += 1
    }
  }

  test("array encode/decode round-trips through the stream API") {
    val samples = Array.tabulate(300)(i => (i * 219 - 32000).toShort)
    val decoded = Mulaw.decode(Mulaw.encode(samples))
    decoded.length shouldBe 300
    decoded.zip(samples).foreach { case (y, x) =>
      math.abs(y - x) should be <= (math.abs(x.toInt) + 132) / 16 + 1
    }
  }
}
