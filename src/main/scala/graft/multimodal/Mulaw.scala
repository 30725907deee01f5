package graft.multimodal

/**
 * G.711 μ-law companding codec (ITU-T G.711 — implemented from the
 * published segment/mantissa layout): the telephony 8-bit logarithmic
 * PCM that voice corpora arrive in. Encode clips to ±32635, adds the
 * 0x84 bias, finds the segment (exponent 0–7 by leading-bit
 * position), keeps a 4-bit mantissa, and complements the byte; decode
 * inverts exactly: mag = ((man·8 + 0x84) << exp) − 0x84. Pure integer
 * arithmetic end to end — no tables, no floats — so an external
 * engine replays both directions bit-for-bit.
 *
 * Properties pinned by MulawSpec: decode(0xFF) = 0 (positive zero),
 * decode(0x80) = ±32124 poles, encode∘decode is the identity on every
 * byte except negative zero, and round-trip quantization error is
 * bounded by half the segment step.
 */
object Mulaw {
  private val Bias = 0x84
  private val Clip = 32635

  /** Encode one 16-bit linear sample to a μ-law byte (0–255). */
  def encodeSample(x: Int): Int = {
    var v = x
    val sign = if (v < 0) { v = -v; 0x80 } else 0
    if (v > Clip) v = Clip
    v += Bias
    var exp = 7
    var mask = 0x4000
    while (exp > 0 && (v & mask) == 0) { exp -= 1; mask >>= 1 }
    val man = (v >> (exp + 3)) & 0x0f
    (~(sign | (exp << 4) | man)) & 0xff
  }

  /** Decode one μ-law byte to its 16-bit linear sample. */
  def decodeSample(b: Int): Int = {
    val u = (~b) & 0xff
    val exp = (u >> 4) & 7
    val man = u & 0x0f
    val mag = (((man << 3) + Bias) << exp) - Bias
    if ((u & 0x80) != 0) -mag else mag
  }

  def encode(samples: Array[Short]): Array[Byte] = {
    val out = new Array[Byte](samples.length)
    var i = 0
    while (i < samples.length) {
      out(i) = encodeSample(samples(i)).toByte; i += 1
    }
    out
  }

  def decode(bytes: Array[Byte]): Array[Short] = {
    val out = new Array[Short](bytes.length)
    var i = 0
    while (i < bytes.length) {
      out(i) = decodeSample(bytes(i) & 0xff).toShort; i += 1
    }
    out
  }
}
