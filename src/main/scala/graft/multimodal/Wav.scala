package graft.multimodal

/**
 * Pure-JVM WAV (RIFF/WAVE) codec: 16-bit PCM, any channel count. The
 * audio analogue of [[Bmp]] — PCM needs no entropy coding, so it is
 * decodable with zero dependencies, and it makes the multimodal
 * decode seam real for the second modality (a compressed-audio
 * library drops into the same seam with no plan change).
 *
 * The decoder does REAL container parsing: it walks the RIFF chunk
 * list (chunks may appear in any order, carry odd sizes with pad
 * bytes, or be vendor extras like `LIST`), reads the format from the
 * `fmt ` chunk, and fails loudly on anything that is not
 * uncompressed 16-bit PCM.
 */
object Wav {

  /** Decoded audio: interleaved 16-bit samples (frame-major — sample
    * `i` of frame `f` is `samples(f * channels + i)`). */
  final case class Pcm(sampleRate: Int, channels: Int, samples: Array[Short])

  private def readU16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def readI32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
  private def writeU16(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte; b(off + 1) = ((v >> 8) & 0xff).toByte
  }
  private def writeI32(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte
    b(off + 1) = ((v >> 8) & 0xff).toByte
    b(off + 2) = ((v >> 16) & 0xff).toByte
    b(off + 3) = ((v >> 24) & 0xff).toByte
  }
  private def tag(b: Array[Byte], off: Int): String =
    new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Encode interleaved 16-bit PCM as a canonical RIFF/WAVE file
    * (`fmt ` then `data`). */
  def encode(sampleRate: Int, channels: Int, samples: Array[Short]): Array[Byte] = {
    require(sampleRate > 0 && channels > 0, "bad sampleRate/channels")
    require(samples.length % channels == 0,
      s"${samples.length} samples not a whole number of $channels-channel frames")
    val dataSize = samples.length * 2
    val out = new Array[Byte](44 + dataSize)
    "RIFF".getBytes.copyToArray(out, 0)
    writeI32(out, 4, 36 + dataSize)
    "WAVE".getBytes.copyToArray(out, 8)
    "fmt ".getBytes.copyToArray(out, 12)
    writeI32(out, 16, 16) // PCM fmt chunk body size
    writeU16(out, 20, 1) // audio format: PCM
    writeU16(out, 22, channels)
    writeI32(out, 24, sampleRate)
    writeI32(out, 28, sampleRate * channels * 2) // byte rate
    writeU16(out, 32, channels * 2) // block align
    writeU16(out, 34, 16) // bits per sample
    "data".getBytes.copyToArray(out, 36)
    writeI32(out, 40, dataSize)
    var i = 0
    while (i < samples.length) {
      writeU16(out, 44 + i * 2, samples(i) & 0xffff)
      i += 1
    }
    out
  }

  /** Decode a RIFF/WAVE file. Walks the chunk list (any order,
    * unknown chunks skipped, odd sizes padded per spec); throws
    * IllegalArgumentException on non-PCM / non-16-bit / malformed
    * containers. */
  def decode(bytes: Array[Byte]): Pcm = {
    require(bytes.length >= 44, s"truncated WAV: ${bytes.length} bytes")
    require(tag(bytes, 0) == "RIFF" && tag(bytes, 8) == "WAVE",
      "bad magic: not a RIFF/WAVE file")
    var off = 12
    var fmt: Option[(Int, Int, Int)] = None // (channels, rate, bits)
    var data: Option[(Int, Int)] = None // (offset, size)
    while (off + 8 <= bytes.length) {
      val id = tag(bytes, off)
      val size = readI32(bytes, off + 4)
      require(size >= 0 && off + 8 + size <= bytes.length,
        s"chunk '$id' overruns file (size $size at $off)")
      id match {
        case "fmt " =>
          require(size >= 16, s"fmt chunk too small ($size)")
          val audioFormat = readU16(bytes, off + 8)
          require(audioFormat == 1,
            s"unsupported audio format $audioFormat (only PCM)")
          fmt = Some((readU16(bytes, off + 10), readI32(bytes, off + 12),
            readU16(bytes, off + 22)))
        case "data" => data = Some((off + 8, size))
        case _ => () // LIST/INFO/fact/vendor chunks: skipped
      }
      off += 8 + size + (size & 1) // odd-sized chunks carry a pad byte
    }
    val (channels, rate, bits) = fmt.getOrElse(
      throw new IllegalArgumentException("no fmt chunk"))
    require(bits == 16, s"unsupported bit depth $bits (only 16-bit PCM)")
    require(channels > 0 && rate > 0, s"bad fmt: $channels ch @ $rate Hz")
    val (dOff, dSize) = data.getOrElse(
      throw new IllegalArgumentException("no data chunk"))
    require(dSize % (2 * channels) == 0,
      s"data size $dSize not a whole number of frames")
    val samples = new Array[Short](dSize / 2)
    var i = 0
    while (i < samples.length) {
      samples(i) = ((bytes(dOff + i * 2) & 0xff) |
        (bytes(dOff + i * 2 + 1) << 8)).toShort
      i += 1
    }
    Pcm(rate, channels, samples)
  }

  /** Strip leading and trailing silence: drop frames from both ends
    * while EVERY channel sample in the frame has |s| <= `threshold`
    * (threshold 0 = digital silence). Interior quiet passages are
    * untouched — this is an endpoint trim, not a gate. Returns the
    * same rate/channels; an all-silent input trims to zero frames
    * (a valid, encodable empty PCM). */
  def trimSilence(pcm: Pcm, threshold: Int): Pcm = {
    require(threshold >= 0, "threshold must be >= 0")
    val ch = pcm.channels
    val frames = pcm.samples.length / ch
    def loud(f: Int): Boolean = {
      var c = 0
      while (c < ch) {
        if (math.abs(pcm.samples(f * ch + c).toInt) > threshold) return true
        c += 1
      }
      false
    }
    var a = 0
    while (a < frames && !loud(a)) a += 1
    var b = frames - 1
    while (b >= a && !loud(b)) b -= 1
    Pcm(pcm.sampleRate, ch,
      java.util.Arrays.copyOfRange(pcm.samples, a * ch, (b + 1) * ch))
  }

  /** Exact integer SIGNAL statistics over decoded samples — the
    * audio-quality trio a corpus gate filters on: zero crossings
    * (strict sign transitions, `s < 0` flipping — silence-vs-tone and
    * noisiness proxy), energy (sum of squared samples — loudness; a
    * BIGINT holds >2^31 full-scale samples, far past any single
    * asset), and peak absolute amplitude (clipping detection). Runs
    * over the interleaved stream; for multichannel audio, split
    * channels upstream if per-channel stats are needed. */
  def signalStats(pcm: Pcm): (Long, Long, Int) = {
    var zc = 0L
    var energy = 0L
    var peak = 0
    var prevNeg = false
    var i = 0
    while (i < pcm.samples.length) {
      val s = pcm.samples(i).toInt
      val neg = s < 0
      if (i > 0 && neg != prevNeg) zc += 1
      prevNeg = neg
      energy += s.toLong * s
      val a = math.abs(s)
      if (a > peak) peak = a
      i += 1
    }
    (zc, energy, peak)
  }

  /** Exact integer stats over decoded samples: `bins`-bin histogram of
    * the 16-bit range plus exact sums (callers derive fixed-point
    * means — never a lossy double). */
  def sampleStats(pcm: Pcm, bins: Int): (Array[Long], Long, Long) = {
    val hist = new Array[Long](bins)
    var sum = 0L
    var sumAbs = 0L
    var i = 0
    while (i < pcm.samples.length) {
      val s = pcm.samples(i).toInt
      hist((s + 32768) * bins / 65536) += 1
      sum += s
      sumAbs += math.abs(s)
      i += 1
    }
    (hist, sum, sumAbs)
  }
}
