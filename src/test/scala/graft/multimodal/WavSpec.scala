package graft.multimodal

import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

/** The REAL audio decode path: `Wav` is an actual RIFF/WAVE PCM codec.
  * Pins the container format — chunk-list walking (any order, unknown
  * chunks, odd-size padding), little-endian fmt fields, signed 16-bit
  * LE samples — and loud rejection of unsupported variants. */
class WavSpec extends SparkTestBase with Matchers {

  test("encode/decode round-trips signed 16-bit samples, mono and stereo") {
    val rng = new scala.util.Random(11)
    for (ch <- Seq(1, 2)) {
      val samples = Array.fill(90 * ch)((rng.nextInt(65536) - 32768).toShort)
      val pcm = Wav.decode(Wav.encode(22050, ch, samples))
      pcm.sampleRate shouldBe 22050
      pcm.channels shouldBe ch
      pcm.samples shouldBe samples
    }
  }

  test("decode walks chunks in any order and skips unknown/odd-size chunks") {
    // hand-assembled container: RIFF [ LIST(5 bytes + pad) | data | fmt ]
    // — data BEFORE fmt, with a vendor chunk first; a spec-conforming
    // reader must handle all of it
    val samples = Array[Short](100, -200, 32767, -32768, 0, 7)
    val canonical = Wav.encode(8000, 1, samples)
    val fmtChunk = canonical.slice(12, 12 + 8 + 16)
    val dataChunk = canonical.slice(36, canonical.length)
    val listBody = Array[Byte]('I', 'N', 'F', 'O', 42)
    val listChunk = "LIST".getBytes ++ Array[Byte](5, 0, 0, 0) ++
      listBody ++ Array[Byte](0) // odd size => pad byte
    val payload = listChunk ++ dataChunk ++ fmtChunk
    val out = new Array[Byte](12 + payload.length)
    "RIFF".getBytes.copyToArray(out, 0)
    out(4) = ((payload.length + 4) & 0xff).toByte
    out(5) = (((payload.length + 4) >> 8) & 0xff).toByte
    "WAVE".getBytes.copyToArray(out, 8)
    payload.copyToArray(out, 12)
    val pcm = Wav.decode(out)
    pcm.sampleRate shouldBe 8000
    pcm.samples shouldBe samples
  }

  test("decode rejects non-WAV and unsupported variants loudly") {
    val good = Wav.encode(8000, 1, Array[Short](1, 2, 3, 4))
    an[IllegalArgumentException] should be thrownBy
      Wav.decode("definitely not audio data here".getBytes)
    val bad8bit = good.clone(); bad8bit(34) = 8
    an[IllegalArgumentException] should be thrownBy Wav.decode(bad8bit)
    val badFmt = good.clone(); badFmt(20) = 3 // IEEE float
    an[IllegalArgumentException] should be thrownBy Wav.decode(badFmt)
    val badMagic = good.clone(); badMagic(0) = 'X'
    an[IllegalArgumentException] should be thrownBy Wav.decode(badMagic)
    an[IllegalArgumentException] should be thrownBy Wav.decode(good.take(40))
  }

  test("sampleStats: histogram covers every sample, sums exact at range edges") {
    val samples = Array[Short](-32768, -1, 0, 1, 32767)
    val (hist, sum, sumAbs) = Wav.sampleStats(Wav.decode(
      Wav.encode(16000, 1, samples)), 16)
    hist.sum shouldBe 5L
    hist(0) shouldBe 1L // -32768
    hist(7) shouldBe 1L // -1 ((-1+32768)*16/65536 = 7)
    hist(8) shouldBe 2L // 0 and 1 land at the midpoint bin
    hist(15) shouldBe 1L // 32767
    sum shouldBe -1L
    sumAbs shouldBe 65537L
  }

  test("decodeWavFeatures: rate/channels come from the parsed header, no shuffle") {
    val ss = spark
    import ss.implicits._
    val assets = (1 to 8).map { i =>
      val samples = Array.tabulate(30 + i)(j => ((i * 1000 + j * 3) - 16000).toShort)
      // metadata deliberately unrelated: the decoder must report what
      // the FILE says
      Asset(i.toLong, "audio/wav", Wav.encode(8000 * i, 1, samples), 0, 0)
    }.toDS().repartition(2)
    val feats = Multimodal.decodeWavFeatures(assets)
    feats.rdd.getNumPartitions shouldBe 2
    val rows = feats.collect().sortBy(_.asset_id)
    rows.length shouldBe 8
    rows.foreach { f =>
      val i = f.asset_id.toInt
      f.sample_rate shouldBe 8000 * i
      f.n_channels shouldBe 1
      f.n_samples shouldBe (30 + i).toLong
      f.histogram.sum shouldBe f.n_samples
      f.sum_sample shouldBe (0 until 30 + i).map(j => i * 1000 + j * 3 - 16000).sum.toLong
    }
  }

  test("signalStats: hand-computed zero crossings, energy, peak") {
    // samples: 3, -2, -1, 0, 5, -5 — transitions at i=1 (+→−),
    // i=3 (−→0 counts: 0 is non-negative), i=5 (+→−) => zc = 3
    val pcm = Wav.Pcm(8000, 1, Array[Short](3, -2, -1, 0, 5, -5))
    val (zc, energy, peak) = Wav.signalStats(pcm)
    zc shouldBe 3L
    energy shouldBe (9 + 4 + 1 + 0 + 25 + 25).toLong
    peak shouldBe 5
  }

  test("trimSilence: endpoint frames drop, interior silence survives, channels stay aligned") {
    // mono: zeros at both ends go, the interior zero stays
    val mono = Wav.trimSilence(Wav.Pcm(8000, 1,
      Array[Short](0, 0, 5, 0, -3, 0)), threshold = 0)
    mono.samples shouldBe Array[Short](5, 0, -3)
    // threshold: |s| <= 2 counts as silence
    val thr = Wav.trimSilence(Wav.Pcm(8000, 1,
      Array[Short](1, -2, 5, 2)), threshold = 2)
    thr.samples shouldBe Array[Short](5)
    // stereo: a frame is silent only if BOTH channels are; trim cuts
    // whole frames so channel alignment survives the round-trip
    val st = Wav.trimSilence(Wav.Pcm(8000, 2,
      Array[Short](0, 0, 0, 7, 1, 2, 0, 0)), threshold = 0)
    st.samples shouldBe Array[Short](0, 7, 1, 2)
    Wav.decode(Wav.encode(st.sampleRate, st.channels, st.samples))
      .samples shouldBe st.samples
    // all-silent trims to a valid empty file
    val empty = Wav.trimSilence(Wav.Pcm(8000, 1, Array[Short](0, 0)), 0)
    empty.samples.length shouldBe 0
    Wav.decode(Wav.encode(8000, 1, empty.samples)).samples.length shouldBe 0
  }

  test("signalStats: full-scale samples do not overflow the energy sum") {
    val pcm = Wav.Pcm(8000, 1, Array.fill(1000)(Short.MinValue))
    val (zc, energy, peak) = Wav.signalStats(pcm)
    zc shouldBe 0L
    energy shouldBe 1000L * 32768L * 32768L
    peak shouldBe 32768
  }

  test("wavFrameEnergy: exact frame sums, partial tail, negatives") {
    val ss = spark
    import ss.implicits._
    import graft.multimodal.{Asset, Multimodal}
    val samples = Array[Short](0, 1, -2, 3, 4, 5, -6, 7, 8, -9)
    val assets = Seq(Asset(1L, "audio/wav",
      Wav.encode(8000, 1, samples), 8000, 1)).toDS()
    val out = Multimodal.wavFrameEnergy(assets, frameLen = 4)
      .collect().map(f => f.frame_id ->
        ((f.n_samples, f.sum_abs, f.energy, f.peak))).toMap
    assert(out.size == 3)
    assert(out(0) == ((4L, 6L, 14L, 3)))
    assert(out(1) == ((4L, 22L, 126L, 7)))
    // partial tail keeps its true length
    assert(out(2) == ((2L, 17L, 145L, 9)))
  }
}
