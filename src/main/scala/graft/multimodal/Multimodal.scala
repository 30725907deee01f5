package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** An opaque media asset: binary payload + typed metadata. The schema a
  * 100 TB training-data lake stores per image/audio/video object
  * alongside its provenance (north-star multimodal columns). */
final case class Asset(asset_id: Long, media_type: String, bytes: Array[Byte],
                       width: Int, height: Int)

/** Decoded per-asset features. `embedding` is what a real decoder +
  * model head would emit; here it derives from the stub decode. */
final case class AssetFeatures(asset_id: Long, media_type: String,
                               n_bytes: Long, mean_byte: Double,
                               histogram: Array[Long], embedding: Array[Float])

/** Features from a REAL raster decode (`Bmp.decode`): dimensions come
  * from the parsed file header, the histogram/mean from decoded pixel
  * luma. `sum_luma` stays an exact integer so downstream aggregates are
  * oracle-replayable without float drift. */
final case class ImageFeatures(asset_id: Long, width: Int, height: Int,
                               n_pixels: Long, sum_luma: Long,
                               histogram: Array[Long])

/** One grid patch from a REAL image decode — the ViT patchify unit:
  * exact pixel count and integer luma sum for grid cell
  * (patch_row, patch_col); edge cells are PARTIAL (their true n_px,
  * not padded), so downstream means stay exact. */
final case class PatchFeatures(asset_id: Long, patch_row: Int,
                               patch_col: Int, n_px: Long,
                               luma_sum: Long)

/** Features from a REAL audio decode (`Wav.decode`): rate/channels
  * from the parsed RIFF fmt chunk, exact integer sample sums and a
  * 16-bin amplitude histogram from decoded PCM. */
final case class AudioFeatures(asset_id: Long, sample_rate: Int,
                               n_channels: Int, n_samples: Long,
                               sum_sample: Long, sum_abs: Long,
                               histogram: Array[Long])

/** Signal-quality features from a REAL audio decode (`Wav.signalStats`):
  * zero crossings, exact integer energy, peak amplitude — the trio an
  * audio corpus gate filters on (silence, loudness, clipping). */
final case class AudioSignal(asset_id: Long, sample_rate: Int,
                             n_samples: Long, zero_crossings: Long,
                             energy: Long, peak: Int)

/** Exact integer signal readout from a REAL μ-law decode
  * (`Mulaw.decode`): the telephony-stream triage columns, all pure
  * BIGINT so per-lang aggregates replay without drift. */
/** One fixed-length analysis frame from a REAL WAV decode — the
  * voice-activity / energy-contour unit: exact integer |s| and s²
  * sums over the frame's interleaved samples; the tail frame is
  * PARTIAL (true n_samples). */
final case class AudioFrame(asset_id: Long, frame_id: Int,
                            n_samples: Long, sum_abs: Long,
                            energy: Long, peak: Int)

final case class MulawSignal(asset_id: Long, n_samples: Long,
                             sum_dec: Long, sum_abs: Long, peak: Int)

/** Features from a REAL video container decode (`Avi.decode`) with
  * every-kth frame sampling: container metadata from the parsed
  * headers, exact integer luma sums over the SAMPLED frames only —
  * the decode-cost dial (sample_every) that makes video feature
  * extraction affordable at corpus scale. */
final case class VideoFeatures(asset_id: Long, width: Int, height: Int,
                               n_frames: Int, usec_per_frame: Int,
                               n_sampled: Int, sampled_pixels: Long,
                               sampled_luma_sum: Long)

/**
 * Multimodal column operators (north star): media as opaque `binary`
 * columns with typed metadata, processed in partition-batched iterators.
 *
 * `decodeFeatures` is the Scala analogue of PySpark's `mapInPandas`
 * pipeline: `Dataset.mapPartitions` hands each executor core an
 * iterator over its partition's assets, the decoder processes them
 * one batch at a time, and the output is a typed Dataset again. The
 * decode goes REAL for BMP via `decodeBmpFeatures` (`Bmp.decode`, a
 * zero-dependency 24-bit BMP parser); formats that need entropy
 * coding (JPEG/PNG, audio PCM, video frames) remain STUBBED — this
 * container has no media libraries — behind `stubDecode`, a
 * deterministic fake with the same signature a real decoder has
 * (bytes → fixed-width feature batch). Everything around it — schema,
 * encoders, partition batching, 1-row-in/1-row-out shape — is the
 * real plumbing and is what the tests pin.
 *
 * Scale notes: decode is embarrassingly parallel and CPU-bound; the
 * operator preserves the input partitioning (no shuffle), so
 * `repartition(n)` upstream is the only knob needed to saturate a
 * cluster, and skew is byte-size skew — repartitioning by
 * `ceil(length(bytes) / chunk)` buckets equalizes it.
 */
object Multimodal {

  val HistogramBins = 16

  /**
   * STUB DECODER — the plug point for a real media library.
   * Deterministic fake: a 16-bin byte histogram stands in for pixel
   * statistics, and the "embedding" is the normalized histogram. A real
   * implementation replaces ONLY this function (same signature:
   * one asset's bytes in, fixed-width features out).
   */
  def stubDecode(bytes: Array[Byte]): (Array[Long], Array[Float]) = {
    val hist = new Array[Long](HistogramBins)
    var i = 0
    while (i < bytes.length) {
      hist((bytes(i) & 0xff) / (256 / HistogramBins)) += 1
      i += 1
    }
    val n = math.max(bytes.length, 1).toFloat
    (hist, hist.map(_ / n))
  }

  /** Partition-batched feature extraction (the mapInPandas seam). */
  def decodeFeatures(assets: Dataset[Asset]): Dataset[AssetFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        val (hist, emb) = stubDecode(a.bytes)
        val mean =
          if (a.bytes.isEmpty) 0.0
          else a.bytes.iterator.map(_ & 0xff).sum.toDouble / a.bytes.length
        AssetFeatures(a.asset_id, a.media_type, a.bytes.length.toLong, mean, hist, emb)
      }
    }
  }

  /**
   * REAL image decode through the same partition-batched seam: each
   * asset's bytes are parsed as an actual BMP file (`Bmp.decode` —
   * header magic, little-endian fields, bottom-up row flip, stride
   * padding), and the features come from decoded PIXELS, not payload
   * bytes: dimensions from the parsed header, 16-bin histogram and
   * exact integer sum over per-pixel BT.601 luma. Same scale shape as
   * `decodeFeatures`: embarrassingly parallel, partition-preserving,
   * no shuffle.
   */
  def decodeBmpFeatures(assets: Dataset[Asset]): Dataset[ImageFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        val raster = Bmp.decode(a.bytes)
        val (hist, sumLuma) = Bmp.lumaStats(raster, HistogramBins)
        ImageFeatures(a.asset_id, raster.width, raster.height,
          raster.width.toLong * raster.height, sumLuma, hist)
      }
    }
  }

  /**
   * ViT-style patch extraction through the same partition-batched
   * seam: each asset's bytes decode as a real BMP (`Bmp.decode`), the
   * raster splits into a ⌈h/p⌉×⌈w/p⌉ grid of p×p cells, and each cell
   * emits its exact pixel count and integer luma sum — the patchify
   * step every vision-transformer pipeline runs before embedding,
   * with edge cells kept PARTIAL (true n_px) instead of silently
   * padded so downstream means are exact. Pixels never leave the
   * partition; only ~32 B patch rows do (h·w/p² of them — the 1/p²
   * data reduction is the point at 100 TB).
   */
  def decodeBmpPatches(assets: Dataset[Asset],
                       patch: Int): Dataset[PatchFeatures] = {
    require(patch >= 1, "patch must be >= 1")
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.flatMap { a =>
        val r = Bmp.decode(a.bytes)
        val pc = (r.width + patch - 1) / patch
        val pr = (r.height + patch - 1) / patch
        val npx = new Array[Long](pr * pc)
        val sums = new Array[Long](pr * pc)
        var y = 0
        while (y < r.height) {
          val rowOff = y * r.width * 3
          val prow = (y / patch) * pc
          var x = 0
          while (x < r.width) {
            val i = rowOff + x * 3
            val l = Bmp.luma(r.pixels(i) & 0xff, r.pixels(i + 1) & 0xff,
              r.pixels(i + 2) & 0xff)
            val pi = prow + x / patch
            npx(pi) += 1
            sums(pi) += l
            x += 1
          }
          y += 1
        }
        (0 until pr * pc).iterator.map(pi =>
          PatchFeatures(a.asset_id, pi / pc, pi % pc, npx(pi), sums(pi)))
      }
    }
  }

  /**
   * REAL PNG decode through the same partition-batched seam: each
   * asset's bytes are parsed as an actual PNG file (`Png.decode` —
   * signature, chunk walk with CRC verification, zlib inflate via the
   * JDK Inflater, all five scanline unfilters, gray/truecolor to the
   * shared BGR raster), and the features come from decoded PIXELS
   * exactly like [[decodeBmpFeatures]] — two container formats, one
   * feature contract, one seam. Embarrassingly parallel, no shuffle.
   */
  def decodePngFeatures(assets: Dataset[Asset]): Dataset[ImageFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        val raster = Png.decode(a.bytes)
        val (hist, sumLuma) = Bmp.lumaStats(raster, HistogramBins)
        ImageFeatures(a.asset_id, raster.width, raster.height,
          raster.width.toLong * raster.height, sumLuma, hist)
      }
    }
  }

  /**
   * REAL baseline-JPEG decode through the same partition-batched
   * seam: each asset's bytes are parsed as an actual JPEG file
   * (`Jpeg.decode` — marker walk, DQT/DHT management, canonical-code
   * Huffman entropy decode with byte unstuffing and restart
   * intervals, dequantize + dezigzag, the reference float IDCT,
   * chroma upsampling, YCbCr→BGR to the shared raster), and the
   * features come from decoded PIXELS exactly like
   * [[decodeBmpFeatures]] — the dominant web-image container under
   * the one feature contract, one seam. Progressive/arithmetic files
   * fail loudly inside the decode. Embarrassingly parallel, no
   * shuffle.
   */
  /**
   * REAL baseline-TIFF decode through the same partition-batched
   * seam: each asset's bytes are parsed as an actual TIFF file
   * (`Tiff.decode` — II/MM byte-order header, the typed IFD tag walk
   * with inline-vs-offset values, uncompressed strip assembly,
   * gray/chunky-RGB to the shared raster; compression/tiles/planar
   * fail loudly), and the features come from decoded PIXELS exactly
   * like [[decodeBmpFeatures]]. Embarrassingly parallel, no shuffle.
   */
  def decodeTiffFeatures(assets: Dataset[Asset]): Dataset[ImageFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        val raster = Tiff.decode(a.bytes)
        val (hist, sumLuma) = Bmp.lumaStats(raster, HistogramBins)
        ImageFeatures(a.asset_id, raster.width, raster.height,
          raster.width.toLong * raster.height, sumLuma, hist)
      }
    }
  }

  /**
   * REAL QOI decode through the same partition-batched seam: each
   * asset's bytes are parsed as an actual QOI file (`Qoi.decode` —
   * magic/header walk, the six chunk ops including the stateful
   * 64-slot rolling index array, end-marker verification), and the
   * features come from decoded PIXELS exactly like
   * [[decodeBmpFeatures]] — one more container under the one feature
   * contract, one seam. Embarrassingly parallel, no shuffle.
   */
  def decodeQoiFeatures(assets: Dataset[Asset]): Dataset[ImageFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        val raster = Qoi.decode(a.bytes)
        val (hist, sumLuma) = Bmp.lumaStats(raster, HistogramBins)
        ImageFeatures(a.asset_id, raster.width, raster.height,
          raster.width.toLong * raster.height, sumLuma, hist)
      }
    }
  }

  def decodeJpegFeatures(assets: Dataset[Asset]): Dataset[ImageFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        val raster = Jpeg.decode(a.bytes)
        val (hist, sumLuma) = Bmp.lumaStats(raster, HistogramBins)
        ImageFeatures(a.asset_id, raster.width, raster.height,
          raster.width.toLong * raster.height, sumLuma, hist)
      }
    }
  }

  /**
   * REAL GIF decode through the same partition-batched seam: each
   * asset's bytes are parsed as an actual GIF file (`Gif.decode` —
   * signature, logical screen + global color table, extension walk,
   * genuine variable-width LZW with clear/EOI and the cScSc corner,
   * indices mapped through the file's OWN palette to the shared BGR
   * raster), and the features come from decoded PIXELS exactly like
   * [[decodeBmpFeatures]] — three container formats, one feature
   * contract, one seam. Embarrassingly parallel, no shuffle.
   */
  def decodeGifFeatures(assets: Dataset[Asset]): Dataset[ImageFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        val raster = Gif.decode(a.bytes)
        val (hist, sumLuma) = Bmp.lumaStats(raster, HistogramBins)
        ImageFeatures(a.asset_id, raster.width, raster.height,
          raster.width.toLong * raster.height, sumLuma, hist)
      }
    }
  }

  /**
   * REAL audio decode through the same partition-batched seam: each
   * asset's bytes are parsed as an actual RIFF/WAVE file
   * (`Wav.decode` — chunk-list walk, little-endian fmt fields,
   * signed 16-bit LE samples), and the features come from decoded
   * PCM: rate/channels from the parsed header, exact integer
   * sum/abs-sum and a 16-bin amplitude histogram over the samples.
   * Same scale shape as the image decode: embarrassingly parallel,
   * partition-preserving, no shuffle.
   */
  def decodeWavFeatures(assets: Dataset[Asset]): Dataset[AudioFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        val pcm = Wav.decode(a.bytes)
        val (hist, sum, sumAbs) = Wav.sampleStats(pcm, HistogramBins)
        AudioFeatures(a.asset_id, pcm.sampleRate, pcm.channels,
          pcm.samples.length.toLong, sum, sumAbs, hist)
      }
    }
  }

  /**
   * 64-bit perceptual hash (dHash) per image asset through the real
   * decode seam: decode each BMP, downscale to a 9×8 luma thumbnail,
   * emit the gradient-sign code (`Bmp.dhash64`). The output is the
   * image analogue of `Dedup.simhashCodes` — one (id, `__code`) row
   * per asset, 16 B — and feeds the SAME exact pigeonhole banding
   * (`Dedup.simhashPairsFromCodes`) for near-duplicate pairs: rescaled,
   * brightness-shifted, or lightly-edited copies of an image land
   * within a few Hamming bits of the original, where any byte-level
   * hash sees unrelated blobs. Decode is partition-preserving; only
   * 16 B code rows enter the dedup shuffle — pixels never do.
   */
  def dhashCodes(assets: Dataset[Asset]): DataFrame = {
    val s = assets.sparkSession
    import s.implicits._
    assets.mapPartitions { it =>
      it.map(a => (a.asset_id, Bmp.dhash64(Bmp.decode(a.bytes))))
    }.toDF("asset_id", "__code")
  }

  /**
   * REAL audio signal statistics through the decode seam: decode each
   * WAV, compute zero crossings / exact integer energy / peak
   * amplitude over the decoded PCM (`Wav.signalStats`) — the features
   * an audio corpus gate filters on (silence detection, loudness
   * normalization, clipping rejection). Partition-preserving like
   * every decode op; emits thin typed rows, never samples.
   */
  def decodeWavSignal(assets: Dataset[Asset]): Dataset[AudioSignal] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        val pcm = Wav.decode(a.bytes)
        val (zc, energy, peak) = Wav.signalStats(pcm)
        AudioSignal(a.asset_id, pcm.sampleRate, pcm.samples.length.toLong,
          zc, energy, peak)
      }
    }
  }

  /**
   * REAL audio endpoint-silence trim through the decode seam — the
   * audio analogue of [[resizeBmp]]'s decode→transform→re-encode:
   * each WAV decodes, leading/trailing silent frames (every channel
   * |s| <= `threshold`) drop, and the remainder re-encodes at the
   * same rate/channels. The downstream win mirrors resize: storage
   * and every later decode shrink by the trimmed fraction, and
   * silence-padded duplicates collapse onto the same byte payload.
   * Partition-preserving; an all-silent asset becomes a valid
   * zero-frame file.
   */
  def trimWavSilence(assets: Dataset[Asset], threshold: Int): Dataset[Asset] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        val pcm = Wav.trimSilence(Wav.decode(a.bytes), threshold)
        a.copy(bytes = Wav.encode(pcm.sampleRate, pcm.channels, pcm.samples))
      }
    }
  }

  /**
   * REAL pixel resize (the operation [[resizeMeta]] only models):
   * decode each BMP, nearest-neighbor downscale so the longest side is
   * at most `maxDim` (integer-floor arithmetic — `w*maxDim/max(w,h)`,
   * clamped to ≥1 — so an oracle replays it exactly; never upscales),
   * re-encode, and return the asset with its metadata dims updated to
   * match the re-encoded file. Partition-preserving like every decode
   * op; the downstream win is the point — decode cost and payload
   * bytes drop quadratically for everything after the resize.
   */
  def resizeBmp(assets: Dataset[Asset], maxDim: Int): Dataset[Asset] = {
    require(maxDim >= 1, "maxDim must be >= 1")
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        val r = Bmp.decode(a.bytes)
        val m = math.max(r.width, r.height)
        if (m <= maxDim) a.copy(width = r.width, height = r.height)
        else {
          val ow = math.max(1, r.width * maxDim / m)
          val oh = math.max(1, r.height * maxDim / m)
          val out = Bmp.resizeNearest(r, ow, oh)
          a.copy(bytes = Bmp.encode(ow, oh, out.pixels),
            width = ow, height = oh)
        }
      }
    }
  }

  /**
   * Media-type sniffing as a pure Catalyst program (no UDF): the
   * container format comes from the FILE'S MAGIC BYTES, never from
   * the metadata column — crawled corpora routinely mislabel
   * content-types, and routing a WAV into a BMP decoder must be a
   * classified mismatch, not an executor exception. Recognizes the
   * two container formats the decode seam implements (`BM`;
   * `RIFF..WAVE`) and classifies everything else as octet-stream.
   * Scan-local and codegen'd: sniffing 100 TB costs one projection.
   */
  def sniffMediaType(bytes: Column): Column =
    when(substring(bytes, 1, 2) === lit("BM".getBytes), lit("image/bmp"))
      .when(substring(bytes, 1, 4) ===
        lit(Array(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte)),
        lit("image/png"))
      .when(substring(bytes, 1, 4) === lit("GIF8".getBytes), lit("image/gif"))
      .when(substring(bytes, 1, 4) === lit("qoif".getBytes), lit("image/qoi"))
      .when(substring(bytes, 1, 4) ===
        lit(Array('I'.toByte, 'I'.toByte, 42.toByte, 0.toByte)) ||
        substring(bytes, 1, 4) ===
        lit(Array('M'.toByte, 'M'.toByte, 0.toByte, 42.toByte)),
        lit("image/tiff"))
      .when(substring(bytes, 1, 3) ===
        lit(Array(0xff.toByte, 0xd8.toByte, 0xff.toByte)), lit("image/jpeg"))
      .when(substring(bytes, 1, 4) === lit("RIFF".getBytes) &&
        substring(bytes, 9, 4) === lit("WAVE".getBytes), lit("audio/wav"))
      .when(substring(bytes, 1, 4) === lit("RIFF".getBytes) &&
        substring(bytes, 9, 4) === lit("AVI ".getBytes), lit("video/avi"))
      .otherwise(lit("application/octet-stream"))

  /**
   * REAL μ-law stream decode through the typed seam: each asset's
   * bytes are a headerless G.711 μ-law sample stream (the telephony
   * wire format); decode is pure integer companding inversion
   * (`Mulaw.decodeSample`), features are exact BIGINT sums over the
   * decoded linear samples. Embarrassingly parallel, no shuffle.
   */
  /**
   * Framed audio energy through the decode seam — the
   * voice-activity-detection building block: each WAV decodes
   * (`Wav.decode`) and splits into fixed-length frames of `frameLen`
   * interleaved samples, each emitting exact integer Σ|s|, Σs², and
   * peak (the tail frame keeps its TRUE sample count, never padded).
   * Energy contours, silence gating, and speech/music splits all read
   * off these rows; the 1/frameLen data reduction happens inside the
   * partition — samples never shuffle.
   */
  def wavFrameEnergy(assets: Dataset[Asset],
                     frameLen: Int): Dataset[AudioFrame] = {
    require(frameLen >= 1, "frameLen must be >= 1")
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.flatMap { a =>
        val pcm = Wav.decode(a.bytes)
        val n = pcm.samples.length
        val nf = (n + frameLen - 1) / frameLen
        (0 until nf).iterator.map { f =>
          var i = f * frameLen
          val end = math.min(i + frameLen, n)
          var sa = 0L; var en = 0L; var pk = 0
          while (i < end) {
            val s = pcm.samples(i).toInt
            val as = math.abs(s)
            sa += as
            en += s.toLong * s
            if (as > pk) pk = as
            i += 1
          }
          AudioFrame(a.asset_id, f, (end - f * frameLen).toLong, sa, en, pk)
        }
      }
    }
  }

  def decodeMulawSignal(assets: Dataset[Asset]): Dataset[MulawSignal] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        var i = 0
        var s = 0L; var sa = 0L; var pk = 0
        while (i < a.bytes.length) {
          val x = Mulaw.decodeSample(a.bytes(i) & 0xff)
          s += x
          val ax = math.abs(x)
          sa += ax
          if (ax > pk) pk = ax
          i += 1
        }
        MulawSignal(a.asset_id, a.bytes.length.toLong, s, sa, pk)
      }
    }
  }

  /**
   * REAL video decode through the same partition-batched seam: each
   * asset's bytes are parsed as an actual AVI file (`Avi.decode` —
   * RIFF tree walk, header parse, per-frame bottom-up DIB flip), and
   * only every `sampleEvery`-th frame is feature-extracted (frame 0,
   * k, 2k, …) — the standard frame-sampling posture that keeps video
   * decode cost proportional to 1/k while the container metadata
   * stays exact. Luma sums are exact integers over sampled frames
   * (the [[decodeBmpFeatures]] contract), so downstream aggregates
   * replay without float drift. Embarrassingly parallel, no shuffle;
   * pixels never leave the partition.
   */
  def decodeAviFrames(assets: Dataset[Asset],
                      sampleEvery: Int): Dataset[VideoFeatures] = {
    require(sampleEvery >= 1, "sampleEvery must be >= 1")
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        val v = Avi.decode(a.bytes)
        var i = 0
        var nS = 0
        var lumaSum = 0L
        while (i < v.frames.length) {
          if (i % sampleEvery == 0) {
            nS += 1
            val p = v.frames(i)
            var j = 0
            while (j < p.length) {
              lumaSum += Bmp.luma(p(j) & 0xff, p(j + 1) & 0xff, p(j + 2) & 0xff)
              j += 3
            }
          }
          i += 1
        }
        VideoFeatures(a.asset_id, v.width, v.height, v.frames.length,
          v.usecPerFrame, nS, nS.toLong * v.width * v.height, lumaSum)
      }
    }
  }

  /**
   * Mixed-corpus decode dispatch: sniff every asset's container from
   * its magic bytes, route image assets through the BMP decoder and
   * audio assets through the WAV signal decoder, and return one thin
   * summary row per asset — (`asset_id`, `claimed` media_type,
   * `sniffed`, `n_units` = pixels or samples, `checksum` = exact
   * integer luma-sum or energy). Assets whose bytes match neither
   * container pass through as sniffed octet-stream with zero units —
   * classified, never thrown. The claimed-vs-sniffed pair is the
   * corpus-hygiene report (mislabel rate per source) every multimodal
   * lake needs before decode jobs fan out.
   */
  def dispatchDecode(assets: Dataset[Asset]): DataFrame = {
    val s = assets.sparkSession
    import s.implicits._
    val sniffed = assets.toDF()
      .withColumn("__sniffed", sniffMediaType(col("bytes")))
    val enc = org.apache.spark.sql.Encoders.product[Asset]
    def typed(df: DataFrame) = df
      .select(col("asset_id"), col("media_type"), col("bytes"),
        col("width"), col("height")).as[Asset](enc)
    val img = decodeBmpFeatures(typed(sniffed.filter(col("__sniffed") === "image/bmp")))
      .select(col("asset_id"), col("n_pixels").as("n_units"),
        col("sum_luma").as("checksum"))
    val png = decodePngFeatures(typed(sniffed.filter(col("__sniffed") === "image/png")))
      .select(col("asset_id"), col("n_pixels").as("n_units"),
        col("sum_luma").as("checksum"))
    val gif = decodeGifFeatures(typed(sniffed.filter(col("__sniffed") === "image/gif")))
      .select(col("asset_id"), col("n_pixels").as("n_units"),
        col("sum_luma").as("checksum"))
    val jpg = decodeJpegFeatures(typed(sniffed.filter(col("__sniffed") === "image/jpeg")))
      .select(col("asset_id"), col("n_pixels").as("n_units"),
        col("sum_luma").as("checksum"))
    val aud = decodeWavSignal(typed(sniffed.filter(col("__sniffed") === "audio/wav")))
      .select(col("asset_id"), col("n_samples").as("n_units"),
        col("energy").as("checksum"))
    val other = sniffed.filter(col("__sniffed") === "application/octet-stream")
      .select(col("asset_id"), lit(0L).as("n_units"), lit(0L).as("checksum"))
    sniffed.select(col("asset_id"), col("media_type").as("claimed"),
        col("__sniffed").as("sniffed"))
      .join(img.unionByName(png).unionByName(gif).unionByName(jpg)
        .unionByName(aud).unionByName(other), "asset_id")
  }

  /**
   * Frame sampling as a pure Catalyst program (no UDF): treat the
   * binary payload as fixed-size frames and keep every `everyN`-th —
   * the video-pipeline shape (decode happens downstream on the sampled
   * frames only, cutting decode cost by everyN×).
   */
  def frameSample(df: DataFrame, bytesCol: String, frameSize: Int,
                  everyN: Int): DataFrame = {
    require(frameSize > 0 && everyN > 0, "frameSize and everyN must be positive")
    val nFrames = ceil(length(col(bytesCol)).cast("double") / frameSize).cast("long")
    // guard empty payloads: sequence(0, -1) would generate a DESCENDING
    // [0, -1] range (Spark infers step -1), not an empty one
    df.withColumn("__frame_idx",
        explode(when(nFrames > 0, filter(sequence(lit(0L), nFrames - 1),
            i => i % everyN === 0))
          .otherwise(array().cast("array<long>"))))
      .withColumn("frame",
        // substring on BINARY slices bytes; 1-based offset
        expr(s"substring($bytesCol, CAST(__frame_idx * $frameSize + 1 AS INT), $frameSize)"))
      .withColumn("frame_idx", col("__frame_idx"))
      .drop("__frame_idx")
  }

  /** Resize metadata transform (stub): a real implementation rewrites
    * pixels in `stubDecode`'s seam; the metadata contract — scaled
    * dimensions travel with the asset — is what downstream operators
    * consume and what this pins. */
  def resizeMeta(df: DataFrame, maxDim: Int): DataFrame = {
    val scale = least(lit(1.0),
      lit(maxDim.toDouble) / greatest(col("width"), col("height")))
    df.withColumn("out_width", floor(col("width") * scale).cast("int"))
      .withColumn("out_height", floor(col("height") * scale).cast("int"))
  }
}
