package graft.multimodal

/**
 * Pure-JVM AVI (RIFF) video container codec: AVI 1.0, one 'vids'
 * stream of uncompressed 24-bit DIB frames (fourcc 'DIB '). This
 * extends the multimodal decode seam to the VIDEO axis with a REAL
 * container — RIFF framing, nested LIST walking ('hdrl' → 'avih' +
 * 'strl'/'strh'/'strf', then 'movi' frame chunks, then the 'idx1'
 * index), little-endian fields, word-aligned chunk padding, and the
 * same bottom-up/stride-padded DIB pixel layout as [[Bmp]] — and
 * anything else (compressed streams, missing headers, truncated
 * chunks) fails loudly rather than returning garbage.
 *
 * Uncompressed DIB is the one video payload decodable with zero
 * dependencies (no inter-frame or entropy coding), which is why it is
 * the codec the video seam goes real on in this container; an
 * MJPEG/H.264 library drops into the same seam
 * (`Multimodal.decodeAviFrames`) with no plan change.
 *
 * The reference has no multimodal surface at all; this family is the
 * training-data-pipeline axis of the builder's brief (frame sampling
 * is named there explicitly).
 */
object Avi {

  /** Decoded video: frames are top-down row-major BGR rasters (the
    * [[Bmp.Raster]] pixel contract), in stream order. */
  final case class Video(width: Int, height: Int, usecPerFrame: Int,
                         frames: Vector[Array[Byte]])

  private def fcc(s: String): Int =
    (s(0) & 0xff) | ((s(1) & 0xff) << 8) | ((s(2) & 0xff) << 16) |
      ((s(3) & 0xff) << 24)

  private val RIFF = fcc("RIFF")
  private val AVI_ = fcc("AVI ")
  private val LIST = fcc("LIST")

  private def readI32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
  private def writeI32(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte
    b(off + 1) = ((v >> 8) & 0xff).toByte
    b(off + 2) = ((v >> 16) & 0xff).toByte
    b(off + 3) = ((v >> 24) & 0xff).toByte
  }
  private def writeU16(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte; b(off + 1) = ((v >> 8) & 0xff).toByte
  }

  private def rowStride(width: Int): Int = (width * 3 + 3) & ~3

  /**
   * Encode top-down row-major BGR frames (each `width*height*3`
   * bytes) as a standard AVI file with a single uncompressed 'vids'
   * stream. `usecPerFrame` sets the nominal frame duration (the
   * 'avih' field players read as the frame rate).
   */
  def encode(width: Int, height: Int, usecPerFrame: Int,
             frames: Seq[Array[Byte]]): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
    require(frames.nonEmpty, "need at least one frame")
    require(usecPerFrame > 0, "usecPerFrame must be > 0")
    frames.foreach(f => require(f.length == width * height * 3,
      s"frame buffer ${f.length} != ${width * height * 3}"))
    val stride = rowStride(width)
    val dibSize = stride * height // even: stride is 4-aligned
    val nf = frames.size
    val hdrlSize = 4 + (8 + 56) + (8 + 4 + (8 + 56) + (8 + 40))
    val moviSize = 4 + nf * (8 + dibSize)
    val idx1Size = nf * 16
    val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize) + (8 + idx1Size)
    val out = new Array[Byte](8 + riffSize)
    var p = 0
    def putFcc(s: String): Unit = { writeI32(out, p, fcc(s)); p += 4 }
    def putI32(v: Int): Unit = { writeI32(out, p, v); p += 4 }
    def putU16(v: Int): Unit = { writeU16(out, p, v); p += 2 }

    putFcc("RIFF"); putI32(riffSize); putFcc("AVI ")
    // ---- LIST hdrl ----
    putFcc("LIST"); putI32(hdrlSize); putFcc("hdrl")
    putFcc("avih"); putI32(56)
    putI32(usecPerFrame)
    // dwMaxBytesPerSec in Long: dibSize * 1e6 overflows Int for any
    // frame over ~2 KB
    putI32((dibSize.toLong * 1000000L / usecPerFrame)
      .min(Int.MaxValue.toLong).max(0L).toInt)
    putI32(0) // padding granularity
    putI32(0x10) // AVIF_HASINDEX
    putI32(nf); putI32(0) // total frames, initial frames
    putI32(1) // streams
    putI32(dibSize) // suggested buffer size
    putI32(width); putI32(height)
    putI32(0); putI32(0); putI32(0); putI32(0) // reserved
    //   ---- LIST strl ----
    putFcc("LIST"); putI32(4 + (8 + 56) + (8 + 40)); putFcc("strl")
    putFcc("strh"); putI32(56)
    putFcc("vids"); putFcc("DIB ")
    putI32(0); putU16(0); putU16(0) // flags, priority, language
    putI32(0) // initial frames
    putI32(usecPerFrame); putI32(1000000) // scale, rate: fps = rate/scale
    putI32(0); putI32(nf) // start, length (frames)
    putI32(dibSize); putI32(-1) // suggested buffer, quality (default)
    putI32(0) // sample size (0 = varies / one frame per chunk)
    putU16(0); putU16(0); putU16(width); putU16(height) // rcFrame
    putFcc("strf"); putI32(40) // BITMAPINFOHEADER
    putI32(40); putI32(width); putI32(height)
    putU16(1); putU16(24) // planes, bit count
    putI32(0); putI32(dibSize) // BI_RGB, image size
    putI32(2835); putI32(2835); putI32(0); putI32(0)
    // ---- LIST movi ----
    val moviStart = p
    putFcc("LIST"); putI32(moviSize); putFcc("movi")
    val offsets = new Array[Int](nf)
    frames.zipWithIndex.foreach { case (f, i) =>
      offsets(i) = p - (moviStart + 8) // offset from 'movi' fourcc
      putFcc("00db"); putI32(dibSize)
      var row = 0
      while (row < height) { // file rows run bottom-up, like BMP
        System.arraycopy(f, (height - 1 - row) * width * 3, out,
          p + row * stride, width * 3)
        row += 1
      }
      p += dibSize
    }
    // ---- idx1 ----
    putFcc("idx1"); putI32(idx1Size)
    offsets.foreach { off =>
      putFcc("00db"); putI32(0x10) // AVIIF_KEYFRAME
      putI32(off); putI32(dibSize)
    }
    require(p == out.length, s"encoder laid out $p of ${out.length}")
    out
  }

  /** Encode grayscale frames (one byte per pixel, top-down) by
    * replicating the gray value into all three BGR channels. */
  def encodeGray(width: Int, height: Int, usecPerFrame: Int,
                 frames: Seq[Array[Byte]]): Array[Byte] =
    encode(width, height, usecPerFrame, frames.map { g =>
      require(g.length == width * height,
        s"gray buffer ${g.length} != ${width * height}")
      val bgr = new Array[Byte](g.length * 3)
      var i = 0
      while (i < g.length) {
        bgr(i * 3) = g(i); bgr(i * 3 + 1) = g(i); bgr(i * 3 + 2) = g(i)
        i += 1
      }
      bgr
    })

  /**
   * Decode an AVI file with one uncompressed 24-bit DIB video stream.
   * Walks the RIFF tree (any chunk order inside lists, word-aligned
   * padding), takes dimensions and frame duration from 'avih',
   * verifies the stream format via 'strf' (24-bit BI_RGB), and
   * decodes every '00db'/'00dc' chunk in the 'movi' list through the
   * shared bottom-up row flip + stride strip. Throws
   * IllegalArgumentException on anything it cannot faithfully decode.
   */
  def decode(bytes: Array[Byte]): Video = {
    require(bytes.length >= 12, "not an AVI file: too short")
    require(readI32(bytes, 0) == RIFF && readI32(bytes, 8) == AVI_,
      "not an AVI file: bad RIFF/AVI magic")
    var width = -1; var height = -1; var usec = -1
    var fmtOk = false
    val frames = Vector.newBuilder[Array[Byte]]

    def decodeFrame(off: Int, size: Int): Array[Byte] = {
      val stride = rowStride(width)
      require(size >= stride * height, s"frame chunk $size < ${stride * height}")
      val px = new Array[Byte](width * height * 3)
      var row = 0
      while (row < height) {
        System.arraycopy(bytes, off + (height - 1 - row) * stride, px,
          row * width * 3, width * 3)
        row += 1
      }
      px
    }

    def walk(start: Int, end: Int, inMovi: Boolean): Unit = {
      var p = start
      while (p + 8 <= end) {
        val id = readI32(bytes, p)
        val size = readI32(bytes, p + 4)
        require(size >= 0 && p + 8 + size <= end,
          s"truncated chunk at $p: size $size exceeds enclosing list")
        if (id == LIST) {
          val listType = readI32(bytes, p + 8)
          walk(p + 12, p + 8 + size, inMovi || listType == fcc("movi"))
        } else if (id == fcc("avih")) {
          require(size >= 40, "avih too short")
          usec = readI32(bytes, p + 8)
          width = readI32(bytes, p + 8 + 32)
          height = readI32(bytes, p + 8 + 36)
          require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
        } else if (id == fcc("strf")) {
          require(size >= 40, "strf too short")
          val bits = (bytes(p + 8 + 14) & 0xff) | ((bytes(p + 8 + 15) & 0xff) << 8)
          val comp = readI32(bytes, p + 8 + 16)
          require(bits == 24 && comp == 0,
            s"unsupported stream format: $bits-bit compression $comp")
          fmtOk = true
        } else if (inMovi && (id == fcc("00db") || id == fcc("00dc"))) {
          require(width > 0 && fmtOk, "frame chunk before headers")
          frames += decodeFrame(p + 8, size)
        }
        p += 8 + size + (size & 1) // chunks are word-aligned
      }
    }

    walk(12, math.min(bytes.length, 8 + readI32(bytes, 4)), inMovi = false)
    require(width > 0 && fmtOk, "missing avih/strf headers")
    val fs = frames.result()
    require(fs.nonEmpty, "no video frames in movi list")
    Video(width, height, usec, fs)
  }
}
