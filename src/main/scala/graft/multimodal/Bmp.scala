package graft.multimodal

/**
 * Pure-JVM BMP (Windows bitmap) codec: 24-bit uncompressed BI_RGB,
 * BITMAPINFOHEADER. This replaces the histogram stand-in behind the
 * multimodal decode seam with a REAL format decode — header magic,
 * little-endian field parsing, bottom-up row order, 4-byte row-stride
 * padding, and negative-height (top-down) files are all handled, and
 * anything else fails loudly rather than returning garbage.
 *
 * BMP is the one raster format decodable with zero dependencies (no
 * entropy coding), which is why it is the format the decode seam goes
 * real on in this container; a JPEG/PNG library drops into the same
 * seam (`Multimodal.decodeBmpFeatures`) with no plan change.
 *
 * The reference has no multimodal surface at all (its data plane is
 * Kafka Connect records); this family is the training-data-pipeline
 * axis of the builder's brief.
 */
object Bmp {

  /** Decoded raster: `pixels` is top-down row-major BGR triplets
    * (stride exactly `width * 3`, padding stripped). */
  final case class Raster(width: Int, height: Int, pixels: Array[Byte])

  private val FileHeaderSize = 14
  private val InfoHeaderSize = 40

  private def rowStride(width: Int): Int = (width * 3 + 3) & ~3

  // ---- little-endian primitives over a plain Array[Byte] ----
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

  /** Encode top-down row-major BGR triplets as a standard bottom-up
    * 24-bit BMP file. `bgr.length` must be `width * height * 3`. */
  def encode(width: Int, height: Int, bgr: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
    require(bgr.length == width * height * 3,
      s"pixel buffer ${bgr.length} != ${width * height * 3}")
    val stride = rowStride(width)
    val imageSize = stride * height
    val fileSize = FileHeaderSize + InfoHeaderSize + imageSize
    val out = new Array[Byte](fileSize) // zero-filled => padding bytes are 0
    out(0) = 'B'; out(1) = 'M'
    writeI32(out, 2, fileSize)
    writeI32(out, 10, FileHeaderSize + InfoHeaderSize) // pixel data offset
    writeI32(out, 14, InfoHeaderSize)
    writeI32(out, 18, width)
    writeI32(out, 22, height) // positive => bottom-up (the standard layout)
    writeU16(out, 26, 1) // planes
    writeU16(out, 28, 24) // bits per pixel
    writeI32(out, 30, 0) // BI_RGB (uncompressed)
    writeI32(out, 34, imageSize)
    writeI32(out, 38, 2835); writeI32(out, 42, 2835) // 72 DPI in px/m
    var row = 0
    while (row < height) {
      // file rows run bottom-up: file row `row` holds image row h-1-row
      val src = (height - 1 - row) * width * 3
      System.arraycopy(bgr, src, out, FileHeaderSize + InfoHeaderSize + row * stride,
        width * 3)
      row += 1
    }
    out
  }

  /** Encode a grayscale image (one byte per pixel, top-down row-major)
    * by replicating the gray value into all three BGR channels. */
  def encodeGray(width: Int, height: Int, gray: Array[Byte]): Array[Byte] = {
    require(gray.length == width * height,
      s"gray buffer ${gray.length} != ${width * height}")
    val bgr = new Array[Byte](gray.length * 3)
    var i = 0
    while (i < gray.length) {
      val g = gray(i)
      bgr(i * 3) = g; bgr(i * 3 + 1) = g; bgr(i * 3 + 2) = g
      i += 1
    }
    encode(width, height, bgr)
  }

  /** Decode a 24-bit uncompressed BMP. Accepts bottom-up (positive
    * height) and top-down (negative height) files and any
    * BITMAPINFOHEADER-or-later header size; throws
    * IllegalArgumentException on anything this decoder cannot
    * faithfully decode (wrong magic, compressed, palette, 16/32-bit). */
  def decode(bytes: Array[Byte]): Raster = {
    require(bytes.length >= FileHeaderSize + InfoHeaderSize,
      s"truncated BMP: ${bytes.length} bytes")
    require(bytes(0) == 'B' && bytes(1) == 'M', "bad magic: not a BMP file")
    val dataOffset = readI32(bytes, 10)
    val headerSize = readI32(bytes, 14)
    require(headerSize >= InfoHeaderSize,
      s"unsupported header size $headerSize (BITMAPCOREHEADER not supported)")
    val width = readI32(bytes, 18)
    val rawHeight = readI32(bytes, 22)
    val planes = readU16(bytes, 26)
    val bpp = readU16(bytes, 28)
    val compression = readI32(bytes, 30)
    require(width > 0 && rawHeight != 0, s"bad dimensions ${width}x$rawHeight")
    require(planes == 1, s"bad planes $planes")
    require(bpp == 24, s"unsupported bit depth $bpp (only 24-bit)")
    require(compression == 0, s"unsupported compression $compression (only BI_RGB)")
    val topDown = rawHeight < 0
    val height = math.abs(rawHeight)
    val stride = rowStride(width)
    require(dataOffset >= FileHeaderSize + headerSize &&
      dataOffset.toLong + stride.toLong * height <= bytes.length,
      s"pixel data out of bounds (offset $dataOffset, ${bytes.length} bytes)")
    val out = new Array[Byte](width * height * 3)
    var row = 0
    while (row < height) {
      val imgRow = if (topDown) row else height - 1 - row
      System.arraycopy(bytes, dataOffset + row * stride, out, imgRow * width * 3,
        width * 3)
      row += 1
    }
    Raster(width, height, out)
  }

  /** Nearest-neighbor resample: output pixel (x, y) copies source pixel
    * (x*srcW/outW, y*srcH/outH) — integer floor sampling, the exact
    * arithmetic an oracle can replay. */
  def resizeNearest(r: Raster, outW: Int, outH: Int): Raster = {
    require(outW > 0 && outH > 0, s"bad output dimensions ${outW}x$outH")
    val out = new Array[Byte](outW * outH * 3)
    var y = 0
    while (y < outH) {
      val sy = y * r.height / outH
      var x = 0
      while (x < outW) {
        val sx = x * r.width / outW
        val si = (sy * r.width + sx) * 3
        val di = (y * outW + x) * 3
        out(di) = r.pixels(si)
        out(di + 1) = r.pixels(si + 1)
        out(di + 2) = r.pixels(si + 2)
        x += 1
      }
      y += 1
    }
    Raster(outW, outH, out)
  }

  /** Integer ITU-R BT.601 luma of a BGR pixel, in [0, 255]. Weights sum
    * to exactly 1000, so a gray pixel (b=g=r) round-trips bit-exact. */
  def luma(b: Int, g: Int, r: Int): Int = (r * 299 + g * 587 + b * 114) / 1000

  /** 64-bit difference hash (dHash) of a raster: nearest-neighbor
    * downscale to a 9×8 luma thumbnail, then bit `y*8 + x` is set iff
    * the pixel right of (x, y) is strictly brighter — 8 comparisons
    * per row × 8 rows. Comparisons are invariant under any uniform
    * monotone brightness change (the property that makes dHash a
    * NEAR-duplicate key where a byte hash is an exact one), and every
    * step is integer arithmetic (floor resample + integer luma), so an
    * external oracle replays codes bit-for-bit. */
  def dhash64(r: Raster): Long = {
    val t = resizeNearest(r, 9, 8)
    val p = t.pixels
    var code = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        val a = (y * 9 + x) * 3
        val b = a + 3
        val la = luma(p(a) & 0xff, p(a + 1) & 0xff, p(a + 2) & 0xff)
        val lb = luma(p(b) & 0xff, p(b + 1) & 0xff, p(b + 2) & 0xff)
        if (lb > la) code |= 1L << (y * 8 + x)
        x += 1
      }
      y += 1
    }
    code
  }

  /** Per-image luma statistics over a decoded raster: 16-bin histogram
    * plus the exact integer luma sum (callers derive exact fixed-point
    * means from it — never a lossy double). */
  def lumaStats(raster: Raster, bins: Int): (Array[Long], Long) = {
    val hist = new Array[Long](bins)
    var sum = 0L
    var i = 0
    val p = raster.pixels
    while (i < p.length) {
      val l = luma(p(i) & 0xff, p(i + 1) & 0xff, p(i + 2) & 0xff)
      hist(l * bins / 256) += 1
      sum += l
      i += 3
    }
    (hist, sum)
  }
}
