package graft.multimodal

import java.util.zip.{CRC32, Deflater, Inflater}

/**
 * Pure-JVM PNG codec: non-interlaced 8-bit grayscale (color type 0)
 * and truecolor (color type 2), all five scanline filters, zlib
 * streams via the JDK's built-in Inflater/Deflater — zero new
 * dependencies. The second REAL raster format behind the multimodal
 * decode seam (beside [[Bmp]]): chunk framing, big-endian fields, CRC
 * verification, and per-row unfiltering are all exercised, and
 * anything this decoder cannot faithfully decode fails loudly.
 *
 * The encoder deliberately CYCLES the filter type per row
 * (None/Sub/Up/Average/Paeth in turn), so a decode of its own output
 * only round-trips if every unfilter path is bit-correct — the spec
 * pins that. DEFLATE byte streams are not canonical across zlib
 * builds, so nothing downstream may depend on encoded bytes — only on
 * decode(encode(x)) == x, which IS guaranteed (DEFLATE is lossless).
 *
 * The reference has no multimodal surface; this family is the
 * training-data-pipeline axis of the builder's brief.
 */
object Png {

  private val Signature: Array[Byte] =
    Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

  // ---- big-endian primitives ----
  private def readI32(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)
  private def writeI32(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = ((v >>> 24) & 0xff).toByte
    b(off + 1) = ((v >>> 16) & 0xff).toByte
    b(off + 2) = ((v >>> 8) & 0xff).toByte
    b(off + 3) = (v & 0xff).toByte
  }

  private def chunk(chunkType: String, data: Array[Byte]): Array[Byte] = {
    val t = chunkType.getBytes("US-ASCII")
    require(t.length == 4, s"bad chunk type $chunkType")
    val out = new Array[Byte](12 + data.length)
    writeI32(out, 0, data.length)
    System.arraycopy(t, 0, out, 4, 4)
    System.arraycopy(data, 0, out, 8, data.length)
    val crc = new CRC32
    crc.update(out, 4, 4 + data.length)
    writeI32(out, 8 + data.length, crc.getValue.toInt)
    out
  }

  /** Paeth predictor (PNG spec §9.4): the neighbor (left, up, upleft)
    * closest to left + up − upleft, ties resolved left, up, upleft. */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  private def inflateAll(data: Array[Byte], expected: Int): Array[Byte] = {
    val inf = new Inflater
    inf.setInput(data)
    val out = new Array[Byte](expected)
    var off = 0
    var stalled = false
    while (off < expected && !inf.finished() && !stalled) {
      val n = inf.inflate(out, off, expected - off)
      if (n == 0 && (inf.needsInput || inf.needsDictionary)) stalled = true
      off += n
    }
    require(off == expected, s"IDAT inflated to $off bytes, expected $expected")
    inf.end()
    out
  }

  /**
   * Decode a PNG to the shared top-down BGR [[Bmp.Raster]] (grayscale
   * expands to b=g=r, truecolor swaps RGB→BGR), so every downstream
   * raster op — luma stats, dhash, nearest-neighbor resize — applies
   * unchanged. Verifies the signature, IHDR constraints (8-bit depth,
   * color type 0 or 2, no interlace), every chunk's CRC, and the
   * exact inflated length; unfilters all five filter types.
   */
  def decode(bytes: Array[Byte]): Bmp.Raster = {
    require(bytes.length >= Signature.length + 12, s"truncated PNG: ${bytes.length} bytes")
    require(Signature.indices.forall(i => bytes(i) == Signature(i)),
      "bad magic: not a PNG file")
    var off = Signature.length
    var width = 0; var height = 0; var colorType = -1
    var sawIhdr = false; var sawIend = false
    val idat = new java.io.ByteArrayOutputStream
    while (off < bytes.length && !sawIend) {
      require(off + 12 <= bytes.length, "truncated chunk header")
      val len = readI32(bytes, off)
      require(len >= 0 && off + 12 + len <= bytes.length, s"chunk overruns file (len $len)")
      val ctype = new String(bytes, off + 4, 4, "US-ASCII")
      val crc = new CRC32
      crc.update(bytes, off + 4, 4 + len)
      require(crc.getValue.toInt == readI32(bytes, off + 8 + len),
        s"CRC mismatch in $ctype chunk")
      ctype match {
        case "IHDR" =>
          require(!sawIhdr, "duplicate IHDR")
          require(len == 13, s"bad IHDR length $len")
          width = readI32(bytes, off + 8)
          height = readI32(bytes, off + 12)
          val bitDepth = bytes(off + 16) & 0xff
          colorType = bytes(off + 17) & 0xff
          val compression = bytes(off + 18) & 0xff
          val filterMethod = bytes(off + 19) & 0xff
          val interlace = bytes(off + 20) & 0xff
          require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
          require(bitDepth == 8, s"unsupported bit depth $bitDepth (only 8)")
          require(colorType == 0 || colorType == 2,
            s"unsupported color type $colorType (only gray/truecolor)")
          require(compression == 0 && filterMethod == 0,
            "unsupported compression/filter method")
          require(interlace == 0, "interlaced PNG not supported")
          sawIhdr = true
        case "IDAT" =>
          require(sawIhdr, "IDAT before IHDR")
          idat.write(bytes, off + 8, len)
        case "IEND" => sawIend = true
        case _ => () // ancillary chunks skipped (CRC still verified)
      }
      off += 12 + len
    }
    require(sawIhdr && sawIend, "missing IHDR or IEND")
    val ch = if (colorType == 2) 3 else 1
    val rowBytes = width * ch
    val raw = inflateAll(idat.toByteArray, (1 + rowBytes) * height)
    // unfilter in place into the channel buffer
    val img = new Array[Byte](rowBytes * height)
    var y = 0
    while (y < height) {
      val filter = raw(y * (1 + rowBytes)) & 0xff
      val src = y * (1 + rowBytes) + 1
      val dst = y * rowBytes
      var x = 0
      while (x < rowBytes) {
        val rx = raw(src + x) & 0xff
        val left = if (x >= ch) img(dst + x - ch) & 0xff else 0
        val up = if (y > 0) img(dst - rowBytes + x) & 0xff else 0
        val upLeft = if (y > 0 && x >= ch) img(dst - rowBytes + x - ch) & 0xff else 0
        val v = filter match {
          case 0 => rx
          case 1 => rx + left
          case 2 => rx + up
          case 3 => rx + (left + up) / 2
          case 4 => rx + paeth(left, up, upLeft)
          case f => throw new IllegalArgumentException(s"bad filter type $f in row $y")
        }
        img(dst + x) = (v & 0xff).toByte
        x += 1
      }
      y += 1
    }
    // to shared BGR raster
    val out = new Array[Byte](width * height * 3)
    var i = 0
    while (i < width * height) {
      if (ch == 1) {
        val v = img(i)
        out(i * 3) = v; out(i * 3 + 1) = v; out(i * 3 + 2) = v
      } else {
        out(i * 3) = img(i * 3 + 2)     // B
        out(i * 3 + 1) = img(i * 3 + 1) // G
        out(i * 3 + 2) = img(i * 3)     // R
      }
      i += 1
    }
    Bmp.Raster(width, height, out)
  }

  private def encodeRaw(width: Int, height: Int, ch: Int,
                        channels: Array[Byte], colorType: Int): Array[Byte] = {
    val rowBytes = width * ch
    // filtered stream: one filter-type byte + filtered row, cycling
    // all five filters so decoders must implement every unfilter path
    val raw = new Array[Byte]((1 + rowBytes) * height)
    var y = 0
    while (y < height) {
      val filter = y % 5
      raw(y * (1 + rowBytes)) = filter.toByte
      val src = y * rowBytes
      val dst = y * (1 + rowBytes) + 1
      var x = 0
      while (x < rowBytes) {
        val v = channels(src + x) & 0xff
        val left = if (x >= ch) channels(src + x - ch) & 0xff else 0
        val up = if (y > 0) channels(src - rowBytes + x) & 0xff else 0
        val upLeft = if (y > 0 && x >= ch) channels(src - rowBytes + x - ch) & 0xff else 0
        val f = filter match {
          case 0 => v
          case 1 => v - left
          case 2 => v - up
          case 3 => v - (left + up) / 2
          case _ => v - paeth(left, up, upLeft)
        }
        raw(dst + x) = (f & 0xff).toByte
        x += 1
      }
      y += 1
    }
    val defl = new Deflater
    defl.setInput(raw)
    defl.finish()
    val buf = new java.io.ByteArrayOutputStream
    val tmp = new Array[Byte](8192)
    while (!defl.finished()) {
      val n = defl.deflate(tmp)
      buf.write(tmp, 0, n)
    }
    defl.end()
    val ihdr = new Array[Byte](13)
    writeI32(ihdr, 0, width)
    writeI32(ihdr, 4, height)
    ihdr(8) = 8 // bit depth
    ihdr(9) = colorType.toByte
    val out = new java.io.ByteArrayOutputStream
    out.write(Signature)
    out.write(chunk("IHDR", ihdr))
    out.write(chunk("IDAT", buf.toByteArray))
    out.write(chunk("IEND", Array.emptyByteArray))
    out.toByteArray
  }

  /** Encode top-down BGR triplets as an 8-bit truecolor PNG.
    * `bgr.length` must be `width * height * 3`. */
  def encode(width: Int, height: Int, bgr: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
    require(bgr.length == width * height * 3,
      s"pixel buffer ${bgr.length} != ${width * height * 3}")
    val rgb = new Array[Byte](bgr.length)
    var i = 0
    while (i < width * height) {
      rgb(i * 3) = bgr(i * 3 + 2)
      rgb(i * 3 + 1) = bgr(i * 3 + 1)
      rgb(i * 3 + 2) = bgr(i * 3)
      i += 1
    }
    encodeRaw(width, height, 3, rgb, colorType = 2)
  }

  /** Encode one gray byte per pixel as an 8-bit grayscale PNG. */
  def encodeGray(width: Int, height: Int, gray: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
    require(gray.length == width * height,
      s"pixel buffer ${gray.length} != ${width * height}")
    encodeRaw(width, height, 1, gray, colorType = 0)
  }
}
