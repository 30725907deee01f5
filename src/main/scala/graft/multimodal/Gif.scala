package graft.multimodal

/**
 * Pure-JVM GIF codec: GIF89a logical screen + global color table +
 * image descriptor + REAL LZW (variable-width codes 9→12 bits,
 * LSB-first bit packing, clear/EOI codes, dictionary reset at 4096,
 * 255-byte sub-block framing) — zero new dependencies. The third
 * REAL raster container behind the multimodal decode seam (beside
 * [[Bmp]] and [[Png]]). GIF is inherently palettized, so the encoder
 * takes INDEX pixels + a 256-entry RGB palette and the decoder maps
 * decoded indices back through the file's own color table to the
 * shared top-down BGR [[Bmp.Raster]] — the round trip is bit-exact
 * (LZW is lossless), which is what the spec pins.
 *
 * The decoder is a faithful reader, not a replay of the encoder: it
 * walks extension blocks (graphic control, comment, application) by
 * sub-block framing, honors the header's own color-table size bits,
 * handles the LZW cScSc corner (code == next slot), and fails loudly
 * on interlaced images, local color tables, and out-of-range codes
 * rather than guessing.
 *
 * The reference has no multimodal surface; this family is the
 * training-data-pipeline axis of the builder's brief.
 */
object Gif {

  // ---- little-endian primitives ----
  private def readU16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def writeU16(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte; b(off + 1) = ((v >> 8) & 0xff).toByte
  }

  private val ClearBase = 256
  private val MaxCode = 4095

  /** GIF-LZW compress of 8-bit index pixels (min code size 8): codes
    * start 9 bits wide, grow at the spec's slot boundaries, and the
    * dictionary resets via an explicit CLEAR when slot 4096 fills.
    * Returns the raw code bytes (caller frames them into sub-blocks). */
  private def lzwCompress(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length / 2 + 16)
    var bitBuf = 0L
    var bitCnt = 0
    var width = 9
    def emit(code: Int): Unit = {
      bitBuf |= code.toLong << bitCnt
      bitCnt += width
      while (bitCnt >= 8) {
        out.write((bitBuf & 0xff).toInt)
        bitBuf >>>= 8; bitCnt -= 8
      }
    }
    val clear = ClearBase
    val eoi = ClearBase + 1
    var dict = new java.util.HashMap[Integer, Integer](4096)
    var next = eoi + 1
    emit(clear)
    if (data.nonEmpty) {
      var cur = data(0) & 0xff
      var i = 1
      while (i < data.length) {
        val k = data(i) & 0xff
        val key = (cur << 8) | k
        val hit = dict.get(key)
        if (hit != null) cur = hit.intValue()
        else {
          emit(cur)
          dict.put(key, next)
          next += 1
          if (next == (1 << width) + 1 && width < 12) width += 1
          if (next > MaxCode + 1) {
            emit(clear)
            dict = new java.util.HashMap[Integer, Integer](4096)
            next = eoi + 1
            width = 9
          }
          cur = k
        }
        i += 1
      }
      emit(cur)
    }
    emit(eoi)
    if (bitCnt > 0) out.write((bitBuf & 0xff).toInt)
    out.toByteArray
  }

  /** GIF-LZW decompress: mirrors [[lzwCompress]]'s width schedule per
    * the GIF89a spec, including the cScSc case and CLEAR resets. */
  private def lzwDecompress(codes: Array[Byte], minCodeSize: Int,
                            expected: Int): Array[Byte] = {
    require(minCodeSize >= 2 && minCodeSize <= 8,
      s"bad LZW min code size $minCodeSize")
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val out = new Array[Byte](expected)
    var outPos = 0
    // dictionary as (prefix code, appended byte); literals implicit
    val prefix = new Array[Int](MaxCode + 1)
    val suffix = new Array[Byte](MaxCode + 1)
    var next = eoi + 1
    var width = minCodeSize + 1
    var bitBuf = 0L
    var bitCnt = 0
    var pos = 0
    var prev = -1
    val scratch = new Array[Byte](MaxCode + 2)
    def expand(code: Int): Int = { // writes code's string to scratch, returns len
      var c = code
      var n = 0
      while (c >= clear + 2) { scratch(n) = suffix(c); n += 1; c = prefix(c) }
      scratch(n) = c.toByte; n += 1
      // reverse in place
      var i = 0; var j = n - 1
      while (i < j) {
        val t = scratch(i); scratch(i) = scratch(j); scratch(j) = t
        i += 1; j -= 1
      }
      n
    }
    def writeStr(len: Int): Unit = {
      require(outPos + len <= expected, "GIF: LZW output overruns image")
      System.arraycopy(scratch, 0, out, outPos, len)
      outPos += len
    }
    while (pos < codes.length || bitCnt >= width) {
      while (bitCnt < width && pos < codes.length) {
        bitBuf |= (codes(pos) & 0xffL) << bitCnt
        bitCnt += 8; pos += 1
      }
      if (bitCnt < width) {
        require(outPos == expected, "GIF: LZW stream ends mid-image")
        return out
      }
      val code = (bitBuf & ((1L << width) - 1)).toInt
      bitBuf >>>= width; bitCnt -= width
      if (code == clear) {
        next = eoi + 1; width = minCodeSize + 1; prev = -1
      } else if (code == eoi) {
        require(outPos == expected,
          s"GIF: EOI with $outPos of $expected pixels")
        return out
      } else if (prev == -1) {
        require(code < clear, s"GIF: first code $code not a literal")
        scratch(0) = code.toByte
        writeStr(1)
        prev = code
      } else {
        require(code <= next, s"GIF: code $code beyond dictionary $next")
        val len =
          if (code < next) expand(code)
          else { // cScSc: prev's string + its own first byte
            val n = expand(prev)
            scratch(n) = scratch(0)
            n + 1
          }
        writeStr(len)
        if (next <= MaxCode) {
          prefix(next) = prev
          suffix(next) = scratch(0)
          next += 1
          if (next == (1 << width) && width < 12) width += 1
        }
        prev = code
      }
    }
    require(outPos == expected, s"GIF: ran out of codes at $outPos/$expected")
    out
  }

  /** Encode 8-bit index pixels (top-down row-major, one byte per
    * pixel) + a 256-entry RGB palette (768 bytes) as a GIF89a file. */
  def encode(width: Int, height: Int, indices: Array[Byte],
             palette: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0, "bad dimensions")
    require(indices.length == width * height,
      s"need ${width * height} index bytes, got ${indices.length}")
    require(palette.length == 768, s"need 768 palette bytes, got ${palette.length}")
    val out = new java.io.ByteArrayOutputStream(indices.length / 2 + 800)
    out.write("GIF89a".getBytes("US-ASCII"))
    val lsd = new Array[Byte](7)
    writeU16(lsd, 0, width); writeU16(lsd, 2, height)
    lsd(4) = 0xf7.toByte // GCT present, 8 bits/channel, 256 entries
    lsd(5) = 0; lsd(6) = 0
    out.write(lsd)
    out.write(palette)
    val desc = new Array[Byte](10)
    desc(0) = 0x2c
    writeU16(desc, 1, 0); writeU16(desc, 3, 0)
    writeU16(desc, 5, width); writeU16(desc, 7, height)
    desc(9) = 0 // no local color table, not interlaced
    out.write(desc)
    out.write(8) // LZW min code size
    val codes = lzwCompress(indices)
    var off = 0
    while (off < codes.length) {
      val n = math.min(255, codes.length - off)
      out.write(n)
      out.write(codes, off, n)
      off += n
    }
    out.write(0)    // block terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }

  /** Decoded indexed image before palette mapping. */
  final case class Indexed(width: Int, height: Int, indices: Array[Byte],
                           palette: Array[Byte])

  /** Parse a GIF87a/89a file to its first image's index pixels +
    * active color table. Extensions are walked by sub-block framing;
    * interlace and local color tables fail loudly. */
  def decodeIndexed(bytes: Array[Byte]): Indexed = {
    require(bytes.length >= 13, "GIF: truncated header")
    val sig = new String(bytes, 0, 6, "US-ASCII")
    require(sig == "GIF89a" || sig == "GIF87a", s"GIF: bad signature '$sig'")
    var pos = 6
    pos += 4 // logical screen w/h (image descriptor is authoritative)
    val packed = bytes(pos) & 0xff
    pos += 3 // packed, background index, aspect
    val gctSize = if ((packed & 0x80) != 0) 2 << (packed & 0x07) else 0
    val gct = new Array[Byte](768)
    if (gctSize > 0) {
      require(bytes.length >= pos + gctSize * 3, "GIF: truncated color table")
      System.arraycopy(bytes, pos, gct, 0, gctSize * 3)
      pos += gctSize * 3
    }
    while (true) {
      require(pos < bytes.length, "GIF: missing image descriptor")
      (bytes(pos) & 0xff) match {
        case 0x21 => // extension: label + sub-blocks
          pos += 2
          while ((bytes(pos) & 0xff) != 0) pos += 1 + (bytes(pos) & 0xff)
          pos += 1
        case 0x2c =>
          val w = readU16(bytes, pos + 5)
          val h = readU16(bytes, pos + 7)
          val flags = bytes(pos + 9) & 0xff
          require((flags & 0x40) == 0, "GIF: interlaced images unsupported")
          require((flags & 0x80) == 0, "GIF: local color tables unsupported")
          require(gctSize > 0, "GIF: no color table")
          pos += 10
          val minCodeSize = bytes(pos) & 0xff
          pos += 1
          val data = new java.io.ByteArrayOutputStream(w * h / 2 + 16)
          while ((bytes(pos) & 0xff) != 0) {
            val n = bytes(pos) & 0xff
            data.write(bytes, pos + 1, n)
            pos += 1 + n
          }
          val idx = lzwDecompress(data.toByteArray, minCodeSize, w * h)
          return Indexed(w, h, idx, gct)
        case 0x3b => throw new IllegalArgumentException("GIF: trailer before image")
        case t => throw new IllegalArgumentException(f"GIF: unknown block 0x$t%02x")
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Full decode to the shared top-down BGR raster: indices mapped
    * through the file's OWN color table. */
  def decode(bytes: Array[Byte]): Bmp.Raster = {
    val ind = decodeIndexed(bytes)
    val px = new Array[Byte](ind.width * ind.height * 3)
    var p = 0
    while (p < ind.indices.length) {
      val i = (ind.indices(p) & 0xff) * 3
      px(p * 3) = ind.palette(i + 2)     // B
      px(p * 3 + 1) = ind.palette(i + 1) // G
      px(p * 3 + 2) = ind.palette(i)     // R
      p += 1
    }
    Bmp.Raster(ind.width, ind.height, px)
  }
}
