package graft.multimodal

import java.io.ByteArrayOutputStream

/**
 * Pure-JVM baseline TIFF codec (the public Adobe TIFF 6.0 spec):
 * II/MM byte-order header, the IFD tag walk (typed 12-byte entries,
 * inline-vs-offset values — the TLV metadata discipline none of the
 * other containers exercise), uncompressed strips, 8-bit grayscale
 * (PhotometricInterpretation 1) and chunky RGB (2). Decode lands on
 * the shared top-down BGR [[Bmp.Raster]]; anything outside the
 * baseline — any compression, tiles, planar layout, palettes,
 * non-8-bit samples — fails loudly rather than decoding wrong.
 *
 * The encoder writes little-endian ("II") single-strip files; the
 * decoder handles BOTH byte orders (a hand-built "MM" fixture pins
 * the big-endian path — encoder output alone would never exercise
 * it).
 *
 * The reference has no multimodal surface; this family is the
 * training-data-pipeline axis of the builder's brief.
 */
object Tiff {

  // tag ids (TIFF 6.0 §8)
  private val TWidth = 256
  private val TLength = 257
  private val TBits = 258
  private val TCompression = 259
  private val TPhotometric = 262
  private val TStripOffsets = 273
  private val TSamplesPerPixel = 277
  private val TRowsPerStrip = 278
  private val TStripByteCounts = 279
  private val TPlanar = 284
  private val TTileWidth = 322

  /** Encode a top-down BGR raster as a little-endian chunky-RGB
    * single-strip baseline TIFF. */
  def encode(width: Int, height: Int, bgr: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0, "TIFF: empty raster")
    require(bgr.length == width * height * 3,
      s"TIFF: raster is ${bgr.length} bytes, expected ${width * height * 3}")
    val out = new ByteArrayOutputStream
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >>> 8) & 0xff) }
    def w32(v: Int): Unit = { w16(v & 0xffff); w16((v >>> 16) & 0xffff) }
    out.write('I'); out.write('I'); w16(42)
    val stripLen = width * height * 3
    // layout: header(8) + strip (+1 pad byte when the strip length is
    // odd — TIFF 6.0 requires every offset, including the IFD and any
    // out-of-entry value array, to be word-aligned) + bits array(6) + IFD
    val pad = stripLen & 1
    val stripOff = 8
    val bitsOff = stripOff + stripLen + pad
    val ifdOff = bitsOff + 6
    w32(ifdOff)
    var i = 0
    while (i < width * height) { // BGR -> RGB strip bytes
      out.write(bgr(i * 3 + 2) & 0xff)
      out.write(bgr(i * 3 + 1) & 0xff)
      out.write(bgr(i * 3) & 0xff)
      i += 1
    }
    if (pad == 1) out.write(0) // word-align bitsOff/ifdOff
    w16(8); w16(8); w16(8) // BitsPerSample values (count 3 > 2 bytes -> offset)
    val entries = Seq[(Int, Int, Int, Int)](
      (TWidth, 3, 1, width), (TLength, 3, 1, height),
      (TBits, 3, 3, bitsOff), (TCompression, 3, 1, 1),
      (TPhotometric, 3, 1, 2), (TStripOffsets, 4, 1, stripOff),
      (TSamplesPerPixel, 3, 1, 3), (TRowsPerStrip, 4, 1, height),
      (TStripByteCounts, 4, 1, stripLen), (TPlanar, 3, 1, 1))
    w16(entries.length)
    entries.foreach { case (tag, typ, count, value) =>
      w16(tag); w16(typ); w32(count)
      if (typ == 3 && count == 1) { w16(value); w16(0) } else w32(value)
    }
    w32(0) // no next IFD
    out.toByteArray
  }

  /** Decode a baseline TIFF (either byte order) to the shared
    * top-down BGR raster. */
  def decode(bytes: Array[Byte]): Bmp.Raster = {
    require(bytes.length >= 8, s"TIFF: ${bytes.length} bytes is no TIFF")
    val le = (bytes(0), bytes(1)) match {
      case ('I', 'I') => true
      case ('M', 'M') => false
      case _ => throw new IllegalArgumentException("TIFF: bad byte-order mark")
    }
    def u16(off: Int): Int =
      if (le) (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8)
      else ((bytes(off) & 0xff) << 8) | (bytes(off + 1) & 0xff)
    def u32(off: Int): Long =
      if (le) (u16(off).toLong | (u16(off + 2).toLong << 16))
      else ((u16(off).toLong << 16) | u16(off + 2).toLong)
    require(u16(2) == 42, "TIFF: bad magic")
    val ifd = u32(4).toInt
    require(ifd >= 8 && ifd + 2 <= bytes.length, "TIFF: bad IFD offset")
    val nEntries = u16(ifd)
    require(ifd + 2 + nEntries * 12 + 4 <= bytes.length, "TIFF: truncated IFD")
    // tag -> (type, count, rawValueOffset) — value field starts at e+8
    var tags = Map.empty[Int, (Int, Long, Int)]
    var k = 0
    while (k < nEntries) {
      val e = ifd + 2 + k * 12
      tags += (u16(e) -> ((u16(e + 2), u32(e + 4), e + 8)))
      k += 1
    }
    def scalar(tag: Int, default: Option[Long] = None): Long =
      tags.get(tag) match {
        case Some((typ, count, off)) =>
          require(count == 1, s"TIFF: tag $tag has count $count, expected 1")
          typ match {
            case 3 => u16(off).toLong
            case 4 => u32(off)
            case t => throw new IllegalArgumentException(
              s"TIFF: tag $tag has unsupported type $t")
          }
        case None => default.getOrElse(throw new IllegalArgumentException(
          s"TIFF: required tag $tag missing"))
      }
    def vector(tag: Int): Seq[Long] = tags.get(tag) match {
      case Some((typ, count, off)) =>
        val width = typ match {
          case 3 => 2
          case 4 => 4
          case t => throw new IllegalArgumentException(
            s"TIFF: tag $tag has unsupported type $t")
        }
        val base =
          if (count * width <= 4) off.toLong else u32(off)
        require(base >= 0 && base + count * width <= bytes.length,
          s"TIFF: tag $tag value array out of bounds " +
            s"(offset $base, ${count}x$width bytes, file ${bytes.length})")
        (0L until count).map { i =>
          val o = (base + i * width).toInt
          if (typ == 3) u16(o).toLong else u32(o)
        }
      case None => throw new IllegalArgumentException(
        s"TIFF: required tag $tag missing")
    }
    require(!tags.contains(TTileWidth), "TIFF: tiled files not supported")
    require(scalar(TCompression, Some(1L)) == 1L,
      "TIFF: only uncompressed (Compression=1) supported")
    require(scalar(TPlanar, Some(1L)) == 1L,
      "TIFF: only chunky (PlanarConfiguration=1) supported")
    val w = scalar(TWidth).toInt
    val h = scalar(TLength).toInt
    require(w > 0 && h > 0, s"TIFF: bad dimensions $w x $h")
    val photo = scalar(TPhotometric)
    val spp = scalar(TSamplesPerPixel, Some(1L)).toInt
    val bits = if (tags.contains(TBits)) vector(TBits) else Seq(8L)
    require(bits.forall(_ == 8L), s"TIFF: only 8-bit samples (got $bits)")
    val (gray, nch) = photo match {
      case 1L => require(spp == 1, s"TIFF: gray with $spp samples"); (true, 1)
      case 2L => require(spp == 3, s"TIFF: RGB with $spp samples"); (false, 3)
      case p => throw new IllegalArgumentException(
        s"TIFF: photometric $p not supported (1=gray, 2=RGB only)")
    }
    require(w.toLong * h * 3 <= Int.MaxValue,
      s"TIFF: raster $w x $h exceeds the supported size")
    val offsets = vector(TStripOffsets)
    val counts = vector(TStripByteCounts)
    require(offsets.length == counts.length, "TIFF: strip table mismatch")
    val rowsPerStrip = scalar(TRowsPerStrip, Some(h.toLong))
    val expected = w.toLong * h * nch
    require(counts.sum == expected,
      s"TIFF: strips hold ${counts.sum} bytes, expected $expected")
    val data = new Array[Byte](expected.toInt)
    var pos = 0
    offsets.zip(counts).zipWithIndex.foreach { case ((off, len), si) =>
      require(off + len <= bytes.length, s"TIFF: strip $si out of bounds")
      require(si == offsets.length - 1 ||
        len == rowsPerStrip * w * nch, s"TIFF: short interior strip $si")
      System.arraycopy(bytes, off.toInt, data, pos, len.toInt)
      pos += len.toInt
    }
    val out = new Array[Byte](w * h * 3)
    var p = 0
    while (p < w * h) {
      if (gray) {
        val g = data(p)
        out(p * 3) = g; out(p * 3 + 1) = g; out(p * 3 + 2) = g
      } else {
        out(p * 3) = data(p * 3 + 2)     // B
        out(p * 3 + 1) = data(p * 3 + 1) // G
        out(p * 3 + 2) = data(p * 3)     // R
      }
      p += 1
    }
    Bmp.Raster(w, h, out)
  }
}
