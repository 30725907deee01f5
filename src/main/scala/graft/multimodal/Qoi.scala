package graft.multimodal

import java.io.ByteArrayOutputStream

/**
 * Pure-JVM QOI codec ("Quite OK Image" — the published 2022 one-page
 * spec at qoiformat.org): 14-byte header (magic `qoif`, big-endian
 * width/height, channels, colorspace), then a single pass of six
 * chunk ops — RGB, RGBA, 6-bit INDEX into the rolling 64-slot hash
 * array, 2-bit-per-channel DIFF, LUMA (green-anchored diffs), and
 * RUN (1..62) — closed by the 7×0x00,0x01 end marker. A real,
 * widely-implemented container whose decode exercises a stateful
 * chunk walk (the rolling index array is decoder STATE, unlike
 * BMP/PNG/GIF where rows decode independently); anything this
 * decoder cannot faithfully parse fails loudly.
 *
 * Decode lands on the shared top-down BGR [[Bmp.Raster]] (alpha
 * drops; RGBA chunks still decode — the spec's `channels` field is
 * informative, not structural). The encoder follows the reference
 * greedy op order (run → index → diff → luma → rgb), so a decode of
 * its own output only round-trips if the index-array bookkeeping
 * matches the spec exactly on BOTH sides.
 *
 * The reference has no multimodal surface; this family is the
 * training-data-pipeline axis of the builder's brief.
 */
object Qoi {

  private val Magic: Array[Byte] = "qoif".getBytes("US-ASCII")
  private val OpRgb = 0xFE
  private val OpRgba = 0xFF

  private def hash(r: Int, g: Int, b: Int, a: Int): Int =
    (r * 3 + g * 5 + b * 7 + a * 11) % 64

  private def pack(r: Int, g: Int, b: Int, a: Int): Int =
    (r << 24) | (g << 16) | (b << 8) | a

  private def writeBE(out: ByteArrayOutputStream, v: Int): Unit = {
    out.write((v >>> 24) & 0xff); out.write((v >>> 16) & 0xff)
    out.write((v >>> 8) & 0xff); out.write(v & 0xff)
  }

  /** Encode a top-down BGR raster as 3-channel QOI (alpha 255). */
  def encode(width: Int, height: Int, bgr: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0, "QOI: empty raster")
    require(bgr.length == width * height * 3,
      s"QOI: raster is ${bgr.length} bytes, expected ${width * height * 3}")
    val out = new ByteArrayOutputStream(64 + bgr.length / 2)
    out.write(Magic); writeBE(out, width); writeBE(out, height)
    out.write(3); out.write(0)
    val index = new Array[Int](64)
    var pr = 0; var pg = 0; var pb = 0
    var run = 0
    val n = width * height
    var i = 0
    while (i < n) {
      val b = bgr(i * 3) & 0xff
      val g = bgr(i * 3 + 1) & 0xff
      val r = bgr(i * 3 + 2) & 0xff
      if (r == pr && g == pg && b == pb) {
        run += 1
        if (run == 62) { out.write(0xC0 | (run - 1)); run = 0 }
      } else {
        if (run > 0) { out.write(0xC0 | (run - 1)); run = 0 }
        val h = hash(r, g, b, 255)
        val px = pack(r, g, b, 255)
        if (index(h) == px) out.write(h) // QOI_OP_INDEX
        else {
          index(h) = px
          val dr = r - pr; val dg = g - pg; val db = b - pb
          if (dr >= -2 && dr <= 1 && dg >= -2 && dg <= 1 &&
              db >= -2 && db <= 1)
            out.write(0x40 | ((dr + 2) << 4) | ((dg + 2) << 2) | (db + 2))
          else {
            val drdg = dr - dg; val dbdg = db - dg
            if (dg >= -32 && dg <= 31 && drdg >= -8 && drdg <= 7 &&
                dbdg >= -8 && dbdg <= 7) {
              out.write(0x80 | (dg + 32))
              out.write(((drdg + 8) << 4) | (dbdg + 8))
            } else {
              out.write(OpRgb); out.write(r); out.write(g); out.write(b)
            }
          }
        }
        pr = r; pg = g; pb = b
      }
      i += 1
    }
    if (run > 0) out.write(0xC0 | (run - 1))
    var k = 0
    while (k < 7) { out.write(0); k += 1 }
    out.write(1)
    out.toByteArray
  }

  /** Decode a QOI stream to the shared top-down BGR raster. Rejects
    * bad magic, non-3/4 channels, short streams, and a missing or
    * malformed end marker. */
  def decode(bytes: Array[Byte]): Bmp.Raster = {
    require(bytes.length >= 22, s"QOI: ${bytes.length} bytes is no QOI file")
    var p = 0
    require(bytes(0) == Magic(0) && bytes(1) == Magic(1) &&
      bytes(2) == Magic(2) && bytes(3) == Magic(3), "QOI: bad magic")
    def be32(off: Int): Int =
      ((bytes(off) & 0xff) << 24) | ((bytes(off + 1) & 0xff) << 16) |
        ((bytes(off + 2) & 0xff) << 8) | (bytes(off + 3) & 0xff)
    val width = be32(4); val height = be32(8)
    val channels = bytes(12) & 0xff
    require(width > 0 && height > 0, s"QOI: bad dimensions $width x $height")
    require(channels == 3 || channels == 4, s"QOI: bad channels $channels")
    // Long math: a crafted header whose pixel count wraps Int would
    // otherwise pass every check and return an empty raster silently
    require(width.toLong * height * 3 <= Int.MaxValue,
      s"QOI: raster $width x $height exceeds the supported size")
    p = 14
    val n = width * height
    val out = new Array[Byte](n * 3)
    val index = new Array[Int](64)
    var r = 0; var g = 0; var b = 0; var a = 255
    var i = 0
    while (i < n) {
      require(p < bytes.length - 8, "QOI: truncated chunk stream")
      val b1 = bytes(p) & 0xff; p += 1
      var runLen = 1
      if (b1 == OpRgb) {
        r = bytes(p) & 0xff; g = bytes(p + 1) & 0xff; b = bytes(p + 2) & 0xff
        p += 3
      } else if (b1 == OpRgba) {
        r = bytes(p) & 0xff; g = bytes(p + 1) & 0xff
        b = bytes(p + 2) & 0xff; a = bytes(p + 3) & 0xff
        p += 4
      } else (b1 >>> 6) match {
        case 0 => // QOI_OP_INDEX
          val px = index(b1 & 0x3f)
          r = (px >>> 24) & 0xff; g = (px >>> 16) & 0xff
          b = (px >>> 8) & 0xff; a = px & 0xff
        case 1 => // QOI_OP_DIFF (wrapping per spec)
          r = (r + ((b1 >>> 4) & 0x03) - 2) & 0xff
          g = (g + ((b1 >>> 2) & 0x03) - 2) & 0xff
          b = (b + (b1 & 0x03) - 2) & 0xff
        case 2 => // QOI_OP_LUMA
          val b2 = bytes(p) & 0xff; p += 1
          val dg = (b1 & 0x3f) - 32
          g = (g + dg) & 0xff
          r = (r + dg + ((b2 >>> 4) & 0x0f) - 8) & 0xff
          b = (b + dg + (b2 & 0x0f) - 8) & 0xff
        case _ => // QOI_OP_RUN
          runLen = (b1 & 0x3f) + 1
          require(runLen <= 62, s"QOI: reserved run tag $b1")
      }
      // index the CURRENT pixel after EVERY chunk — including RUN, where
      // the reference decoder stores the run's pixel (the implicit
      // (0,0,0,255) start pixel, if run-emitted first, becomes recallable
      // at slot 53 by a later OP_INDEX in a spec-valid third-party stream;
      // for INDEX/RGB/RGBA/DIFF/LUMA the write is what the per-op writes
      // did before, so own-encoder streams decode unchanged)
      index(hash(r, g, b, a)) = pack(r, g, b, a)
      require(i + runLen <= n, "QOI: chunk stream overruns the raster")
      var k = 0
      while (k < runLen) {
        out((i + k) * 3) = b.toByte
        out((i + k) * 3 + 1) = g.toByte
        out((i + k) * 3 + 2) = r.toByte
        k += 1
      }
      i += runLen
    }
    require(bytes.length - p == 8, "QOI: trailing bytes after pixels")
    var m = 0
    while (m < 7) {
      require(bytes(p + m) == 0, "QOI: bad end marker"); m += 1
    }
    require(bytes(p + 7) == 1, "QOI: bad end marker")
    Bmp.Raster(width, height, out)
  }
}
