package graft.multimodal

/**
 * Pure-JVM baseline JPEG decoder (ITU-T T.81 / ISO 10918-1): the
 * dominant web-image container behind the multimodal decode seam,
 * beside [[Bmp]]/[[Png]]/[[Gif]]. Sequential DCT, Huffman-coded,
 * 8-bit samples, grayscale or YCbCr with sampling factors up to 4 —
 * the full baseline profile: marker parsing, DQT/DHT table
 * management, the spec's canonical-code Huffman decode (F.2.2.3
 * MINCODE/MAXCODE/VALPTR), byte-unstuffing, restart intervals with
 * DC-predictor resets, dequantize + dezigzag, the reference float
 * IDCT (A.3.3), centered-bilinear chroma upsampling (libjpeg's
 * triangle-filter weights) and BT.601 YCbCr→BGR into the shared
 * top-down [[Bmp.Raster]].
 *
 * Decode-only by design (the spec-built fixtures and the JDK's own
 * ImageIO writer gate it); anything outside baseline fails LOUDLY:
 * progressive (SOF2), extended/lossless/hierarchical SOFs,
 * arithmetic coding (DAC / SOF9-11), 12-bit precision, 4-component
 * (CMYK) scans, non-interleaved multi-scan files.
 *
 * The reference repo has no multimodal surface; this family is the
 * training-data-pipeline axis of the builder's brief.
 */
object Jpeg {

  /** Zig-zag order: index in stream order → raster index in the 8×8. */
  private val ZigZag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** cos((2x+1)·u·π/16) — the A.3.3 IDCT basis, fixed doubles. */
  private val Cos: Array[Double] = {
    val t = new Array[Double](64)
    for (x <- 0 until 8; u <- 0 until 8)
      t(x * 8 + u) = math.cos((2 * x + 1) * u * math.Pi / 16.0)
    t
  }
  private val InvSqrt2 = 1.0 / math.sqrt(2.0)

  /** Spec F.2.2.3 canonical-code tables. */
  private final class Huff(bits: Array[Int], vals: Array[Int]) {
    val minCode = new Array[Int](17)
    val maxCode = Array.fill(17)(-1)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0; var k = 0
      for (l <- 1 to 16) {
        if (bits(l) > 0) {
          valPtr(l) = k; minCode(l) = code
          code += bits(l); k += bits(l); maxCode(l) = code - 1
        }
        code <<= 1
      }
      require(k == vals.length, s"DHT: ${vals.length} values for $k codes")
    }
    def decode(r: BitReader): Int = {
      var len = 1
      var code = r.readBit()
      while (len < 16 && (maxCode(len) < 0 || code > maxCode(len))) {
        code = (code << 1) | r.readBit(); len += 1
      }
      require(maxCode(len) >= 0 && code <= maxCode(len),
        "corrupt entropy stream: no such Huffman code")
      vals(valPtr(len) + code - minCode(len))
    }
  }

  /** MSB-first bit reader over the entropy-coded segment with FF00
    * unstuffing; a real marker mid-read is corruption (the scan loop
    * consumes RSTs explicitly at restart boundaries, never here). */
  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var cur = 0
    private var nbits = 0
    def byteAlign(): Unit = nbits = 0
    def readBit(): Int = {
      if (nbits == 0) {
        require(pos < b.length, "entropy stream truncated")
        var v = b(pos) & 0xff; pos += 1
        if (v == 0xff) {
          require(pos < b.length, "entropy stream truncated after FF")
          val m = b(pos) & 0xff
          require(m == 0x00,
            f"unexpected marker FF$m%02X inside entropy-coded data")
          pos += 1
        }
        cur = v; nbits = 8
      }
      nbits -= 1
      (cur >> nbits) & 1
    }
    def receive(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v = (v << 1) | readBit(); i += 1 }
      v
    }
    /** Consume an expected RSTn at a restart boundary. */
    def expectRst(n: Int): Unit = {
      byteAlign()
      require(pos + 1 < b.length, "truncated at restart marker")
      require((b(pos) & 0xff) == 0xff && (b(pos + 1) & 0xff) == 0xd0 + n,
        f"expected RST$n%d at restart boundary, got " +
          f"${b(pos) & 0xff}%02X${b(pos + 1) & 0xff}%02X")
      pos += 2
    }
  }

  /** Spec F.2.2.1 EXTEND: map a SIZE-bit magnitude to its signed value. */
  private def extend(v: Int, size: Int): Int =
    if (size == 0) 0
    else if (v < (1 << (size - 1))) v - (1 << size) + 1
    else v

  private final case class Component(id: Int, h: Int, v: Int, tq: Int) {
    var dcTable: Int = 0
    var acTable: Int = 0
  }

  // ---- DC-only grayscale ENCODER: the spec-table fixture builder ----
  // (T.81 Annex K.3.1 DC Huffman table + a minimal 2-code AC table +
  // an all-1s quant table). Each 8×8 block is flat at its gray, DC =
  // 8·(gray−128), so decode(encode(grays)) is EXACT — the gate every
  // oracle-replayable JPEG query runs through. Deliberately NOT a
  // general encoder (no AC coding, no color): decode-only remains the
  // operator surface; this exists to build verifiable streams.

  private val FixtureDcBits =
    Array(0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val FixtureDcVals = (0 to 11).toArray
  private val FixtureAcBits =
    Array(0, 0, 2, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
  private val FixtureAcVals = Array(0x00, 0x01)

  private def canonicalCodes(bits: Array[Int],
                             vals: Array[Int]): Map[Int, (Int, Int)] = {
    var code = 0; var k = 0
    val m = scala.collection.mutable.Map.empty[Int, (Int, Int)]
    for (l <- 1 to 16) {
      for (_ <- 0 until bits(l)) { m(vals(k)) = (code, l); code += 1; k += 1 }
      code <<= 1
    }
    m.toMap
  }

  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream
    private var cur = 0
    private var n = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        cur = (cur << 1) | ((code >> i) & 1); n += 1
        if (n == 8) {
          out.write(cur)
          if (cur == 0xff) out.write(0x00)
          cur = 0; n = 0
        }
        i -= 1
      }
    }
    def flushOnes(): Unit = if (n > 0) put((1 << (8 - n)) - 1, 8 - n)
    def bytes: Array[Byte] = out.toByteArray
  }

  private def segment(marker: Int, body: Array[Int]): Array[Byte] = {
    val len = body.length + 2
    (Array(0xff, marker, len >> 8, len & 0xff) ++ body).map(_.toByte)
  }

  /** Encode a (blocksW·8)×(blocksH·8) grayscale baseline JPEG whose
    * 8×8 blocks are flat at the given grays (row-major, one gray per
    * block, each in [0, 255]); [[decode]] reproduces them EXACTLY. */
  def encodeGrayBlocks(blocksW: Int, blocksH: Int,
                       grays: Array[Int]): Array[Byte] = {
    require(blocksW >= 1 && blocksH >= 1 && grays.length == blocksW * blocksH,
      s"need ${blocksW * blocksH} block grays, got ${grays.length}")
    require(grays.forall(g => g >= 0 && g <= 255), "grays must be in [0, 255]")
    val w = blocksW * 8; val h = blocksH * 8
    val dcCodes = canonicalCodes(FixtureDcBits, FixtureDcVals)
    val (eobCode, eobLen) = canonicalCodes(FixtureAcBits, FixtureAcVals)(0x00)
    val head = Array(0xff.toByte, 0xd8.toByte) ++
      segment(0xdb, Array(0x00) ++ Array.fill(64)(1)) ++
      segment(0xc0, Array(8, h >> 8, h & 0xff, w >> 8, w & 0xff, 1, 1, 0x11, 0)) ++
      segment(0xc4, Array(0x00) ++ FixtureDcBits.drop(1) ++ FixtureDcVals) ++
      segment(0xc4, Array(0x10) ++ FixtureAcBits.drop(1) ++ FixtureAcVals) ++
      segment(0xda, Array(1, 1, 0x00, 0, 63, 0))
    val bw = new BitWriter
    var pred = 0
    grays.foreach { g =>
      val dc = 8 * (g - 128)
      val diff = dc - pred; pred = dc
      val t =
        if (diff == 0) 0
        else 32 - Integer.numberOfLeadingZeros(math.abs(diff))
      val (c, l) = dcCodes(t)
      bw.put(c, l)
      if (t > 0) bw.put(if (diff < 0) diff + (1 << t) - 1 else diff, t)
      bw.put(eobCode, eobLen)
    }
    bw.flushOnes()
    head ++ bw.bytes ++ Array(0xff.toByte, 0xd9.toByte)
  }

  /** Decode a baseline JPEG to the shared top-down BGR raster
    * (grayscale expands to b=g=r). */
  def decode(bytes: Array[Byte]): Bmp.Raster = {
    require(bytes.length >= 4, s"truncated JPEG: ${bytes.length} bytes")
    require((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8,
      "bad magic: not a JPEG file (no SOI)")
    val qt = new Array[Array[Int]](4)
    val dcHuff = new Array[Huff](4)
    val acHuff = new Array[Huff](4)
    var comps: Array[Component] = null
    var width = 0; var height = 0
    var restartInterval = 0
    var pos = 2

    def u16(off: Int): Int = ((bytes(off) & 0xff) << 8) | (bytes(off + 1) & 0xff)

    var scanAt = -1
    while (scanAt < 0) {
      require(pos + 4 <= bytes.length, "truncated segment header")
      require((bytes(pos) & 0xff) == 0xff, f"expected marker at $pos")
      val marker = bytes(pos + 1) & 0xff
      val len = u16(pos + 2)
      require(pos + 2 + len <= bytes.length, f"segment FF$marker%02X overruns file")
      val body = pos + 4
      marker match {
        case 0xc0 => // SOF0: baseline sequential DCT
          require((bytes(body) & 0xff) == 8,
            s"unsupported precision ${bytes(body) & 0xff} (baseline is 8-bit)")
          height = u16(body + 1); width = u16(body + 3)
          require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
          val nc = bytes(body + 5) & 0xff
          require(nc == 1 || nc == 3,
            s"unsupported component count $nc (grayscale or YCbCr only)")
          comps = Array.tabulate(nc) { i =>
            val o = body + 6 + 3 * i
            val hv = bytes(o + 1) & 0xff
            val c = Component(bytes(o) & 0xff, hv >> 4, hv & 0xf,
              bytes(o + 2) & 0xff)
            require(c.h >= 1 && c.h <= 4 && c.v >= 1 && c.v <= 4,
              s"bad sampling factors ${c.h}x${c.v}")
            c
          }
          // T.81 A.2: a single-component scan is NON-interleaved — the
          // MCU is one data unit and sampling factors do not subsample
          // anything (the component IS the image), whatever H/V the
          // SOF declares (ImageIO writes grayscale as 2x2)
          if (nc == 1) comps = comps.map(c => c.copy(h = 1, v = 1))
        case 0xc2 =>
          throw new IllegalArgumentException(
            "progressive JPEG (SOF2) not supported: baseline decoder")
        case 0xc1 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xcd | 0xce | 0xcf =>
          throw new IllegalArgumentException(
            f"unsupported SOF marker FF$marker%02X (baseline SOF0 only)")
        case 0xc9 | 0xca | 0xcb | 0xcc =>
          throw new IllegalArgumentException(
            "arithmetic-coded JPEG not supported: Huffman baseline decoder")
        case 0xc4 => // DHT: one or more tables
          var o = body
          while (o < pos + 2 + len) {
            val tcTh = bytes(o) & 0xff
            val tc = tcTh >> 4; val th = tcTh & 0xf
            require(tc <= 1 && th <= 3, s"bad DHT class/slot $tc/$th")
            val bits = new Array[Int](17)
            var total = 0
            for (l <- 1 to 16) { bits(l) = bytes(o + l) & 0xff; total += bits(l) }
            val vals = Array.tabulate(total)(i => bytes(o + 17 + i) & 0xff)
            val h = new Huff(bits, vals)
            if (tc == 0) dcHuff(th) = h else acHuff(th) = h
            o += 17 + total
          }
        case 0xdb => // DQT: one or more tables
          var o = body
          while (o < pos + 2 + len) {
            val pqTq = bytes(o) & 0xff
            require((pqTq >> 4) == 0,
              "16-bit quantization tables not supported (baseline is 8-bit)")
            val tq = pqTq & 0xf
            require(tq <= 3, s"bad DQT slot $tq")
            qt(tq) = Array.tabulate(64)(i => bytes(o + 1 + i) & 0xff)
            o += 65
          }
        case 0xdd => // DRI
          restartInterval = u16(body)
        case 0xda => // SOS
          require(comps != null, "SOS before SOF0")
          val ns = bytes(body) & 0xff
          require(ns == comps.length,
            s"non-interleaved multi-scan JPEG not supported ($ns of ${comps.length} components in scan)")
          for (i <- 0 until ns) {
            val cs = bytes(body + 1 + 2 * i) & 0xff
            val c = comps.find(_.id == cs).getOrElse(
              throw new IllegalArgumentException(s"SOS names unknown component $cs"))
            val tt = bytes(body + 2 + 2 * i) & 0xff
            c.dcTable = tt >> 4; c.acTable = tt & 0xf
          }
          scanAt = pos + 2 + len
        case 0xd9 =>
          throw new IllegalArgumentException("EOI before any scan data")
        case _ => // APPn, COM, others: skip
      }
      if (scanAt < 0) pos += 2 + len
    }

    // ---- entropy-coded scan ----
    val hMax = comps.map(_.h).max
    val vMax = comps.map(_.v).max
    val mcusX = (width + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (height + 8 * vMax - 1) / (8 * vMax)
    // per-component plane, sized to whole MCUs
    val planeW = comps.map(c => mcusX * c.h * 8)
    val planeH = comps.map(c => mcusY * c.v * 8)
    val planes = comps.indices.map(i =>
      new Array[Byte](planeW(i) * planeH(i))).toArray
    val pred = new Array[Int](comps.length)
    val coef = new Array[Int](64)
    val block = new Array[Int](64)
    val r = new BitReader(bytes, scanAt)
    var rstN = 0
    var mcusSinceRestart = 0

    def decodeBlock(ci: Int): Unit = {
      val c = comps(ci)
      val dc = dcHuff(c.dcTable)
      val ac = acHuff(c.acTable)
      require(dc != null && ac != null, "scan references an undefined Huffman table")
      val q = qt(c.tq)
      require(q != null, "scan references an undefined quantization table")
      java.util.Arrays.fill(coef, 0)
      val t = dc.decode(r)
      require(t <= 11, s"bad DC category $t")
      pred(ci) += extend(r.receive(t), t)
      coef(0) = pred(ci) * q(0)
      var k = 1
      while (k < 64) {
        val rs = ac.decode(r)
        val run = rs >> 4; val size = rs & 0xf
        if (size == 0) {
          if (run == 15) k += 16 // ZRL
          else k = 64 // EOB
        } else {
          k += run
          require(k < 64, "AC run overflows the block")
          coef(ZigZag(k)) = extend(r.receive(size), size) * q(k)
          k += 1
        }
      }
      // A.3.3 float IDCT, separable form folded into one double sum
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          var s = 0.0
          var v = 0
          while (v < 8) {
            var u = 0
            while (u < 8) {
              val f = coef(v * 8 + u)
              if (f != 0) {
                val cu = if (u == 0) InvSqrt2 else 1.0
                val cv = if (v == 0) InvSqrt2 else 1.0
                s += cu * cv * f * Cos(x * 8 + u) * Cos(y * 8 + v)
              }
              u += 1
            }
            v += 1
          }
          val p = math.round(s / 4.0 + 128.0).toInt
          block(y * 8 + x) = if (p < 0) 0 else if (p > 255) 255 else p
          x += 1
        }
        y += 1
      }
    }

    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (restartInterval > 0 && mcusSinceRestart == restartInterval) {
          r.expectRst(rstN)
          rstN = (rstN + 1) % 8
          mcusSinceRestart = 0
          java.util.Arrays.fill(pred, 0)
        }
        var ci = 0
        while (ci < comps.length) {
          val c = comps(ci)
          var bv = 0
          while (bv < c.v) {
            var bh = 0
            while (bh < c.h) {
              decodeBlock(ci)
              val ox = (mx * c.h + bh) * 8
              val oy = (my * c.v + bv) * 8
              var yy = 0
              while (yy < 8) {
                var xx = 0
                while (xx < 8) {
                  planes(ci)((oy + yy) * planeW(ci) + ox + xx) =
                    block(yy * 8 + xx).toByte
                  xx += 1
                }
                yy += 1
              }
              bh += 1
            }
            bv += 1
          }
          ci += 1
        }
        mcusSinceRestart += 1
        mx += 1
      }
      my += 1
    }

    // ---- upsample + color convert into top-down BGR ----
    val out = new Array[Byte](width * height * 3)
    def clamp(d: Double): Byte = {
      val v = math.round(d).toInt
      (if (v < 0) 0 else if (v > 255) 255 else v).toByte
    }
    var py = 0
    while (py < height) {
      var px = 0
      while (px < width) {
        val o = (py * width + px) * 3
        if (comps.length == 1) {
          val g = planes(0)(py * planeW(0) + px)
          out(o) = g; out(o + 1) = g; out(o + 2) = g
        } else {
          // centered bilinear upsampling (libjpeg's triangle filter:
          // the 3/4–1/4 weighting at 2:1, 9:3:3:1 at 2x2) — chroma
          // sample i covers output centers (i+½)·r−½
          def sample(ci: Int): Double = {
            val c = comps(ci)
            if (c.h == hMax && c.v == vMax)
              return (planes(ci)(py * planeW(ci) + px) & 0xff).toDouble
            val cw = (width * c.h + hMax - 1) / hMax
            val ch = (height * c.v + vMax - 1) / vMax
            val fx = (px + 0.5) * c.h / hMax - 0.5
            val fy = (py + 0.5) * c.v / vMax - 0.5
            val x0 = math.max(0, math.min(cw - 1, math.floor(fx).toInt))
            val y0 = math.max(0, math.min(ch - 1, math.floor(fy).toInt))
            val x1 = math.min(cw - 1, x0 + 1)
            val y1 = math.min(ch - 1, y0 + 1)
            val wx = math.max(0.0, math.min(1.0, fx - x0))
            val wy = math.max(0.0, math.min(1.0, fy - y0))
            def p(xx: Int, yy: Int): Double =
              (planes(ci)(yy * planeW(ci) + xx) & 0xff).toDouble
            (1 - wy) * ((1 - wx) * p(x0, y0) + wx * p(x1, y0)) +
              wy * ((1 - wx) * p(x0, y1) + wx * p(x1, y1))
          }
          val yv = sample(0)
          val cb = sample(1) - 128.0
          val cr = sample(2) - 128.0
          out(o) = clamp(yv + 1.772 * cb)                    // B
          out(o + 1) = clamp(yv - 0.344136 * cb - 0.714136 * cr) // G
          out(o + 2) = clamp(yv + 1.402 * cr)                // R
        }
        px += 1
      }
      py += 1
    }
    Bmp.Raster(width, height, out)
  }
}
