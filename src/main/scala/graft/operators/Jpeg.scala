package graft.operators

/** Baseline-JFIF JPEG codec (ITU T.81 sequential DCT, Huffman entropy).
  *
  * == Decoder ==
  * [[decode]] handles the real format: marker walk (APPn/COM skipped, DNL
  * rejected), DQT (8-bit tables), SOF0 (grayscale or 3-component YCbCr,
  * per-component sampling factors 1 or 2), DHT-driven canonical Huffman
  * (tables come from the FILE, never hardcoded), one interleaved SOS,
  * restart markers (DRI/RSTn), byte unstuffing, zigzag + dequantization,
  * double-precision separable IDCT, level shift + clamp, chroma upsample
  * by sample replication, BT.601 YCbCr→RGB for color. Progressive (SOF2),
  * arithmetic coding, 12-bit precision and hierarchical modes are rejected
  * with a routable `IllegalArgumentException` — same throw contract as the
  * BMP/PNG/WAV decoders, so [[Multimodal.decodeFeaturesRouted]] quarantines
  * malformed or unsupported files instead of killing a 100 TB scan.
  *
  * == Encoders (test-vector generators) ==
  * JPEG is lossy, which breaks the repo's exact-oracle discipline — EXCEPT
  * for blocks whose only nonzero coefficient is DC: a constant 8×8 block
  * round-trips exactly (DCT of a flat block is DC-only; with an all-1s
  * quantization table the decoder recovers the flat value bit-exactly, the
  * double-precision IDCT error being ~1e-13 ≪ the 0.5 rounding margin).
  * [[encodeGrayBlocks]] exploits that: one constant block per payload
  * byte, so a DuckDB oracle can recompute every decoded statistic from
  * first principles (`q_jpeg_decode`). [[encodeCoeffBlocksGray]] (spec
  * only) writes arbitrary QUANTIZED coefficient blocks — the entropy
  * decoder, zigzag, dequant and IDCT are then pinned against an
  * independent direct-form IDCT without any lossy forward transform; and
  * [[encodeSolidColor]] (spec only) emits subsampled YCbCr images whose
  * constant planes make the color path exactly predictable too.
  *
  * Scale note: decode is row-local CPU behind `mapPartitions`, identical in
  * shape to the PNG path; the separable IDCT is ~2·8³ multiplies per block
  * in double (chosen for exactness over a fixed-point fast IDCT — the
  * correctness gate demands cross-run determinism, and the swap to an AAN
  * integer IDCT is a per-block local change if decode throughput ever
  * dominates a profile).
  */
object Jpeg {

  final case class JpegStats(width: Int, height: Int, components: Int,
                             sumPx: Long, minPx: Int, maxPx: Int) {
    def nPixels: Long = width.toLong * height
  }

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"jpeg: $msg")
  private def req(cond: Boolean, msg: => String): Unit = if (!cond) fail(msg)

  /** Row-major index of the k-th zigzag position (generated, not typed). */
  private val Zigzag: Array[Int] = {
    val out = new Array[Int](64)
    var k = 0
    for (s <- 0 to 14) {
      if (s % 2 == 0) {
        var u = math.min(s, 7)
        while (u >= math.max(0, s - 7)) { out(k) = u * 8 + (s - u); k += 1; u -= 1 }
      } else {
        var u = math.max(0, s - 7)
        while (u <= math.min(s, 7)) { out(k) = u * 8 + (s - u); k += 1; u += 1 }
      }
    }
    out
  }

  /** A(u,x) = c(u)/2 · cos((2x+1)uπ/16) — the separable IDCT basis. */
  private val Basis: Array[Array[Double]] = Array.tabulate(8, 8) { (u, x) =>
    val c = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
    0.5 * c * math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }

  /** samples(x·8+y) = round(Σ_u Σ_v A(u,x)·A(v,y)·coef(u·8+v)) + 128, clamped. */
  private def idctBlock(coef: Array[Int]): Array[Int] = {
    val tmp = new Array[Double](64)
    var u = 0
    while (u < 8) { // tmp(u,y) = Σ_v coef(u,v)·A(v,y)
      var y = 0
      while (y < 8) {
        var acc = 0.0
        var v = 0
        while (v < 8) { acc += coef(u * 8 + v) * Basis(v)(y); v += 1 }
        tmp(u * 8 + y) = acc
        y += 1
      }
      u += 1
    }
    val out = new Array[Int](64)
    var x = 0
    while (x < 8) {
      var y = 0
      while (y < 8) {
        var acc = 0.0
        var uu = 0
        while (uu < 8) { acc += Basis(uu)(x) * tmp(uu * 8 + y); uu += 1 }
        val s = math.round(acc).toInt + 128
        out(x * 8 + y) = if (s < 0) 0 else if (s > 255) 255 else s
        y += 1
      }
      x += 1
    }
    out
  }

  // ------------------------------------------------------------ decoder ---

  /** Canonical Huffman table decoded from a DHT segment (T.81 F.2.2.3). */
  private final class HuffTable(bits: Array[Int], val huffval: Array[Byte]) {
    val mincode = new Array[Int](17)
    val maxcode = new Array[Int](17) // -1 = no codes at this length
    val valptr = new Array[Int](17)
    locally {
      var code = 0; var k = 0
      var l = 1
      while (l <= 16) {
        if (bits(l) == 0) maxcode(l) = -1
        else {
          valptr(l) = k
          mincode(l) = code
          code += bits(l); k += bits(l)
          maxcode(l) = code - 1
        }
        code <<= 1
        l += 1
      }
    }
  }

  /** MSB-first bit reader over the entropy-coded segment with 0xFF00
    * unstuffing; stops AT markers (restart handling reads them explicitly).
    */
  private final class BitReader(bytes: Array[Byte], var pos: Int) {
    private var cur = 0
    private var nbits = 0

    def readBit(): Int = {
      if (nbits == 0) {
        req(pos < bytes.length, "truncated entropy stream")
        val b = bytes(pos) & 0xFF
        if (b == 0xFF) {
          req(pos + 1 < bytes.length, "truncated after 0xFF in entropy stream")
          val m = bytes(pos + 1) & 0xFF
          req(m == 0x00, f"marker 0xFF$m%02X inside entropy-coded segment")
          pos += 2
        } else pos += 1
        cur = b; nbits = 8
      }
      nbits -= 1
      (cur >> nbits) & 1
    }

    def receive(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v = (v << 1) | readBit(); i += 1 }
      v
    }

    def decodeHuff(t: HuffTable): Int = {
      var code = readBit()
      var l = 1
      while (!(t.maxcode(l) >= 0 && code <= t.maxcode(l))) {
        req(l < 16, "invalid Huffman code (ran past 16 bits)")
        code = (code << 1) | readBit()
        l += 1
      }
      t.huffval(t.valptr(l) + code - t.mincode(l)) & 0xFF
    }

    /** Drop partial bits and consume an expected RSTn marker. */
    def restart(n: Int): Unit = {
      nbits = 0
      req(pos + 1 < bytes.length, "truncated at restart marker")
      req((bytes(pos) & 0xFF) == 0xFF && (bytes(pos + 1) & 0xFF) == (0xD0 + n),
        f"expected RST$n%d marker, got 0x${bytes(pos) & 0xFF}%02X${bytes(pos + 1) & 0xFF}%02X")
      pos += 2
    }

    def alignToMarker(): Unit = { nbits = 0 }
  }

  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  private final case class Component(id: Int, h: Int, v: Int, tq: Int) {
    var dcTbl = 0
    var acTbl = 0
  }

  def decode(bytes: Array[Byte]): JpegStats = decodeImage(bytes).stats

  /** Decoded planes + geometry — the pixel-level surface [[Multimodal
    * .imageDHash]] hashes; [[decode]] derives its stats from the same
    * object so the two can never disagree about reconstruction.
    */
  private[operators] final class DecodedImage(
      val width: Int, val height: Int, val planes: Array[Array[Byte]],
      planeW: Array[Int], sampH: Array[Int], sampV: Array[Int]) {
    val components: Int = planes.length
    private val hMax = sampH.max
    private val vMax = sampV.max

    private def sample(ci: Int, x: Int, y: Int): Int =
      planes(ci)((y * sampV(ci) / vMax) * planeW(ci) + (x * sampH(ci) / hMax)) & 0xFF

    private def clamp(d: Double): Int = {
      val v = math.round(d).toInt
      if (v < 0) 0 else if (v > 255) 255 else v
    }

    /** (r, g, b) at (x, y) — grayscale replicates the single plane. */
    def rgb(x: Int, y: Int): (Int, Int, Int) =
      if (components == 1) { val v = sample(0, x, y); (v, v, v) }
      else {
        val yv = sample(0, x, y)
        val cb = sample(1, x, y) - 128
        val cr = sample(2, x, y) - 128
        (clamp(yv + 1.402 * cr),
          clamp(yv - 0.344136 * cb - 0.714136 * cr),
          clamp(yv + 1.772 * cb))
      }

    /** 3-channel luma r+g+b — the [[Multimodal.imageDHash]] convention. */
    def luma(y: Int, x: Int): Int = {
      val (r, g, b) = rgb(x, y)
      r + g + b
    }

    def stats: JpegStats = {
      var sum = 0L
      var mn = 256
      var mx = -1
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          val (r, g, b) = rgb(x, y)
          if (components == 1) {
            sum += r
            if (r < mn) mn = r
            if (r > mx) mx = r
          } else {
            sum += r + g + b
            val lo = math.min(r, math.min(g, b))
            val hi = math.max(r, math.max(g, b))
            if (lo < mn) mn = lo
            if (hi > mx) mx = hi
          }
          x += 1
        }
        y += 1
      }
      JpegStats(width, height, components, sum, mn, mx)
    }
  }

  private[operators] def decodeImage(bytes: Array[Byte]): DecodedImage = {
    req(bytes.length >= 4 && (bytes(0) & 0xFF) == 0xFF && (bytes(1) & 0xFF) == 0xD8,
      "missing SOI marker")
    def u16(p: Int): Int = {
      req(p + 1 < bytes.length, "truncated segment length")
      ((bytes(p) & 0xFF) << 8) | (bytes(p + 1) & 0xFF)
    }
    val qtables = new Array[Array[Int]](4)
    val dcTables = new Array[HuffTable](4)
    val acTables = new Array[HuffTable](4)
    var comps: Array[Component] = null
    var width = 0; var height = 0
    var restartInterval = 0
    var pos = 2

    var img: DecodedImage = null
    while (img == null) {
      req(pos + 1 < bytes.length, "truncated before marker")
      req((bytes(pos) & 0xFF) == 0xFF, f"expected marker, got 0x${bytes(pos) & 0xFF}%02X")
      var m = bytes(pos + 1) & 0xFF
      while (m == 0xFF) { pos += 1; m = bytes(pos + 1) & 0xFF } // fill bytes
      pos += 2
      m match {
        case 0xD8 => fail("unexpected second SOI")
        case 0xD9 => fail("EOI before a decoded scan")
        case 0xC0 | 0xC1 => // baseline / extended sequential (Huffman)
          val len = u16(pos); req(pos + len <= bytes.length, "truncated SOF")
          val precision = bytes(pos + 2) & 0xFF
          req(precision == 8, s"unsupported sample precision $precision (only 8-bit)")
          height = u16(pos + 3); width = u16(pos + 5)
          req(width > 0 && height > 0, "non-positive dimensions (DNL not supported)")
          req(width.toLong * height * 3 <= Int.MaxValue, "dimensions overflow supported size")
          val nc = bytes(pos + 7) & 0xFF
          req(nc == 1 || nc == 3, s"unsupported component count $nc (grayscale or YCbCr)")
          req(len == 8 + 3 * nc, "bad SOF length")
          comps = Array.tabulate(nc) { i =>
            val o = pos + 8 + 3 * i
            val hv = bytes(o + 1) & 0xFF
            val c = Component(bytes(o) & 0xFF, hv >> 4, hv & 0xF, bytes(o + 2) & 0xFF)
            req(c.h >= 1 && c.h <= 2 && c.v >= 1 && c.v <= 2,
              s"unsupported sampling factors ${c.h}x${c.v} (1 or 2)")
            req(c.tq < 4, s"bad quant table id ${c.tq}")
            c
          }
          pos += len
        case 0xC2 => fail("progressive JPEG not supported (baseline sequential only)")
        case 0xC3 | 0xC5 | 0xC6 | 0xC7 | 0xC9 | 0xCA | 0xCB | 0xCD | 0xCE | 0xCF =>
          fail(f"unsupported SOF marker 0xFF$m%02X (baseline sequential only)")
        case 0xC4 => // DHT — possibly several tables in one segment
          val len = u16(pos); req(pos + len <= bytes.length, "truncated DHT")
          var p = pos + 2
          while (p < pos + len) {
            val tc = (bytes(p) & 0xFF) >> 4
            val th = bytes(p) & 0xF
            req(tc <= 1 && th < 4, s"bad DHT class/id $tc/$th")
            val bits = new Array[Int](17)
            var total = 0
            var l = 1
            while (l <= 16) { bits(l) = bytes(p + l) & 0xFF; total += bits(l); l += 1 }
            req(p + 17 + total <= pos + len, "truncated DHT symbols")
            val vals = java.util.Arrays.copyOfRange(bytes, p + 17, p + 17 + total)
            val t = new HuffTable(bits, vals)
            if (tc == 0) dcTables(th) = t else acTables(th) = t
            p += 17 + total
          }
          pos += len
        case 0xDB => // DQT — possibly several tables
          val len = u16(pos); req(pos + len <= bytes.length, "truncated DQT")
          var p = pos + 2
          while (p < pos + len) {
            val pq = (bytes(p) & 0xFF) >> 4
            val tq = bytes(p) & 0xF
            req(pq == 0, "16-bit quantization tables not supported (8-bit precision)")
            req(tq < 4, s"bad DQT id $tq")
            req(p + 65 <= pos + len, "truncated DQT entries")
            qtables(tq) = Array.tabulate(64)(k => bytes(p + 1 + k) & 0xFF)
            p += 65
          }
          pos += len
        case 0xDD =>
          val len = u16(pos); req(len == 4, "bad DRI length")
          restartInterval = u16(pos + 2)
          pos += len
        case 0xDA =>
          req(comps != null, "SOS before SOF")
          val len = u16(pos); req(pos + len <= bytes.length, "truncated SOS")
          val ns = bytes(pos + 2) & 0xFF
          req(ns == comps.length,
            s"non-interleaved multi-scan files not supported (scan has $ns of ${comps.length} components)")
          var i = 0
          while (i < ns) {
            val cid = bytes(pos + 3 + 2 * i) & 0xFF
            val c = comps.find(_.id == cid).getOrElse(fail(s"scan references unknown component $cid"))
            c.dcTbl = (bytes(pos + 4 + 2 * i) & 0xFF) >> 4
            c.acTbl = bytes(pos + 4 + 2 * i) & 0xF
            i += 1
          }
          val ss = bytes(pos + 3 + 2 * ns) & 0xFF
          val se = bytes(pos + 4 + 2 * ns) & 0xFF
          req(ss == 0 && se == 63, "spectral selection outside baseline")
          img = decodeScan(bytes, pos + len, comps, width, height,
            qtables, dcTables, acTables, restartInterval)
        case 0x01 => () // TEM — standalone, no segment
        case r if r >= 0xD0 && r <= 0xD7 => fail("restart marker outside entropy stream")
        case _ => // APPn, COM, and other skippable segments
          val len = u16(pos); req(len >= 2 && pos + len <= bytes.length, "truncated segment")
          pos += len
      }
    }
    img
  }

  private def decodeScan(bytes: Array[Byte], start: Int, comps: Array[Component],
                         width: Int, height: Int, qtables: Array[Array[Int]],
                         dcTables: Array[HuffTable], acTables: Array[HuffTable],
                         restartInterval: Int): DecodedImage = {
    val hMax = comps.map(_.h).max
    val vMax = comps.map(_.v).max
    val mcusX = (width + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (height + 8 * vMax - 1) / (8 * vMax)
    // per-component plane, MCU-padded; cropped only at the stats pass
    val planeW = comps.map(c => mcusX * 8 * c.h)
    val planeH = comps.map(c => mcusY * 8 * c.v)
    val planes = comps.indices.map(i => new Array[Byte](planeW(i) * planeH(i))).toArray
    comps.foreach { c =>
      req(qtables(c.tq) != null, s"component ${c.id} references missing quant table ${c.tq}")
      req(dcTables(c.dcTbl) != null, s"component ${c.id} references missing DC table ${c.dcTbl}")
      req(acTables(c.acTbl) != null, s"component ${c.id} references missing AC table ${c.acTbl}")
    }
    val br = new BitReader(bytes, start)
    val pred = new Array[Int](comps.length)
    val coef = new Array[Int](64)
    val flat = new Array[Int](64)
    var mcu = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          br.restart(((mcu / restartInterval) - 1) % 8)
          java.util.Arrays.fill(pred, 0)
        }
        var ci = 0
        while (ci < comps.length) {
          val c = comps(ci)
          val q = qtables(c.tq)
          var bv = 0
          while (bv < c.v) {
            var bh = 0
            while (bh < c.h) {
              java.util.Arrays.fill(coef, 0)
              val t = br.decodeHuff(dcTables(c.dcTbl))
              req(t <= 11, s"bad DC category $t")
              pred(ci) += extend(br.receive(t), t)
              coef(0) = pred(ci) * q(0)
              var k = 1
              var open = true
              var acNonzero = false
              while (open && k < 64) {
                val rs = br.decodeHuff(acTables(c.acTbl))
                val r = rs >> 4
                val s = rs & 0xF
                if (s == 0) {
                  if (r == 15) k += 16 // ZRL
                  else { req(r == 0, s"bad AC symbol $rs"); open = false } // EOB
                } else {
                  k += r
                  req(k < 64, "AC run past block end")
                  coef(Zigzag(k)) = extend(br.receive(s), s) * q(k)
                  acNonzero = true
                  k += 1
                }
              }
              // DC-only fast path (flat blocks — common in real files, the
              // whole corpus in the oracle construction): replicate the
              // separable IDCT's exact double operations in the same order
              // (B·(coef0·B)) so the skipped transform is BIT-identical,
              // including the negative-half-rounding edge a naive coef0/8
              // would miss
              val px = if (!acNonzero) {
                val b0 = Basis(0)(0)
                val v0 = math.round(b0 * (coef(0) * b0)).toInt + 128
                val v = if (v0 < 0) 0 else if (v0 > 255) 255 else v0
                java.util.Arrays.fill(flat, v)
                flat
              } else idctBlock(coef)
              val baseX = (mx * c.h + bh) * 8
              val baseY = (my * c.v + bv) * 8
              var yy = 0
              while (yy < 8) {
                var xx = 0
                while (xx < 8) {
                  planes(ci)((baseY + yy) * planeW(ci) + baseX + xx) = px(yy * 8 + xx).toByte
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
        mcu += 1
        mx += 1
      }
      my += 1
    }
    br.alignToMarker()
    new DecodedImage(width, height, planes, planeW,
      comps.map(_.h), comps.map(_.v))
  }

  // ----------------------------------------------------------- encoders ---

  /** Canonical encode tables: DC symbols 0..11 at 4 bits, AC symbols
    * 0..255 at 9 bits — generated the same way a decoder reconstructs them
    * from DHT, so the file is self-describing and no Annex K constants are
    * baked anywhere.
    */
  private val EncDcBits: Array[Int] = { val b = new Array[Int](17); b(4) = 12; b }
  private val EncDcVals: Array[Byte] = Array.tabulate(12)(_.toByte)
  // 255 symbols at 9 bits + 1 at 10 — a DHT count field is ONE byte, so a
  // single length cannot hold all 256 AC symbols (256 wraps to 0)
  private val EncAcBits: Array[Int] = {
    val b = new Array[Int](17); b(9) = 255; b(10) = 1; b
  }
  private val EncAcVals: Array[Byte] = Array.tabulate(256)(_.toByte)

  private def canonicalCodes(bits: Array[Int], vals: Array[Byte]): Map[Int, (Int, Int)] = {
    var code = 0; var k = 0
    val out = scala.collection.mutable.Map.empty[Int, (Int, Int)]
    var l = 1
    while (l <= 16) {
      var i = 0
      while (i < bits(l)) { out(vals(k) & 0xFF) = (code, l); code += 1; k += 1; i += 1 }
      code <<= 1
      l += 1
    }
    out.toMap
  }
  private val DcCodes = canonicalCodes(EncDcBits, EncDcVals)
  private val AcCodes = canonicalCodes(EncAcBits, EncAcVals)

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var cur = 0
    private var n = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        cur = (cur << 1) | ((code >> i) & 1)
        n += 1
        if (n == 8) {
          out.write(cur)
          if (cur == 0xFF) out.write(0x00) // byte stuffing
          cur = 0; n = 0
        }
        i -= 1
      }
    }
    def flush(): Unit = if (n > 0) { put(0x7F, 8 - n); () } // 1-fill padding
  }

  private def category(v: Int): Int = {
    var s = 0; var a = math.abs(v)
    while (a != 0) { s += 1; a >>= 1 }
    s
  }

  private def putCoded(bw: BitWriter, codes: Map[Int, (Int, Int)], sym: Int): Unit = {
    val (c, l) = codes(sym)
    bw.put(c, l)
  }

  private def putDc(bw: BitWriter, diff: Int): Unit = {
    val s = category(diff)
    putCoded(bw, DcCodes, s)
    if (s > 0) bw.put(if (diff >= 0) diff else diff + (1 << s) - 1, s)
  }

  private def seg(out: java.io.ByteArrayOutputStream, marker: Int, payload: Array[Byte]): Unit = {
    out.write(0xFF); out.write(marker)
    val len = payload.length + 2
    out.write(len >> 8); out.write(len & 0xFF)
    out.write(payload, 0, payload.length)
  }

  private def headers(out: java.io.ByteArrayOutputStream, width: Int, height: Int,
                      comps: Seq[(Int, Int, Int)]): Unit = { // (id, h, v)
    out.write(0xFF); out.write(0xD8) // SOI
    seg(out, 0xE0, "JFIF".getBytes("US-ASCII") ++
      Array[Byte](0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    headersAfterApp0(out, width, height, comps)
  }

  private def headersAfterApp0(out: java.io.ByteArrayOutputStream, width: Int,
                               height: Int, comps: Seq[(Int, Int, Int)]): Unit = {
    seg(out, 0xDB, (Seq(0) ++ Seq.fill(64)(1)).map(_.toByte).toArray) // all-1s q-table 0
    val sof = Seq(8, height >> 8, height & 0xFF, width >> 8, width & 0xFF, comps.length) ++
      comps.flatMap { case (id, h, v) => Seq(id, (h << 4) | v, 0) }
    seg(out, 0xC0, sof.map(_.toByte).toArray)
    seg(out, 0xC4, (Seq(0x00) ++ EncDcBits.drop(1) ++ EncDcVals.map(_.toInt)).map(_.toByte).toArray)
    seg(out, 0xC4, (Seq(0x10) ++ EncAcBits.drop(1) ++ EncAcVals.map(_.toInt)).map(_.toByte).toArray)
    val sos = Seq(comps.length) ++ comps.flatMap { case (id, _, _) => Seq(id, 0x00) } ++ Seq(0, 63, 0)
    seg(out, 0xDA, sos.map(_.toByte).toArray)
  }

  /** One constant 8×8 block per payload byte, `blocksPerRow` blocks wide,
    * zero-byte padding to fill the grid — grayscale, DC-only, all-1s
    * quantization, so the decode is bit-exact and a SQL oracle can
    * recompute it: width = 8·blocksPerRow, height = 8·ceil(len/bpr),
    * pixel sum = 64·Σ bytes. The JFIF convention for the repo's other
    * synthesized containers, in lossy-format clothing.
    */
  def encodeGrayBlocks(payload: Array[Byte], blocksPerRow: Int,
                       restartInterval: Int = 0): Array[Byte] = {
    require(blocksPerRow > 0, "blocksPerRow must be positive")
    val rows = math.max(1, (payload.length + blocksPerRow - 1) / blocksPerRow)
    val out = new java.io.ByteArrayOutputStream()
    out.write(0xFF); out.write(0xD8) // SOI
    seg(out, 0xE0, "JFIF".getBytes("US-ASCII") ++
      Array[Byte](0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    if (restartInterval > 0)
      seg(out, 0xDD, Array[Byte]((restartInterval >> 8).toByte, restartInterval.toByte))
    headersAfterApp0(out, width = 8 * blocksPerRow, height = 8 * rows,
      comps = Seq((1, 1, 1)))
    var bw = new BitWriter(out)
    var pred = 0
    var i = 0
    while (i < rows * blocksPerRow) {
      if (restartInterval > 0 && i > 0 && i % restartInterval == 0) {
        bw.flush()
        out.write(0xFF); out.write(0xD0 + ((i / restartInterval - 1) % 8))
        bw = new BitWriter(out)
        pred = 0
      }
      val v = if (i < payload.length) payload(i) & 0xFF else 0
      val dc = 8 * (v - 128)
      putDc(bw, dc - pred)
      pred = dc
      putCoded(bw, AcCodes, 0x00) // EOB
      i += 1
    }
    bw.flush()
    out.write(0xFF); out.write(0xD9) // EOI
    out.toByteArray
  }

  /** Spec-only: grayscale image from QUANTIZED zigzag coefficient blocks
    * (row-major block order, `blocksPerRow` wide) — pins entropy coding,
    * zigzag, dequant and IDCT against an independent reference without a
    * lossy forward DCT in the loop.
    */
  private[operators] def encodeCoeffBlocksGray(blocks: Seq[Array[Int]],
                                               blocksPerRow: Int): Array[Byte] = {
    require(blocks.nonEmpty && blocks.length % blocksPerRow == 0,
      "blocks must fill the grid exactly")
    require(blocks.forall(_.length == 64), "each block carries 64 zigzag coefficients")
    val out = new java.io.ByteArrayOutputStream()
    headers(out, width = 8 * blocksPerRow, height = 8 * (blocks.length / blocksPerRow),
      comps = Seq((1, 1, 1)))
    val bw = new BitWriter(out)
    var pred = 0
    blocks.foreach { b =>
      putDc(bw, b(0) - pred)
      pred = b(0)
      var k = 1
      var run = 0
      while (k < 64) {
        if (b(k) == 0) run += 1
        else {
          while (run > 15) { putCoded(bw, AcCodes, 0xF0); run -= 16 }
          val s = category(b(k))
          require(s <= 10, s"AC coefficient ${b(k)} out of baseline range")
          putCoded(bw, AcCodes, (run << 4) | s)
          bw.put(if (b(k) >= 0) b(k) else b(k) + (1 << s) - 1, s)
          run = 0
        }
        k += 1
      }
      if (run > 0) putCoded(bw, AcCodes, 0x00) // EOB
    }
    bw.flush()
    out.write(0xFF); out.write(0xD9)
    out.toByteArray
  }

  /** Spec-only: a `width`×`height` solid-color YCbCr image with luma
    * sampling factors `hSub`×`vSub` (1 or 2) — constant planes make the
    * subsampled color path exactly predictable.
    */
  private[operators] def encodeSolidColor(width: Int, height: Int,
                                          y: Int, cb: Int, cr: Int,
                                          hSub: Int, vSub: Int): Array[Byte] = {
    require(width > 0 && height > 0 && hSub >= 1 && hSub <= 2 && vSub >= 1 && vSub <= 2)
    val out = new java.io.ByteArrayOutputStream()
    headers(out, width, height, comps = Seq((1, hSub, vSub), (2, 1, 1), (3, 1, 1)))
    val bw = new BitWriter(out)
    val mcusX = (width + 8 * hSub - 1) / (8 * hSub)
    val mcusY = (height + 8 * vSub - 1) / (8 * vSub)
    val dcs = Array(8 * (y - 128), 8 * (cb - 128), 8 * (cr - 128))
    val pred = new Array[Int](3)
    var m = 0
    while (m < mcusX * mcusY) {
      var ci = 0
      while (ci < 3) {
        val nBlocks = if (ci == 0) hSub * vSub else 1
        var b = 0
        while (b < nBlocks) {
          putDc(bw, dcs(ci) - pred(ci))
          pred(ci) = dcs(ci)
          putCoded(bw, AcCodes, 0x00)
          b += 1
        }
        ci += 1
      }
      m += 1
    }
    bw.flush()
    out.write(0xFF); out.write(0xD9)
    out.toByteArray
  }
}
