package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, QuaternaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.QuaternaryLike
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, IntegerType, LongType}

/** `graft_jpeg_pixels(binary)` → the pixel-stats struct shared with
  * [[PngStats]] (width, height, sum_r/g/b, n_pixels — grayscale feeds
  * all three sums), NULL when the bytes are not a decodable in-scope
  * JPEG. Completes the pixel family for the dominant crawl format: a
  * REAL baseline-DCT decoder from the public spec (ITU T.81), zero
  * dependencies —
  *
  *  - marker walk: SOI, then length-delimited segments (APPn/COM
  *    skipped; DQT/DHT may carry several tables each; DRI sets the
  *    restart cadence; SOF0 fixes geometry) until SOS;
  *  - entropy decode of the scan: canonical Huffman per the spec's
  *    mincode/maxcode/valptr algorithm, DC category + difference
  *    (predictor across blocks, reset at restart markers), AC
  *    run/size with ZRL and EOB, `extend` sign recovery, byte
  *    UN-stuffing (FF 00) inline in the bit reader;
  *  - per block: dezigzag, dequantize, 2-D IDCT (double-precision
  *    separable basis — exact for the DC-only blocks the round-trip
  *    oracle uses, spec-accurate for the rest), +128 level shift,
  *    clamp, and channel sums over only the pixels inside w x h (edge
  *    MCUs crop).
  *
  * Scope: baseline sequential (SOF0, 8-bit), EXTENDED sequential
  * (SOF1, 8- or 12-bit — same Huffman algorithm with a wider level
  * shift/clamp, Pq=1 16-bit quantizer entries, DC categories to 15),
  * progressive (SOF2, 8-bit, ITU T.81 Annex G — spectral selection,
  * successive approximation, EOB runs; see
  * [[JpegPixels.decodeProgressive]]), and LOSSLESS (SOF3, any
  * precision 2..16; see [[JpegPixels.decodeLossless]]) — grayscale
  * AND 3-component YCbCr with 4:4:4 / 4:2:2 / 4:4:0 / 4:2:0
  * subsampling, the shapes that cover real crawl JPEGs (chroma
  * upsampling by sample replication, JFIF conversion matrix);
  * arithmetic coding, hierarchical processes, and exotic sampling
  * return NULL, never throw (fuzzed in ParserFuzzSpec). Baseline memory is O(one MCU) regardless of
  * claimed geometry; progressive inherently needs the full-frame
  * coefficient buffer (every decoder does), capped by
  * [[JpegPixels.MaxPixelsProgressive]] — so a hostile header cannot
  * hurt a 100 TB scan either way. Decode is certified
  * two ways: the DuckDB oracle recomputes exact sums for the
  * per-block-constant fixtures ([[JpegEncode]] grayscale,
  * [[JpegEncodeColor]] YCbCr: quantizer 8 divides the DC 8*(v-128)
  * exactly, so constant blocks round-trip BIT-EXACTLY through real
  * Huffman + IDCT — and a luma block lies inside ONE chroma region,
  * so the RGB conversion is per-block-constant too), and JpegSpec
  * runs differentials against the JDK's own ImageIO decoder on
  * gradient images where every AC path fires. */
case class JpegPixels(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_jpeg_pixels expects a binary column, got ${child.dataType.catalogString}")
  override def dataType: DataType = PngStats.schema
  override def nullable: Boolean = true
  override def prettyName: String = "graft_jpeg_pixels"

  override def nullSafeEval(input: Any): Any =
    JpegPixels.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => s"""
      ${ev.value} = graft.plans.JpegPixels.parse($b);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): JpegPixels =
    copy(child = newChild)
}

object JpegPixels {

  /** Geometry ceiling: headers claiming more pixels are rejected
    * up front (decode memory is O(block) anyway; this bounds TIME). */
  val MaxPixels: Long = 1L << 26

  /** Zigzag position -> natural (row-major) index, T.81 figure A.6. */
  private[plans] val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** IDCT basis: ct(x)(u) = C_u/2 * cos((2x+1) u pi / 16), so
    * s(x,y) = sum_u sum_v ct(x)(u) ct(y)(v) F(u,v). */
  private val Ct: Array[Array[Double]] = Array.tabulate(8, 8) { (x, u) =>
    val cu = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
    cu / 2.0 * math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }

  /** Precomputed per-coefficient basis plane: CtProd(v)(y*8+x) =
    * Ct(x)(v&7) * Ct(y)(v>>3) — the exact double product the
    * coefficient-inner loop used to recompute per pixel (same two
    * operands, same order, so each stored value is bit-identical to
    * the product it replaces). 64x64 doubles = 32 KiB, shared
    * read-only across tasks. */
  private val CtProd: Array[Array[Double]] = Array.tabulate(64) { v =>
    val t = new Array[Double](64)
    var p = 0
    while (p < 64) {
      t(p) = Ct(p & 7)(v & 7) * Ct(p >> 3)(v >> 3)
      p += 1
    }
    t
  }

  // canonical Huffman decode tables per T.81 F.2.2.3
  private final class HuffTable(bits: Array[Int], vals: Array[Byte]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    val values: Array[Byte] = vals
    locally {
      var code = 0; var k = 0; var l = 1
      while (l <= 16) {
        valPtr(l) = k
        minCode(l) = code
        code += bits(l - 1); k += bits(l - 1)
        maxCode(l) = if (bits(l - 1) == 0) -1 else code - 1
        code <<= 1
        l += 1
      }
    }
  }

  /** Bit reader over the entropy-coded segment: un-stuffs FF 00,
    * surfaces markers (FFxx) as end-of-data, byte-aligns at restart
    * boundaries. Throws DecodeErr (caught in parse) on overrun. */
  private object DecodeErr extends RuntimeException { override def fillInStackTrace(): Throwable = this }

  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var cur = 0
    private var nbits = 0
    def readBit(): Int = {
      if (nbits == 0) {
        if (pos >= b.length) throw DecodeErr
        var byte = b(pos) & 0xFF; pos += 1
        if (byte == 0xFF) {
          if (pos >= b.length) throw DecodeErr
          val nxt = b(pos) & 0xFF
          if (nxt == 0x00) pos += 1 // stuffed FF
          else throw DecodeErr // marker inside the scan: truncated image
        }
        cur = byte; nbits = 8
      }
      nbits -= 1
      (cur >> nbits) & 1
    }
    def readBits(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v = (v << 1) | readBit(); i += 1 }
      v
    }
    def align(): Unit = nbits = 0
    def decode(t: HuffTable): Int = {
      var code = readBit()
      var l = 1
      while (code > t.maxCode(l)) {
        if (l >= 16) throw DecodeErr
        code = (code << 1) | readBit()
        l += 1
      }
      t.values(t.valPtr(l) + code - t.minCode(l)) & 0xFF
    }
  }

  private def extend(v: Int, t: Int): Int =
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF
  private def u16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)

  /** JFIF YCbCr -> one RGB channel: LITERALLY floor(x + 0.5) (not
    * Math.round, which special-cases the double just below .5 and
    * would diverge from the DuckDB oracle's floor(expr + 0.5) by one
    * ulp-edge), clamped to [0, maxV] (255 at 8-bit, 4095 at 12). */
  private def rgbClamp(x: Double, maxV: Int): Int = {
    val s = math.floor(x + 0.5).toInt
    if (s < 0) 0 else if (s > maxV) maxV else s
  }

  /** Dequantized natural-order coefficients -> 8x8 spatial block:
    * separable double IDCT, +2^(P-1) level shift, clamp to
    * [0, 2^P - 1], written into the component plane at (ox, oy) with
    * row stride cw. Shared by the baseline/extended streaming path
    * (P = 8 or 12) and the progressive final render (P = 8). */
  private def idctInto(coef: Array[Int], plane: Array[Int], cw: Int,
      ox: Int, oy: Int, half: Int = 128, maxV: Int = 255): Unit = {
    // coefficient-OUTER accumulation (r19): the pixel-outer form ran a
    // 64-iteration loop with a zero test per PIXEL — 4096 branchy
    // iterations per block when typical quantized blocks carry only a
    // handful of nonzero coefficients. Skipping zeros once and adding
    // each nonzero coefficient's basis plane into a 64-double buffer
    // performs the SAME additions in the SAME per-pixel order
    // (ascending v, (Ct*Ct)*cf association via CtProd), so every
    // output sample is bit-identical — pinned by JpegSpec and the
    // mm_jpeg oracles.
    val buf = new Array[Double](64)
    var v = 0
    while (v < 64) {
      val cf = coef(v)
      if (cf != 0) {
        val t = CtProd(v)
        val c = cf.toDouble
        var p = 0
        while (p < 64) { buf(p) += t(p) * c; p += 1 }
      }
      v += 1
    }
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = math.round(buf(y * 8 + x)).toInt + half
        if (s < 0) s = 0 else if (s > maxV) s = maxV
        plane((oy + y) * cw + ox + x) = s
        x += 1
      }
      y += 1
    }
  }

  /** RGB channel sums over (one MCU ∩ the image): nearest-sample
    * chroma upsample + JFIF matrix (3-comp, chroma centered at
    * 2^(P-1)) or straight copy (gray), accumulated into sums(0..2).
    * Shared by both decode paths. */
  private def sumMcuPixels(planes: Array[Array[Int]], nComp: Int,
      hmax: Int, vmax: Int, mx: Int, my: Int, w: Int, h: Int,
      sums: Array[Long], half: Int = 128, maxV: Int = 255): Unit = {
    val lumaW = 8 * hmax
    val mcuH = 8 * vmax
    val mcuW = 8 * hmax
    var py = 0
    while (py < mcuH) {
      val gy = my * mcuH + py
      if (gy < h) {
        var px = 0
        while (px < mcuW) {
          val gx = mx * mcuW + px
          if (gx < w) {
            val yv = planes(0)(py * lumaW + px)
            if (nComp == 1) {
              sums(0) += yv; sums(1) += yv; sums(2) += yv
            } else {
              val cb = planes(1)((py / vmax) * 8 + px / hmax)
              val cr = planes(2)((py / vmax) * 8 + px / hmax)
              sums(0) += rgbClamp(yv + 1.402 * (cr - half), maxV)
              sums(1) += rgbClamp(yv - 0.344136 * (cb - half) - 0.714136 * (cr - half), maxV)
              sums(2) += rgbClamp(yv + 1.772 * (cb - half), maxV)
            }
          }
          px += 1
        }
      }
      py += 1
    }
  }

  /** DQT segment body [j0, end): one or more tables in zigzag order,
    * 8-bit entries (Pq=0) or 16-bit (Pq=1 — the 12-bit-precision
    * form). False on any malformed structure. Shared by the pre-scan
    * header walk and the progressive between-scan walk. */
  private def parseDqt(b: Array[Byte], j0: Int, end: Int,
      qts: Array[Array[Int]]): Boolean = {
    var j = j0
    while (j < end) {
      val pq = u8(b, j) >> 4; val tq = u8(b, j) & 0x0F
      if (pq > 1 || tq > 3) return false
      val eb = pq + 1 // entry bytes
      if (j + 1 + 64 * eb > end) return false
      val q = new Array[Int](64)
      var z = 0
      while (z < 64) {
        q(Zigzag(z)) = if (pq == 0) u8(b, j + 1 + z) else u16(b, j + 1 + 2 * z)
        z += 1
      }
      qts(tq) = q
      j += 1 + 64 * eb
    }
    j == end
  }

  /** DHT segment body [j0, end): one or more Huffman tables. False on
    * any malformed structure. */
  private def parseDht(b: Array[Byte], j0: Int, end: Int,
      dcT: Array[HuffTable], acT: Array[HuffTable]): Boolean = {
    var j = j0
    while (j < end) {
      if (j + 17 > end) return false
      val tc = u8(b, j) >> 4; val th = u8(b, j) & 0x0F
      if (tc > 1 || th > 3) return false
      val bits = Array.tabulate(16)(k => u8(b, j + 1 + k))
      val n = bits.sum
      if (n > 256 || j + 17 + n > end) return false
      val vals = new Array[Byte](n)
      System.arraycopy(b, j + 17, vals, 0, n)
      val t = new HuffTable(bits, vals)
      if (tc == 0) dcT(th) = t else acT(th) = t
      j += 17 + n
    }
    j == end
  }

  /** Null iff the bytes are not a decodable in-scope JPEG. Static, no
    * captures; total over hostile bytes. SOF2 frames hand off to
    * [[decodeProgressive]] at the first SOS.
    *
    * Baseline scope: sequential (SOF0), 8-bit, grayscale OR
    * 3-component YCbCr with luma sampling factors in {1,2}x{1,2} and
    * 1x1 chroma — 4:4:4, 4:2:2, 4:4:0 and 4:2:0, the shapes that
    * cover real crawl JPEGs. Chroma upsampling is sample replication
    * (cx = px div hmax); conversion is the JFIF matrix with
    * floor(x+0.5) rounding, so the color fixture's constant blocks
    * remain exactly oracle-recomputable. Memory is O(one MCU):
    * <= (16x16 + 8x8 + 8x8) samples, whatever the claimed geometry. */
  def parse(b: Array[Byte]): InternalRow = try {
    if (b == null || b.length < 4) return null
    if (u8(b, 0) != 0xFF || u8(b, 1) != 0xD8) return null // SOI
    var i = 2
    var w = 0; var h = 0
    var nComp = 0
    var progressive = false
    var lossless = false
    var losslessPrec = 8
    var dctPrec = 8
    val compId = new Array[Int](3)
    val compQt = new Array[Int](3)
    val compH = new Array[Int](3)
    val compV = new Array[Int](3)
    val qts = new Array[Array[Int]](4)
    val dcT = new Array[HuffTable](4)
    val acT = new Array[HuffTable](4)
    var restartInterval = 0
    val dcSel = new Array[Int](3)
    val acSel = new Array[Int](3)
    var scanStart = -1
    while (scanStart < 0) {
      // marker prefix (fill FF bytes are legal padding)
      if (i + 1 >= b.length) return null
      if (u8(b, i) != 0xFF) return null
      var m = u8(b, i + 1)
      while (m == 0xFF) { i += 1; if (i + 1 >= b.length) return null; m = u8(b, i + 1) }
      i += 2
      if (m == 0xD9) return null // EOI before any scan
      if (i + 2 > b.length) return null
      val len = u16(b, i)
      if (len < 2 || i + len > b.length) return null
      val end = i + len
      m match {
        case 0xC0 | 0xC1 | 0xC2 =>
          // SOF0 baseline (8-bit) / SOF1 extended sequential (8- or
          // 12-bit — same Huffman algorithm, wider samples) / SOF2
          // progressive (8-bit)
          progressive = m == 0xC2
          dctPrec = u8(b, i + 2)
          if (len < 11) return null
          if (dctPrec != 8 && !(m == 0xC1 && dctPrec == 12)) return null
          h = u16(b, i + 3); w = u16(b, i + 5)
          if (w <= 0 || h <= 0 || w.toLong * h > MaxPixels) return null
          nComp = u8(b, i + 7)
          if (nComp != 1 && nComp != 3) return null
          if (len < 8 + 3 * nComp) return null
          var c = 0
          while (c < nComp) {
            compId(c) = u8(b, i + 8 + 3 * c)
            val samp = u8(b, i + 9 + 3 * c)
            compH(c) = samp >> 4; compV(c) = samp & 0x0F
            compQt(c) = u8(b, i + 10 + 3 * c)
            if (compQt(c) > 3) return null
            c += 1
          }
          if (nComp == 1) {
            if (compH(0) != 1 || compV(0) != 1) return null // no subsampling
          } else {
            // luma in {1,2}x{1,2}; chroma strictly 1x1 — 4:4:4 / 4:2:2 /
            // 4:4:0 / 4:2:0, the crawl formats; exotic factors decode NULL
            if (compH(0) < 1 || compH(0) > 2 || compV(0) < 1 || compV(0) > 2) return null
            if (compH(1) != 1 || compV(1) != 1 || compH(2) != 1 || compV(2) != 1) return null
          }
        case 0xC3 => // SOF3 lossless (T.81 Annex H, process 14)
          lossless = true
          if (len < 11) return null
          // lossless admits ANY precision 2..16 (T.81 B.2.2) — the
          // reconstruction is modulo 2^16 regardless, so the decode is
          // precision-parametric; 12-bit is the medical/scan shape
          losslessPrec = u8(b, i + 2)
          if (losslessPrec < 2 || losslessPrec > 16) return null
          h = u16(b, i + 3); w = u16(b, i + 5)
          if (w <= 0 || h <= 0 || w.toLong * h > MaxPixels) return null
          nComp = u8(b, i + 7)
          if (nComp != 1 && nComp != 3) return null
          if (len < 8 + 3 * nComp) return null
          var c = 0
          while (c < nComp) {
            compId(c) = u8(b, i + 8 + 3 * c)
            // subsampled lossless is legal but vanishingly rare — out
            // of the envelope, NULL not wrong-valued
            if (u8(b, i + 9 + 3 * c) != 0x11) return null
            c += 1
          }
        case 0xC5 | 0xC6 | 0xC7 | 0xC9 | 0xCA | 0xCB |
             0xCD | 0xCE | 0xCF =>
          return null // arithmetic/hierarchical: out of scope
        case 0xDB => // DQT: one or more tables
          if (!parseDqt(b, i + 2, end, qts)) return null
        case 0xC4 => // DHT: one or more tables
          if (!parseDht(b, i + 2, end, dcT, acT)) return null
        case 0xDD => // DRI
          if (len != 4) return null
          restartInterval = u16(b, i + 2)
        case 0xDA => // SOS
          if (nComp == 0) return null // SOS before SOF
          if (lossless)
            return decodeLossless(b, i, w, h, nComp, compId, dcT,
              restartInterval, losslessPrec)
          if (progressive)
            // the whole multi-scan protocol (spectral selection,
            // successive approximation, per-scan tables) lives in
            // decodeProgressive; `i` points at this SOS's length field
            return decodeProgressive(b, i, w, h, nComp, compId, compQt,
              compH, compV, qts, dcT, acT, restartInterval)
          if (len < 6 + 2 * nComp) return null
          if (u8(b, i + 2) != nComp) return null // full interleave only
          var s = 0
          while (s < nComp) {
            val cs = u8(b, i + 3 + 2 * s)
            // match scan order to frame components by id
            var c = 0
            var found = -1
            while (c < nComp) { if (compId(c) == cs) found = c; c += 1 }
            if (found != s) return null // reordered scans: out of scope
            dcSel(s) = u8(b, i + 4 + 2 * s) >> 4
            acSel(s) = u8(b, i + 4 + 2 * s) & 0x0F
            if (dcSel(s) > 3 || acSel(s) > 3) return null
            s += 1
          }
          val p = i + 3 + 2 * nComp
          // baseline spectral selection/approx must be 0..63, 0, 0
          if (u8(b, p) != 0 || u8(b, p + 1) != 63 || u8(b, p + 2) != 0) return null
          scanStart = end
        case _ => () // APPn, COM, others: skip by length
      }
      i = end
    }
    if (w == 0) return null
    var c = 0
    while (c < nComp) {
      if (qts(compQt(c)) == null || dcT(dcSel(c)) == null || acT(acSel(c)) == null)
        return null
      c += 1
    }
    val hmax = compH(0); val vmax = compV(0) // chroma is 1x1, luma is max
    val mcusX = (w + 8 * hmax - 1) / (8 * hmax)
    val mcusY = (h + 8 * vmax - 1) / (8 * vmax)
    val r = new BitReader(b, scanStart)
    val coef = new Array[Int](64)
    // one plane per component, MCU-sized: O(MCU) memory always
    val planes = Array.tabulate(nComp)(c => new Array[Int](64 * compH(c) * compV(c)))
    val preds = new Array[Int](3)
    val sums = new Array[Long](3)
    var mcu = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          // byte-align, skip any stuffed FF 00 the 1-bit padding left
          // (an all-ones pad byte is a legal 0xFF and arrives stuffed),
          // expect RSTn (n cycles 0..7), reset ALL predictors
          r.align()
          var p = r.pos
          while (p + 1 < b.length && u8(b, p) == 0xFF && u8(b, p + 1) == 0x00)
            p += 2
          if (p + 1 >= b.length || u8(b, p) != 0xFF) return null
          val n = u8(b, p + 1)
          if (n != 0xD0 + ((mcu / restartInterval - 1) & 7)) return null
          r.pos = p + 2
          java.util.Arrays.fill(preds, 0)
        }
        // decode this MCU's blocks, interleaved per T.81: for each
        // component, its h x v blocks in raster order within the MCU
        c = 0
        while (c < nComp) {
          val qt = qts(compQt(c))
          val dc = dcT(dcSel(c)); val ac = acT(acSel(c))
          val cw = 8 * compH(c) // plane row width in samples
          var bv = 0
          while (bv < compV(c)) {
            var bh = 0
            while (bh < compH(c)) {
              java.util.Arrays.fill(coef, 0)
              val t = r.decode(dc)
              // DC category ceiling: 11 at 8-bit, 15 at 12 (T.81 F.1.2.1.1)
              if (t > (if (dctPrec > 8) 15 else 11)) return null
              preds(c) += extend(r.readBits(t), t)
              coef(0) = preds(c) * qt(0)
              var k = 1
              var eob = false
              while (k < 64 && !eob) {
                val rs = r.decode(ac)
                val run = rs >> 4; val size = rs & 0x0F
                if (size == 0) {
                  if (run == 15) k += 16 // ZRL
                  else eob = true // EOB
                } else {
                  k += run
                  if (k > 63) return null
                  val nat = Zigzag(k)
                  coef(nat) = extend(r.readBits(size), size) * qt(nat)
                  k += 1
                }
              }
              // IDCT, level shift, clamp into the component plane
              idctInto(coef, planes(c), cw, bh * 8, bv * 8,
                1 << (dctPrec - 1), (1 << dctPrec) - 1)
              bh += 1
            }
            bv += 1
          }
          c += 1
        }
        // pixel pass over this MCU ∩ image
        sumMcuPixels(planes, nComp, hmax, vmax, mx, my, w, h, sums,
          1 << (dctPrec - 1), (1 << dctPrec) - 1)
        mcu += 1
        mx += 1
      }
      my += 1
    }
    new GenericInternalRow(Array[Any](w, h, sums(0), sums(1), sums(2), w.toLong * h))
  } catch { case scala.util.control.NonFatal(_) => null }

  /** ITU T.81 Annex H LOSSLESS decode (process 14), entered by
    * [[parse]] at the SOS of an SOF3 frame. Samples are spatial-domain
    * predictions + Huffman-coded differences — no DCT, no quantizer:
    *
    *  - each sample's difference is a DC-style (SSSS category, extra
    *    bits) pair from the component's DC-class Huffman table;
    *  - prediction (H.1.2.1): first sample 2^(P-1-Pt); rest of the
    *    first line uses Ra; first column uses Rb; everywhere else the
    *    scan header's predictor selector Ss ∈ 1..7 (Ra, Rb, Rc,
    *    Ra+Rb−Rc, Ra+((Rb−Rc)>>1), Rb+((Ra−Rc)>>1), (Ra+Rb)>>1);
    *  - reconstruction is modulo 2^16; output = Rx << Pt.
    *
    * Envelope: ANY precision 2..16 (the modulo-2^16 reconstruction is
    * precision-parametric — 12-bit covers the medical/scan shape),
    * 1 or 3 components at 1x1 (enforced at SOF3), full interleave, no
    * restart markers — anything else NULL. A 3-component lossless
    * frame carries components in their SOURCE space (no YCbCr
    * transform is defined for lossless), so they sum directly as
    * R/G/B; grayscale replicates. Memory is two rows per component;
    * work is O(pixels). */
  private def decodeLossless(b: Array[Byte], sosAt: Int, w: Int, h: Int,
      nComp: Int, compId: Array[Int], dcT: Array[HuffTable],
      restartInterval: Int, prec: Int): InternalRow = try {
    if (restartInterval != 0) return null // rare in lossless; out of envelope
    val len = u16(b, sosAt)
    if (len < 6 + 2 * nComp || sosAt + len > b.length) return null
    if (u8(b, sosAt + 2) != nComp) return null // full interleave only
    val tables = new Array[HuffTable](nComp)
    var s = 0
    while (s < nComp) {
      val cs = u8(b, sosAt + 3 + 2 * s)
      val tsel = u8(b, sosAt + 4 + 2 * s) >> 4 // DC-class selector
      var c = 0; var found = -1
      while (c < nComp) { if (compId(c) == cs) found = c; c += 1 }
      if (found < 0 || tsel > 3 || dcT(tsel) == null) return null
      tables(found) = dcT(tsel)
      s += 1
    }
    if (tables.exists(_ == null)) return null
    val pred = u8(b, sosAt + 3 + 2 * nComp) // Ss = predictor selector
    if (pred < 1 || pred > 7) return null
    val pt = u8(b, sosAt + 5 + 2 * nComp) & 0x0F // Al = point transform
    if (pt >= prec) return null // shifting the whole precision away leaves no signal
    val defaultPred = 1 << (prec - 1 - pt) // 2^(P-1-Pt)
    val r = new BitReader(b, sosAt + len)
    val prevRow = Array.fill(nComp)(new Array[Int](w))
    val curRow = Array.fill(nComp)(new Array[Int](w))
    val sums = new Array[Long](3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var c = 0
        while (c < nComp) {
          val ssss = r.decode(tables(c))
          if (ssss > 16) return null // hostile DHT symbol: no such category
          val diff =
            if (ssss == 0) 0
            else if (ssss == 16) 32768 // the ≡ −32768 (mod 2^16) symbol; no bits
            else extend(r.readBits(ssss), ssss)
          val px =
            if (y == 0 && x == 0) defaultPred
            else if (y == 0) curRow(c)(x - 1) // rest of first line: Ra
            else if (x == 0) prevRow(c)(0) // first column: Rb
            else {
              val ra = curRow(c)(x - 1)
              val rb = prevRow(c)(x)
              val rc = prevRow(c)(x - 1)
              pred match {
                case 1 => ra
                case 2 => rb
                case 3 => rc
                case 4 => ra + rb - rc
                case 5 => ra + ((rb - rc) >> 1)
                case 6 => rb + ((ra - rc) >> 1)
                case 7 => (ra + rb) >> 1
              }
            }
          val rx = (px + diff) & 0xFFFF // modulo-2^16 reconstruction
          curRow(c)(x) = rx
          val out = (rx << pt) & 0xFFFF
          if (nComp == 1) { sums(0) += out; sums(1) += out; sums(2) += out }
          else sums(c) += out
          c += 1
        }
        x += 1
      }
      var c = 0
      while (c < nComp) { // roll rows without reallocating
        val t = prevRow(c); prevRow(c) = curRow(c); curRow(c) = t
        c += 1
      }
      y += 1
    }
    new GenericInternalRow(Array[Any](w, h, sums(0), sums(1), sums(2), w.toLong * h))
  } catch { case scala.util.control.NonFatal(_) => null }

  /** Progressive pixel ceiling. Unlike baseline (streamed, O(one MCU)),
    * progressive decode REQUIRES full-frame coefficient storage — every
    * scan refines coefficients anywhere in the image, so every real
    * decoder (libjpeg included) holds them all until the last scan.
    * 2^22 pixels caps the hostile-header exposure at ~48 MB/row
    * (4 B/coefficient, worst case 4:4:4 color). */
  val MaxPixelsProgressive: Long = 1L << 22

  /** ITU T.81 Annex G progressive decode, entered by [[parse]] at the
    * first SOS of an SOF2 frame (`firstSos` = offset of that SOS's
    * length field; geometry/tables parsed so far passed through):
    *
    *  - DC scans (Ss=0): interleaved (Ns>1: MCU order over the PADDED
    *    per-component block grid) or single-component (non-interleaved
    *    ceil-grid); first pass (Ah=0) Huffman-codes diffs of DC>>Al
    *    (predictors like baseline), refinement passes (Ah=Al+1) append
    *    exactly one bit: coef |= 1<<Al — correct for negatives because
    *    the first pass stored the arithmetic-shifted value;
    *  - AC scans (Ss>=1): single-component ONLY per the spec, spectral
    *    band Ss..Se; first pass codes values<<Al with EOBn run
    *    batching (run length 2^r + r extra bits, spanning blocks);
    *    refinement passes emit one correction bit per nonzero-history
    *    coefficient crossed and insert new ±1<<Al coefficients — the
    *    G.1.2.3 algorithm (independently re-derived; same decision
    *    structure every conformant decoder must implement);
    *  - DHT/DQT/DRI may be redefined between scans; RSTn cycles from 0
    *    within each scan and resets predictors AND the pending EOB run;
    *  - the scan loop ends at EOI, then ONE dequantize+IDCT render
    *    pass in MCU order reuses the baseline's idctInto/sumMcuPixels.
    *
    * Totality: every bit/Huffman read throws DecodeErr on overrun
    * (caught by parse -> NULL); marker offsets advance strictly, so
    * hostile bytes terminate. Memory is the coefficient buffer, capped
    * by [[MaxPixelsProgressive]]. */
  private def decodeProgressive(b: Array[Byte], firstSos: Int,
      w: Int, h: Int, nComp: Int,
      compId: Array[Int], compQt: Array[Int],
      compH: Array[Int], compV: Array[Int],
      qts: Array[Array[Int]], dcT: Array[HuffTable], acT: Array[HuffTable],
      restartInterval0: Int): InternalRow = {
    // match baseline triage: a zero-dim frame is NULL, not a (0,h,...) row
    if (w == 0 || h == 0) return null
    if (w.toLong * h > MaxPixelsProgressive) return null
    // scan budget (libjpeg-style): a hostile stream can pack scans that
    // consume ~0 entropy bits yet each cost a full block-grid walk —
    // without a cap that's O(input_bytes * image_blocks) CPU
    val maxScans = 64 * nComp
    var nScans = 0
    var restartInterval = restartInterval0
    val hmax = compH(0); val vmax = compV(0) // scope: chroma 1x1 (SOF-validated)
    val mcusX = (w + 8 * hmax - 1) / (8 * hmax)
    val mcusY = (h + 8 * vmax - 1) / (8 * vmax)
    // padded grid: interleaved scans code the padding blocks too
    val padW = Array.tabulate(nComp)(c => mcusX * compH(c))
    val padH = Array.tabulate(nComp)(c => mcusY * compV(c))
    // non-interleaved grid: ceil(ceil(w*Hc/Hmax)/8) (T.81 A.1.1/A.2.2)
    val niW = Array.tabulate(nComp)(c => ((w * compH(c) + hmax - 1) / hmax + 7) / 8)
    val niH = Array.tabulate(nComp)(c => ((h * compV(c) + vmax - 1) / vmax + 7) / 8)
    val coefs = Array.tabulate(nComp)(c => new Array[Int](padW(c) * padH(c) * 64))
    val preds = new Array[Int](3)

    var i = firstSos
    var seenScan = false
    var atSos = true // parse dispatched here AT the first SOS
    var done = false
    while (!done) {
      if (atSos) {
        // ---- one scan: header then entropy-coded data ----
        nScans += 1
        if (nScans > maxScans) return null
        if (i + 2 > b.length) return null
        val len = u16(b, i)
        if (len < 2 || i + len > b.length) return null
        val ns = u8(b, i + 2)
        if (ns < 1 || ns > nComp || len != 6 + 2 * ns) return null
        val scanComp = new Array[Int](ns)
        val dcSel = new Array[Int](ns)
        val acSel = new Array[Int](ns)
        var prev = -1
        var sIx = 0
        while (sIx < ns) {
          val cs = u8(b, i + 3 + 2 * sIx)
          var found = -1
          var c = 0
          while (c < nComp) { if (compId(c) == cs) found = c; c += 1 }
          // subset of frame components, in frame order, no repeats
          if (found < 0 || found <= prev) return null
          prev = found
          scanComp(sIx) = found
          dcSel(sIx) = u8(b, i + 4 + 2 * sIx) >> 4
          acSel(sIx) = u8(b, i + 4 + 2 * sIx) & 0x0F
          if (dcSel(sIx) > 3 || acSel(sIx) > 3) return null
          sIx += 1
        }
        val p0 = i + 3 + 2 * ns
        val ss = u8(b, p0); val se = u8(b, p0 + 1)
        val ah = u8(b, p0 + 2) >> 4; val al = u8(b, p0 + 2) & 0x0F
        val isDc = ss == 0
        if (isDc) { if (se != 0 || al > 13) return null }
        else if (ns != 1 || se < ss || se > 63 || al > 13) return null
        if (ah != 0 && ah != al + 1) return null // first pass or 1-bit step

        val r = new BitReader(b, i + len)
        var eobrun = 0
        java.util.Arrays.fill(preds, 0)
        var unit = 0 // restart cadence counts MCUs (interleaved) / blocks

        def restartIfDue(): Unit =
          if (restartInterval > 0 && unit > 0 && unit % restartInterval == 0) {
            r.align()
            var p = r.pos
            while (p + 1 < b.length && u8(b, p) == 0xFF && u8(b, p + 1) == 0x00)
              p += 2
            if (p + 1 >= b.length || u8(b, p) != 0xFF) throw DecodeErr
            if (u8(b, p + 1) != 0xD0 + ((unit / restartInterval - 1) & 7))
              throw DecodeErr
            r.pos = p + 2
            java.util.Arrays.fill(preds, 0)
            eobrun = 0
          }

        def dcFirst(c: Int, dcTab: HuffTable, off: Int): Unit = {
          val t = r.decode(dcTab)
          if (t > 11) throw DecodeErr
          preds(c) += extend(r.readBits(t), t)
          coefs(c)(off) = preds(c) << al
        }
        def dcRefine(c: Int, off: Int): Unit =
          if (r.readBit() == 1) coefs(c)(off) |= (1 << al)

        def acFirst(cf: Array[Int], off: Int, acTab: HuffTable): Unit = {
          if (eobrun > 0) { eobrun -= 1; return }
          var k = ss
          var eob = false
          while (k <= se && !eob) {
            val rs = r.decode(acTab)
            val run = rs >> 4; val size = rs & 0x0F
            if (size == 0) {
              if (run == 15) k += 16 // ZRL
              else {
                eobrun = (1 << run) - 1 // this block ends the run's first
                if (run > 0) eobrun += r.readBits(run)
                eob = true
              }
            } else {
              k += run
              if (k > se) throw DecodeErr
              cf(off + Zigzag(k)) = extend(r.readBits(size), size) << al
              k += 1
            }
          }
        }

        def acRefine(cf: Array[Int], off: Int, acTab: HuffTable): Unit = {
          val pl = 1 << al
          val ml = -1 << al
          var k = ss
          if (eobrun == 0) {
            var brk = false
            while (k <= se && !brk) {
              val rs = r.decode(acTab)
              var run = rs >> 4
              val size = rs & 0x0F
              var sval = 0
              if (size == 0) {
                if (run != 15) { // EOBn: run starts AT this block
                  eobrun = 1 << run
                  if (run > 0) eobrun += r.readBits(run)
                  brk = true
                }
                // run == 15 (ZRL): skip 16 zero-history coefficients
              } else {
                if (size != 1) throw DecodeErr // refinement codes only ±1
                sval = if (r.readBit() == 1) pl else ml
              }
              if (!brk) {
                // advance over `run` zero-history positions, emitting a
                // correction bit at every nonzero-history one crossed
                var placed = false
                while (k <= se && !placed) {
                  val z = off + Zigzag(k)
                  if (cf(z) != 0) {
                    if (r.readBit() == 1 && (cf(z) & pl) == 0)
                      cf(z) += (if (cf(z) >= 0) pl else ml)
                  } else if (run == 0) {
                    if (sval != 0) cf(z) = sval
                    placed = true
                  } else run -= 1
                  k += 1
                }
              }
            }
          }
          if (eobrun > 0) {
            // the run covers this block's remaining band: correction
            // bits for nonzero-history coefficients only
            while (k <= se) {
              val z = off + Zigzag(k)
              if (cf(z) != 0 && r.readBit() == 1 && (cf(z) & pl) == 0)
                cf(z) += (if (cf(z) >= 0) pl else ml)
              k += 1
            }
            eobrun -= 1
          }
        }

        if (isDc && ns > 1) {
          // interleaved DC scan over the padded grid, MCU order
          val dcTabs = Array.tabulate(ns)(s2 => dcT(dcSel(s2)))
          if (ah == 0 && dcTabs.exists(_ == null)) return null
          var my = 0
          while (my < mcusY) {
            var mx = 0
            while (mx < mcusX) {
              restartIfDue()
              var s2 = 0
              while (s2 < ns) {
                val c = scanComp(s2)
                var bv = 0
                while (bv < compV(c)) {
                  var bh2 = 0
                  while (bh2 < compH(c)) {
                    val off = ((my * compV(c) + bv) * padW(c) +
                      mx * compH(c) + bh2) * 64
                    if (ah == 0) dcFirst(c, dcTabs(s2), off)
                    else dcRefine(c, off)
                    bh2 += 1
                  }
                  bv += 1
                }
                s2 += 1
              }
              unit += 1
              mx += 1
            }
            my += 1
          }
        } else {
          // single-component scan (DC or AC): non-interleaved grid
          val c = scanComp(0)
          val dcTab = if (isDc) dcT(dcSel(0)) else null
          val acTab = if (!isDc) acT(acSel(0)) else null
          if (isDc && ah == 0 && dcTab == null) return null
          if (!isDc && acTab == null) return null
          val cf = coefs(c)
          var by = 0
          while (by < niH(c)) {
            var bx = 0
            while (bx < niW(c)) {
              restartIfDue()
              val off = (by * padW(c) + bx) * 64
              if (isDc) { if (ah == 0) dcFirst(c, dcTab, off) else dcRefine(c, off) }
              else { if (ah == 0) acFirst(cf, off, acTab) else acRefine(cf, off, acTab) }
              unit += 1
              bx += 1
            }
            by += 1
          }
        }
        seenScan = true
        // seek the next marker past stuffed FF00s and fill bytes
        r.align()
        var p = r.pos
        while (p + 1 < b.length && !(u8(b, p) == 0xFF && u8(b, p + 1) != 0x00))
          p += 1
        if (p + 1 >= b.length) return null
        i = p
        atSos = false
      } else {
        // ---- marker walk between scans ----
        if (i + 1 >= b.length || u8(b, i) != 0xFF) return null
        var m = u8(b, i + 1)
        while (m == 0xFF) { i += 1; if (i + 1 >= b.length) return null; m = u8(b, i + 1) }
        i += 2
        if (m == 0xD9) done = true // EOI: render
        else {
          if (i + 2 > b.length) return null
          val len = u16(b, i)
          if (len < 2 || i + len > b.length) return null
          val end = i + len
          m match {
            case 0xDA => atSos = true // decoded next iteration (i at length)
            case 0xC4 => if (!parseDht(b, i + 2, end, dcT, acT)) return null
            case 0xDB => if (!parseDqt(b, i + 2, end, qts)) return null
            case 0xDD =>
              if (len != 4) return null
              restartInterval = u16(b, i + 2)
            case 0xD8 | 0xC0 | 0xC2 => return null // nested SOI/SOF
            case _ => () // APPn / COM / DNL: skip by length
          }
          if (m != 0xDA) i = end
        }
      }
    }
    if (!seenScan) return null
    var c = 0
    while (c < nComp) {
      if (qts(compQt(c)) == null) return null
      c += 1
    }
    // final render: dequantize + IDCT in MCU order, O(MCU) extra memory
    val planes = Array.tabulate(nComp)(c2 => new Array[Int](64 * compH(c2) * compV(c2)))
    val sums = new Array[Long](3)
    val dq = new Array[Int](64)
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        var c2 = 0
        while (c2 < nComp) {
          val qt = qts(compQt(c2))
          val cw = 8 * compH(c2)
          val cf = coefs(c2)
          var bv = 0
          while (bv < compV(c2)) {
            var bh2 = 0
            while (bh2 < compH(c2)) {
              val off = ((my * compV(c2) + bv) * padW(c2) +
                mx * compH(c2) + bh2) * 64
              var v = 0
              while (v < 64) { dq(v) = cf(off + v) * qt(v); v += 1 }
              idctInto(dq, planes(c2), cw, bh2 * 8, bv * 8)
              bh2 += 1
            }
            bv += 1
          }
          c2 += 1
        }
        sumMcuPixels(planes, nComp, hmax, vmax, mx, my, w, h, sums)
        mx += 1
      }
      my += 1
    }
    new GenericInternalRow(Array[Any](w, h, sums(0), sums(1), sums(2), w.toLong * h))
  }
}

/** `graft_jpeg_encode(width, height, seed, restartRows)` → binary: a
  * fully valid baseline grayscale JPEG (real forward DCT, flat
  * quantizer 8, Annex-K luminance Huffman tables, byte stuffing,
  * optional one-restart-per-block-row DRI/RSTn cadence) whose pixel
  * (x, y) carries the PER-8x8-BLOCK-CONSTANT value
  *
  *   v = (seed + 5*(x div 8) + 11*(y div 8)) mod 256
  *
  * Constant blocks make the lossy format LOSSLESS BY CONSTRUCTION:
  * the only nonzero coefficient is DC = 8*(v-128), the quantizer 8
  * divides it exactly, and the inverse DCT of a DC-only block is the
  * same constant — so a DuckDB oracle recomputes the exact decoded
  * sums from the same arithmetic and certifies the whole Huffman +
  * dequant + IDCT + crop path bit-exactly (the fixture side of the
  * construct → store → scan → decode round trip, like [[PngEncode]]).
  * With `restartRows` the stream carries a restart marker per MCU row,
  * pinning the decoder's RSTn/predictor-reset path under the same
  * exact oracle. The encoder's DCT is the general double-precision
  * transform (not a constant-block shortcut), so JpegSpec can also
  * feed it arbitrary pixels for the ImageIO differential. */
case class JpegEncode(first: Expression, second: Expression,
    third: Expression, fourth: Expression)
    extends QuaternaryExpression with QuaternaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType, fourth.dataType) match {
      case (IntegerType, IntegerType, LongType, BooleanType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_jpeg_encode expects (int, int, bigint, boolean), got $other")
    }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_jpeg_encode"

  override def nullSafeEval(w: Any, h: Any, seed: Any, rst: Any): Any =
    JpegEncode.encodeBlocky(w.asInstanceOf[Int], h.asInstanceOf[Int],
      seed.asInstanceOf[Long], rst.asInstanceOf[Boolean])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (w, h, s, r) => s"""
      ${ev.value} = graft.plans.JpegEncode.encodeBlocky($w, $h, $s, $r);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression, q: Expression): JpegEncode = copy(f, s, t, q)
}

object JpegEncode {

  /** Flat quantizer: 8 everywhere. 8 divides every constant block's
    * DC (8*(v-128)) exactly — the keystone of the exact oracle. */
  val Quant = 8

  // Annex K.3 luminance tables (ITU T.81, public spec data)
  private val DcBits = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcVals: Array[Int] = (0 to 11).toArray
  private val AcBits = Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D)
  private val AcVals: Array[Int] = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA)

  /** Canonical code assignment (T.81 C.2): symbol -> (code, length). */
  private def buildCodes(bits: Array[Int], vals: Array[Int]): (Array[Int], Array[Int]) = {
    val code = new Array[Int](256)
    val size = new Array[Int](256)
    var c = 0; var k = 0; var l = 1
    while (l <= 16) {
      var n = bits(l - 1)
      while (n > 0) {
        code(vals(k)) = c; size(vals(k)) = l
        c += 1; k += 1; n -= 1
      }
      c <<= 1
      l += 1
    }
    (code, size)
  }
  private val (dcCode, dcSize) = buildCodes(DcBits, DcVals)
  private val (acCode, acSize) = buildCodes(AcBits, AcVals)

  // 12-bit DC table: categories 0..15 (T.81 F.1.2.1.1 allows SSSS up
  // to 15 at 12-bit precision; Annex K's table stops at 11), all at
  // code length 5 — 16 of 32 codes used, all-ones reserved.
  private val Dc12Bits: Array[Int] =
    Array(0, 0, 0, 0, 16, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
  private val Dc12Vals: Array[Int] = (0 to 15).toArray
  private val (dc12Code, dc12Size) = buildCodes(Dc12Bits, Dc12Vals)

  private val FwdCt: Array[Array[Double]] = Array.tabulate(8, 8) { (x, u) =>
    val cu = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
    cu / 2.0 * math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var n = 0
    def write(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >> i) & 1)
        n += 1
        if (n == 8) {
          out.write(acc)
          if (acc == 0xFF) out.write(0x00) // byte stuffing
          acc = 0; n = 0
        }
        i -= 1
      }
    }
    /** Pad to a byte boundary with 1-bits (T.81 F.1.2.3). */
    def flush(): Unit = if (n > 0) write(0xFF, 8 - n)
  }

  private def category(v: Int): Int = {
    var a = math.abs(v); var c = 0
    while (a != 0) { a >>= 1; c += 1 }
    c
  }

  /** Canonical Huffman table for lossless frames deeper than 8 bits:
    * all 17 difference categories (0..16 — 16 is the ≡ −32768 special
    * symbol) at code length 5; the all-ones length-5 code stays
    * unused, satisfying T.81's reserved-prefix rule. The 8-bit path
    * keeps the Annex-K DC table so its byte streams are unchanged. */
  private val LlBits: Array[Int] =
    Array(0, 0, 0, 0, 17, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
  private val LlVals: Array[Int] = (0 to 16).toArray
  private val (llCode, llSize) = buildCodes(LlBits, LlVals)

  /** LOSSLESS fixture encoder (SOF3, T.81 Annex H process 14): pixel
    * (x, y) channels come from the same seed formulas as
    * [[TiffEncode]] (gray (s+5x+3y); RGB (s+3x+7y)/(2s+5x+y)/
    * (3s+x+11y), each mod 2^prec — lossless carries components in
    * their source space, no YCbCr), spatial prediction with selector
    * `pred` 1..7, DC-category differences wrapped to [−32768, 32767]
    * (the ≡ −32768 case emits category 16 with no bits). Precision
    * 8 uses the Annex-K DC table (byte-identical to the pre-r12
    * encoder); 12/16-bit frames carry the 17-symbol [[LlBits]] table.
    * Being LOSSLESS, the decoded sums equal the formula sums exactly
    * — the oracle needs no codec arithmetic at all. */
  def encodeLossless(w: Int, h: Int, seed: Long, nComp: Int,
      pred: Int, prec: Int = 8): Array[Byte] = {
    if (w <= 0 || h <= 0 || w.toLong * h > (1L << 20)) return null
    if ((nComp != 1 && nComp != 3) || pred < 1 || pred > 7 || seed < 0) return null
    if (prec != 8 && prec != 12 && prec != 16) return null
    val mod = 1L << prec
    def sample(c: Int, x: Int, y: Int): Int = (if (nComp == 1)
      java.lang.Math.floorMod(seed + 5L * x + 3L * y, mod)
    else c match {
      case 0 => java.lang.Math.floorMod(seed + 3L * x + 7L * y, mod)
      case 1 => java.lang.Math.floorMod(2L * seed + 5L * x + y, mod)
      case _ => java.lang.Math.floorMod(3L * seed + x + 11L * y, mod)
    }).toInt
    val deep = prec > 8
    val out = new java.io.ByteArrayOutputStream(w * h * nComp / 2 + 256)
    def marker(m: Int): Unit = { out.write(0xFF); out.write(m) }
    def seg(m: Int, body: Array[Int]): Unit = {
      marker(m); val len = body.length + 2
      out.write(len >> 8); out.write(len & 0xFF); body.foreach(out.write)
    }
    marker(0xD8)
    val sofComps = (1 to nComp).flatMap(c => Seq(c, 0x11, 0)).toArray
    seg(0xC3, Array(prec, h >> 8, h & 0xFF, w >> 8, w & 0xFF, nComp) ++ sofComps)
    if (deep) seg(0xC4, Array(0x00) ++ LlBits ++ LlVals)
    else seg(0xC4, Array(0x00) ++ DcBits ++ DcVals)
    val sosComps = (1 to nComp).flatMap(c => Seq(c, 0x00)).toArray
    seg(0xDA, Array(nComp) ++ sosComps ++ Array(pred, 0, 0)) // Ss=pred, Pt=0
    val bw = new BitWriter(out)
    val prevRow = Array.fill(nComp)(new Array[Int](w))
    val curRow = Array.fill(nComp)(new Array[Int](w))
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var c = 0
        while (c < nComp) {
          val v = sample(c, x, y)
          // the decoder's prediction, mirrored exactly (H.1.2.1)
          val px =
            if (y == 0 && x == 0) 1 << (prec - 1) // 2^(P-1), Pt=0
            else if (y == 0) curRow(c)(x - 1)
            else if (x == 0) prevRow(c)(0)
            else {
              val ra = curRow(c)(x - 1); val rb = prevRow(c)(x)
              val rc = prevRow(c)(x - 1)
              pred match {
                case 1 => ra
                case 2 => rb
                case 3 => rc
                case 4 => ra + rb - rc
                case 5 => ra + ((rb - rc) >> 1)
                case 6 => rb + ((ra - rc) >> 1)
                case 7 => (ra + rb) >> 1
              }
            }
          curRow(c)(x) = v // the reconstruction IS the sample
          // wrap the difference into [−32768, 32767]: the decoder adds
          // mod 2^16, so any representative is legal — the wrapped one
          // has the smallest category (identical to the old direct
          // difference for P=8, where |v − px| ≤ 510)
          var d = (v - px) & 0xFFFF
          if (d > 32767) d -= 65536
          if (d == -32768) { // category 16: no magnitude bits follow
            if (deep) bw.write(llCode(16), llSize(16))
            else bw.write(dcCode(16), dcSize(16)) // unreachable at P=8
          } else {
            val ssss = category(d)
            if (deep) bw.write(llCode(ssss), llSize(ssss))
            else bw.write(dcCode(ssss), dcSize(ssss))
            if (ssss > 0) bw.write(if (d < 0) d + (1 << ssss) - 1 else d, ssss)
          }
          c += 1
        }
        x += 1
      }
      var c = 0
      while (c < nComp) {
        val t = prevRow(c); prevRow(c) = curRow(c); curRow(c) = t
        c += 1
      }
      y += 1
    }
    bw.flush()
    marker(0xD9)
    out.toByteArray
  }

  /** The fixture encoder: per-block-constant pixels from the seed
    * formula (see class doc). Null on non-positive/oversized dims. */
  def encodeBlocky(w: Int, h: Int, seed: Long, restartRows: Boolean): Array[Byte] = {
    if (w <= 0 || h <= 0 || w.toLong * h > (1L << 20)) return null
    val bx = (w + 7) / 8
    val pix = (px: Int, py: Int) => {
      val v = java.lang.Math.floorMod(seed + 5L * (px / 8) + 11L * (py / 8), 256L)
      v.toInt
    }
    encode(w, h, pix, if (restartRows) bx else 0)
  }

  /** 12-BIT blocky fixture (SOF1 extended sequential, T.81 process 2
    * with Huffman coding): per-block-constant 12-bit pixels
    * (seed + 5bx + 11by) mod 4096. The constant-block construction is
    * lossless here exactly as at 8 bits — DC = 8·(v − 2048) and the
    * flat quantizer 8 divides it, so the decoded sums equal the
    * formula sums with zero codec arithmetic in the oracle. Streams
    * carry the Pq=1 (16-bit-entry) DQT form and the 16-symbol DC
    * table, certifying both 12-bit parse paths. */
  def encodeBlocky12(w: Int, h: Int, seed: Long, restartRows: Boolean): Array[Byte] = {
    if (w <= 0 || h <= 0 || w.toLong * h > (1L << 20) || seed < 0) return null
    val bx = (w + 7) / 8
    val pix = (px: Int, py: Int) =>
      java.lang.Math.floorMod(seed + 5L * (px / 8) + 11L * (py / 8), 4096L).toInt
    try encodeInterleaved(w, h, 1, 1, Array(pix),
      if (restartRows) bx else 0, prec = 12)
    catch { case _: IllegalArgumentException => null }
  }

  /** General baseline grayscale encoder over any pixel function —
    * forward DCT (double), quantize by [[Quant]], Annex-K Huffman.
    * `restartInterval` in MCUs (0 = none). */
  def encode(w: Int, h: Int, pix: (Int, Int) => Int,
      restartInterval: Int): Array[Byte] =
    encodeInterleaved(w, h, 1, 1, Array(pix), restartInterval)

  /** General baseline COLOR encoder: three sample functions in THEIR
    * OWN sample spaces (luma full-resolution, chroma subsampled by
    * hs x vs), interleaved MCUs per T.81. */
  def encodeColor(w: Int, h: Int, yF: (Int, Int) => Int,
      cbF: (Int, Int) => Int, crF: (Int, Int) => Int,
      hs: Int, vs: Int, restartInterval: Int): Array[Byte] =
    encodeInterleaved(w, h, hs, vs, Array(yF, cbF, crF), restartInterval)

  /** Shared interleaved encoder: `comps.length` ∈ {1, 3}; component 0
    * samples at (hs, vs) per MCU, the rest at 1x1 (chroma). Each
    * component's sample function is indexed in its own grid and edge
    * blocks replicate the last row/column — constant blocks stay
    * constant, the exact-oracle keystone. */
  private def encodeInterleaved(w: Int, h: Int, hs: Int, vs: Int,
      comps: Array[(Int, Int) => Int], restartInterval: Int,
      prec: Int = 8): Array[Byte] = {
    val nComp = comps.length
    val half = 1 << (prec - 1)
    // 12-bit streams use the 16-symbol DC table; the Annex-K AC table
    // serves both depths (sizes beyond its 10-bit ceiling refuse below)
    val (dCode, dSize) =
      if (prec == 12) (dc12Code, dc12Size) else (dcCode, dcSize)
    val mcusX = (w + 8 * hs - 1) / (8 * hs)
    val mcusY = (h + 8 * vs - 1) / (8 * vs)
    // per-component sample-grid bounds (for edge replication)
    val compW = Array.tabulate(nComp)(c => if (c == 0) w else (w + hs - 1) / hs)
    val compH2 = Array.tabulate(nComp)(c => if (c == 0) h else (h + vs - 1) / vs)
    val out = new java.io.ByteArrayOutputStream(w * h / 4 + 1024)
    def marker(m: Int): Unit = { out.write(0xFF); out.write(m) }
    def seg(m: Int, body: Array[Int]): Unit = {
      marker(m)
      val len = body.length + 2
      out.write(len >> 8); out.write(len & 0xFF)
      body.foreach(out.write)
    }
    marker(0xD8) // SOI
    // DQT: table 0, zigzag order (flat, so order is moot — written
    // spec-correctly anyway); shared by every component. The 12-bit
    // form stores 16-bit entries (Pq=1), certifying that parse path.
    if (prec == 12)
      seg(0xDB, Array(0x10) ++ Array.fill(64)(Quant).flatMap(v =>
        Array(v >> 8, v & 0xFF)))
    else seg(0xDB, Array(0x00) ++ Array.fill(64)(Quant))
    // SOF0 (8-bit baseline) or SOF1 (12-bit extended sequential);
    // component 0 samples (hs, vs), chroma 1x1
    val sofComps =
      if (nComp == 1) Array(1, 0x11, 0)
      else Array(1, (hs << 4) | vs, 0, 2, 0x11, 0, 3, 0x11, 0)
    seg(if (prec == 12) 0xC1 else 0xC0,
      Array(prec, h >> 8, h & 0xFF, w >> 8, w & 0xFF, nComp) ++ sofComps)
    // DHT: DC table 0, AC table 0 (Annex-K luminance for every
    // component — legal, the scan just selects table 0 thrice)
    if (prec == 12) seg(0xC4, Array(0x00) ++ Dc12Bits ++ Dc12Vals)
    else seg(0xC4, Array(0x00) ++ DcBits ++ DcVals)
    seg(0xC4, Array(0x10) ++ AcBits ++ AcVals)
    if (restartInterval > 0)
      seg(0xDD, Array(restartInterval >> 8, restartInterval & 0xFF))
    // SOS: all components, DC/AC table 0, full spectral range
    val sosComps = (1 to nComp).flatMap(c => Seq(c, 0x00)).toArray
    seg(0xDA, Array(nComp) ++ sosComps ++ Array(0, 63, 0))
    val bw = new BitWriter(out)
    val samples = new Array[Double](64)
    val coef = new Array[Int](64)
    val preds = new Array[Int](nComp)
    var mcu = 0
    var rstN = 0

    def writeBlock(c: Int, ox: Int, oy: Int): Unit = {
      // level-shifted block (edge blocks replicate the last
      // row/column — keeps constant blocks constant)
      val pix = comps(c)
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          val px = math.min(ox + x, compW(c) - 1)
          val py = math.min(oy + y, compH2(c) - 1)
          samples(y * 8 + x) = pix(px, py) - half.toDouble
          x += 1
        }
        y += 1
      }
      // forward DCT + quantize
      var u = 0
      while (u < 8) {
        var v = 0
        while (v < 8) {
          var acc = 0.0
          var yy = 0
          while (yy < 8) {
            var xx = 0
            while (xx < 8) {
              acc += FwdCt(xx)(u) * FwdCt(yy)(v) * samples(yy * 8 + xx)
              xx += 1
            }
            yy += 1
          }
          coef(v * 8 + u) = math.round(acc / Quant).toInt
          v += 1
        }
        u += 1
      }
      // DC difference
      val diff = coef(0) - preds(c)
      preds(c) = coef(0)
      val t = category(diff)
      bw.write(dCode(t), dSize(t))
      if (t > 0) {
        val bits = if (diff < 0) diff + (1 << t) - 1 else diff
        bw.write(bits, t)
      }
      // AC run-length over zigzag order
      var k = 1
      var run = 0
      while (k < 64) {
        val cv = coef(JpegPixels.Zigzag(k))
        if (cv == 0) run += 1
        else {
          while (run > 15) { bw.write(acCode(0xF0), acSize(0xF0)); run -= 16 }
          val s = category(cv)
          // the Annex-K AC table stops at 10 magnitude bits: an input
          // whose quantized AC needs more refuses rather than emitting
          // a zero-length (silently corrupt) code. Unreachable at
          // 8-bit (|coef| is DCT-bounded under category 10 there);
          // the 12-bit public entry catches this into a NULL.
          if (s > 10) throw new IllegalArgumentException(
            s"AC category $s beyond the Annex-K table")
          val rs = (run << 4) | s
          bw.write(acCode(rs), acSize(rs))
          val bits = if (cv < 0) cv + (1 << s) - 1 else cv
          bw.write(bits, s)
          run = 0
        }
        k += 1
      }
      if (run > 0) bw.write(acCode(0x00), acSize(0x00)) // EOB
    }

    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          bw.flush()
          marker(0xD0 + rstN)
          rstN = (rstN + 1) & 7
          java.util.Arrays.fill(preds, 0)
        }
        // interleave: component 0's hs x vs blocks, then one block each
        // of the 1x1 components — T.81's MCU ordering
        var bv = 0
        while (bv < vs) {
          var bh = 0
          while (bh < hs) {
            writeBlock(0, mx * 8 * hs + bh * 8, my * 8 * vs + bv * 8)
            bh += 1
          }
          bv += 1
        }
        var c = 1
        while (c < nComp) {
          writeBlock(c, mx * 8, my * 8)
          c += 1
        }
        mcu += 1
        mx += 1
      }
      my += 1
    }
    bw.flush()
    marker(0xD9) // EOI
    out.toByteArray
  }

  // Progressive AC scans need EOBn symbols (0x10..0x70) the Annex-K
  // baseline table lacks. Custom canonical table: EOBn 0x00..0x70, ZRL,
  // and (run, size<=3) codes, all length 6 (57 codes < 63 -- the
  // all-ones code stays unused, as T.81 requires).
  private val ProgAcVals: Array[Int] =
    (0 to 7).map(_ << 4).toArray ++ Array(0xF0) ++
      (for (r <- 0 to 15; sz <- 1 to 3) yield (r << 4) | sz)
  private val ProgAcBits: Array[Int] =
    Array(0, 0, 0, 0, 0, ProgAcVals.length, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
  private val (progAcCode, progAcSize) = buildCodes(ProgAcBits, ProgAcVals)

  /** PROGRESSIVE (SOF2) fixture encoder over general sample functions:
    * real forward DCT + quantize per block up front, then a
    * successive-approximation scan script —
    *
    *   DC first (Al=1, interleaved when 3 components), then per
    *   component banded AC first passes, AC refinement passes
    *   (Ah=1 -> Al=0) for component 0, and a final DC refinement —
    *
    * with EOBn run batching across blocks (the progressive-only
    * symbol family), optional DRI/RSTn cadence in EVERY scan (run
    * flushed at each restart, RST index cycling from 0 per scan), and
    * byte stuffing. DC successive approximation uses the arithmetic
    * shift (T.81 point transform for DC), so the refinement bit is
    * exactly dc & 1 and the decoder's (pred<<1)|bit reconstruction is
    * lossless for negative coefficients too. AC coefficients beyond
    * size 3 have no code in the custom table -> null (the fixture's
    * constant blocks have none; the DCT is still the general
    * transform, not a constant-block shortcut). */
  private[graft] def encodeProgressive(w: Int, h: Int, hs: Int, vs: Int,
      comps: Array[(Int, Int) => Int], restartInterval: Int,
      script: Seq[(Seq[Int], Int, Int, Int, Int)] = Seq.empty): Array[Byte] = {
    val nComp = comps.length
    val mcusX = (w + 8 * hs - 1) / (8 * hs)
    val mcusY = (h + 8 * vs - 1) / (8 * vs)
    val compHs = Array.tabulate(nComp)(c => if (c == 0) hs else 1)
    val compVs = Array.tabulate(nComp)(c => if (c == 0) vs else 1)
    val compW = Array.tabulate(nComp)(c => if (c == 0) w else (w + hs - 1) / hs)
    val compH2 = Array.tabulate(nComp)(c => if (c == 0) h else (h + vs - 1) / vs)
    val padW = Array.tabulate(nComp)(c => mcusX * compHs(c))
    val padH = Array.tabulate(nComp)(c => mcusY * compVs(c))
    val niW = Array.tabulate(nComp)(c => (compW(c) + 7) / 8)
    val niH = Array.tabulate(nComp)(c => (compH2(c) + 7) / 8)

    // quantize every padded-grid block once (interleaved DC scans code
    // the padding blocks; edge replication keeps them constant)
    val samples = new Array[Double](64)
    def quantBlock(c: Int, bx: Int, by: Int): Array[Int] = {
      val pix = comps(c)
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          val px = math.min(bx * 8 + x, compW(c) - 1)
          val py = math.min(by * 8 + y, compH2(c) - 1)
          samples(y * 8 + x) = pix(px, py) - 128.0
          x += 1
        }
        y += 1
      }
      val coef = new Array[Int](64)
      var u = 0
      while (u < 8) {
        var v = 0
        while (v < 8) {
          var acc = 0.0
          var yy = 0
          while (yy < 8) {
            var xx = 0
            while (xx < 8) {
              acc += FwdCt(xx)(u) * FwdCt(yy)(v) * samples(yy * 8 + xx)
              xx += 1
            }
            yy += 1
          }
          coef(v * 8 + u) = math.round(acc / Quant).toInt
          v += 1
        }
        u += 1
      }
      coef
    }
    val blocks = Array.tabulate(nComp)(c =>
      Array.tabulate(padH(c) * padW(c))(i => quantBlock(c, i % padW(c), i / padW(c))))

    val out = new java.io.ByteArrayOutputStream(w * h / 4 + 1024)
    def marker(m: Int): Unit = { out.write(0xFF); out.write(m) }
    def seg(m: Int, body: Array[Int]): Unit = {
      marker(m)
      val len = body.length + 2
      out.write(len >> 8); out.write(len & 0xFF)
      body.foreach(out.write)
    }
    marker(0xD8)
    seg(0xDB, Array(0x00) ++ Array.fill(64)(Quant))
    val sofComps =
      if (nComp == 1) Array(1, 0x11, 0)
      else Array(1, (hs << 4) | vs, 0, 2, 0x11, 0, 3, 0x11, 0)
    seg(0xC2, Array(8, h >> 8, h & 0xFF, w >> 8, w & 0xFF, nComp) ++ sofComps)
    seg(0xC4, Array(0x00) ++ DcBits ++ DcVals)
    seg(0xC4, Array(0x10) ++ ProgAcBits ++ ProgAcVals)
    if (restartInterval > 0)
      seg(0xDD, Array(restartInterval >> 8, restartInterval & 0xFF))

    var bad = false // AC value without a code in the custom table

    /** One scan: components `scs` (frame indices), band ss..se, shift
      * ah -> al. Emits SOS header + entropy data + restarts. */
    def scan(scs: Seq[Int], ss: Int, se: Int, ah: Int, al: Int): Unit = {
      val sosComps = scs.flatMap(c => Seq(c + 1, 0x00)).toArray // DC tab 0, AC tab 0
      seg(0xDA, Array(scs.length) ++ sosComps ++ Array(ss, se, (ah << 4) | al))
      val bw = new BitWriter(out)
      val preds = new Array[Int](nComp)
      var eobrun = 0
      var unit = 0
      var rstN = 0
      def flushEob(): Unit = if (eobrun > 0) {
        var r = 0
        while ((2 << r) <= eobrun) r += 1 // r = floor(log2(eobrun))
        bw.write(progAcCode(r << 4), progAcSize(r << 4))
        if (r > 0) bw.write(eobrun - (1 << r), r)
        eobrun = 0
      }
      def restartIfDue(): Unit =
        if (restartInterval > 0 && unit > 0 && unit % restartInterval == 0) {
          flushEob()
          bw.flush()
          marker(0xD0 + rstN)
          rstN = (rstN + 1) & 7
          java.util.Arrays.fill(preds, 0)
        }
      def dcFirstBlock(c: Int, coef: Array[Int]): Unit = {
        val dcAl = coef(0) >> al // arithmetic shift: the DC point transform
        val diff = dcAl - preds(c)
        preds(c) = dcAl
        val t = category(diff)
        bw.write(dcCode(t), dcSize(t))
        if (t > 0)
          bw.write(if (diff < 0) diff + (1 << t) - 1 else diff, t)
      }
      def dcRefineBlock(coef: Array[Int]): Unit =
        bw.write((coef(0) >> al) & 1, 1)
      def acFirstBlock(coef: Array[Int]): Unit = {
        // band values after the point transform (division by 2^Al,
        // truncating toward zero per T.81 A.4)
        var any = false
        var k = ss
        while (k <= se && !any) { if (coef(JpegPixels.Zigzag(k)) / (1 << al) != 0) any = true; k += 1 }
        if (!any) {
          eobrun += 1
          if (eobrun == 255) flushEob() // 0x70's ceiling
          return
        }
        flushEob()
        var run = 0
        var kk = ss
        var lastNz = ss - 1
        k = ss
        while (k <= se) { if (coef(JpegPixels.Zigzag(k)) / (1 << al) != 0) lastNz = k; k += 1 }
        while (kk <= lastNz) {
          val cv = coef(JpegPixels.Zigzag(kk)) / (1 << al)
          if (cv == 0) run += 1
          else {
            while (run > 15) { bw.write(progAcCode(0xF0), progAcSize(0xF0)); run -= 16 }
            val sz = category(cv)
            if (sz > 3) { bad = true; return }
            val rs = (run << 4) | sz
            bw.write(progAcCode(rs), progAcSize(rs))
            bw.write(if (cv < 0) cv + (1 << sz) - 1 else cv, sz)
            run = 0
          }
          kk += 1
        }
        if (lastNz < se) eobrun += 1
        if (eobrun == 255) flushEob()
      }
      def acRefineBlock(coef: Array[Int]): Unit = {
        // fixture blocks have no AC history and no new bits at this
        // precision -> the whole block joins the EOB run; anything else
        // is out of this encoder's scope (decoder-side refinement with
        // real bits is certified by the ImageIO differential)
        var k = ss
        while (k <= se) {
          if (coef(JpegPixels.Zigzag(k)) != 0) { bad = true; return }
          k += 1
        }
        eobrun += 1
        if (eobrun == 255) flushEob()
      }

      val isDc = ss == 0
      if (isDc && scs.length > 1) {
        var my = 0
        while (my < mcusY) {
          var mx = 0
          while (mx < mcusX) {
            restartIfDue()
            scs.foreach { c =>
              var bv = 0
              while (bv < compVs(c)) {
                var bh = 0
                while (bh < compHs(c)) {
                  val coef = blocks(c)((my * compVs(c) + bv) * padW(c) +
                    mx * compHs(c) + bh)
                  if (ah == 0) dcFirstBlock(c, coef) else dcRefineBlock(coef)
                  bh += 1
                }
                bv += 1
              }
            }
            unit += 1
            mx += 1
          }
          my += 1
        }
      } else {
        val c = scs.head
        var by = 0
        while (by < niH(c)) {
          var bx = 0
          while (bx < niW(c)) {
            restartIfDue()
            val coef = blocks(c)(by * padW(c) + bx)
            if (isDc) { if (ah == 0) dcFirstBlock(c, coef) else dcRefineBlock(coef) }
            else { if (ah == 0) acFirstBlock(coef) else acRefineBlock(coef) }
            unit += 1
            bx += 1
          }
          by += 1
        }
      }
      flushEob()
      bw.flush()
    }

    val all = 0 until nComp
    val useScript: Seq[(Seq[Int], Int, Int, Int, Int)] =
      if (script.nonEmpty) script
      else {
        // default: DC first at Al=1 (interleaved for color), banded AC
        // first passes, AC refinements for component 0, final DC refine
        Seq((all, 0, 0, 0, 1),
          (Seq(0), 1, 5, 0, 1), (Seq(0), 6, 63, 0, 1)) ++
          (if (nComp == 3) Seq((Seq(1), 1, 63, 0, 0), (Seq(2), 1, 63, 0, 0))
           else Seq.empty) ++
          Seq((Seq(0), 1, 5, 1, 0), (Seq(0), 6, 63, 1, 0), (all, 0, 0, 1, 0))
      }
    useScript.foreach { case (scs, ss, se, ah, al) => scan(scs, ss, se, ah, al) }
    marker(0xD9)
    if (bad) null else out.toByteArray
  }

  /** Test hook: the progressive fixture planes under an ARBITRARY
    * scan script (Seq of (components, ss, se, ah, al)) — the fuzz
    * harness generates random valid successive-approximation scripts
    * and the decoder must reproduce the same constant-block sums
    * whatever the script did. */
  private[graft] def encodeBlockyProgressiveScript(w: Int, h: Int, seed: Long,
      mode: Int, script: Seq[(Seq[Int], Int, Int, Int, Int)]): Array[Byte] = {
    if (w <= 0 || h <= 0 || w.toLong * h > (1L << 20)) return null
    def m256(v: Long): Int = java.lang.Math.floorMod(v, 256L).toInt
    val yF = (px: Int, py: Int) => m256(seed + 5L * (px / 8) + 11L * (py / 8))
    mode match {
      case 3 => encodeProgressive(w, h, 1, 1, Array(yF), 0, script)
      case 0 | 1 | 2 | 4 =>
        val (hs, vs) = mode match {
          case 0 => (1, 1); case 1 => (2, 1); case 4 => (1, 2); case _ => (2, 2)
        }
        val cbF = (cx: Int, cy: Int) => m256(3L * seed + 7L * (cx / 8) + 13L * (cy / 8) + 64L)
        val crF = (cx: Int, cy: Int) => m256(5L * seed + 3L * (cx / 8) + 17L * (cy / 8) + 128L)
        encodeProgressive(w, h, hs, vs, Array(yF, cbF, crF), 0, script)
      case _ => null
    }
  }

  /** The PROGRESSIVE fixture encoder: same per-block-constant planes
    * as [[encodeBlockyColor]] (modes 0/1/2) or [[encodeBlocky]]
    * (mode 3 = grayscale), emitted as an SOF2 successive-approximation
    * scan sequence — so the SAME DuckDB sum oracle certifies the whole
    * progressive protocol (DC Al split + refinement bits, spectral
    * bands, EOBn runs, per-scan restarts) bit-exactly. */
  def encodeBlockyProgressive(w: Int, h: Int, seed: Long, mode: Int,
      restartRows: Boolean): Array[Byte] = {
    if (w <= 0 || h <= 0 || w.toLong * h > (1L << 20)) return null
    def m256(v: Long): Int = java.lang.Math.floorMod(v, 256L).toInt
    val yF = (px: Int, py: Int) => m256(seed + 5L * (px / 8) + 11L * (py / 8))
    mode match {
      case 3 =>
        encodeProgressive(w, h, 1, 1, Array(yF),
          if (restartRows) (w + 7) / 8 else 0)
      case 0 | 1 | 2 | 4 =>
        val (hs, vs) = mode match {
          case 0 => (1, 1)
          case 1 => (2, 1)
          case 4 => (1, 2) // 4:4:0 — the vertically-subsampled shape
          case _ => (2, 2)
        }
        val cbF = (cx: Int, cy: Int) => m256(3L * seed + 7L * (cx / 8) + 13L * (cy / 8) + 64L)
        val crF = (cx: Int, cy: Int) => m256(5L * seed + 3L * (cx / 8) + 17L * (cy / 8) + 128L)
        val mcusX = (w + 8 * hs - 1) / (8 * hs)
        encodeProgressive(w, h, hs, vs, Array(yF, cbF, crF),
          if (restartRows) mcusX else 0)
      case _ => null
    }
  }

  /** The COLOR fixture encoder: per-block-constant planes in each
    * component's own sample space —
    *
    *   y (luma block bx, by)    = (seed + 5*bx + 11*by) mod 256
    *   cb (chroma block cx, cy) = (3*seed + 7*cx + 13*cy + 64) mod 256
    *   cr (chroma block cx, cy) = (5*seed + 3*cx + 17*cy + 128) mod 256
    *
    * `mode`: 0 = 4:4:4 (1x1), 1 = 4:2:2 (2x1), 2 = 4:2:0 (2x2).
    * Because chroma is constant per chroma BLOCK and a luma block lies
    * inside exactly one chroma region, every decoded pixel's (y, cb,
    * cr) — and so its clamped RGB — is constant per LUMA block: the
    * DuckDB oracle enumerates luma blocks and recomputes the channel
    * sums exactly (floor(x+0.5) conversion, see JpegPixels.rgbClamp).
    * restartRows adds one restart per MCU row (pins the color
    * predictor-reset path). Null on non-positive/oversized dims. */
  def encodeBlockyColor(w: Int, h: Int, seed: Long, mode: Int,
      restartRows: Boolean): Array[Byte] = {
    if (w <= 0 || h <= 0 || w.toLong * h > (1L << 20)) return null
    val (hs, vs) = mode match {
      case 0 => (1, 1)
      case 1 => (2, 1)
      case 2 => (2, 2)
      case _ => return null
    }
    def m256(v: Long): Int = java.lang.Math.floorMod(v, 256L).toInt
    val yF = (px: Int, py: Int) => m256(seed + 5L * (px / 8) + 11L * (py / 8))
    val cbF = (cx: Int, cy: Int) => m256(3L * seed + 7L * (cx / 8) + 13L * (cy / 8) + 64L)
    val crF = (cx: Int, cy: Int) => m256(5L * seed + 3L * (cx / 8) + 17L * (cy / 8) + 128L)
    val mcusX = (w + 8 * hs - 1) / (8 * hs)
    encodeColor(w, h, yF, cbF, crF, hs, vs, if (restartRows) mcusX else 0)
  }
}

/** `graft_jpeg_encode_color(width, height, seed, mode, restartRows)` →
  * binary: a fully valid baseline YCbCr JPEG with real subsampling
  * (mode 0/1/2 = 4:4:4 / 4:2:2 / 4:2:0), per-block-constant planes —
  * the color fixture side of the exact round-trip oracle (see
  * [[JpegEncode.encodeBlockyColor]]). */
case class JpegEncodeColor(children: Seq[Expression]) extends Expression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    children.map(_.dataType) match {
      case Seq(IntegerType, IntegerType, LongType, IntegerType, BooleanType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_jpeg_encode_color expects (int, int, bigint, int, boolean), got $other")
    }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  // CodegenFallback (not a hot path: the FIXTURE build runs it once per
  // doc at media-table write time; the decoder stays codegen'd)
  override def foldable: Boolean = children.forall(_.foldable)
  override def prettyName: String = "graft_jpeg_encode_color"

  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.contains(null)) null
    else JpegEncode.encodeBlockyColor(vs(0).asInstanceOf[Int],
      vs(1).asInstanceOf[Int], vs(2).asInstanceOf[Long],
      vs(3).asInstanceOf[Int], vs(4).asInstanceOf[Boolean])
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): JpegEncodeColor =
    copy(children = newChildren)
}

/** `graft_jpeg_encode_progressive(width, height, seed, mode,
  * restartRows)` → binary: a fully valid PROGRESSIVE (SOF2) JPEG of
  * the same per-block-constant planes as the baseline fixtures (mode
  * 0/1/2 = color 4:4:4 / 4:2:2 / 4:2:0, mode 3 = grayscale), coded as
  * a successive-approximation scan sequence — see
  * [[JpegEncode.encodeBlockyProgressive]]. */
case class JpegEncodeProgressive(children: Seq[Expression]) extends Expression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    children.map(_.dataType) match {
      case Seq(IntegerType, IntegerType, LongType, IntegerType, BooleanType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_jpeg_encode_progressive expects (int, int, bigint, int, boolean), got $other")
    }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  // CodegenFallback: fixture-build-only, like JpegEncodeColor
  override def foldable: Boolean = children.forall(_.foldable)
  override def prettyName: String = "graft_jpeg_encode_progressive"

  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.contains(null)) null
    else JpegEncode.encodeBlockyProgressive(vs(0).asInstanceOf[Int],
      vs(1).asInstanceOf[Int], vs(2).asInstanceOf[Long],
      vs(3).asInstanceOf[Int], vs(4).asInstanceOf[Boolean])
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): JpegEncodeProgressive =
    copy(children = newChildren)
}
