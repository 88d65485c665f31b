package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** TIFF pixel decode — extending the EXIF-substrate coverage past the
  * r10 header triage (ImageExpressions.scala parseTiff, dims only) to
  * real raster data, from the public TIFF 6.0 spec alone. Scope is
  * the BMP-difficulty case: Compression=1 (uncompressed) baseline
  * TIFF, 8 bits per sample, chunky planar layout, grayscale
  * (PhotometricInterpretation=1) or RGB (=2), BOTH byte orders.
  *
  * `graft_tiff_pixels(binary)` → the [[BmpStats]] schema (width,
  * height, channel sums, n_pixels; grayscale replicates its sum to
  * all three channels), NULL for anything outside that envelope —
  * LZW/JPEG-compressed, planar, tiled, or deep TIFFs are triage-only
  * by design (format/dims via graft_img_meta), never wrong-valued.
  *
  * The strip walk is the part the oracle certifies: IFD0's
  * StripOffsets / StripByteCounts / RowsPerStrip (SHORT or LONG,
  * inline or out-of-line by the count×size>4 rule) partition the
  * image into row bands; every strip's byte count must equal exactly
  * rows_in_strip × width × samples, land inside the buffer, and the
  * strips must tile the height. That strictness makes the parse
  * total AND time-bounded with no extra ceiling: every decoded byte
  * exists in the input, so work is O(input). Per-row byte walk
  * inside whole-stage codegen, same execution shape as
  * [[BmpStats]]. */
case class TiffPixels(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_tiff_pixels expects a binary column, got ${child.dataType.catalogString}")
  override def dataType: DataType = BmpStats.schema
  override def nullable: Boolean = true
  override def prettyName: String = "graft_tiff_pixels"

  override def nullSafeEval(input: Any): Any =
    TiffPixels.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => s"""
      ${ev.value} = graft.plans.TiffPixels.parse($b);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): TiffPixels =
    copy(child = newChild)
}

object TiffPixels {

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF

  def parse(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 14) return null
    val le =
      if (u8(b, 0) == 'I' && u8(b, 1) == 'I' && u8(b, 2) == 42 && u8(b, 3) == 0) true
      else if (u8(b, 0) == 'M' && u8(b, 1) == 'M' && u8(b, 2) == 0 && u8(b, 3) == 42) false
      else return null
    def r16(i: Int): Int =
      if (le) u8(b, i) | (u8(b, i + 1) << 8) else (u8(b, i) << 8) | u8(b, i + 1)
    def r32(i: Int): Long =
      if (le) u8(b, i).toLong | (u8(b, i + 1).toLong << 8) |
        (u8(b, i + 2).toLong << 16) | (u8(b, i + 3).toLong << 24)
      else (u8(b, i).toLong << 24) | (u8(b, i + 1).toLong << 16) |
        (u8(b, i + 2).toLong << 8) | u8(b, i + 3).toLong

    val ifd = r32(4)
    if (ifd < 8 || ifd + 2 > b.length) return null
    val n = r16(ifd.toInt)
    if (n <= 0 || ifd + 2 + 12L * n > b.length) return null

    // entry value reader: SHORT(3)/LONG(4) arrays, inline when
    // count×size <= 4, else behind the 32-bit offset in the value
    // field (TIFF 6.0 §2). Returns null on any bound violation.
    def readArray(off: Int): Array[Long] = {
      val typ = r16(off + 2)
      val count = r32(off + 4)
      val size = typ match {
        case 3 => 2L
        case 4 => 4L
        case _ => return null
      }
      if (count <= 0 || count > 65536) return null
      val total = count * size
      val at =
        if (total <= 4) off + 8L
        else {
          val p = r32(off + 8)
          if (p < 8 || p + total > b.length) return null
          p
        }
      if (at + total > b.length) return null
      val out = new Array[Long](count.toInt)
      var i = 0
      while (i < count) {
        out(i) = if (size == 2) r16((at + 2 * i).toInt) else r32((at + 4 * i).toInt)
        i += 1
      }
      out
    }
    def readScalar(off: Int): Long = {
      val a = readArray(off)
      if (a == null || a.length != 1) -1L else a(0)
    }

    var w = -1L; var h = -1L
    var comp = 1L; var photo = -1L; var spp = 1L; var planar = 1L
    var rps = -1L // absent = one strip spanning the whole image
    var bps: Array[Long] = null
    var offsets: Array[Long] = null
    var counts: Array[Long] = null
    var e = 0
    while (e < n) {
      val off = ifd.toInt + 2 + 12 * e
      r16(off) match {
        case 256 => w = readScalar(off)
        case 257 => h = readScalar(off)
        case 258 => bps = readArray(off); if (bps == null) return null
        case 259 => comp = readScalar(off)
        case 262 => photo = readScalar(off)
        case 273 => offsets = readArray(off); if (offsets == null) return null
        case 277 => spp = readScalar(off)
        case 278 => rps = readScalar(off)
        case 279 => counts = readArray(off); if (counts == null) return null
        case 284 => planar = readScalar(off)
        case _ => // unknown tags are skipped (EXIF etc.)
      }
      e += 1
    }

    // the decode envelope: 8-bit chunky uncompressed gray or RGB
    if (w <= 0 || h <= 0 || w > Int.MaxValue || h > Int.MaxValue) return null
    if (comp != 1L || planar != 1L) return null
    if (photo == 1L) { if (spp != 1L) return null }
    else if (photo == 2L) { if (spp != 3L) return null }
    else return null
    // BitsPerSample defaults to 1 bit when absent — out of envelope
    if (bps == null || bps.length != spp || bps.exists(_ != 8L)) return null
    if (offsets == null || counts == null) return null
    if (rps == -1L) rps = h // default 2^32-1: all rows in one strip
    if (rps <= 0) return null
    val nStrips = ((h + rps - 1) / rps).toInt
    if (offsets.length != nStrips || counts.length != nStrips) return null

    val rowBytes = w * spp
    var (sr, sg, sb) = (0L, 0L, 0L)
    var s = 0
    while (s < nStrips) {
      val rows = math.min(rps, h - s.toLong * rps)
      val expect = rows * rowBytes
      if (counts(s) != expect) return null // strict: strips must tile exactly
      val at = offsets(s)
      if (at < 8 || at + expect > b.length) return null
      var i = at.toInt
      val end = (at + expect).toInt
      if (spp == 1L) {
        while (i < end) { sr += u8(b, i); i += 1 }
      } else {
        while (i < end) {
          sr += u8(b, i); sg += u8(b, i + 1); sb += u8(b, i + 2)
          i += 3
        }
      }
      s += 1
    }
    if (spp == 1L) { sg = sr; sb = sr } // gray replicates, like JPEG gray
    new GenericInternalRow(Array[Any](w.toInt, h.toInt, sr, sg, sb, w * h))
  }
}

/** `graft_tiff_encode(w, h, seed, mode, rows_per_strip)` → binary: a
  * valid baseline TIFF — mode 0 = little-endian RGB, 1 = big-endian
  * RGB, 2 = little-endian grayscale, 3 = big-endian grayscale; pixel
  * (x,y) channels come from the same seed arithmetic as
  * [[PngEncode]] (r=(s+3x+7y)%256, g=(2s+5x+y)%256, b=(3s+x+11y)%256;
  * gray=(s+5x+3y)%256) so the DuckDB oracle recomputes exact sums.
  * rows_per_strip < h forces a multi-strip layout with out-of-line
  * StripOffsets/StripByteCounts arrays, certifying the inline/
  * out-of-line value rule in the decoder. */
case class TiffEncode(children: Seq[Expression]) extends Expression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = {
    val expected = Seq(IntegerType, IntegerType, LongType, IntegerType, IntegerType)
    if (children.length == 5 && children.map(_.dataType) == expected)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_tiff_encode expects (int w, int h, long seed, int mode, int rowsPerStrip)")
  }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_tiff_encode"

  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.exists(_ == null)) null
    else TiffEncode.encode(vs(0).asInstanceOf[Int], vs(1).asInstanceOf[Int],
      vs(2).asInstanceOf[Long], vs(3).asInstanceOf[Int], vs(4).asInstanceOf[Int])
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TiffEncode = copy(children = newChildren)
}

object TiffEncode {

  def encode(w: Int, h: Int, seed: Long, mode: Int, rowsPerStrip: Int): Array[Byte] = {
    if (w <= 0 || w > 4096 || h <= 0 || h > 4096 || seed < 0) return null
    if (mode < 0 || mode > 3 || rowsPerStrip <= 0) return null
    val le = (mode & 1) == 0
    val gray = mode >= 2
    val spp = if (gray) 1 else 3
    val rps = math.min(rowsPerStrip, h)
    val nStrips = (h + rps - 1) / rps
    val rowBytes = w * spp
    val dataLen = rowBytes * h
    val pad = dataLen & 1 // keep later offsets word-aligned (spec rec.)

    val auxStart = 8 + dataLen + pad
    val bpsOff = auxStart // RGB: 3 SHORTs out-of-line (6 bytes)
    val bpsLen = if (gray) 0 else 6
    val soOff = bpsOff + bpsLen
    val soLen = if (nStrips > 1) nStrips * 4 else 0
    val scOff = soOff + soLen
    val scLen = soLen
    val ifdOff = scOff + scLen
    val nEntries = 10
    val total = ifdOff + 2 + nEntries * 12 + 4

    val b = new Array[Byte](total)
    var p = 0
    def w8(v: Int): Unit = { b(p) = v.toByte; p += 1 }
    def w16(v: Int): Unit =
      if (le) { w8(v & 0xFF); w8((v >> 8) & 0xFF) }
      else { w8((v >> 8) & 0xFF); w8(v & 0xFF) }
    def w32(v: Long): Unit =
      if (le) { w8((v & 0xFF).toInt); w8(((v >> 8) & 0xFF).toInt)
        w8(((v >> 16) & 0xFF).toInt); w8(((v >> 24) & 0xFF).toInt) }
      else { w8(((v >> 24) & 0xFF).toInt); w8(((v >> 16) & 0xFF).toInt)
        w8(((v >> 8) & 0xFF).toInt); w8((v & 0xFF).toInt) }

    // header
    if (le) { w8('I'); w8('I'); w8(42); w8(0) } else { w8('M'); w8('M'); w8(0); w8(42) }
    w32(ifdOff.toLong)

    // pixel data, rows top-down, chunky
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        if (gray) w8(((seed + 5L * x + 3L * y) % 256).toInt)
        else {
          w8(((seed + 3L * x + 7L * y) % 256).toInt)
          w8(((2L * seed + 5L * x + y) % 256).toInt)
          w8(((3L * seed + x + 11L * y) % 256).toInt)
        }
        x += 1
      }
      y += 1
    }
    if (pad == 1) w8(0)

    // out-of-line arrays
    if (!gray) { w16(8); w16(8); w16(8) }
    def stripOffset(i: Int): Long = 8L + i.toLong * rps * rowBytes
    def stripCount(i: Int): Long = math.min(rps.toLong, h - i.toLong * rps) * rowBytes
    if (nStrips > 1) {
      (0 until nStrips).foreach(i => w32(stripOffset(i)))
      (0 until nStrips).foreach(i => w32(stripCount(i)))
    }

    // IFD: entries in ascending tag order (spec requirement)
    w16(nEntries)
    def entry(tag: Int, typ: Int, count: Long)(value: => Unit): Unit = {
      w16(tag); w16(typ); w32(count)
      val before = p
      value
      while (p < before + 4) w8(0) // value field pads to 4 bytes
    }
    entry(256, 4, 1)(w32(w.toLong)) // ImageWidth
    entry(257, 4, 1)(w32(h.toLong)) // ImageLength
    if (gray) entry(258, 3, 1)(w16(8)) // BitsPerSample inline
    else entry(258, 3, 3)(w32(bpsOff.toLong)) // out-of-line 3 SHORTs
    entry(259, 3, 1)(w16(1)) // Compression = none
    entry(262, 3, 1)(w16(if (gray) 1 else 2)) // Photometric
    if (nStrips > 1) entry(273, 4, nStrips.toLong)(w32(soOff.toLong))
    else entry(273, 4, 1)(w32(stripOffset(0)))
    entry(277, 3, 1)(w16(spp)) // SamplesPerPixel
    entry(278, 4, 1)(w32(rps.toLong)) // RowsPerStrip
    if (nStrips > 1) entry(279, 4, nStrips.toLong)(w32(scOff.toLong))
    else entry(279, 4, 1)(w32(stripCount(0)))
    entry(284, 3, 1)(w16(1)) // PlanarConfiguration = chunky
    w32(0L) // next IFD: none
    b
  }
}
