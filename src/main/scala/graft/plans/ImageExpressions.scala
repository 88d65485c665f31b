package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_img_meta(binary)` → `struct<format: string, width: int,
  * height: int>`, NULL when the bytes are not a recognizable image —
  * real multimodal decode over an opaque media column, from the public
  * file-format specs alone:
  *
  *  - PNG (RFC 2083 / W3C spec): 8-byte signature, then the IHDR chunk
  *    is REQUIRED first — width and height are the two big-endian
  *    uint32s at fixed offsets 16 and 20;
  *  - JPEG (ITU T.81 / JFIF): an SOI marker then a SEGMENT STREAM —
  *    dimensions live in whichever SOFn frame header appears, so the
  *    parser must walk segments by their length fields (skipping APPn /
  *    DQT / DHT / COM and padding bytes), exactly what any real decoder
  *    front-end does. Handles standalone markers (RSTn/TEM) and rejects
  *    truncated or EOI-before-SOF streams.
  *
  * A pure per-row byte walk with no allocation beyond the result row:
  * runs inside whole-stage codegen via a static call, so header
  * extraction over a 100 TB media table is scan-speed. Together with
  * BmpStats (real pixel sums) and WavMeta (RIFF chunk walk) this is the
  * complete decoder set behind Multimodal.featureExtract's magic-byte
  * dispatch — no stubbed decode remains anywhere in the engine. */
case class ImageMeta(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_img_meta expects a binary column, got ${child.dataType.catalogString}")
  override def dataType: DataType = ImageMeta.schema
  override def nullable: Boolean = true
  override def prettyName: String = "graft_img_meta"

  override def nullSafeEval(input: Any): Any =
    ImageMeta.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => s"""
      ${ev.value} = graft.plans.ImageMeta.parse($b);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): ImageMeta =
    copy(child = newChild)
}

/** `graft_wav_meta(binary)` → `struct<channels: int, sample_rate: int,
  * bits: int>`, NULL when the bytes are not a parseable WAV — the audio
  * side of real multimodal decode, from the public RIFF/WAVE spec: a
  * 12-byte RIFF/WAVE header then a CHUNK LIST walked by little-endian
  * size fields (chunks are word-aligned, odd sizes carry a pad byte)
  * until the `fmt ` chunk yields channel count, sample rate, and bit
  * depth. Same execution shape as [[ImageMeta]]: static per-row byte
  * walk inside whole-stage codegen. */
case class WavMeta(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_wav_meta expects a binary column, got ${child.dataType.catalogString}")
  override def dataType: DataType = WavMeta.schema
  override def nullable: Boolean = true
  override def prettyName: String = "graft_wav_meta"

  override def nullSafeEval(input: Any): Any =
    WavMeta.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => s"""
      ${ev.value} = graft.plans.WavMeta.parse($b);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): WavMeta =
    copy(child = newChild)
}

object WavMeta {
  val schema: StructType = StructType(Seq(
    StructField("channels", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("bits", IntegerType)))

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    u8(b, i).toLong | (u8(b, i + 1).toLong << 8) | (u8(b, i + 2).toLong << 16) |
      (u8(b, i + 3).toLong << 24)
  private def tag(b: Array[Byte], i: Int, t: String): Boolean =
    (0 until 4).forall(j => u8(b, i + j) == t.charAt(j))

  def parse(b: Array[Byte]): InternalRow = {
    if (b.length < 12 || !tag(b, 0, "RIFF") || !tag(b, 8, "WAVE")) return null
    var i = 12L
    while (i + 8 <= b.length) {
      val ii = i.toInt
      val size = le32(b, ii + 4)
      if (tag(b, ii, "fmt ")) {
        if (size < 16 || i + 8 + 16 > b.length) return null
        val channels = le16(b, ii + 10)
        val rate = le32(b, ii + 12)
        val bits = le16(b, ii + 22)
        return if (channels <= 0 || rate <= 0 || rate > Int.MaxValue || bits <= 0) null
        else new GenericInternalRow(Array[Any](channels, rate.toInt, bits))
      }
      i += 8 + size + (size & 1) // word alignment: odd chunk sizes pad one byte
    }
    null
  }
}

/** `graft_bmp_stats(binary)` → `struct<width: int, height: int,
  * sum_r: long, sum_g: long, sum_b: long, n_pixels: long>`, NULL when
  * the bytes are not an uncompressed 8/24/32-bit BI_RGB BMP (8-bit =
  * palette of BGRA quads after the info header; 32-bit = BGRA rows,
  * alpha ignored) — REAL pixel decode,
  * not just header metadata: the one mainstream raster format whose
  * pixel data is decodable from the public spec alone (BITMAPFILEHEADER
  * + BITMAPINFOHEADER + raw BGR rows, each row padded to a 4-byte
  * boundary, bottom-up unless height is negative), so no codec library
  * is needed. Channel SUMS are returned (not float means) so downstream
  * aggregates — and the DuckDB oracle — stay integer-exact; a wrong
  * treatment of row padding or orientation changes the sums and fails
  * the round-trip. Per-row byte loop inside whole-stage codegen, same
  * execution shape as [[ImageMeta]]. */
case class BmpStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_bmp_stats expects a binary column, got ${child.dataType.catalogString}")
  override def dataType: DataType = BmpStats.schema
  override def nullable: Boolean = true
  override def prettyName: String = "graft_bmp_stats"

  override def nullSafeEval(input: Any): Any =
    BmpStats.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => s"""
      ${ev.value} = graft.plans.BmpStats.parse($b);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): BmpStats =
    copy(child = newChild)
}

object BmpStats {
  val schema: StructType = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("sum_r", LongType),
    StructField("sum_g", LongType),
    StructField("sum_b", LongType),
    StructField("n_pixels", LongType)))

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    u8(b, i).toLong | (u8(b, i + 1).toLong << 8) | (u8(b, i + 2).toLong << 16) |
      (u8(b, i + 3).toLong << 24)

  /** Validated BMP geometry shared by [[parse]] and [[BmpResize]]:
    * every field already bounds-proofed against the buffer. */
  private[plans] final case class Header(dataOffset: Int, w: Int, hRaw: Int,
      bits: Int, palette: Array[Byte], rowSize: Int)

  private[plans] def header(b: Array[Byte]): Header = {
    // 14-byte file header + 40-byte BITMAPINFOHEADER minimum
    if (b.length < 54 || u8(b, 0) != 'B' || u8(b, 1) != 'M') return null
    val dataOffset = le32(b, 10)
    if (le32(b, 14) < 40) return null // older core-header variants: out of scope
    val w = le32(b, 18).toInt
    val hRaw = le32(b, 22).toInt // negative = top-down; sums are orientation-invariant
    val h = math.abs(hRaw)
    if (w <= 0 || h <= 0 || le16(b, 26) != 1) return null
    val bits = le16(b, 28)
    // uncompressed BI_RGB at the mainstream depths: 8 (palette),
    // 24 (BGR), 32 (BGRA, alpha ignored)
    if ((bits != 8 && bits != 24 && bits != 32) || le32(b, 30) != 0L) return null
    // 8-bit: palette of biClrUsed (0 = 256) BGRA quads follows the
    // 40-byte info header
    val headerSize = le32(b, 14)
    var palette: Array[Byte] = null
    if (bits == 8) {
      val used = le32(b, 46)
      val n = if (used == 0L) 256 else if (used > 0 && used <= 256) used.toInt else return null
      val pOff = 14 + headerSize
      if (pOff + 4L * n > b.length || pOff > Int.MaxValue - 4 * n) return null
      palette = java.util.Arrays.copyOfRange(b, pOff.toInt, pOff.toInt + 4 * n)
    }
    // row size in LONG: a hostile header's width can overflow w*3+3 in
    // Int, flipping rowSize negative and bypassing the bounds check
    // (negative-index crash or silent zero sums). But rowSizeL * h can
    // itself overflow LONG for w,h both near 2^31 (~1.4e19 > 2^63-1),
    // wrapping negative and passing a `+ >` bound — so the bound is
    // phrased as a division, which cannot overflow: rowSizeL <=
    // (len - off) / h  <=>  off + rowSizeL * h <= len for integral
    // rowSizeL, h >= 1. Passing it caps every later Int product:
    // rowSizeL <= b.length < 2^31.
    val bytesPerPx = bits / 8
    val rowSizeL = ((w.toLong * bytesPerPx + 3) / 4) * 4 // rows pad to 4 bytes
    if (dataOffset < 54 || dataOffset > b.length) return null
    if (rowSizeL > (b.length - dataOffset) / h) return null
    Header(dataOffset.toInt, w, hRaw, bits, palette, rowSizeL.toInt)
  }

  def parse(b: Array[Byte]): InternalRow = {
    val hd = header(b)
    if (hd == null) return null
    val dataOffset = hd.dataOffset.toLong
    val w = hd.w
    val h = math.abs(hd.hRaw)
    val bits = hd.bits
    val palette = hd.palette
    val bytesPerPx = bits / 8
    val rowSize = hd.rowSize
    var (sr, sg, sb) = (0L, 0L, 0L)
    var row = 0
    while (row < h) {
      var i = dataOffset.toInt + row * rowSize
      if (bits == 8) {
        val nColors = palette.length / 4
        val end = i + w
        while (i < end) {
          val idx = u8(b, i)
          if (idx >= nColors) return null
          sb += u8(palette, 4 * idx); sg += u8(palette, 4 * idx + 1)
          sr += u8(palette, 4 * idx + 2) // quads stored B,G,R,reserved
          i += 1
        }
      } else {
        val end = i + w * bytesPerPx // pad bytes excluded
        while (i < end) {
          sb += u8(b, i); sg += u8(b, i + 1); sr += u8(b, i + 2) // stored B,G,R(,A)
          i += bytesPerPx
        }
      }
      row += 1
    }
    new GenericInternalRow(Array[Any](w, h, sr, sg, sb, w.toLong * h))
  }
}

/** `graft_bmp_resize(binary, w2, h2)` → the [[BmpStats]] stats struct
  * over the NEAREST-NEIGHBOR resize of an uncompressed 8/24/32-bit
  * BMP to w2 × h2 — the thumbnailing triage a curation pipeline runs
  * before paying storage for full rasters. Target pixel (x2, y2)
  * samples source (⌊x2·w/w2⌋, ⌊y2·h/h2⌋) in TOP-ORIGIN coordinates
  * (orientation matters here, unlike the whole-image sums: the stored
  * row is flipped for bottom-up files), up- and down-scaling alike.
  * Work is O(w2·h2) random reads — independent of the SOURCE size,
  * which is the point of triage-by-thumbnail. Shares [[BmpStats]]'s
  * overflow-proofed header validation; parse-or-NULL like every
  * decoder (fuzzed). */
case class BmpResize(first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType == BinaryType && second.dataType == IntegerType &&
        third.dataType == IntegerType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_bmp_resize expects (binary, int, int), got " +
        Seq(first, second, third).map(_.dataType.catalogString).mkString(", "))
  override def dataType: DataType = BmpStats.schema
  override def nullable: Boolean = true
  override def prettyName: String = "graft_bmp_resize"

  override def nullSafeEval(b: Any, w2: Any, h2: Any): Any =
    BmpResize.parse(b.asInstanceOf[Array[Byte]],
      w2.asInstanceOf[Int], h2.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, w2, h2) => s"""
      ${ev.value} = graft.plans.BmpResize.parse($b, $w2, $h2);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): BmpResize =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object BmpResize {
  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF

  def parse(b: Array[Byte], w2: Int, h2: Int): InternalRow = {
    if (w2 <= 0 || h2 <= 0 || w2 > 4096 || h2 > 4096) return null
    val hd = BmpStats.header(b)
    if (hd == null) return null
    val h = math.abs(hd.hRaw)
    val bytesPerPx = hd.bits / 8
    val nColors = if (hd.palette == null) 0 else hd.palette.length / 4
    var (sr, sg, sb) = (0L, 0L, 0L)
    var y2 = 0
    while (y2 < h2) {
      // top-origin source row, then the stored row for this orientation
      val sy = (y2.toLong * h / h2).toInt
      val row = if (hd.hRaw > 0) h - 1 - sy else sy
      val base = hd.dataOffset + row * hd.rowSize
      var x2 = 0
      while (x2 < w2) {
        val sx = (x2.toLong * hd.w / w2).toInt
        if (hd.bits == 8) {
          val idx = u8(b, base + sx)
          if (idx >= nColors) return null
          sb += u8(hd.palette, 4 * idx); sg += u8(hd.palette, 4 * idx + 1)
          sr += u8(hd.palette, 4 * idx + 2)
        } else {
          val i = base + sx * bytesPerPx
          sb += u8(b, i); sg += u8(b, i + 1); sr += u8(b, i + 2)
        }
        x2 += 1
      }
      y2 += 1
    }
    new GenericInternalRow(Array[Any](w2, h2, sr, sg, sb, w2.toLong * h2))
  }
}

object ImageMeta {
  val schema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType)))

  private val PngSig: Array[Int] = Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)

  /** Null iff the bytes are not a parseable PNG/JPEG/WebP/TIFF
    * header. Called from generated code (static, no captures). */
  def parse(b: Array[Byte]): InternalRow = {
    val png = parsePng(b)
    if (png != null) return png
    val webp = parseWebp(b)
    if (webp != null) return webp
    val tiff = parseTiff(b)
    if (tiff != null) tiff else parseJpeg(b)
  }

  /** TIFF triage (the EXIF substrate): "II*\0" little- or "MM\0*"
    * big-endian header, 32-bit offset to IFD0, then the entry walk for
    * ImageWidth (256) and ImageLength (257) — each a SHORT or LONG
    * scalar stored inline in the 4-byte value field. Entry count is
    * bounds-checked so a hostile header cannot walk past the buffer;
    * both tags must resolve or the parse is null. */
  private def parseTiff(b: Array[Byte]): InternalRow = {
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
    var w = -1L; var h = -1L
    var e = 0
    while (e < n) {
      val off = ifd.toInt + 2 + 12 * e
      val tag = r16(off)
      if (tag == 256 || tag == 257) {
        val typ = r16(off + 2)
        val count = r32(off + 4)
        if (count != 1L) return null // dimension tags are scalars
        val v = typ match {
          case 3 => r16(off + 8).toLong // SHORT rides the value field's start
          case 4 => r32(off + 8)        // LONG fills it
          case _ => return null
        }
        if (tag == 256) w = v else h = v
      }
      e += 1
    }
    if (w <= 0 || h <= 0) return null
    row("tiff", w, h)
  }

  /** WebP triage (RIFF....WEBP): all three container flavors —
    * "VP8 " lossy (start code 9D 01 2A, 14-bit LE dims), "VP8L"
    * lossless (0x2F signature, width-1/height-1 packed 14+14 bits
    * LE), "VP8X" extended (24-bit LE canvas dims minus one). Header
    * fields only — the VP8 entropy-coded payload is a full video
    * codec, which is exactly what the triage pass exists to avoid
    * paying per row. */
  private def parseWebp(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 25) return null
    def le16(i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
    def le24(i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16)
    def le32(i: Int): Long = le24(i).toLong | (u8(b, i + 3).toLong << 24)
    if (u8(b, 0) != 'R' || u8(b, 1) != 'I' || u8(b, 2) != 'F' || u8(b, 3) != 'F' ||
        u8(b, 8) != 'W' || u8(b, 9) != 'E' || u8(b, 10) != 'B' || u8(b, 11) != 'P')
      return null
    val tag = new String(Array(b(12), b(13), b(14), b(15)), "US-ASCII")
    tag match {
      case "VP8 " =>
        // 3-byte frame tag, then the start code, then 14-bit dims
        if (b.length < 30) return null
        if (u8(b, 23) != 0x9D || u8(b, 24) != 0x01 || u8(b, 25) != 0x2A) return null
        row("webp", le16(26) & 0x3FFF, le16(28) & 0x3FFF)
      case "VP8L" =>
        if (u8(b, 20) != 0x2F) return null
        val bits = le32(21)
        row("webp", (bits & 0x3FFF) + 1, ((bits >> 14) & 0x3FFF) + 1)
      case "VP8X" =>
        if (b.length < 30) return null
        row("webp", le24(24) + 1, le24(27) + 1)
      case _ => null
    }
  }

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)

  private def row(fmt: String, w: Long, h: Long): InternalRow =
    if (w <= 0 || h <= 0 || w > Int.MaxValue || h > Int.MaxValue) null
    else new GenericInternalRow(Array[Any](UTF8String.fromString(fmt), w.toInt, h.toInt))

  private def parsePng(b: Array[Byte]): InternalRow = {
    // signature + IHDR length (13) + "IHDR" + width + height = 24 bytes
    if (b.length < 24) return null
    var i = 0
    while (i < 8) { if (u8(b, i) != PngSig(i)) return null; i += 1 }
    // IHDR must be the first chunk (spec §5.6); its 4-byte length is 13
    if (be32(b, 8) != 13L) return null
    if (u8(b, 12) != 'I' || u8(b, 13) != 'H' || u8(b, 14) != 'D' || u8(b, 15) != 'R') return null
    row("png", be32(b, 16), be32(b, 20))
  }

  private def parseJpeg(b: Array[Byte]): InternalRow = {
    if (b.length < 4 || u8(b, 0) != 0xFF || u8(b, 1) != 0xD8) return null // SOI
    var i = 2
    while (i + 1 < b.length) {
      if (u8(b, i) != 0xFF) return null // marker misalignment: corrupt
      var m = u8(b, i + 1)
      // fill bytes: any number of 0xFF may pad before a marker (T.81 B.1.1.2)
      while (m == 0xFF && i + 2 < b.length) { i += 1; m = u8(b, i + 1) }
      m match {
        case 0xD8 | 0x01 => i += 2 // SOI again / TEM: standalone
        case r if r >= 0xD0 && r <= 0xD7 => i += 2 // RSTn: standalone
        case 0xD9 => return null // EOI before any SOF: no dimensions
        case sof if sof >= 0xC0 && sof <= 0xCF && sof != 0xC4 && sof != 0xC8 && sof != 0xCC =>
          // SOFn frame header: len(2) precision(1) height(2) width(2)
          // Nf(1) + 3 bytes/component. The DECLARED length must cover
          // the fixed fields plus >= 1 component (T.81 minimum 11) —
          // otherwise the dimension bytes belong to the next segment
          // and a real decoder rejects the stream.
          if (i + 8 >= b.length) return null
          if (be16(b, i + 2) < 11) return null
          return row("jpeg", be16(b, i + 7).toLong, be16(b, i + 5).toLong)
        case _ =>
          // every other segment (APPn, DQT, DHT, COM, ...) carries its
          // own big-endian length INCLUDING the length field — skip it
          if (i + 3 >= b.length) return null
          val segLen = be16(b, i + 2)
          if (segLen < 2) return null
          i += 2 + segLen
      }
    }
    null
  }
}

/** `graft_gif_meta(binary)` → `struct<version: string, width: int,
  * height: int>`, NULL when the bytes are not a parseable GIF — the
  * fifth codec of the decode family, from the public GIF87a/GIF89a
  * spec: a 6-byte signature+version, then the Logical Screen
  * Descriptor carries canvas width and height as little-endian uint16
  * at fixed offsets 6 and 8 (header + LSD = 13 bytes minimum). Same
  * execution shape as [[ImageMeta]]: a static per-row byte walk inside
  * whole-stage codegen, total over hostile bytes (parse or NULL,
  * never throw). */
case class GifMeta(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_gif_meta expects a binary column, got ${child.dataType.catalogString}")
  override def dataType: DataType = GifMeta.schema
  override def nullable: Boolean = true
  override def prettyName: String = "graft_gif_meta"

  override def nullSafeEval(input: Any): Any =
    GifMeta.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => s"""
      ${ev.value} = graft.plans.GifMeta.parse($b);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): GifMeta =
    copy(child = newChild)
}

object GifMeta {
  val schema: StructType = StructType(Seq(
    StructField("version", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType)))

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)

  def parse(b: Array[Byte]): InternalRow = {
    // signature "GIF" + version "87a" | "89a", then the LSD: the
    // header+LSD minimum is 13 bytes (spec §17-18)
    if (b.length < 13) return null
    if (u8(b, 0) != 'G' || u8(b, 1) != 'I' || u8(b, 2) != 'F' ||
        u8(b, 3) != '8' || u8(b, 5) != 'a') return null
    val v = u8(b, 4)
    if (v != '7' && v != '9') return null
    val w = le16(b, 6)
    val h = le16(b, 8)
    if (w <= 0 || h <= 0) return null
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(if (v == '7') "87a" else "89a"), w, h))
  }
}
