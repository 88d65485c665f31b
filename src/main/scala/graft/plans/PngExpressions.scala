package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, QuaternaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.QuaternaryLike
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, IntegerType, LongType, StructField, StructType}

/** `graft_png_stats(binary)` → `struct<width: int, height: int,
  * sum_r: long, sum_g: long, sum_b: long, n_pixels: long>`, NULL when
  * the bytes are not a decodable PNG — COMPRESSED pixel decode, the
  * step past [[BmpStats]]'s raw BGR rows: the full PNG data path from
  * the public spec (W3C PNG / RFC 2083) with zero new dependencies,
  * java.util.zip.Inflater being part of the JDK.
  *
  *  - chunk walk: 8-byte signature, IHDR required first, every IDAT's
  *    payload concatenated IN ORDER (the spec allows any split of the
  *    compressed stream across IDAT chunks), ancillary chunks skipped
  *    by their length fields, IEND terminates;
  *  - zlib inflate of the joined IDAT stream (wrapper + Adler-32
  *    verified by Inflater; a corrupt stream raises
  *    DataFormatException → NULL). Chunk CRC32s are NOT verified —
  *    the checksum of record here is the zlib Adler over the actual
  *    pixel data, and skipping CRCs is a standard fast-decoder option
  *    (libpng's PNG_CRC_QUIET_USE);
  *  - per-scanline unfiltering: each row carries a filter-type byte
  *    (None/Sub/Up/Average/Paeth) predicting from the RECONSTRUCTED
  *    left/up/up-left neighbors at the pixel's byte depth — exactly
  *    the spec's filter algebra, so one wrong neighbor offset changes
  *    every downstream sum and fails the round-trip oracle.
  *
  * Scope: bit depth 8, color types 0 (gray: the value feeds all three
  * sums), 2 (RGB) and 6 (RGBA: alpha decoded but not summed), no
  * interlace, Adam7 interlace (each pass is its own filtered
  * sub-image; the statistics are position-invariant, so passes decode
  * and sum without re-positioning), AND PALETTE images (colorType 3
  * at packed depths 1/2/4/8 — the icon/screenshot shapes; byte-level
  * filtering, MSB-first index unpack, per-index bounds check) —
  * everything else is NULL, never a
  * throw (fuzzed with hostile IDAT/filter bytes in ParserFuzzSpec).
  * Decoded size is bounded (`MaxRawBytes`) so a hostile header cannot
  * balloon executor memory: a 100 TB scan must survive any row.
  * Channel SUMS (not means) keep the DuckDB oracle integer-exact, the
  * same discipline as [[BmpStats]]. */
case class PngStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_png_stats expects a binary column, got ${child.dataType.catalogString}")
  override def dataType: DataType = PngStats.schema
  override def nullable: Boolean = true
  override def prettyName: String = "graft_png_stats"

  override def nullSafeEval(input: Any): Any =
    PngStats.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => s"""
      ${ev.value} = graft.plans.PngStats.parse($b);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): PngStats =
    copy(child = newChild)
}

object PngStats {
  val schema: StructType = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("sum_r", LongType),
    StructField("sum_g", LongType),
    StructField("sum_b", LongType),
    StructField("n_pixels", LongType)))

  /** Decoded (filter bytes + pixels) ceiling: 64 MiB. A header
    * claiming more is rejected before any allocation — the per-row
    * memory bound a corpus-scale scan needs against hostile headers. */
  val MaxRawBytes: Long = 64L * 1024 * 1024

  private[plans] val Sig: Array[Int] = Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF
  private def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def tag(b: Array[Byte], i: Int, t: String): Boolean =
    u8(b, i) == t.charAt(0) && u8(b, i + 1) == t.charAt(1) &&
      u8(b, i + 2) == t.charAt(2) && u8(b, i + 3) == t.charAt(3)

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Null iff the bytes are not a decodable in-scope PNG. Called from
    * generated code (static, no captures); total over hostile bytes. */
  def parse(b: Array[Byte]): InternalRow = try {
    // signature + IHDR(25) + shortest IDAT(12) + IEND(12)
    if (b == null || b.length < 57) return null
    var i = 0
    while (i < 8) { if (u8(b, i) != Sig(i)) return null; i += 1 }
    var w = 0; var h = 0; var colorType = -1; var interlace = 0
    var depth = 8
    var plte: Array[Byte] = null
    var seenIhdr = false; var seenIend = false
    val idat = new java.io.ByteArrayOutputStream()
    while (i + 12 <= b.length && !seenIend) {
      val len = be32(b, i)
      // data + 4-byte type + 4-byte CRC must lie inside the buffer
      if (len < 0 || len > b.length - i - 12) return null
      val n = len.toInt
      if (!seenIhdr) {
        // IHDR is REQUIRED first (spec §5.6)
        if (!tag(b, i + 4, "IHDR") || n != 13) return null
        val wl = be32(b, i + 8); val hl = be32(b, i + 12)
        if (wl <= 0 || hl <= 0 || wl > Int.MaxValue || hl > Int.MaxValue) return null
        w = wl.toInt; h = hl.toInt
        colorType = u8(b, i + 17)
        depth = u8(b, i + 16)
        // truecolor/gray at depth 8 or 16; PALETTE (3) at the packed
        // depths 1/2/4/8 — the icon/screenshot shapes
        val depthOk =
          if (colorType == 3) depth == 1 || depth == 2 || depth == 4 || depth == 8
          else depth == 8 || depth == 16
        if (!depthOk) return null
        if (colorType != 0 && colorType != 2 && colorType != 3 && colorType != 6)
          return null
        if (u8(b, i + 18) != 0 || u8(b, i + 19) != 0) return null // compression/filter 0
        interlace = u8(b, i + 20)
        if (interlace != 0 && interlace != 1) return null
        seenIhdr = true
      } else if (tag(b, i + 4, "PLTE")) {
        if (n % 3 != 0 || n == 0 || n > 3 * 256 || idat.size() > 0) return null
        plte = java.util.Arrays.copyOfRange(b, i + 8, i + 8 + n)
      } else if (tag(b, i + 4, "IDAT")) {
        idat.write(b, i + 8, n)
      } else if (tag(b, i + 4, "IEND")) {
        seenIend = true
      } // ancillary chunks (tEXt, pHYs, ...) skipped by their lengths
      i += 12 + n
    }
    if (!seenIhdr || !seenIend || idat.size() == 0) return null
    if (colorType == 3 && plte == null) return null // palette image needs PLTE
    val sums = decodeImage(idat.toByteArray, w, h, colorType, depth,
      interlace, plte)
    if (sums == null) return null
    new GenericInternalRow(Array[Any](w, h, sums(0), sums(1), sums(2), w.toLong * h))
  } catch { case scala.util.control.NonFatal(_) => null }

  /** One complete zlib-compressed image (or APNG frame) of `w` x `h`
    * under the declared color layout: inflate, per-pass unfilter, sum.
    * Null on any malformation. Shared by [[parse]] and the APNG
    * frame decoder. */
  private[plans] def decodeImage(idatBytes: Array[Byte], w: Int, h: Int,
      colorType: Int, depth: Int, interlace: Int,
      plte: Array[Byte]): Array[Long] = try {
    val channels = colorType match { case 0 => 1; case 2 => 3; case 3 => 1; case _ => 4 }
    // filter "bpp" is BYTES per pixel (the spec's byte-level
    // predictors): 2x at depth 16, 1 for packed palette rows
    val bpp = if (colorType == 3) 1 else channels * (depth / 8)
    // a row's byte width: packed indices for palette depths < 8,
    // bpp bytes per pixel otherwise
    def rowBytes(wp: Int): Long =
      if (colorType == 3) (wp.toLong * depth + 7) / 8 else wp.toLong * bpp
    // the stream is a sequence of independently-filtered sub-images:
    // ONE pass covering the image, or the seven Adam7 passes (each
    // pass's virtual row above row 0 is zero, like a fresh image) —
    // since every statistic here is position-invariant, the passes
    // only need decoding and summing, never re-positioning
    val passes: Array[(Int, Int)] =
      if (interlace == 0) Array((w, h)) else adam7Passes(w, h)
    val rawLen = passes.map { case (wp, hp) =>
      if (wp == 0 || hp == 0) 0L else hp.toLong * (rowBytes(wp) + 1) }.sum
    if (rowBytes(w) + 1 > Int.MaxValue || rawLen > MaxRawBytes || rawLen == 0) return null
    val raw = new Array[Byte](rawLen.toInt)
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(idatBytes)
      var got = 0
      var stalled = false
      while (got < raw.length && !inf.finished() && !stalled) {
        val k = inf.inflate(raw, got, raw.length - got)
        if (k == 0 && (inf.needsInput() || inf.needsDictionary())) stalled = true
        got += k
      }
      if (got < raw.length) return null // truncated pixel stream
      if (!inf.finished()) {
        // stream must END here: trailing pixel data means the header
        // lied about the geometry — drain one byte to prove it's over
        val scratch = new Array[Byte](1)
        if (inf.inflate(scratch, 0, 1) != 0 || !inf.finished()) return null
      }
    } finally inf.end()
    // unfilter + sum each pass independently (predictors read the
    // RECONSTRUCTED bytes; the row above a pass's first row is zero)
    val sums = new Array[Long](3)
    var off = 0
    var pi = 0
    while (pi < passes.length) {
      val (wp, hp) = passes(pi)
      if (wp > 0 && hp > 0) {
        if (!unfilterAndSum(raw, off, wp, hp, bpp, rowBytes(wp).toInt,
          depth, channels, if (colorType == 3) plte else null, sums)) return null
        off += hp * (rowBytes(wp).toInt + 1)
      }
      pi += 1
    }
    sums
  } catch { case scala.util.control.NonFatal(_) => null }

  /** Adam7 pass dimensions for a w x h image (PNG spec §8.2):
    * pass p samples x in xStart(p) + k*xStep(p), y likewise. */
  private[plans] val Adam7XStart = Array(0, 4, 0, 2, 0, 1, 0)
  private[plans] val Adam7YStart = Array(0, 0, 4, 0, 2, 0, 1)
  private[plans] val Adam7XStep = Array(8, 8, 4, 4, 2, 2, 1)
  private[plans] val Adam7YStep = Array(8, 8, 8, 4, 4, 2, 2)

  private[plans] def adam7Passes(w: Int, h: Int): Array[(Int, Int)] =
    Array.tabulate(7) { p =>
      val wp = if (w > Adam7XStart(p)) (w - Adam7XStart(p) + Adam7XStep(p) - 1) / Adam7XStep(p) else 0
      val hp = if (h > Adam7YStart(p)) (h - Adam7YStart(p) + Adam7YStep(p) - 1) / Adam7YStep(p) else 0
      (wp, hp)
    }

  /** One filtered sub-image starting at `off` in `raw`: unfilter in
    * place, accumulate channel sums. With `palette`, bytes are packed
    * indices at `depth` bits MSB-first (the colorType-3 layout);
    * filtering is byte-level with bpp=1, the sum unpacks per pixel and
    * bounds-checks every index. False on an invalid filter byte or an
    * index past the palette. */
  private def unfilterAndSum(raw: Array[Byte], off: Int, wp: Int, hp: Int,
      bpp: Int, strideI: Int, depth: Int, channels: Int,
      palette: Array[Byte], sums: Array[Long]): Boolean = {
    var y = 0
    while (y < hp) {
      val rowOff = off + y * (strideI + 1)
      val ft = u8(raw, rowOff)
      if (ft > 4) return false
      val cur = rowOff + 1
      val prv = cur - (strideI + 1)
      var j = 0
      while (j < strideI) {
        val a = if (j >= bpp) u8(raw, cur + j - bpp) else 0
        val up = if (y > 0) u8(raw, prv + j) else 0
        val ul = if (y > 0 && j >= bpp) u8(raw, prv + j - bpp) else 0
        val pred = ft match {
          case 0 => 0
          case 1 => a
          case 2 => up
          case 3 => (a + up) >> 1
          case _ => paeth(a, up, ul)
        }
        raw(cur + j) = ((u8(raw, cur + j) + pred) & 0xFF).toByte
        j += 1
      }
      y += 1
    }
    y = 0
    if (palette != null) {
      val nColors = palette.length / 3
      while (y < hp) {
        val rowOff = off + y * (strideI + 1) + 1
        var x = 0
        while (x < wp) {
          val bitPos = x * depth
          val byteV = u8(raw, rowOff + (bitPos >> 3))
          val shift = 8 - depth - (bitPos & 7)
          val idx = (byteV >> shift) & ((1 << depth) - 1)
          if (idx >= nColors) return false
          sums(0) += u8(palette, 3 * idx)
          sums(1) += u8(palette, 3 * idx + 1)
          sums(2) += u8(palette, 3 * idx + 2)
          x += 1
        }
        y += 1
      }
    } else while (y < hp) {
      var j = off + y * (strideI + 1) + 1
      val end = j + strideI
      if (depth == 16) {
        // big-endian 16-bit samples: the 8-bit projection is the HIGH
        // byte (the spec's recommended fast scaling), so sums stay
        // comparable with the 8-bit rendering of the same image
        if (channels == 1) {
          while (j < end) { val v = u8(raw, j); sums(0) += v; sums(1) += v; sums(2) += v; j += 2 }
        } else {
          while (j < end) {
            sums(0) += u8(raw, j); sums(1) += u8(raw, j + 2); sums(2) += u8(raw, j + 4)
            j += bpp
          }
        }
      } else if (bpp == 1) {
        while (j < end) { val v = u8(raw, j); sums(0) += v; sums(1) += v; sums(2) += v; j += 1 }
      } else {
        while (j < end) {
          sums(0) += u8(raw, j); sums(1) += u8(raw, j + 1); sums(2) += u8(raw, j + 2)
          j += bpp
        }
      }
      y += 1
    }
    true
  }
}

/** `graft_png_frames(binary)` → `array<struct<frame_idx, left, top,
  * width, height, sum_r, sum_g, sum_b, n_pixels>>`, NULL when the
  * bytes are not a decodable PNG — the ANIMATION (APNG, PNG third
  * edition §4.5) upgrade of [[PngStats]] and the raster twin of
  * [[GifFrames]]: acTL declares the animation, each fcTL opens a
  * frame region, frame 0 rides IDAT when its fcTL precedes it, and
  * every later frame's fdAT chunks (4-byte sequence prefix stripped)
  * concatenate into that frame's own complete zlib stream, decoded
  * independently with the shared [[PngStats.decodeImage]] machinery
  * (same color layout and interlace method as the static image).
  * A plain non-animated PNG returns its single image as frame 0, so
  * one expression serves mixed corpora. Disposal/blend are
  * presentation concerns a stats pass does not composite. Frame
  * count capped; per-frame pixels capped by the raw-bytes ceiling.
  * NULL-never-throw, fuzzed. */
case class PngFrames(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_png_frames expects a binary column, got ${child.dataType.catalogString}")
  override def dataType: DataType = PngFrames.schema
  override def nullable: Boolean = true
  override def prettyName: String = "graft_png_frames"

  override def nullSafeEval(input: Any): Any =
    PngFrames.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => s"""
      ${ev.value} = graft.plans.PngFrames.parse($b);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): PngFrames =
    copy(child = newChild)
}

object PngFrames {
  val frameSchema: StructType = StructType(Seq(
    StructField("frame_idx", IntegerType),
    StructField("left", IntegerType),
    StructField("top", IntegerType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("sum_r", LongType),
    StructField("sum_g", LongType),
    StructField("sum_b", LongType),
    StructField("n_pixels", LongType)))
  val schema: DataType =
    org.apache.spark.sql.types.ArrayType(frameSchema, containsNull = false)

  /** Hostile-stream ceiling, like [[GifFrames.MaxFrames]]. */
  val MaxFrames = 64

  def parse(b: Array[Byte]): Any = try {
    if (b == null || b.length < 57) return null
    var i = 0
    while (i < 8) { if ((b(i) & 0xFF) != PngStats.Sig(i)) return null; i += 1 }
    var w = 0; var h = 0; var colorType = -1; var interlace = 0
    var depth = 8
    var plte: Array[Byte] = null
    var seenIhdr = false; var seenIend = false
    var animated = false
    val idat = new java.io.ByteArrayOutputStream()
    // per-frame accumulation: (left, top, fw, fh, data)
    final case class Fc(left: Int, top: Int, fw: Int, fh: Int,
      data: java.io.ByteArrayOutputStream)
    val frames = scala.collection.mutable.ArrayBuffer.empty[Fc]
    var idatIsFrame = false
    def u8i(i: Int): Int = b(i) & 0xFF
    def be32i(i: Int): Long =
      (u8i(i).toLong << 24) | (u8i(i + 1) << 16) | (u8i(i + 2) << 8) | u8i(i + 3)
    def tagIs(i: Int, t: String): Boolean =
      u8i(i) == t.charAt(0) && u8i(i + 1) == t.charAt(1) &&
        u8i(i + 2) == t.charAt(2) && u8i(i + 3) == t.charAt(3)
    while (i + 12 <= b.length && !seenIend) {
      val len = be32i(i)
      if (len < 0 || len > b.length - i - 12) return null
      val n = len.toInt
      if (!seenIhdr) {
        if (!tagIs(i + 4, "IHDR") || n != 13) return null
        val wl = be32i(i + 8); val hl = be32i(i + 12)
        if (wl <= 0 || hl <= 0 || wl > Int.MaxValue || hl > Int.MaxValue) return null
        w = wl.toInt; h = hl.toInt
        depth = u8i(i + 16); colorType = u8i(i + 17)
        val depthOk =
          if (colorType == 3) depth == 1 || depth == 2 || depth == 4 || depth == 8
          else depth == 8 || depth == 16
        if (!depthOk) return null
        if (colorType != 0 && colorType != 2 && colorType != 3 && colorType != 6)
          return null
        if (u8i(i + 18) != 0 || u8i(i + 19) != 0) return null
        interlace = u8i(i + 20)
        if (interlace != 0 && interlace != 1) return null
        seenIhdr = true
      } else if (tagIs(i + 4, "PLTE")) {
        if (n % 3 != 0 || n == 0 || n > 3 * 256 || idat.size() > 0) return null
        plte = java.util.Arrays.copyOfRange(b, i + 8, i + 8 + n)
      } else if (tagIs(i + 4, "acTL")) {
        if (n != 8) return null
        animated = true
      } else if (tagIs(i + 4, "fcTL")) {
        if (n != 26) return null
        val fw = be32i(i + 12); val fh = be32i(i + 16)
        val fx = be32i(i + 20); val fy = be32i(i + 24)
        if (fw <= 0 || fh <= 0 || fx < 0 || fy < 0 ||
          fx + fw > w || fy + fh > h) return null
        if (frames.length < MaxFrames)
          frames += Fc(fx.toInt, fy.toInt, fw.toInt, fh.toInt,
            new java.io.ByteArrayOutputStream())
        if (idat.size() == 0 && frames.length == 1) idatIsFrame = true
      } else if (tagIs(i + 4, "IDAT")) {
        idat.write(b, i + 8, n)
      } else if (tagIs(i + 4, "fdAT")) {
        if (n < 4 || frames.isEmpty) return null
        // 4-byte sequence number stripped; payload joins the LAST
        // opened frame's stream
        frames.last.data.write(b, i + 12, n - 4)
      } else if (tagIs(i + 4, "IEND")) {
        seenIend = true
      }
      i += 12 + n
    }
    if (!seenIhdr || !seenIend || idat.size() == 0) return null
    if (colorType == 3 && plte == null) return null
    // route IDAT into frame 0 when its fcTL preceded it
    val effective: Seq[(Int, Int, Int, Int, Array[Byte])] =
      if (!animated || frames.isEmpty)
        Seq((0, 0, w, h, idat.toByteArray)) // plain PNG = one frame
      else {
        val head =
          if (idatIsFrame) Seq((frames.head.left, frames.head.top,
            frames.head.fw, frames.head.fh, idat.toByteArray))
          else Seq.empty // default image outside the animation
        head ++ frames.drop(if (idatIsFrame) 1 else 0).map(f =>
          (f.left, f.top, f.fw, f.fh, f.data.toByteArray))
      }
    if (effective.isEmpty) return null
    val rows = effective.zipWithIndex.map { case ((l, t, fw, fh, data), fi) =>
      if (data.isEmpty) return null
      val sums = PngStats.decodeImage(data, fw, fh, colorType, depth,
        interlace, plte)
      if (sums == null) return null
      new GenericInternalRow(Array[Any](
        fi, l, t, fw, fh, sums(0), sums(1), sums(2), fw.toLong * fh))
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(rows.toArray[Any])
  } catch { case scala.util.control.NonFatal(_) => null }
}

/** `graft_png_encode(width, height, seed, alpha)` → binary: a fully
  * valid PNG (real Deflater compression, per-chunk CRC32, zlib
  * Adler-32) whose pixel (x, y) carries the DETERMINISTIC channel
  * values
  *
  *   R = (seed + 3x + 7y) mod 256
  *   G = (2·seed + 5x + y) mod 256
  *   B = (3·seed + x + 11y) mod 256      (+ A = (x + y) mod 256)
  *
  * so a DuckDB oracle recomputes the exact expected channel sums from
  * the same arithmetic — the fixture side of the construct → store →
  * scan → decode round trip (see Multimodal). Scanline y is written
  * with filter type y mod 5, so every PNG taller than 4 rows forces
  * the decoder through ALL FIVE filters, and the compressed stream is
  * split across TWO IDAT chunks so concatenation is certified too.
  * This is the one synthesis expression that builds bytes in JVM code
  * rather than SQL concat: a real zlib stream (dynamic Huffman +
  * Adler) is not expressible as column algebra, and the whole point
  * here is decoding REAL compression. */
case class PngEncode(first: Expression, second: Expression,
    third: Expression, fourth: Expression)
    extends QuaternaryExpression with QuaternaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType, fourth.dataType) match {
      case (IntegerType, IntegerType, LongType, BooleanType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_png_encode expects (int, int, bigint, boolean), got $other")
    }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_png_encode"

  override def nullSafeEval(w: Any, h: Any, seed: Any, alpha: Any): Any =
    PngEncode.encode(w.asInstanceOf[Int], h.asInstanceOf[Int],
      seed.asInstanceOf[Long], alpha.asInstanceOf[Boolean])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (w, h, s, a) => s"""
      ${ev.value} = graft.plans.PngEncode.encode($w, $h, $s, $a);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression, q: Expression): PngEncode = copy(f, s, t, q)
}

object PngEncode {

  private def mod256(v: Long): Int = java.lang.Math.floorMod(v, 256L).toInt

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Null on non-positive / oversized dims (fixture bound 1M pixels);
    * otherwise a valid PNG per the formula above. Static: called from
    * generated code. */
  def encode(w: Int, h: Int, seed: Long, alpha: Boolean): Array[Byte] = {
    if (w <= 0 || h <= 0 || w.toLong * h > (1L << 20)) return null
    val bpp = if (alpha) 4 else 3
    val stride = w * bpp
    val raw = new Array[Byte](h * (stride + 1))
    val cur = new Array[Int](stride)
    val prev = new Array[Int](stride) // zeros: the spec's virtual row above row 0
    var y = 0; var o = 0
    while (y < h) {
      var x = 0; var j = 0
      while (x < w) {
        cur(j) = mod256(seed + 3L * x + 7L * y)
        cur(j + 1) = mod256(2L * seed + 5L * x + y)
        cur(j + 2) = mod256(3L * seed + x + 11L * y)
        if (alpha) cur(j + 3) = (x + y) % 256
        x += 1; j += bpp
      }
      val ft = y % 5
      raw(o) = ft.toByte; o += 1
      var i = 0
      while (i < stride) {
        val a = if (i >= bpp) cur(i - bpp) else 0
        val b = prev(i)
        val c = if (i >= bpp) prev(i - bpp) else 0
        val f = ft match {
          case 0 => cur(i)
          case 1 => (cur(i) - a) & 0xFF
          case 2 => (cur(i) - b) & 0xFF
          case 3 => (cur(i) - ((a + b) >> 1)) & 0xFF
          case _ => (cur(i) - paeth(a, b, c)) & 0xFF
        }
        raw(o) = f.toByte; o += 1; i += 1
      }
      System.arraycopy(cur, 0, prev, 0, stride)
      y += 1
    }
    // zlib-compress (wrapper + Adler-32 come with the default Deflater)
    val defl = new java.util.zip.Deflater()
    val comp = try {
      defl.setInput(raw); defl.finish()
      val out = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
      val buf = new Array[Byte](8192)
      while (!defl.finished()) out.write(buf, 0, defl.deflate(buf))
      out.toByteArray
    } finally defl.end()
    val png = new java.io.ByteArrayOutputStream(comp.length + 128)
    png.write(Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte), 0, 8)
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(h)
      .put(8.toByte).put((if (alpha) 6 else 2).toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte).array()
    writeChunk(png, "IHDR", ihdr, 0, ihdr.length)
    // split the stream across two IDATs: any split is legal (spec
    // §5.6) and forces the decoder to concatenate
    val half = comp.length / 2
    if (half > 0) {
      writeChunk(png, "IDAT", comp, 0, half)
      writeChunk(png, "IDAT", comp, half, comp.length - half)
    } else writeChunk(png, "IDAT", comp, 0, comp.length)
    writeChunk(png, "IEND", Array.emptyByteArray, 0, 0)
    png.toByteArray
  }

  /** APNG fixture encoder: `frames` full-canvas RGB frames over the
    * [[encode]] formulas shifted per frame (frame f uses seed + 17f),
    * frame 0 riding IDAT behind its fcTL, later frames as fdAT chains
    * (each frame's zlib stream split across TWO fdAT chunks so
    * concatenation is certified), correct shared sequence numbering.
    * Null on non-positive dims/frames. */
  def encodeApng(w: Int, h: Int, frames: Int, seed: Long): Array[Byte] = {
    if (w <= 0 || h <= 0 || frames <= 0 || frames > 16 ||
      w.toLong * h > (1L << 20)) return null
    def frameRaw(f: Int): Array[Byte] = {
      val fs = seed + 17L * f
      val bpp = 3
      val stride = w * bpp
      val raw = new Array[Byte](h * (stride + 1))
      val cur = new Array[Int](stride)
      val prev = new Array[Int](stride)
      java.util.Arrays.fill(prev, 0)
      var y = 0; var o = 0
      while (y < h) {
        var x = 0; var j = 0
        while (x < w) {
          cur(j) = mod256(fs + 3L * x + 7L * y)
          cur(j + 1) = mod256(2L * fs + 5L * x + y)
          cur(j + 2) = mod256(3L * fs + x + 11L * y)
          x += 1; j += bpp
        }
        val ft = y % 5
        raw(o) = ft.toByte; o += 1
        var i = 0
        while (i < stride) {
          val a = if (i >= bpp) cur(i - bpp) else 0
          val b = prev(i)
          val c = if (i >= bpp) prev(i - bpp) else 0
          val fv = ft match {
            case 0 => cur(i)
            case 1 => (cur(i) - a) & 0xFF
            case 2 => (cur(i) - b) & 0xFF
            case 3 => (cur(i) - ((a + b) >> 1)) & 0xFF
            case _ => (cur(i) - paeth(a, b, c)) & 0xFF
          }
          raw(o) = fv.toByte; o += 1; i += 1
        }
        System.arraycopy(cur, 0, prev, 0, stride)
        y += 1
      }
      raw
    }
    def deflate(raw: Array[Byte]): Array[Byte] = {
      val defl = new java.util.zip.Deflater()
      try {
        defl.setInput(raw); defl.finish()
        val out = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
        val buf = new Array[Byte](8192)
        while (!defl.finished()) out.write(buf, 0, defl.deflate(buf))
        out.toByteArray
      } finally defl.end()
    }
    val png = new java.io.ByteArrayOutputStream(4096)
    png.write(Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte), 0, 8)
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(h).put(8.toByte).put(2.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte).array()
    writeChunk(png, "IHDR", ihdr, 0, ihdr.length)
    writeChunk(png, "acTL",
      java.nio.ByteBuffer.allocate(8).putInt(frames).putInt(0).array(), 0, 8)
    var seq = 0
    def fctl(): Unit = {
      val c = java.nio.ByteBuffer.allocate(26)
        .putInt(seq).putInt(w).putInt(h).putInt(0).putInt(0)
        .putShort(1.toShort).putShort(10.toShort) // delay 1/10 s
        .put(0.toByte).put(0.toByte).array()     // dispose none, blend source
      writeChunk(png, "fcTL", c, 0, 26)
      seq += 1
    }
    fctl()
    writeChunk(png, "IDAT", deflate(frameRaw(0)), 0, deflate(frameRaw(0)).length)
    var f = 1
    while (f < frames) {
      fctl()
      val comp = deflate(frameRaw(f))
      val half = math.max(1, comp.length / 2)
      for ((off, len) <- Seq((0, half), (half, comp.length - half)) if len > 0) {
        val body = java.nio.ByteBuffer.allocate(4 + len).putInt(seq)
          .put(comp, off, len).array()
        writeChunk(png, "fdAT", body, 0, body.length)
        seq += 1
      }
      f += 1
    }
    writeChunk(png, "IEND", Array.emptyByteArray, 0, 0)
    png.toByteArray
  }

  /** 16-BIT fixture encoder (gray or RGB(A)): each sample's HIGH byte
    * carries the 8-bit formula (so sums equal the 8-bit encoding's),
    * the low byte an independent formula — a decoder that sums the
    * wrong byte or mis-steps the 2-byte samples fails loudly. Test
    * surface. */
  private[graft] def encode16(w: Int, h: Int, seed: Long,
      channels: Int): Array[Byte] = {
    if (w <= 0 || h <= 0 || w.toLong * h > (1L << 20)) return null
    if (channels != 1 && channels != 3 && channels != 4) return null
    val bpp = channels * 2
    val stride = w * bpp
    val raw = new Array[Byte](h * (stride + 1))
    val cur = new Array[Int](stride)
    val prev = new Array[Int](stride)
    def hi(ch: Int, x: Int, y: Int): Int = ch match {
      case 0 => mod256(seed + 3L * x + 7L * y)
      case 1 => mod256(2L * seed + 5L * x + y)
      case 2 => mod256(3L * seed + x + 11L * y)
      case _ => (x + y) % 256
    }
    var y = 0; var o = 0
    while (y < h) {
      var x = 0; var j = 0
      while (x < w) {
        var ch = 0
        while (ch < channels) {
          val c = if (channels == 1) 0 else ch
          cur(j) = hi(c, x, y)
          cur(j + 1) = mod256(7L * seed + x * y + 13L * ch) // low byte
          ch += 1; j += 2
        }
        x += 1
      }
      val ft = y % 5
      raw(o) = ft.toByte; o += 1
      var i = 0
      while (i < stride) {
        val a = if (i >= bpp) cur(i - bpp) else 0
        val b = prev(i)
        val c = if (i >= bpp) prev(i - bpp) else 0
        val f = ft match {
          case 0 => cur(i)
          case 1 => (cur(i) - a) & 0xFF
          case 2 => (cur(i) - b) & 0xFF
          case 3 => (cur(i) - ((a + b) >> 1)) & 0xFF
          case _ => (cur(i) - paeth(a, b, c)) & 0xFF
        }
        raw(o) = f.toByte; o += 1; i += 1
      }
      System.arraycopy(cur, 0, prev, 0, stride)
      y += 1
    }
    val defl = new java.util.zip.Deflater()
    val comp = try {
      defl.setInput(raw); defl.finish()
      val out = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
      val buf = new Array[Byte](8192)
      while (!defl.finished()) out.write(buf, 0, defl.deflate(buf))
      out.toByteArray
    } finally defl.end()
    val png = new java.io.ByteArrayOutputStream(comp.length + 128)
    png.write(Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte), 0, 8)
    val ct = channels match { case 1 => 0; case 3 => 2; case _ => 6 }
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(h)
      .put(16.toByte).put(ct.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte).array()
    writeChunk(png, "IHDR", ihdr, 0, ihdr.length)
    writeChunk(png, "IDAT", comp, 0, comp.length)
    writeChunk(png, "IEND", Array.emptyByteArray, 0, 0)
    png.toByteArray
  }

  /** PALETTE (colorType 3) fixture encoder at packed depth 1/2/4/8:
    * PLTE carries 2^depth seed-formula entries, pixel (x, y) holds
    * index (seed + x + 2y) mod 2^depth packed MSB-first, per-row
    * filters cycle byte-level. Test surface (ImageIO-differentialed
    * per pixel before our decoder's sums are compared). */
  private[graft] def encodePalette(w: Int, h: Int, seed: Long,
      depth: Int): Array[Byte] = {
    if (w <= 0 || h <= 0 || w.toLong * h > (1L << 20)) return null
    if (depth != 1 && depth != 2 && depth != 4 && depth != 8) return null
    val nColors = 1 << depth
    val rowB = (w * depth + 7) / 8
    val raw = new Array[Byte](h * (rowB + 1))
    val cur = new Array[Int](rowB)
    val prev = new Array[Int](rowB)
    var y = 0; var o = 0
    while (y < h) {
      java.util.Arrays.fill(cur, 0)
      var x = 0
      while (x < w) {
        val idx = java.lang.Math.floorMod(seed + x + 2L * y, nColors.toLong).toInt
        val bitPos = x * depth
        cur(bitPos >> 3) |= idx << (8 - depth - (bitPos & 7))
        x += 1
      }
      val ft = y % 5
      raw(o) = ft.toByte; o += 1
      var i = 0
      while (i < rowB) {
        val a = if (i >= 1) cur(i - 1) else 0
        val b = prev(i)
        val c = if (i >= 1) prev(i - 1) else 0
        val f = ft match {
          case 0 => cur(i)
          case 1 => (cur(i) - a) & 0xFF
          case 2 => (cur(i) - b) & 0xFF
          case 3 => (cur(i) - ((a + b) >> 1)) & 0xFF
          case _ => (cur(i) - paeth(a, b, c)) & 0xFF
        }
        raw(o) = f.toByte; o += 1; i += 1
      }
      System.arraycopy(cur, 0, prev, 0, rowB)
      y += 1
    }
    val defl = new java.util.zip.Deflater()
    val comp = try {
      defl.setInput(raw); defl.finish()
      val out = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
      val buf = new Array[Byte](8192)
      while (!defl.finished()) out.write(buf, 0, defl.deflate(buf))
      out.toByteArray
    } finally defl.end()
    val png = new java.io.ByteArrayOutputStream(comp.length + 128)
    png.write(Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte), 0, 8)
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(h)
      .put(depth.toByte).put(3.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte).array()
    writeChunk(png, "IHDR", ihdr, 0, ihdr.length)
    val plte = new Array[Byte](3 * nColors)
    var ci = 0
    while (ci < nColors) {
      plte(3 * ci) = mod256(seed + 5L * ci).toByte
      plte(3 * ci + 1) = mod256(2L * seed + 3L * ci).toByte
      plte(3 * ci + 2) = mod256(seed + 7L * ci + 1L).toByte
      ci += 1
    }
    writeChunk(png, "PLTE", plte, 0, plte.length)
    writeChunk(png, "IDAT", comp, 0, comp.length)
    writeChunk(png, "IEND", Array.emptyByteArray, 0, 0)
    png.toByteArray
  }

  /** The fixture image encoded ADAM7-INTERLACED: same pixel formulas,
    * each of the seven passes written as its own filtered sub-image in
    * true pass order (per-pass filter cycling, fresh zero row above
    * each pass). Test surface: the differential twin for the decoder's
    * interlace support, third-party-checked against ImageIO. */
  def encodeAdam7(w: Int, h: Int, seed: Long,
      alpha: Boolean): Array[Byte] = {
    if (w <= 0 || h <= 0 || w.toLong * h > (1L << 20)) return null
    val bpp = if (alpha) 4 else 3
    val rawOut = new java.io.ByteArrayOutputStream(w * h * bpp + h + 64)
    var p = 0
    while (p < 7) {
      val xs = PngStats.Adam7XStart(p); val xst = PngStats.Adam7XStep(p)
      val ys = PngStats.Adam7YStart(p); val yst = PngStats.Adam7YStep(p)
      val wp = if (w > xs) (w - xs + xst - 1) / xst else 0
      val hp = if (h > ys) (h - ys + yst - 1) / yst else 0
      if (wp > 0 && hp > 0) {
        val stride = wp * bpp
        val cur = new Array[Int](stride)
        val prev = new Array[Int](stride)
        java.util.Arrays.fill(prev, 0)
        var iy = 0
        while (iy < hp) {
          val y = ys + iy * yst
          var ix = 0; var j = 0
          while (ix < wp) {
            val x = xs + ix * xst
            cur(j) = mod256(seed + 3L * x + 7L * y)
            cur(j + 1) = mod256(2L * seed + 5L * x + y)
            cur(j + 2) = mod256(3L * seed + x + 11L * y)
            if (alpha) cur(j + 3) = (x + y) % 256
            ix += 1; j += bpp
          }
          val ft = iy % 5
          rawOut.write(ft)
          var i = 0
          while (i < stride) {
            val a = if (i >= bpp) cur(i - bpp) else 0
            val b = prev(i)
            val c = if (i >= bpp) prev(i - bpp) else 0
            val f = ft match {
              case 0 => cur(i)
              case 1 => (cur(i) - a) & 0xFF
              case 2 => (cur(i) - b) & 0xFF
              case 3 => (cur(i) - ((a + b) >> 1)) & 0xFF
              case _ => (cur(i) - paeth(a, b, c)) & 0xFF
            }
            rawOut.write(f)
            i += 1
          }
          System.arraycopy(cur, 0, prev, 0, stride)
          iy += 1
        }
      }
      p += 1
    }
    val raw = rawOut.toByteArray
    val defl = new java.util.zip.Deflater()
    val comp = try {
      defl.setInput(raw); defl.finish()
      val out = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
      val buf = new Array[Byte](8192)
      while (!defl.finished()) out.write(buf, 0, defl.deflate(buf))
      out.toByteArray
    } finally defl.end()
    val png = new java.io.ByteArrayOutputStream(comp.length + 128)
    png.write(Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte), 0, 8)
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(h)
      .put(8.toByte).put((if (alpha) 6 else 2).toByte)
      .put(0.toByte).put(0.toByte).put(1.toByte).array() // interlace = 1
    writeChunk(png, "IHDR", ihdr, 0, ihdr.length)
    writeChunk(png, "IDAT", comp, 0, comp.length)
    writeChunk(png, "IEND", Array.emptyByteArray, 0, 0)
    png.toByteArray
  }

  private def writeChunk(out: java.io.ByteArrayOutputStream, typ: String,
      data: Array[Byte], off: Int, len: Int): Unit = {
    val lenB = java.nio.ByteBuffer.allocate(4).putInt(len).array()
    out.write(lenB, 0, 4)
    val typB = typ.getBytes("US-ASCII")
    out.write(typB, 0, 4)
    out.write(data, off, len)
    val crc = new java.util.zip.CRC32()
    crc.update(typB)
    crc.update(data, off, len)
    out.write(java.nio.ByteBuffer.allocate(4).putInt(crc.getValue.toInt).array(), 0, 4)
  }
}
