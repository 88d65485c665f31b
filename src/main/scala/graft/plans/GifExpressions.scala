package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.TernaryLike
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType, StructField, StructType}

/** `graft_gif_pixels(binary)` → `struct<width: int, height: int,
  * sum_r: long, sum_g: long, sum_b: long, n_pixels: long>`, NULL when
  * the bytes are not a decodable GIF — the step past [[GifMeta]]'s
  * header fields onto the format's actual pixel data, and the second
  * COMPRESSED codec of the family after [[PngStats]]: GIF pixels are
  * LZW-compressed palette indices, so this is a from-spec (GIF89a,
  * CompuServe 1990) variable-width LZW decompressor in a Catalyst
  * expression, zero dependencies (LZW is ~60 lines of arrays).
  *
  *  - header + Logical Screen Descriptor, global color table when its
  *    flag is set (2^(size+1) RGB triples);
  *  - block walk: extensions (0x21: label + length-prefixed sub-blocks
  *    — Graphic Control, Comment, Application all skip the same way)
  *    until the first Image Descriptor (0x2C); a trailer (0x3B) before
  *    any image, or a local-color-table-less image with no GCT, is
  *    NULL. First frame only — the analytics contract is "the image",
  *    matching every thumbnailer's behavior on animated GIFs;
  *  - LZW: initial code width = minCodeSize+1, Clear resets the
  *    dictionary, End-Of-Information terminates, codes packed
  *    LSB-first across 255-byte-max sub-blocks, dictionary capped at
  *    4096 entries with width growing at each power of two, and the
  *    `code == next free slot` self-referential case (KwKwK) handled
  *    per spec. Any out-of-range code, index past the palette, or
  *    pixel shortfall is NULL, never a throw (fuzzed in
  *    ParserFuzzSpec);
  *  - palette lookup → integer-exact channel sums, the same
  *    DuckDB-oracle discipline as [[PngStats]]/[[BmpStats]].
  *
  * Interlaced frames decode too: the 4-pass layout permutes ROWS,
  * and every output of this expression (dims, channel sums, pixel
  * count) is permutation-invariant — so no reordering pass exists to
  * get wrong. Pixel count is bounded (`MaxPixels`) so a hostile LSD
  * cannot balloon executor memory. */
case class GifPixels(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_gif_pixels expects a binary column, got ${child.dataType.catalogString}")
  override def dataType: DataType = GifPixels.schema
  override def nullable: Boolean = true
  override def prettyName: String = "graft_gif_pixels"

  override def nullSafeEval(input: Any): Any =
    GifPixels.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => s"""
      ${ev.value} = graft.plans.GifPixels.parse($b);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): GifPixels =
    copy(child = newChild)
}

object GifPixels {
  val schema: StructType = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("sum_r", LongType),
    StructField("sum_g", LongType),
    StructField("sum_b", LongType),
    StructField("n_pixels", LongType)))

  /** Frame-pixel ceiling (16M): a hostile Image Descriptor is rejected
    * before the index buffer is allocated. */
  val MaxPixels: Long = 1L << 24

  private[plans] def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF
  private[plans] def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)

  /** Null iff the bytes are not a decodable in-scope GIF. Static — no
    * captures — so generated code calls it directly. */
  def parse(b: Array[Byte]): InternalRow = try {
    if (b == null || b.length < 14) return null
    if (u8(b, 0) != 'G' || u8(b, 1) != 'I' || u8(b, 2) != 'F' ||
        u8(b, 3) != '8' || u8(b, 5) != 'a') return null
    val v = u8(b, 4)
    if (v != '7' && v != '9') return null
    var i = 13
    // global color table: bit 7 of the LSD packed byte; size bits 0-2
    val lsdPacked = u8(b, 10)
    var palette: Array[Byte] = null
    if ((lsdPacked & 0x80) != 0) {
      val n = 1 << ((lsdPacked & 7) + 1)
      if (i + 3 * n > b.length) return null
      palette = java.util.Arrays.copyOfRange(b, i, i + 3 * n)
      i += 3 * n
    }
    // block walk to the first image descriptor
    while (i < b.length) {
      u8(b, i) match {
        case 0x21 => // extension: label byte, then sub-blocks to a 0 terminator
          i += 2
          var done = false
          while (!done) {
            if (i >= b.length) return null
            val n = u8(b, i); i += 1 + n
            done = n == 0
          }
        case 0x2C =>
          // image descriptor: left(2) top(2) w(2) h(2) packed(1)
          if (i + 10 > b.length) return null
          val w = le16(b, i + 5); val h = le16(b, i + 7)
          val packed = u8(b, i + 9)
          i += 10
          if (w <= 0 || h <= 0 || w.toLong * h > MaxPixels) return null
          // interlace (packed & 0x40) needs NO handling for a stats
          // contract: the 4-pass layout permutes ROWS, and channel
          // sums are permutation-invariant — the same w*h indices
          // decode either way
          if ((packed & 0x80) != 0) { // local color table overrides
            val n = 1 << ((packed & 7) + 1)
            if (i + 3 * n > b.length) return null
            palette = java.util.Arrays.copyOfRange(b, i, i + 3 * n)
            i += 3 * n
          }
          if (palette == null) return null // no color table at all
          val px = lzw(b, i, w * h)
          if (px == null) return null
          val nColors = palette.length / 3
          var sr = 0L; var sg = 0L; var sb = 0L
          var j = 0
          while (j < px.length) {
            val idx = px(j) & 0xFF
            if (idx >= nColors) return null
            sr += u8(palette, 3 * idx)
            sg += u8(palette, 3 * idx + 1)
            sb += u8(palette, 3 * idx + 2)
            j += 1
          }
          return new GenericInternalRow(Array[Any](w, h, sr, sg, sb, w.toLong * h))
        case 0x3B => return null // trailer before any image frame
        case _ => return null    // unknown block type: unrecoverable (no length)
      }
    }
    null
  } catch { case scala.util.control.NonFatal(_) => null }

  /** GIF variable-width LZW: decode exactly `need` palette indices
    * starting at the minCodeSize byte at `off`; null on any malformed
    * code, truncation, or shortfall. Codes after the frame is full are
    * ignored (encoders may pad before EOI). Dictionary as parallel
    * prefix/suffix arrays — entry k is entry prefix(k)'s string plus
    * one byte, emitted by walking the chain into a stack. */
  private[plans] def lzw(b: Array[Byte], off: Int, need: Int): Array[Byte] = {
    if (off >= b.length) return null
    val minCode = u8(b, off)
    if (minCode < 2 || minCode > 8) return null
    val clear = 1 << minCode
    val eoi = clear + 1
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    val stack = new Array[Byte](4096)
    val out = new Array[Byte](need)
    var outN = 0
    var dictN = eoi + 1
    var width = minCode + 1
    var prev = -1
    // bit reader over the sub-block chain, LSB-first
    var p = off + 1       // cursor into b
    var blockLeft = 0     // bytes remaining in the current sub-block
    var acc = 0L; var bits = 0
    var finished = false
    while (!finished) {
      while (bits < width && !finished) {
        if (blockLeft == 0) {
          if (p >= b.length) return null
          blockLeft = u8(b, p); p += 1
          if (blockLeft == 0) finished = true // data terminator
        }
        if (!finished) {
          if (p >= b.length) return null
          acc |= (u8(b, p).toLong << bits); bits += 8
          p += 1; blockLeft -= 1
        }
      }
      if (!finished) {
        val code = (acc & ((1 << width) - 1)).toInt
        acc >>>= width; bits -= width
        if (code == clear) {
          dictN = eoi + 1; width = minCode + 1; prev = -1
        } else if (code == eoi) {
          finished = true
        } else if (prev == -1) {
          // first code after a clear must be a literal
          if (code >= clear) return null
          if (outN < need) { out(outN) = code.toByte; outN += 1 }
          prev = code
        } else {
          if (code > dictN || (code == dictN && dictN >= 4096)) return null
          // emit the code's string (KwKwK: code == dictN uses prev + its
          // own first byte); literals short-circuit the chain walk
          var sp = 0
          var cur = if (code == dictN) prev else code
          while (cur >= clear) { stack(sp) = suffix(cur); sp += 1; cur = prefix(cur) }
          val first = cur.toByte
          if (outN < need) { out(outN) = first; outN += 1 }
          while (sp > 0 && outN < need) { sp -= 1; out(outN) = stack(sp); outN += 1 }
          sp = 0 // discard overflow beyond the frame
          if (code == dictN && outN < need) { out(outN) = first; outN += 1 }
          if (dictN < 4096) {
            prefix(dictN) = prev; suffix(dictN) = first; dictN += 1
            if (dictN == (1 << width) && width < 12) width += 1
          }
          prev = code
        }
      }
    }
    if (outN < need) null else out
  }
}

/** `graft_gif_frames(binary)` → `array<struct<frame_idx, left, top,
  * width, height, sum_r, sum_g, sum_b, n_pixels>>`, NULL when the
  * bytes are not a decodable GIF — the ANIMATION upgrade of
  * [[GifPixels]]: every Image Descriptor decodes (GIF89a multi-frame
  * layout), each frame INDEPENDENTLY in its own rectangle with its
  * own local color table when present (a local table never leaks into
  * later frames — the single-frame decoder's palette mutation would
  * be a bug here). Disposal/transparency are presentation concerns a
  * stats pass does not composite; the per-frame sums are the raw
  * frame pixels, which is what frame-sampling fingerprints hash.
  * Frame count capped at [[GifFrames.MaxFrames]] (hostile many-frame
  * streams decode the cap and stop); per-frame pixels capped by
  * [[GifPixels.MaxPixels]]. NULL-never-throw, fuzzed. */
case class GifFrames(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_gif_frames expects a binary column, got ${child.dataType.catalogString}")
  override def dataType: DataType = GifFrames.schema
  override def nullable: Boolean = true
  override def prettyName: String = "graft_gif_frames"

  override def nullSafeEval(input: Any): Any =
    GifFrames.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => s"""
      ${ev.value} = graft.plans.GifFrames.parse($b);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): GifFrames =
    copy(child = newChild)
}

object GifFrames {
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

  /** Hostile-stream ceiling: decode stops (returning what it has)
    * after this many frames. */
  val MaxFrames = 64

  import GifPixels.{le16, lzw, u8}

  def parse(b: Array[Byte]): Any = try {
    if (b == null || b.length < 14) return null
    if (u8(b, 0) != 'G' || u8(b, 1) != 'I' || u8(b, 2) != 'F' ||
        u8(b, 3) != '8' || u8(b, 5) != 'a') return null
    val v = u8(b, 4)
    if (v != '7' && v != '9') return null
    var i = 13
    val lsdPacked = u8(b, 10)
    var global: Array[Byte] = null
    if ((lsdPacked & 0x80) != 0) {
      val n = 1 << ((lsdPacked & 7) + 1)
      if (i + 3 * n > b.length) return null
      global = java.util.Arrays.copyOfRange(b, i, i + 3 * n)
      i += 3 * n
    }
    val frames = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    var trailerSeen = false
    while (!trailerSeen && frames.length < MaxFrames) {
      if (i >= b.length) return null
      u8(b, i) match {
        case 0x21 =>
          i += 2
          var done = false
          while (!done) {
            if (i >= b.length) return null
            val n = u8(b, i); i += 1 + n
            done = n == 0
          }
        case 0x2C =>
          if (i + 10 > b.length) return null
          val left = le16(b, i + 1); val top = le16(b, i + 3)
          val w = le16(b, i + 5); val h = le16(b, i + 7)
          val packed = u8(b, i + 9)
          i += 10
          if (w <= 0 || h <= 0 || w.toLong * h > GifPixels.MaxPixels) return null
          // interlace permutes rows; sums are permutation-invariant
          var palette = global // local table for THIS frame only
          if ((packed & 0x80) != 0) {
            val n = 1 << ((packed & 7) + 1)
            if (i + 3 * n > b.length) return null
            palette = java.util.Arrays.copyOfRange(b, i, i + 3 * n)
            i += 3 * n
          }
          if (palette == null) return null
          val px = lzw(b, i, w * h)
          if (px == null) return null
          // advance i past the LZW data: min-code byte + sub-blocks
          i += 1
          var blockDone = false
          while (!blockDone) {
            if (i >= b.length) return null
            val n = u8(b, i); i += 1 + n
            blockDone = n == 0
          }
          val nColors = palette.length / 3
          var sr = 0L; var sg = 0L; var sb = 0L
          var j = 0
          while (j < px.length) {
            val idx = px(j) & 0xFF
            if (idx >= nColors) return null
            sr += u8(palette, 3 * idx)
            sg += u8(palette, 3 * idx + 1)
            sb += u8(palette, 3 * idx + 2)
            j += 1
          }
          frames += new GenericInternalRow(Array[Any](
            frames.length, left, top, w, h, sr, sg, sb, w.toLong * h))
        case 0x3B => trailerSeen = true
        case _ => return null
      }
    }
    if (frames.isEmpty) null
    else new org.apache.spark.sql.catalyst.util.GenericArrayData(frames.toArray[Any])
  } catch { case scala.util.control.NonFatal(_) => null }
}

/** `graft_gif_encode(width, height, seed)` → binary: a fully valid
  * GIF89a (real variable-width LZW compression with dictionary growth
  * and 4096-entry wraparound, 64-color global color table, a Graphic
  * Control extension so decoders must exercise the skip path) whose
  * pixel (x, y) carries palette index
  *
  *   idx = (seed + x + 2y) mod 64
  *
  * over the deterministic palette
  *
  *   R(i) = (seed + 5i) mod 256
  *   G(i) = (2·seed + 3i) mod 256
  *   B(i) = (seed + 7i + 1) mod 256
  *
  * so a DuckDB oracle recomputes the exact channel sums from the same
  * arithmetic — the fixture side of the round trip, the [[PngEncode]]
  * discipline. The compressor is REAL LZW (hash-chained dictionary,
  * Clear emitted on overflow), not the fixed-width "uncompressed GIF"
  * trick, so the decoder's growth/reset paths are exercised by every
  * fixture. */
case class GifEncode(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with TernaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (IntegerType, IntegerType, LongType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_gif_encode expects (int, int, bigint), got $other")
    }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_gif_encode"

  override def nullSafeEval(w: Any, h: Any, seed: Any): Any =
    GifEncode.encode(w.asInstanceOf[Int], h.asInstanceOf[Int], seed.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (w, h, s) => s"""
      ${ev.value} = graft.plans.GifEncode.encode($w, $h, $s);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): GifEncode = copy(f, s, t)
}

object GifEncode {

  private def mod256(v: Long): Int = java.lang.Math.floorMod(v, 256L).toInt

  /** Null on non-positive / oversized dims (fixture bound 1M pixels);
    * otherwise a valid single-frame GIF89a per the formulas above.
    * Static: called from generated code. */
  def encode(w: Int, h: Int, seed: Long): Array[Byte] = {
    if (w <= 0 || h <= 0 || w.toLong * h > (1L << 20)) return null
    val out = new java.io.ByteArrayOutputStream(w * h / 2 + 256)
    out.write("GIF89a".getBytes("US-ASCII"), 0, 6)
    // LSD: canvas w/h LE16, packed 0xF5 = GCT present, color res 8,
    // 2^(5+1)=64 entries; background 0; aspect 0
    out.write(w & 0xFF); out.write(w >> 8)
    out.write(h & 0xFF); out.write(h >> 8)
    out.write(0xF5); out.write(0); out.write(0)
    var i = 0
    while (i < 64) {
      out.write(mod256(seed + 5L * i))
      out.write(mod256(2L * seed + 3L * i))
      out.write(mod256(seed + 7L * i + 1L))
      i += 1
    }
    // Graphic Control extension: decoders MUST skip it (89a §23)
    out.write(Array(0x21, 0xF9, 0x04, 0x00, 0x00, 0x00, 0x00, 0x00).map(_.toByte), 0, 8)
    // image descriptor: full canvas, no LCT, no interlace
    out.write(0x2C)
    out.write(0); out.write(0); out.write(0); out.write(0)
    out.write(w & 0xFF); out.write(w >> 8)
    out.write(h & 0xFF); out.write(h >> 8)
    out.write(0)
    val px = new Array[Byte](w * h)
    var y = 0; var o = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        px(o) = java.lang.Math.floorMod(seed + x + 2L * y, 64L).toByte
        o += 1; x += 1
      }
      y += 1
    }
    out.write(6) // LZW min code size for a 64-color palette
    lzwCompress(px, 6, out)
    out.write(0)    // data terminator
    out.write(0x3B) // trailer
    out.toByteArray
  }

  /** Multi-frame fixture encoder: `frames` full-canvas frames, frame
    * f's pixel (x, y) at palette index (seed + 7f + x + 2y) mod 64
    * over the same seed palette — so the animated round trip is
    * exactly oracle-recomputable per frame. Every frame carries its
    * own Graphic Control extension (the skip path runs between every
    * pair of frames) and the same REAL LZW compressor. Null on
    * non-positive dims/frames or an oversized canvas. */
  def encodeAnim(w: Int, h: Int, frames: Int, seed: Long): Array[Byte] = {
    if (w <= 0 || h <= 0 || frames <= 0 || frames > 16 ||
      w.toLong * h > (1L << 20)) return null
    val out = new java.io.ByteArrayOutputStream(frames * w * h / 2 + 256)
    out.write("GIF89a".getBytes("US-ASCII"), 0, 6)
    out.write(w & 0xFF); out.write(w >> 8)
    out.write(h & 0xFF); out.write(h >> 8)
    out.write(0xF5); out.write(0); out.write(0)
    var i = 0
    while (i < 64) {
      out.write(mod256(seed + 5L * i))
      out.write(mod256(2L * seed + 3L * i))
      out.write(mod256(seed + 7L * i + 1L))
      i += 1
    }
    var f = 0
    while (f < frames) {
      out.write(Array(0x21, 0xF9, 0x04, 0x00, 0x04, 0x00, 0x00, 0x00).map(_.toByte), 0, 8)
      out.write(0x2C)
      out.write(0); out.write(0); out.write(0); out.write(0)
      out.write(w & 0xFF); out.write(w >> 8)
      out.write(h & 0xFF); out.write(h >> 8)
      out.write(0)
      val px = new Array[Byte](w * h)
      var y = 0; var o = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          px(o) = java.lang.Math.floorMod(seed + 7L * f + x + 2L * y, 64L).toByte
          o += 1; x += 1
        }
        y += 1
      }
      out.write(6)
      lzwCompress(px, 6, out)
      out.write(0)
      f += 1
    }
    out.write(0x3B)
    out.toByteArray
  }

  /** GIF89a 4-pass interlace row order (appendix E): rows 0,8,16..,
    * then 4,12.., then 2,6.., then odd rows. */
  private[graft] def interlaceOrder(h: Int): Array[Int] = {
    val order = Array.newBuilder[Int]
    var y = 0
    while (y < h) { order += y; y += 8 }
    y = 4
    while (y < h) { order += y; y += 8 }
    y = 2
    while (y < h) { order += y; y += 4 }
    y = 1
    while (y < h) { order += y; y += 2 }
    order.result()
  }

  /** The single-frame fixture image encoded INTERLACED (flag set, rows
    * emitted in 4-pass order) — the differential twin proving the
    * decoder's sums are truly row-order-invariant. Also a FIXTURE
    * surface: every 5th gifpx doc stores this layout, so the
    * mm_gif_pixels ORACLE (whose formulas are layout-invariant)
    * hash-certifies the interlaced path. */
  def encodeInterlaced(w: Int, h: Int, seed: Long): Array[Byte] = {
    if (w <= 0 || h <= 0 || w.toLong * h > (1L << 20)) return null
    val out = new java.io.ByteArrayOutputStream(w * h / 2 + 256)
    out.write("GIF89a".getBytes("US-ASCII"), 0, 6)
    out.write(w & 0xFF); out.write(w >> 8)
    out.write(h & 0xFF); out.write(h >> 8)
    out.write(0xF5); out.write(0); out.write(0)
    var i = 0
    while (i < 64) {
      out.write(mod256(seed + 5L * i))
      out.write(mod256(2L * seed + 3L * i))
      out.write(mod256(seed + 7L * i + 1L))
      i += 1
    }
    out.write(0x2C)
    out.write(0); out.write(0); out.write(0); out.write(0)
    out.write(w & 0xFF); out.write(w >> 8)
    out.write(h & 0xFF); out.write(h >> 8)
    out.write(0x40) // interlaced, no LCT
    val px = new Array[Byte](w * h)
    var o = 0
    interlaceOrder(h).foreach { y =>
      var x = 0
      while (x < w) {
        px(o) = java.lang.Math.floorMod(seed + x + 2L * y, 64L).toByte
        o += 1; x += 1
      }
    }
    out.write(6)
    lzwCompress(px, 6, out)
    out.write(0)
    out.write(0x3B)
    out.toByteArray
  }

  /** Real GIF LZW: dictionary of (prefix code, next byte) pairs in a
    * linear-probed open-addressing table, output width growing at each
    * power of two, Clear emitted when the 4096th entry would be
    * created. Codes packed LSB-first and flushed in 255-byte
    * sub-blocks. */
  private def lzwCompress(px: Array[Byte], minCode: Int,
      out: java.io.ByteArrayOutputStream): Unit = {
    val clear = 1 << minCode
    val eoi = clear + 1
    val tableSize = 8192 // power of two > 4096 for open addressing
    val keys = new Array[Long](tableSize)
    val vals = new Array[Int](tableSize)
    java.util.Arrays.fill(keys, -1L)
    var dictN = eoi + 1
    var width = minCode + 1
    val block = new Array[Byte](255)
    var blockN = 0
    var acc = 0L; var bits = 0
    def emit(code: Int): Unit = {
      acc |= (code.toLong << bits); bits += width
      while (bits >= 8) {
        block(blockN) = (acc & 0xFF).toByte; blockN += 1
        acc >>>= 8; bits -= 8
        if (blockN == 255) { out.write(255); out.write(block, 0, 255); blockN = 0 }
      }
    }
    def flushBits(): Unit = {
      if (bits > 0) {
        block(blockN) = (acc & 0xFF).toByte; blockN += 1
        if (blockN == 255) { out.write(255); out.write(block, 0, 255); blockN = 0 }
        acc = 0; bits = 0
      }
      if (blockN > 0) { out.write(blockN); out.write(block, 0, blockN); blockN = 0 }
    }
    def find(key: Long): Int = { // slot holding key, or first empty slot
      var s = ((key * 0x9E3779B97F4A7C15L) >>> 51).toInt & (tableSize - 1)
      while (keys(s) != -1L && keys(s) != key) s = (s + 1) & (tableSize - 1)
      s
    }
    emit(clear)
    var prev = px(0) & 0xFF
    var i = 1
    while (i < px.length) {
      val k = px(i) & 0xFF
      val key = (prev.toLong << 8) | k
      val slot = find(key)
      if (keys(slot) == key) {
        prev = vals(slot)
      } else {
        emit(prev)
        if (dictN == 4096) {
          emit(clear)
          java.util.Arrays.fill(keys, -1L)
          dictN = eoi + 1; width = minCode + 1
        } else {
          keys(slot) = key; vals(slot) = dictN
          dictN += 1
          // one insert LATER than the decoder's dictN == 2^width rule:
          // the decoder inserts nothing for the first code after a
          // clear, so its counter lags this one by exactly one — both
          // sides then widen between the same two codes on the wire
          // (the giflib pair's convention)
          if (dictN == (1 << width) + 1 && width < 12) width += 1
        }
        prev = k
      }
      i += 1
    }
    emit(prev)
    emit(eoi)
    flushBits()
  }
}

/** `graft_gif_encode_anim(width, height, frames, seed)` → binary: a
  * fully valid MULTI-FRAME GIF89a ([[GifEncode.encodeAnim]]) — the
  * fixture side of the animated round-trip oracle. */
case class GifEncodeAnim(children: Seq[Expression]) extends Expression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    children.map(_.dataType) match {
      case Seq(IntegerType, IntegerType, IntegerType, LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_gif_encode_anim expects (int, int, int, bigint), got $other")
    }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def foldable: Boolean = children.forall(_.foldable)
  override def prettyName: String = "graft_gif_encode_anim"

  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.contains(null)) null
    else GifEncode.encodeAnim(vs(0).asInstanceOf[Int], vs(1).asInstanceOf[Int],
      vs(2).asInstanceOf[Int], vs(3).asInstanceOf[Long])
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GifEncodeAnim =
    copy(children = newChildren)
}

