package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** WebP triage — the web's second-dominant image format after JPEG in
  * modern crawls, from the public container/bitstream specs alone
  * (RIFF container + "WEBP" form; VP8 frame header per RFC 6386 §9.1;
  * VP8L signature + packed dims; VP8X extended header). Like the EXIF
  * and MP4 tiers, this is a HEADER triage — dimensions, variant, and
  * the alpha/animation/EXIF feature flags a curation pass filters and
  * cohorts on — with no pixel decode (VP8 entropy decode is out of
  * scope; parse-or-NULL like every decline).
  *
  * `graft_webp_meta(binary)` →
  * `struct<variant string, width int, height int, has_alpha boolean,
  * has_anim boolean, has_exif boolean>`:
  *
  *  - "lossy": a "VP8 " chunk — the 3-byte frame tag (keyframe bit
  *    must read 0 = keyframe), the 0x9D 0x01 0x2A start code, then
  *    14-bit width/height (LE16 & 0x3FFF, upper 2 bits = scale,
  *    ignored);
  *  - "lossless": a "VP8L" chunk — signature byte 0x2F, then a 32-bit
  *    LE word packing width-1 (14 bits), height-1 (14 bits),
  *    alpha-is-used (1 bit), version (3 bits, must be 0);
  *  - "extended": a "VP8X" chunk (size 10) — feature flags byte
  *    (ICC 0x20, ALPHA 0x10, EXIF 0x08, XMP 0x04, ANIM 0x02), then
  *    24-bit LE canvas width-1 / height-1.
  *
  * The chunk walk honors RIFF word alignment (odd sizes pad a byte),
  * is bounded at 64 chunks, and bounds-checks every size — hostile
  * headers NULL, never throw or overrun. The FIRST recognized variant
  * chunk decides; a "WEBP" form containing none declines. */
case class WebpMeta(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_webp_meta expects a binary column, got ${child.dataType.catalogString}")
  override def dataType: DataType = WebpMeta.schema
  override def nullable: Boolean = true
  override def prettyName: String = "graft_webp_meta"

  override def nullSafeEval(input: Any): Any =
    WebpMeta.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => s"""
      ${ev.value} = graft.plans.WebpMeta.parse($b);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): WebpMeta =
    copy(child = newChild)
}

object WebpMeta {

  val schema: StructType = StructType(Seq(
    StructField("variant", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("has_alpha", BooleanType),
    StructField("has_anim", BooleanType),
    StructField("has_exif", BooleanType)))

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le24(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16)
  private def le32(b: Array[Byte], i: Int): Long =
    u8(b, i).toLong | (u8(b, i + 1).toLong << 8) |
      (u8(b, i + 2).toLong << 16) | (u8(b, i + 3).toLong << 24)
  private def tag(b: Array[Byte], i: Int, t: String): Boolean =
    (0 until 4).forall(j => u8(b, i + j) == t.charAt(j))

  private def row(variant: String, w: Int, h: Int, alpha: Boolean,
      anim: Boolean, exif: Boolean): InternalRow =
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(variant), w, h, alpha, anim, exif))

  def parse(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 20) return null
    if (!tag(b, 0, "RIFF") || !tag(b, 8, "WEBP")) return null
    // the RIFF size field must cover the form — a lying header is a
    // hostile file, not a short one
    val riffSize = le32(b, 4)
    if (riffSize < 4 || 8L + riffSize > b.length) return null
    var i = 12L
    var chunks = 0
    while (i + 8 <= b.length && chunks < 64) {
      val ii = i.toInt
      val size = le32(b, ii + 4)
      if (size < 0 || i + 8 + size > b.length) return null
      if (tag(b, ii, "VP8 ")) {
        // lossy bitstream header: 3-byte frame tag + start code + dims
        if (size < 10) return null
        val t0 = u8(b, ii + 8)
        if ((t0 & 1) != 0) return null // inter frame cannot lead a file
        if (u8(b, ii + 11) != 0x9D || u8(b, ii + 12) != 0x01 ||
          u8(b, ii + 13) != 0x2A) return null
        val w = le16(b, ii + 14) & 0x3FFF
        val h = le16(b, ii + 16) & 0x3FFF
        if (w == 0 || h == 0) return null
        return row("lossy", w, h, alpha = false, anim = false, exif = false)
      } else if (tag(b, ii, "VP8L")) {
        if (size < 5 || u8(b, ii + 8) != 0x2F) return null
        val bits = le32(b, ii + 9)
        val w = (bits & 0x3FFF).toInt + 1
        val h = ((bits >> 14) & 0x3FFF).toInt + 1
        val alpha = ((bits >> 28) & 1L) != 0
        if (((bits >> 29) & 0x7L) != 0) return null // version must be 0
        return row("lossless", w, h, alpha, anim = false, exif = false)
      } else if (tag(b, ii, "VP8X")) {
        if (size < 10) return null
        val flags = u8(b, ii + 8)
        val w = le24(b, ii + 12) + 1
        val h = le24(b, ii + 15) + 1
        return row("extended", w, h,
          alpha = (flags & 0x10) != 0,
          anim = (flags & 0x02) != 0,
          exif = (flags & 0x08) != 0)
      }
      i += 8 + size + (size & 1) // RIFF word alignment
      chunks += 1
    }
    null
  }
}

/** `graft_webp_encode(w, h, seed, variant)` → binary: a structurally
  * valid WebP for the fixture corpus. variant 0 = lossy ("VP8 " with
  * a real keyframe tag + start code + 14-bit dims and seed-derived
  * filler standing in for the entropy-coded partitions), 1 = lossless
  * ("VP8L" signature + packed dims, alpha bit = seed%2), 2 = extended
  * ("VP8X" canvas header with flags from seed bits — ALPHA = seed%2,
  * ANIM = seed%7==0, EXIF = seed%5==0 — followed by an inner "VP8 "
  * chunk so the container is structurally complete). Every field the
  * triage reports derives from (w, h, seed) arithmetic, so the DuckDB
  * oracle restates it exactly. */
case class WebpEncode(children: Seq[Expression]) extends Expression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = {
    val expected = Seq(IntegerType, IntegerType, LongType, IntegerType)
    if (children.length == 4 && children.map(_.dataType) == expected)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_webp_encode expects (int w, int h, long seed, int variant)")
  }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_webp_encode"

  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.exists(_ == null)) null
    else WebpEncode.encode(vs(0).asInstanceOf[Int], vs(1).asInstanceOf[Int],
      vs(2).asInstanceOf[Long], vs(3).asInstanceOf[Int])
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): WebpEncode = copy(children = newChildren)
}

object WebpEncode {

  def encode(w: Int, h: Int, seed: Long, variant: Int): Array[Byte] = {
    if (w <= 0 || w > 0x3FFF || h <= 0 || h > 0x3FFF || seed < 0) return null
    if (variant < 0 || variant > 2) return null
    val out = new java.io.ByteArrayOutputStream()
    def w8(v: Int): Unit = out.write(v & 0xFF)
    def w32(v: Long): Unit = {
      w8(v.toInt); w8((v >> 8).toInt); w8((v >> 16).toInt); w8((v >> 24).toInt)
    }
    def fourcc(t: String): Unit = t.foreach(c => w8(c))

    def vp8Chunk(): Array[Byte] = {
      val body = new java.io.ByteArrayOutputStream()
      // frame tag: keyframe (bit0 = 0), version 0, show_frame = 1,
      // first-partition size = the filler length (19 bits)
      val filler = 16 + (seed % 16).toInt
      val t = (1 << 4) | (filler << 5)
      body.write(t & 0xFF); body.write((t >> 8) & 0xFF); body.write((t >> 16) & 0xFF)
      body.write(0x9D); body.write(0x01); body.write(0x2A)
      body.write(w & 0xFF); body.write((w >> 8) & 0x3F)
      body.write(h & 0xFF); body.write((h >> 8) & 0x3F)
      var i = 0
      while (i < filler) { body.write(((seed + 7 * i) % 256).toInt); i += 1 }
      body.toByteArray
    }

    val chunks: Seq[(String, Array[Byte])] = variant match {
      case 0 => Seq("VP8 " -> vp8Chunk())
      case 1 =>
        val body = new java.io.ByteArrayOutputStream()
        body.write(0x2F)
        val alpha = if (seed % 2 == 0) 1L else 0L
        val bits = (w - 1).toLong | ((h - 1).toLong << 14) | (alpha << 28)
        body.write(bits.toInt & 0xFF); body.write(((bits >> 8) & 0xFF).toInt)
        body.write(((bits >> 16) & 0xFF).toInt); body.write(((bits >> 24) & 0xFF).toInt)
        var i = 0
        val filler = 8 + (seed % 8).toInt
        while (i < filler) { body.write(((seed + 11 * i) % 256).toInt); i += 1 }
        Seq("VP8L" -> body.toByteArray)
      case _ =>
        val x = new java.io.ByteArrayOutputStream()
        var flags = 0
        // moduli coprime to the fixture's variant selector (seed % 3),
        // so every flag actually varies within the extended rows
        if (seed % 2 == 0) flags |= 0x10 // ALPHA
        if (seed % 7 == 0) flags |= 0x02 // ANIM
        if (seed % 5 == 0) flags |= 0x08 // EXIF
        x.write(flags); x.write(0); x.write(0); x.write(0)
        def x24(v: Int): Unit = { x.write(v & 0xFF); x.write((v >> 8) & 0xFF); x.write((v >> 16) & 0xFF) }
        x24(w - 1); x24(h - 1)
        Seq("VP8X" -> x.toByteArray, "VP8 " -> vp8Chunk())
    }

    val formSize = 4 + chunks.map { case (_, c) => 8 + c.length + (c.length & 1) }.sum
    fourcc("RIFF"); w32(formSize.toLong); fourcc("WEBP")
    chunks.foreach { case (t, c) =>
      fourcc(t); w32(c.length.toLong)
      out.write(c, 0, c.length)
      if ((c.length & 1) == 1) w8(0) // RIFF pad
    }
    out.toByteArray
  }
}
