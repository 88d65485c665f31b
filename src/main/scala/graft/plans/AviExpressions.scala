package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** VIDEO: AVI (RIFF) container + MJPEG frame decode — the multimodal
  * family's step from still images to real video pixel data, zero new
  * dependencies. Motion-JPEG is the one mainstream video coding a
  * from-spec engine can decode honestly: every frame is a complete
  * baseline JPEG, so the container walk (this file, from the public
  * RIFF/AVI spec — the WAV chunk discipline generalized) feeds the
  * existing [[JpegPixels]] decoder per frame and inherits its whole
  * certification story (exact per-block-constant oracle, ImageIO
  * differential, O(one MCU) memory, hostile-header ceilings).
  *
  *  - `graft_avi_meta(binary)` → (width, height, n_frames, n_streams,
  *    codec) from the `hdrl` headers — the cheap header pass a corpus
  *    triage scan runs;
  *  - `graft_avi_frames(binary)` → array of per-frame pixel stats
  *    (frame_idx + the [[PngStats.schema]] fields) — the decode pass;
  *    frames stream through one at a time, so memory is O(one MCU)
  *    regardless of the container's claimed size;
  *  - `graft_avi_encode(w, h, n_frames, seed, mode)` → a fully valid
  *    single-stream MJPEG AVI whose frame f is
  *    [[JpegEncode.encodeBlockyColor]] with seed `seed + 1000*f` —
  *    per-block-constant planes survive the lossy codec exactly, so
  *    the DuckDB oracle recomputes every frame's channel sums from the
  *    seed formulas (certifying chunk walk, word-alignment padding,
  *    JUNK skip, and the per-frame decode in one hash).
  *
  * Both parsers are total: parse-or-NULL, never throw (fuzzed beside
  * the other media parsers). Frame count is ceilinged so a hostile
  * header bounds TIME as well as memory. */
case class AviMeta(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_avi_meta expects a binary column, got ${child.dataType.catalogString}")
  override def dataType: DataType = AviMeta.schema
  override def nullable: Boolean = true
  override def prettyName: String = "graft_avi_meta"

  override def nullSafeEval(input: Any): Any =
    AviMeta.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => s"""
      ${ev.value} = graft.plans.AviMeta.parse($b);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): AviMeta =
    copy(child = newChild)
}

object AviMeta {

  val schema: StructType = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("n_streams", IntegerType),
    StructField("codec", StringType)))

  private[plans] def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF
  private[plans] def le32(b: Array[Byte], i: Int): Long =
    u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16) |
      (u8(b, i + 3).toLong << 24)
  private[plans] def tag(b: Array[Byte], i: Int, t: String): Boolean =
    i + 4 <= b.length && b(i) == t.charAt(0).toByte &&
      b(i + 1) == t.charAt(1).toByte && b(i + 2) == t.charAt(2).toByte &&
      b(i + 3) == t.charAt(3).toByte

  /** Header walk: RIFF/AVI signature, then chunks to `LIST hdrl`;
    * inside it `avih` gives frames/streams/canvas and the first
    * `strl`'s `strf` (BITMAPINFOHEADER) names the codec fourcc. */
  def parse(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 12 + 8 + 56) return null
    if (!tag(b, 0, "RIFF") || !tag(b, 8, "AVI ")) return null
    val end = math.min(b.length.toLong, 8L + le32(b, 4)).toInt
    var p = 12
    while (p + 8 <= end) {
      val size = le32(b, p + 4)
      if (size < 0 || size > Int.MaxValue - 8) return null
      if (tag(b, p, "LIST") && tag(b, p + 8, "hdrl")) {
        val listEnd = math.min(end.toLong, p + 8L + size).toInt
        var q = p + 12
        var width, height, frames, streams = -1
        var codec: String = null
        while (q + 8 <= listEnd) {
          val csize = le32(b, q + 4)
          if (csize < 0 || csize > Int.MaxValue - 8) return null
          if (tag(b, q, "avih") && csize >= 40 && q + 8 + 40 <= listEnd) {
            frames = le32(b, q + 8 + 16).toInt
            streams = le32(b, q + 8 + 24).toInt
            width = le32(b, q + 8 + 32).toInt
            height = le32(b, q + 8 + 36).toInt
          } else if (tag(b, q, "LIST") && tag(b, q + 8, "strl") &&
              codec == null) {
            // first stream's strf: BITMAPINFOHEADER.biCompression fourcc
            val strlEnd = math.min(listEnd.toLong, q + 8L + csize).toInt
            var r = q + 12
            while (r + 8 <= strlEnd && codec == null) {
              val ssize = le32(b, r + 4)
              if (ssize < 0 || ssize > Int.MaxValue - 8) return null
              if (tag(b, r, "strf") && ssize >= 20 && r + 8 + 20 <= strlEnd)
                codec = new String(b, r + 8 + 16, 4, "US-ASCII")
              r += 8 + ssize.toInt + (ssize.toInt & 1)
            }
          }
          q += 8 + csize.toInt + (csize.toInt & 1)
        }
        if (width < 0 || frames < 0) return null
        return new GenericInternalRow(Array[Any](width, height, frames,
          streams, if (codec == null) null else UTF8String.fromString(codec)))
      }
      p += 8 + size.toInt + (size.toInt & 1)
    }
    null
  }
}

case class AviFrames(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_avi_frames expects a binary column, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(AviFrames.frameSchema)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_avi_frames"

  override def nullSafeEval(input: Any): Any =
    AviFrames.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => s"""
      ${ev.value} = graft.plans.AviFrames.parse($b);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): AviFrames =
    copy(child = newChild)
}

object AviFrames {

  val frameSchema: StructType = StructType(
    StructField("frame_idx", IntegerType) +: PngStats.schema.fields.toSeq)

  /** Hostile-header ceiling on frames actually decoded: bounds time;
    * per-frame memory is already O(one MCU) inside [[JpegPixels]]. */
  val MaxFrames = 4096

  import AviMeta.{le32, tag}

  /** Decode every video frame chunk (`##dc`) in the `movi` list —
    * including inside nested `rec ` lists — through [[JpegPixels]].
    * Any undecodable frame nulls the WHOLE parse (the total-function
    * contract reports a corrupt container, not a partial answer). */
  def parse(b: Array[Byte]): GenericArrayData = {
    if (b == null || b.length < 12) return null
    if (!tag(b, 0, "RIFF") || !tag(b, 8, "AVI ")) return null
    val end = math.min(b.length.toLong, 8L + le32(b, 4)).toInt
    val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]

    // returns false on structural corruption (nulls the parse)
    def walkFrames(from: Int, to: Int): Boolean = {
      var p = from
      while (p + 8 <= to) {
        val size = le32(b, p + 4)
        if (size < 0 || size > Int.MaxValue - 8) return false
        val body = p + 8
        val bodyEnd = body + size.toInt
        if (bodyEnd > to) return false
        if (tag(b, p, "LIST") && size >= 4 && tag(b, body, "rec ")) {
          if (!walkFrames(body + 4, bodyEnd)) return false
        } else if (size >= 0 && p + 4 <= to &&
            b(p + 2) == 'd'.toByte && b(p + 3) == 'c'.toByte) {
          if (out.length >= MaxFrames) return false
          val frame = java.util.Arrays.copyOfRange(b, body, bodyEnd)
          val stats = JpegPixels.parse(frame)
          if (stats == null) return false
          out += new GenericInternalRow(Array[Any](out.length,
            stats.getInt(0), stats.getInt(1), stats.getLong(2),
            stats.getLong(3), stats.getLong(4), stats.getLong(5)))
        }
        p = bodyEnd + (size.toInt & 1)
      }
      true
    }

    var p = 12
    while (p + 8 <= end) {
      val size = le32(b, p + 4)
      if (size < 0 || size > Int.MaxValue - 8) return null
      if (tag(b, p, "LIST") && size >= 4 && tag(b, p + 8, "movi")) {
        val ok = walkFrames(p + 12, math.min(end.toLong, p + 8L + size).toInt)
        if (!ok) return null
        return new GenericArrayData(out.toArray[Any])
      }
      p += 8 + size.toInt + (size.toInt & 1)
    }
    null // no movi list
  }
}

/** `graft_avi_encode(width, height, n_frames, seed, mode)` → binary:
  * a valid single-stream MJPEG AVI — RIFF header, `hdrl` (avih + strl
  * with strh 'vids'/'MJPG' and strf BITMAPINFOHEADER), a deliberately
  * ODD-sized JUNK chunk (certifying word-alignment padding in every
  * consumer), and a `movi` list of `00dc` frames from
  * [[JpegEncode.encodeBlockyColor]] with per-frame seeds. */
case class AviEncode(children: Seq[Expression]) extends Expression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = {
    val expected = Seq(IntegerType, IntegerType, IntegerType, LongType, IntegerType)
    if (children.length == 5 && children.map(_.dataType) == expected)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_avi_encode expects (int w, int h, int nFrames, long seed, int mode)")
  }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_avi_encode"

  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.exists(_ == null)) null
    else AviEncode.encode(vs(0).asInstanceOf[Int], vs(1).asInstanceOf[Int],
      vs(2).asInstanceOf[Int], vs(3).asInstanceOf[Long], vs(4).asInstanceOf[Int])
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): AviEncode = copy(children = newChildren)
}

object AviEncode {

  private def le32(out: java.io.ByteArrayOutputStream, v: Long): Unit = {
    out.write((v & 0xFF).toInt); out.write(((v >> 8) & 0xFF).toInt)
    out.write(((v >> 16) & 0xFF).toInt); out.write(((v >> 24) & 0xFF).toInt)
  }
  private def le16(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xFF); out.write((v >> 8) & 0xFF)
  }
  private def fourcc(out: java.io.ByteArrayOutputStream, t: String): Unit =
    t.foreach(c => out.write(c.toInt))
  private def chunk(out: java.io.ByteArrayOutputStream, t: String,
      body: Array[Byte]): Unit = {
    fourcc(out, t); le32(out, body.length.toLong); out.write(body, 0, body.length)
    if ((body.length & 1) == 1) out.write(0) // RIFF word alignment
  }

  def encode(w: Int, h: Int, nFrames: Int, seed: Long, mode: Int): Array[Byte] = {
    if (nFrames <= 0 || nFrames > 64) return null
    val frames = (0 until nFrames).map(f =>
      JpegEncode.encodeBlockyColor(w, h, seed + 1000L * f, mode,
        restartRows = false))
    if (frames.exists(_ == null)) return null

    def bytesOf(f: java.io.ByteArrayOutputStream => Unit): Array[Byte] = {
      val o = new java.io.ByteArrayOutputStream(); f(o); o.toByteArray
    }
    val avih = bytesOf { o =>
      le32(o, 40000L) // dwMicroSecPerFrame: 25 fps
      le32(o, 0L); le32(o, 0L); le32(o, 0L) // maxBytesPerSec, padding, flags
      le32(o, nFrames.toLong); le32(o, 0L) // totalFrames, initialFrames
      le32(o, 1L); le32(o, 0L) // streams, suggestedBufferSize
      le32(o, w.toLong); le32(o, h.toLong)
      (0 until 4).foreach(_ => le32(o, 0L)) // reserved
    }
    val strh = bytesOf { o =>
      fourcc(o, "vids"); fourcc(o, "MJPG")
      le32(o, 0L); le16(o, 0); le16(o, 0); le32(o, 0L) // flags, prio, lang, initial
      le32(o, 1L); le32(o, 25L) // scale, rate (25 fps)
      le32(o, 0L); le32(o, nFrames.toLong) // start, length
      le32(o, 0L); le32(o, 0xFFFFFFFFL); le32(o, 0L) // sugBuf, quality, sampleSize
      le16(o, 0); le16(o, 0); le16(o, w); le16(o, h) // rcFrame
    }
    val strf = bytesOf { o =>
      le32(o, 40L); le32(o, w.toLong); le32(o, h.toLong)
      le16(o, 1); le16(o, 24)
      fourcc(o, "MJPG")
      le32(o, w.toLong * h * 3)
      le32(o, 0L); le32(o, 0L); le32(o, 0L); le32(o, 0L)
    }
    val strl = bytesOf { o =>
      fourcc(o, "strl"); chunk(o, "strh", strh); chunk(o, "strf", strf)
    }
    val hdrl = bytesOf { o =>
      fourcc(o, "hdrl"); chunk(o, "avih", avih); chunk(o, "LIST", strl)
    }
    val movi = bytesOf { o =>
      fourcc(o, "movi"); frames.foreach(f => chunk(o, "00dc", f))
    }
    val riffBody = bytesOf { o =>
      fourcc(o, "AVI ")
      chunk(o, "LIST", hdrl)
      chunk(o, "JUNK", Array[Byte](0x6A, 0x6B, 0x6C)) // odd size: pads
      chunk(o, "LIST", movi)
    }
    bytesOf { o => fourcc(o, "RIFF"); le32(o, riffBody.length.toLong)
      o.write(riffBody, 0, riffBody.length) }
  }
}
