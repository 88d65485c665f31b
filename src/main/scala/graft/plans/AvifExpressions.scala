package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** AVIF triage — the fastest-growing image format in modern crawls
  * (AV1 stills in the HEIF/ISO-BMFF container), from the public specs
  * alone (ISOBMFF box grammar; HEIF item properties; AV1-in-HEIF
  * ispe/pixi bindings). A HEADER triage like the MP4/WebP tiers: the
  * dimensions, bit depth, channel count and still-vs-sequence split a
  * curation pass filters on, with no AV1 entropy decode.
  *
  * `graft_avif_meta(binary)` →
  * `struct<brand string, width int, height int, depth int,
  * channels int, animated boolean>`:
  *
  *  - `ftyp` major brand must be `avif` (still) or `avis` (sequence —
  *    reported `animated`); anything else is not an AVIF and NULLs;
  *  - dimensions come from the `ispe` (image spatial extents)
  *    property inside `meta`/`iprp`/`ipco` — the normative carrier
  *    for HEIF stills (a sequence's `trak` is NOT consulted: `avis`
  *    files still carry the primary item's ispe);
  *  - bit depth + channel count from `pixi` when present (every
  *    channel must agree, mixed depths decline to NULL fields).
  *
  * The box walk is bounds-checked at every level (64 boxes per level,
  * 4 levels deep, 64-bit `largesize` accepted, size 0 = to-end only
  * at top level), parse-or-NULL throughout — hostile headers can
  * never throw or overrun. */
case class AvifMeta(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_avif_meta expects a binary column, got ${child.dataType.catalogString}")
  override def dataType: DataType = AvifMeta.schema
  override def nullable: Boolean = true
  override def prettyName: String = "graft_avif_meta"

  override def nullSafeEval(input: Any): Any =
    AvifMeta.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => s"""
      ${ev.value} = graft.plans.AvifMeta.parse($b);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): AvifMeta =
    copy(child = newChild)
}

object AvifMeta {

  val schema: StructType = StructType(Seq(
    StructField("brand", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("depth", IntegerType),
    StructField("channels", IntegerType),
    StructField("animated", BooleanType)))

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF
  private def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1).toLong << 16) |
      (u8(b, i + 2).toLong << 8) | u8(b, i + 3).toLong
  private def be64(b: Array[Byte], i: Int): Long =
    (be32(b, i) << 32) | be32(b, i + 4)
  private def tag(b: Array[Byte], i: Int, t: String): Boolean =
    (0 until 4).forall(j => u8(b, i + j) == t.charAt(j))

  /** Walk one box level of b[from, to): invoke `f(type, bodyFrom,
    * bodyTo)` per box; returns false on any malformed size. */
  private def walk(b: Array[Byte], from: Long, to: Long, topLevel: Boolean)(
      f: (String, Long, Long) => Boolean): Boolean = {
    var i = from
    var boxes = 0
    while (i + 8 <= to && boxes < 64) {
      val ii = i.toInt
      var size = be32(b, ii)
      var hdr = 8L
      if (size == 1L) { // 64-bit largesize
        if (i + 16 > to) return false
        size = be64(b, ii + 8); hdr = 16L
      } else if (size == 0L) { // box extends to end — top level only
        if (!topLevel) return false
        size = to - i
      }
      if (size < hdr || i + size > to) return false
      val t = new String(b, ii + 4, 4, "ISO-8859-1")
      if (!f(t, i + hdr, i + size)) return false
      i += size
      boxes += 1
    }
    true
  }

  def parse(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 16) return null
    var brand: String = null
    var w = -1L; var h = -1L
    var depth = -1; var channels = -1
    var sawMeta = false
    val ok = walk(b, 0L, b.length.toLong, topLevel = true) { (t, from, to) =>
      t match {
        case "ftyp" =>
          if (to - from < 8) false
          else {
            val major = new String(b, from.toInt, 4, "ISO-8859-1")
            if (major == "avif" || major == "avis") { brand = major; true }
            else false // not an AVIF: decline the whole file
          }
        case "meta" =>
          if (to - from < 4) false // fullbox version/flags
          else {
            sawMeta = true
            walk(b, from + 4, to, topLevel = false) { (t2, f2, t2e) =>
              if (t2 == "iprp")
                walk(b, f2, t2e, topLevel = false) { (t3, f3, t3e) =>
                  if (t3 == "ipco")
                    walk(b, f3, t3e, topLevel = false) { (t4, f4, t4e) =>
                      if (t4 == "ispe") {
                        if (t4e - f4 < 12) return null // fullbox + w + h
                        w = be32(b, (f4 + 4).toInt)
                        h = be32(b, (f4 + 8).toInt)
                      } else if (t4 == "pixi") {
                        if (t4e - f4 < 5) return null // fullbox + n + bits
                        val n = u8(b, (f4 + 4).toInt)
                        if (n < 1 || f4 + 5 + n > t4e) return null
                        val d0 = u8(b, (f4 + 5).toInt)
                        var k = 1
                        var uniform = true
                        while (k < n) {
                          if (u8(b, (f4 + 5 + k).toInt) != d0) uniform = false
                          k += 1
                        }
                        // mixed per-channel depths decline the FIELDS
                        // (the dims stay valid), never misreport one
                        if (uniform) { depth = d0; channels = n }
                      }
                      true
                    }
                  else true
                }
              else true
            }
          }
        case _ => true // mdat / moov / free: skipped
      }
    }
    if (!ok || brand == null || !sawMeta) return null
    if (w <= 0 || h <= 0 || w > 0xFFFFFF || h > 0xFFFFFF) return null
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(brand), w.toInt, h.toInt,
      if (depth > 0) depth else null,
      if (channels > 0) channels else null,
      brand == "avis"))
  }
}

/** `graft_avif_encode(w, h, seed, animated)` → binary: a structurally
  * valid AVIF shell for the fixture corpus — ftyp (avif/avis by the
  * flag), meta/hdlr(pict)/iprp/ipco carrying a REAL ispe and a pixi
  * (depth cycles 8/10/12 on seed%3, channels 1/3 on seed%2), and an
  * mdat stub of seed-derived filler standing in for the AV1 OBUs.
  * Every reported field derives from (w, h, seed) arithmetic, so the
  * DuckDB oracle restates the triage row exactly. */
case class AvifEncode(children: Seq[Expression]) extends Expression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = {
    val expected = Seq(IntegerType, IntegerType, LongType, BooleanType)
    if (children.length == 4 && children.map(_.dataType) == expected)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_avif_encode expects (int w, int h, long seed, boolean animated)")
  }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_avif_encode"

  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.exists(_ == null)) null
    else AvifEncode.encode(vs(0).asInstanceOf[Int], vs(1).asInstanceOf[Int],
      vs(2).asInstanceOf[Long], vs(3).asInstanceOf[Boolean])
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): AvifEncode = copy(children = newChildren)
}

object AvifEncode {

  def encode(w: Int, h: Int, seed: Long, animated: Boolean): Array[Byte] = {
    if (w <= 0 || w > 0xFFFFFF || h <= 0 || h > 0xFFFFFF || seed < 0) return null
    val out = new java.io.ByteArrayOutputStream()
    def w8(v: Int): Unit = out.write(v & 0xFF)
    def w32(v: Long): Unit = {
      w8((v >> 24).toInt); w8((v >> 16).toInt); w8((v >> 8).toInt); w8(v.toInt)
    }
    def fourcc(t: String): Unit = t.foreach(c => w8(c))
    def box(t: String)(body: => Array[Byte]): Unit = {
      val c = body
      w32(8L + c.length); fourcc(t); out.write(c, 0, c.length)
    }
    def bytes(f: java.io.ByteArrayOutputStream => Unit): Array[Byte] = {
      val o = new java.io.ByteArrayOutputStream(); f(o); o.toByteArray
    }

    val depth = Array(8, 10, 12)((seed % 3).toInt)
    val channels = if (seed % 2 == 0) 1 else 3

    box("ftyp")(bytes { o =>
      o.write((if (animated) "avis" else "avif").getBytes("ISO-8859-1"))
      o.write(Array[Byte](0, 0, 0, 0)) // minor version
      o.write("avifmif1miaf".getBytes("ISO-8859-1")) // compatible brands
    })
    box("meta")(bytes { o =>
      o.write(Array[Byte](0, 0, 0, 0)) // fullbox version/flags
      def sub(t: String)(body: Array[Byte]): Unit = {
        val sz = 8 + body.length
        o.write(Array[Byte]((sz >>> 24).toByte, (sz >>> 16).toByte,
          (sz >>> 8).toByte, sz.toByte))
        o.write(t.getBytes("ISO-8859-1"))
        o.write(body)
      }
      sub("hdlr")(Array[Byte](0, 0, 0, 0, 0, 0, 0, 0) ++
        "pict".getBytes("ISO-8859-1") ++ Array.fill[Byte](13)(0))
      sub("iprp") {
        val ispe = Array[Byte](0, 0, 0, 0,
          (w >>> 24).toByte, (w >>> 16).toByte, (w >>> 8).toByte, w.toByte,
          (h >>> 24).toByte, (h >>> 16).toByte, (h >>> 8).toByte, h.toByte)
        val pixi = Array[Byte](0, 0, 0, 0, channels.toByte) ++
          Array.fill[Byte](channels)(depth.toByte)
        val ipco = bytes { o2 =>
          def sub2(t: String, body: Array[Byte]): Unit = {
            val sz = 8 + body.length
            o2.write(Array[Byte]((sz >>> 24).toByte, (sz >>> 16).toByte,
              (sz >>> 8).toByte, sz.toByte))
            o2.write(t.getBytes("ISO-8859-1"))
            o2.write(body)
          }
          sub2("ispe", ispe)
          sub2("pixi", pixi)
        }
        val wrapped = new java.io.ByteArrayOutputStream()
        val sz = 8 + ipco.length
        wrapped.write(Array[Byte]((sz >>> 24).toByte, (sz >>> 16).toByte,
          (sz >>> 8).toByte, sz.toByte))
        wrapped.write("ipco".getBytes("ISO-8859-1"))
        wrapped.write(ipco)
        wrapped.toByteArray
      }
    })
    box("mdat")(bytes { o =>
      val n = 16 + (seed % 24).toInt
      var i = 0
      while (i < n) { o.write(((seed + 5 * i) % 256).toInt); i += 1 }
    })
    out.toByteArray
  }
}
