package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** ZIP container triage — the envelope of the modern OFFICE document
  * family (docx/xlsx/pptx are ZIP, so are epub, jar, apk) and a
  * heavy hitter in any crawl's attachment tail. Parsed from the
  * public APPNOTE.TXT structures, the way a real reader must: through
  * the END OF CENTRAL DIRECTORY record and the central directory —
  * never by scanning local headers, which may lie (data descriptors,
  * §4.3.9) or be preceded by self-extractor stubs.
  *
  * `graft_zip_entries(binary)` → `array<struct<name string,
  * method int, usize bigint>>`, one element per central-directory
  * entry in directory order:
  *
  *  - EOCD (PK\5\6) located by scanning back from the tail through
  *    the up-to-64-KiB zip comment; its self-consistency is checked
  *    (comment length must reach the buffer end exactly — the rule
  *    that rejects PK\5\6 bytes occurring INSIDE a comment);
  *  - central directory at the EOCD's offset: each PK\1\2 entry's
  *    compression method, UNCOMPRESSED size, and file name (UTF-8
  *    read; the general-purpose UTF-8 flag bit 11 is the common case
  *    and cp437-only names are legacy) — entry count and total size
  *    must agree with the EOCD's claims;
  *  - ZIP64 archives decline with the recorded envelope (the EOCD64
  *    locator grammar is a later tier; 0xFFFF/0xFFFFFFFF sentinel
  *    fields decline rather than serve wrong values).
  *
  * Parse-or-NULL; 4096-entry census cap, 64 KiB name bound. */
case class ZipEntries(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_zip_entries expects a binary column, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(ZipEntries.entrySchema, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_zip_entries"

  override def nullSafeEval(input: Any): Any =
    ZipEntries.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => s"""
      ${ev.value} = graft.plans.ZipEntries.parse($b);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): ZipEntries =
    copy(child = newChild)
}

object ZipEntries {

  val entrySchema: StructType = StructType(Seq(
    StructField("name", StringType),
    StructField("method", IntegerType),
    StructField("usize", LongType)))

  private val MaxEntries = 4096
  private val MaxName = 1 << 16

  private def u16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)
  private def u32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xFFL) | ((b(i + 1) & 0xFFL) << 8) |
      ((b(i + 2) & 0xFFL) << 16) | ((b(i + 3) & 0xFFL) << 24)

  def parse(b: Array[Byte]): GenericArrayData = {
    if (b == null || b.length < 22) return null
    // EOCD: scan back through the possible comment (≤ 64 KiB); the
    // record is only accepted when its comment-length field lands the
    // record exactly at the buffer end
    var eocd = -1
    var i = b.length - 22
    val floor = math.max(0, b.length - 22 - 0xFFFF)
    while (eocd < 0 && i >= floor) {
      if (b(i) == 'P' && b(i + 1) == 'K' && b(i + 2) == 5 && b(i + 3) == 6 &&
        i + 22 + u16(b, i + 20) == b.length) eocd = i
      else i -= 1
    }
    if (eocd < 0) return null
    // multi-disk archives decline (disk fields must be 0)
    if (u16(b, eocd + 4) != 0 || u16(b, eocd + 6) != 0) return null
    val count = u16(b, eocd + 10)
    if (u16(b, eocd + 8) != count) return null // this-disk vs total
    val cdSize = u32(b, eocd + 12)
    val cdOff = u32(b, eocd + 16)
    // ZIP64 sentinels decline (a later tier, never a wrong value)
    if (count == 0xFFFF || cdSize == 0xFFFFFFFFL || cdOff == 0xFFFFFFFFL)
      return null
    if (count > MaxEntries || cdOff + cdSize > eocd) return null
    val out = new Array[Any](count)
    var at = cdOff
    var k = 0
    while (k < count) {
      val e = at.toInt
      if (at + 46 > eocd) return null
      if (!(b(e) == 'P' && b(e + 1) == 'K' && b(e + 2) == 1 && b(e + 3) == 2))
        return null
      val method = u16(b, e + 10)
      val usize = u32(b, e + 24)
      if (usize == 0xFFFFFFFFL) return null // ZIP64 entry
      val nameLen = u16(b, e + 28)
      val extraLen = u16(b, e + 30)
      val commentLen = u16(b, e + 32)
      if (nameLen > MaxName || at + 46 + nameLen + extraLen + commentLen > eocd)
        return null
      val name = new String(b, e + 46, nameLen, "UTF-8")
      out(k) = new GenericInternalRow(Array[Any](
        UTF8String.fromString(name), method, usize))
      at += 46 + nameLen + extraLen + commentLen
      k += 1
    }
    // the directory must end where the EOCD said it does
    if (at != cdOff + cdSize) return null
    new GenericArrayData(out)
  }
}

/** `graft_zip_encode(seed, n_entries, comment)` → binary: a REAL zip
  * written by the JDK's ZipOutputStream (the fixture writer IS the
  * reference implementation — parsing it is the differential):
  * entries `e<i>.txt` with deterministic payloads of (seed+i)%100+10
  * bytes, methods alternating STORED/DEFLATED, and an optional
  * archive comment (exercising the EOCD tail scan). */
case class ZipEncode(children: Seq[Expression]) extends Expression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = {
    val expected = Seq(LongType, IntegerType, BooleanType)
    if (children.length == 3 && children.map(_.dataType) == expected)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_zip_encode expects (long seed, int n_entries, boolean comment)")
  }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_zip_encode"

  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.exists(_ == null)) null
    else ZipEncode.encode(vs(0).asInstanceOf[Long], vs(1).asInstanceOf[Int],
      vs(2).asInstanceOf[Boolean])
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ZipEncode = copy(children = newChildren)
}

object ZipEncode {

  def payload(seed: Long, i: Int): Array[Byte] =
    Array.tabulate(((seed + i) % 100 + 10).toInt)(j =>
      (((seed + 13L * i + 7L * j) % 251 + 251) % 251).toByte)

  def encode(seed: Long, nEntries: Int, comment: Boolean): Array[Byte] = {
    if (seed < 0 || nEntries < 1 || nEntries > 64) return null
    val bos = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bos)
    try {
      if (comment) z.setComment(s"graft archive $seed")
      (0 until nEntries).foreach { i =>
        val data = payload(seed, i)
        val e = new java.util.zip.ZipEntry(s"e$i.txt")
        if (i % 2 == 0) {
          // STORED requires the caller to pre-declare size + CRC
          e.setMethod(java.util.zip.ZipEntry.STORED)
          e.setSize(data.length.toLong)
          val c = new java.util.zip.CRC32()
          c.update(data)
          e.setCrc(c.getValue)
        } else e.setMethod(java.util.zip.ZipEntry.DEFLATED)
        z.putNextEntry(e)
        z.write(data)
        z.closeEntry()
      }
    } finally z.close()
    bos.toByteArray
  }
}
