package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** PowerPoint 97-2003 binary text extraction (MS-PPT, an open
  * Microsoft spec) — the third member of the CFB family
  * ([[CfbParse]]). The "PowerPoint Document" stream is a tree of
  * records (8-byte header: recVer/recInstance 2 bytes LE, recType 2,
  * recLen 4; a record whose recVer is 0xF is a CONTAINER holding
  * nested records in its payload):
  *
  *  - text lives in TextCharsAtom (0x0FA0, UTF-16LE) and
  *    TextBytesAtom (0x0FA8, the low bytes of UTF-16 code units —
  *    the Latin-1 view) records; the walk collects them in stream
  *    order (the SlideListWithText outline order real writers emit);
  *  - the CR paragraph separator (0x0D) and VT line break (0x0B)
  *    normalize to '\n', TAB stays; any other C0 control declines;
  *  - lone surrogates decline (never a garbled UTF-8 encode);
  *  - an encryption container (CryptSession10, 0x2F14) declines —
  *    the encrypted-ppt tier is recorded, not guessed at.
  *
  * `graft_ppt_text(binary)` → string: the text atoms joined with
  * '\n'. NULL on any structural failure — a record overrunning its
  * parent, depth > 16, over-cap (8192 records / 1 MiB text) —
  * faithful-or-NULL like the whole document family. */
case class PptText(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_ppt_text expects a binary column, got ${child.dataType.catalogString}")
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_ppt_text"

  override def nullSafeEval(input: Any): Any =
    PptText.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => s"""
      ${ev.value} = graft.plans.PptText.parse($b);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): PptText =
    copy(child = newChild)
}

object PptText {

  private val MaxRecords = 8192
  private val MaxOut = 1 << 20
  private val MaxDepth = 16

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)
  private def u32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xFFL)) | ((b(o + 1) & 0xFFL) << 8) |
      ((b(o + 2) & 0xFFL) << 16) | ((b(o + 3) & 0xFFL) << 24)

  def parse(b: Array[Byte]): UTF8String = {
    val cfb = CfbParse.open(b)
    if (cfb == null) return null
    val s = cfb.stream("PowerPoint Document")
    if (s == null || s.length < 8) return null
    val atoms = Vector.newBuilder[String]
    var records = 0

    /** Walk one record region [at, end); false = decline. */
    def walk(at0: Int, end: Int, depth: Int): Boolean = {
      if (depth > MaxDepth) return false
      var at = at0
      while (at < end) {
        if (at + 8 > end) return false
        records += 1
        if (records > MaxRecords) return false
        val verInst = u16(s, at)
        val typ = u16(s, at + 2)
        val len = u32(s, at + 4)
        val payload = at + 8
        if (len < 0 || payload + len > end) return false
        if (typ == 0x2F14) return false // CryptSession10: encrypted
        if ((verInst & 0x0F) == 0x0F) {
          // container: recurse into the nested records — EXCEPT the
          // master (recInstance 1) and notes (recInstance 2)
          // SlideListWithText variants, whose atoms are presentation
          // chrome ("Click to edit Master title style") and speaker
          // notes, not deck text (the ODP walk skips notes the same
          // way); instance 0 is the slide list this tier serves
          val inst = verInst >>> 4
          if (!(typ == 0x0FF0 && (inst == 1 || inst == 2))) {
            if (!walk(payload, (payload + len).toInt, depth + 1)) return false
          }
        } else if (typ == 0x0FA0) { // TextCharsAtom: UTF-16LE
          if (len % 2 != 0) return false
          val t = decodeUtf16le(s, payload, len.toInt)
          if (t == null) return false
          atoms += t
        } else if (typ == 0x0FA8) { // TextBytesAtom: low bytes
          val cs = new Array[Char](len.toInt)
          var i = 0
          while (i < len) { cs(i) = (s(payload + i) & 0xFF).toChar; i += 1 }
          val t = normalize(new String(cs))
          if (t == null) return false
          atoms += t
        }
        at = (payload + len).toInt
      }
      true
    }
    if (!walk(0, streamEnd(s), 0)) return null
    val out = atoms.result()
    if (out.isEmpty) return null // a deck with no text atoms: decline
    val joined = out.mkString("\n")
    if (joined.length > MaxOut) return null
    UTF8String.fromString(joined)
  }

  /** The stream's record region ends where trailing container padding
    * begins: records are self-delimiting, so the walk region is the
    * last position a full record header fits before an all-zero tail
    * (the CFB sector rounding). */
  private def streamEnd(s: Array[Byte]): Int = {
    var end = s.length
    while (end > 0 && s(end - 1) == 0) end -= 1
    // a trailing run of zeros could also be real atom payload ending
    // in NULs — records re-extend the region themselves: walk from
    // the front consuming whole records until the zero tail
    var at = 0
    while (at + 8 <= s.length) {
      val len = u32(s, at + 4)
      val next = at + 8 + len
      if (len < 0 || next > s.length) return at // malformed: let walk decline
      at = next.toInt
      if (at >= end) return at
    }
    at
  }

  private def decodeUtf16le(s: Array[Byte], off: Int, nBytes: Int): String = {
    val n = nBytes / 2
    val cs = new Array[Char](n)
    var i = 0
    while (i < n) {
      cs(i) = (((s(off + 2 * i + 1) & 0xFF) << 8) | (s(off + 2 * i) & 0xFF)).toChar
      i += 1
    }
    var k = 0
    while (k < n) {
      val c = cs(k)
      if (Character.isHighSurrogate(c)) {
        if (k + 1 >= n || !Character.isLowSurrogate(cs(k + 1))) return null
        k += 2
      } else if (Character.isLowSurrogate(c)) return null
      else k += 1
    }
    normalize(new String(cs))
  }

  /** CR/VT → '\n', TAB stays, other C0 controls decline. */
  private def normalize(t: String): String = {
    val sb = new java.lang.StringBuilder(t.length)
    var i = 0
    while (i < t.length) {
      val c = t.charAt(i)
      if (c >= 0x20 || Character.isSurrogate(c)) sb.append(c)
      else if (c == 0x0D || c == 0x0B) sb.append('\n')
      else if (c == 0x09) sb.append('\t')
      else return null
      i += 1
    }
    sb.toString
  }
}

/** `graft_ppt_encode(seed, n_slides)` → binary: a REAL PowerPoint 97
  * stream in a REAL CFB container — a DocumentContainer holding a
  * SlideListWithText whose per-slide text alternates TextBytesAtom
  * (Latin-1-expressible, with a CR paragraph mark) and TextCharsAtom
  * (UTF-16 with € and an astral pair), TextHeaderAtoms as inert
  * neighbors — all (seed, i) arithmetic for the oracle
  * ([[PptEncode.decodedSlide]]). Odd seeds append master- and
  * notes-instance SlideListWithText containers whose atoms the walk
  * must SKIP (presentation chrome, not deck text) — the contract
  * string never mentions them, so the hash-exact oracle is the pin. */
case class PptEncode(children: Seq[Expression]) extends Expression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = {
    val expected = Seq(LongType, IntegerType)
    if (children.length == 2 && children.map(_.dataType) == expected)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_ppt_encode expects (long seed, int n_slides)")
  }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_ppt_encode"

  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.exists(_ == null)) null
    else PptEncode.encode(vs(0).asInstanceOf[Long], vs(1).asInstanceOf[Int])
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): PptEncode =
    copy(children = newChildren)
}

object PptEncode {

  /** What [[PptText]] must decode slide i (1-based) to — the oracle's
    * contract: even slides a TextBytesAtom (two CR-separated lines,
    * Latin-1 é), odd slides a TextCharsAtom (€ and 𝄞). */
  def decodedSlide(seed: Long, i: Int): String =
    if (i % 2 == 0) s"Deck $seed slide $i café\nline ${(seed + i) % 8}"
    else s"Deck $seed slide $i € 𝄞 k=${(seed + i) % 8}"

  private def hdr(verInst: Int, typ: Int, len: Int): Array[Byte] =
    Array(verInst.toByte, (verInst >> 8).toByte, typ.toByte, (typ >> 8).toByte,
      len.toByte, (len >> 8).toByte, (len >> 16).toByte, (len >> 24).toByte)

  def encode(seed: Long, nSlides: Int): Array[Byte] = {
    if (seed < 0 || nSlides < 1 || nSlides > 64) return null
    val slideRecs = new scala.collection.mutable.ArrayBuffer[Array[Byte]]()
    var i = 1
    while (i <= nSlides) {
      // an inert TextHeaderAtom (type 0x0F9F): the walk must skip it
      slideRecs += (hdr(0x0000, 0x0F9F, 4) ++ Array[Byte](1, 0, 0, 0))
      if (i % 2 == 0) {
        val text = s"Deck $seed slide $i café\rline ${(seed + i) % 8}"
        val bytes = text.map(_.toByte).toArray
        slideRecs += (hdr(0x0000, 0x0FA8, bytes.length) ++ bytes)
      } else {
        val text = s"Deck $seed slide $i € 𝄞 k=${(seed + i) % 8}"
        val bytes = text.getBytes("UTF-16LE")
        slideRecs += (hdr(0x0000, 0x0FA0, bytes.length) ++ bytes)
      }
      i += 1
    }
    val slwtBody = slideRecs.toArray.flatten
    val slwt = hdr(0x000F, 0x0FF0, slwtBody.length) ++ slwtBody
    // odd seeds carry master- and notes-instance SlideListWithText
    // containers whose atoms must stay OUT of the served text (the
    // contract string never mentions them — the fixture round trip is
    // the pin)
    val chrome =
      if (seed % 2 == 1) {
        val master = s"Click to edit Master title style $seed"
          .map(_.toByte).toArray
        val note = s"Speaker note for deck $seed".map(_.toByte).toArray
        hdr(0x001F, 0x0FF0, 8 + master.length) ++
          hdr(0x0000, 0x0FA8, master.length) ++ master ++
          hdr(0x002F, 0x0FF0, 8 + note.length) ++
          hdr(0x0000, 0x0FA8, note.length) ++ note
      } else Array.empty[Byte]
    val doc = hdr(0x000F, 0x03E8, slwt.length + chrome.length) ++ slwt ++ chrome
    val stream = java.util.Arrays.copyOf(doc, math.max(4096, doc.length))
    DocEncode.cfbContainer("PowerPoint Document", stream, "Current User",
      Array[Byte](0x0F, 0x00, 0x00, 0x00))
  }
}
