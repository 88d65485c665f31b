package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** PDF triage — the dominant DOCUMENT format in every web crawl, from
  * the public ISO 32000 grammar alone. This is the cheap structural
  * pass a corpus pipeline runs before any text extraction: version,
  * page count, encryption, and object census — enough to cohort,
  * cap, and route documents without parsing a single content stream.
  *
  * `graft_pdf_meta(binary)` → `struct<version string, n_pages int,
  * encrypted boolean, n_objects int>`, by the real xref walk (not a
  * regex scan — a content stream may legally CONTAIN the bytes
  * "/Type /Page"):
  *
  *  1. header `%PDF-d.d` at byte 0 → version;
  *  2. `startxref` + offset + `%%EOF` located in the file tail;
  *  3. the cross-reference table at that offset: `xref`, subsection
  *     headers `start count`, then exactly-20-byte entries; the
  *     trailer dictionary's /Size, /Root, /Encrypt, /Prev;
  *  4. incremental updates followed through /Prev (bounded chain,
  *     newest section wins per object — the spec's shadowing rule);
  *  5. /Root → the Catalog object (`/Type /Catalog`, its /Pages ref);
  *  6. /Pages → the page-tree ROOT's /Count, which ISO 32000 defines
  *     as the number of LEAF pages under it — no tree recursion
  *     needed (and none performed: hostile self-referential trees
  *     cannot loop a walk that never descends);
  *  - `n_objects` = in-use (`n`) xref entries after shadowing;
  *  - `encrypted` = the trailer carries /Encrypt.
  *
  * Parse-or-NULL: every offset bounds-checked, the xref entry census
  * capped at 8192, the /Prev chain at 8 hops, object dictionaries
  * scanned in a 2 KiB window; cross-reference STREAMS (1.5+) decline
  * (their parse needs DEFLATE + the object-stream grammar — a later
  * tier), as does a missing or lying table. Hostile bytes NULL,
  * never throw or overrun. */
case class PdfMeta(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_pdf_meta expects a binary column, got ${child.dataType.catalogString}")
  override def dataType: DataType = PdfMeta.schema
  override def nullable: Boolean = true
  override def prettyName: String = "graft_pdf_meta"

  override def nullSafeEval(input: Any): Any =
    PdfMeta.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => s"""
      ${ev.value} = graft.plans.PdfMeta.parse($b);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): PdfMeta =
    copy(child = newChild)
}

object PdfMeta {

  val schema: StructType = StructType(Seq(
    StructField("version", StringType),
    StructField("n_pages", IntegerType),
    StructField("encrypted", BooleanType),
    StructField("n_objects", IntegerType)))

  private val MaxEntries = 8192
  private val MaxPrevHops = 8
  // wide enough for a 512-page /Kids array (the encoder's cap)
  private val DictWindow = 16384

  private def isWs(c: Int): Boolean =
    c == ' ' || c == '\n' || c == '\r' || c == '\t' || c == '\f' || c == 0

  /** Cursor-style tokenizer over the byte array; all methods bounds-
    * checked, failure = -1 / None. */
  private final class Cur(val b: Array[Byte], var i: Int) {
    def ok: Boolean = i >= 0 && i <= b.length
    def skipWs(): Unit = {
      var guard = 0
      while (i < b.length && guard < (1 << 20)) {
        if (isWs(b(i) & 0xFF)) i += 1
        else if (b(i) == '%') { // comment to EOL
          while (i < b.length && b(i) != '\n' && b(i) != '\r') i += 1
        } else return
        guard += 1
      }
    }
    def keyword(s: String): Boolean = {
      skipWs()
      if (i + s.length > b.length) return false
      var j = 0
      while (j < s.length) {
        if (b(i + j) != s.charAt(j)) return false
        j += 1
      }
      i += s.length
      true
    }
    /** A NAME token: the keyword followed by a delimiter — "/Prev2"
      * must not match "/Prev" (ISO 32000 names end at whitespace or a
      * delimiter character). */
    def name(s: String): Boolean = {
      val mark = i
      if (!keyword(s)) return false
      if (i >= b.length) return true
      val c = b(i) & 0xFF
      val delim = isWs(c) || c == '/' || c == '[' || c == ']' ||
        c == '<' || c == '>' || c == '(' || c == ')' || c == '%'
      if (!delim) { i = mark; false } else true
    }
    def int(): Long = {
      skipWs()
      val start = i
      var v = 0L
      while (i < b.length && b(i) >= '0' && b(i) <= '9' && i - start < 15) {
        v = v * 10 + (b(i) - '0'); i += 1
      }
      if (i == start) -1L else v
    }
  }

  /** The trailer facts of one xref SECTION. */
  private final case class Section(rootObj: Long, encrypted: Boolean,
      prev: Long)

  /** Parse one classic xref table at `off` into `entries` (first-writer
    * = newest-section wins; callers walk newest → oldest). Returns the
    * section's trailer facts, or None on any structural failure. */
  private def xrefSection(b: Array[Byte], off: Long,
      entries: java.util.HashMap[Long, (Long, Boolean)]): Option[Section] = {
    if (off < 0 || off >= b.length) return None
    val c = new Cur(b, off.toInt)
    if (!c.keyword("xref")) return None // an xref STREAM starts "N 0 obj": declines here
    var guard = 0
    c.skipWs()
    while (!c.keyword("trailer")) {
      val start = c.int()
      val count = c.int()
      if (start < 0 || count < 0 || count > MaxEntries ||
        entries.size + count > MaxEntries) return None
      // entries are exactly 20 bytes each, immediately after the EOL
      c.skipWs()
      var k = 0L
      while (k < count) {
        if (c.i + 20 > b.length) return None
        val entry = new String(b, c.i, 20, "ISO-8859-1")
        val eOff = entry.substring(0, 10)
        val eType = entry.charAt(17)
        if (!eOff.forall(_.isDigit) || entry.charAt(10) != ' ' ||
          entry.charAt(16) != ' ' || (eType != 'n' && eType != 'f')) return None
        val objNum = start + k
        if (!entries.containsKey(objNum))
          entries.put(objNum, (eOff.toLong, eType == 'n'))
        c.i += 20
        k += 1
      }
      c.skipWs()
      guard += 1
      if (guard > 64) return None
    }
    // trailer dictionary: only the keys the triage needs
    c.skipWs()
    if (!c.keyword("<<")) return None
    var root = -1L
    var prev = -1L
    var enc = false
    var depth = 1
    val dictStart = c.i
    while (depth > 0 && c.i < b.length && c.i - dictStart < DictWindow) {
      c.skipWs()
      if (c.keyword("<<")) depth += 1
      else if (c.keyword(">>")) depth -= 1
      else if (depth == 1 && c.name("/Root")) {
        root = c.int()
        if (c.int() < 0 || !c.keyword("R")) return None
      } else if (depth == 1 && c.name("/Prev")) {
        prev = c.int()
        if (prev < 0) return None
      } else if (depth == 1 && c.name("/Encrypt")) enc = true
      else c.i += 1
    }
    if (depth != 0) return None
    Some(Section(root, enc, prev))
  }

  /** Scan an object's dictionary (bounded window at its xref offset)
    * for `/key a b R` → a, or for `/key N` → N when `ref` is false. */
  private def objField(b: Array[Byte], off: Long, objType: String,
      key: String, ref: Boolean): Long = {
    if (off < 0 || off >= b.length) return -1L
    val c = new Cur(b, off.toInt)
    // "N G obj" header
    if (c.int() < 0 || c.int() < 0 || !c.keyword("obj")) return -1L
    if (!c.keyword("<<")) return -1L
    var typeOk = objType.isEmpty
    var value = -1L
    var depth = 1
    val dictStart = c.i
    while (depth > 0 && c.i < b.length && c.i - dictStart < DictWindow) {
      c.skipWs()
      if (c.keyword("<<")) depth += 1
      else if (c.keyword(">>")) depth -= 1
      else if (depth == 1 && objType.nonEmpty && c.name("/Type") && {
        c.skipWs(); c.name("/" + objType)
      }) typeOk = true
      else if (depth == 1 && c.name(key)) {
        val v = c.int()
        if (v < 0) return -1L
        if (ref) { if (c.int() < 0 || !c.keyword("R")) return -1L }
        value = v
      } else c.i += 1
    }
    if (depth == 0 && typeOk) value else -1L
  }

  def parse(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 32) return null
    // 1. header
    if (!(b(0) == '%' && b(1) == 'P' && b(2) == 'D' && b(3) == 'F' &&
      b(4) == '-' && b(5).toChar.isDigit && b(6) == '.' &&
      b(7).toChar.isDigit)) return null
    val version = new String(b, 5, 3, "ISO-8859-1")
    // 2. startxref in the tail
    val tailStart = math.max(0, b.length - 128)
    val tail = new String(b, tailStart, b.length - tailStart, "ISO-8859-1")
    val sx = tail.lastIndexOf("startxref")
    if (sx < 0) return null
    val c = new Cur(b, tailStart + sx + "startxref".length)
    val xrefOff = c.int()
    // %%EOF is LEXICALLY a comment (the skipper would swallow it), so
    // it is located textually like startxref was
    if (xrefOff < 0 ||
      tail.indexOf("%%EOF", c.i - tailStart) < 0) return null
    // 3.+4. the xref chain, newest first
    val entries = new java.util.HashMap[Long, (Long, Boolean)]()
    var rootObj = -1L
    var encrypted = false
    var off = xrefOff
    var hops = 0
    while (off >= 0 && hops < MaxPrevHops) {
      xrefSection(b, off, entries) match {
        case None => return null
        case Some(s) =>
          if (rootObj < 0 && s.rootObj >= 0) rootObj = s.rootObj
          encrypted |= s.encrypted
          off = s.prev
          hops += 1
      }
    }
    if (off >= 0) return null // /Prev chain exceeded the hop bound
    if (rootObj < 0) return null
    var nObjects = 0
    val it = entries.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getValue._2 && e.getKey != 0L) nObjects += 1
    }
    // 5. Root → Catalog → /Pages ref
    val rootEntry = entries.get(rootObj)
    if (rootEntry == null || !rootEntry._2) return null
    val pagesObj = objField(b, rootEntry._1, "Catalog", "/Pages", ref = true)
    if (pagesObj < 0) return null
    // 6. page-tree root → /Count
    val pagesEntry = entries.get(pagesObj)
    if (pagesEntry == null || !pagesEntry._2) return null
    val count = objField(b, pagesEntry._1, "Pages", "/Count", ref = false)
    if (count < 0 || count > Int.MaxValue) return null
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(version), count.toInt, encrypted, nObjects))
  }
}

/** `graft_pdf_encode(seed, n_pages, minor, encrypted)` → binary: a
  * structurally complete classic-xref PDF for the fixture corpus —
  * header `%PDF-1.<minor>`, a seed-length comment (so xref offsets
  * vary across the corpus), Catalog → Pages (with /Count and real
  * /Kids refs) → one Page object per page, an optional /Encrypt
  * dictionary, a byte-exact cross-reference table over all of it, and
  * the trailer/startxref/%%EOF epilogue. Every field the triage
  * reports derives from (seed, n_pages, minor, encrypted), so the
  * DuckDB oracle restates it exactly. */
case class PdfEncode(children: Seq[Expression]) extends Expression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = {
    val expected = Seq(LongType, IntegerType, IntegerType, BooleanType)
    if (children.length == 4 && children.map(_.dataType) == expected)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_pdf_encode expects (long seed, int n_pages, int minor, boolean encrypted)")
  }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_pdf_encode"

  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.exists(_ == null)) null
    else PdfEncode.encode(vs(0).asInstanceOf[Long], vs(1).asInstanceOf[Int],
      vs(2).asInstanceOf[Int], vs(3).asInstanceOf[Boolean])
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): PdfEncode = copy(children = newChildren)
}

object PdfEncode {

  def encode(seed: Long, nPages: Int, minor: Int, encrypted: Boolean): Array[Byte] = {
    if (seed < 0 || nPages < 1 || nPages > 512 || minor < 0 || minor > 7) return null
    val sb = new StringBuilder()
    val offsets = new scala.collection.mutable.ArrayBuffer[Int]()
    def obj(body: String): Unit = {
      offsets += sb.length
      sb.append(s"${offsets.length} 0 obj\n$body\nendobj\n")
    }
    sb.append(s"%PDF-1.$minor\n")
    // seed-length binary-ish comment: offsets vary across the corpus
    sb.append("%")
    val filler = (seed % 48).toInt + 4
    var i = 0
    while (i < filler) { sb.append(('A' + ((seed + 13 * i) % 26)).toChar); i += 1 }
    sb.append("\n")
    obj("<< /Type /Catalog /Pages 2 0 R >>")
    val kids = (0 until nPages).map(p => s"${3 + p} 0 R").mkString(" ")
    obj(s"<< /Type /Pages /Kids [ $kids ] /Count $nPages >>")
    (0 until nPages).foreach { _ =>
      obj("<< /Type /Page /Parent 2 0 R /MediaBox [ 0 0 612 792 ] >>")
    }
    if (encrypted)
      obj("<< /Filter /Standard /V 1 /R 2 >>")
    val size = offsets.length + 1
    val xrefAt = sb.length
    sb.append(s"xref\n0 $size\n")
    sb.append("0000000000 65535 f \n")
    offsets.foreach(o => sb.append(f"$o%010d 00000 n \n"))
    sb.append(s"trailer\n<< /Size $size /Root 1 0 R")
    if (encrypted) sb.append(s" /Encrypt ${offsets.length} 0 R")
    sb.append(s" >>\nstartxref\n$xrefAt\n%%EOF\n")
    sb.toString.getBytes("ISO-8859-1")
  }
}
