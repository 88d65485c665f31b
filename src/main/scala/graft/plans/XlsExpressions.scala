package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Excel 97-2003 binary cell extraction (MS-XLS BIFF8, an open
  * Microsoft spec) — the spreadsheet member of the CFB family
  * ([[CfbParse]]). The Workbook stream is a sequence of BIFF records
  * (2-byte type, 2-byte length, payload, all little-endian):
  *
  *  - the GLOBALS substream (BOF dt=0x0005) carries BoundSheet8
  *    records (each sheet's absolute substream position + name) and
  *    the Shared String Table (SST: XLUnicodeRichExtendedString
  *    entries — 1- or 2-byte chars by fHighByte, rich runs and
  *    ExtRst skipped by their own declared lengths);
  *  - the FIRST sheet's substream (BOF dt=0x0010, at BoundSheet8's
  *    lbPlyPos — the xlsx/ods first-sheet parity) serves its cells:
  *    LabelSst (SST index), Number (IEEE double), RK (the packed
  *    30-bit form: fX100 / fInt), and MulRk runs;
  *  - Formula cells (0x0006) serve their CACHED RESULT (the value the
  *    last save computed, stored in the record — this tier never
  *    evaluates formulas): an IEEE double renders like Number; the
  *    0xFFFF-tagged forms serve a following String record (type 0 —
  *    ShrFmla/Array/Table records may sit between, any other record
  *    first declines), a boolean (type 1 → TRUE/FALSE), or the empty
  *    string (type 3); a cached ERROR (type 2) serves the spec's
  *    enumerated error literal (#DIV/0!, #N/A, …);
  *  - Label (0x0204, the inline non-SST string cell) and BoolErr
  *    (0x0205: booleans as TRUE/FALSE, errors as their enumerated
  *    literals) serve;
  *  - a cell-BEARING record this tier does not serve — RString —
  *    DECLINES the document: silently dropping cell content would be
  *    an unfaithful grid;
  *  - an SST spilling into Continue records (any real spreadsheet
  *    with more than ~8 KiB of strings — the 8224-byte record cap)
  *    PARSES: the SST's data is the concatenation of the SST record
  *    and its immediately-following Continue records, EXCEPT that a
  *    string's character data resuming in a new Continue re-declares
  *    its fHighByte in a fresh option byte (which may DIFFER from the
  *    original — a compressed string may resume as UTF-16 and vice
  *    versa, per 2.5.293); fixed fields (cch/flags/cRun/cbExt) must
  *    not straddle a record boundary, rich-run and ExtRst bytes skip
  *    across boundaries raw, and a 2-byte character split across the
  *    boundary or reserved bits in the re-declared option byte
  *    decline;
  *  - a Continue record in the SHEET substream following a record
  *    type this tier serves declines (it would carry cell content
  *    the walk cannot faithfully re-attach); after inert records it
  *    is inert;
  *  - FilePass (encryption) declines.
  *
  * `graft_xls_cells(binary)` → `array<struct<row int, col int, value
  * string>>`, 1-based coordinates in record order; numbers render
  * minimally (integral doubles without the trailing ".0"). NULL on
  * any structural failure — faithful-or-NULL. */
case class XlsCells(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_xls_cells expects a binary column, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(XlsCells.cellSchema, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_xls_cells"

  override def nullSafeEval(input: Any): Any =
    XlsCells.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => s"""
      ${ev.value} = graft.plans.XlsCells.parse($b);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): XlsCells =
    copy(child = newChild)
}

object XlsCells {

  val cellSchema: StructType = StructType(Seq(
    StructField("row", IntegerType),
    StructField("col", IntegerType),
    StructField("value", StringType)))

  private val MaxCells = 65536
  private val MaxSstEntries = 65536

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)
  private def u32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xFFL)) | ((b(o + 1) & 0xFFL) << 8) |
      ((b(o + 2) & 0xFFL) << 16) | ((b(o + 3) & 0xFFL) << 24)

  /** Minimal double rendering: integral values without ".0" (the
    * grid's values are text for the census; DuckDB's VARCHAR cast of
    * an integer matches). */
  private def renderNum(d: Double): String = {
    if (d.isNaN || d.isInfinite) return null
    if (d == math.floor(d) && math.abs(d) < 1e15) d.toLong.toString
    else d.toString
  }

  /** RkNumber (MS-XLS 2.5.217): bit0 fX100, bit1 fInt, bits 2-31 the
    * value (a 30-bit signed int, or the TOP 30 bits of an IEEE
    * double). */
  private def rkValue(rk: Long): Double = {
    val fX100 = (rk & 1L) != 0
    val fInt = (rk & 2L) != 0
    val v =
      if (fInt) {
        val raw = (rk >> 2) & 0x3FFFFFFFL
        val signed = if ((raw & 0x20000000L) != 0) raw - 0x40000000L else raw
        signed.toDouble
      } else java.lang.Double.longBitsToDouble((rk & 0xFFFFFFFCL) << 32)
    if (fX100) v / 100.0 else v
  }

  /** A read cursor over the SST record's data and its Continue
    * records' data, as a sequence of (offset, length) segments of the
    * workbook stream. Fixed fields refuse to straddle a segment
    * boundary; character data re-declares fHighByte at each boundary
    * it resumes past (MS-XLS 2.5.293); raw skips cross boundaries
    * byte-wise. */
  private final class SstCursor(b: Array[Byte], offs: Array[Int], lens: Array[Int]) {
    private var si = 0
    private var off = offs(0)
    private def segEnd: Int = offs(si) + lens(si)
    /** Hop to the next non-exhausted segment (no option byte — fixed
      * fields and raw skips resume verbatim). False at end-of-data. */
    private def hop(): Boolean = {
      while (off == segEnd) {
        if (si == offs.length - 1) return false
        si += 1; off = offs(si)
      }
      true
    }
    /** Absolute offset of an n-byte fixed field, or -1 when it would
      * straddle a boundary (writers never split cch/flags/cRun/cbExt). */
    def fixed(n: Int): Int = {
      if (!hop()) return -1
      if (off + n > segEnd) return -1
      val o = off; off += n; o
    }
    /** True when every byte of the record chain is consumed — the
      * post-parse exhaustion check: trailing bytes after the last
      * string (or an orphan Continue the collection loop absorbed)
      * mean the count and the data disagree. */
    def exhausted: Boolean = !hop()
    /** Skip n raw bytes (rich runs, ExtRst) across boundaries. */
    def skip(n: Long): Boolean = {
      var rem = n
      while (rem > 0) {
        if (!hop()) return false
        val take = math.min(rem, (segEnd - off).toLong)
        off += take.toInt; rem -= take
      }
      true
    }
    /** Read cch characters starting under flags0's fHighByte; every
      * boundary crossed while characters remain consumes a fresh
      * option byte (only bit 0 may be set) that may CHANGE the width.
      * Null on straddled 2-byte chars, reserved bits, or truncation. */
    def chars(cch: Int, high0: Boolean): String = {
      val sb = new java.lang.StringBuilder(cch)
      var high = high0
      var rem = cch
      while (rem > 0) {
        if (off == segEnd) {
          if (!hop()) return null
          // the resumed character data re-declares its width
          if (off + 1 > segEnd) return null
          val f = b(off) & 0xFF
          if ((f & 0xFE) != 0) return null
          high = (f & 1) != 0
          off += 1
          if (off == segEnd) return null // an option byte with no chars
        }
        val per = if (high) 2 else 1
        val avail = (segEnd - off) / per
        if (avail == 0) return null // a split 2-byte character
        val take = math.min(rem, avail)
        var i = 0
        if (high) {
          while (i < take) {
            sb.append((((b(off + 2 * i) & 0xFF)) |
              ((b(off + 2 * i + 1) & 0xFF) << 8)).toChar)
            i += 1
          }
        } else {
          // low bytes of UTF-16 code units: the Latin-1 view
          while (i < take) { sb.append((b(off + i) & 0xFF).toChar); i += 1 }
        }
        off += take * per
        rem -= take
      }
      sb.toString
    }
  }

  def parse(b: Array[Byte]): GenericArrayData = {
    val cfb = CfbParse.open(b)
    if (cfb == null) return null
    val wb = cfb.stream("Workbook")
    if (wb == null) return null

    // ---- the globals substream: BoundSheet8 positions + the SST ----
    if (wb.length < 8 || u16(wb, 0) != 0x0809) return null
    val sst = new scala.collection.mutable.ArrayBuffer[String]()
    var sawSst = false
    var firstSheetAt = -1L
    var at = 0
    var inGlobals = true
    while (inGlobals) {
      if (at + 4 > wb.length) return null
      val typ = u16(wb, at)
      val len = u16(wb, at + 2)
      val payload = at + 4
      var nextAt = payload + len
      if (payload + len > wb.length) return null
      typ match {
        case 0x000A => inGlobals = false // EOF: globals done
        case 0x002F => return null // FilePass: encrypted workbook
        case 0x0085 => // BoundSheet8
          if (len < 8) return null
          val pos = u32(wb, payload)
          if (firstSheetAt < 0) firstSheetAt = pos
        case 0x00FC => // SST (+ its Continue spill, MS-XLS 2.5.293)
          if (len < 8) return null
          // BIFF8 defines exactly ONE SST per globals substream; a
          // second would shift every LabelSst index — decline, never
          // serve a misresolved grid
          if (sawSst) return null
          sawSst = true
          val offsB = scala.collection.mutable.ArrayBuffer[Int](payload + 8)
          val lensB = scala.collection.mutable.ArrayBuffer[Int](len - 8)
          while (nextAt + 4 <= wb.length && u16(wb, nextAt) == 0x003C) {
            val clen = u16(wb, nextAt + 2)
            if (nextAt + 4 + clen > wb.length) return null
            offsB += nextAt + 4
            lensB += clen
            nextAt += 4 + clen
          }
          val cur = new SstCursor(wb, offsB.toArray, lensB.toArray)
          val unique = u32(wb, payload + 4)
          if (unique < 0 || unique > MaxSstEntries) return null
          var k = 0L
          while (k < unique) {
            val h = cur.fixed(3)
            if (h < 0) return null
            val cch = u16(wb, h)
            val flags = wb(h + 2) & 0xFF
            if ((flags & 0xF2) != 0) return null // reserved bits
            val high = (flags & 0x01) != 0
            val rich = (flags & 0x08) != 0
            val ext = (flags & 0x04) != 0
            var cRun = 0
            var cbExt = 0L
            if (rich) {
              val o = cur.fixed(2)
              if (o < 0) return null
              cRun = u16(wb, o)
            }
            if (ext) {
              val o = cur.fixed(4)
              if (o < 0) return null
              cbExt = u32(wb, o)
            }
            val s = cur.chars(cch, high)
            if (s == null) return null
            if (s.exists(c => Character.isSurrogate(c))) {
              // lone surrogates cannot ride
              var i = 0
              val n = s.length
              while (i < n) {
                val c = s.charAt(i)
                if (Character.isHighSurrogate(c)) {
                  if (i + 1 >= n || !Character.isLowSurrogate(s.charAt(i + 1)))
                    return null
                  i += 2
                } else if (Character.isLowSurrogate(c)) return null
                else i += 1
              }
            }
            if (cbExt < 0 || !cur.skip(cRun * 4L) || !cur.skip(cbExt))
              return null
            sst += s
            k += 1
          }
          // cstTotal strings read: the record chain must be spent —
          // leftover bytes (or an absorbed orphan Continue) mean the
          // declared count and the data disagree; faithful-or-NULL
          if (!cur.exhausted) return null
        case _ => () // formatting and bookkeeping records: inert
      }
      if (typ != 0x000A) at = nextAt
    }
    if (firstSheetAt < 0 || firstSheetAt + 8 > wb.length) return null

    // ---- the first sheet's substream --------------------------------
    at = firstSheetAt.toInt
    if (u16(wb, at) != 0x0809) return null
    val out = Vector.newBuilder[Any]
    var cells = 0
    def put(rw: Int, col: Int, v: String): Boolean = {
      if (v == null) return false
      cells += 1
      if (cells > MaxCells) return false
      out += new GenericInternalRow(Array[Any](
        rw + 1, col + 1, UTF8String.fromString(v)))
      true
    }
    // the spec's BErr error-code literals (MS-XLS 2.5.97.2)
    def errLit(code: Int): String = code match {
      case 0x00 => "#NULL!"
      case 0x07 => "#DIV/0!"
      case 0x0F => "#VALUE!"
      case 0x17 => "#REF!"
      case 0x1D => "#NAME?"
      case 0x24 => "#NUM!"
      case 0x2A => "#N/A"
      case _ => null
    }
    def validSurrogates(s: String): Boolean = {
      var i = 0
      val n = s.length
      while (i < n) {
        val c = s.charAt(i)
        if (Character.isHighSurrogate(c)) {
          if (i + 1 >= n || !Character.isLowSurrogate(s.charAt(i + 1)))
            return false
          i += 2
        } else if (Character.isLowSurrogate(c)) return false
        else i += 1
      }
      true
    }
    /** An in-record XLUnicodeString (cch, flags with only fHighByte,
      * chars) at wb(o), bounded by `end`. Null on malformed. */
    def uniString(o: Int, end: Int): String = {
      if (o + 3 > end) return null
      val cch = u16(wb, o)
      val flags = wb(o + 2) & 0xFF
      if ((flags & 0xFE) != 0) return null
      val high = (flags & 1) != 0
      val nBytes = if (high) cch * 2 else cch
      if (o + 3 + nBytes > end) return null
      val s =
        if (high) new String(wb, o + 3, nBytes, "UTF-16LE")
        else {
          val cs = new Array[Char](cch)
          var i = 0
          while (i < cch) { cs(i) = (wb(o + 3 + i) & 0xFF).toChar; i += 1 }
          new String(cs)
        }
      if (!validSurrogates(s)) null else s
    }
    var inSheet = true
    var prevServed = false // a Continue after a served record would carry cell content
    // a Formula whose cached result is a string: the (row, col) whose
    // value arrives in the NEXT String record
    var pendStrRw = -1
    var pendStrCol = -1
    while (inSheet) {
      if (at + 4 > wb.length) return null
      val typ = u16(wb, at)
      val len = u16(wb, at + 2)
      val p = at + 4
      if (p + len > wb.length) return null
      if (typ == 0x003C && prevServed) return null
      prevServed = typ == 0x00FD || typ == 0x0203 || typ == 0x027E ||
        typ == 0x00BD || typ == 0x0006 || typ == 0x0204 || typ == 0x0205 ||
        typ == 0x0207
      // an outstanding string-formula result tolerates only the
      // records the spec allows between Formula and String
      // (ShrFmla 0x04BC, Array 0x0221, Table 0x0236)
      if (pendStrRw >= 0 && typ != 0x0207 && typ != 0x04BC &&
        typ != 0x0221 && typ != 0x0236) return null
      typ match {
        case 0x000A => inSheet = false
        case 0x00FD => // LabelSst
          if (len < 10) return null
          val isst = u32(wb, p + 6)
          if (isst < 0 || isst >= sst.length) return null
          if (!put(u16(wb, p), u16(wb, p + 2), sst(isst.toInt))) return null
        case 0x0203 => // Number
          if (len < 14) return null
          var bits = 0L
          var i = 0
          while (i < 8) { bits |= (wb(p + 6 + i) & 0xFFL) << (8 * i); i += 1 }
          if (!put(u16(wb, p), u16(wb, p + 2),
            renderNum(java.lang.Double.longBitsToDouble(bits)))) return null
        case 0x027E => // RK
          if (len < 10) return null
          if (!put(u16(wb, p), u16(wb, p + 2),
            renderNum(rkValue(u32(wb, p + 6))))) return null
        case 0x00BD => // MulRk: rw, colFirst, (ixfe+rk)*n, colLast
          if (len < 6 || (len - 6) % 6 != 0) return null
          val rw = u16(wb, p)
          val colFirst = u16(wb, p + 2)
          val n = (len - 6) / 6
          if (u16(wb, p + len - 2) != colFirst + n - 1) return null
          var k = 0
          while (k < n) {
            if (!put(rw, colFirst + k,
              renderNum(rkValue(u32(wb, p + 4 + k * 6 + 2))))) return null
            k += 1
          }
        case 0x0006 => // Formula: serve the CACHED result, never evaluate
          if (len < 20) return null
          val rw = u16(wb, p)
          val c = u16(wb, p + 2)
          if (u16(wb, p + 12) == 0xFFFF) {
            (wb(p + 6) & 0xFF) match {
              case 0 => // string result: the next String record carries it
                pendStrRw = rw; pendStrCol = c
              case 1 =>
                if (!put(rw, c, if (wb(p + 8) != 0) "TRUE" else "FALSE"))
                  return null
              case 2 =>
                if (!put(rw, c, errLit(wb(p + 8) & 0xFF))) return null
              case 3 =>
                if (!put(rw, c, "")) return null
              case _ => return null
            }
          } else {
            var bits = 0L
            var i = 0
            while (i < 8) { bits |= (wb(p + 6 + i) & 0xFFL) << (8 * i); i += 1 }
            if (!put(rw, c, renderNum(java.lang.Double.longBitsToDouble(bits))))
              return null
          }
        case 0x0207 => // String: a string formula's cached result
          if (pendStrRw < 0) return null // orphaned String record
          val s = uniString(p, p + len)
          if (s == null) return null
          if (!put(pendStrRw, pendStrCol, s)) return null
          pendStrRw = -1; pendStrCol = -1
        case 0x0204 => // Label: the inline non-SST string cell
          if (len < 9) return null
          val s = uniString(p + 6, p + len)
          if (s == null) return null
          if (!put(u16(wb, p), u16(wb, p + 2), s)) return null
        case 0x0205 => // BoolErr
          if (len < 8) return null
          val v =
            if ((wb(p + 7) & 0xFF) == 0) { if (wb(p + 6) != 0) "TRUE" else "FALSE" }
            else if ((wb(p + 7) & 0xFF) == 1) errLit(wb(p + 6) & 0xFF)
            else null
          if (!put(u16(wb, p), u16(wb, p + 2), v)) return null
        case 0x00D6 =>
          // RString: cell content this tier does not serve — decline,
          // never silently drop
          return null
        case _ => () // dimensions, formats, window state...: inert
      }
      if (typ != 0x000A) at = p + len
    }
    new GenericArrayData(out.result().toArray[Any])
  }
}

/** `graft_xls_encode(seed, n_rows)` → binary: a REAL BIFF8 workbook in
  * a REAL CFB container — globals (BOF, BoundSheet8, SST with BOTH
  * string forms: compressed low-byte and fHighByte UTF-16, plus a
  * rich-run entry whose runs must be skipped), then the sheet
  * substream with LabelSst, Number, RK (integer AND fX100 forms), and
  * a MulRk run on every 3rd row — all (seed, r) arithmetic for the
  * oracle ([[XlsEncode.decodedRow]]).
  *
  * seed%5==2 workbooks write the SST SPLIT into a Continue record
  * (MS-XLS 2.5.293): one string's character data is cut after 3
  * characters and resumes in the Continue under a RE-DECLARED option
  * byte — always UTF-16, so a compressed victim exercises the width
  * CHANGE — and, when n_rows >= 2, the following string lives
  * entirely inside the Continue (the string-boundary case). The
  * decoded grid is IDENTICAL to the unsplit layout, so the oracle
  * and [[decodedRow]] are unchanged — the split is pure wire-format
  * variation, which is exactly what makes it a differential. */
case class XlsEncode(children: Seq[Expression]) extends Expression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = {
    val expected = Seq(LongType, IntegerType)
    if (children.length == 2 && children.map(_.dataType) == expected)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_xls_encode expects (long seed, int n_rows)")
  }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_xls_encode"

  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.exists(_ == null)) null
    else XlsEncode.encode(vs(0).asInstanceOf[Long], vs(1).asInstanceOf[Int])
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): XlsEncode =
    copy(children = newChildren)
}

object XlsEncode {

  /** What [[XlsCells]] must serve for row r (1-based): the oracle's
    * contract, (col, value) pairs in record order. Col A: an RK
    * (integer on even r, fX100 cents on odd). Col B: the SST string
    * (high-byte unicode "é€" tail on odd r). Col C: a Number double
    * (integral, renders without ".0"). Cols D,E on r%3==0: a MulRk
    * integer run. Col F: a Formula's CACHED result — a non-integral
    * double on even r ((seed+13r)%777 + .5), a String-record string
    * with a high-byte char on odd r. Col G: BoolErr — TRUE/FALSE on
    * even r (TRUE when r%4==0), the cached #DIV/0! error literal on
    * odd r. Col H on r%3==1: a Label inline string. */
  def decodedRow(seed: Long, r: Int): Seq[(Int, String)] = {
    val cents = (seed + 11 * r) % 500
    val a =
      if (r % 2 == 0) cents.toString
      else {
        val d = cents / 100.0
        if (d == math.floor(d)) d.toLong.toString else d.toString
      }
    val b = s"Row $r of wb $seed" + (if (r % 2 == 1) " é€" else " ok")
    val c = ((seed + 7 * r) % 1000).toString
    val base = Seq((1, a), (2, b), (3, c))
    val mul =
      if (r % 3 == 0)
        Seq((4, ((seed + r) % 90).toString), (5, ((seed + r) % 90 + 1).toString))
      else Seq.empty
    val f =
      if (r % 2 == 0) (6, s"${(seed + 13 * r) % 777}.5")
      else (6, s"Fml $r é${(seed + r) % 7}")
    val g =
      if (r % 2 == 0) (7, if (r % 4 == 0) "TRUE" else "FALSE")
      else (7, "#DIV/0!")
    val lbl =
      if (r % 3 == 1) Seq((8, s"Lbl $r of wb $seed")) else Seq.empty
    base ++ mul ++ Seq(f, g) ++ lbl
  }

  private def rec(typ: Int, payload: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](4 + payload.length)
    out(0) = typ.toByte; out(1) = (typ >> 8).toByte
    out(2) = payload.length.toByte; out(3) = (payload.length >> 8).toByte
    System.arraycopy(payload, 0, out, 4, payload.length)
    out
  }
  private def w16(v: Int): Array[Byte] = Array(v.toByte, (v >> 8).toByte)
  private def w32(v: Long): Array[Byte] =
    Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
  private def dbl(d: Double): Array[Byte] = {
    val bits = java.lang.Double.doubleToLongBits(d)
    (0 until 8).map(i => ((bits >> (8 * i)) & 0xFF).toByte).toArray
  }
  private def rkInt(v: Int): Array[Byte] = w32((v.toLong << 2) | 2L)
  private def rkX100Int(cents: Int): Array[Byte] =
    w32((cents.toLong << 2) | 3L) // fInt + fX100: cents / 100

  def encode(seed: Long, nRows: Int): Array[Byte] = {
    if (seed < 0 || nRows < 1 || nRows > 64) return null
    val bof = rec(0x0809, w16(0x0600) ++ w16(0x0005) ++ w16(0x0DBB) ++
      w16(0x07CC) ++ w32(0xC1L) ++ w32(0x0606L))
    val bofSheet = rec(0x0809, w16(0x0600) ++ w16(0x0010) ++ w16(0x0DBB) ++
      w16(0x07CC) ++ w32(0xC1L) ++ w32(0x0606L))

    // SST entries: one per row (cell B), compressed or high-byte; the
    // FIRST entry is a rich-run string (unused by any cell) whose
    // runs the walk must skip to stay aligned
    val sstEntries = new scala.collection.mutable.ArrayBuffer[Array[Byte]]()
    val rowStrings = new scala.collection.mutable.ArrayBuffer[String]()
    val richText = "skip me"
    sstEntries += (w16(richText.length) ++ Array(0x08.toByte) ++ w16(2) ++
      richText.getBytes("ISO-8859-1") ++ w32(0L) ++ w32(0x00010002L))
    var r = 1
    while (r <= nRows) {
      val s = s"Row $r of wb $seed" + (if (r % 2 == 1) " é€" else " ok")
      rowStrings += s
      if (r % 2 == 1)
        sstEntries += (w16(s.length) ++ Array(0x01.toByte) ++
          s.getBytes("UTF-16LE"))
      else
        sstEntries += (w16(s.length) ++ Array(0x00.toByte) ++
          s.map(c => c.toByte).toArray)
      r += 1
    }
    val sstHeader = w32(nRows + 1L) ++ w32(nRows + 1L)
    val sstRec =
      if (seed % 5 == 2) {
        // the Continue layout: cut the victim string's characters
        // after 3, resume them in the Continue under a re-declared
        // ALWAYS-UTF-16 option byte (a width change when the victim
        // was compressed), and carry every later entry wholly inside
        // the Continue
        val vi = math.max(1, nRows - 1) // victim row (1-based)
        val s = rowStrings(vi - 1)
        val origHigh = vi % 2 == 1
        val head = s.substring(0, 3)
        val tail = s.substring(3)
        val part1 = w16(s.length) ++
          Array((if (origHigh) 0x01 else 0x00).toByte) ++
          (if (origHigh) head.getBytes("UTF-16LE")
           else head.map(c => c.toByte).toArray)
        val part2 = Array(0x01.toByte) ++ tail.getBytes("UTF-16LE")
        val before = sstEntries.take(vi).toArray.flatten // rich + rows < vi
        val after = sstEntries.drop(vi + 1).toArray.flatten // rows > vi
        rec(0x00FC, sstHeader ++ before ++ part1) ++
          rec(0x003C, part2 ++ after)
      } else rec(0x00FC, sstHeader ++ sstEntries.toArray.flatten)

    // sheet cells
    val sheetCells = new scala.collection.mutable.ArrayBuffer[Array[Byte]]()
    r = 1
    while (r <= nRows) {
      val rw = r - 1
      if (r % 2 == 0)
        sheetCells += rec(0x027E, w16(rw) ++ w16(0) ++ w16(0) ++
          rkInt(((seed + 11 * r) % 500).toInt))
      else
        sheetCells += rec(0x027E, w16(rw) ++ w16(0) ++ w16(0) ++
          rkX100Int(((seed + 11 * r) % 500).toInt))
      sheetCells += rec(0x00FD, w16(rw) ++ w16(1) ++ w16(0) ++ w32(r.toLong))
      sheetCells += rec(0x0203, w16(rw) ++ w16(2) ++ w16(0) ++
        dbl(((seed + 7 * r) % 1000).toDouble))
      if (r % 3 == 0) {
        val v = ((seed + r) % 90).toInt
        sheetCells += rec(0x00BD, w16(rw) ++ w16(3) ++
          (w16(0) ++ rkInt(v)) ++ (w16(0) ++ rkInt(v + 1)) ++ w16(4))
      }
      // col F: a Formula with its CACHED result (an rgce the tier
      // never evaluates — ptgInt 7, 3 bytes)
      val rgce = w16(3) ++ Array(0x1E.toByte) ++ w16(7)
      if (r % 2 == 0) {
        sheetCells += rec(0x0006, w16(rw) ++ w16(5) ++ w16(0) ++
          dbl((seed + 13 * r) % 777 + 0.5) ++ w16(0) ++ w32(0L) ++ rgce)
      } else {
        // string result: FormulaValue = type 0 + 0xFFFF tail, the
        // value rides the FOLLOWING String record (high-byte form)
        sheetCells += rec(0x0006, w16(rw) ++ w16(5) ++ w16(0) ++
          Array[Byte](0, 0, 0, 0, 0, 0, 0xFF.toByte, 0xFF.toByte) ++
          w16(0) ++ w32(0L) ++ rgce)
        val s = s"Fml $r é${(seed + r) % 7}"
        sheetCells += rec(0x0207, w16(s.length) ++ Array(0x01.toByte) ++
          s.getBytes("UTF-16LE"))
      }
      // col G: BoolErr — a boolean on even rows, a cached #DIV/0! on odd
      if (r % 2 == 0)
        sheetCells += rec(0x0205, w16(rw) ++ w16(6) ++ w16(0) ++
          Array[Byte](if (r % 4 == 0) 1 else 0, 0))
      else
        sheetCells += rec(0x0205, w16(rw) ++ w16(6) ++ w16(0) ++
          Array[Byte](0x07, 1))
      // col H on r%3==1: a Label inline string (compressed form)
      if (r % 3 == 1) {
        val s = s"Lbl $r of wb $seed"
        sheetCells += rec(0x0204, w16(rw) ++ w16(7) ++ w16(0) ++
          w16(s.length) ++ Array(0x00.toByte) ++ s.map(ch => ch.toByte).toArray)
      }
      r += 1
    }
    val eof = rec(0x000A, new Array[Byte](0))

    // assemble: globals need BoundSheet8 whose lbPlyPos = the sheet
    // BOF's absolute offset — computed from the globals' own length
    val window2 = rec(0x023E, w16(0x06B6) ++ w16(0) ++ w16(0)) // inert noise
    val name = "Sheet1"
    def boundSheet(pos: Long): Array[Byte] =
      rec(0x0085, w32(pos) ++ w16(0) ++ Array(name.length.toByte, 0x00.toByte) ++
        name.getBytes("ISO-8859-1"))
    val globalsLen = bof.length + boundSheet(0).length + sstRec.length +
      window2.length + eof.length
    val globals = bof ++ boundSheet(globalsLen.toLong) ++ sstRec ++
      window2 ++ eof
    val sheet = bofSheet ++ sheetCells.toArray.flatten ++ eof
    val stream = globals ++ sheet
    // the Workbook stream takes the BIG (FAT) path; a summary stream
    // rides the MINI path so both container halves stay load-bearing
    val wb = java.util.Arrays.copyOf(stream, math.max(4096, stream.length))
    DocEncode.cfbContainer("Workbook", wb, "DocumentSummaryInformation",
      Array[Byte](0x01, 0x02, 0x03, 0x04))
  }
}
