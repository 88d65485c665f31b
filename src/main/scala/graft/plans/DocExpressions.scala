package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Word 97-2003 binary text extraction (MS-DOC, an open Microsoft
  * spec) — the one major crawl document family the ZIP-of-XML tier
  * cannot reach. A .doc is a CFB container ([[CfbParse]]); its text
  * lives behind the FIB + piece-table indirection:
  *
  *  - the WordDocument stream starts with the FIB: wIdent 0xA5EC,
  *    the fWhichTblStm flag (FIB base offset 0x000A bit 0x0200)
  *    picking the 1Table/0Table companion stream, ccpText (FibRgLw97,
  *    offset 0x004C) = the main document's character count, and
  *    fcClx/lcbClx (FibRgFcLcb97, offsets 0x01A2/0x01A6) locating
  *    the Clx inside the table stream;
  *  - the Clx (MS-DOC §2.9.38) is zero or more Prc property blocks
  *    (clxt 0x01, 2-byte length) followed by the Pcdt (clxt 0x02,
  *    4-byte lcb) holding the PlcPcd piece table: n+1 CPs then n
  *    8-byte PCDs, n = (lcb - 4) / 12;
  *  - each PCD's FcCompressed (§2.9.74) gives the piece's offset in
  *    the WordDocument stream and its form: fCompressed means 8-bit
  *    text at fc/2 decoded through the cp1252 table (the §2.9.74
  *    remap rows are exactly cp1252's high range), else UTF-16LE at
  *    fc;
  *  - pieces concatenate over CPs [0, ccpText) — the main document
  *    body (headers/footnotes live past ccpText and are not body
  *    text, the RTF/ODT discipline);
  *  - Word's control marks normalize: CR 0x0D (paragraph), VT 0x0B
  *    (line break), 0x0C (page/section break) → '\n'; cell/row mark
  *    0x07 → '\t'; TAB stays;
  *  - a field begin/separator/end (0x13/0x14/0x15), picture/object
  *    anchor (0x01/0x08/0x14), footnote auto-ref (0x02) or any other
  *    C0 control DECLINES the document — serving text with field
  *    plumbing silently dropped would be unfaithful (the recorded
  *    next tier);
  *  - the FIB fEncrypted flag (0x000A bit 0x0100) declines.
  *
  * Parse-or-NULL throughout: a missing WordDocument/table stream,
  * short FIB, a piece table whose CPs are not strictly increasing or
  * whose total differs from the Clx's own accounting, pieces outside
  * the stream, lone surrogates in a unicode piece, or an undefined
  * cp1252 byte in a compressed piece. */
case class DocText(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_doc_text expects a binary column, got ${child.dataType.catalogString}")
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_doc_text"

  override def nullSafeEval(input: Any): Any =
    DocText.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => s"""
      ${ev.value} = graft.plans.DocText.parse($b);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): DocText =
    copy(child = newChild)
}

object DocText {

  private val MaxChars = 1 << 20

  /** cp1252 byte → char, 0 = undefined (the WHATWG table the HTTP and
    * RTF tiers share; §2.9.74's remap rows are its high range). */
  private def cp1252(u: Int): Char =
    if (u < 0x80 || u >= 0xA0) u.toChar
    else HttpText.Cp1252High(u - 0x80)

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)
  private def u32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xFFL)) | ((b(o + 1) & 0xFFL) << 8) |
      ((b(o + 2) & 0xFFL) << 16) | ((b(o + 3) & 0xFFL) << 24)

  def parse(b: Array[Byte]): UTF8String = {
    val cfb = CfbParse.open(b)
    if (cfb == null) return null
    val wd = cfb.stream("WordDocument")
    if (wd == null || wd.length < 0x01AA) return null
    if (u16(wd, 0) != 0xA5EC) return null // wIdent
    val flags = u16(wd, 0x000A)
    if ((flags & 0x0100) != 0) return null // fEncrypted: decline
    val tableName = if ((flags & 0x0200) != 0) "1Table" else "0Table"
    val table = cfb.stream(tableName)
    if (table == null) return null
    val ccpText = u32(wd, 0x004C)
    if (ccpText < 1 || ccpText > MaxChars) return null
    val fcClx = u32(wd, 0x01A2)
    val lcbClx = u32(wd, 0x01A6)
    if (lcbClx < 5 || fcClx < 0 || fcClx + lcbClx > table.length) return null
    // the Clx: skip Prc blocks, land on the Pcdt
    var at = fcClx.toInt
    val clxEnd = (fcClx + lcbClx).toInt
    while (at < clxEnd && (table(at) & 0xFF) == 0x01) {
      if (at + 3 > clxEnd) return null
      val cb = u16(table, at + 1)
      at += 3 + cb
      if (at > clxEnd) return null
    }
    if (at + 5 > clxEnd || (table(at) & 0xFF) != 0x02) return null
    val lcb = u32(table, at + 1)
    at += 5
    if (lcb < 4 + 12 || (lcb - 4) % 12 != 0 || at + lcb > clxEnd) return null
    val n = ((lcb - 4) / 12).toInt
    // PlcPcd: n+1 CPs, then n PCDs
    val cps = new Array[Long](n + 1)
    var i = 0
    while (i <= n) { cps(i) = u32(table, at + i * 4); i += 1 }
    if (cps(0) != 0) return null
    i = 1
    while (i <= n) {
      if (cps(i) <= cps(i - 1)) return null // strictly increasing
      i += 1
    }
    if (cps(n) < ccpText) return null // pieces must cover the body
    val pcdAt = at + (n + 1) * 4
    val out = new java.lang.StringBuilder(math.min(ccpText, 65536L).toInt)
    var piece = 0
    var cp = 0L
    while (piece < n && cp < ccpText) {
      val po = pcdAt + piece * 8
      val fcRaw = u32(table, po + 2)
      val compressed = (fcRaw & 0x40000000L) != 0
      val fc = fcRaw & 0x3FFFFFFFL
      val pieceLen = math.min(cps(piece + 1), ccpText) - cps(piece)
      if (compressed) {
        val off = fc / 2
        if (off + pieceLen > wd.length) return null
        var k = 0L
        while (k < pieceLen) {
          val u = wd((off + k).toInt) & 0xFF
          val c = cp1252(u)
          if (c == 0) return null // undefined byte: decline
          if (!emit(out, c)) return null
          k += 1
        }
      } else {
        if (fc % 2 != 0 || fc + pieceLen * 2 > wd.length) return null
        var k = 0L
        while (k < pieceLen) {
          val c = u16(wd, (fc + k * 2).toInt).toChar
          // lone surrogates decline; a valid pair rides through as two
          // code units (both inside this piece — pieces split on CPs,
          // and a CP in a unicode piece IS one code unit)
          if (Character.isHighSurrogate(c)) {
            if (k + 1 >= pieceLen ||
              !Character.isLowSurrogate(u16(wd, (fc + (k + 1) * 2).toInt).toChar))
              return null
            out.append(c)
            out.append(u16(wd, (fc + (k + 1) * 2).toInt).toChar)
            k += 2
          } else if (Character.isLowSurrogate(c)) return null
          else {
            if (!emit(out, c)) return null
            k += 1
          }
        }
      }
      cp += pieceLen
      piece += 1
    }
    if (cp < ccpText) return null
    UTF8String.fromString(out.toString)
  }

  /** Word control-mark normalization; false = decline. */
  private def emit(out: java.lang.StringBuilder, c: Char): Boolean = {
    if (c >= 0x20) { out.append(c); true }
    else if (c == 0x0D || c == 0x0B || c == 0x0C) { out.append('\n'); true }
    else if (c == 0x07 || c == 0x09) { out.append('\t'); true }
    else false // fields, anchors, footnote refs: the next tier
  }
}

/** `graft_doc_encode(seed, n_paras)` → binary: a REAL Word 97 binary
  * document inside a REAL CFB container, written from the two public
  * specs — a v3 container with a FAT-chained WordDocument stream
  * (padded past the 4096 mini cutoff), the 1Table companion in the
  * MINI stream (64-byte mini sectors through the miniFAT — the small
  * half of the container model is load-bearing, not decoration), a
  * FIB with fWhichTblStm set, and a TWO-PIECE piece table: the first
  * ceil(n/2) paragraphs as a COMPRESSED (cp1252) piece, the rest as
  * a UTF-16LE piece (with an astral pair) — every decoded character
  * (seed, i) arithmetic for the oracle ([[DocEncode.decodedPara]]). */
case class DocEncode(children: Seq[Expression]) extends Expression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = {
    val expected = Seq(LongType, IntegerType)
    if (children.length == 2 && children.map(_.dataType) == expected)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_doc_encode expects (long seed, int n_paras)")
  }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_doc_encode"

  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.exists(_ == null)) null
    else DocEncode.encode(vs(0).asInstanceOf[Long], vs(1).asInstanceOf[Int])
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): DocEncode =
    copy(children = newChildren)
}

object DocEncode {

  /** What [[DocText]] must decode paragraph i (0-based) of an n-para
    * document to — the oracle's contract. The first ceil(n/2)
    * paragraphs live in the compressed piece (cp1252-expressible
    * text), the rest in the unicode piece. */
  def decodedPara(seed: Long, i: Int, nParas: Int): String = {
    if (i < (nParas + 1) / 2) s"Para $i of doc $seed: café §${(seed + i) % 9}"
    else s"Para $i of doc $seed: € — 𝄞 ok"
  }

  // ---- the Word layer ----------------------------------------------

  private def fib(ccpText: Int, fcClx: Int, lcbClx: Int): Array[Byte] = {
    val f = new Array[Byte](0x0384)
    def w16(o: Int, v: Int): Unit = { f(o) = v.toByte; f(o + 1) = (v >> 8).toByte }
    def w32(o: Int, v: Long): Unit = {
      f(o) = v.toByte; f(o + 1) = (v >> 8).toByte
      f(o + 2) = (v >> 16).toByte; f(o + 3) = (v >> 24).toByte
    }
    w16(0x0000, 0xA5EC) // wIdent
    w16(0x0002, 0x00C1) // nFib: Word 97
    w16(0x000A, 0x0200) // fWhichTblStm → 1Table
    w16(0x000C, 0x00BF) // nFibBack
    w16(0x0020, 0x000E) // csw
    w16(0x003E, 0x0016) // cslw
    w32(0x004C, ccpText) // FibRgLw97.ccpText
    w16(0x0098, 0x005D) // cbRgFcLcb for nFib 00C1
    w32(0x01A2, fcClx)
    w32(0x01A6, lcbClx)
    f
  }

  def encode(seed: Long, nParas: Int): Array[Byte] = {
    if (seed < 0 || nParas < 1 || nParas > 64) return null
    val k = (nParas + 1) / 2
    val ansiText = (0 until k)
      .map(i => decodedPara(seed, i, nParas).replace('\n', '\r') + "\r").mkString
    val uniText = (k until nParas)
      .map(i => decodedPara(seed, i, nParas) + "\r").mkString
    val ansiBytes = {
      // cp1252 byte-encode: identity outside 0x80-0x9F plus the two
      // fixture high chars (é 0xE9, § 0xA7 are Latin-1 identity)
      val a = new Array[Byte](ansiText.length)
      var i = 0
      while (i < ansiText.length) {
        val c = ansiText.charAt(i)
        if (c > 0xFF) return null
        a(i) = c.toByte
        i += 1
      }
      a
    }
    val uniBytes = uniText.getBytes("UTF-16LE")
    val ccpText = ansiText.length + uniText.length

    // WordDocument stream: FIB, then the ANSI piece, then the unicode
    // piece (2-byte aligned), padded past the 4096 mini cutoff so the
    // stream takes the BIG (FAT) path
    val fibLen = 0x0384
    val ansiAt = fibLen
    var uniAt = ansiAt + ansiBytes.length
    if (uniAt % 2 != 0) uniAt += 1
    val wdLen = math.max(4096, uniAt + uniBytes.length)
    val fcClx = 64 // inside the table stream, after a small skip region
    // Clx: one Prc block (exercises the skip) + Pcdt with 2 pieces
    val nPieces = if (uniText.isEmpty) 1 else 2
    val prcData = Array[Byte](0x08, 0x00) // an inert 2-byte grpprl
    val prc = Array[Byte](0x01, prcData.length.toByte, 0x00) ++ prcData
    val lcbPlc = (nPieces + 1) * 4 + nPieces * 8
    val lcbClx = prc.length + 5 + lcbPlc
    val table = new Array[Byte](fcClx + lcbClx)
    def t16(o: Int, v: Int): Unit = {
      table(o) = v.toByte; table(o + 1) = (v >> 8).toByte
    }
    def t32(o: Int, v: Long): Unit = {
      table(o) = v.toByte; table(o + 1) = (v >> 8).toByte
      table(o + 2) = (v >> 16).toByte; table(o + 3) = (v >> 24).toByte
    }
    System.arraycopy(prc, 0, table, fcClx, prc.length)
    var at = fcClx + prc.length
    table(at) = 0x02
    t32(at + 1, lcbPlc)
    at += 5
    // CPs
    t32(at, 0)
    t32(at + 4, ansiText.length)
    if (nPieces == 2) t32(at + 8, ccpText)
    at += (nPieces + 1) * 4
    // PCDs: flags(2) fc(4) prm(2); compressed sets bit 30 and fc is
    // DOUBLE the byte offset
    t16(at, 0)
    t32(at + 2, (ansiAt.toLong * 2) | 0x40000000L)
    t16(at + 6, 0)
    if (nPieces == 2) {
      t16(at + 8, 0)
      t32(at + 10, uniAt.toLong)
      t16(at + 14, 0)
    }

    val wd = new Array[Byte](wdLen)
    System.arraycopy(fib(ccpText, fcClx, lcbClx), 0, wd, 0, fibLen)
    System.arraycopy(ansiBytes, 0, wd, ansiAt, ansiBytes.length)
    System.arraycopy(uniBytes, 0, wd, uniAt, uniBytes.length)

    cfbContainer("WordDocument", wd, "1Table", table)
  }

  // ---- the CFB layer -----------------------------------------------

  /** A v3 CFB container holding one big stream (FAT path) and one
    * small stream (MINI path) — also the CfbSpec's generic builder. */
  private[graft] def cfbContainer(bigName: String, wd: Array[Byte],
      smallName: String, small: Array[Byte]): Array[Byte] = {
    val End = 0xFFFFFFFEL
    val Free = 0xFFFFFFFFL
    val FatSect = 0xFFFFFFFDL
    // mini stream: the small stream padded to 64-byte mini sectors
    val nMini = (small.length + 63) / 64
    val mini = new Array[Byte](nMini * 64)
    System.arraycopy(small, 0, mini, 0, small.length)
    // sector plan: 0 FAT, 1 directory, 2 miniFAT, 3.. WordDocument,
    // then the mini stream container sectors
    val wdSectors = (wd.length + 511) / 512
    val miniSectors = (mini.length + 511) / 512
    val wdFirst = 3
    val miniFirst = wdFirst + wdSectors
    val total = miniFirst + miniSectors
    if (total > 128) return null // one FAT sector bounds the fixture
    val out = new Array[Byte](512 + total * 512)
    def w16(o: Int, v: Int): Unit = { out(o) = v.toByte; out(o + 1) = (v >> 8).toByte }
    def w32(o: Int, v: Long): Unit = {
      out(o) = v.toByte; out(o + 1) = (v >> 8).toByte
      out(o + 2) = (v >> 16).toByte; out(o + 3) = (v >> 24).toByte
    }
    // header
    val magic = Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1)
    var i = 0
    while (i < 8) { out(i) = magic(i).toByte; i += 1 }
    w16(0x18, 0x003E) // minor
    w16(0x1A, 0x0003) // major v3
    w16(0x1C, 0xFFFE) // byte order
    w16(0x1E, 9) // sector shift
    w16(0x20, 6) // mini shift
    w32(0x2C, 1) // one FAT sector
    w32(0x30, 1) // first directory sector
    w32(0x38, 4096) // mini cutoff
    w32(0x3C, 2) // first miniFAT sector
    w32(0x40, 1) // one miniFAT sector
    w32(0x44, End) // no DIFAT chain
    w32(0x48, 0)
    w32(0x4C, 0) // DIFAT[0] = FAT at sector 0
    i = 1
    while (i < 109) { w32(0x4C + i * 4, Free); i += 1 }
    // FAT (sector 0)
    val fatOff = 512
    w32(fatOff + 0 * 4, FatSect)
    w32(fatOff + 1 * 4, End) // directory
    w32(fatOff + 2 * 4, End) // miniFAT
    i = 0
    while (i < wdSectors) {
      w32(fatOff + (wdFirst + i) * 4,
        if (i == wdSectors - 1) End else (wdFirst + i + 1).toLong)
      i += 1
    }
    i = 0
    while (i < miniSectors) {
      w32(fatOff + (miniFirst + i) * 4,
        if (i == miniSectors - 1) End else (miniFirst + i + 1).toLong)
      i += 1
    }
    i = total
    while (i < 128) { w32(fatOff + i * 4, Free); i += 1 }
    // directory (sector 1): Root, WordDocument, the small stream
    val dirOff = 512 + 512
    def entry(idx: Int, name: String, objType: Int, left: Long, right: Long,
        child: Long, start: Long, size: Long): Unit = {
      val eo = dirOff + idx * 128
      val nb = name.getBytes("UTF-16LE")
      System.arraycopy(nb, 0, out, eo, nb.length)
      w16(eo + 64, nb.length + 2)
      out(eo + 66) = objType.toByte
      out(eo + 67) = 1 // black
      w32(eo + 68, left)
      w32(eo + 72, right)
      w32(eo + 76, child)
      w32(eo + 116, start)
      w32(eo + 120, size)
    }
    entry(0, "Root Entry", 5, Free, Free, 2, miniFirst.toLong, mini.length.toLong)
    entry(1, bigName, 2, Free, Free, Free, wdFirst.toLong, wd.length.toLong)
    entry(2, smallName, 2, 1, Free, Free, 0, small.length.toLong)
    // entry 3 left free (type 0)
    // miniFAT (sector 2)
    val mfOff = 512 + 2 * 512
    i = 0
    while (i < nMini) {
      w32(mfOff + i * 4, if (i == nMini - 1) End else (i + 1).toLong)
      i += 1
    }
    i = nMini
    while (i < 128) { w32(mfOff + i * 4, Free); i += 1 }
    // payloads
    System.arraycopy(wd, 0, out, 512 + wdFirst * 512, wd.length)
    System.arraycopy(mini, 0, out, 512 + miniFirst * 512, mini.length)
    out
  }
}
