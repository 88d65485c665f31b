package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.plans.{XlsCells, XlsEncode}

/** Excel 97-2003 binary extraction (plans.XlsCells over plans.
  * CfbParse): the BIFF8 record walk. Pins: fixture round trips
  * (expected grid = XlsEncode.decodedRow — RK int/fX100, SST
  * compressed/high-byte/rich-run, Number, MulRk), the SST Continue
  * protocol (seed%5==2 layouts: mid-string split with a re-declared
  * option byte incl. the compressed→UTF-16 width change, a whole
  * string inside the Continue, split == unsplit), the decline
  * envelope (FilePass encryption, unserved cell records, reserved
  * bits in a continuation option byte, a sheet Continue after a
  * served record, truncated SST), and never-throw. */
class XlsSpec extends AnyFunSuite {

  private def cells(b: Array[Byte]): Seq[(Int, Int, String)] = {
    val arr = XlsCells.parse(b)
    if (arr == null) null
    else (0 until arr.numElements()).map { i =>
      val r = arr.getStruct(i, 3)
      (r.getInt(0), r.getInt(1), r.getUTF8String(2).toString)
    }
  }

  test("fixture round trips: the grid equals decodedRow across seeds") {
    // seeds 2, 7, 4242 are the Continue layouts (seed%5==2); n=3 puts
    // the victim on an even row — the compressed→UTF-16 width change
    for (seed <- Seq(0L, 1L, 2L, 3L, 7L, 41L, 146L, 4242L); n <- Seq(1, 2, 3, 4)) {
      val got = cells(XlsEncode.encode(seed, n))
      assert(got != null, s"seed=$seed n=$n declined")
      val expected = (1 to n).flatMap(r =>
        XlsEncode.decodedRow(seed, r).map { case (c, v) => (r, c, v) })
      assert(got === expected, s"seed=$seed n=$n")
    }
  }

  test("the RK forms, string forms, and cached-result forms are all load-bearing") {
    // odd rows: fX100 RK (a decimal) + high-byte SST + a String-record
    // formula result + a cached #DIV/0!; even: int RK + compressed SST
    // + a double formula result + TRUE/FALSE; r=3: the MulRk run;
    // r%3==1: the Label cell — one doc covers all
    val got = cells(XlsEncode.encode(1L, 4))
    assert(got.count(_._1 == 3) === 7, "row 3 must serve MulRk + Formula + BoolErr")
    assert(got.exists(c => c._2 == 1 && c._3.contains(".")),
      "an fX100 RK must serve its decimal")
    assert(got.exists(_._3.endsWith("é€")), "high-byte SST strings decode")
    assert(got.exists(c => c._2 == 6 && c._3.startsWith("Fml")),
      "a string formula's String record must serve")
    assert(got.exists(c => c._2 == 6 && c._3.endsWith(".5")),
      "a numeric formula's cached double must serve")
    assert(got.count(c => c._2 == 7 && (c._3 == "TRUE" || c._3 == "FALSE")) === 2,
      "BoolErr booleans must serve")
    assert(got.count(c => c._2 == 7 && c._3 == "#DIV/0!") === 2,
      "cached error literals must serve")
    assert(got.exists(c => c._2 == 8 && c._3.startsWith("Lbl")),
      "Label inline strings must serve")
  }

  test("declines: encryption, unserved cell records, SST spill") {
    val b = XlsEncode.encode(12L, 3)
    assert(cells(b) != null)
    // locate the Workbook stream inside the container (sector 3 on)
    val wbOff = 512 + 3 * 512
    // FilePass (0x002F) planted where Window2 (0x023E) sits: the
    // record walk must abort, not serve a "decrypted" grid
    val s = b.drop(wbOff)
    var at = 0
    var w2 = -1
    while (w2 < 0) {
      val typ = (s(at) & 0xFF) | ((s(at + 1) & 0xFF) << 8)
      val len = (s(at + 2) & 0xFF) | ((s(at + 3) & 0xFF) << 8)
      if (typ == 0x023E) w2 = at else at += 4 + len
    }
    val enc = b.clone()
    enc(wbOff + w2) = 0x2F
    enc(wbOff + w2 + 1) = 0x00
    assert(cells(enc) === null, "FilePass must decline")
    // a Number retyped as a Formula is 14 bytes — too short for the
    // Formula grammar: decline, never misparse the cached value
    var num = -1
    at = 0
    while (num < 0) {
      val typ = (s(at) & 0xFF) | ((s(at + 1) & 0xFF) << 8)
      val len = (s(at + 2) & 0xFF) | ((s(at + 3) & 0xFF) << 8)
      if (typ == 0x0203) num = at else at += 4 + len
    }
    val frm = b.clone()
    frm(wbOff + num) = 0x06
    frm(wbOff + num + 1) = 0x00
    assert(cells(frm) === null, "a malformed Formula must decline")
    // an RString (0x00D6) — cell content this tier does not serve
    val rstr = b.clone()
    rstr(wbOff + num) = 0xD6.toByte
    rstr(wbOff + num + 1) = 0x00
    assert(cells(rstr) === null, "an RString cell must decline")
    // an ORPHANED String record (no string formula outstanding)
    var lbl = -1
    at = 0
    while (lbl < 0) {
      val typ = (s(at) & 0xFF) | ((s(at + 1) & 0xFF) << 8)
      val len = (s(at + 2) & 0xFF) | ((s(at + 3) & 0xFF) << 8)
      if (typ == 0x0204) lbl = at else at += 4 + len
    }
    val orphan = b.clone()
    orphan(wbOff + lbl) = 0x07
    orphan(wbOff + lbl + 1) = 0x02
    assert(cells(orphan) === null, "an orphaned String record must decline")
    // a string formula whose String record never arrives (the String
    // retyped as inert noise): the pending result must not vanish
    var str = -1
    at = 0
    while (str < 0) {
      val typ = (s(at) & 0xFF) | ((s(at + 1) & 0xFF) << 8)
      val len = (s(at + 2) & 0xFF) | ((s(at + 3) & 0xFF) << 8)
      if (typ == 0x0207) str = at else at += 4 + len
    }
    val lost = b.clone()
    lost(wbOff + str) = 0x08
    lost(wbOff + str + 1) = 0x02
    assert(cells(lost) === null, "a lost string-formula result must decline")
    // not a workbook at all
    assert(cells("plain".getBytes("US-ASCII")) === null)
  }

  test("SST Continue: split == unsplit, bad option bytes and sheet continues decline") {
    // the split layout (seed%5==2) serves the same grid as a
    // neighboring unsplit seed's CONTRACT — and its own contract
    for (n <- Seq(1, 2, 3, 4)) {
      val got = cells(XlsEncode.encode(2L, n))
      assert(got != null, s"continue layout declined at n=$n")
      val expected = (1 to n).flatMap(r =>
        XlsEncode.decodedRow(2L, r).map { case (c, v) => (r, c, v) })
      assert(got === expected, s"n=$n")
    }
    // locate the Continue record (0x003C) in the workbook stream and
    // set a reserved bit in its leading option byte: decline
    val b = XlsEncode.encode(2L, 3)
    val wbOff = 512 + 3 * 512
    val s = b.drop(wbOff)
    var at = 0
    var cont = -1
    while (cont < 0) {
      val typ = (s(at) & 0xFF) | ((s(at + 1) & 0xFF) << 8)
      val len = (s(at + 2) & 0xFF) | ((s(at + 3) & 0xFF) << 8)
      if (typ == 0x003C) cont = at else at += 4 + len
    }
    val badFlag = b.clone()
    badFlag(wbOff + cont + 4) = (badFlag(wbOff + cont + 4) | 0x02).toByte
    assert(cells(badFlag) === null, "reserved continuation bits must decline")
    // a Continue in the SHEET after a served record would carry cell
    // content the walk cannot re-attach: retype row 3's MulRk
    // (0x00BD) as 0x003C in a no-SST-continue workbook
    val b2 = XlsEncode.encode(11L, 3)
    assert(cells(b2) != null)
    val s2 = b2.drop(wbOff)
    at = 0
    var mul = -1
    while (mul < 0) {
      val typ = (s2(at) & 0xFF) | ((s2(at + 1) & 0xFF) << 8)
      val len = (s2(at + 2) & 0xFF) | ((s2(at + 3) & 0xFF) << 8)
      if (typ == 0x00BD) mul = at else at += 4 + len
    }
    val shCont = b2.clone()
    shCont(wbOff + mul) = 0x3C
    shCont(wbOff + mul + 1) = 0x00
    assert(cells(shCont) === null, "a sheet Continue after a served record must decline")
  }

  test("a second SST record declines: indexes must never misresolve") {
    // hand-built BIFF8 stream: globals with TWO SSTs (the second would
    // shift every LabelSst index) vs the same stream with the second
    // retyped inert
    def rec(typ: Int, payload: Array[Byte]): Array[Byte] =
      Array(typ.toByte, (typ >> 8).toByte, payload.length.toByte,
        (payload.length >> 8).toByte) ++ payload
    def w16(v: Int) = Array(v.toByte, (v >> 8).toByte)
    def w32(v: Long) = Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte,
      (v >> 24).toByte)
    val bof = rec(0x0809, w16(0x0600) ++ w16(0x0005) ++ w16(0) ++ w16(0) ++
      w32(0) ++ w32(0))
    val bofSheet = rec(0x0809, w16(0x0600) ++ w16(0x0010) ++ w16(0) ++ w16(0) ++
      w32(0) ++ w32(0))
    val sstBody = w32(1) ++ w32(1) ++ w16(2) ++ Array(0x00.toByte) ++
      "ab".getBytes("US-ASCII")
    val eof = rec(0x000A, Array.empty[Byte])
    def globals(secondTyp: Int): Array[Byte] = {
      val second = rec(secondTyp, sstBody)
      val name = "Sheet1"
      val bs = rec(0x0085, w32(0) ++ w16(0) ++
        Array(name.length.toByte, 0x00.toByte) ++ name.getBytes("US-ASCII"))
      val g0 = bof ++ bs ++ rec(0x00FC, sstBody) ++ second ++ eof
      // patch lbPlyPos now that the globals length is known
      val bsAt = bof.length
      val fixed = g0.clone()
      val pos = g0.length
      fixed(bsAt + 4) = pos.toByte
      fixed(bsAt + 5) = (pos >> 8).toByte
      fixed
    }
    val cell = rec(0x00FD, w16(0) ++ w16(0) ++ w16(0) ++ w32(0))
    def wb(secondTyp: Int): Array[Byte] = {
      val stream = globals(secondTyp) ++ bofSheet ++ cell ++ eof
      graft.plans.DocEncode.cfbContainer("Workbook",
        java.util.Arrays.copyOf(stream, math.max(4096, stream.length)),
        "DocumentSummaryInformation", Array[Byte](1, 2, 3, 4))
    }
    assert(cells(wb(0x00FC)) === null, "a second SST must decline")
    assert(cells(wb(0x0022)) === Seq((1, 1, "ab")),
      "the control stream (second record inert) must serve")
  }

  test("SST exhaustion: trailing bytes or an orphan Continue decline") {
    // the declared cstUnique and the record-chain bytes must agree:
    // leftover bytes after the last string mean a malformed workbook
    def rec(typ: Int, payload: Array[Byte]): Array[Byte] =
      Array(typ.toByte, (typ >> 8).toByte, payload.length.toByte,
        (payload.length >> 8).toByte) ++ payload
    def w16(v: Int) = Array(v.toByte, (v >> 8).toByte)
    def w32(v: Long) = Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte,
      (v >> 24).toByte)
    val bof = rec(0x0809, w16(0x0600) ++ w16(0x0005) ++ w16(0) ++ w16(0) ++
      w32(0) ++ w32(0))
    val bofSheet = rec(0x0809, w16(0x0600) ++ w16(0x0010) ++ w16(0) ++
      w16(0) ++ w32(0) ++ w32(0))
    val eof = rec(0x000A, Array.empty[Byte])
    val cell = rec(0x00FD, w16(0) ++ w16(0) ++ w16(0) ++ w32(0))
    def wb(sstRecs: Array[Byte]): Array[Byte] = {
      val name = "Sheet1"
      val bs = rec(0x0085, w32(0) ++ w16(0) ++
        Array(name.length.toByte, 0x00.toByte) ++ name.getBytes("US-ASCII"))
      val g0 = bof ++ bs ++ sstRecs ++ eof
      val fixed = g0.clone()
      val pos = g0.length
      val bsAt = bof.length
      fixed(bsAt + 4) = pos.toByte
      fixed(bsAt + 5) = (pos >> 8).toByte
      val stream = fixed ++ bofSheet ++ cell ++ eof
      graft.plans.DocEncode.cfbContainer("Workbook",
        java.util.Arrays.copyOf(stream, math.max(4096, stream.length)),
        "DocumentSummaryInformation", Array[Byte](1, 2, 3, 4))
    }
    val sstBody = w32(1) ++ w32(1) ++ w16(2) ++ Array(0x00.toByte) ++
      "ab".getBytes("US-ASCII")
    assert(cells(wb(rec(0x00FC, sstBody))) === Seq((1, 1, "ab")),
      "the exact-length control must serve")
    assert(cells(wb(rec(0x00FC, sstBody ++ Array(0x00.toByte)))) === null,
      "a trailing byte after the last string must decline")
    assert(cells(wb(rec(0x00FC, sstBody) ++ rec(0x003C,
      Array[Byte](0x00, 'x'.toByte)))) === null,
      "an orphan Continue after the last string must decline")
  }

  test("truncations and bit flips never throw") {
    val b = XlsEncode.encode(41L, 4)
    var cut = 0
    while (cut < b.length) {
      XlsCells.parse(java.util.Arrays.copyOf(b, cut))
      cut += 512
    }
    val rnd = new scala.util.Random(7)
    (0 until 400).foreach { _ =>
      val m = b.clone()
      val at = rnd.nextInt(m.length)
      m(at) = (m(at) ^ (1 << rnd.nextInt(8))).toByte
      XlsCells.parse(m)
    }
  }
}

/** The registered query + the triage routing at sf0.001. */
class XlsQuerySpec extends SparkSpec {

  test("text_xls_extract rows equal the decodedRow contract") {
    val rows = graft.operators.Multimodal.xlsBinIngest(spark, sf).collect()
    assert(rows.length > 0)
    val byDoc = rows.groupBy(_.getLong(0))
    byDoc.foreach { case (doc, rs) =>
      val n = (doc % 4 + 1).toInt
      val want = (1 to n).flatMap(r =>
        graft.plans.XlsEncode.decodedRow(doc, r).map { case (c, v) => (r, c, v) })
      val got = rs.map(r => (r.getInt(1), r.getInt(2), r.getString(3))).toSeq
      assert(got === want, s"doc=$doc")
    }
    assert(rows.map(_.getLong(0)).forall(_ % 145 != 0), "gate rows absent")
  }

  test("the document triage routes a Workbook container to kind='xls' with the grid") {
    import org.apache.spark.sql.functions.{col, lit}
    import spark.implicits._
    val df = Seq(77L).toDF("doc_id")
      .select(col("doc_id"), graft.plans.VectorExpressions.xlsEncode(
        col("doc_id"), lit(2)).as("payload"))
    val out = graft.operators.Multimodal.docTextSelect(df, "payload").collect()
    assert(out.length === 1)
    assert(out(0).getString(1) === "xls")
    val want = (1 to 2).flatMap(r =>
      graft.plans.XlsEncode.decodedRow(77L, r).map { case (c, v) => s"$r,$c=$v" })
      .mkString("\n")
    assert(out(0).getString(2) === want)
  }
}
