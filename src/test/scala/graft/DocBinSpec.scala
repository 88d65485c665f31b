package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.plans.{CfbEntries, CfbKind, CfbParse, DocEncode, DocText}

/** Word 97-2003 binary extraction (plans.DocText over plans.CfbParse):
  * the CFB FAT/directory/miniFAT walk + the FIB piece-table tier.
  * Pins: fixture round trips (expected text = DocEncode.decodedPara,
  * the oracle's contract — both the cp1252 COMPRESSED piece and the
  * UTF-16LE piece with an astral pair), the census, the stream-name
  * classifier, the decline envelope (encryption flag, field marks,
  * bad magic, missing streams, piece-table inconsistencies), and the
  * never-throw law. */
class DocBinSpec extends AnyFunSuite {

  private def txt(b: Array[Byte]): String = {
    val u = DocText.parse(b)
    if (u == null) null else u.toString
  }

  private def expected(seed: Long, n: Int): String =
    (0 until n).map(DocEncode.decodedPara(seed, _, n)).mkString("\n") + "\n"

  test("fixture round trips: both piece forms decode to decodedPara") {
    for (seed <- Seq(0L, 1L, 2L, 3L, 7L, 41L, 166L, 4242L); n <- Seq(1, 2, 3, 4)) {
      val got = txt(DocEncode.encode(seed, n))
      assert(got != null, s"seed=$seed n=$n declined")
      assert(got === expected(seed, n), s"seed=$seed n=$n")
    }
  }

  test("the CFB census: directory order, types, big + mini streams") {
    val b = DocEncode.encode(9L, 3)
    val arr = CfbEntries.census(b)
    assert(arr != null)
    val rows = (0 until arr.numElements()).map { i =>
      val r = arr.getStruct(i, 3)
      (r.getUTF8String(0).toString, r.getInt(1), r.getLong(2))
    }
    assert(rows.map(r => (r._1, r._2)) ===
      Seq(("Root Entry", 5), ("WordDocument", 2), ("1Table", 2)))
    // the WordDocument stream rode the FAT path (>= the 4096 cutoff),
    // the table rode the MINI path (< 4096) — both halves load-bearing
    assert(rows(1)._3 >= 4096L)
    assert(rows(2)._3 < 4096L && rows(2)._3 > 0L)
    // and the mini stream materializes correctly: the open container
    // serves the table stream content-identical to the FIB's pointers
    val cfb = CfbParse.open(b)
    assert(cfb != null && cfb.stream("1Table") != null)
    // CFB names compare case-insensitively (MS-CFB 2.6.4)
    assert(cfb.stream("worddocument") != null)
  }

  test("the classifier: doc / xls / ppt / cfb by stream names") {
    def kind(b: Array[Byte]): String = {
      val u = CfbKind.classify(b)
      if (u == null) null else u.toString
    }
    assert(kind(DocEncode.encode(5L, 2)) === "doc")
    val payload = new Array[Byte](5000)
    val small = Array[Byte](1, 2, 3)
    assert(kind(DocEncode.cfbContainer("Workbook", payload, "x", small)) === "xls")
    assert(kind(DocEncode.cfbContainer("Book", payload, "x", small)) === "xls")
    assert(kind(DocEncode.cfbContainer("PowerPoint Document", payload, "x",
      small)) === "ppt")
    assert(kind(DocEncode.cfbContainer("Contents", payload, "x", small)) === "cfb")
    assert(kind("not a cfb at all".getBytes("US-ASCII")) === null)
  }

  test("declines: encryption flag, field marks, magic, missing table stream") {
    val b = DocEncode.encode(12L, 3)
    assert(txt(b) != null)
    val wdOff = 512 + 3 * 512 // header + FAT + dir + miniFAT sectors
    // the FIB fEncrypted bit (0x000A bit 0x0100 → byte 0x000B bit 0)
    val enc = b.clone()
    enc(wdOff + 0x000B) = (enc(wdOff + 0x000B) | 0x01).toByte
    assert(txt(enc) === null, "an encrypted .doc must decline")
    // a field-begin mark (0x13) inside the ANSI piece text declines —
    // serving text with field plumbing dropped would be unfaithful
    val fld = b.clone()
    fld(wdOff + 0x0384) = 0x13
    assert(txt(fld) === null, "a field mark must decline")
    // bad container magic
    val mag = b.clone()
    mag(0) = 0x51
    assert(txt(mag) === null)
    // wIdent broken
    val wid = b.clone()
    wid(wdOff) = 0x00
    assert(txt(wid) === null)
    // the piece table must cover ccpText: shrink the last CP
    // (CP array starts right after the Prc block + Pcdt header inside
    // the table stream — easier: grow ccpText in the FIB instead)
    val ccp = b.clone()
    ccp(wdOff + 0x004C) = (ccp(wdOff + 0x004C) + 64).toByte
    assert(txt(ccp) === null, "pieces not covering ccpText must decline")
  }

  test("truncations and bit flips never throw") {
    val b = DocEncode.encode(41L, 4)
    var cut = 0
    while (cut < b.length) {
      DocText.parse(java.util.Arrays.copyOf(b, cut))
      CfbEntries.census(java.util.Arrays.copyOf(b, cut))
      cut += 512
    }
    val rnd = new scala.util.Random(7)
    (0 until 400).foreach { _ =>
      val m = b.clone()
      val at = rnd.nextInt(m.length)
      m(at) = (m(at) ^ (1 << rnd.nextInt(8))).toByte
      DocText.parse(m)
      CfbKind.classify(m)
    }
  }
}

/** The registered queries against their own contracts at sf0.001. */
class DocBinQuerySpec extends SparkSpec {

  test("text_doc_extract rows equal the decodedPara contract") {
    val rows = graft.operators.Multimodal.docBinIngest(spark, sf).collect()
    assert(rows.length > 0)
    rows.foreach { r =>
      val (doc, text) = (r.getLong(0), r.getString(1))
      val n = (doc % 4 + 1).toInt
      val want = (0 until n)
        .map(graft.plans.DocEncode.decodedPara(doc, _, n)).mkString("\n") + "\n"
      assert(text === want, s"doc=$doc")
    }
    assert(rows.map(_.getLong(0)).forall(_ % 165 != 0), "gate rows absent")
  }

  test("the document triage routes the D0CF11E0 magic to kind='doc' with text") {
    import org.apache.spark.sql.functions.col
    val docs = graft.operators.Multimodal.docTriage(spark, sf)
      .filter(col("kind") === "doc").collect()
    assert(docs.length > 0, "no doc rows routed in the mixed corpus")
    docs.foreach { r =>
      val (doc, text) = (r.getLong(0), r.getString(2))
      val n = (doc % 4 + 1).toInt
      val want = (0 until n)
        .map(graft.plans.DocEncode.decodedPara(doc, _, n)).mkString("\n") + "\n"
      assert(text === want, s"doc=$doc")
    }
  }
}
