package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.plans.{OdsCells, OdsEncode}

/** ODS cell extraction (plans.OdsCells): the ODF grid walk. Pins:
  * fixture round trips (expected grid = OdsEncode.decodedRow, the
  * oracle's contract), verbatim float values, both string-cell
  * shapes, exact repetition expansion (valued AND empty), covered
  * cells, the namespace prefix guard, the typed-value decline
  * envelope, the over-cap decline, and the never-throw law. */
class OdsSpec extends AnyFunSuite {

  private def cells(b: Array[Byte]): Seq[(Int, Int, String)] = {
    val arr = OdsCells.parse(b)
    if (arr == null) null
    else (0 until arr.numElements()).map { i =>
      val r = arr.getStruct(i, 3)
      (r.getInt(0), r.getInt(1), r.getUTF8String(2).toString)
    }
  }

  test("fixture round trips: the grid equals decodedRow across seeds") {
    for (seed <- Seq(0L, 1L, 2L, 3L, 7L, 41L, 190L, 4242L); n <- Seq(1, 2, 4)) {
      val got = cells(OdsEncode.encode(seed, n))
      assert(got != null, s"seed=$seed n=$n declined")
      val expected = (1 to n).flatMap(r =>
        OdsEncode.decodedRow(seed, r).map { case (c, v) => (r, c, v) })
      assert(got === expected, s"seed=$seed n=$n")
    }
  }

  private val OfficeNs = "urn:oasis:names:tc:opendocument:xmlns:office:1.0"
  private val TableNs = "urn:oasis:names:tc:opendocument:xmlns:table:1.0"
  private val TextNs = "urn:oasis:names:tc:opendocument:xmlns:text:1.0"

  private def wrap(contentXml: String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bos)
    try {
      z.putNextEntry(new java.util.zip.ZipEntry("content.xml"))
      z.write(contentXml.getBytes("UTF-8"))
      z.closeEntry()
    } finally z.close()
    bos.toByteArray
  }

  private def doc(table: String): String =
    s"""<office:document-content xmlns:office="$OfficeNs" """ +
      s"""xmlns:table="$TableNs" xmlns:text="$TextNs">""" +
      "<office:body><office:spreadsheet><table:table>" + table +
      "</table:table></office:spreadsheet></office:body>" +
      "</office:document-content>"

  test("repetition expands exactly: rows, valued cells, empty gaps, covered cells") {
    // a repeated ROW with values emits every copy at the right row
    assert(cells(wrap(doc(
      """<table:table-row table:number-rows-repeated="3">""" +
        """<table:table-cell office:value-type="float" office:value="5"/>""" +
        "</table:table-row>" +
        """<table:table-row><table:table-cell office:value-type="float" office:value="9"/></table:table-row>""")))
      === Seq((1, 1, "5"), (2, 1, "5"), (3, 1, "5"), (4, 1, "9")))
    // covered cells (merge shadows) advance but serve nothing; a
    // trailing empty repeated row costs nothing
    assert(cells(wrap(doc(
      "<table:table-row>" +
        """<table:covered-table-cell table:number-columns-repeated="3"/>""" +
        """<table:table-cell office:value-type="float" office:value="7"/>""" +
        "</table:table-row>" +
        """<table:table-row table:number-rows-repeated="100000"/>""")))
      === Seq((1, 4, "7")))
    // the second sheet is out of scope (first-sheet parity with xlsx)
    assert(cells(wrap(doc(
      """<table:table-row><table:table-cell office:value-type="float" office:value="1"/></table:table-row>""")
      .replace("</office:spreadsheet>",
        "<table:table><table:table-row><table:table-cell " +
          "office:value-type=\"float\" office:value=\"99\"/>" +
          "</table:table-row></table:table></office:spreadsheet>")))
      === Seq((1, 1, "1")))
  }

  test("string cells: attribute and body forms, entities, multi-paragraph") {
    assert(cells(wrap(doc(
      "<table:table-row>" +
        """<table:table-cell office:value-type="string" office:string-value="a &amp; b"/>""" +
        """<table:table-cell office:value-type="string"><text:p>x</text:p><text:p>y</text:p></table:table-cell>""" +
        "</table:table-row>")))
      === Seq((1, 1, "a & b"), (1, 2, "x\ny")))
  }

  test("declines: foreign value types, renamed prefixes, over-cap") {
    // a date cell is a later tier, never a guessed string
    assert(cells(wrap(doc(
      """<table:table-row><table:table-cell office:value-type="date" """ +
        """office:date-value="2026-01-01"/></table:table-row>"""))) === null)
    // table: bound to another prefix would silently serve nothing
    val renamed = doc(
      """<table:table-row><table:table-cell office:value-type="float" office:value="1"/></table:table-row>""")
      .replace("xmlns:table=", "xmlns:tbl=")
    assert(cells(wrap(renamed)) === null)
    // over-cap: 65537 populated cells via repetition must decline
    assert(cells(wrap(doc(
      """<table:table-row table:number-rows-repeated="65537">""" +
        """<table:table-cell office:value-type="float" office:value="1"/>""" +
        "</table:table-row>"))) === null)
    // a float cell with no office:value is corrupt
    assert(cells(wrap(doc(
      """<table:table-row><table:table-cell office:value-type="float"/></table:table-row>"""))) === null)
    // a string cell whose <text:p> body is malformed declines the
    // document — a partial body must never serve as complete text
    assert(cells(wrap(doc(
      """<table:table-row><table:table-cell office:value-type="string">""" +
        "<text:p>truncated</table:table-cell></table:table-row>"))) === null)
  }

  test("independent witness: repetition re-encoding and attribute order are invisible") {
    // table:number-columns-repeated="3" and three literal cells are
    // the SAME grid — a scanner keyed to the fixture encoder's choice
    // of encoding would break on real writers, which use either
    val cell = """<table:table-cell office:value-type="string">""" +
      "<text:p>v</text:p></table:table-cell>"
    val lit3 = cells(wrap(doc("<table:table-row>" + cell * 3 + "</table:table-row>")))
    val rep3 = cells(wrap(doc("<table:table-row>" +
      """<table:table-cell office:value-type="string" """ +
      """table:number-columns-repeated="3"><text:p>v</text:p>""" +
      "</table:table-cell></table:table-row>")))
    assert(lit3 === Seq((1, 1, "v"), (1, 2, "v"), (1, 3, "v")))
    assert(rep3 === lit3, "column-repeat re-encoding must be invisible")
    // and the row form: two literal identical rows == rows-repeated=2
    val row = "<table:table-row>" + cell + "</table:table-row>"
    val lit2r = cells(wrap(doc(row + row)))
    val rep2r = cells(wrap(doc(
      """<table:table-row table:number-rows-repeated="2">""" + cell +
        "</table:table-row>")))
    assert(lit2r === Seq((1, 1, "v"), (2, 1, "v")) && rep2r === lit2r)
    // attribute order within a cell head is invisible
    val a = cells(wrap(doc("<table:table-row>" +
      """<table:table-cell office:value-type="float" office:value="5.5"/>""" +
      "</table:table-row>")))
    val b = cells(wrap(doc("<table:table-row>" +
      """<table:table-cell office:value="5.5"  office:value-type="float"/>""" +
      "</table:table-row>")))
    assert(a === Seq((1, 1, "5.5")) && b === a)
  }

  test("a valued repeat past the cap declines BEFORE expanding") {
    // every cell claims 2^20 valued copies: the decline must fire at
    // the repeat attribute, never after allocating the expansion (the
    // pre-fix walk built the row's tuples first — a thousand such
    // cells is a billion-tuple bomb)
    val cell = """<table:table-cell office:value-type="string" """ +
      """table:number-columns-repeated="1048576"><text:p>x</text:p>""" +
      "</table:table-cell>"
    val bomb = wrap(doc("<table:table-row>" + cell * 400 + "</table:table-row>"))
    val t0 = System.nanoTime()
    assert(cells(bomb) === null)
    assert(System.nanoTime() - t0 < 5000000000L, "decline was not early")
  }

  test("zip kind tells odt and ods apart by the stored mimetype") {
    import graft.plans.{OdtEncode, ZipKind}
    assert(ZipKind.classify(OdsEncode.encode(7L, 2)).toString === "ods")
    assert(ZipKind.classify(OdtEncode.encode(7L, 2)).toString === "odt")
  }

  test("truncations and bit flips never throw") {
    val b = OdsEncode.encode(41L, 4)
    var cut = 1
    while (cut < b.length) {
      OdsCells.parse(java.util.Arrays.copyOf(b, cut))
      cut += 3
    }
    val rnd = new scala.util.Random(13)
    (0 until 300).foreach { _ =>
      val m = b.clone()
      val at = rnd.nextInt(m.length)
      m(at) = (m(at) ^ (1 << rnd.nextInt(8))).toByte
      OdsCells.parse(m)
    }
  }
}

/** The registered query against its own contract. */
class OdsQuerySpec extends SparkSpec {

  test("pipeline_ods_ingest rows equal the decodedRow contract at sf0.001") {
    val rows = graft.operators.Multimodal.odsIngest(spark, sf).collect()
    assert(rows.length > 0)
    val byDoc = rows.groupBy(_.getLong(0))
    assert(byDoc.keys.forall(_ % 191 != 0))
    byDoc.foreach { case (doc, rs) =>
      val got = rs.map(r => (r.getInt(1), r.getInt(2), r.getString(3))).toSeq
      val expected = (1 to (doc % 4 + 1).toInt).flatMap(r =>
        graft.plans.OdsEncode.decodedRow(doc, r).map { case (c, v) => (r, c, v) })
      assert(got.sorted === expected.sorted, s"doc=$doc")
    }
  }
}
