package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.plans.{OdtEncode, OdtText}

/** ODT text extraction (plans.OdtText): the ODF paragraph walk.
  * Pins: fixture round trips (expected text = OdtEncode.decodedPara,
  * the oracle's contract), inline-span inertness, the whitespace
  * escapes, annotation/note skipping (incl. the NESTED-paragraph
  * case the matching-close walk exists for), the text: prefix guard,
  * the over-cap decline, and the never-throw law. */
class OdtSpec extends AnyFunSuite {

  private def txt(b: Array[Byte]): String = {
    val u = OdtText.parse(b)
    if (u == null) null else u.toString
  }

  private val TextNs = "urn:oasis:names:tc:opendocument:xmlns:text:1.0"
  private val OfficeNs = "urn:oasis:names:tc:opendocument:xmlns:office:1.0"

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

  private def doc(body: String): String =
    s"""<office:document-content xmlns:office="$OfficeNs" """ +
      s"""xmlns:text="$TextNs"><office:body><office:text>$body""" +
      "</office:text></office:body></office:document-content>"

  test("fixture round trips: decoded text is decodedPara across seeds") {
    for (seed <- Seq(0L, 1L, 2L, 3L, 7L, 41L, 180L, 4242L); n <- Seq(1, 2, 4)) {
      val got = txt(OdtEncode.encode(seed, n))
      assert(got != null, s"seed=$seed n=$n declined")
      val expected = (0 until n).map(OdtEncode.decodedPara(seed, _)).mkString("\n")
      assert(got === expected, s"seed=$seed n=$n")
    }
  }

  test("spans are inert; whitespace escapes decode; empty paragraphs kept") {
    assert(txt(wrap(doc(
      """<text:p>a<text:span text:style-name="T1">b</text:span>c</text:p>""" +
        "<text:p/>" +
        """<text:p>x<text:s/>y<text:s text:c="3"/>z<text:tab/>t""" +
        "<text:line-break/>u</text:p>")))
      === "abc\n\nx y   z\tt\nu")
    // entities in character data decode; numeric refs too
    assert(txt(wrap(doc("<text:p>a &amp; b &#6C;</text:p>".replace("6C", "108"))))
      === "a & b l")
  }

  test("annotations and notes are skipped — including their NESTED paragraphs") {
    // the annotation body contains its own <text:p>: the naive
    // first-close search would truncate the outer paragraph there
    assert(txt(wrap(doc(
      "<text:p>before<office:annotation><text:p>margin</text:p>" +
        "</office:annotation>after</text:p>")))
      === "beforeafter")
    assert(txt(wrap(doc(
      """<text:p>a<text:note text:note-class="footnote">""" +
        "<text:p>foot</text:p></text:note>b</text:p>")))
      === "ab")
    // a heading between paragraphs keeps document order
    assert(txt(wrap(doc(
      "<text:p>one</text:p><text:h>head</text:h><text:p>two</text:p>")))
      === "one\nhead\ntwo")
  }

  test("the text: prefix guard: a renamed or missing binding declines") {
    // bound to another prefix: the scan would silently extract nothing
    val renamed =
      s"""<office:document-content xmlns:office="$OfficeNs" """ +
        s"""xmlns:t="$TextNs"><office:body><office:text>""" +
        "<t:p>hidden</t:p></office:text></office:body></office:document-content>"
    assert(txt(wrap(renamed)) === null)
    // no ODF text namespace anywhere: not an ODT content part
    assert(txt(wrap("<office:document-content><text:p>x</text:p>" +
      "</office:document-content>")) === null)
    // no content.xml at all
    val bos = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bos)
    z.putNextEntry(new java.util.zip.ZipEntry("other.xml"))
    z.write("x".getBytes); z.closeEntry(); z.close()
    assert(txt(bos.toByteArray) === null)
  }

  test("over-cap documents decline instead of truncating") {
    val many = new StringBuilder()
    (0 until 8193).foreach(_ => many.append("<text:p>x</text:p>"))
    assert(txt(wrap(doc(many.toString))) === null)
    val atCap = new StringBuilder()
    (0 until 8192).foreach(_ => atCap.append("<text:p>x</text:p>"))
    assert(txt(wrap(doc(atCap.toString))) != null)
  }

  test("independent witness: attribute reorder + annotation position are invisible") {
    // the scan keys on tag NAMES: the same document with every
    // attribute list permuted (and foreign attributes added) must
    // extract identical text — the fixture encoder and the scanner
    // must not share a byte-layout assumption
    val a = doc("""<text:p text:style-name="P1" text:cond-style-name="Q">""" +
      """one <text:span text:style-name="T1" text:class-names="c">two</text:span>""" +
      """<text:s text:c="2"/>three<text:tab/>4</text:p>""")
    val b = doc("""<text:p text:cond-style-name="Q"  text:style-name="P1">""" +
      """one <text:span text:class-names="c" text:style-name="T1">two</text:span>""" +
      """<text:s text:c="2"/>three<text:tab/>4</text:p>""")
    val ta = txt(wrap(a))
    assert(ta === "one two  three\t4")
    assert(txt(wrap(b)) === ta, "attribute order must be invisible")
    // moving a skipped annotation block WITHIN the paragraph must not
    // change the extracted text (its position is commentary anchoring,
    // not document text)
    val ann = "<office:annotation><text:p>margin</text:p></office:annotation>"
    val early = txt(wrap(doc(s"<text:p>a${ann}bc</text:p>")))
    val late = txt(wrap(doc(s"<text:p>ab${ann}c</text:p>")))
    assert(early === "abc" && late === early,
      "annotation position must be invisible")
  }

  test("whitespace-escape amplification declines at the output ceiling") {
    // 300 copies of <text:s text:c="9999"/> (~7 KB of input) claim
    // ~3M spaces — past the 1 MiB output bound the document declines
    // instead of building a gigabyte string
    val esc = """<text:s text:c="9999"/>"""
    assert(txt(wrap(doc("<text:p>a" + esc * 300 + "b</text:p>"))) === null)
    // under the ceiling the expansion is exact
    assert(txt(wrap(doc("""<text:p>a<text:s text:c="9999"/>b</text:p>""")))
      === "a" + " " * 9999 + "b")
  }

  test("zip kind classifies odt by the ODF manifest") {
    import graft.plans.ZipKind
    assert(ZipKind.classify(OdtEncode.encode(7L, 2)).toString === "odt")
  }

  test("truncations and bit flips never throw") {
    val b = OdtEncode.encode(41L, 4)
    var cut = 1
    while (cut < b.length) {
      OdtText.parse(java.util.Arrays.copyOf(b, cut))
      cut += 3
    }
    val rnd = new scala.util.Random(11)
    (0 until 300).foreach { _ =>
      val m = b.clone()
      val at = rnd.nextInt(m.length)
      m(at) = (m(at) ^ (1 << rnd.nextInt(8))).toByte
      OdtText.parse(m)
    }
  }
}

/** The registered query against its own contract. */
class OdtQuerySpec extends SparkSpec {

  test("text_odt_extract rows equal the decodedPara contract at sf0.001") {
    val rows = graft.operators.Multimodal.odtIngest(spark, sf).collect()
    assert(rows.length > 0)
    rows.foreach { r =>
      val (doc, idx, para) = (r.getLong(0), r.getInt(1), r.getString(2))
      assert(para === graft.plans.OdtEncode.decodedPara(doc, idx),
        s"doc=$doc para=$idx")
    }
    val byDoc = rows.groupBy(_.getLong(0))
    assert(byDoc.keys.forall(_ % 181 != 0))
    byDoc.foreach { case (doc, rs) =>
      assert(rs.length === (doc % 4 + 1).toInt, s"doc=$doc para count")
    }
  }
}
