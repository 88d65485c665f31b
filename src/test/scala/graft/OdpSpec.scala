package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.plans.{OdpEncode, OdpSlides}

/** ODP slide extraction (plans.OdpSlides): the draw:page walk. Pins:
  * fixture round trips (expected deck = OdpEncode.decodedSlide),
  * speaker-notes invisibility (their own <text:p> must never leak
  * into slide text), whitespace escapes, the draw:/text: prefix
  * guards, the empty-deck and over-cap declines, and never-throw. */
class OdpSpec extends AnyFunSuite {

  private def slides(b: Array[Byte]): Seq[String] = {
    val arr = OdpSlides.parse(b)
    if (arr == null) null
    else (0 until arr.numElements()).map(i => arr.getUTF8String(i).toString)
  }

  test("fixture round trips: decks decode to decodedSlide across seeds") {
    for (seed <- Seq(0L, 1L, 2L, 3L, 7L, 41L, 192L, 4242L); n <- Seq(1, 2, 3)) {
      val got = slides(OdpEncode.encode(seed, n))
      assert(got != null, s"seed=$seed n=$n declined")
      assert(got === (1 to n).map(OdpEncode.decodedSlide(seed, _)),
        s"seed=$seed n=$n")
    }
  }

  private val DrawNs = "urn:oasis:names:tc:opendocument:xmlns:drawing:1.0"
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

  private def doc(pages: String): String =
    s"""<office:document-content xmlns:draw="$DrawNs" xmlns:text="$TextNs">""" +
      pages + "</office:document-content>"

  test("speaker notes never leak; empty pages are kept; order holds") {
    assert(slides(wrap(doc(
      "<draw:page><text:p>visible</text:p>" +
        "<presentation:notes><text:p>SECRET</text:p></presentation:notes>" +
        "<text:p>after</text:p></draw:page>" +
        "<draw:page/>" +
        "<draw:page><text:p>last</text:p></draw:page>")))
      === Seq("visible\nafter", "", "last"))
  }

  test("independent witness: attribute reorder + escape re-encoding are invisible") {
    // page/paragraph attributes permuted (plus foreign extras) must
    // not change the deck; <text:s text:c="2"/> and two bare
    // <text:s/> escapes are the same two spaces
    val a = slides(wrap(doc(
      """<draw:page draw:name="p1" draw:style-name="dp1">""" +
        """<text:p text:style-name="P1">a<text:s text:c="2"/>b</text:p>""" +
        "</draw:page>")))
    val b = slides(wrap(doc(
      """<draw:page draw:style-name="dp1"  draw:name="p1">""" +
        """<text:p text:cond-style-name="X" text:style-name="P1">a""" +
        "<text:s/><text:s/>b</text:p></draw:page>")))
    assert(a === Seq("a  b"))
    assert(b === a, "attribute order / escape re-encoding must be invisible")
  }

  test("declines: renamed prefixes, no pages, over-cap") {
    // draw: bound to another prefix would silently serve nothing
    val renamed = doc("<d:page><text:p>x</text:p></d:page>")
      .replace("xmlns:draw=", "xmlns:d=")
    assert(slides(wrap(renamed)) === null)
    // a presentation with no pages is not a deck
    assert(slides(wrap(doc(""))) === null)
    // 257 pages: over-cap declines, never truncates
    val many = (1 to 257).map(_ => "<draw:page/>").mkString
    assert(slides(wrap(doc(many))) === null)
  }

  test("truncations and bit flips never throw") {
    val b = OdpEncode.encode(41L, 3)
    var cut = 1
    while (cut < b.length) {
      OdpSlides.parse(java.util.Arrays.copyOf(b, cut))
      cut += 3
    }
    val rnd = new scala.util.Random(17)
    (0 until 300).foreach { _ =>
      val m = b.clone()
      val at = rnd.nextInt(m.length)
      m(at) = (m(at) ^ (1 << rnd.nextInt(8))).toByte
      OdpSlides.parse(m)
    }
  }

  test("zip kind completes the ODF triad") {
    import graft.plans.ZipKind
    assert(ZipKind.classify(OdpEncode.encode(7L, 2)).toString === "odp")
  }
}

/** The registered query against its own contract. */
class OdpQuerySpec extends SparkSpec {

  test("pipeline_odp_ingest rows equal the decodedSlide contract at sf0.001") {
    val rows = graft.operators.Multimodal.odpIngest(spark, sf).collect()
    assert(rows.length > 0)
    rows.foreach { r =>
      val (doc, k, text) = (r.getLong(0), r.getInt(1), r.getString(2))
      assert(text === graft.plans.OdpEncode.decodedSlide(doc, k + 1),
        s"doc=$doc slide=$k")
    }
    assert(rows.map(_.getLong(0)).forall(_ % 193 != 0))
  }
}
