package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.plans.{PdfCMapEncode, PdfPageTexts}

/** The §9.7.5.3 embedded-CMap composite tier: /Encoding as a CMap
  * STREAM with a mixed 1-/2-byte codespace. Pins: fixture round trips
  * (the segmentation + variable-width ToUnicode), the decline
  * envelope (vertical WMode, usecmap, ambiguous codespaces, ragged
  * codes, Identity-V), and never-throw. */
class PdfCMapSpec extends AnyFunSuite {

  private def pages(b: Array[Byte]): Seq[String] = {
    val arr = PdfPageTexts.parse(b)
    if (arr == null) null
    else (0 until arr.numElements()).map { i =>
      if (arr.isNullAt(i)) null else arr.getUTF8String(i).toString
    }
  }

  test("fixture round trips: mixed-width codes decode to decodedPage") {
    for (seed <- Seq(0L, 1L, 2L, 3L, 7L, 41L, 136L, 4242L); n <- Seq(1, 2, 3)) {
      val got = pages(PdfCMapEncode.encode(seed, n))
      assert(got != null, s"seed=$seed n=$n declined")
      assert(got === (0 until n).map(PdfCMapEncode.decodedPage(seed, _)),
        s"seed=$seed n=$n")
    }
  }

  test("usecmap composition: Identity-H incorporates, anything else declines") {
    // odd seeds write the usecmap layout: NO own codespacerange, every
    // show code 2 bytes under the incorporated Identity-H band
    val b = PdfCMapEncode.encode(9L, 2)
    assert(pages(b) === (0 until 2).map(PdfCMapEncode.decodedPage(9L, _)))
    val s = new String(b, "ISO-8859-1")
    def mut(f: String => String): Seq[String] = {
      val m = f(s)
      assert(m.length == s.length, "mutations must keep xref offsets valid")
      val out = pages(m.getBytes("ISO-8859-1"))
      assert(out != null, "these are page-level declines, not structural")
      out
    }
    // Identity-V is vertical writing: decline
    assert(mut(_.replace("/Identity-H usecmap", "/Identity-V usecmap"))
      .forall(_ == null), "usecmap of Identity-V must decline")
    // an unknown (predefined CJK) CMap name: an external resource this
    // offline tier does not ship — decline, never guess
    assert(mut(_.replace("/Identity-H usecmap", "/Xdentity-H usecmap"))
      .forall(_ == null), "usecmap of an unknown CMap must decline")
    // an intervening object between the name and usecmap clears the
    // operand: numbers directly precede the operator (same length)
    assert(mut(_.replace("/Identity-H usecmap", "  1 2 3 4   usecmap"))
      .forall(_ == null), "usecmap without a name operand must decline")
  }

  test("declines: vertical writing, usecmap, ambiguous codespace, ragged code") {
    // seed 10: the even-seed layout (own mixed codespace, no usecmap)
    val b = PdfCMapEncode.encode(10L, 1)
    val s = new String(b, "ISO-8859-1")
    def mut(f: String => String): Seq[String] = {
      val m = f(s)
      assert(m.length == s.length, "mutations must keep xref offsets valid")
      val out = pages(m.getBytes("ISO-8859-1"))
      assert(out != null, "these are page-level declines, not structural")
      out
    }
    // /WMode 1 (vertical): the recorded envelope — the page declines
    // (same-length patch keeps every xref offset valid)
    assert(mut(_.replace("/WMode 0 def", "/WMode 1 def"))
      .forall(_ == null), "vertical writing must decline")
    // usecmap composition declines (a same-length token swap)
    assert(mut(_.replace("endcidrange\n", "usecmap ppp\n"))
      .forall(_ == null), "usecmap must decline")
    // ambiguous codespace: a 1-byte range overlapping the 2-byte
    // band's first bytes (<00><7f> -> <00><9f> overlaps <8000><ffff>)
    assert(mut(_.replace("<00> <7f>\n<8000>", "<00> <9f>\n<8000>"))
      .forall(_ == null), "ambiguous first-byte dispatch must decline")
    // a ragged show string: a 2-byte lead with no trail byte (the
    // content hex ends mid-code). 80 is a 2-byte first byte; chop the
    // final 1-byte code off a page's hex and leave a dangling 80
    val hexAt = s.indexOf("800180028003")
    val chopped = s.substring(0, hexAt + 12) + "80" +
      s.substring(hexAt + 14)
    assert(pages(chopped.getBytes("ISO-8859-1")).forall(_ == null),
      "a truncated 2-byte code must decline the page")
  }

  test("truncations and bit flips never throw") {
    val b = PdfCMapEncode.encode(41L, 2)
    var cut = 1
    while (cut < b.length) {
      PdfPageTexts.parse(java.util.Arrays.copyOf(b, cut))
      cut += 89
    }
    val rnd = new scala.util.Random(7)
    (0 until 300).foreach { _ =>
      val m = b.clone()
      val at = rnd.nextInt(m.length)
      m(at) = (m(at) ^ (1 << rnd.nextInt(8))).toByte
      PdfPageTexts.parse(m)
    }
  }
}

/** The registered query against its own contract at sf0.001. */
class PdfCMapQuerySpec extends SparkSpec {

  test("text_pdf_cmap rows equal the decodedPage contract") {
    val rows = graft.operators.Multimodal.pdfCMapTextQ(spark, sf).collect()
    assert(rows.length > 0)
    rows.foreach { r =>
      val (doc, p) = (r.getLong(0), r.getInt(1))
      assert(r.getString(2) === graft.plans.PdfCMapEncode.decodedPage(doc, p),
        s"doc=$doc page=$p")
    }
    assert(rows.map(_.getLong(0)).forall(_ % 135 != 0), "gate rows absent")
  }
}
