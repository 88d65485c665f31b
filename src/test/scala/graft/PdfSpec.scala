package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.plans.{PdfEncode, PdfMeta}

/** PDF triage (plans.PdfMeta): the real startxref → xref → trailer →
  * Catalog → page-tree walk. Pins: fixture-shape round trips across
  * the page/version/encryption grid, the incremental-update (/Prev)
  * chain with the spec's newest-section-wins shadowing, the decline
  * envelope (xref streams, lying offsets, /Prev loops, malformed
  * entries), and the truncation law. */
class PdfSpec extends AnyFunSuite {

  private case class Fields(version: String, nPages: Int,
      encrypted: Boolean, nObjects: Int)
  private def fld(r: org.apache.spark.sql.catalyst.InternalRow): Fields =
    Fields(r.getUTF8String(0).toString, r.getInt(1), r.getBoolean(2), r.getInt(3))

  test("round trips across the page/version/encryption/layout grid") {
    for (seed <- Seq(1L, 17L, 4242L); pages <- Seq(1, 3, 24, 512);
         minor <- Seq(0, 4, 7); enc <- Seq(false, true); layout <- 0 to 2) {
      val b = PdfEncode.encode(seed, pages, minor, enc, layout)
      val r = PdfMeta.parse(b)
      assert(r != null, s"seed=$seed pages=$pages minor=$minor enc=$enc layout=$layout")
      val f = fld(r)
      assert(f.version === s"1.$minor")
      assert(f.nPages === pages)
      assert(f.encrypted === enc)
      // the xref-stream layouts add the stream object (+1) and the
      // ObjStm container (+1 more) to the census
      assert(f.nObjects === 2 + pages + layout + (if (enc) 1 else 0))
    }
  }

  test("incremental update: /Prev chain walked, newest section shadows") {
    val base = new String(PdfEncode.encode(7L, 3, 4, false, 0), "ISO-8859-1")
    // NOT lastIndexOf("xref\n") — that matches the tail of "startxref\n"
    val baseXref = base.indexOf("\nxref\n") + 1
    // update 1: append object 6 (an annotation-ish dict) + an xref
    // section covering it, /Prev → the original table
    val sb = new StringBuilder(base)
    val obj6At = sb.length
    sb.append("6 0 obj\n<< /Type /Annot >>\nendobj\n")
    val xref1At = sb.length
    sb.append("xref\n6 1\n")
    sb.append(f"$obj6At%010d 00000 n \n")
    sb.append(s"trailer\n<< /Size 7 /Root 1 0 R /Prev $baseXref >>\n")
    sb.append(s"startxref\n$xref1At\n%%EOF\n")
    val updated = sb.toString.getBytes("ISO-8859-1")
    val r1 = fld(PdfMeta.parse(updated))
    // 5 original in-use objects (catalog + pages + 3 pages) + object 6
    assert(r1.nPages === 3 && r1.nObjects === 6 && !r1.encrypted)

    // update 2: shadow object 5 (a page) as FREE — the newest entry
    // wins, so the census drops it (page-tree /Count is untouched by
    // design: the triage reports the tree root's claim)
    val sb2 = new StringBuilder(sb.toString)
    val xref2At = sb2.length
    sb2.append("xref\n5 1\n")
    sb2.append("0000000000 65535 f \n")
    sb2.append(s"trailer\n<< /Size 7 /Root 1 0 R /Prev $xref1At >>\n")
    sb2.append(s"startxref\n$xref2At\n%%EOF\n")
    val r2 = fld(PdfMeta.parse(sb2.toString.getBytes("ISO-8859-1")))
    assert(r2.nObjects === 5, "a newer 'f' entry must shadow the older 'n'")
  }

  test("decline envelope: hostile structures NULL, never throw") {
    def dies(b: Array[Byte]): Unit = assert(PdfMeta.parse(b) == null)
    val good = PdfEncode.encode(3L, 4, 5, false, 0)
    val s = new String(good, "ISO-8859-1")
    // no header / no startxref / lying xref offset
    dies("not a pdf at all, definitely not".getBytes)
    dies(s.replace("startxref", "startxrfe").getBytes("ISO-8859-1"))
    dies(s.replaceAll("(?s)startxref\n\\d+", "startxref\n999999999").getBytes("ISO-8859-1"))
    // xref STREAM (1.5+): offset points at an object, not a table
    dies(s.replaceAll("(?s)startxref\n\\d+",
      "startxref\n" + s.indexOf("1 0 obj")).getBytes("ISO-8859-1"))
    // malformed entry width (19 bytes)
    dies(s.replace("0000000000 65535 f \n", "000000000 65535 f \n").getBytes("ISO-8859-1"))
    // /Prev loop: a section whose /Prev points at ITSELF exhausts the
    // hop bound and declines instead of spinning
    val xrefAt = s.indexOf("\nxref\n") + 1
    val looped = s.substring(0, s.lastIndexOf("trailer")) +
      s"trailer\n<< /Size 7 /Root 1 0 R /Prev $xrefAt >>\n" +
      s"startxref\n$xrefAt\n%%EOF\n"
    dies(looped.getBytes("ISO-8859-1"))
    // Root pointing at a freed object
    dies(s.replace("/Root 1 0 R", "/Root 0 0 R").getBytes("ISO-8859-1"))
    // NAME-token boundary: /Encryption is NOT /Encrypt (prefix match
    // would falsely report encryption)
    val prefixed = s.replace("/Root 1 0 R >>", "/Root 1 0 R /Encryption 5 0 R >>")
    val rp = PdfMeta.parse(prefixed.getBytes("ISO-8859-1"))
    assert(rp != null && !rp.getBoolean(2),
      "/Encryption (a different name) must not set the /Encrypt flag")
    // truncation law: every prefix parses or NULLs, never throws
    (0 until good.length).foreach(i => PdfMeta.parse(good.take(i)))
  }
}
