package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.plans.{PptEncode, PptText}

/** PowerPoint 97-2003 binary extraction (plans.PptText over
  * plans.CfbParse): the record-tree walk. Pins: fixture round trips
  * (both atom forms, CR normalization), the decline envelope
  * (CryptSession10, record overruns, lone surrogates, control
  * bytes), and never-throw. */
class PptSpec extends AnyFunSuite {

  private def txt(b: Array[Byte]): String = {
    val u = PptText.parse(b)
    if (u == null) null else u.toString
  }

  private def expected(seed: Long, n: Int): String =
    (1 to n).map(PptEncode.decodedSlide(seed, _)).mkString("\n")

  test("fixture round trips: both atom forms decode to decodedSlide") {
    for (seed <- Seq(0L, 1L, 2L, 3L, 7L, 41L, 126L, 4242L); n <- Seq(1, 2, 3)) {
      val got = txt(PptEncode.encode(seed, n))
      assert(got != null, s"seed=$seed n=$n declined")
      assert(got === expected(seed, n), s"seed=$seed n=$n")
    }
  }

  test("master/notes SlideListWithText instances are chrome, never deck text") {
    // odd seeds carry a master (instance 1) and a notes (instance 2)
    // SLWT with their own text atoms: the served text must equal the
    // slide contract EXACTLY — no leaked chrome
    val got = txt(PptEncode.encode(7L, 2))
    assert(got === expected(7L, 2))
    assert(!got.contains("Master"), "master chrome leaked into deck text")
    assert(!got.contains("Speaker note"), "notes leaked into deck text")
  }

  test("declines: encryption container, record overrun, not a deck") {
    val b = PptEncode.encode(9L, 2)
    assert(txt(b) != null)
    val streamOff = 512 + 3 * 512 // the big stream's first sector
    // the DocumentContainer's first nested record is the SLWT header
    // at streamOff+8; retype it CryptSession10Container (0x2F14)
    val enc = b.clone()
    enc(streamOff + 8 + 2) = 0x14
    enc(streamOff + 8 + 3) = 0x2F
    assert(txt(enc) === null, "an encrypted deck must decline")
    // a record length overrunning its parent declines
    val bad = b.clone()
    bad(streamOff + 8 + 4) = 0xFF.toByte
    bad(streamOff + 8 + 5) = 0xFF.toByte
    assert(txt(bad) === null)
    // a control byte inside a TextBytesAtom declines (field plumbing)
    val s = new String(b, "ISO-8859-1")
    val at = s.indexOf("slide 2 caf")
    val ctl = b.clone()
    ctl(at) = 0x01
    assert(txt(ctl) === null)
    assert(txt("plain".getBytes("US-ASCII")) === null)
  }

  test("truncations and bit flips never throw") {
    val b = PptEncode.encode(41L, 3)
    var cut = 0
    while (cut < b.length) {
      PptText.parse(java.util.Arrays.copyOf(b, cut))
      cut += 512
    }
    val rnd = new scala.util.Random(7)
    (0 until 400).foreach { _ =>
      val m = b.clone()
      val at = rnd.nextInt(m.length)
      m(at) = (m(at) ^ (1 << rnd.nextInt(8))).toByte
      PptText.parse(m)
    }
  }
}

/** The registered query + the triage routing at sf0.001. */
class PptQuerySpec extends SparkSpec {

  test("text_ppt_extract rows equal the decodedSlide contract") {
    val rows = graft.operators.Multimodal.pptBinIngest(spark, sf).collect()
    assert(rows.length > 0)
    rows.foreach { r =>
      val (doc, text) = (r.getLong(0), r.getString(1))
      val n = (doc % 3 + 1).toInt
      val want = (1 to n).map(graft.plans.PptEncode.decodedSlide(doc, _))
        .mkString("\n")
      assert(text === want, s"doc=$doc")
    }
    assert(rows.map(_.getLong(0)).forall(_ % 125 != 0), "gate rows absent")
  }

  test("the document triage routes a PowerPoint container to kind='ppt' with text") {
    import org.apache.spark.sql.functions.{col, lit}
    import spark.implicits._
    val df = Seq(78L).toDF("doc_id")
      .select(col("doc_id"), graft.plans.VectorExpressions.pptEncode(
        col("doc_id"), lit(2)).as("payload"))
    val out = graft.operators.Multimodal.docTextSelect(df, "payload").collect()
    assert(out.length === 1)
    assert(out(0).getString(1) === "ppt")
    assert(out(0).getString(2) ===
      (1 to 2).map(graft.plans.PptEncode.decodedSlide(78L, _)).mkString("\n"))
  }
}
