package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.plans.{RtfEncode, RtfText}

/** RTF text extraction (plans.RtfText): the control-word walk.
  * Pins: fixture round trips (expected text = RtfEncode.decodedPara,
  * the oracle's contract), destination-group invisibility (starred
  * and named), the \uN/\ucN fallback protocol, cp1252 \'hh decode,
  * the delimiter-space rule, \bin raw-byte consumption, the decline
  * envelope (foreign code pages, unbalanced braces, trailing bytes,
  * surrogate \u, depth), and the never-throw law. */
class RtfSpec extends AnyFunSuite {

  private def txt(b: Array[Byte]): String = {
    val u = RtfText.parse(b)
    if (u == null) null else u.toString
  }
  private def txt(s: String): String = txt(s.getBytes("ISO-8859-1"))

  test("fixture round trips: decoded text is decodedPara + trailing par") {
    for (seed <- Seq(0L, 1L, 2L, 3L, 7L, 41L, 178L, 4242L); n <- Seq(1, 2, 4)) {
      val got = txt(RtfEncode.encode(seed, n))
      assert(got != null, s"seed=$seed n=$n declined")
      val expected = (0 until n).map(RtfEncode.decodedPara(seed, _))
        .mkString("\n") + "\n"
      assert(got === expected, s"seed=$seed n=$n")
    }
  }

  test("destinations are invisible; formatting words are inert") {
    assert(txt("{\\rtf1\\ansi{\\fonttbl{\\f0 Arial;}}{\\colortbl;\\red1;}" +
      "{\\info{\\title secret}}{\\*\\mystery hidden {\\nested also}}" +
      "\\pard\\b\\i0\\fs24 visible\\par}") === "visible\n")
    // a nested group inside a skipped destination stays skipped, and
    // the skip ENDS at the destination's closing brace
    assert(txt("{\\rtf1{\\*\\x a{\\y b}c}after}") === "after")
  }

  test("the uc protocol: \\uN fallbacks are skipped, uc is group-scoped") {
    // default uc=1: one fallback char skipped
    assert(txt("{\\rtf1 a\\u8364 ?b}") === "a€b")
    // uc2: two fallback chars (incl. \'hh escapes) skipped
    assert(txt("{\\rtf1\\uc2 a\\u8364 \\'80?b}") === "a€b")
    // uc0: nothing skipped
    assert(txt("{\\rtf1\\uc0 a\\u8364 b}") === "a€b")
    // negative N + 65536 (the signed-16-bit convention)
    assert(txt("{\\rtf1\\uc0 a\\u-3825 b}") === "a" + 0xF10F.toChar + "b")
    // uc set inside a group restores at its close
    assert(txt("{\\rtf1{\\uc2 \\u65 xy}\\u66 z}") === "AB")
    // a surrogate scalar declines, never a lone surrogate
    assert(txt("{\\rtf1\\uc0 \\u-10240 }") === null)
    // uc outside 0..8 declines
    assert(txt("{\\rtf1\\uc9 x}") === null)
  }

  test("cp1252 escapes, named punctuation, control symbols, delimiter space") {
    assert(txt("{\\rtf1 caf\\'e9 \\'80\\'93q\\'94}") === "café €“q”")
    assert(txt("{\\rtf1 a\\emdash b\\endash c\\bullet d}") === "a—b–c•d")
    assert(txt("{\\rtf1 \\lquote x\\rquote  \\ldblquote y\\rdblquote}")
      === "‘x’ “y”")
    // \~ nbsp, \_ non-breaking hyphen, \- nothing, literal braces
    assert(txt("{\\rtf1 a\\~b\\_c\\-d \\{x\\} \\\\y}") === "a b-cd {x} \\y")
    // ONE space after a control word is the delimiter; the second is
    // text — and a digit-adjacent word must not eat the digits
    assert(txt("{\\rtf1 \\tab  x\\fs20 1}") === "\t x1")
    // \<EOL> is a par alias; bare newlines in text are ignored
    assert(txt("{\\rtf1 a\\\nb\nc}") === "a\nbc")
  }

  test("\\bin consumes raw bytes even when they contain braces") {
    val bin = "{\\rtf1 a{\\pict\\bin5 " + "}}{{\\" + " b}c}"
    assert(txt(bin) === "ac")
    // \bin past the end declines
    assert(txt("{\\rtf1 \\bin99 xx}") === null)
  }

  test("single-byte Windows code pages rebind the escape table") {
    // cp1251 Cyrillic: "Привет" is bytes CF F0 E8 E2 E5 F2
    assert(txt("{\\rtf1\\ansi\\ansicpg1251 \\'cf\\'f0\\'e8\\'e2\\'e5\\'f2!}")
      === "Привет!")
    // cp1250 Central European: 0xF8 is ř, 0xB9 is ą
    assert(txt("{\\rtf1\\ansicpg1250 \\'f8\\'b9}") === "řą")
    // cp1253 Greek: 0xE1 is α; and its UNDEFINED byte 0xAA declines
    assert(txt("{\\rtf1\\ansicpg1253 \\'e1}") === "α")
    assert(txt("{\\rtf1\\ansicpg1253 \\'aa}") === null)
    // the same bytes under the default cp1252 decode differently —
    // the declaration is load-bearing, never ignored
    assert(txt("{\\rtf1 \\'cf\\'f0}") === "Ïð")
  }

  test("raw high bytes in plain text decode through the declared page") {
    // cp1251 Cyrillic: a raw unescaped 0xE9 is й — the old Latin-1
    // identity would have served é, silent mojibake
    assert(txt("{\\rtf1\\ansicpg1251 xéy}") === "xйy")
    // the cp1252 default: raw 0x80 is € per the WHATWG table
    assert(txt("{\\rtf1 ab}") === "a€b")
    // a raw byte UNDEFINED in the declared page declines (cp1253 0xAA)
    assert(txt("{\\rtf1\\ansicpg1253 aªb}") === null)
    // and the same raw bytes stay consistent with their \'hh twins
    assert(txt("{\\rtf1\\ansicpg1251 Ïðèâåò}")
      === "Привет")
  }

  test("footnote destinations are invisible; 32-letter control words parse") {
    // {\footnote ...} bodies are margin text, not the paragraph's
    assert(txt("{\\rtf1 body{\\footnote hidden note}end}") === "bodyend")
    assert(txt("{\\rtf1 a{\\aftncn x}{\\ftncn y}b}") === "ab")
    // the spec's maximum: EXACTLY 32 letters is a legal (unknown,
    // inert) control word; 33 declines
    val w32 = "a" * 32
    assert(txt(s"{\\rtf1 x\\$w32 y}") === "xy")
    assert(txt(s"{\\rtf1 x\\${w32}a y}") === null)
  }

  test("decline envelope: foreign code pages, structure, trailing bytes") {
    // a MULTI-byte code page can't be served through 1-byte escapes
    assert(txt("{\\rtf1\\ansi\\ansicpg932 caf\\'e9}") === null)
    assert(txt("{\\rtf1\\ansi\\ansicpg936 x}") === null)
    assert(txt("{\\rtf1\\ansicpg1252 caf\\'e9}") === "café")
    // not RTF at all
    assert(txt("plain text") === null)
    assert(txt("{\\rtx1 x}") === null)
    // unbalanced braces both ways
    assert(txt("{\\rtf1 {x}") === null)
    assert(txt("{\\rtf1 x}}") === null)
    // trailing non-whitespace after the root close
    assert(txt("{\\rtf1 x}garbage") === null)
    assert(txt("{\\rtf1 x}\r\n") === "x")
    // malformed \'h escape
    assert(txt("{\\rtf1 \\'zq}") === null)
    // depth bomb
    assert(txt("{\\rtf1 " + "{" * 100 + "}" * 100 + "}") === null)
  }

  test("truncations and bit flips never throw") {
    val b = RtfEncode.encode(41L, 4)
    var cut = 1
    while (cut < b.length) {
      RtfText.parse(java.util.Arrays.copyOf(b, cut))
      cut += 3
    }
    val rnd = new scala.util.Random(7)
    (0 until 300).foreach { _ =>
      val m = b.clone()
      val at = rnd.nextInt(m.length)
      m(at) = (m(at) ^ (1 << rnd.nextInt(8))).toByte
      RtfText.parse(m)
    }
  }
}

/** The registered query against its own contract: every (doc_id,
  * text) row of text_rtf_extract must equal the decodedPara
  * aggregation the DuckDB oracle restates. */
class RtfQuerySpec extends SparkSpec {

  test("text_rtf_extract rows equal the decodedPara contract at sf0.001") {
    val rows = graft.operators.Multimodal.rtfIngest(spark, sf).collect()
    assert(rows.length > 0)
    rows.foreach { r =>
      val (doc, text) = (r.getLong(0), r.getString(1))
      val n = (doc % 4 + 1).toInt
      val expected = (0 until n)
        .map(graft.plans.RtfEncode.decodedPara(doc, _)).mkString("\n") + "\n"
      assert(text === expected, s"doc=$doc")
    }
    assert(rows.map(_.getLong(0)).forall(_ % 179 != 0), "gate rows absent")
  }
}
