package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.plans.PlainText

/** Plain-text payload decode (plans.PlainText): the no-container
  * triage tier. Pins: BOM dispatch (UTF-8 / UTF-16LE / UTF-16BE, the
  * BOM stripped), strict decode (malformed sequences, odd UTF-16
  * length, lone surrogates decline), the control-byte gate (NUL and
  * C0 other than TAB/LF/CR, and DEL, decline), the empty/bounded
  * envelope, and never-throw over hostile bytes. */
class PlainTextSpec extends AnyFunSuite {

  private def dec(b: Array[Byte]): String = {
    val r = PlainText.decode(b)
    if (r == null) null else r.toString
  }

  test("BOM dispatch: the same text through all three encodings") {
    val s = "Café — € ok\tdone\nline2\r\n"
    assert(dec(s.getBytes("UTF-8")) === s)
    assert(dec(Array(0xEF, 0xBB, 0xBF).map(_.toByte) ++ s.getBytes("UTF-8")) === s)
    assert(dec(Array(0xFF, 0xFE).map(_.toByte) ++ s.getBytes("UTF-16LE")) === s)
    assert(dec(Array(0xFE, 0xFF).map(_.toByte) ++ s.getBytes("UTF-16BE")) === s)
    // astral plane rides UTF-8 and UTF-16 alike
    val g = "clef 𝄞 end"
    assert(dec(g.getBytes("UTF-8")) === g)
    assert(dec(Array(0xFF, 0xFE).map(_.toByte) ++ g.getBytes("UTF-16LE")) === g)
  }

  test("strict decode: malformed bytes decline, never mojibake") {
    // a bare cp1252 high byte is invalid UTF-8
    assert(dec(Array('a'.toByte, 0xE9.toByte, 'b'.toByte)) === null)
    // truncated multi-byte sequence
    assert(dec("café".getBytes("UTF-8").dropRight(1)) === null)
    // odd-length UTF-16 body
    assert(dec(Array(0xFF, 0xFE).map(_.toByte) ++
      "ab".getBytes("UTF-16LE").dropRight(1)) === null)
    // a lone surrogate in UTF-16
    assert(dec(Array(0xFF, 0xFE, 0x3E, 0xD8).map(_.toByte)) === null)
    // CESU-style surrogate bytes in UTF-8 decline
    assert(dec(Array(0xED, 0xA0, 0xBE).map(_.toByte)) === null)
  }

  test("control-byte gate: binary wearing a text charset declines") {
    assert(dec(("ok" + 0.toChar + "bad").getBytes("UTF-8")) === null) // NUL
    assert(dec(("ok" + 1.toChar + "bad").getBytes("UTF-8")) === null) // SOH
    assert(dec(("ok" + 11.toChar + "bad").getBytes("UTF-8")) === null) // VT
    assert(dec(("ok" + 27.toChar + "bad").getBytes("UTF-8")) === null) // ESC
    assert(dec(("ok" + 127.toChar + "bad").getBytes("UTF-8")) === null) // DEL
    // TAB/LF/CR are text
    assert(dec("a\tb\nc\rd".getBytes("UTF-8")) === "a\tb\nc\rd")
    // the binary blob the docmix fixture plants stays 'other'
    assert(dec(Array(0x00, 0x01, 0x02, 0x03).map(_.toByte)) === null)
  }

  test("envelope: empty payload declines, BOM-only serves empty, bounds hold") {
    assert(dec(Array.empty[Byte]) === null)
    assert(dec(Array(0xEF, 0xBB, 0xBF).map(_.toByte)) === "")
    assert(dec(Array(0xFF, 0xFE).map(_.toByte)) === "")
    assert(dec(new Array[Byte]((1 << 22) + 1)) === null) // over-cap
    assert(PlainText.decode(null) === null)
  }

  test("hostile bytes never throw") {
    val rnd = new scala.util.Random(13)
    (0 until 500).foreach { _ =>
      val b = new Array[Byte](rnd.nextInt(64))
      rnd.nextBytes(b)
      PlainText.decode(b)
    }
  }
}
