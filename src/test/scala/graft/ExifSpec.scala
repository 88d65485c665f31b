package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.plans.ExifMeta

/** EXIF IFD-chain triage: encode→parse round trips across byte orders
  * and containers, the sub-IFD shadowing rule, the printable-ASCII
  * gate, fallbacks, hostile structures, and the truncation law. */
class ExifSpec extends AnyFunSuite {

  private val dt = "2021:02:03 04:05:06"
  private val dto = "2001:04:08 05:11:13"

  test("round trips: both byte orders x both containers x all orientations") {
    for {
      le <- Seq(true, false)
      wrap <- Seq(true, false)
      o <- 1 to 8
    } {
      val b = ExifMeta.encode(7L + o, le, wrap, o, s"make$o", dt, dto)
      val m = ExifMeta.parse(b)
      assert(m != null, s"le=$le wrap=$wrap o=$o")
      assert(m.getString(0) === (if (wrap) "jpeg" else "tiff"))
      assert(m.getInt(1) === o)
      // the sub-IFD DateTimeOriginal shadows IFD0's DateTime
      assert(m.getString(2) === dto)
      assert(m.getString(3) === s"make$o")
    }
  }

  test("EXIF is found behind earlier segments; JPEG without EXIF is NULL") {
    val withExif = ExifMeta.encode(3L, true, true, 5, "cam", dt, dto)
    // splice a COM segment between SOI and the APP1: the walk must
    // skip it by declared length and still find the EXIF
    val com = Array[Byte](0xFF.toByte, 0xFE.toByte, 0x00, 0x06, 'h', 'e', 'l', 'o')
    val shifted = withExif.take(2) ++ com ++ withExif.drop(2)
    val m = ExifMeta.parse(shifted)
    assert(m != null && m.getInt(1) === 5 && m.getString(2) === dto)
    // a real entropy-coded JPEG with no APP1 at all: NULL, not a throw
    val plain = graft.plans.JpegEncode.encodeBlocky(10, 9, 3L, false)
    assert(ExifMeta.parse(plain) == null)
  }

  test("IFD0 DateTime is the fallback when the sub-IFD string is unusable") {
    val b = ExifMeta.encode(9L, true, false, 3, "cam", dt, dto)
    // corrupt one byte of DateTimeOriginal to a non-printable: the
    // ASCII gate refuses it and the parse falls back to IFD0 DateTime
    val idx = indexOfAscii(b, dto)
    assert(idx > 0)
    val c = b.clone(); c(idx) = 0x01
    val m = ExifMeta.parse(c)
    assert(m != null)
    assert(m.getString(2) === dt, "expected the IFD0 DateTime fallback")
  }

  test("a hand-rolled minimal IFD (orientation + DateTime only) parses") {
    // little-endian, 2 entries, no EXIF sub-IFD — the shape of scans
    // and older tooling; pins that 34665 is optional
    val out = new java.io.ByteArrayOutputStream()
    def w8(v: Int): Unit = out.write(v & 0xFF)
    def w16(v: Int): Unit = { w8(v); w8(v >>> 8) }
    def w32(v: Int): Unit = { w8(v); w8(v >>> 8); w8(v >>> 16); w8(v >>> 24) }
    w8('I'); w8('I'); w8(42); w8(0); w32(8)
    w16(2)
    w16(274); w16(3); w32(1); w16(6); w16(0)
    w16(306); w16(2); w32(20); w32(8 + 2 + 24 + 4)
    w32(0)
    dt.foreach(c => w8(c)); w8(0)
    val m = ExifMeta.parse(out.toByteArray)
    assert(m != null)
    assert(m.getString(0) === "tiff" && m.getInt(1) === 6)
    assert(m.getString(2) === dt)
    assert(m.isNullAt(3), "no Make tag -> null field")
  }

  test("GPS coordinates round-trip in exact integer centiseconds") {
    // all four hemisphere sign combinations, plus the equator/prime-
    // meridian zeros and the extremes
    for {
      lat <- Seq(0, 1, 12345678, -12345678, 90 * 360000, -90 * 360000)
      lon <- Seq(0, -1, 23456789, 180 * 360000)
      le <- Seq(true, false)
    } {
      val b = ExifMeta.encode(5L, le, wrapJpeg = false, 1, "cam", dt, dto, lat, lon)
      val m = ExifMeta.parse(b)
      assert(m != null)
      assert(m.getInt(4) === lat, s"lat le=$le")
      assert(m.getInt(5) === lon, s"lon le=$le")
    }
    // JPEG container carries the same GPS IFD
    val j = ExifMeta.parse(ExifMeta.encode(5L, true, wrapJpeg = true,
      1, "cam", dt, dto, -777777, 888888))
    assert(j != null && j.getInt(4) === -777777 && j.getInt(5) === 888888)
    // the decode is truncating rational arithmetic, not float: a
    // seconds rational of 1/3 (= 0.333… s = 33.3… cs) reads as 33 cs
    val b = ExifMeta.encode(5L, true, wrapJpeg = false, 1, "cam", dt, dto, 6000, 0)
    // rewrite the latitude seconds rational (num=0,den=100 at the end
    // of the lat coord block) to 1/3: LE u32s
    val latNum = b.length - 48 + 16 // lat coord = 24 bytes before lon's 24
    b(latNum) = 1; b(latNum + 1) = 0; b(latNum + 2) = 0; b(latNum + 3) = 0
    b(latNum + 4) = 3; b(latNum + 5) = 0; b(latNum + 6) = 0; b(latNum + 7) = 0
    val m3 = ExifMeta.parse(b)
    assert(m3 != null && m3.getInt(4) === 6000 + 33, "1/3 s must truncate to 33 cs")
    // a zero denominator declines the FIELD, not the row
    val z = ExifMeta.encode(5L, true, wrapJpeg = false, 4, "cam", dt, dto, 6000, 7)
    val zNum = z.length - 48 + 20 // lat seconds denominator
    z(zNum) = 0; z(zNum + 1) = 0; z(zNum + 2) = 0; z(zNum + 3) = 0
    val mz = ExifMeta.parse(z)
    assert(mz != null && mz.isNullAt(4) && mz.getInt(5) === 7)
    assert(mz.getInt(1) === 4, "other fields survive a bad coordinate")
  }

  test("hostile structures are NULL, never a throw") {
    val good = ExifMeta.encode(4L, false, false, 2, "cam", dt, dto)
    // out-of-range orientation (9) is a structural refusal
    val badO = ExifMeta.encode(4L, true, false, 8, "cam", dt, dto)
    // LE: orientation entry value low byte; find tag 274's value field
    val oIdx = 10 + 12 + 8 // IFD count + first entry (271) + tag/typ/count of 274
    assert((badO(oIdx) & 0xFF) === 8)
    badO(oIdx) = 9
    assert(ExifMeta.parse(badO) == null)
    // entry-count bomb: claims more entries than the buffer holds
    val bomb = good.clone()
    bomb(8) = 0xFF.toByte; bomb(9) = 0x7F.toByte // BE count at IFD0
    assert(ExifMeta.parse(bomb) == null)
    // truncation law: every prefix either parses to a row whose
    // fields are a subset of the full ones, or is NULL — never a throw
    val full = ExifMeta.parse(good)
    for (n <- 0 until good.length) {
      val m = ExifMeta.parse(good.take(n))
      if (m != null) {
        assert(m.isNullAt(1) || m.getInt(1) === full.getInt(1))
        assert(m.isNullAt(3) || m.getString(3) === full.getString(3))
      }
    }
    // same law for the JPEG container
    val jp = ExifMeta.encode(4L, true, true, 2, "cam", dt, dto)
    for (n <- 0 until jp.length) ExifMeta.parse(jp.take(n))
    // REGRESSION (r13 review): a fill-byte FF run ending at the buffer
    // edge moved the walk cursor past the bounds check and crashed —
    // the segment-length read must re-check after the skip
    assert(ExifMeta.parse(Array[Byte](0xFF.toByte, 0xD8.toByte,
      0xFF.toByte, 0xFF.toByte, 0xFF.toByte, 0xFF.toByte,
      0xE0.toByte, 0x00)) == null)
    assert(ExifMeta.parse(Array.fill[Byte](16)(0xFF.toByte)
      .updated(1, 0xD8.toByte)) == null)
  }

  private def indexOfAscii(b: Array[Byte], s: String): Int = {
    val pat = s.getBytes("US-ASCII")
    (0 to b.length - pat.length).find(i =>
      pat.indices.forall(j => b(i + j) == pat(j))).getOrElse(-1)
  }
}
