package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.plans.{WarcEncode, WarcRecords}

/** WARC record triage (plans.WarcRecords): ISO 28500 record grammar
  * over both layouts — gzip-member-per-record (Annex D) and
  * uncompressed. Pins: layout equivalence (identical records parsed
  * from both), the length-delimited payload skip (payloads containing
  * "WARC/1.0" must not confuse the walk), the whole-doc decline
  * contract, and the truncation law. */
class WarcSpec extends AnyFunSuite {

  private def rows(b: Array[Byte]): Seq[(String, String, Long)] = {
    val arr = WarcRecords.parse(b)
    if (arr == null) null
    else (0 until arr.numElements()).map { i =>
      val r = arr.getStruct(i, 3)
      (r.getUTF8String(0).toString,
        if (r.isNullAt(1)) null else r.getUTF8String(1).toString,
        r.getLong(2))
    }
  }

  test("both layouts parse to the identical record plan") {
    for (seed <- Seq(1L, 77L, 4242L, 99999L)) {
      val expected = WarcEncode.recordPlan(seed)
        .map { case (t, u, c) => (t, u, c.toLong) }
      val compressed = rows(WarcEncode.encode(seed, compressed = true))
      val plain = rows(WarcEncode.encode(seed, compressed = false))
      assert(compressed === expected, s"seed=$seed compressed")
      assert(plain === expected, s"seed=$seed plain")
    }
  }

  test("payloads containing WARC magic do not confuse the length-delimited walk") {
    // hand-build: a response whose PAYLOAD is a full WARC record text
    val inner = "WARC/1.0\r\nWARC-Type: sneaky\r\nContent-Length: 0\r\n\r\n\r\n\r\n"
    val rec = "WARC/1.0\r\nWARC-Type: response\r\n" +
      s"WARC-Target-URI: http://x.org/\r\nContent-Length: ${inner.length}\r\n\r\n" +
      inner + "\r\n\r\n"
    val got = rows(rec.getBytes("ISO-8859-1"))
    assert(got === Seq(("response", "http://x.org/", inner.length.toLong)),
      "the payload's embedded record must be SKIPPED, not parsed")
  }

  test("response hop: URI + exact payload bytes from both layouts") {
    val body = "<html><body><p>hello crawl</p></body></html>".getBytes("UTF-8")
    for (compressed <- Seq(true, false)) {
      val b = WarcEncode.encodeWith(31L, compressed, Some(body))
      val r = WarcRecords.parseResponse(b)
      assert(r != null, s"compressed=$compressed")
      assert(r.getUTF8String(0).toString === "http://ex31.org/p5")
      assert(r.getBinary(1).toSeq === body.toSeq,
        "the response payload must round-trip byte-exactly")
    }
    // an archive with NO response record answers null (not a decline
    // of the doc — the archive is sound, the hop just has no target)
    val onlyInfo = ("WARC/1.0\r\nWARC-Type: warcinfo\r\n" +
      "Content-Length: 2\r\n\r\nab\r\n\r\n").getBytes("ISO-8859-1")
    assert(WarcRecords.parseResponse(onlyInfo) == null)
    // a corrupt member BEFORE the response declines the hop too
    val gz = WarcEncode.encodeWith(31L, compressed = true, Some(body))
    val corrupt = gz.clone()
    corrupt(20) = (corrupt(20) ^ 0x7F).toByte // inside the first member
    assert(WarcRecords.parseResponse(corrupt) == null)
  }

  test("whole-doc decline: one bad record nulls the archive") {
    def dies(b: Array[Byte]): Unit = assert(WarcRecords.parse(b) == null)
    val good = WarcEncode.encode(9L, compressed = false)
    val s = new String(good, "ISO-8859-1")
    // lying Content-Length (first record claims one byte: the walk
    // lands mid-payload and the terminator check fails)
    dies(s.replaceFirst("Content-Length: \\d+", "Content-Length: 1")
      .getBytes("ISO-8859-1"))
    dies((s + "junk").getBytes("ISO-8859-1"))
    dies(s.replace("WARC/1.0", "WARC/9.9").getBytes("ISO-8859-1"))
    dies(s.replaceFirst("Content-Length", "Content-Lies").getBytes("ISO-8859-1"))
    // a record missing its two-CRLF terminator (chop the tail)
    dies(good.dropRight(2))
    // compressed: a corrupt member's CRC declines the DOC (the
    // materializing path must never serve corrupt bytes)
    val gz = WarcEncode.encode(9L, compressed = true)
    val corrupt = gz.clone()
    corrupt(gz.length - 6) = (corrupt(gz.length - 6) ^ 0x01).toByte
    dies(corrupt)
    // truncation law over both layouts
    (0 until good.length).foreach(i => WarcRecords.parse(good.take(i)))
    (0 until gz.length).foreach(i => WarcRecords.parse(gz.take(i)))
  }
}
