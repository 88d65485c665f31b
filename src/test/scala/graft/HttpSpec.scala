package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.plans.{HttpBody, HttpText}

/** HTTP response-message triage (plans.HttpBody): status line, header
  * block, the three body framings (Content-Length / chunked /
  * read-to-end), and the four content codings (identity / gzip /
  * zlib-deflate / raw-deflate). Pins: the 3×4 framing×coding matrix
  * all reassembling the identical body (each path certifies the
  * others — the cross-witness discipline; the gzip/deflate writers
  * are the JDK's, an independent implementation of the decode path),
  * chunked grammar details, charset parameter retention, the
  * lying-length and corrupt-stream declines, the inflate ceiling, and
  * the charset-aware text decode (plans.HttpText) with its
  * mojibake-never law. */
class HttpSpec extends AnyFunSuite {

  private def parse(b: Array[Byte]) = HttpBody.parse(b)
  private def body(r: org.apache.spark.sql.catalyst.InternalRow): Array[Byte] =
    r.getBinary(3)
  private def charset(r: org.apache.spark.sql.catalyst.InternalRow): String =
    if (r.isNullAt(2)) null else r.getUTF8String(2).toString

  test("the full framing x coding matrix reassembles the identical body") {
    val payload = (0 until 500).map(i => s"w$i").mkString(" ").getBytes("UTF-8")
    for (mode <- 0 to 2; coding <- 0 to 3; seed <- Seq(3L, 77L, 999L)) {
      val msg = HttpBody.wrap(seed, 200, "text/html; charset=utf-8",
        payload, mode, coding)
      val r = parse(msg)
      assert(r != null, s"mode=$mode coding=$coding seed=$seed")
      assert(r.getInt(0) === 200)
      // parameters after ';' split off the routing key, kept as charset
      assert(r.getUTF8String(1).toString === "text/html")
      assert(charset(r) === "utf-8")
      assert(body(r).toSeq === payload.toSeq,
        s"mode=$mode coding=$coding body diverged")
    }
  }

  test("chunked grammar: multi-chunk, extension, trailer, hex case") {
    val msg = ("HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n" +
      "4;ext=1\r\nab, \r\nA\r\n0123456789\r\n0\r\nX-T: v\r\n\r\n")
      .getBytes("ISO-8859-1")
    val r = parse(msg)
    assert(r != null)
    assert(new String(body(r), "ISO-8859-1") === "ab, 0123456789")
  }

  test("content-coding declines: corrupt stream, ceiling, unknown codings") {
    val payload = "content body".getBytes("UTF-8")
    // corrupt gzip: flip a byte inside the deflate stream
    val gz = HttpBody.wrap(5L, 200, "text/html", payload, 0, 1)
    val headEnd = {
      var k = 0
      while (!(gz(k) == '\r' && gz(k + 1) == '\n' &&
        gz(k + 2) == '\r' && gz(k + 3) == '\n')) k += 1
      k + 4
    }
    val corrupt = gz.clone()
    corrupt(headEnd + 15) = (corrupt(headEnd + 15) ^ 0x5A).toByte
    assert(parse(corrupt) == null, "corrupt gzip body served")
    // truncated coded body (chop mid-stream): decline, whatever the cut
    (headEnd until gz.length).foreach(i => assert(parse(gz.take(i)) == null))
    // bomb ceiling: 2 MiB of zeros inflates past the 1 MiB cap
    val bomb = HttpBody.wrap(5L, 200, "text/html",
      new Array[Byte](2 * 1024 * 1024), 0, 1)
    assert(parse(bomb) == null, "over-ceiling inflate served")
    // unknown / stacked codings decline — compressed bytes must never
    // masquerade as content (brotli: no JDK decoder offline)
    def withCoding(ce: String): Array[Byte] =
      (s"HTTP/1.1 200 OK\r\nContent-Encoding: $ce\r\n" +
        s"Content-Length: ${payload.length}\r\n\r\n").getBytes("ISO-8859-1") ++ payload
    assert(parse(withCoding("br")) == null)
    assert(parse(withCoding("zstd")) == null)
    assert(parse(withCoding("gzip, deflate")) == null)
    // identity tokens are no-ops
    val idy = parse(withCoding("identity"))
    assert(idy != null && body(idy).toSeq === payload.toSeq)
    // x-gzip is gzip (RFC 9110 §8.4.1.3)
    val xg = HttpBody.wrap(5L, 200, "text/html", payload, 0, 1)
    val xgMsg = new String(xg, "ISO-8859-1")
      .replace("Content-Encoding: gzip", "Content-Encoding: x-gzip")
      .getBytes("ISO-8859-1")
    // header-only replace shifts no binary bytes (same length)
    val xr = parse(xgMsg)
    assert(xr != null && body(xr).toSeq === payload.toSeq)
  }

  test("charset parameter retention: quotes, case, absence") {
    def msgWith(ct: String): Array[Byte] =
      (s"HTTP/1.1 200 OK\r\nContent-Type: $ct\r\nContent-Length: 2\r\n\r\nhi")
        .getBytes("ISO-8859-1")
    assert(charset(parse(msgWith("text/html; charset=Windows-1252"))) ===
      "windows-1252")
    assert(charset(parse(msgWith("text/html;charset=\"UTF-8\""))) === "utf-8")
    assert(charset(parse(msgWith("text/html; boundary=x; charset=ISO-8859-1")))
      === "iso-8859-1")
    assert(charset(parse(msgWith("text/html"))) == null)
    assert(parse(msgWith("text/plain")).getUTF8String(1).toString === "text/plain")
  }

  test("declines and honest edges") {
    def dies(s: String): Unit =
      assert(parse(s.getBytes("ISO-8859-1")) == null, s.take(40))
    // malformed status lines
    dies("HTP/1.1 200 OK\r\n\r\nbody")
    dies("HTTP/1.1 20 OK\r\n\r\nbody")
    dies("HTTP/1.1 200OK\r\n\r\nbody")
    // header without a colon
    dies("HTTP/1.1 200 OK\r\nBadHeader\r\n\r\nbody")
    // lying Content-Length (claims more than available)
    dies("HTTP/1.1 200 OK\r\nContent-Length: 99\r\n\r\nshort")
    // chunk framing: bad hex, missing chunk CRLF, missing terminator
    dies("HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\nzz\r\nab\r\n0\r\n\r\n")
    dies("HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n2\r\nabX0\r\n\r\n")
    dies("HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n2\r\nab\r\n")
    // Content-Length SHORTER than available: the claim wins (the WARC
    // record may carry trailing bytes beyond the entity)
    val r = parse("HTTP/1.1 200 OK\r\nContent-Length: 4\r\n\r\nbodyEXTRA".getBytes)
    assert(r != null && new String(body(r)) === "body")
    // 404 with no Content-Type: type NULL, status honest
    val nf = parse("HTTP/1.1 404 Not Found\r\n\r\ngone".getBytes)
    assert(nf != null && nf.getInt(0) === 404 && nf.isNullAt(1))
    // truncation law over a chunked+gzip instance
    val full = HttpBody.wrap(7L, 200, "text/html", "x".repeat(300).getBytes, 1, 1)
    (0 until full.length).foreach(i => parse(full.take(i)))
  }

  test("charset-aware decode: cp1252 table, label mapping, prescan, strictness") {
    def dec(b: Array[Byte], cs: String): String = {
      val u = HttpText.decode(b, cs)
      if (u == null) null else u.toString
    }
    // WHATWG cp1252 high table incl. the euro and smart quotes
    val raw = Array[Byte](0x80.toByte, 0x93.toByte, 0x94.toByte,
      0x96.toByte, 0xE9.toByte)
    assert(dec(raw, "windows-1252") === "€“”–é")
    // the five undefined cp1252 bytes map to C1 controls, never error
    val holes = Array[Byte](0x81.toByte, 0x8D.toByte, 0x8F.toByte,
      0x90.toByte, 0x9D.toByte)
    assert(dec(holes, "cp1252") === "\u0081\u008d\u008f\u0090\u009d")
    // the WHATWG label law: iso-8859-1 / latin1 / us-ascii ARE cp1252
    for (label <- Seq("iso-8859-1", "ISO8859-1", "latin1", "us-ascii", "ascii"))
      assert(dec(raw, label) === "€“”–é", label)
    // honest utf-8, and strictness: cp1252 bytes under a utf-8 label
    // DECLINE (mojibake-never), they are never U+FFFD-garbled
    assert(dec("Café €".getBytes("UTF-8"), "utf-8") === "Café €")
    assert(dec(raw, "utf-8") == null)
    assert(dec(raw, "UTF8") == null)
    // unknown labels decline, never guess (iso-8859-16 is a real
    // WHATWG label, just outside this tier's registry — no faithful
    // index offline)
    assert(dec("abc".getBytes, "iso-8859-16") == null)
    assert(dec("abc".getBytes, "klingon-8") == null)
    // meta prescan when no charset is declared (null label)
    val metaPage = ("<html><head><meta charset=\"windows-1252\"></head>" +
      "<body>\u0080ok</body></html>").getBytes("ISO-8859-1")
    assert(dec(metaPage, null) === metaPage.map(b => b & 0xFF).map(u =>
      if (u == 0x80) '€' else u.toChar).mkString)
    // http-equiv form
    val equivPage = ("<html><head><meta http-equiv=\"Content-Type\" " +
      "content=\"text/html; charset=iso-8859-1\"></head><body>\u0093q\u0094</body>")
      .getBytes("ISO-8859-1")
    assert(dec(equivPage, null).contains("“q”"))
    // no declaration anywhere: UTF-8 default, still strict
    assert(dec("plain ascii".getBytes, null) === "plain ascii")
    assert(dec(raw, null) == null)
    // the declared param BEATS a conflicting meta (priority order)
    val lying = ("<html><head><meta charset=\"utf-8\"></head>" +
      "<body>\u0080</body></html>").getBytes("ISO-8859-1")
    assert(dec(lying, "windows-1252").contains("€"))
  }

  test("multi-byte legacy charsets: JDK-decoder round trips per WHATWG label") {
    def dec(b: Array[Byte], cs: String): String = {
      val u = HttpText.decode(b, cs)
      if (u == null) null else u.toString
    }
    val jp = "こんにちは世界 テスト id=7"
    val zhS = "你好世界 测试"
    val zhT = "你好世界 測試"
    val ko = "안녕하세요 세계"
    // each canonical encoding round-trips REAL multi-byte bytes, and
    // every WHATWG label for it decodes identically
    for (l <- Seq("shift_jis", "Shift-JIS", "sjis", "x-sjis", "ms_kanji",
        "windows-31j", "csshiftjis"))
      assert(dec(jp.getBytes("windows-31j"), l) === jp, l)
    for (l <- Seq("euc-jp", "x-euc-jp", "cseucpkdfmtjapanese"))
      assert(dec(jp.getBytes("EUC-JP"), l) === jp, l)
    for (l <- Seq("gbk", "gb2312", "GB_2312-80", "chinese", "csgb2312",
        "iso-ir-58", "x-gbk"))
      assert(dec(zhS.getBytes("GBK"), l) === zhS, l)
    for (l <- Seq("big5", "big5-hkscs", "cn-big5", "csbig5", "x-x-big5"))
      assert(dec(zhT.getBytes("Big5"), l) === zhT, l)
    for (l <- Seq("euc-kr", "korean", "ks_c_5601-1987", "ksc5601",
        "windows-949", "iso-ir-149"))
      assert(dec(ko.getBytes("x-windows-949"), l) === ko, l)
    // shift_jis is the WHATWG index = Windows-31J: the CP932 NEC/IBM
    // extensions decode (plain JIS X 0208 would reject them)
    val cp932ext = "①㈱髙"
    assert(dec(cp932ext.getBytes("windows-31j"), "shift_jis") === cp932ext)
    // euc-kr is the WHATWG index = windows-949: a syllable OUTSIDE
    // KS X 1001's precomposed set still decodes
    val ks949 = "뷁"
    assert(dec(ks949.getBytes("x-windows-949"), "euc-kr") === ks949)
  }

  test("multi-byte mojibake-never: malformed or cross-charset bytes DECLINE per charset") {
    def dec(b: Array[Byte], cs: String): String = {
      val u = HttpText.decode(b, cs)
      if (u == null) null else u.toString
    }
    val jpSjis = "こんにちは世界".getBytes("windows-31j")
    val jpEuc = "こんにちは世界".getBytes("EUC-JP")
    val koBytes = "안녕하세요".getBytes("x-windows-949")
    // a truncated final multi-byte sequence declines, never U+FFFD
    for ((bytes, label) <- Seq(
        (jpSjis, "shift_jis"), (jpEuc, "euc-jp"),
        ("你好世界".getBytes("GBK"), "gbk"),
        ("你好世界".getBytes("Big5"), "big5"), (koBytes, "euc-kr")))
      assert(dec(bytes.dropRight(1), label) == null, s"truncated $label")
    // a dangling lead byte followed by an invalid trail declines
    for (label <- Seq("shift_jis", "euc-jp", "gbk", "big5", "euc-kr")) {
      val bad = "ok".getBytes("US-ASCII") ++
        Array(0xE3.toByte, 0x0A.toByte) ++ "tail".getBytes("US-ASCII")
      assert(dec(bad, label) == null, s"dangling lead $label")
    }
    // cross-charset garbling never serves the ORIGINAL text as if
    // decoded right: EUC-JP bytes under a shift_jis label either
    // decline or decode to something visibly different
    val cross = dec(jpEuc, "shift_jis")
    assert(cross == null || cross != "こんにちは世界")
  }

  test("UTF-16: BOM sniffing outranks the label; strict decode; labels map") {
    def dec(b: Array[Byte], cs: String): String = {
      val u = HttpText.decode(b, cs)
      if (u == null) null else u.toString
    }
    val text = "Café – € 𝄞 done" // incl. an astral pair
    val le = text.getBytes("UTF-16LE")
    val be = text.getBytes("UTF-16BE")
    val bomLE = Array(0xFF.toByte, 0xFE.toByte) ++ le
    val bomBE = Array(0xFE.toByte, 0xFF.toByte) ++ be
    // a BOM picks the encoding WHATEVER the header label says — the
    // lying charset=utf-8 header must not turn the page into a decline
    assert(dec(bomLE, "utf-8") === text)
    assert(dec(bomBE, "utf-8") === text)
    // and a BOM beats even the OPPOSITE utf-16 label
    assert(dec(bomLE, "utf-16be") === text)
    // the UTF-8 BOM is consumed, not served as U+FEFF
    assert(dec(Array(0xEF.toByte, 0xBB.toByte, 0xBF.toByte) ++
      "abc".getBytes("UTF-8"), null) === "abc")
    // BOM-less labeled decode: the WHATWG label pile
    assert(dec(le, "utf-16le") === text)
    assert(dec(be, "utf-16be") === text)
    assert(dec(le, "utf-16") === text) // bare utf-16 IS utf-16le
    assert(dec(le, "unicode") === text)
    assert(dec(be, "unicodefffe") === text)
    // mojibake-never: odd length and lone surrogates decline
    assert(dec(le.dropRight(1), "utf-16le") === null)
    assert(dec("x".getBytes("UTF-16LE") ++ Array(0x34.toByte, 0xD8.toByte),
      "utf-16le") === null) // lone high surrogate
    assert(dec(Array(0x1E.toByte, 0xDD.toByte), "utf-16le") === null) // lone low
  }

  test("single-byte family: hand-pinned WHATWG index witnesses per encoding") {
    def dec(b: Array[Byte], cs: String): String = {
      val u = HttpText.decode(b, cs)
      if (u == null) null else u.toString
    }
    def one(byte: Int, cs: String): String = dec(Array(byte.toByte), cs)
    // witnesses drawn from the published WHATWG index files — these
    // pin the JDK-built tables to the registry, independent of the
    // encoder twin
    assert(one(0x8A, "windows-1250") === "Š")
    assert(one(0xA5, "windows-1250") === "Ą")
    assert(one(0x80, "windows-1251") === "Ђ")
    assert(one(0xA8, "windows-1251") === "Ё")
    assert(one(0xC0, "windows-1251") === "А")
    assert(one(0xFF, "windows-1251") === "я")
    assert(one(0xC1, "windows-1253") === "Α")
    assert(one(0xD0, "windows-1254") === "Ğ")
    assert(one(0xDD, "windows-1254") === "İ")
    assert(one(0xA4, "windows-1255") === "₪")
    assert(one(0xE0, "windows-1255") === "א")
    // the index ADDS U+05BA over the vendor page at 0xCA
    assert(one(0xCA, "windows-1255") === "\u05BA")
    assert(one(0xC1, "windows-1256") === "ء")
    assert(one(0xC0, "windows-1257") === "Ą")
    // cp1258's combining diacritics
    assert(one(0xCC, "windows-1258") === "\u0300")
    assert(one(0xA1, "iso-8859-2") === "Ą")
    assert(one(0xB0, "iso-8859-5") === "А")
    assert(one(0xF0, "iso-8859-5") === "№")
    assert(one(0xC1, "iso-8859-6") === "ء")
    // iso-8859-7 carries the 2003 revision: euro and drachma
    assert(one(0xA4, "iso-8859-7") === "€")
    assert(one(0xA5, "iso-8859-7") === "₯")
    assert(one(0xC1, "iso-8859-7") === "Α")
    assert(one(0xE0, "iso-8859-8") === "א")
    assert(one(0xA8, "iso-8859-13") === "Ø")
    assert(one(0xA4, "iso-8859-15") === "€")
    assert(one(0xBC, "iso-8859-15") === "Œ")
    assert(one(0xA3, "koi8-r") === "ё")
    assert(one(0xC1, "koi8-r") === "а")
    assert(one(0xE1, "koi8-r") === "А")
    assert(one(0xA4, "koi8-u") === "є")
    assert(one(0xA7, "koi8-u") === "ї")
    assert(one(0xAD, "koi8-u") === "ґ")
    // the WHATWG koi8-u index is the KOI8-RU variant: Belarusian ў/Ў
    // at 0xAE/0xBE (the JDK's RFC-2319 table has box-drawing there)
    assert(one(0xAE, "koi8-u") === "ў")
    assert(one(0xBE, "koi8-u") === "Ў")
    assert(one(0x80, "ibm866") === "А")
    assert(one(0xF1, "ibm866") === "ё")
    // macintosh 0xBD is GREEK CAPITAL OMEGA in the index, not the
    // MacRoman OHM SIGN
    assert(one(0xBD, "macintosh") === "Ω")
    assert(one(0x8E, "macintosh") === "é")
    // windows-874: Thai + the cp1252-style layout
    assert(one(0x80, "windows-874") === "€")
    assert(one(0xA1, "windows-874") === "ก")
    // the label piles resolve (iso-8859-9 IS windows-1254; tis-620 IS
    // windows-874; -8-i shares -8's index)
    assert(one(0xD0, "iso-8859-9") === "Ğ")
    assert(one(0xD0, "latin5") === "Ğ")
    assert(one(0xA1, "tis-620") === "ก")
    assert(one(0xE0, "iso-8859-8-i") === "א")
    assert(one(0xC1, "greek") === "Α")
    assert(one(0xC0, "cp1251") === "А")
    // undefined index positions DECLINE (the WHATWG decode error):
    // 1253's three holes, 1257's two, 874's high holes, and the
    // windows-125x C1 positions map to controls (never errors)
    assert(one(0xAA, "windows-1253") === null)
    assert(one(0xD2, "windows-1253") === null)
    assert(one(0xFF, "windows-1253") === null)
    assert(one(0xA1, "windows-1257") === null)
    assert(one(0xA5, "windows-1257") === null)
    assert(one(0xDB, "windows-874") === null)
    assert(one(0xFF, "windows-874") === null)
    assert(one(0x81, "windows-1250") === "\u0081")
    assert(one(0x98, "windows-1251") === "\u0098")
    // x-mac-cyrillic: the Mac OS 9.0 index (€ at 0xFF over the older
    // currency sign)
    assert(one(0x80, "x-mac-cyrillic") === "А")
    assert(one(0xDF, "x-mac-cyrillic") === "я")
    assert(one(0xFF, "x-mac-cyrillic") === "€")
    // the 9.0 revision also planted Ґ/ґ where the pre-9.0 table (and
    // the JDK) has ¢ and the partial-differential sign
    assert(one(0xA2, "x-mac-cyrillic") === "Ґ")
    assert(one(0xB6, "x-mac-cyrillic") === "ґ")
    // META-declared x-user-defined is windows-1252 per the HTML
    // prescan (the ramp applies only to the transport-layer label)
    assert(dec(("<html><head><meta charset=\"x-user-defined\"></head>" +
      "<body>Café</body></html>").getBytes("ISO-8859-1"), null) ===
      "<html><head><meta charset=\"x-user-defined\"></head><body>Café</body></html>")
    // x-user-defined: ASCII + the standard's own private-use ramp
    assert(one(0x80, "x-user-defined") === "\uF780")
    assert(one(0xFF, "x-user-defined") === "\uF7FF")
    assert(dec("plain".getBytes("US-ASCII"), "x-user-defined") === "plain")
    // iso-8859-10/-14/-16: the recorded envelope
    assert(dec("abc".getBytes("US-ASCII"), "iso-8859-10") === null)
    assert(dec("abc".getBytes("US-ASCII"), "iso-8859-14") === null)
    // encoder-twin round trips across scripts (the fixture's own path)
    for ((text, cs) <- Seq(
      ("Привет «мир» №", "windows-1251"),
      ("Γειά σου € κόσμε", "iso-8859-7"),
      ("Привет ё мир", "koi8-r"),
      ("مرحبا بالعالم", "windows-1256"),
      ("Žluťoučký kůň", "iso-8859-2"),
      ("สวัสดี", "windows-874"))) {
      val b = HttpText.singleByteEncode(text, cs)
      assert(b != null, s"$cs fixture text must be representable")
      assert(dec(b, cs) === text, cs)
    }
  }
}
