package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.plans.{ZipEncode, ZipEntries}

/** ZIP central-directory triage (plans.ZipEntries): EOCD-located,
  * directory-walked — against archives written by the JDK's own
  * ZipOutputStream (the reference implementation as fixture writer).
  * Pins: entry census across methods and comment tails, the
  * comment-consistency EOCD rule (PK\5\6 bytes inside a comment must
  * not be taken for the record), ZIP64/multi-disk declines, and the
  * truncation law. */
class ZipSpec extends AnyFunSuite {

  private def rows(b: Array[Byte]): Seq[(String, Int, Long)] = {
    val arr = ZipEntries.parse(b)
    if (arr == null) null
    else (0 until arr.numElements()).map { i =>
      val r = arr.getStruct(i, 3)
      (r.getUTF8String(0).toString, r.getInt(1), r.getLong(2))
    }
  }

  test("JDK-written archives census exactly, with and without comments") {
    for (seed <- Seq(1L, 7L, 999L); n <- Seq(1, 3, 6); comment <- Seq(false, true)) {
      val got = rows(ZipEncode.encode(seed, n, comment))
      assert(got != null, s"seed=$seed n=$n comment=$comment")
      val expected = (0 until n).map(i =>
        (s"e$i.txt", if (i % 2 == 0) 0 else 8, ((seed + i) % 100 + 10)))
      assert(got === expected)
    }
  }

  test("EOCD comment-consistency: PK\\5\\6 bytes inside a comment do not fool the scan") {
    // a comment that CONTAINS the EOCD magic: the embedded bytes fail
    // the comment-length-reaches-end rule, the real record wins
    val bos = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bos)
    z.setComment("decoy PK\u0005\u0006 inside")
    val e = new java.util.zip.ZipEntry("a.txt")
    z.putNextEntry(e); z.write("hi".getBytes); z.closeEntry(); z.close()
    val got = rows(bos.toByteArray)
    assert(got === Seq(("a.txt", 8, 2L)))
  }

  test("ZIP64: a JDK-written 65600-entry archive serves census and extraction") {
    // 65535+ entries force the JDK writer onto the EOCD64 locator +
    // record path (count sentinel in the classic EOCD) — the writer
    // is the reference implementation, parsing it back is the
    // differential
    val bos = new java.io.ByteArrayOutputStream(1 << 23)
    val z = new java.util.zip.ZipOutputStream(bos)
    val n = 65600
    var i = 0
    while (i < n) {
      z.putNextEntry(new java.util.zip.ZipEntry(s"e$i"))
      if (i % 1000 == 0) z.write(s"payload$i".getBytes("UTF-8"))
      z.closeEntry()
      i += 1
    }
    z.close()
    val zip = bos.toByteArray
    val arr = ZipEntries.parse(zip)
    assert(arr != null, "ZIP64 census declined")
    assert(arr.numElements() === n)
    val first = arr.getStruct(0, 3)
    assert(first.getUTF8String(0).toString === "e0")
    assert(first.getLong(2) === 8L) // "payload0"
    val last = arr.getStruct(n - 1, 3)
    assert(last.getUTF8String(0).toString === s"e${n - 1}")
    // extraction through the same ZIP64 directory
    import graft.plans.ZipExtract
    assert(new String(ZipExtract.extract(zip, "e0"), "UTF-8") === "payload0")
    assert(new String(ZipExtract.extract(zip, "e64000"), "UTF-8") === "payload64000")
    assert(ZipExtract.extract(zip, s"e${n - 1}").length === 0)
    // truncation law (sampled — the archive is megabytes)
    var cut = 1
    while (cut < zip.length) {
      ZipEntries.parse(java.util.Arrays.copyOf(zip, cut))
      cut += 8191
    }
  }

  test("ZIP64: per-entry 0xFFFFFFFF sentinels resolve through the 0x0001 extra") {
    // handcraft: one STORED entry whose central usize/csize/lho are
    // ALL sentinels, the real values riding the extended-information
    // extra — the indirection itself is what's under test
    val data = "hi".getBytes("UTF-8")
    val crc = { val c = new java.util.zip.CRC32(); c.update(data); c.getValue }
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    def w32(v: Long): Unit = { w16((v & 0xFFFF).toInt); w16(((v >> 16) & 0xFFFF).toInt) }
    def w64(v: Long): Unit = { w32(v & 0xFFFFFFFFL); w32((v >> 32) & 0xFFFFFFFFL) }
    val name = "a.txt".getBytes("UTF-8")
    // local header at offset 0
    out.write(Array[Byte]('P', 'K', 3, 4)); w16(45); w16(0); w16(0)
    w16(0); w16(0); w32(crc); w32(data.length); w32(data.length)
    w16(name.length); w16(0); out.write(name); out.write(data)
    val cdOff = out.size()
    out.write(Array[Byte]('P', 'K', 1, 2)); w16(45); w16(45); w16(0); w16(0)
    w16(0); w16(0); w32(crc)
    w32(0xFFFFFFFFL); w32(0xFFFFFFFFL) // csize, usize: sentinels
    w16(name.length); w16(4 + 24); w16(0) // name, extra, comment
    w16(0); w16(0); w32(0) // disk, int/ext attrs
    w32(0xFFFFFFFFL) // lho: sentinel
    out.write(name)
    w16(0x0001); w16(24); w64(data.length); w64(data.length); w64(0) // the extra
    val cdSize = out.size() - cdOff
    out.write(Array[Byte]('P', 'K', 5, 6)); w16(0); w16(0); w16(1); w16(1)
    w32(cdSize); w32(cdOff); w16(0)
    val zip = out.toByteArray
    assert(rows(zip) === Seq(("a.txt", 0, 2L)))
    import graft.plans.ZipExtract
    assert(new String(ZipExtract.extract(zip, "a.txt"), "UTF-8") === "hi")
    // the same entry WITHOUT the extra is a sentinel with no
    // replacement: decline, never a 4 GiB guess. The extra's id sits
    // right after the 46-byte fixed record + 5-byte name.
    val noExtra = zip.clone()
    noExtra(cdOff + 46 + name.length) = 2 // id 0x0001 -> 0x0002
    assert(ZipEntries.parse(noExtra) === null)
  }

  test("declines: multi-disk, ZIP64 sentinels, lying directory, truncation law") {
    def dies(b: Array[Byte]): Unit = assert(ZipEntries.parse(b) == null)
    val good = ZipEncode.encode(5L, 3, false)
    // locate the EOCD (no comment → last 22 bytes)
    val eocd = good.length - 22
    assert(good(eocd) == 'P' && good(eocd + 1) == 'K')
    // multi-disk: nonzero disk number
    val disk = good.clone(); disk(eocd + 4) = 1; dies(disk)
    // ZIP64 sentinel entry count
    val z64 = good.clone(); z64(eocd + 10) = 0xFF.toByte; z64(eocd + 11) = 0xFF.toByte
    dies(z64)
    // lying central-directory offset
    val lie = good.clone(); lie(eocd + 16) = (lie(eocd + 16) ^ 0x01).toByte; dies(lie)
    // count disagreeing with the walked directory size
    val cnt = good.clone(); cnt(eocd + 10) = (cnt(eocd + 10) + 1).toByte
    cnt(eocd + 8) = cnt(eocd + 10); dies(cnt)
    // truncation law
    (0 until good.length).foreach(i => ZipEntries.parse(good.take(i)))
  }
}

/** ZIP entry extraction + the docx hop (plans.ZipExtract/DocxText):
  * JDK-written archives as the reference differential, the CRC/size
  * serve gates, and the WordprocessingML tag-scan contract. */
class ZipExtractSpec extends AnyFunSuite {

  import graft.plans.{ZipExtract, DocxText, DocxEncode}

  test("every census entry round-trips byte-exact, STORED and DEFLATED") {
    for (seed <- Seq(1L, 7L, 999L); n <- Seq(1, 3, 6); comment <- Seq(false, true)) {
      val zip = ZipEncode.encode(seed, n, comment)
      (0 until n).foreach { i =>
        val got = ZipExtract.extract(zip, s"e$i.txt")
        assert(got != null, s"seed=$seed entry=$i")
        assert(java.util.Arrays.equals(got, ZipEncode.payload(seed, i)),
          s"seed=$seed entry=$i bytes")
      }
      assert(ZipExtract.extract(zip, "missing.txt") === null)
    }
  }

  test("a corrupted payload declines at the CRC gate, never serves wrong bytes") {
    val zip = ZipEncode.encode(5L, 2, false)
    // locate e0.txt's STORED payload (right after its local header)
    val name = "e0.txt".getBytes("UTF-8")
    var lho = -1
    var i = 0
    while (lho < 0 && i < zip.length - 4) {
      if (zip(i) == 'P' && zip(i + 1) == 'K' && zip(i + 2) == 3 && zip(i + 3) == 4)
        lho = i
      i += 1
    }
    val nameLen = (zip(lho + 26) & 0xFF) | ((zip(lho + 27) & 0xFF) << 8)
    val extraLen = (zip(lho + 28) & 0xFF) | ((zip(lho + 29) & 0xFF) << 8)
    assert(nameLen === name.length)
    val dataAt = lho + 30 + nameLen + extraLen
    val m = zip.clone()
    m(dataAt) = (m(dataAt) ^ 0x55).toByte
    assert(ZipExtract.extract(m, "e0.txt") === null)
  }

  test("a lying uncompressed size in the directory declines") {
    val zip = ZipEncode.encode(9L, 1, false)
    // the central directory's usize field sits at cd+24; find PK\1\2
    var cd = -1
    var i = 0
    while (cd < 0 && i < zip.length - 4) {
      if (zip(i) == 'P' && zip(i + 1) == 'K' && zip(i + 2) == 1 && zip(i + 3) == 2)
        cd = i
      i += 1
    }
    val m = zip.clone()
    m(cd + 24) = (m(cd + 24) + 1).toByte
    assert(ZipExtract.extract(m, "e0.txt") === null)
  }

  test("docx round trip: paragraphs decode to the decodedPara contract") {
    for (seed <- Seq(0L, 1L, 2L, 3L, 6L, 7L, 41L, 4242L); n <- Seq(1, 2, 4)) {
      val b = DocxEncode.encode(seed, n)
      val got = DocxText.parse(b)
      assert(got != null, s"seed=$seed n=$n")
      val expected = (0 until n).map(DocxEncode.decodedPara(seed, _)).mkString("\n")
      assert(got.toString === expected, s"seed=$seed n=$n")
    }
  }

  test("docx tag-scan details: pPr inertness, empty runs, numeric entities") {
    // handcraft a document.xml and wrap it in a JDK zip
    def wrap(docXml: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val z = new java.util.zip.ZipOutputStream(bos)
      try {
        z.putNextEntry(new java.util.zip.ZipEntry("word/document.xml"))
        z.write(docXml.getBytes("UTF-8"))
        z.closeEntry()
      } finally z.close()
      bos.toByteArray
    }
    val xml = "<w:document xmlns:w=\"http://schemas.openxmlformats.org/wordprocessingml/2006/main\"><w:body>" +
      "<w:p><w:pPr><w:tabs/></w:pPr><w:r><w:t>a&#65;&#x42;</w:t></w:r>" +
      "<w:r><w:t/></w:r><w:r><w:t>b</w:t></w:r></w:p>" +
      "<w:p/>" + // self-closing paragraph: present but empty
      "<w:p><w:r><w:tab/><w:t>c</w:t></w:r></w:p>" +
      "</w:body></w:document>"
    assert(DocxText.parse(wrap(xml)).toString === "aABb\n\n\tc")
    // no document part at all → null
    val bos = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bos)
    z.putNextEntry(new java.util.zip.ZipEntry("other.xml"))
    z.write("x".getBytes); z.closeEntry(); z.close()
    assert(DocxText.parse(bos.toByteArray) === null)
  }

  test("independent witness: docx text invariant under attribute reorder + foreign-prefix rename") {
    // the tag-delimiter scan keys on tag NAMES only — the same
    // document with every attribute list permuted and every NON-w
    // namespace prefix renamed must extract identical text; a doc
    // that binds the WML namespace to a DIFFERENT prefix must
    // DECLINE (the scan would silently extract nothing)
    def wrap(docXml: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val z = new java.util.zip.ZipOutputStream(bos)
      try {
        z.putNextEntry(new java.util.zip.ZipEntry("word/document.xml"))
        z.write(docXml.getBytes("UTF-8"))
        z.closeEntry()
      } finally z.close()
      bos.toByteArray
    }
    val wml = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
    val rel = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
    val a =
      s"""<w:document xmlns:w="$wml" xmlns:r="$rel" r:id="rId1"><w:body>""" +
        """<w:p><w:r w:rsidR="0A" w:rsidDel="0B"><w:t xml:space="preserve">a b</w:t></w:r>""" +
        """<w:r><w:t>c</w:t></w:r></w:p></w:body></w:document>"""
    // attributes permuted, r: renamed to q:, extra whitespace
    val b =
      s"""<w:document r:id="rId1"  xmlns:r="$rel"""".replace("r:id", "q:id")
        .replace("xmlns:r", "xmlns:q") +
        s""" xmlns:w="$wml"><w:body>""" +
        """<w:p><w:r w:rsidDel="0B" w:rsidR="0A"><w:t xml:space="preserve">a b</w:t></w:r>""" +
        """<w:r><w:t>c</w:t></w:r></w:p></w:body></w:document>"""
    val ta = DocxText.parse(wrap(a))
    val tb = DocxText.parse(wrap(b))
    assert(ta != null && ta.toString === "a bc")
    assert(tb != null && tb.toString === ta.toString,
      "attribute order / foreign prefix must be invisible")
    // the WML namespace bound to x: instead of w: — never silently ""
    val renamed = a.replace("<w:", "<x:").replace("</w:", "</x:")
      .replace("xmlns:w=", "xmlns:x=").replace(" w:rsid", " x:rsid")
    assert(DocxText.parse(wrap(renamed)) === null,
      "a renamed WML prefix must decline, not extract nothing")
    // no namespace binding at all declines too
    val unbound = a.replace(s""" xmlns:w="$wml"""", "")
    assert(DocxText.parse(wrap(unbound)) === null)
  }

  test("over-cap documents DECLINE instead of truncating silently") {
    // the robots posture, applied to the office scanners: a document
    // past the paragraph/slide/spine caps must NULL, never serve a
    // prefix that reads as complete extraction
    def zipOf(parts: (String, String)*): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val z = new java.util.zip.ZipOutputStream(bos)
      try parts.foreach { case (n, body) =>
        z.putNextEntry(new java.util.zip.ZipEntry(n))
        z.write(body.getBytes("UTF-8")); z.closeEntry()
      } finally z.close()
      bos.toByteArray
    }
    // docx: 8193 paragraphs (one past the cap)
    val manyParas = new StringBuilder("<w:document xmlns:w=\"http://schemas.openxmlformats.org/wordprocessingml/2006/main\"><w:body>")
    (0 until 8193).foreach(_ => manyParas.append("<w:p><w:r><w:t>x</w:t></w:r></w:p>"))
    manyParas.append("</w:body></w:document>")
    assert(DocxText.parse(zipOf("word/document.xml" -> manyParas.toString)) === null)
    // exactly AT the cap is fine
    val atCap = new StringBuilder("<w:document xmlns:w=\"http://schemas.openxmlformats.org/wordprocessingml/2006/main\"><w:body>")
    (0 until 8192).foreach(_ => atCap.append("<w:p><w:r><w:t>x</w:t></w:r></w:p>"))
    atCap.append("</w:body></w:document>")
    assert(DocxText.parse(zipOf("word/document.xml" -> atCap.toString)) != null)
    // pptx: 257 slide parts (one past the 256 cap)
    import graft.plans.PptxSlides
    val slides257 = (1 to 257).map(i =>
      s"ppt/slides/slide$i.xml" -> "<p:sld><a:p><a:r><a:t>s</a:t></a:r></a:p></p:sld>")
    assert(PptxSlides.parse(zipOf(slides257: _*)) === null)
    // epub: 65 spine itemrefs (one past the 64 cap)
    import graft.plans.EpubChapters
    val items = (1 to 65).map(i =>
      s"""<item id="c$i" href="c$i.xhtml" media-type="application/xhtml+xml"/>""").mkString
    val refs = (1 to 65).map(i => s"""<itemref idref="c$i"/>""").mkString
    val chapters = (1 to 65).map(i => s"OEBPS/c$i.xhtml" -> "<html>x</html>")
    val epubParts = Seq(
      "META-INF/container.xml" ->
        "<container><rootfiles><rootfile full-path=\"OEBPS/content.opf\"/></rootfiles></container>",
      "OEBPS/content.opf" ->
        s"<package><manifest>$items</manifest><spine>$refs</spine></package>") ++ chapters
    assert(EpubChapters.parse(zipOf(epubParts: _*)) === null)
  }

  test("numeric character references in the surrogate range never emit a lone surrogate") {
    def wrap(docXml: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val z = new java.util.zip.ZipOutputStream(bos)
      try {
        z.putNextEntry(new java.util.zip.ZipEntry("word/document.xml"))
        z.write(docXml.getBytes("UTF-8"))
        z.closeEntry()
      } finally z.close()
      bos.toByteArray
    }
    def para(t: String) =
      s"<w:document xmlns:w=\"http://schemas.openxmlformats.org/wordprocessingml/2006/main\"><w:body><w:p><w:r><w:t>$t</w:t></w:r></w:p></w:body></w:document>"
    // &#xD800; / &#57343; are surrogate code points: Character.toChars
    // would emit a lone surrogate char (malformed UTF-16) — they must
    // ride through as unknown entities instead
    assert(DocxText.parse(wrap(para("x&#xD800;y"))).toString === "x&#xD800;y")
    assert(DocxText.parse(wrap(para("x&#57343;y"))).toString === "x&#57343;y")
    // a valid astral code point still decodes via a surrogate PAIR
    assert(DocxText.parse(wrap(para("x&#x1F600;y"))).toString ===
      "x" + new String(Character.toChars(0x1F600)) + "y")
  }

  test("truncations never throw (extract + docx)") {
    val zip = ZipEncode.encode(17L, 4, true)
    val docx = DocxEncode.encode(17L, 3)
    var cut = 1
    while (cut < zip.length) {
      ZipExtract.extract(java.util.Arrays.copyOf(zip, cut), "e1.txt")
      cut += 5
    }
    cut = 1
    while (cut < docx.length) {
      DocxText.parse(java.util.Arrays.copyOf(docx, cut))
      cut += 5
    }
  }
}

/** xlsx cell extraction (plans.XlsxCells): the shared-string index
  * hop, rich-text runs, inline strings, numeric passthrough, the
  * skip-vs-decline boundary, and the JDK-writer differential. */
class XlsxSpec extends AnyFunSuite {

  import graft.plans.{XlsxCells, XlsxEncode}

  private def cells(b: Array[Byte]): Seq[(String, String)] = {
    val arr = XlsxCells.parse(b)
    if (arr == null) null
    else (0 until arr.numElements()).map { i =>
      val r = arr.getStruct(i, 2)
      (r.getUTF8String(0).toString, r.getUTF8String(1).toString)
    }
  }

  test("fixture round trip: cells equal the decodedCells contract") {
    for (seed <- Seq(0L, 1L, 2L, 3L, 5L, 6L, 17L, 4242L); n <- Seq(1, 2, 3, 4)) {
      val got = cells(XlsxEncode.encode(seed, n))
      assert(got != null, s"seed=$seed n=$n")
      assert(got === XlsxEncode.decodedCells(seed, n), s"seed=$seed n=$n")
    }
  }

  private def wrap(parts: (String, String)*): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bos)
    try parts.foreach { case (n, body) =>
      z.putNextEntry(new java.util.zip.ZipEntry(n))
      z.write(body.getBytes("UTF-8"))
      z.closeEntry()
    } finally z.close()
    bos.toByteArray
  }

  test("skip vs decline: empty cells skip, bad indices and types decline") {
    val sst = "<sst><si><t>only</t></si></sst>"
    def sheet(cellsXml: String) =
      s"<worksheet><sheetData><row r=\"1\">$cellsXml</row></sheetData></worksheet>"
    def doc(cellsXml: String) = wrap(
      "xl/sharedStrings.xml" -> sst,
      "xl/worksheets/sheet1.xml" -> sheet(cellsXml))
    // value-less and self-closing cells skip; good index resolves
    assert(cells(doc("<c r=\"A1\" t=\"s\"><v>0</v></c><c r=\"B1\" s=\"2\"/>" +
      "<c r=\"C1\" t=\"s\"></c>")) === Seq("A1" -> "only"))
    // an out-of-range shared index is corruption: the DOC declines
    assert(cells(doc("<c r=\"A1\" t=\"s\"><v>7</v></c>")) === null)
    // an unsupported cell type declines (error cells, booleans)
    assert(cells(doc("<c r=\"A1\" t=\"e\"><v>#DIV/0!</v></c>")) === null)
    // a formula-string cell decodes its entities
    assert(cells(doc("<c r=\"A1\" t=\"str\"><v>a &amp; b</v></c>"))
      === Seq("A1" -> "a & b"))
    // no sheet part at all -> null; a sheet with no shared table but
    // only numeric cells is fine
    assert(cells(wrap("other.xml" -> "x")) === null)
    assert(cells(wrap("xl/worksheets/sheet1.xml" ->
      sheet("<c r=\"A1\"><v>42</v></c>"))) === Seq("A1" -> "42"))
  }

  test("independent witness: cell text invariant under sharedStrings permutation") {
    // the INDEX hop witnessed from a second direction: permuting the
    // shared-string TABLE while rewriting the cells' <v> indices to
    // match must serve identical (ref, value) rows — a scanner that
    // read entries positionally-by-cell or ignored the index could
    // not satisfy both layouts
    val sheetFor = (ia: Int, ib: Int, ic: Int) =>
      "<worksheet><sheetData><row r=\"1\">" +
        s"""<c r="A1" t="s"><v>$ia</v></c>""" +
        s"""<c r="B1" t="s"><v>$ib</v></c>""" +
        s"""<c r="C1" t="s"><v>$ic</v></c>""" +
        "</row></sheetData></worksheet>"
    val sstFor = (order: Seq[String]) =>
      "<sst>" + order.map(s => s"<si><t>$s</t></si>").mkString + "</sst>"
    val strings = Seq("alpha", "beta", "gamma")
    // identity layout: table [alpha beta gamma], cells 0,1,2
    val idOrder = cells(wrap(
      "xl/sharedStrings.xml" -> sstFor(strings),
      "xl/worksheets/sheet1.xml" -> sheetFor(0, 1, 2)))
    assert(idOrder === Seq("A1" -> "alpha", "B1" -> "beta", "C1" -> "gamma"))
    // every permutation of the TABLE, indices rewritten to match
    for (perm <- strings.permutations) {
      val idx = strings.map(perm.indexOf)
      val got = cells(wrap(
        "xl/sharedStrings.xml" -> sstFor(perm.toSeq),
        "xl/worksheets/sheet1.xml" -> sheetFor(idx(0), idx(1), idx(2))))
      assert(got === idOrder, s"permutation $perm must be invisible")
    }
  }

  test("rPh phonetic blocks are display metadata, not cell text") {
    // East-Asian workbooks carry furigana readings in <rPh> blocks
    // inside <si>: their <t> runs must not be appended to the value
    val sst = "<sst><si><t>kanji</t>" +
      "<rPh sb=\"0\" eb=\"2\"><t>READING</t></rPh>" +
      "<phoneticPr fontId=\"1\" type=\"noConversion\"/></si></sst>"
    val sheet = "<worksheet><sheetData><row r=\"1\">" +
      "<c r=\"A1\" t=\"s\"><v>0</v></c></row></sheetData></worksheet>"
    assert(cells(wrap(
      "xl/sharedStrings.xml" -> sst,
      "xl/worksheets/sheet1.xml" -> sheet)) === Seq("A1" -> "kanji"))
    // rich-text runs around a phonetic block: both kept, reading dropped
    val sst2 = "<sst><si><r><t>a</t></r>" +
      "<rPh sb=\"0\" eb=\"1\"><t>x</t></rPh><r><t>b</t></r></si></sst>"
    assert(cells(wrap(
      "xl/sharedStrings.xml" -> sst2,
      "xl/worksheets/sheet1.xml" -> sheet)) === Seq("A1" -> "ab"))
  }

  test("a non-run '<t…' tag is stepped past, not an early return") {
    // a tag whose name merely starts with 't' must not truncate the
    // run scan: runs after it are still served
    val sst = "<sst><si><t>a</t><ts/><t>b</t></si></sst>"
    val sheet = "<worksheet><sheetData><row r=\"1\">" +
      "<c r=\"A1\" t=\"s\"><v>0</v></c></row></sheetData></worksheet>"
    assert(cells(wrap(
      "xl/sharedStrings.xml" -> sst,
      "xl/worksheets/sheet1.xml" -> sheet)) === Seq("A1" -> "ab"))
  }

  test("truncations never throw (xlsx)") {
    val b = XlsxEncode.encode(23L, 4)
    var cut = 1
    while (cut < b.length) {
      XlsxCells.parse(java.util.Arrays.copyOf(b, cut))
      cut += 7
    }
  }
}

/** pptx slide extraction + EPUB chapter extraction: the remaining
  * ZIP-of-XML family members — JDK-written fixtures, order contracts
  * (slide numbering, spine-over-manifest), and decline envelopes. */
class PptxEpubSpec extends AnyFunSuite {

  import graft.plans.{PptxSlides, PptxEncode, EpubChapters, EpubEncode}

  private def arr(g: org.apache.spark.sql.catalyst.util.GenericArrayData): Seq[String] =
    if (g == null) null
    else (0 until g.numElements()).map(i => g.getUTF8String(i).toString)

  test("pptx round trip: slides decode to the decodedSlide contract, in order") {
    for (seed <- Seq(0L, 1L, 2L, 3L, 7L, 12L, 4242L); n <- Seq(1, 2, 3)) {
      val got = arr(PptxSlides.parse(PptxEncode.encode(seed, n)))
      assert(got != null, s"seed=$seed n=$n")
      assert(got === (1 to n).map(PptxEncode.decodedSlide(seed, _)), s"seed=$seed n=$n")
    }
  }

  test("epub round trip: chapters come out in SPINE order despite the reversed manifest") {
    for (seed <- Seq(0L, 1L, 2L, 3L, 7L, 12L, 4242L); n <- Seq(1, 2, 3)) {
      val got = arr(EpubChapters.parse(EpubEncode.encode(seed, n)))
      assert(got != null, s"seed=$seed n=$n")
      assert(got === (1 to n).map(EpubEncode.decodedChapter(seed, _)), s"seed=$seed n=$n")
    }
  }

  private def wrap(parts: (String, String)*): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bos)
    try parts.foreach { case (n, body) =>
      z.putNextEntry(new java.util.zip.ZipEntry(n))
      z.write(body.getBytes("UTF-8"))
      z.closeEntry()
    } finally z.close()
    bos.toByteArray
  }

  test("epub declines: dangling idref, non-xhtml spine item, climbing href, no spine") {
    val container = "<container><rootfiles>" +
      "<rootfile full-path=\"OEBPS/content.opf\"/></rootfiles></container>"
    def opf(manifest: String, spine: String) =
      s"<package><manifest>$manifest</manifest><spine>$spine</spine></package>"
    val ch = "<html><body>x</body></html>"
    // dangling idref
    assert(EpubChapters.parse(wrap(
      "META-INF/container.xml" -> container,
      "OEBPS/content.opf" -> opf("", "<itemref idref=\"ghost\"/>"),
      "OEBPS/ch1.xhtml" -> ch)) === null)
    // spine item that is not xhtml (fixed-layout image tier)
    assert(EpubChapters.parse(wrap(
      "META-INF/container.xml" -> container,
      "OEBPS/content.opf" -> opf(
        "<item id=\"c1\" href=\"cover.png\" media-type=\"image/png\"/>",
        "<itemref idref=\"c1\"/>"),
      "OEBPS/cover.png" -> "PNG")) === null)
    // an href climbing out of the OPF directory is never resolved
    assert(EpubChapters.parse(wrap(
      "META-INF/container.xml" -> container,
      "OEBPS/content.opf" -> opf(
        "<item id=\"c1\" href=\"../secret.xhtml\" media-type=\"application/xhtml+xml\"/>",
        "<itemref idref=\"c1\"/>"),
      "secret.xhtml" -> ch)) === null)
    // an empty spine is not a book
    assert(EpubChapters.parse(wrap(
      "META-INF/container.xml" -> container,
      "OEBPS/content.opf" -> opf(
        "<item id=\"c1\" href=\"ch1.xhtml\" media-type=\"application/xhtml+xml\"/>", ""),
      "OEBPS/ch1.xhtml" -> ch)) === null)
    // and the happy path over the same handcrafted parts works
    assert(arr(EpubChapters.parse(wrap(
      "META-INF/container.xml" -> container,
      "OEBPS/content.opf" -> opf(
        "<item id=\"c1\" href=\"ch1.xhtml\" media-type=\"application/xhtml+xml\"/>",
        "<itemref idref=\"c1\"/>"),
      "OEBPS/ch1.xhtml" -> ch))) === Seq("x"))
  }

  test("independent witness: pptx text invariant under attribute reorder; a: rename declines") {
    val dml = "http://schemas.openxmlformats.org/drawingml/2006/main"
    val pml = "http://schemas.openxmlformats.org/presentationml/2006/main"
    val a = s"""<p:sld xmlns:a="$dml" xmlns:p="$pml"><p:cSld>""" +
      """<a:p><a:pPr algn="l" indent="0"/><a:r><a:rPr lang="en" b="1"/>""" +
      """<a:t>hi</a:t></a:r><a:r><a:t> there</a:t></a:r></a:p></p:cSld></p:sld>"""
    val b = s"""<p:sld xmlns:p="$pml" xmlns:a="$dml"><p:cSld>""" +
      """<a:p><a:pPr indent="0" algn="l"/><a:r><a:rPr b="1" lang="en"/>""" +
      """<a:t>hi</a:t></a:r><a:r><a:t> there</a:t></a:r></a:p></p:cSld></p:sld>"""
    val ga = arr(PptxSlides.parse(wrap("ppt/slides/slide1.xml" -> a)))
    val gb = arr(PptxSlides.parse(wrap("ppt/slides/slide1.xml" -> b)))
    assert(ga === Seq("hi there"))
    assert(gb === ga, "attribute order / xmlns order must be invisible")
    // DrawingML bound to a prefix other than a: would silently read
    // as an EMPTY slide — it must decline instead
    val renamed = a.replace("<a:", "<x:").replace("</a:", "</x:")
      .replace("xmlns:a=", "xmlns:x=")
    assert(PptxSlides.parse(wrap("ppt/slides/slide1.xml" -> renamed)) === null)
    // a slide with NO DrawingML binding and no text stays a legal
    // empty slide (the existing empty-slide contract)
    assert(arr(PptxSlides.parse(wrap(
      "ppt/slides/slide1.xml" -> s"""<p:sld xmlns:p="$pml"><p:cSld/></p:sld>""")))
      === Seq(""))
  }

  test("pptx gap-numbered decks DECLINE: the consecutive walk never truncates silently") {
    val body = "<p:sld><a:p><a:r><a:t>s</a:t></a:r></a:p></p:sld>"
    // slide2 deleted without renumbering: slide1 + slide3 remain —
    // serving just slide1 would be a silent truncation
    assert(PptxSlides.parse(wrap(
      "ppt/slides/slide1.xml" -> body,
      "ppt/slides/slide3.xml" -> body)) === null)
    // a deck starting at slide2 (no slide1) declines too
    assert(PptxSlides.parse(wrap(
      "ppt/presentation.xml" -> "<p:presentation/>",
      "ppt/slides/slide2.xml" -> body)) === null)
    // an absurd part number past any int also declines, never overflows
    assert(PptxSlides.parse(wrap(
      "ppt/slides/slide1.xml" -> body,
      "ppt/slides/slide9999999999.xml" -> body)) === null)
    // contiguous decks are unaffected
    assert(arr(PptxSlides.parse(wrap(
      "ppt/slides/slide1.xml" -> body,
      "ppt/slides/slide2.xml" -> body))) === Seq("s", "s"))
  }

  test("pptx declines: a deck with no slide parts; empty slides are kept") {
    assert(PptxSlides.parse(wrap("ppt/presentation.xml" -> "<p:presentation/>")) === null)
    // a slide with no <a:p> at all contributes an empty string
    assert(arr(PptxSlides.parse(wrap(
      "ppt/slides/slide1.xml" -> "<p:sld><p:cSld/></p:sld>"))) === Seq(""))
  }

  test("independent witness: epub chapters invariant under attribute reorder") {
    // the manifest/spine walks key on attribute NAMES: the same book
    // with every attribute list permuted (id/href/media-type,
    // idref/linear) must serve identical chapters in spine order
    val container = "<container><rootfiles>" +
      "<rootfile full-path=\"OEBPS/content.opf\"/></rootfiles></container>"
    val ch1 = "<html><body>one</body></html>"
    val ch2 = "<html><body>two</body></html>"
    val opfA = "<package><manifest>" +
      "<item id=\"c1\" href=\"ch1.xhtml\" media-type=\"application/xhtml+xml\"/>" +
      "<item id=\"c2\" href=\"ch2.xhtml\" media-type=\"application/xhtml+xml\"/>" +
      "</manifest><spine>" +
      "<itemref idref=\"c2\" linear=\"yes\"/><itemref idref=\"c1\"/></spine></package>"
    val opfB = "<package><manifest>" +
      "<item media-type=\"application/xhtml+xml\" href=\"ch2.xhtml\" id=\"c2\"/>" +
      "<item href=\"ch1.xhtml\" media-type=\"application/xhtml+xml\" id=\"c1\"/>" +
      "</manifest><spine>" +
      "<itemref linear=\"yes\" idref=\"c2\"/><itemref idref=\"c1\"/></spine></package>"
    def book(opf: String) = wrap(
      "META-INF/container.xml" -> container,
      "OEBPS/content.opf" -> opf,
      "OEBPS/ch1.xhtml" -> ch1, "OEBPS/ch2.xhtml" -> ch2)
    val a = arr(EpubChapters.parse(book(opfA)))
    val b = arr(EpubChapters.parse(book(opfB)))
    assert(a === Seq("two", "one")) // spine order, not manifest order
    assert(b === a, "attribute order (and manifest item order) must be invisible")
  }

  test("zip kind routes the whole PK family by directory names") {
    import graft.plans.{ZipKind, DocxEncode, XlsxEncode, ZipEncode}
    def kind(b: Array[Byte]): String = {
      val k = ZipKind.classify(b)
      if (k == null) null else k.toString
    }
    assert(kind(DocxEncode.encode(7L, 2)) === "docx")
    assert(kind(XlsxEncode.encode(7L, 2)) === "xlsx")
    assert(kind(PptxEncode.encode(7L, 2)) === "pptx")
    assert(kind(EpubEncode.encode(7L, 2)) === "epub")
    assert(kind(ZipEncode.encode(7L, 3, true)) === "zip")
    assert(kind("not a zip at all".getBytes) === null)
  }

  test("truncations never throw (pptx + epub)") {
    val p = PptxEncode.encode(9L, 3)
    val e = EpubEncode.encode(9L, 3)
    var cut = 1
    while (cut < p.length) { PptxSlides.parse(java.util.Arrays.copyOf(p, cut)); cut += 7 }
    cut = 1
    while (cut < e.length) { EpubChapters.parse(java.util.Arrays.copyOf(e, cut)); cut += 7 }
  }
}
