package graft

import org.scalatest.funsuite.AnyFunSuite

/** The media parsers run over arbitrary UNTRUSTED bytes at corpus scale
  * — a single thrown exception fails a whole 100 TB query stage, so the
  * total-function contract ("parse or NULL, never throw") is fuzzed:
  * pure random bytes, random bytes behind valid magic prefixes
  * (steering the fuzz INTO each format's segment/chunk walk), and
  * truncations / single-byte corruptions of well-formed files. Seeded
  * generation (same convention as TopKPropertySpec — the scalacheck
  * scalatest bridge isn't in the offline cache). */
class ParserFuzzSpec extends AnyFunSuite {

  private def hx(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  private val parsers: Seq[(String, Array[Byte] => AnyRef)] = Seq(
    "ImageMeta" -> (graft.plans.ImageMeta.parse(_)),
    "WavMeta" -> (graft.plans.WavMeta.parse(_)),
    "BmpStats" -> (graft.plans.BmpStats.parse(_)),
    "BmpResize" -> (graft.plans.BmpResize.parse(_, 3, 2)),
    "GifMeta" -> (graft.plans.GifMeta.parse(_)),
    "PngStats" -> (graft.plans.PngStats.parse(_)),
    "GifPixels" -> (graft.plans.GifPixels.parse(_)),
    "JpegPixels" -> (graft.plans.JpegPixels.parse(_)),
    "AviMeta" -> (graft.plans.AviMeta.parse(_)),
    "AviFrames" -> (graft.plans.AviFrames.parse(_)),
    "Mp4Meta" -> (graft.plans.Mp4Meta.parse(_)),
    "TiffPixels" -> (graft.plans.TiffPixels.parse(_)),
    "WavFloat" -> (graft.plans.WavFloat.parse(_)),
    "WavPcm" -> (graft.plans.WavPcm.parse(_)),
    "FlacMeta" -> (graft.plans.FlacMeta.parse(_)),
    "Mp3Meta" -> (graft.plans.Mp3Meta.parse(_)),
    "ExifMeta" -> (graft.plans.ExifMeta.parse(_)),
    "AudioTags" -> (graft.plans.AudioTags.parse(_)),
    "WebpMeta" -> (graft.plans.WebpMeta.parse(_)),
    "AvifMeta" -> (graft.plans.AvifMeta.parse(_)),
    "GzipMeta" -> (graft.plans.GzipMeta.parse(_)),
    "PdfMeta" -> (graft.plans.PdfMeta.parse(_)),
    "WarcRecords" -> (graft.plans.WarcRecords.parse(_)),
    "WarcResponse" -> (graft.plans.WarcRecords.parseResponse(_)),
    "HttpBody" -> (graft.plans.HttpBody.parse(_)),
    "ZipEntries" -> (graft.plans.ZipEntries.parse(_)),
    // robots is a STRING parser (fail-open, never declines) — fuzzed
    // through a lossless byte→string bridge for the never-throw law
    "RobotsRules" -> ((b: Array[Byte]) =>
      graft.plans.Robots.rules(new String(b, "ISO-8859-1"))),
    // allowed() is boxed (null = over-cap decline) — pass it through
    "RobotsAllowed" -> ((b: Array[Byte]) =>
      graft.plans.Robots.allowed(new String(b, "ISO-8859-1"), "bot", "/x/y")),
    // charset decode: the sniff + strict-utf8 path must never throw
    "HttpText" -> ((b: Array[Byte]) => graft.plans.HttpText.decode(b, null)),
    "HttpTextCp1252" -> ((b: Array[Byte]) =>
      graft.plans.HttpText.decode(b, "windows-1252")),
    "SitemapUrls" -> ((b: Array[Byte]) =>
      graft.plans.Sitemap.parse(new String(b, "ISO-8859-1"))),
    // the r15 document-text tier: the PDF content-stream walk and the
    // ZIP-of-XML family (extraction + tag scans behind the CRC gate)
    "PdfPageTexts" -> (graft.plans.PdfPageTexts.parse(_)),
    "ZipExtract" -> (graft.plans.ZipExtract.extract(_, "e0.txt")),
    "DocxText" -> (graft.plans.DocxText.parse(_)),
    "XlsxCells" -> (graft.plans.XlsxCells.parse(_)),
    "PptxSlides" -> (graft.plans.PptxSlides.parse(_)),
    "EpubChapters" -> (graft.plans.EpubChapters.parse(_)),
    "RtfText" -> (graft.plans.RtfText.parse(_)),
    "OdtText" -> (graft.plans.OdtText.parse(_)),
    "OdsCells" -> (graft.plans.OdsCells.parse(_)),
    "OdpSlides" -> (graft.plans.OdpSlides.parse(_)))

  // magic prefixes steer the fuzz into each format's deep parse path
  private val prefixes: Seq[Array[Byte]] = Seq(
    Array.emptyByteArray,
    hx("89504E470D0A1A0A"), // PNG signature
    hx("FFD8"), // JPEG SOI
    "RIFF1234WAVE".getBytes, // RIFF/WAVE container
    "BM".getBytes, // BMP magic
    "GIF87a".getBytes, "GIF89a".getBytes, // GIF signatures
    "RIFF".getBytes ++ hx("10000000") ++ "AVI LIST".getBytes, // AVI container
    hx("00000014") ++ "ftypisom".getBytes ++ hx("00000200") ++
      "isommp42".getBytes, // ISO-BMFF ftyp: steers into the box walk
    hx("49492A0008000000"), // TIFF little-endian header → IFD walk
    hx("4D4D002A00000008"), // TIFF big-endian header → IFD walk
    "fLaC".getBytes ++ hx("00000022"), // FLAC magic + STREAMINFO header
    "ID3".getBytes ++ hx("0300000000000A"), // ID3v2 header → syncsafe skip
    hx("FFFB"), // MPEG-1 Layer III frame sync → frame-chain walk
    hx("FFD8FFE100A0") ++ "Exif".getBytes ++ hx("0000"), // APP1/EXIF → IFD walk
    "RIFF".getBytes ++ hx("40000000") ++ "WEBP".getBytes, // WebP form → chunk walk
    hx("00000014") ++ "ftypavif".getBytes ++ hx("00000000") ++
      "avif".getBytes, // AVIF ftyp → meta/iprp walk
    hx("1F8B0808") ++ hx("00000000") ++ hx("0003"), // gzip FNAME header → field walk + inflate
    "%PDF-1.4\n".getBytes, // PDF header → tail/startxref/xref walk
    "WARC/1.0\r\nWARC-Type: response\r\n".getBytes, // WARC header walk
    "HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n".getBytes, // HTTP chunk walk
    "PK".getBytes ++ hx("0304")) // ZIP local-header magic → EOCD tail scan

  private def neverThrows(name: String, p: Array[Byte] => AnyRef,
      input: Array[Byte], what: String): Unit =
    try p(input)
    catch { case e: Throwable =>
      fail(s"$name threw ${e.getClass.getSimpleName} on $what " +
        s"(${input.length} bytes): ${e.getMessage}")
    }

  test("random bytes (raw and behind every magic prefix) never throw") {
    val rnd = new scala.util.Random(0x5EED)
    for (trial <- 0 until 4000) {
      val tail = new Array[Byte](rnd.nextInt(201))
      rnd.nextBytes(tail)
      val input = prefixes(trial % prefixes.length) ++ tail
      parsers.foreach { case (name, p) =>
        neverThrows(name, p, input, s"fuzz trial $trial")
      }
    }
  }

  test("truncations and single-byte corruptions of valid files never throw") {
    // one well-formed instance per format (same layouts the unit specs use)
    val png = hx("89504E470D0A1A0A0000000D49484452") ++
      hx("00000280") ++ hx("000001E0") ++ hx("080600000000000000")
    val jpeg = hx("FFD8FFE000104A46494600010100000100010000") ++
      hx("FFC0001108") ++ hx("01E0") ++ hx("0280") ++ hx("03012200021101031101")
    val wav = "RIFF".getBytes ++ hx("28000000") ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ hx("10000000") ++ hx("0100") ++ hx("0200") ++
      hx("44AC0000") ++ hx("10B10200") ++ hx("0400") ++ hx("1000")
    val bmp = "BM".getBytes ++ hx("46000000") ++ hx("00000000") ++ hx("36000000") ++
      hx("28000000") ++ hx("02000000") ++ hx("02000000") ++ hx("0100") ++ hx("1800") ++
      hx("00000000") ++ hx("10000000") ++ hx("130B0000130B0000") ++
      hx("0000000000000000") ++ Array.fill[Byte](16)(0x5A)
    // sanity: the uncorrupted instances all parse (the fuzz below is
    // mutating REAL files, not junk that parsers reject at byte 0)
    assert(graft.plans.ImageMeta.parse(png) != null)
    assert(graft.plans.ImageMeta.parse(jpeg) != null)
    assert(graft.plans.WavMeta.parse(wav) != null)
    assert(graft.plans.BmpStats.parse(bmp) != null)
    val gif = "GIF89a".getBytes ++ hx("0A00") ++ hx("0700") ++ hx("000000")
    assert(graft.plans.GifMeta.parse(gif) != null)
    // a REAL compressed PNG: corruptions land inside the zlib/filter
    // stream (hostile IDAT bytes), not just the chunk framing
    val fullPng = graft.plans.PngEncode.encode(4, 6, 77L, true)
    assert(graft.plans.PngStats.parse(fullPng) != null)
    // a REAL LZW-compressed GIF: corruptions land inside the code
    // stream (bad widths, out-of-range codes, mangled sub-blocks)
    val fullGif = graft.plans.GifEncode.encode(16, 16, 77L)
    assert(graft.plans.GifPixels.parse(fullGif) != null)
    // a REAL entropy-coded baseline JPEG (restart markers on):
    // corruptions land inside the Huffman bit stream, the marker walk,
    // and the RSTn cadence
    val fullJpeg = graft.plans.JpegEncode.encodeBlocky(17, 12, 77L, true)
    assert(graft.plans.JpegPixels.parse(fullJpeg) != null)
    // the COLOR variant: corruptions land in the interleaved-MCU
    // stream, the 3-component SOF/SOS headers, and the subsampled
    // chroma path
    val fullJpegColor = graft.plans.JpegEncode.encodeBlockyColor(17, 12, 77L, 2, true)
    assert(graft.plans.JpegPixels.parse(fullJpegColor) != null)
    // LOSSLESS (SOF3): corruptions land in the prediction/difference
    // stream and the lossless-specific SOS fields
    val fullJpegLossless = graft.plans.JpegEncode.encodeLossless(17, 12, 77L, 3, 4, 12)
    assert(graft.plans.JpegPixels.parse(fullJpegLossless) != null)
    // 12-bit extended sequential (SOF1): corruptions land in the
    // Pq=1 wide DQT entries and the 16-symbol DC table
    val fullJpeg12 = graft.plans.JpegEncode.encodeBlocky12(17, 12, 77L, true)
    assert(graft.plans.JpegPixels.parse(fullJpeg12) != null)
    // a REAL MJPEG AVI: corruptions land in the RIFF chunk walk, the
    // word-alignment padding, and the per-frame JPEG streams
    val fullAvi = graft.plans.AviEncode.encode(17, 12, 2, 77L, 1)
    assert(graft.plans.AviFrames.parse(fullAvi) != null)
    assert(graft.plans.AviMeta.parse(fullAvi) != null)
    // a REAL PCM WAV: corruptions land in the sample data and the
    // JUNK/fmt/data chunk framing
    val fullWav = graft.plans.WavEncode.encode(80, 2, 77L)
    assert(graft.plans.WavPcm.parse(fullWav) != null)
    // G.711 WAVs (both laws): corruptions land in the 18-byte non-PCM
    // fmt chunk and the code-byte expansion
    val fullG711s = Seq(true, false).map(mu =>
      graft.plans.WavEncode.encodeG711(60, 2, 77L, mu))
    fullG711s.foreach(f => assert(graft.plans.WavPcm.parse(f) != null))
    // an IEEE-float WAV: corruptions land in the float sample bits
    // (incl. NaN/Inf injections the decoder must refuse, not sum)
    val fullFloat = graft.plans.WavFloat.encode(60, 2, 77L)
    assert(graft.plans.WavFloat.parse(fullFloat) != null)
    // REAL ISO-BMFF files across the structural variants (fullbox
    // versions, 64-bit largesize, size==0 open mdat): corruptions
    // land in the box size fields and the nested moov/trak walk
    val fullMp4s = Seq(0L, 1L, 2L, 3L, 5L, 7L, 35L).map(s =>
      graft.plans.Mp4Encode.encode(320, 240, 1, 1, 600, 5000L, (s % 3).toInt, 12, s))
    fullMp4s.foreach(f => assert(graft.plans.Mp4Meta.parse(f) != null))
    // REAL baseline TIFFs, both byte orders, strip layouts, and strip
    // encodings (uncompressed / LZW / LZW+predictor): corruptions land
    // in the IFD entry walk, the out-of-line value arrays, the strip
    // bounds arithmetic, and the LZW code stream
    val fullTiffs = ((0 to 51) ++ (72 to 79)).map(mode =>
      graft.plans.TiffEncode.encode(9, 7, 77L, mode, 2))
    fullTiffs.foreach(f => assert(graft.plans.TiffPixels.parse(f) != null))
    // a REAL FLAC metadata chain: corruptions land in the packed
    // STREAMINFO bit fields and the block-chain length walk
    val fullFlac = graft.plans.FlacMeta.encode(44100, 2, 16, 99999L, 77L, 12)
    assert(graft.plans.FlacMeta.parse(fullFlac) != null)
    // a REAL VBR Layer III chain behind an ID3v2 tag with an ID3v1
    // trailer: corruptions land in the syncsafe size, the per-frame
    // headers (version/layer/bitrate/rate drift checks), and the
    // frame-length arithmetic
    val fullMp3 = graft.plans.Mp3Meta.encode(8, 0, 1, mono = false,
      seed = 77L, vbrStep = 2, id3Len = 40, id3v1 = true)
    assert(graft.plans.Mp3Meta.parse(fullMp3) != null)
    // REAL EXIF carriers, both containers: corruptions land in the
    // IFD entry walk, the inline/out-of-line value dispatch, the
    // sub-IFD hop, and (JPEG) the APP1 segment framing
    val fullExifs = Seq(
      graft.plans.ExifMeta.encode(77L, true, true, 3, "cam",
        "2021:02:03 04:05:06", "2001:04:08 05:11:13"),
      graft.plans.ExifMeta.encode(77L, false, false, 6, "cam",
        "2021:02:03 04:05:06", "2001:04:08 05:11:13"))
    fullExifs.foreach(f => assert(graft.plans.ExifMeta.parse(f) != null))
    // REAL gzip members across the header variants and a multi-member
    // file: corruptions land in the optional-field walk, the FHCRC,
    // the DEFLATE stream (the JDK inflater must be caught, not
    // trusted), and the trailer arithmetic
    val fullGzips = Seq(
      graft.plans.GzipEncode.encode(77L, 60, 0, 1),
      graft.plans.GzipEncode.encode(78L, 60, 1, 1),
      graft.plans.GzipEncode.encode(79L, 60, 2, 2))
    fullGzips.foreach(f => assert(graft.plans.GzipMeta.parse(f) != null))
    // REAL classic-xref PDFs: corruptions land in the startxref tail,
    // the 20-byte entry grid, the trailer dict, and the object walks
    val fullPdfs = Seq(
      graft.plans.PdfEncode.encode(77L, 3, 4, false, 0),
      graft.plans.PdfEncode.encode(78L, 24, 7, true, 1),
      graft.plans.PdfEncode.encode(79L, 8, 5, false, 2))
    fullPdfs.foreach(f => assert(graft.plans.PdfMeta.parse(f) != null))
    // REAL WARC archives, both layouts: corruptions land in the
    // version line, the header block, the Content-Length arithmetic,
    // and (compressed) the per-record gzip members
    val fullWarcs = Seq(
      graft.plans.WarcEncode.encode(77L, compressed = false),
      graft.plans.WarcEncode.encode(78L, compressed = true))
    fullWarcs.foreach(f => assert(graft.plans.WarcRecords.parse(f) != null))
    // REAL HTTP responses across the framing × content-coding matrix:
    // corruptions land in the status line, header block, chunk-size
    // grammar, and the gzip/deflate streams the decode path inflates
    val fullHttps = for (m <- 0 to 2; c <- 0 to 3) yield
      graft.plans.HttpBody.wrap(77L, 200, "text/html",
        ("p" * 200).getBytes("ISO-8859-1"), m, c)
    fullHttps.foreach(f => assert(graft.plans.HttpBody.parse(f) != null))
    // REAL JDK-written zips: corruptions land in the EOCD fields, the
    // central-directory entry grid, and the name-length arithmetic
    val fullZips = Seq(
      graft.plans.ZipEncode.encode(77L, 3, false),
      graft.plans.ZipEncode.encode(78L, 6, true))
    fullZips.foreach(f => assert(graft.plans.ZipEntries.parse(f) != null))
    // REAL document-text fixtures: corruptions land in content
    // streams, xref offsets, OPC part XML, and the OPF indirection
    val fullDocs = Seq(
      graft.plans.PdfTextEncode.encode(77L, 3),
      graft.plans.PdfTextEncode.encode(105L, 2), // Flate+tree+split stack
      graft.plans.PdfTextEncode.encode(13L, 2), // Type0 Identity-H + ToUnicode
      graft.plans.PdfTextEncode.encode(30030L, 2), // CID × every other variant
      graft.plans.PdfTextEncode.encode(19L, 2), // LZWDecode streams
      graft.plans.PdfTextEncode.encode(23L, 2), // ASCII85+Flate chain
      graft.plans.RtfEncode.encode(77L, 3),
      graft.plans.OdtEncode.encode(77L, 3),
      graft.plans.OdsEncode.encode(77L, 3),
      graft.plans.OdpEncode.encode(77L, 3),
      graft.plans.DocxEncode.encode(77L, 3),
      graft.plans.XlsxEncode.encode(77L, 4),
      graft.plans.PptxEncode.encode(77L, 3),
      graft.plans.EpubEncode.encode(77L, 3))
    assert(graft.plans.PdfPageTexts.parse(fullDocs(0)) != null)
    assert(graft.plans.PdfPageTexts.parse(fullDocs(2)) != null)
    assert(graft.plans.PdfPageTexts.parse(fullDocs(3)) != null)
    assert(graft.plans.PdfPageTexts.parse(fullDocs(4)) != null)
    assert(graft.plans.PdfPageTexts.parse(fullDocs(5)) != null)
    assert(graft.plans.RtfText.parse(fullDocs(6)) != null)
    assert(graft.plans.OdtText.parse(fullDocs(7)) != null)
    assert(graft.plans.OdsCells.parse(fullDocs(8)) != null)
    assert(graft.plans.OdpSlides.parse(fullDocs(9)) != null)
    assert(graft.plans.DocxText.parse(fullDocs(10)) != null)
    assert(graft.plans.XlsxCells.parse(fullDocs(11)) != null)
    assert(graft.plans.PptxSlides.parse(fullDocs(12)) != null)
    assert(graft.plans.EpubChapters.parse(fullDocs(13)) != null)
    val rnd = new scala.util.Random(0xF00D)
    for (f <- Seq(png, jpeg, wav, bmp, gif, fullPng, fullGif, fullJpeg,
        fullJpegColor, fullJpegLossless, fullJpeg12, fullAvi, fullWav, fullFloat,
        fullFlac, fullMp3) ++
        fullExifs ++ fullG711s ++ fullMp4s ++ fullTiffs ++ fullGzips ++
        fullPdfs ++ fullWarcs ++ fullHttps ++ fullZips ++ fullDocs;
        _ <- 0 until 800) {
      val truncated = f.take(rnd.nextInt(f.length + 1))
      val corrupted = f.clone()
      val at = rnd.nextInt(f.length)
      corrupted(at) = (corrupted(at) ^ (1 + rnd.nextInt(255))).toByte
      parsers.foreach { case (name, p) =>
        neverThrows(name, p, truncated, "truncation")
        neverThrows(name, p, corrupted, s"corruption at byte $at")
      }
    }
  }
}
