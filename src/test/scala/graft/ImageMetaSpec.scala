package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, LongType, StructField, StructType}

/** plans.ImageMeta: the header parser must handle REAL file layouts —
  * not just the fixture the registered query constructs — so these
  * bytes are hand-assembled to the public specs, including the cases
  * the query never produces (multi-segment JPEGs, fill bytes,
  * truncations, EOI-before-SOF). */
class ImageMetaSpec extends SparkSpec {

  private def be32(v: Long): Array[Byte] =
    Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
  private def be16(v: Int): Array[Byte] = Array((v >> 8).toByte, v.toByte)
  private def hx(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  private def png(w: Long, h: Long): Array[Byte] =
    hx("89504E470D0A1A0A") ++ hx("0000000D") ++ "IHDR".getBytes ++
      be32(w) ++ be32(h) ++ hx("080600000000000000")

  /** JPEG with APP0(JFIF) + APP1(Exif-ish, 32 bytes of payload) + DQT
    * before the SOF — the parser must skip all three by length. */
  private def jpegMultiSeg(w: Int, h: Int, sofMarker: Int = 0xC0): Array[Byte] = {
    def seg(marker: Int, payload: Array[Byte]): Array[Byte] =
      Array(0xFF.toByte, marker.toByte) ++ be16(payload.length + 2) ++ payload
    hx("FFD8") ++
      seg(0xE0, "JFIF".getBytes ++ Array[Byte](0, 1, 1, 0, 0, 1, 0, 1, 0, 0)) ++
      seg(0xE1, Array.fill[Byte](32)(0x42)) ++
      seg(0xDB, Array.fill[Byte](65)(1)) ++
      seg(sofMarker, Array[Byte](8) ++ be16(h) ++ be16(w) ++
        hx("03012200021101031101"))
  }

  private def parse(b: Array[Byte]): Option[(String, Int, Int)] = {
    val r = graft.plans.ImageMeta.parse(b)
    Option(r).map(row => (row.getUTF8String(0).toString, row.getInt(1), row.getInt(2)))
  }

  test("PNG IHDR: dims at spec offsets; truncation and bad signature rejected") {
    assert(parse(png(640, 480)) === Some(("png", 640, 480)))
    assert(parse(png(1, 1)) === Some(("png", 1, 1)))
    assert(parse(png(640, 480).take(23)) === None) // mid-IHDR truncation
    val badSig = png(640, 480); badSig(1) = 'Q'.toByte
    assert(parse(badSig) === None)
    assert(parse(png(0, 480)) === None) // zero dimension: invalid per spec
  }

  test("JPEG: segment walk skips APPn/DQT by length; SOF0/SOF2 both carry dims") {
    assert(parse(jpegMultiSeg(1024, 768)) === Some(("jpeg", 1024, 768)))
    assert(parse(jpegMultiSeg(33, 17, sofMarker = 0xC2)) === Some(("jpeg", 33, 17))) // progressive
    // fill bytes before a marker are legal padding (T.81 B.1.1.2)
    val filled = hx("FFD8FFFF") ++ jpegMultiSeg(5, 6).drop(2)
    assert(parse(filled) === Some(("jpeg", 5, 6)))
    // EOI before any SOF: a dimensionless stream, not an image with dims
    assert(parse(hx("FFD8FFD9")) === None)
    // truncated inside the APP1 segment
    assert(parse(jpegMultiSeg(9, 9).take(12)) === None)
    // SOF whose DECLARED length can't cover its fixed fields: the
    // would-be dimension bytes belong to the next segment — reject,
    // don't report garbage dims (a real decoder errors here too)
    val shortSof = hx("FFD8FFC0") ++ be16(3) ++ hx("08FFFE0010")
    assert(parse(shortSof) === None)
    // DHT (C4) is NOT a frame header even though it sits in the CX range
    val dhtFirst = hx("FFD8") ++ hx("FFC4") ++ be16(4) ++ Array.fill[Byte](2)(0) ++
      jpegMultiSeg(7, 8).drop(2)
    assert(parse(dhtFirst) === Some(("jpeg", 7, 8)))
  }

  private def le16(v: Int): Array[Byte] = Array(v.toByte, (v >> 8).toByte)
  private def le32(v: Long): Array[Byte] =
    Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
  private def chunk(id: String, payload: Array[Byte]): Array[Byte] =
    id.getBytes ++ le32(payload.length) ++ payload ++
      (if (payload.length % 2 == 1) Array[Byte](0) else Array.emptyByteArray)
  private def fmtChunk(ch: Int, rate: Long, bits: Int): Array[Byte] =
    chunk("fmt ", le16(1) ++ le16(ch) ++ le32(rate) ++
      le32(rate * ch * bits / 8) ++ le16(ch * bits / 8) ++ le16(bits))
  private def wav(body: Array[Byte]): Array[Byte] =
    "RIFF".getBytes ++ le32(body.length + 4) ++ "WAVE".getBytes ++ body

  private def parseWav(b: Array[Byte]): Option[(Int, Int, Int)] = {
    val r = graft.plans.WavMeta.parse(b)
    Option(r).map(row => (row.getInt(0), row.getInt(1), row.getInt(2)))
  }

  test("WAV: fmt fields decoded little-endian; chunk walk skips by size incl. odd padding") {
    assert(parseWav(wav(fmtChunk(2, 44100, 16))) === Some((2, 44100, 16)))
    // chunks BEFORE fmt must be skipped by their size field — including
    // an odd-sized one whose pad byte the walk must account for
    val padded = wav(chunk("JUNK", Array[Byte](1, 2, 3)) ++
      chunk("LIST", Array.fill[Byte](10)(7)) ++ fmtChunk(1, 8000, 8))
    assert(parseWav(padded) === Some((1, 8000, 8)))
    // truncated before fmt / inside fmt: null, not a crash
    assert(parseWav(wav(fmtChunk(2, 44100, 16)).take(20)) === None)
    assert(parseWav(wav(chunk("JUNK", Array[Byte](1)))) === None) // no fmt at all
    // wrong container tags
    val notWave = wav(fmtChunk(1, 8000, 8)); notWave(9) = 'X'.toByte
    assert(parseWav(notWave) === None)
    assert(parseWav(wav(fmtChunk(0, 8000, 8))) === None) // zero channels: invalid
  }

  test("registered audio query round-trips its constructed headers at sf0.001") {
    val out = graft.operators.Multimodal.audioMeta(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val id = r.getLong(0)
      if (id % 89 == 0) assert(r.isNullAt(2), s"doc $id: non-WAV must parse null")
      else {
        assert(r.getInt(2) === (1 + id % 2).toInt, s"doc $id channels")
        assert(r.getInt(3) === (8000 * (1 + id % 6)).toInt, s"doc $id rate")
        assert(r.getInt(4) === (8 * (1 + id % 3)).toInt, s"doc $id bits")
      }
    }
    assert(out.exists(_.getLong(0) % 89 == 0))
    assert(out.exists(r => r.getLong(0) % 2 == 1 && !r.isNullAt(2))) // JUNK-chunk branch
  }

  /** Uncompressed 24bpp BMP from explicit (r,g,b) pixel rows (row 0 =
    * TOP row as seen); `topDown` flips the stored row order + sign. */
  private def bmp(pixels: Seq[Seq[(Int, Int, Int)]], topDown: Boolean = false): Array[Byte] = {
    val h = pixels.length; val w = pixels.head.length
    val rowSize = ((w * 3 + 3) / 4) * 4
    val stored = if (topDown) pixels else pixels.reverse // file stores bottom-up by default
    val data = stored.flatMap { row =>
      row.flatMap { case (r, g, b) => Seq(b.toByte, g.toByte, r.toByte) } ++
        Array.fill[Byte](rowSize - w * 3)(0)
    }.toArray
    "BM".getBytes ++ le32(54L + data.length) ++ le32(0) ++ le32(54) ++
      le32(40) ++ le32(w) ++ le32(if (topDown) (4294967296L - h) else h.toLong) ++
      le16(1) ++ le16(24) ++ le32(0) ++ le32(data.length) ++
      le32(2835) ++ le32(2835) ++ le32(0) ++ le32(0) ++ data
  }

  private def parseBmp(b: Array[Byte]): Option[(Int, Int, Long, Long, Long, Long)] = {
    val r = graft.plans.BmpStats.parse(b)
    Option(r).map(row => (row.getInt(0), row.getInt(1), row.getLong(2),
      row.getLong(3), row.getLong(4), row.getLong(5)))
  }

  test("BMP pixel decode: exact channel sums, row padding excluded, orientation-invariant") {
    // 2x2: distinct per-channel values; W=2 rows pad 2 bytes each,
    // which must NOT leak into the sums
    val px = Seq(Seq((10, 20, 30), (40, 50, 60)), Seq((1, 2, 3), (4, 5, 6)))
    val expect = Some((2, 2, 55L, 77L, 99L, 4L))
    assert(parseBmp(bmp(px)) === expect)
    assert(parseBmp(bmp(px, topDown = true)) === expect) // sums invariant to row order
    // W=1: rowSize 4 with 1 pad byte per row
    assert(parseBmp(bmp(Seq(Seq((255, 0, 128)), Seq((1, 1, 1))))) ===
      Some((1, 2, 256L, 1L, 129L, 2L)))
    // truncated pixel data / wrong depth / garbage: null, never garbage sums
    assert(parseBmp(bmp(px).dropRight(1)) === None)
    // hostile header: width chosen so w*3+3 overflows Int (negative
    // rowSize would bypass the bounds check) — must be null, not a
    // negative-index crash or silent zero sums
    val hostile = bmp(px)
    System.arraycopy(le32(715827882L), 0, hostile, 18, 4)
    assert(parseBmp(hostile) === None)
    val hostile2 = bmp(px)
    System.arraycopy(le32(1431655766L), 0, hostile2, 18, 4) // w*3 itself overflows
    assert(parseBmp(hostile2) === None)
    val wrongDepth = bmp(px); wrongDepth(28) = 16.toByte // 16bpp unsupported
    assert(parseBmp(wrongDepth) === None)
    assert(parseBmp("BMnot really a bitmap".getBytes) === None)
    // hostile header where rowSizeL * h overflows LONG (w,h both near
    // 2^31 with valid planes/bpp/compression — ADVICE r5): the wrapped
    // product would pass a `off + rowSizeL*h > len` bound and the pixel
    // loop would read past the array; the division-form bound rejects it
    val longOverflow = bmp(px)
    System.arraycopy(le32(2100000000L), 0, longOverflow, 18, 4) // w
    System.arraycopy(le32(2000000000L), 0, longOverflow, 22, 4) // h
    assert(parseBmp(longOverflow) === None)
    // dataOffset beyond the buffer with huge h: (len - off) must not go
    // negative-and-wrap through the division bound either
    val hugeOffset = bmp(px)
    System.arraycopy(le32(4000000000L), 0, hugeOffset, 10, 4)
    System.arraycopy(le32(2000000000L), 0, hugeOffset, 22, 4)
    assert(parseBmp(hugeOffset) === None)
  }

  test("BMP nearest-neighbor resize: sample map, orientation, identity, upscale") {
    import graft.plans.BmpResize
    def resize(b: Array[Byte], w2: Int, h2: Int) =
      Option(BmpResize.parse(b, w2, h2)).map(r => (r.getInt(0), r.getInt(1),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    // reference: pure-Scala nearest-neighbor over the (r,g,b) grid
    def ref(px: Seq[Seq[(Int, Int, Int)]], w2: Int, h2: Int) = {
      val h = px.length; val w = px.head.length
      val sampled = for (y2 <- 0 until h2; x2 <- 0 until w2)
        yield px((y2 * h / h2).toInt)((x2 * w / w2).toInt)
      Some((w2, h2, sampled.map(_._1.toLong).sum,
        sampled.map(_._2.toLong).sum, sampled.map(_._3.toLong).sum,
        w2.toLong * h2))
    }
    // 4x3 with DISTINCT rows: a wrong row flip changes the samples
    val px = Seq(
      Seq((10, 0, 0), (20, 0, 0), (30, 0, 0), (40, 0, 0)),
      Seq((0, 50, 0), (0, 60, 0), (0, 70, 0), (0, 80, 0)),
      Seq((0, 0, 90), (0, 0, 100), (0, 0, 110), (0, 0, 120)))
    for ((w2, h2) <- Seq((2, 2), (1, 1), (3, 3), (4, 3), (8, 6), (5, 1))) {
      val want = ref(px, w2, h2)
      assert(resize(bmp(px), w2, h2) === want, s"bottom-up $w2 x $h2")
      // orientation is LOAD-BEARING for resize (unlike whole-image
      // sums): the top-down file must sample the same logical rows
      assert(resize(bmp(px, topDown = true), w2, h2) === want, s"top-down $w2 x $h2")
    }
    // identity resize equals the full stats
    assert(resize(bmp(px), 4, 3).map(t => (t._3, t._4, t._5)) ===
      parseBmp(bmp(px)).map(t => (t._3, t._4, t._5)))
    // hostile: bad targets and corrupt sources are NULL, never throw
    assert(resize(bmp(px), 0, 2) === None)
    assert(resize(bmp(px), 2, 5000) === None)
    assert(resize(bmp(px).dropRight(1), 2, 2) === None)
    assert(resize("BMnope".getBytes, 2, 2) === None)
  }

  test("8-bit palette and 32-bit BMPs decode with exact sums; ImageIO agrees") {
    def le16b(v: Int) = Array[Byte]((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
    def le32b(v: Long) = Array[Byte]((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
    // ---- 8-bit palette, 5x3, 16 colors, explicit biClrUsed ----
    val (w8, h8) = (5, 3)
    val pal = (0 until 16).map(i => (10 * i % 256, (7 * i + 3) % 256, (13 * i + 1) % 256))
    def idx8(x: Int, y: Int) = (x + 2 * y) % 16
    val row8 = (w8 + 3) / 4 * 4
    val out8 = new java.io.ByteArrayOutputStream()
    out8.write('B'); out8.write('M')
    out8.write(le32b(14 + 40 + 4 * 16 + row8.toLong * h8), 0, 4)
    out8.write(le32b(0), 0, 4); out8.write(le32b(14 + 40 + 4 * 16), 0, 4)
    out8.write(le32b(40), 0, 4)
    out8.write(le32b(w8.toLong), 0, 4); out8.write(le32b(h8.toLong), 0, 4)
    out8.write(le16b(1), 0, 2); out8.write(le16b(8), 0, 2)
    out8.write(le32b(0), 0, 4); out8.write(le32b(row8.toLong * h8), 0, 4)
    out8.write(le32b(2835), 0, 4); out8.write(le32b(2835), 0, 4)
    out8.write(le32b(16), 0, 4); out8.write(le32b(0), 0, 4)
    pal.foreach { case (r, g, b) =>
      out8.write(b); out8.write(g); out8.write(r); out8.write(0) } // BGRA quads
    for (y <- (h8 - 1) to 0 by -1) { // bottom-up rows
      for (x <- 0 until w8) out8.write(idx8(x, y))
      for (_ <- w8 until row8) out8.write(0)
    }
    val bmp8 = out8.toByteArray
    var (er, eg, eb) = (0L, 0L, 0L)
    for (y <- 0 until h8; x <- 0 until w8) {
      val (r, g, b) = pal(idx8(x, y)); er += r; eg += g; eb += b
    }
    assert(parseBmp(bmp8) === Some((w8, h8, er, eg, eb, w8.toLong * h8)))
    val img8 = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bmp8))
    assert(img8 != null && img8.getWidth === w8)
    for (y <- 0 until h8; x <- 0 until w8) {
      val rgb = img8.getRGB(x, y); val (r, g, b) = pal(idx8(x, y))
      assert(((rgb >> 16) & 0xFF, (rgb >> 8) & 0xFF, rgb & 0xFF) === ((r, g, b)),
        s"palette BMP pixel ($x,$y)")
    }
    // ---- 32-bit BGRA, 3x2, alpha ignored ----
    val (w32, h32) = (3, 2)
    def px32(x: Int, y: Int) = (20 * x + 5, 30 * y + 7, 11 * (x + y) + 2)
    val out32 = new java.io.ByteArrayOutputStream()
    out32.write('B'); out32.write('M')
    out32.write(le32b(14 + 40 + 4L * w32 * h32), 0, 4)
    out32.write(le32b(0), 0, 4); out32.write(le32b(54), 0, 4)
    out32.write(le32b(40), 0, 4)
    out32.write(le32b(w32.toLong), 0, 4); out32.write(le32b(h32.toLong), 0, 4)
    out32.write(le16b(1), 0, 2); out32.write(le16b(32), 0, 2)
    out32.write(le32b(0), 0, 4); out32.write(le32b(4L * w32 * h32), 0, 4)
    out32.write(le32b(2835), 0, 4); out32.write(le32b(2835), 0, 4)
    out32.write(le32b(0), 0, 4); out32.write(le32b(0), 0, 4)
    for (y <- (h32 - 1) to 0 by -1; x <- 0 until w32) {
      val (r, g, b) = px32(x, y)
      out32.write(b); out32.write(g); out32.write(r); out32.write(0xAA)
    }
    val bmp32 = out32.toByteArray
    var (fr, fg, fb) = (0L, 0L, 0L)
    for (y <- 0 until h32; x <- 0 until w32) {
      val (r, g, b) = px32(x, y); fr += r; fg += g; fb += b
    }
    assert(parseBmp(bmp32) === Some((w32, h32, fr, fg, fb, w32.toLong * h32)))
    // truncation fuzz over both
    for (good <- Seq(bmp8, bmp32)) {
      var i = 0
      while (i < good.length) {
        graft.plans.BmpStats.parse(java.util.Arrays.copyOf(good, i))
        i += 1
      }
    }
  }

  test("registered pixel query round-trips its constructed BMPs at sf0.001") {
    val out = graft.operators.Multimodal.pixelStats(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val id = r.getLong(0)
      if (id % 83 == 0) assert(r.isNullAt(1), s"doc $id: non-BMP must decode null")
      else {
        val (w, h) = (2 * (1 + id % 3), 1 + id % 4)
        assert(r.getInt(1) === w.toInt && r.getInt(2) === h.toInt, s"doc $id dims")
        assert(r.getLong(3) === h * (w / 2) * ((id * 7) % 256 + (id * 17) % 256), s"doc $id sum_r")
        assert(r.getLong(6) === w * h, s"doc $id n_pixels")
      }
    }
    // all three branches exercised: corrupt, bottom-up, top-down
    assert(out.exists(_.getLong(0) % 83 == 0))
    assert(out.exists(r => r.getLong(0) % 5 == 0 && r.getLong(0) % 83 != 0 && !r.isNullAt(1)))
    assert(out.exists(r => r.getLong(0) % 5 != 0 && !r.isNullAt(1)))
  }

  test("WebP headers: all three container flavors carry dims; hostile variants null") {
    def riff(tag: String, payload: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      "RIFF".foreach(c => out.write(c.toInt))
      val size = 4 + 8 + payload.length
      out.write(size & 0xFF); out.write((size >> 8) & 0xFF)
      out.write((size >> 16) & 0xFF); out.write((size >> 24) & 0xFF)
      "WEBP".foreach(c => out.write(c.toInt))
      tag.foreach(c => out.write(c.toInt))
      out.write(payload.length & 0xFF); out.write((payload.length >> 8) & 0xFF)
      out.write((payload.length >> 16) & 0xFF); out.write((payload.length >> 24) & 0xFF)
      out.write(payload, 0, payload.length)
      out.toByteArray
    }
    def meta(b: Array[Byte]): Option[(String, Int, Int)] =
      Option(graft.plans.ImageMeta.parse(b)).map(r =>
        (r.getUTF8String(0).toString, r.getInt(1), r.getInt(2)))
    // VP8 lossy: 3-byte frame tag, 9D 01 2A, then 14-bit LE dims
    val vp8 = riff("VP8 ", Array[Byte](0x30, 0x01, 0x00,
      0x9D.toByte, 0x01, 0x2A,
      0x40, 0x01, // width 320
      0xF0.toByte, 0x00)) // height 240
    assert(meta(vp8) === Some(("webp", 320, 240)))
    // VP8L lossless: 0x2F, then (w-1) 14 bits | (h-1) << 14, LE
    val bits = (199L & 0x3FFF) | ((99L & 0x3FFF) << 14) // 200 x 100
    val vp8l = riff("VP8L", Array[Byte](0x2F,
      (bits & 0xFF).toByte, ((bits >> 8) & 0xFF).toByte,
      ((bits >> 16) & 0xFF).toByte, ((bits >> 24) & 0xFF).toByte))
    assert(meta(vp8l) === Some(("webp", 200, 100)))
    // VP8X extended: 4 flag bytes + 24-bit LE (w-1), (h-1)
    val vp8x = riff("VP8X", Array[Byte](0x10, 0, 0, 0,
      0x1F, 0x03, 0x00,  // w-1 = 799 -> 800
      0x57, 0x02, 0x00)) // h-1 = 599 -> 600
    assert(meta(vp8x) === Some(("webp", 800, 600)))
    // hostile: wrong start code, truncations
    val bad = vp8.clone(); bad(23) = 0x00
    assert(graft.plans.ImageMeta.parse(bad) === null)
    var i = 0
    while (i < vp8.length) {
      graft.plans.ImageMeta.parse(java.util.Arrays.copyOf(vp8, i))
      i += 1
    }
    // RIFF-but-WAVE is NOT an image
    assert(graft.plans.ImageMeta.parse(
      "RIFF\u0000\u0000\u0000\u0000WAVEfmt ".getBytes("ISO-8859-1")) === null)
  }

  test("TIFF headers: II and MM IFD walks resolve dims; hostile walks null") {
    def tiff(le: Boolean, wTyp: Int, w: Long, hTyp: Int, h: Long): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      def w16(v: Int): Unit =
        if (le) { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
        else { out.write((v >> 8) & 0xFF); out.write(v & 0xFF) }
      def w32(v: Long): Unit =
        if (le) { out.write((v & 0xFF).toInt); out.write(((v >> 8) & 0xFF).toInt)
          out.write(((v >> 16) & 0xFF).toInt); out.write(((v >> 24) & 0xFF).toInt) }
        else { out.write(((v >> 24) & 0xFF).toInt); out.write(((v >> 16) & 0xFF).toInt)
          out.write(((v >> 8) & 0xFF).toInt); out.write((v & 0xFF).toInt) }
      if (le) { out.write('I'); out.write('I'); out.write(42); out.write(0) }
      else { out.write('M'); out.write('M'); out.write(0); out.write(42) }
      w32(8) // IFD0 at byte 8
      w16(2) // two entries
      def entry(tag: Int, typ: Int, v: Long): Unit = {
        w16(tag); w16(typ); w32(1)
        if (typ == 3) { w16(v.toInt); w16(0) } else w32(v)
      }
      entry(256, wTyp, w); entry(257, hTyp, h)
      w32(0) // next-IFD terminator
      out.toByteArray
    }
    def meta(b: Array[Byte]): Option[(String, Int, Int)] =
      Option(graft.plans.ImageMeta.parse(b)).map(r =>
        (r.getUTF8String(0).toString, r.getInt(1), r.getInt(2)))
    assert(meta(tiff(le = true, 3, 640, 3, 480)) === Some(("tiff", 640, 480)))
    assert(meta(tiff(le = false, 3, 640, 3, 480)) === Some(("tiff", 640, 480)))
    assert(meta(tiff(le = true, 4, 70000, 4, 480)) === Some(("tiff", 70000, 480)))
    assert(meta(tiff(le = false, 4, 1, 3, 1)) === Some(("tiff", 1, 1)))
    // hostile: entry count claiming past the buffer; truncations
    val good = tiff(le = true, 3, 10, 3, 10)
    val bomb = good.clone()
    bomb(8) = 0xFF.toByte; bomb(9) = 0x7F.toByte
    assert(graft.plans.ImageMeta.parse(bomb) === null)
    var i = 0
    while (i < good.length) {
      graft.plans.ImageMeta.parse(java.util.Arrays.copyOf(good, i))
      i += 1
    }
    // a TIFF missing one dimension tag is null, not a half-row
    val onlyW = good.clone()
    // overwrite the second entry's tag (257 -> 300)
    val e2 = 8 + 2 + 12
    onlyW(e2) = (300 & 0xFF).toByte; onlyW(e2 + 1) = ((300 >> 8) & 0xFF).toByte
    assert(graft.plans.ImageMeta.parse(onlyW) === null)
  }

  test("garbage and empty inputs are null, not errors") {
    assert(parse(Array.emptyByteArray) === None)
    assert(parse("hello world plain text".getBytes) === None)
    assert(parse(hx("FFD8") ++ "not markers".getBytes) === None)
  }

  test("expression path (codegen): struct fields and nulls through SQL") {
    val rows = Seq(
      Row(1L, png(800, 600)),
      Row(2L, jpegMultiSeg(320, 240)),
      Row(3L, "junk".getBytes),
      Row(4L, null))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2),
      StructType(Seq(StructField("id", LongType), StructField("img", BinaryType))))
    val out = df.select(col("id"), graft.plans.VectorExpressions.imgMeta(col("img")).as("m"))
      .select(col("id"), col("m.format"), col("m.width"), col("m.height"))
      .orderBy(col("id")).collect()
    assert(out(0).getString(1) === "png" && out(0).getInt(2) === 800 && out(0).getInt(3) === 600)
    assert(out(1).getString(1) === "jpeg" && out(1).getInt(2) === 320 && out(1).getInt(3) === 240)
    assert(out(2).isNullAt(1) && out(2).isNullAt(2) && out(2).isNullAt(3))
    assert(out(3).isNullAt(1))
  }

  test("registered query round-trips its constructed headers at sf0.001") {
    val out = graft.operators.Multimodal.imageMeta(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val id = r.getLong(0)
      if (id % 97 == 0) {
        assert(r.isNullAt(2), s"doc $id: corrupt payload must parse null")
      } else {
        val want = (id % 4) match {
          case 0 => "png"; case 1 => "jpeg"; case 2 => "webp"; case _ => "tiff"
        }
        assert(r.getString(2) === want, s"doc $id")
        assert(r.getInt(3) === (id % 1021 + 16).toInt, s"doc $id width")
        assert(r.getInt(4) === ((id * 7) % 739 + 16).toInt, s"doc $id height")
      }
    }
    // and the fixture must exercise every branch
    assert(out.exists(_.getLong(0) % 97 == 0))
    for (f <- Seq("png", "jpeg", "webp", "tiff"))
      assert(out.exists(r => !r.isNullAt(2) && r.getString(2) == f), s"no $f row")
  }

  test("five-way magic-byte dispatch routes every format, GIF included") {
    import spark.implicits._
    def hx(s: String): Array[Byte] =
      s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    val gif = "GIF89a".getBytes ++ hx("2C01") ++ hx("9600") ++ hx("000000") // 300x150
    val png = hx("89504E470D0A1A0A" + "0000000D" + "49484452" +
      "00000010" + "00000020" + "0806000000" + "00000000") // 16x32
    val wav = "RIFF".getBytes ++ hx("24000000") ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ hx("10000000" + "0100" + "0200" + "80BB0000" +
        "00EE0200" + "0400" + "1000") // 2ch 48000Hz 16bit
    val junk = "not media at all".getBytes
    // WebP (VP8X flavor): RIFF....WEBP routes to the image branch
    val webp = "RIFF".getBytes ++ hx("1A000000") ++ "WEBP".getBytes ++
      "VP8X".getBytes ++ hx("0E000000") ++ hx("10000000") ++
      hx("1F0300") ++ hx("570200") // 800x600
    val rows = graft.operators.Multimodal.dispatchSelect(
      Seq((1L, gif), (2L, png), (3L, wav), (4L, junk), (5L, webp))
        .toDF("doc_id", "payload"), "payload")
      .orderBy("doc_id").collect()
    assert(rows(0).getString(2) === "gif")
    assert(rows(0).getInt(3) === 300 && rows(0).getInt(4) === 150)
    assert(rows(1).getString(2) === "png")
    assert(rows(1).getInt(3) === 16 && rows(1).getInt(4) === 32)
    assert(rows(2).getString(2) === "wav")
    assert(rows(2).getInt(5) === 2 && rows(2).getInt(6) === 48000)
    assert(rows(3).isNullAt(2), "junk must not claim a media type")
    assert(rows(4).getString(2) === "webp")
    assert(rows(4).getInt(3) === 800 && rows(4).getInt(4) === 600)
  }

  test("GIF: signature/version gate, LE16 dims, truncation and zero dims rejected") {
    def hx(s: String): Array[Byte] =
      s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    def gif(ver: String, w: Int, h: Int): Array[Byte] =
      s"GIF$ver".getBytes ++
        Array((w & 0xFF).toByte, (w >> 8).toByte, (h & 0xFF).toByte, (h >> 8).toByte) ++
        hx("000000")
    val g = graft.plans.GifMeta.parse(gif("89a", 300, 77))
    assert(g != null)
    assert(g.getString(0) === "89a")
    assert(g.getInt(1) === 300 && g.getInt(2) === 77)
    assert(graft.plans.GifMeta.parse(gif("87a", 65535, 1)).getString(0) === "87a")
    assert(graft.plans.GifMeta.parse(gif("88a", 5, 5)) == null, "unknown version")
    assert(graft.plans.GifMeta.parse(gif("89a", 0, 5)) == null, "zero width")
    assert(graft.plans.GifMeta.parse(gif("89a", 5, 5).take(12)) == null, "truncated")
    assert(graft.plans.GifMeta.parse("NOTGIF".getBytes ++ hx("00000000000000")) == null)
  }
}
