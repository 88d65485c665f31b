package graft

/** plans.JpegPixels / plans.JpegEncode: the baseline-DCT pixel decode
  * pair. The encoder writes fully valid grayscale JPEGs (real forward
  * DCT, Annex-K Huffman, byte stuffing, optional restart markers); the
  * per-block-constant fixture images survive the lossy codec EXACTLY
  * (DC-only blocks, quantizer 8), so the decoder must invert Huffman +
  * DC prediction + dequant + IDCT + edge cropping bit-exactly or the
  * sums drift. Gradient images (every AC path live) are checked
  * differentially against the JDK's own ImageIO decoder. Hostile cases
  * cover what a 100 TB crawl scan will meet: truncations, bit flips,
  * progressive/multi-component files out of scope. */
class JpegSpec extends SparkSpec {

  private def expected(w: Int, h: Int, seed: Long): Long = {
    var s = 0L
    for (y <- 0 until h; x <- 0 until w)
      s += java.lang.Math.floorMod(seed + 5L * (x / 8) + 11L * (y / 8), 256L)
    s
  }

  private def parsed(b: Array[Byte]): Option[(Int, Int, Long, Long, Long, Long)] =
    Option(graft.plans.JpegPixels.parse(b)).map(r =>
      (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))

  test("blocky encode -> decode round-trips exact sums, with and without restarts") {
    for {
      seed <- Seq(0L, 7L, 123L, 99999L)
      rst <- Seq(false, true)
      (w, h) <- Seq((9, 9), (16, 16), (31, 27), (8, 24), (23, 10), (1, 1))
    } {
      val jpg = graft.plans.JpegEncode.encodeBlocky(w, h, seed, rst)
      assert(jpg != null)
      val s = expected(w, h, seed)
      assert(parsed(jpg) === Some((w, h, s, s, s, w.toLong * h)),
        s"seed=$seed rst=$rst w=$w h=$h")
    }
  }

  test("restart encoding really emits RSTn markers (the path is live)") {
    val jpg = graft.plans.JpegEncode.encodeBlocky(31, 27, 5L, restartRows = true)
    val rsts = jpg.indices.dropRight(1).count(i =>
      (jpg(i) & 0xFF) == 0xFF && (jpg(i + 1) & 0xFF) >= 0xD0 && (jpg(i + 1) & 0xFF) <= 0xD7)
    // 4 MCU rows (h=27) -> 3 interior restart boundaries
    assert(rsts === 3, s"expected 3 restart markers, found $rsts")
  }

  test("gradient images (AC coefficients live) agree with the JDK's ImageIO decoder") {
    for ((w, h, seed) <- Seq((24, 17, 1), (40, 33, 42), (16, 16, 7))) {
      val pix = (x: Int, y: Int) =>
        java.lang.Math.floorMod(x * x + 3L * y * seed + x * y / 5 + 11 * y, 256L).toInt
      val jpg = graft.plans.JpegEncode.encode(w, h, pix, 0)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpg))
      assert(img != null, "ImageIO could not decode the encoder's output")
      assert(img.getWidth === w && img.getHeight === h)
      var ref = 0L
      var maxDiff = 0
      // per-pixel reference check needs per-pixel output; the stats
      // expression only sums, so bound the SUM: two spec-compliant
      // IDCTs differ by at most 1 per pixel each (ISO 10918-1 accuracy)
      for (y <- 0 until h; x <- 0 until w)
        ref += img.getRaster.getSample(x, y, 0)
      val mine = parsed(jpg).get
      assert(mine._1 === w && mine._2 === h)
      assert(math.abs(mine._3 - ref) <= 2L * w * h,
        s"sum diverged from ImageIO: mine=${mine._3} ref=$ref w=$w h=$h")
      maxDiff = math.abs(mine._3 - ref).toInt
      info(s"${w}x$h seed=$seed: |sumDiff|=$maxDiff over ${w * h} px")
    }
  }

  test("hostile bytes decode to NULL, never throw") {
    assert(graft.plans.JpegPixels.parse("definitely not a jpeg".getBytes("UTF-8")) === null)
    assert(graft.plans.JpegPixels.parse(Array[Byte](0xFF.toByte, 0xD8.toByte)) === null)
    assert(graft.plans.JpegPixels.parse(Array.emptyByteArray) === null)
    val good = graft.plans.JpegEncode.encodeBlocky(17, 12, 5L, restartRows = true)
    // every truncation must be total (null, not a throw)
    var i = 0
    while (i < good.length) {
      graft.plans.JpegPixels.parse(java.util.Arrays.copyOf(good, i))
      i += 1
    }
    // bit flips through header and entropy stream: total, never a throw
    // (a flipped entropy bit may still decode — to different sums)
    for (j <- 2 until good.length by 3) {
      val bad = good.clone()
      bad(j) = (bad(j) ^ 0x5A).toByte
      graft.plans.JpegPixels.parse(bad)
    }
    // progressive (SOF2) is out of scope -> null
    val sof = good.indices.find(k =>
      (good(k) & 0xFF) == 0xFF && (good(k + 1) & 0xFF) == 0xC0).get
    val prog = good.clone()
    prog(sof + 1) = 0xC2.toByte
    assert(graft.plans.JpegPixels.parse(prog) === null)
    // geometry lie past the pixel ceiling -> null before any work
    val big = good.clone()
    // SOF payload: len(2) precision(1) then h, w big-endian
    big(sof + 5) = 0xFF.toByte; big(sof + 6) = 0xFF.toByte
    big(sof + 7) = 0xFF.toByte; big(sof + 8) = 0xFF.toByte
    assert(graft.plans.JpegPixels.parse(big) === null)
  }

  test("mm_jpeg_pixels serves decoded stats with corrupt docs as NULL") {
    val df = graft.operators.Multimodal.jpegPixelsQ(spark, sf)
    val rows = df.collect()
    assert(rows.length > 0)
    val corrupt = rows.filter(_.getLong(0) % 109 == 0)
    assert(corrupt.nonEmpty && corrupt.forall(_.isNullAt(1)),
      "corrupt docs must surface NULL stats")
    val good = rows.filter(r => r.getLong(0) % 109 != 0)
    assert(good.forall(!_.isNullAt(1)), "every valid doc must decode")
    // spot-check one doc against the closed form
    val r0 = good.head
    val id = r0.getLong(0)
    val (w, h) = ((id % 23 + 9).toInt, ((id * 3) % 19 + 9).toInt)
    assert(r0.getInt(1) === w && r0.getInt(2) === h)
    assert(r0.getLong(3) === expected(w, h, id))
  }
}
