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

  private def clampRgb(x: Double): Long = {
    val s = math.floor(x + 0.5).toInt
    if (s < 0) 0L else if (s > 255) 255L else s.toLong
  }

  /** Per-pixel reference of the color fixture's decoded channel sums:
    * the chroma sample for pixel px is px div hs (replication), whose
    * block is px div (8*hs) — the same composition the oracle uses. */
  private def expectedColor(w: Int, h: Int, seed: Long, mode: Int): (Long, Long, Long) = {
    val (hs, vs) = mode match { case 0 => (1, 1); case 1 => (2, 1); case _ => (2, 2) }
    expectedColorHV(w, h, seed, hs, vs)
  }

  private def expectedColorHV(w: Int, h: Int, seed: Long,
      hs: Int, vs: Int): (Long, Long, Long) = {
    var sr = 0L; var sg = 0L; var sb = 0L
    for (py <- 0 until h; px <- 0 until w) {
      val y = java.lang.Math.floorMod(seed + 5L * (px / 8) + 11L * (py / 8), 256L).toInt
      val cbx = px / (8 * hs); val cby = py / (8 * vs)
      val cb = java.lang.Math.floorMod(3L * seed + 7L * cbx + 13L * cby + 64L, 256L).toInt
      val cr = java.lang.Math.floorMod(5L * seed + 3L * cbx + 17L * cby + 128L, 256L).toInt
      sr += clampRgb(y + 1.402 * (cr - 128))
      sg += clampRgb(y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128))
      sb += clampRgb(y + 1.772 * (cb - 128))
    }
    (sr, sg, sb)
  }

  test("color blocky encode -> decode round-trips exact sums across 4:4:4/4:2:2/4:2:0") {
    for {
      seed <- Seq(0L, 7L, 123L, 99999L)
      mode <- Seq(0, 1, 2)
      rst <- Seq(false, true)
      (w, h) <- Seq((9, 9), (16, 16), (31, 27), (8, 24), (23, 10), (1, 1), (17, 9))
    } {
      val jpg = graft.plans.JpegEncode.encodeBlockyColor(w, h, seed, mode, rst)
      assert(jpg != null)
      val (sr, sg, sb) = expectedColor(w, h, seed, mode)
      assert(parsed(jpg) === Some((w, h, sr, sg, sb, w.toLong * h)),
        s"seed=$seed mode=$mode rst=$rst w=$w h=$h")
    }
  }

  test("color gradients agree with the JDK's ImageIO decoder") {
    // 4:4:4 with full gradients in all three planes (no upsampling →
    // only IDCT + conversion rounding differ), and subsampled modes
    // with CONSTANT chroma (any spec upsampler — replication or
    // libjpeg's triangle filter — reproduces a constant exactly, so
    // the differential isolates the interleave/IDCT path)
    val cases = Seq(
      (24, 17, 1, 1, true), (40, 33, 2, 1, true), (16, 16, 1, 1, true),
      (24, 17, 2, 1, false), (40, 33, 2, 2, false), (31, 27, 2, 2, false))
    for ((w, h, hs, vs, chromaGrad) <- cases) {
      val yF = (x: Int, y: Int) =>
        java.lang.Math.floorMod(x * x + 3L * y + x * y / 5 + 11 * y, 256L).toInt
      val cbF = (x: Int, y: Int) =>
        if (chromaGrad) java.lang.Math.floorMod(90L + 2 * x + 3 * y, 256L).toInt else 100
      val crF = (x: Int, y: Int) =>
        if (chromaGrad) java.lang.Math.floorMod(150L + 3 * x + 2 * y, 256L).toInt else 160
      val jpg = graft.plans.JpegEncode.encodeColor(w, h, yF, cbF, crF, hs, vs, 0)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpg))
      assert(img != null, "ImageIO could not decode the color encoder's output")
      assert(img.getWidth === w && img.getHeight === h)
      var refR = 0L; var refG = 0L; var refB = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val rgb = img.getRGB(x, y)
        refR += (rgb >> 16) & 0xFF; refG += (rgb >> 8) & 0xFF; refB += rgb & 0xFF
      }
      val mine = parsed(jpg).get
      assert(mine._1 === w && mine._2 === h)
      // two spec-compliant IDCTs differ by <=1/px; YCbCr->RGB rounding
      // differs by <=1/px more per channel (libjpeg is fixed-point)
      val tol = 3L * w * h
      assert(math.abs(mine._3 - refR) <= tol, s"R diverged: ${mine._3} vs $refR ($w x $h)")
      assert(math.abs(mine._4 - refG) <= tol, s"G diverged: ${mine._4} vs $refG ($w x $h)")
      assert(math.abs(mine._5 - refB) <= tol, s"B diverged: ${mine._5} vs $refB ($w x $h)")
      info(s"${w}x$h ${hs}x$vs chromaGrad=$chromaGrad: " +
        s"|dR|=${math.abs(mine._3 - refR)} |dG|=${math.abs(mine._4 - refG)} " +
        s"|dB|=${math.abs(mine._5 - refB)} over ${w * h} px")
    }
  }

  test("progressive blocky encode -> decode round-trips exact sums (gray + color)") {
    for {
      seed <- Seq(0L, 7L, 99999L)
      rst <- Seq(false, true)
      mode <- Seq(0, 1, 2, 3, 4) // incl. 4 = 4:4:0 (1x2 subsampling)
      (w, h) <- Seq((9, 9), (31, 27), (16, 16), (23, 10))
    } {
      val jpg = graft.plans.JpegEncode.encodeBlockyProgressive(w, h, seed, mode, rst)
      assert(jpg != null, s"encode null: seed=$seed mode=$mode rst=$rst $w x $h")
      // really SOF2
      assert(jpg.indices.exists(k =>
        (jpg(k) & 0xFF) == 0xFF && k + 1 < jpg.length && (jpg(k + 1) & 0xFF) == 0xC2))
      val got = parsed(jpg)
      if (mode == 3) {
        val s = expected(w, h, seed)
        assert(got === Some((w, h, s, s, s, w.toLong * h)),
          s"gray seed=$seed rst=$rst $w x $h")
      } else if (mode == 4) {
        // 4:4:0 shares 4:4:4 block values when h <= 8 only; recompute
        // from first principles via the driver-side reference instead
        val (er, eg, eb) = expectedColorHV(w, h, seed, 1, 2)
        assert(got === Some((w, h, er, eg, eb, w.toLong * h)),
          s"4:4:0 seed=$seed rst=$rst $w x $h")
      } else {
        val (er, eg, eb) = expectedColor(w, h, seed, mode)
        assert(got === Some((w, h, er, eg, eb, w.toLong * h)),
          s"color seed=$seed mode=$mode rst=$rst $w x $h")
      }
      // the JDK decoder agrees on the same bytes (third opinion on the
      // scan script's validity, not just self-consistency)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpg))
      assert(img != null && img.getWidth === w && img.getHeight === h,
        s"ImageIO rejected the progressive stream (mode=$mode rst=$rst)")
    }
  }

  test("progressive restart encoding really emits per-scan RSTn markers") {
    val jpg = graft.plans.JpegEncode.encodeBlockyProgressive(31, 27, 5L, 3, restartRows = true)
    val rsts = jpg.indices.dropRight(1).count(i =>
      (jpg(i) & 0xFF) == 0xFF && (jpg(i + 1) & 0xFF) >= 0xD0 && (jpg(i + 1) & 0xFF) <= 0xD7)
    // 4 block rows (h=27, interval = 4 blocks/row): 3 interior
    // boundaries per scan x 6 scans (gray script: DC first, 2 banded
    // AC first, 2 AC refine, DC refine)
    assert(rsts === 18, s"expected 18 restart markers, found $rsts")
  }

  test("hostile progressive bytes decode to NULL, never throw") {
    val good = graft.plans.JpegEncode.encodeBlockyProgressive(17, 12, 5L, 2, restartRows = true)
    var i = 0
    while (i < good.length) {
      graft.plans.JpegPixels.parse(java.util.Arrays.copyOf(good, i))
      i += 1
    }
    for (j <- 2 until good.length by 3) {
      val bad = good.clone()
      bad(j) = (bad(j) ^ 0x5A).toByte
      graft.plans.JpegPixels.parse(bad)
    }
    // geometry past the progressive ceiling refuses up front
    val sof = good.indices.find(k =>
      (good(k) & 0xFF) == 0xFF && (good(k + 1) & 0xFF) == 0xC2).get
    val huge = good.clone()
    huge(sof + 5) = 0x7F.toByte; huge(sof + 6) = 0xFF.toByte // h = 32767
    huge(sof + 7) = 0x7F.toByte; huge(sof + 8) = 0xFF.toByte // w = 32767
    assert(graft.plans.JpegPixels.parse(huge) === null)
  }

  test("zero-dimension progressive headers return NULL (baseline triage parity)") {
    val good = graft.plans.JpegEncode.encodeBlockyProgressive(17, 12, 5L, 3, restartRows = false)
    val sof = good.indices.find(k =>
      (good(k) & 0xFF) == 0xFF && (good(k + 1) & 0xFF) == 0xC2).get
    val zw = good.clone()
    zw(sof + 7) = 0; zw(sof + 8) = 0 // w = 0
    assert(graft.plans.JpegPixels.parse(zw) === null)
    val zh = good.clone()
    zh(sof + 5) = 0; zh(sof + 6) = 0 // h = 0
    assert(graft.plans.JpegPixels.parse(zh) === null)
  }

  test("a progressive scan-count bomb returns NULL; a few extra scans stay exact") {
    // gray script ends with a DC refinement scan, which is idempotent
    // under repetition (each pass re-ORs the same approximation bit),
    // so splicing copies of the final scan keeps the stream decodable
    // until the scan budget (64 * nComp) trips
    val good = graft.plans.JpegEncode.encodeBlockyProgressive(17, 12, 5L, 3, restartRows = false)
    assert((good(good.length - 2) & 0xFF) == 0xFF && (good.last & 0xFF) == 0xD9)
    val lastSos = (good.length - 2 to 0 by -1).find(k =>
      (good(k) & 0xFF) == 0xFF && (good(k + 1) & 0xFF) == 0xDA).get
    val span = java.util.Arrays.copyOfRange(good, lastSos, good.length - 2)
    def spliced(copies: Int): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(good, 0, good.length - 2)
      for (_ <- 0 until copies) out.write(span)
      out.write(0xFF); out.write(0xD9)
      out.toByteArray
    }
    // 6 base scans + 70 copies > 64-scan gray budget -> NULL, no throw
    assert(graft.plans.JpegPixels.parse(spliced(70)) === null)
    // 3 copies stay within budget and decode to the exact sums
    val s = expected(17, 12, 5L)
    assert(parsed(spliced(3)) === Some((17, 12, s, s, s, 17L * 12)))
  }

  test("randomized progressive scan scripts all decode to the exact sums (seeded)") {
    val rnd = new scala.util.Random(20260814L)
    for (trial <- 0 until 30) {
      val mode = rnd.nextInt(5) // 0..2 color, 3 gray, 4 = 4:4:0
      val nComp = if (mode == 3) 1 else 3
      val w = 9 + rnd.nextInt(20); val h = 9 + rnd.nextInt(16)
      val seed = rnd.nextLong() % 100000L
      // build a random VALID successive-approximation script:
      //  - DC: one interleaved first scan at Al in 0..2, refines to 0
      //  - per component: 1..3 AC bands over 1..63, each first-coded at
      //    Al in 0..1 and refined to 0; within a refinement layer the
      //    scan order is shuffled
      val dcAl = rnd.nextInt(3)
      val script = scala.collection.mutable.ArrayBuffer.empty[(Seq[Int], Int, Int, Int, Int)]
      script += ((0 until nComp, 0, 0, 0, dcAl))
      val acChains = (0 until nComp).flatMap { c =>
        val nBands = 1 + rnd.nextInt(3)
        val cuts = (Seq(1, 64) ++ Seq.fill(nBands - 1)(2 + rnd.nextInt(62)))
          .distinct.sorted
        cuts.sliding(2).map { case Seq(lo, hi) =>
          (c, lo, hi - 1, rnd.nextInt(2))
        }.toSeq
      }
      // AC first passes (shuffled)
      rnd.shuffle(acChains).foreach { case (c, ss, se, al) =>
        script += ((Seq(c), ss, se, 0, al))
      }
      // refinement layers: every chain with al>0 refines down to 0
      val maxAl = (acChains.map(_._4) :+ dcAl).max
      for (lvl <- maxAl to 1 by -1) {
        val layer = acChains.filter(_._4 >= lvl).map { case (c, ss, se, _) =>
          ((Seq(c), ss, se, lvl, lvl - 1)): (Seq[Int], Int, Int, Int, Int)
        } ++ (if (dcAl >= lvl) Seq(((0 until nComp, 0, 0, lvl, lvl - 1))
          : (Seq[Int], Int, Int, Int, Int)) else Seq.empty)
        rnd.shuffle(layer).foreach(script += _)
      }
      val jpg = graft.plans.JpegEncode.encodeBlockyProgressiveScript(
        w, h, seed, mode, script.toSeq)
      assert(jpg != null, s"trial $trial: encoder refused script $script")
      val got = parsed(jpg)
      val want =
        if (mode == 3) { val s = expected(w, h, seed); (s, s, s) }
        else if (mode == 4) expectedColorHV(w, h, seed, 1, 2)
        else expectedColor(w, h, seed, mode)
      assert(got === Some((w, h, want._1, want._2, want._3, w.toLong * h)),
        s"trial $trial diverged: mode=$mode $w x $h seed=$seed dcAl=$dcAl " +
          s"script=${script.mkString(";")}")
    }
  }

  /** ImageIO writes a PROGRESSIVE (SOF2) JPEG of the given image —
    * the JDK writer's default progressive scan script is libjpeg's
    * successive-approximation sequence (DC 0,1 + banded AC first
    * passes at Al=2 + AC/DC refinement scans down to Al=0), so this
    * exercises spectral selection, EOB runs, AND real AC correction
    * bits — paths a hand fixture with constant blocks cannot reach. */
  private def imageIoProgressive(img: java.awt.image.BufferedImage): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val param = writer.getDefaultWriteParam
    param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    ios.close(); writer.dispose()
    out.toByteArray
  }

  test("progressive gray JPEGs (ImageIO-written) decode within IDCT tolerance") {
    for ((w, h, seed) <- Seq((24, 17, 1), (40, 33, 42), (16, 16, 7), (9, 9, 3))) {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      for (y <- 0 until h; x <- 0 until w)
        img.getRaster.setSample(x, y, 0,
          java.lang.Math.floorMod(x * x + 3L * y * seed + x * y / 5 + 11 * y, 256L).toInt)
      val jpg = imageIoProgressive(img)
      // really progressive: the stream carries SOF2
      assert(jpg.indices.exists(k =>
        (jpg(k) & 0xFF) == 0xFF && k + 1 < jpg.length && (jpg(k + 1) & 0xFF) == 0xC2),
        "ImageIO did not emit SOF2 — progressive path untested")
      val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpg))
      var refSum = 0L
      for (y <- 0 until h; x <- 0 until w)
        refSum += ref.getRaster.getSample(x, y, 0)
      val mine = parsed(jpg)
      assert(mine.isDefined, s"progressive decode returned NULL ($w x $h)")
      assert(mine.get._1 === w && mine.get._2 === h)
      assert(math.abs(mine.get._3 - refSum) <= 2L * w * h,
        s"progressive sum diverged: mine=${mine.get._3} ref=$refSum ($w x $h)")
      info(s"${w}x$h: |sumDiff|=${math.abs(mine.get._3 - refSum)} over ${w * h} px")
    }
  }

  test("progressive color JPEGs (ImageIO-written) decode within tolerance") {
    for ((w, h) <- Seq((24, 17), (40, 33), (31, 27))) {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      for (y <- 0 until h; x <- 0 until w) {
        val r = java.lang.Math.floorMod(x * x + 11L * y, 256L).toInt
        val g = java.lang.Math.floorMod(90L + 2 * x + 3 * y, 256L).toInt
        val b = java.lang.Math.floorMod(150L + 3 * x * y, 256L).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
      }
      val jpg = imageIoProgressive(img)
      assert(jpg.indices.exists(k =>
        (jpg(k) & 0xFF) == 0xFF && k + 1 < jpg.length && (jpg(k + 1) & 0xFF) == 0xC2))
      val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpg))
      var refR = 0L; var refG = 0L; var refB = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val rgb = ref.getRGB(x, y)
        refR += (rgb >> 16) & 0xFF; refG += (rgb >> 8) & 0xFF; refB += rgb & 0xFF
      }
      val mine = parsed(jpg)
      assert(mine.isDefined, s"progressive color decode returned NULL ($w x $h)")
      assert(mine.get._1 === w && mine.get._2 === h)
      // subsampled chroma upsampling differs between replication (mine)
      // and libjpeg's triangle filter on gradients — bound loosely; the
      // EXACT certification is the constant-block oracle fixture
      val tol = 9L * w * h
      assert(math.abs(mine.get._3 - refR) <= tol, s"R: ${mine.get._3} vs $refR")
      assert(math.abs(mine.get._4 - refG) <= tol, s"G: ${mine.get._4} vs $refG")
      assert(math.abs(mine.get._5 - refB) <= tol, s"B: ${mine.get._5} vs $refB")
      info(s"${w}x$h: |dR|=${math.abs(mine.get._3 - refR)} " +
        s"|dG|=${math.abs(mine.get._4 - refG)} |dB|=${math.abs(mine.get._5 - refB)}")
    }
  }

  test("hostile color bytes decode to NULL, never throw") {
    val good = graft.plans.JpegEncode.encodeBlockyColor(17, 12, 5L, 2, restartRows = true)
    var i = 0
    while (i < good.length) {
      graft.plans.JpegPixels.parse(java.util.Arrays.copyOf(good, i))
      i += 1
    }
    for (j <- 2 until good.length by 3) {
      val bad = good.clone()
      bad(j) = (bad(j) ^ 0x5A).toByte
      graft.plans.JpegPixels.parse(bad)
    }
    // exotic sampling factors (3x1 luma) are out of scope -> null
    val sof = good.indices.find(k =>
      (good(k) & 0xFF) == 0xFF && (good(k + 1) & 0xFF) == 0xC0).get
    val exotic = good.clone()
    exotic(sof + 11) = 0x31.toByte // component 0 sampling 3x1
    assert(graft.plans.JpegPixels.parse(exotic) === null)
  }

  test("mm_jpeg_color serves decoded color stats with corrupt docs as NULL") {
    val df = graft.operators.Multimodal.jpegColorQ(spark, sf)
    val rows = df.collect()
    assert(rows.length > 0)
    val corrupt = rows.filter(_.getLong(0) % 109 == 0)
    assert(corrupt.nonEmpty && corrupt.forall(_.isNullAt(1)),
      "corrupt docs must surface NULL stats")
    val good = rows.filter(r => r.getLong(0) % 109 != 0)
    assert(good.forall(!_.isNullAt(1)), "every valid color doc must decode")
    // spot-check docs of each subsampling mode against the closed form
    for (mode <- 0 to 2) {
      val r0 = good.find(_.getLong(0) % 3 == mode).get
      val id = r0.getLong(0)
      val (w, h) = ((id % 23 + 9).toInt, ((id * 3) % 19 + 9).toInt)
      val (sr, sg, sb) = expectedColor(w, h, id, mode)
      assert(r0.getInt(1) === w && r0.getInt(2) === h)
      assert((r0.getLong(3), r0.getLong(4), r0.getLong(5)) === ((sr, sg, sb)),
        s"doc $id mode $mode")
    }
  }

  test("12-bit extended sequential (SOF1): blocky round-trip, restarts, hostile precisions") {
    import graft.plans.{JpegEncode, JpegPixels}
    for {
      (w, h) <- Seq((1, 1), (9, 7), (16, 11), (23, 27), (8, 8))
      rst <- Seq(false, true)
    } {
      val seed = 31L * w + h + (if (rst) 7 else 0)
      val j = JpegEncode.encodeBlocky12(w, h, seed, rst)
      assert(j != null, s"12-bit encode failed w=$w h=$h rst=$rst")
      val r = JpegPixels.parse(j)
      assert(r != null, s"12-bit parse refused w=$w h=$h rst=$rst")
      var sg = 0L
      for (y <- 0 until h; x <- 0 until w)
        sg += java.lang.Math.floorMod(seed + 5L * (x / 8) + 11L * (y / 8), 4096L)
      assert(r.getInt(0) === w && r.getInt(1) === h)
      // constant blocks are lossless at 12 bits exactly as at 8: the
      // flat quantizer 8 divides DC = 8*(v-2048); gray replicates
      assert(r.getLong(2) === sg && r.getLong(3) === sg && r.getLong(4) === sg,
        s"12-bit sums diverge w=$w h=$h rst=$rst")
      // samples above 255 actually occur (the depth is load-bearing)
      assert(sg > 255L * w * h || seed % 4096 < 256,
        s"fixture degenerated to 8-bit range w=$w h=$h")
    }
    // hostile precision bytes: SOF1 admits 8 or 12 ONLY; SOF0/SOF2 8 only
    val good = JpegEncode.encodeBlocky12(16, 16, 5L, false)
    val sofAt = (0 until good.length - 1).find(i =>
      (good(i) & 0xFF) == 0xFF && (good(i + 1) & 0xFF) == 0xC1).get
    for (bad <- Seq(10, 16)) {
      val c = good.clone(); c(sofAt + 4) = bad.toByte
      assert(JpegPixels.parse(c) == null, s"SOF1 precision $bad accepted")
    }
    val asSof0 = good.clone(); asSof0(sofAt + 1) = 0xC0.toByte
    assert(JpegPixels.parse(asSof0) == null, "SOF0 must stay 8-bit only")
    // truncations never throw
    for (n <- 0 until good.length by 7)
      assert(JpegPixels.parse(good.take(n)) == null || n >= good.length - 2)
  }

  test("mm_jpeg12 serves decoded 12-bit stats with corrupt docs as NULL") {
    val rows = graft.operators.Multimodal.jpeg12Q(spark, sf).collect()
    assert(rows.length > 0)
    val corrupt = rows.filter(_.getLong(0) % 157 == 0)
    assert(corrupt.nonEmpty && corrupt.forall(_.isNullAt(1)),
      "corrupt docs must surface NULL stats")
    val good = rows.filter(r => r.getLong(0) % 157 != 0)
    assert(good.forall(!_.isNullAt(1)), "every valid 12-bit doc must decode")
    val r0 = good.maxBy(_.getLong(0))
    val id = r0.getLong(0)
    val (w, h) = ((id % 23 + 9).toInt, ((id * 3) % 19 + 9).toInt)
    var sg = 0L
    for (y <- 0 until h; x <- 0 until w)
      sg += java.lang.Math.floorMod(id + 5L * (x / 8) + 11L * (y / 8), 4096L)
    assert(r0.getInt(1) === w && r0.getInt(2) === h && r0.getLong(3) === sg)
  }

  test("lossless (SOF3) decodes exactly across all seven predictors and 8/12/16-bit depths") {
    import graft.plans.{JpegEncode, JpegPixels}
    for {
      (w, h) <- Seq((1, 1), (9, 7), (16, 11), (2, 31))
      nComp <- Seq(1, 3)
      pred <- 1 to 7
      prec <- Seq(8, 12, 16)
    } {
      def m(v: Long) = java.lang.Math.floorMod(v, 1L << prec)
      val seed = 13L * w + h + pred + 1000L * prec
      val jll = JpegEncode.encodeLossless(w, h, seed, nComp, pred, prec)
      assert(jll != null)
      val r = JpegPixels.parse(jll)
      assert(r != null, s"lossless refused w=$w h=$h nComp=$nComp pred=$pred prec=$prec")
      var sr = 0L; var sg = 0L; var sb = 0L
      for (y <- 0 until h; x <- 0 until w) {
        if (nComp == 1) {
          val g = m(seed + 5L * x + 3L * y); sr += g; sg += g; sb += g
        } else {
          sr += m(seed + 3L * x + 7L * y)
          sg += m(2L * seed + 5L * x + y)
          sb += m(3L * seed + x + 11L * y)
        }
      }
      assert(r.getInt(0) === w && r.getInt(1) === h)
      // LOSSLESS: decoded sums equal the pixel-formula sums (mod
      // 2^prec) with no codec arithmetic — and therefore agree ACROSS
      // predictors AND depths, the internal differential; the 12/16-bit
      // paths exercise large wrapped differences up to the no-bits
      // category-16 symbol
      assert(r.getLong(2) === sr && r.getLong(3) === sg && r.getLong(4) === sb,
        s"lossless sums diverge w=$w h=$h nComp=$nComp pred=$pred prec=$prec")
    }
  }

  test("lossless hostile inputs are NULL, never throw") {
    import graft.plans.{JpegEncode, JpegPixels}
    val good = JpegEncode.encodeLossless(11, 9, 7L, 3, 4)
    assert(JpegPixels.parse(good) != null)
    // every cut inside the entropy stream must refuse; only the
    // trailing EOI (which the decoder never needs) may go missing
    for (n <- 0 until good.length - 2)
      assert(JpegPixels.parse(good.take(n)) == null, s"prefix $n accepted")
    // bad predictor selector (0 and 8)
    for (bad <- Seq(0, 8)) {
      val c = good.clone()
      // SOS layout: FF DA len(2) Ns comps(2*3) Ss — Ss at marker + 11
      val at = (0 until c.length - 1).find(i =>
        (c(i) & 0xFF) == 0xFF && (c(i + 1) & 0xFF) == 0xDA).get
      c(at + 11) = bad.toByte
      assert(JpegPixels.parse(c) == null, s"predictor $bad accepted")
    }
    // out-of-range precisions decline (lossless admits 2..16)
    val sofAt = (0 until good.length - 1).find(i =>
      (good(i) & 0xFF) == 0xFF && (good(i + 1) & 0xFF) == 0xC3).get
    for (bad <- Seq(1, 17)) {
      val cp = good.clone()
      cp(sofAt + 4) = bad.toByte
      assert(JpegPixels.parse(cp) == null, s"precision $bad accepted")
    }
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

  test("lossless randomized geometry/predictor sweep") {
    import graft.plans.{JpegEncode, JpegPixels}
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 120) {
      val w = 1 + rnd.nextInt(48); val h = 1 + rnd.nextInt(24)
      val nc = if (rnd.nextBoolean()) 1 else 3
      val pred = 1 + rnd.nextInt(7)
      val prec = Seq(8, 12, 16)(rnd.nextInt(3))
      val seed = rnd.nextInt(100000).toLong
      val j = JpegEncode.encodeLossless(w, h, seed, nc, pred, prec)
      val r = JpegPixels.parse(j)
      assert(r != null, s"trial $trial refused (w=$w h=$h nc=$nc pred=$pred prec=$prec)")
      var sr = 0L
      for (y <- 0 until h; x <- 0 until w)
        sr += (if (nc == 1) java.lang.Math.floorMod(seed + 5L * x + 3L * y, 1L << prec)
               else java.lang.Math.floorMod(seed + 3L * x + 7L * y, 1L << prec))
      assert(r.getLong(2) === sr, s"trial $trial sums diverge (w=$w h=$h nc=$nc pred=$pred prec=$prec)")
    }
  }
}
