package graft

import org.apache.spark.sql.functions._

import graft.plans.{WavEncode, WavPcm}

/** PCM sample decode: encoder round trip (sums/peak integer-exact),
  * format gates, hostile inputs, codegen path. */
class AudioPcmSpec extends SparkSpec {

  test("24-bit PCM decodes with exact sign-extended sums") {
    for ((n, ch, seed) <- Seq((64, 1, 3L), (200, 2, 42L), (1, 2, 0L))) {
      val wav = graft.plans.WavEncode.encode24(n, ch, seed)
      assert(wav != null)
      val r = graft.plans.WavPcm.parse(wav)
      assert(r != null, s"24-bit WAV refused (n=$n ch=$ch)")
      assert(r.getInt(0) === ch && r.getInt(1) === 48000 && r.getInt(2) === 24)
      assert(r.getLong(3) === n.toLong)
      var sl = 0L; var sr = 0L; var pk = 0
      for (i <- 0 until n; c <- 0 until ch) {
        val v = java.lang.Math.floorMod(seed + 131L * i + 37L * c, 16777216L).toInt - 8388608
        if (c == 0) sl += v else sr += v
        pk = math.max(pk, math.abs(v))
      }
      assert(r.getLong(4) === sl)
      if (ch == 2) assert(r.getLong(5) === sr) else assert(r.isNullAt(5))
      assert(r.getInt(6) === pk)
    }
    // truncation fuzz
    val good = graft.plans.WavEncode.encode24(50, 2, 9L)
    var i = 0
    while (i < good.length) {
      graft.plans.WavPcm.parse(java.util.Arrays.copyOf(good, i))
      i += 1
    }
  }

  test("encoder round trip: sums and peak match the sample formula") {
    for ((n, ch, seed) <- Seq((64, 1, 0L), (100, 2, 7L), (256, 2, 99999L))) {
      val wav = WavEncode.encode(n, ch, seed)
      assert(wav != null)
      val s = WavPcm.parse(wav)
      assert(s != null)
      assert(s.getInt(0) === ch && s.getInt(1) === 8000 && s.getInt(2) === 16)
      assert(s.getLong(3) === n.toLong)
      def sample(i: Int, c: Int): Int =
        java.lang.Math.floorMod(seed + 31L * i + 17L * c, 65536L).toInt - 32768
      val expL = (0 until n).map(sample(_, 0).toLong).sum
      assert(s.getLong(4) === expL)
      if (ch == 2) {
        val expR = (0 until n).map(sample(_, 1).toLong).sum
        assert(s.getLong(5) === expR)
      } else assert(s.isNullAt(5))
      val expPeak = (0 until n).flatMap(i =>
        (0 until ch).map(c => math.abs(sample(i, c)))).max
      assert(s.getInt(6) === expPeak)
    }
  }

  test("non-PCM formats and hostile inputs are NULL, never throw") {
    val wav = WavEncode.encode(64, 1, 5L)
    // format code flipped to 3 (IEEE float) → triage NULL
    val float = wav.clone()
    val fmtAt = (0 until wav.length - 4).find(i =>
      wav(i) == 'f' && wav(i + 1) == 'm' && wav(i + 2) == 't').get
    float(fmtAt + 8) = 3
    assert(WavPcm.parse(float) == null)
    assert(WavPcm.parse(wav.take(30)) == null) // truncated before data
    assert(WavPcm.parse("RIFF0000WAVE".getBytes) == null) // no chunks
    assert(WavPcm.parse(Array.emptyByteArray) == null)
    // truncated mid-data: decodes only whole frames that fit
    val cut = wav.take(wav.length - 3)
    val s = WavPcm.parse(cut)
    assert(s != null && s.getLong(3) === 62L) // 64 frames - 2 partial/cut
  }

  test("G.711 mu-law and A-law decode with exact linear sums") {
    for ((n, ch, seed, mu) <- Seq((64, 1, 3L, true), (200, 2, 42L, true),
        (64, 1, 3L, false), (200, 2, 42L, false), (1, 2, 0L, true))) {
      val wav = WavEncode.encodeG711(n, ch, seed, mu)
      assert(wav != null)
      val r = WavPcm.parse(wav)
      assert(r != null, s"G.711 WAV refused (n=$n ch=$ch mu=$mu)")
      assert(r.getInt(0) === ch && r.getInt(1) === 8000 && r.getInt(2) === 8)
      assert(r.getLong(3) === n.toLong)
      var sl = 0L; var sr = 0L; var pk = 0
      for (i <- 0 until n; c <- 0 until ch) {
        val code = java.lang.Math.floorMod(seed + 13L * i + 7L * c, 256L).toInt
        val v = if (mu) WavPcm.ulaw2linear(code) else WavPcm.alaw2linear(code)
        if (c == 0) sl += v else sr += v
        pk = math.max(pk, math.abs(v))
      }
      assert(r.getLong(4) === sl)
      if (ch == 2) assert(r.getLong(5) === sr) else assert(r.isNullAt(5))
      assert(r.getInt(6) === pk)
    }
  }

  test("the JDK's own G.711 converter agrees per sample, both laws") {
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    for (mu <- Seq(true, false)) {
      val n = 256 // every code value appears
      val wav = WavEncode.encodeG711(n, 1, 0L, mu)
      val ais = AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(wav))
      val pcm = AudioSystem.getAudioInputStream(
        AudioFormat.Encoding.PCM_SIGNED, ais)
      val be = pcm.getFormat.isBigEndian
      val bytes = pcm.readAllBytes()
      assert(bytes.length >= 2 * n, s"JDK converter returned ${bytes.length} bytes")
      for (i <- 0 until n) {
        val lo = bytes(2 * i + (if (be) 1 else 0)) & 0xFF
        val hi = bytes(2 * i + (if (be) 0 else 1)).toInt
        val jdk = (hi << 8) | lo
        val code = java.lang.Math.floorMod(13L * i, 256L).toInt
        val ours = if (mu) WavPcm.ulaw2linear(code) else WavPcm.alaw2linear(code)
        assert(jdk === ours, s"code=$code mu=$mu: jdk=$jdk ours=$ours")
      }
    }
  }

  test("IEEE-float WAVs decode with exact dyadic double sums") {
    import graft.plans.WavFloat
    for ((n, ch, seed) <- Seq((64, 1, 3L), (200, 2, 42L), (1, 2, 0L))) {
      val wav = WavFloat.encode(n, ch, seed)
      assert(wav != null)
      val r = WavFloat.parse(wav)
      assert(r != null, s"float WAV refused (n=$n ch=$ch)")
      assert(r.getInt(0) === ch && r.getInt(1) === 44100)
      assert(r.getLong(2) === n.toLong)
      var sl = 0.0; var sr = 0.0; var pk = 0.0
      for (i <- 0 until n; c <- 0 until ch) {
        val k = java.lang.Math.floorMod(seed + 29L * i + 11L * c, 65536L).toInt - 32768
        val v = k / 256.0
        if (c == 0) sl += v else sr += v
        pk = math.max(pk, math.abs(v))
      }
      assert(r.getDouble(3) === sl)
      if (ch == 2) assert(r.getDouble(4) === sr) else assert(r.isNullAt(4))
      assert(r.getDouble(5) === pk)
    }
    // NaN/Inf samples are corrupt, not averaged in
    val bad = WavFloat.encode(8, 1, 5L)
    val dataAt = (0 until bad.length - 4).find(i =>
      bad(i) == 'd' && bad(i + 1) == 'a' && bad(i + 2) == 't' && bad(i + 3) == 'a').get
    val nanBits = java.lang.Float.floatToIntBits(Float.NaN)
    for (j <- 0 until 4) bad(dataAt + 8 + j) = ((nanBits >> (8 * j)) & 0xFF).toByte
    assert(WavFloat.parse(bad) == null)
    // a PCM (format 1) file is WavPcm's domain, not this one's
    assert(WavFloat.parse(WavEncode.encode(16, 1, 5L)) == null)
  }

  test("column expressions run through the codegen path") {
    import spark.implicits._
    val rows = Seq((1L, 64, 1), (2L, 80, 2)).toDF("id", "n", "ch")
      .select(col("id"), graft.plans.VectorExpressions.wavPcm(
        graft.plans.VectorExpressions.wavEncode(col("n"), col("ch"), col("id"))).as("s"))
      .orderBy("id").collect()
    assert(rows(0).getStruct(1).getLong(3) === 64L)
    assert(rows(1).getStruct(1).getInt(0) === 2)
  }
}
