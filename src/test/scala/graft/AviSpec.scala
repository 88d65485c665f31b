package graft

import org.apache.spark.sql.functions._

import graft.plans.{AviEncode, AviFrames, AviMeta, JpegEncode, JpegPixels}

/** AVI (RIFF) container walk + MJPEG frame decode: round trips against
  * the frame-level JPEG decoder, header parsing, word-alignment
  * padding, nested `rec ` lists, hostile inputs, and the codegen
  * path. */
class AviSpec extends SparkSpec {

  test("every frame decodes exactly as its standalone JPEG would") {
    for {
      (w, h) <- Seq((9, 9), (16, 12), (17, 23), (8, 8))
      mode <- 0 to 2
      n <- Seq(1, 3)
    } {
      val avi = AviEncode.encode(w, h, n, seed = 41L * w + h + mode, mode)
      assert(avi != null, s"encode failed for w=$w h=$h mode=$mode")
      val frames = AviFrames.parse(avi)
      assert(frames != null, s"decode failed for w=$w h=$h mode=$mode")
      assert(frames.numElements() === n)
      for (i <- 0 until n) {
        val row = frames.getStruct(i, 7)
        val direct = JpegPixels.parse(
          JpegEncode.encodeBlockyColor(w, h, 41L * w + h + mode + 1000L * i,
            mode, restartRows = false))
        assert(row.getInt(0) === i) // frame_idx
        assert(row.getInt(1) === direct.getInt(0)) // width
        assert(row.getInt(2) === direct.getInt(1)) // height
        assert(row.getLong(3) === direct.getLong(2)) // sum_r
        assert(row.getLong(4) === direct.getLong(3))
        assert(row.getLong(5) === direct.getLong(4))
        assert(row.getLong(6) === direct.getLong(5)) // n_pixels
      }
    }
  }

  test("header metadata round-trips through the hdrl walk") {
    val avi = AviEncode.encode(20, 14, 3, 7L, 2)
    val m = AviMeta.parse(avi)
    assert(m != null)
    assert(m.getInt(0) === 20 && m.getInt(1) === 14) // canvas
    assert(m.getInt(2) === 3) // n_frames
    assert(m.getInt(3) === 1) // n_streams
    assert(m.getString(4) === "MJPG")
  }

  test("frames inside a nested 'rec ' LIST are found") {
    // rebuild a 2-frame AVI with the movi payload wrapped in rec lists
    val base = AviEncode.encode(10, 10, 2, 5L, 0)
    val f0 = JpegEncode.encodeBlockyColor(10, 10, 5L, 0, restartRows = false)
    val f1 = JpegEncode.encodeBlockyColor(10, 10, 1005L, 0, restartRows = false)
    def le32(v: Int): Array[Byte] =
      Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
        ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
    def chunk(t: String, b: Array[Byte]): Array[Byte] =
      t.getBytes ++ le32(b.length) ++ b ++
        (if ((b.length & 1) == 1) Array(0.toByte) else Array.empty[Byte])
    def rec(b: Array[Byte]): Array[Byte] = chunk("LIST", "rec ".getBytes ++ b)
    val movi = "movi".getBytes ++ rec(chunk("00dc", f0)) ++ rec(chunk("00dc", f1))
    val hdrlEnd = {
      // find where the original movi LIST starts; keep everything before
      val idx = (12 until base.length - 12).find(i =>
        base(i) == 'L' && base(i + 1) == 'I' && base(i + 2) == 'S' &&
        base(i + 3) == 'T' && base(i + 8) == 'm' && base(i + 9) == 'o' &&
        base(i + 10) == 'v' && base(i + 11) == 'i').get
      base.slice(12, idx)
    }
    val body = "AVI ".getBytes ++ hdrlEnd ++ chunk("LIST", movi)
    val avi = "RIFF".getBytes ++ le32(body.length) ++ body
    val frames = AviFrames.parse(avi)
    assert(frames != null && frames.numElements() === 2)
    val direct0 = JpegPixels.parse(f0)
    assert(frames.getStruct(0, 7).getLong(3) === direct0.getLong(2))
  }

  test("hostile inputs are NULL, never partial") {
    val avi = AviEncode.encode(12, 12, 2, 9L, 1)
    assert(AviFrames.parse(avi.take(40)) == null) // truncated in hdrl
    assert(AviFrames.parse(avi.take(avi.length - 10)) == null) // truncated frame
    val corrupt = avi.clone()
    corrupt(avi.length - 20) = (corrupt(avi.length - 20) ^ 0x7F).toByte
    // a corrupted frame nulls the WHOLE parse (no partial answers)
    val r = AviFrames.parse(corrupt)
    assert(r == null || r.numElements() == 2) // bit flip may land in padding
    assert(AviFrames.parse("RIFF1234AVI ".getBytes) == null) // no movi
    assert(AviMeta.parse("RIFF1234AVI ".getBytes) == null) // no hdrl
    assert(AviFrames.parse(Array.emptyByteArray) == null)
  }

  test("column expressions run through the whole-stage codegen path") {
    import spark.implicits._
    val df = Seq((1L, 10, 12, 2, 0), (2L, 9, 9, 1, 2)).toDF("id", "w", "h", "n", "m")
      .select(col("id"), graft.plans.VectorExpressions.aviEncode(
        col("w"), col("h"), col("n"), col("id"), col("m")).as("avi"))
      .select(col("id"),
        graft.plans.VectorExpressions.aviMeta(col("avi")).as("meta"),
        graft.plans.VectorExpressions.aviFrames(col("avi")).as("frames"))
    val rows = df.orderBy("id").collect()
    assert(rows(0).getStruct(1).getInt(2) === 2) // n_frames
    assert(rows(0).getSeq[Any](2).length === 2)
    assert(rows(1).getStruct(1).getString(4) === "MJPG")
    assert(rows(1).getSeq[Any](2).length === 1)
  }
}
