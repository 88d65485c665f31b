package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** AUDIO samples: the step past [[ImageExpressions]]' WAV header parse
  * onto the actual PCM data — the audio twin of the BMP/PNG/GIF/JPEG
  * pixel decoders, zero dependencies (PCM is raw little-endian
  * integers; the container walk is the same RIFF discipline WavMeta
  * certifies).
  *
  *  - `graft_wav_pcm(binary)` → (channels, sample_rate, bits,
  *    n_frames, sum_l, sum_r, peak): one pass over the `data` chunk,
  *    integer-exact per-channel sums (16-bit signed LE or 8-bit
  *    unsigned per the spec), `peak` = max absolute amplitude across
  *    channels — the signal-level triage stats an audio curation
  *    pipeline gates on (silence/clipping detection). Work ∝ input
  *    bytes, memory O(1); parse-or-NULL, never throws.
  *  - `graft_wav_encode(n_frames, channels, seed)` → a fully valid
  *    16-bit PCM WAV (JUNK chunk before `fmt ` exercising the walk)
  *    whose frame i, channel c sample is
  *    `((seed + 31*i + 17*c) mod 65536) - 32768` — so the DuckDB
  *    oracle recomputes the decoded sums and peak exactly. */
case class WavPcm(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_wav_pcm expects a binary column, got ${child.dataType.catalogString}")
  override def dataType: DataType = WavPcm.schema
  override def nullable: Boolean = true
  override def prettyName: String = "graft_wav_pcm"

  override def nullSafeEval(input: Any): Any =
    WavPcm.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => s"""
      ${ev.value} = graft.plans.WavPcm.parse($b);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): WavPcm =
    copy(child = newChild)
}

object WavPcm {

  val schema: StructType = StructType(Seq(
    StructField("channels", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("bits", IntegerType),
    StructField("n_frames", LongType),
    StructField("sum_l", LongType),
    StructField("sum_r", LongType), // null for mono
    StructField("peak", IntegerType)))

  import AviMeta.{le32, tag, u8}
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)

  /** G.711 µ-law expansion (CCITT G.711, the classic u-law→linear
    * table formula): complement, rebuild the biased mantissa, shift by
    * the segment exponent, strip the bias, apply sign. */
  def ulaw2linear(code: Int): Int = {
    val u = (~code) & 0xFF
    val t = (((u & 0x0F) << 3) + 0x84) << ((u >> 4) & 7)
    if ((u & 0x80) != 0) 0x84 - t else t - 0x84
  }

  /** G.711 A-law expansion: XOR 0x55, segment 0 adds the half-step
    * bias only, higher segments add the full bias then shift; the
    * sign bit SET means positive in A-law's convention. */
  def alaw2linear(code: Int): Int = {
    val a = code ^ 0x55
    val q = a & 0x0F
    val seg = (a >> 4) & 7
    val t =
      if (seg == 0) (q << 4) + 8
      else ((q << 4) + 0x108) << (seg - 1)
    if ((a & 0x80) != 0) t else -t
  }

  /** RIFF/WAVE walk to `fmt ` then `data`; decode per-channel sums.
    * Uncompressed PCM (format 1) at 8, 16, or 24 bits, or G.711
    * A-law/µ-law (formats 6/7, 8-bit codes expanded to 13/14-bit
    * linear), 1-2 channels — anything else (float, ADPCM, >2ch) is
    * NULL, the triage contract. 24-bit is the studio-capture shape:
    * 3-byte LE two's-complement samples, sign-extended exactly. */
  def parse(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 12) return null
    if (!tag(b, 0, "RIFF") || !tag(b, 8, "WAVE")) return null
    val end = math.min(b.length.toLong, 8L + le32(b, 4)).toInt
    var p = 12
    var fmt, channels, rate, bits = -1
    while (p + 8 <= end) {
      val size = le32(b, p + 4)
      if (size < 0 || size > Int.MaxValue - 8) return null
      val body = p + 8
      if (tag(b, p, "fmt ") && size >= 16 && body + 16 <= end) {
        fmt = le16(b, body)
        if (fmt != 1 && fmt != 6 && fmt != 7) return null // PCM / A-law / µ-law
        channels = le16(b, body + 2)
        rate = le32(b, body + 4).toInt
        bits = le16(b, body + 14)
      } else if (tag(b, p, "data")) {
        if (channels < 1 || channels > 2) return null
        if (fmt == 1) { if (bits != 8 && bits != 16 && bits != 24) return null }
        else if (bits != 8) return null // G.711 codes are one byte
        val bytesPer = bits / 8
        val frameBytes = bytesPer * channels
        val avail = math.min(size, (end - body).toLong).toInt
        val nFrames = avail / frameBytes
        var sumL = 0L; var sumR = 0L; var peak = 0
        var i = 0
        while (i < nFrames) {
          var c = 0
          while (c < channels) {
            val off = body + i * frameBytes + c * bytesPer
            val v =
              if (fmt == 7) ulaw2linear(u8(b, off))
              else if (fmt == 6) alaw2linear(u8(b, off))
              else if (bits == 16) (le16(b, off) << 16) >> 16 // sign-extend
              else if (bits == 24) // 3-byte LE two's complement
                ((u8(b, off) | (u8(b, off + 1) << 8) | (u8(b, off + 2) << 16)) << 8) >> 8
              else u8(b, off) // 8-bit PCM WAV is unsigned
            if (c == 0) sumL += v else sumR += v
            val a = math.abs(v)
            if (a > peak) peak = a
            c += 1
          }
          i += 1
        }
        return new GenericInternalRow(Array[Any](channels, rate, bits,
          nFrames.toLong, sumL, if (channels == 2) sumR else null, peak))
      }
      p = body + size.toInt + (size.toInt & 1)
    }
    null // no data chunk
  }
}

/** `graft_wav_float(binary)` → (channels, sample_rate, n_frames,
  * sum_l, sum_r, peak) over an IEEE-float WAV (format 3, 32-bit
  * little-endian samples — the DAW-export shape). Sums and peak are
  * DOUBLES; the fixture's samples are dyadic (k/256 with |k| < 2^15),
  * so every sum is exactly representable and ORDER-INDEPENDENT in
  * double — which is what lets a SQL oracle replay it despite float
  * addition's general non-associativity. Same RIFF discipline and
  * total-function contract as [[WavPcm]]. */
case class WavFloat(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_wav_float expects a binary column, got ${child.dataType.catalogString}")
  override def dataType: DataType = WavFloat.schema
  override def nullable: Boolean = true
  override def prettyName: String = "graft_wav_float"

  override def nullSafeEval(input: Any): Any =
    WavFloat.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => s"""
      ${ev.value} = graft.plans.WavFloat.parse($b);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): WavFloat =
    copy(child = newChild)
}

object WavFloat {

  val schema: StructType = StructType(Seq(
    StructField("channels", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("n_frames", LongType),
    StructField("sum_l", DoubleType),
    StructField("sum_r", DoubleType), // null for mono
    StructField("peak", DoubleType)))

  import AviMeta.{le32, tag, u8}
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)

  def parse(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 12) return null
    if (!tag(b, 0, "RIFF") || !tag(b, 8, "WAVE")) return null
    val end = math.min(b.length.toLong, 8L + le32(b, 4)).toInt
    var p = 12
    var fmt, channels, rate, bits = -1
    while (p + 8 <= end) {
      val size = le32(b, p + 4)
      if (size < 0 || size > Int.MaxValue - 8) return null
      val body = p + 8
      if (tag(b, p, "fmt ") && size >= 16 && body + 16 <= end) {
        fmt = le16(b, body)
        if (fmt != 3) return null // IEEE float only; PCM rides WavPcm
        channels = le16(b, body + 2)
        rate = le32(b, body + 4).toInt
        bits = le16(b, body + 14)
      } else if (tag(b, p, "data")) {
        if (channels < 1 || channels > 2 || bits != 32) return null
        val frameBytes = 4 * channels
        val avail = math.min(size, (end - body).toLong).toInt
        val nFrames = avail / frameBytes
        var sumL = 0.0; var sumR = 0.0; var peak = 0.0
        var i = 0
        while (i < nFrames) {
          var c = 0
          while (c < channels) {
            val off = body + i * frameBytes + c * 4
            val bitsI = le32(b, off).toInt
            val v = java.lang.Float.intBitsToFloat(bitsI).toDouble
            if (v.isNaN || v.isInfinite) return null // corrupt sample
            if (c == 0) sumL += v else sumR += v
            val a = math.abs(v)
            if (a > peak) peak = a
            c += 1
          }
          i += 1
        }
        return new GenericInternalRow(Array[Any](channels, rate,
          nFrames.toLong, sumL, if (channels == 2) sumR else null, peak))
      }
      p = body + size.toInt + (size.toInt & 1)
    }
    null // no data chunk
  }

  /** Encoder twin: frame i channel c =
    * (((seed + 29 i + 11 c) mod 65536) - 32768) / 256 — dyadic, so
    * the decoded double sums are exact and order-free. fmt chunk is
    * the 18-byte non-PCM form. */
  def encode(nFrames: Int, channels: Int, seed: Long): Array[Byte] = {
    if (nFrames <= 0 || nFrames > (1 << 20)) return null
    if (channels < 1 || channels > 2 || seed < 0) return null
    val rate = 44100
    val dataLen = nFrames * channels * 4
    val out = new java.io.ByteArrayOutputStream(dataLen + 64)
    def w16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    def w32(v: Long): Unit = { w16((v & 0xFFFF).toInt); w16(((v >> 16) & 0xFFFF).toInt) }
    def cc(t: String): Unit = t.foreach(c => out.write(c.toInt))
    val riffLen = 4 + (8 + 18) + (8 + dataLen)
    cc("RIFF"); w32(riffLen.toLong); cc("WAVE")
    cc("fmt "); w32(18L)
    w16(3); w16(channels); w32(rate.toLong)
    w32(rate.toLong * channels * 4); w16(channels * 4); w16(32); w16(0)
    cc("data"); w32(dataLen.toLong)
    var i = 0
    while (i < nFrames) {
      var c = 0
      while (c < channels) {
        val k = java.lang.Math.floorMod(seed + 29L * i + 11L * c, 65536L).toInt - 32768
        w32(java.lang.Float.floatToIntBits(k / 256.0f).toLong & 0xFFFFFFFFL)
        c += 1
      }
      i += 1
    }
    out.toByteArray
  }
}

/** `graft_wav_encode(n_frames, channels, seed)` — see [[WavPcm]]. */
case class WavEncode(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType == IntegerType && second.dataType == IntegerType &&
        third.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_wav_encode expects (int nFrames, int channels, long seed)")
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_wav_encode"

  override def nullSafeEval(n: Any, ch: Any, seed: Any): Any =
    WavEncode.encode(n.asInstanceOf[Int], ch.asInstanceOf[Int],
      seed.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (n, ch, s) => s"""
      ${ev.value} = graft.plans.WavEncode.encode($n, $ch, $s);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): WavEncode = WavEncode(f, s, t)
}

object WavEncode {

  /** 16-bit PCM, 8 kHz, frame i channel c =
    * ((seed + 31 i + 17 c) mod 65536) - 32768. */
  def encode(nFrames: Int, channels: Int, seed: Long): Array[Byte] = {
    if (nFrames <= 0 || nFrames > (1 << 20)) return null
    if (channels < 1 || channels > 2) return null
    val rate = 8000
    val dataLen = nFrames * channels * 2
    val out = new java.io.ByteArrayOutputStream(dataLen + 64)
    def w16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    def w32(v: Long): Unit = { w16((v & 0xFFFF).toInt); w16(((v >> 16) & 0xFFFF).toInt) }
    def cc(t: String): Unit = t.foreach(c => out.write(c.toInt))
    val junk = Array[Byte](1, 2, 3) // odd: certifies word-align padding
    val riffLen = 4 + (8 + junk.length + 1) + (8 + 16) + (8 + dataLen)
    cc("RIFF"); w32(riffLen.toLong); cc("WAVE")
    cc("JUNK"); w32(junk.length.toLong); out.write(junk, 0, junk.length); out.write(0)
    cc("fmt "); w32(16L)
    w16(1); w16(channels); w32(rate.toLong)
    w32(rate.toLong * channels * 2); w16(channels * 2); w16(16)
    cc("data"); w32(dataLen.toLong)
    var i = 0
    while (i < nFrames) {
      var c = 0
      while (c < channels) {
        val v = java.lang.Math.floorMod(seed + 31L * i + 17L * c, 65536L).toInt - 32768
        w16(v & 0xFFFF)
        c += 1
      }
      i += 1
    }
    out.toByteArray
  }

  /** G.711 twin (fmt 7 = µ-law when `mulaw`, else 6 = A-law), 8 kHz
    * telephony shape: the DATA bytes are the G.711 CODES themselves,
    * frame i channel c = (seed + 13 i + 7 c) mod 256 — so the DuckDB
    * oracle replays the public expansion formula over the same arithmetic
    * and certifies the decoder's segment/bias/sign handling exactly.
    * fmt chunk is the spec's 18-byte non-PCM form (cbSize = 0). */
  def encodeG711(nFrames: Int, channels: Int, seed: Long,
      mulaw: Boolean): Array[Byte] = {
    if (nFrames <= 0 || nFrames > (1 << 20)) return null
    if (channels < 1 || channels > 2) return null
    val rate = 8000
    val dataLen = nFrames * channels
    val out = new java.io.ByteArrayOutputStream(dataLen + 64)
    def w16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    def w32(v: Long): Unit = { w16((v & 0xFFFF).toInt); w16(((v >> 16) & 0xFFFF).toInt) }
    def cc(t: String): Unit = t.foreach(c => out.write(c.toInt))
    val pad = dataLen & 1
    val riffLen = 4 + (8 + 18) + (8 + dataLen + pad)
    cc("RIFF"); w32(riffLen.toLong); cc("WAVE")
    cc("fmt "); w32(18L)
    w16(if (mulaw) 7 else 6); w16(channels); w32(rate.toLong)
    w32(rate.toLong * channels); w16(channels); w16(8); w16(0) // cbSize
    cc("data"); w32(dataLen.toLong)
    var i = 0
    while (i < nFrames) {
      var c = 0
      while (c < channels) {
        out.write(java.lang.Math.floorMod(seed + 13L * i + 7L * c, 256L).toInt)
        c += 1
      }
      i += 1
    }
    if (pad == 1) out.write(0)
    out.toByteArray
  }

  /** 24-bit PCM twin: frame i channel c =
    * ((seed + 131 i + 37 c) mod 16777216) - 8388608, 3-byte LE two's
    * complement — the studio-capture shape. Test surface. */
  private[graft] def encode24(nFrames: Int, channels: Int, seed: Long): Array[Byte] = {
    if (nFrames <= 0 || nFrames > (1 << 20)) return null
    if (channels < 1 || channels > 2) return null
    val rate = 48000
    val dataLen = nFrames * channels * 3
    val out = new java.io.ByteArrayOutputStream(dataLen + 64)
    def w16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    def w32(v: Long): Unit = { w16((v & 0xFFFF).toInt); w16(((v >> 16) & 0xFFFF).toInt) }
    def cc(t: String): Unit = t.foreach(c => out.write(c.toInt))
    val riffLen = 4 + (8 + 16) + (8 + dataLen)
    cc("RIFF"); w32(riffLen.toLong); cc("WAVE")
    cc("fmt "); w32(16L)
    w16(1); w16(channels); w32(rate.toLong)
    w32(rate.toLong * channels * 3); w16(channels * 3); w16(24)
    cc("data"); w32(dataLen.toLong)
    var i = 0
    while (i < nFrames) {
      var c = 0
      while (c < channels) {
        val v = java.lang.Math.floorMod(seed + 131L * i + 37L * c, 16777216L).toInt - 8388608
        out.write(v & 0xFF); out.write((v >> 8) & 0xFF); out.write((v >> 16) & 0xFF)
        c += 1
      }
      i += 1
    }
    out.toByteArray
  }
}
