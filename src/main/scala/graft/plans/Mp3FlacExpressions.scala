package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** COMPRESSED-AUDIO triage: the two formats a crawl's audio actually
  * arrives in — FLAC (lossless archival) and MP3 (the web's lossy
  * default) — parsed far enough to answer the curation questions
  * (how long? what rate? how many channels? worth decoding?) WITHOUT
  * paying any codec arithmetic, exactly like the MP4/AVI triage tier
  * (reference analogue: aristoteles.py:334-478 treats payloads as
  * opaque columns; this is the Spark-native deepening of that model).
  *
  *  - `graft_flac_meta(binary)` walks the metadata-block chain
  *    ("fLaC", then 4-byte block headers: last-flag + type + 24-bit
  *    length) and decodes the mandatory first STREAMINFO block's
  *    packed layout (RFC 9639 §8.2: 20-bit sample rate, 3-bit
  *    channels-1, 5-bit bits-per-sample-1, 36-bit total sample
  *    count, 16-byte unencoded-audio MD5). The whole chain must be
  *    structurally sound (every block inside the buffer, STREAMINFO
  *    first as the spec mandates) or the row is NULL.
  *  - `graft_mp3_meta(binary)` skips an optional ID3v2 tag (syncsafe
  *    32-bit size), then walks the MPEG audio frame chain: each
  *    Layer III header's (version, bitrate index, sample-rate index,
  *    padding) gives the exact frame byte length
  *    (⌊coef·bitrate/rate⌋+pad, ISO 11172-3), so counting frames —
  *    including VBR streams, where the bitrate index changes frame
  *    to frame — needs only header reads. Duration is
  *    frames·samplesPerFrame/rate. A trailing 128-byte ID3v1 "TAG"
  *    is accepted; any other mid-stream desync declines to NULL.
  *    Layers I/II and the free-format bitrate (index 0) decline —
  *    triage stays exact or silent, never guessed.
  *
  * Both are parse-or-NULL (hostile lengths bounded by the buffer,
  * ≤4096 metadata blocks / ≤1M frames ceilings), O(blocks)/O(frames)
  * work and O(1) memory per row, and run inside whole-stage codegen —
  * at 100 TB the triage pass is scan-speed. Encoders
  * ([[FlacMeta.encode]], [[Mp3Meta.encode]]) synthesize conformant
  * fixtures whose every field is doc_id-derivable, so the DuckDB
  * oracle certifies the full construct→store→walk round trip. */
case class FlacMeta(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_flac_meta expects a binary column, got ${child.dataType.catalogString}")
  override def dataType: DataType = FlacMeta.schema
  override def nullable: Boolean = true
  override def prettyName: String = "graft_flac_meta"

  override def nullSafeEval(input: Any): Any =
    FlacMeta.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => s"""
      ${ev.value} = graft.plans.FlacMeta.parse($b);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): FlacMeta =
    copy(child = newChild)
}

object FlacMeta {

  val schema: StructType = StructType(Seq(
    StructField("sample_rate", IntegerType),
    StructField("channels", IntegerType),
    StructField("bits", IntegerType),
    StructField("total_samples", LongType),
    StructField("duration_ms", LongType),
    StructField("n_blocks", IntegerType),
    StructField("md5_hex", StringType)))

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def be24(b: Array[Byte], i: Int): Int =
    (u8(b, i) << 16) | (u8(b, i + 1) << 8) | u8(b, i + 2)

  /** NULL on anything not a structurally sound FLAC header chain. */
  def parse(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 42) return null
    if (b(0) != 'f' || b(1) != 'L' || b(2) != 'a' || b(3) != 'C') return null
    // first block MUST be STREAMINFO, type 0, length 34 (RFC 9639 §8.1)
    if ((u8(b, 4) & 0x7F) != 0 || be24(b, 5) != 34) return null
    var last = (u8(b, 4) & 0x80) != 0
    // packed STREAMINFO starts at byte 8
    val sr = (u8(b, 18) << 12) | (u8(b, 19) << 4) | (u8(b, 20) >>> 4)
    if (sr == 0 || sr > 655350) return null
    val channels = ((u8(b, 20) >>> 1) & 0x7) + 1
    val bits = (((u8(b, 20) & 0x1) << 4) | (u8(b, 21) >>> 4)) + 1
    val total = ((u8(b, 21) & 0xF).toLong << 32) |
      ((be16(b, 22).toLong << 16) | be16(b, 24).toLong)
    val md5 = new StringBuilder(32)
    var i = 26
    while (i < 42) { md5.append(f"${u8(b, i)}%02x"); i += 1 }
    // walk the rest of the chain: every block header inside the
    // buffer, its payload too; bounded against hostile lengths
    var off = 8 + 34
    var nBlocks = 1
    while (!last && nBlocks < 4096) {
      if (off + 4 > b.length) return null
      last = (u8(b, off) & 0x80) != 0
      val tpe = u8(b, off) & 0x7F
      if (tpe == 0 || tpe == 127) return null // dup STREAMINFO / forbidden
      val len = be24(b, off + 1)
      if (off + 4 + len > b.length) return null
      off += 4 + len
      nBlocks += 1
    }
    if (!last) return null
    new GenericInternalRow(Array[Any](sr, channels, bits, total,
      total * 1000L / sr, nBlocks, UTF8String.fromString(md5.toString)))
  }

  /** The fixture's seed-derived tag values, shared with the
    * [[AudioTags]] oracle: every field is doc_id-recomputable. */
  def tagTitle(seed: Long): String = s"t${seed % 1000}"
  def tagArtist(seed: Long): String = s"a${seed % 100}"
  def tagAlbum(seed: Long): String = s"b${seed % 50}"
  val TagVendor = "graft"

  /** Deterministic conformant fixture: STREAMINFO with the given
    * packed fields, a REAL VORBIS_COMMENT block (vendor "graft" +
    * TITLE/ARTIST/ALBUM from the seed — the [[AudioTags]] surface)
    * and a PADDING block (so the chain walk is load-bearing). MD5
    * bytes are `(seed + 7i) mod 256`. */
  def encode(sampleRate: Int, channels: Int, bits: Int, totalSamples: Long,
      seed: Long, padLen: Int): Array[Byte] = {
    require(sampleRate > 0 && sampleRate <= 655350 &&
      channels >= 1 && channels <= 8 && bits >= 4 && bits <= 32 &&
      totalSamples >= 0 && totalSamples < (1L << 36) && padLen >= 0)
    val out = new java.io.ByteArrayOutputStream()
    def w8(v: Int): Unit = out.write(v & 0xFF)
    def w24(v: Int): Unit = { w8(v >>> 16); w8(v >>> 8); w8(v) }
    def wle32(v: Int): Unit = { w8(v); w8(v >>> 8); w8(v >>> 16); w8(v >>> 24) }
    out.write('f'); out.write('L'); out.write('a'); out.write('C')
    w8(0x00); w24(34) // STREAMINFO, not last
    w8(4096 >>> 8); w8(4096 & 0xFF) // min block size
    w8(4096 >>> 8); w8(4096 & 0xFF) // max block size
    w24(0); w24(0)                  // min/max frame size unknown
    // 20-bit sr | 3-bit channels-1 | 5-bit bits-1 | 36-bit total
    w8(sampleRate >>> 12); w8((sampleRate >>> 4) & 0xFF)
    w8(((sampleRate & 0xF) << 4) | ((channels - 1) << 1) | ((bits - 1) >>> 4))
    w8(((bits - 1) & 0xF) << 4 | ((totalSamples >>> 32) & 0xF).toInt)
    w8((totalSamples >>> 24).toInt); w8((totalSamples >>> 16).toInt)
    w8((totalSamples >>> 8).toInt); w8(totalSamples.toInt)
    var i = 0
    while (i < 16) { w8(((seed + 7 * i) % 256).toInt); i += 1 }
    // VORBIS_COMMENT: vendor + 3 comments, all lengths LE u32
    val comments = Seq(
      s"TITLE=${tagTitle(seed)}", s"ARTIST=${tagArtist(seed)}",
      s"ALBUM=${tagAlbum(seed)}").map(_.getBytes("UTF-8"))
    val vcLen = 4 + TagVendor.length + 4 + comments.map(4 + _.length).sum
    w8(0x04); w24(vcLen) // VORBIS_COMMENT, not last
    wle32(TagVendor.length)
    TagVendor.foreach(c => w8(c))
    wle32(comments.length)
    comments.foreach { c => wle32(c.length); c.foreach(x => out.write(x)) }
    w8(0x81); w24(padLen) // PADDING, LAST
    i = 0
    while (i < padLen) { w8(0); i += 1 }
    out.toByteArray
  }
}

case class Mp3Meta(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_mp3_meta expects a binary column, got ${child.dataType.catalogString}")
  override def dataType: DataType = Mp3Meta.schema
  override def nullable: Boolean = true
  override def prettyName: String = "graft_mp3_meta"

  override def nullSafeEval(input: Any): Any =
    Mp3Meta.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => s"""
      ${ev.value} = graft.plans.Mp3Meta.parse($b);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): Mp3Meta =
    copy(child = newChild)
}

object Mp3Meta {

  val schema: StructType = StructType(Seq(
    StructField("version", StringType),      // "1" | "2" | "2.5"
    StructField("sample_rate", IntegerType),
    StructField("channels", IntegerType),
    StructField("bitrate_kbps", IntegerType), // first frame's
    StructField("n_frames", IntegerType),
    StructField("duration_ms", LongType),
    StructField("has_id3v2", BooleanType)))

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF

  /** MPEG-1 Layer III bitrates, kbps, by header index (ISO 11172-3
    * table B.2); index 0 = free format (declined), 15 = invalid. */
  val BitrateV1: Array[Int] =
    Array(-1, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, -1)
  /** MPEG-2/2.5 Layer III bitrates (ISO 13818-3). */
  val BitrateV2: Array[Int] =
    Array(-1, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160, -1)
  /** Sample rates by (version, index); index 3 reserved. */
  val RateV1: Array[Int] = Array(44100, 48000, 32000, -1)
  val RateV2: Array[Int] = Array(22050, 24000, 16000, -1)
  val RateV25: Array[Int] = Array(11025, 12000, 8000, -1)

  /** NULL on anything that is not a clean Layer III frame chain. */
  def parse(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 4) return null
    var off = 0
    var hasId3 = false
    if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
      // syncsafe size: 4 bytes, high bit of each must be clear
      var size = 0
      var i = 6
      while (i < 10) {
        if ((u8(b, i) & 0x80) != 0) return null
        size = (size << 7) | u8(b, i)
        i += 1
      }
      off = 10 + size
      hasId3 = true
    }
    if (off + 4 > b.length) return null
    // first frame pins (version, layer, rate); bitrate may vary (VBR)
    val h1 = u8(b, off + 1)
    if (u8(b, off) != 0xFF || (h1 & 0xE0) != 0xE0) return null
    val verBits = (h1 >>> 3) & 0x3
    if (verBits == 1) return null // reserved
    if (((h1 >>> 1) & 0x3) != 0x1) return null // Layer III only
    val rates = verBits match {
      case 3 => RateV1
      case 2 => RateV2
      case _ => RateV25
    }
    val bitrates = if (verBits == 3) BitrateV1 else BitrateV2
    val spf = if (verBits == 3) 1152 else 576
    val coef = if (verBits == 3) 144000 else 72000
    val rateIdx = (u8(b, off + 2) >>> 2) & 0x3
    if (rateIdx == 3) return null
    val rate = rates(rateIdx)
    val channels = if (((u8(b, off + 3) >>> 6) & 0x3) == 3) 1 else 2
    val firstBitrate = bitrates((u8(b, off + 2) >>> 4) & 0xF)
    if (firstBitrate <= 0) return null
    var n = 0
    while (off + 4 <= b.length && n < 1000000) {
      val b0 = u8(b, off); val b1 = u8(b, off + 1); val b2 = u8(b, off + 2)
      if (b0 != 0xFF || (b1 & 0xE0) != 0xE0) {
        // chain over: accept a trailing ID3v1 tag or clean EOF only
        return finish(b, off, rate, channels, firstBitrate, n, spf, hasId3,
          if (verBits == 3) "1" else if (verBits == 2) "2" else "2.5")
      }
      // consistency: version, layer, rate index must not drift
      if (((b1 >>> 3) & 0x3) != verBits || ((b1 >>> 1) & 0x3) != 0x1 ||
        ((b2 >>> 2) & 0x3) != rateIdx) return null
      val br = bitrates((b2 >>> 4) & 0xF)
      if (br <= 0) return null
      val frameLen = coef * br / rate + ((b2 >>> 1) & 0x1)
      if (off + frameLen > b.length) return null // truncated frame
      off += frameLen
      n += 1
    }
    finish(b, off, rate, channels, firstBitrate, n, spf, hasId3,
      if (verBits == 3) "1" else if (verBits == 2) "2" else "2.5")
  }

  private def finish(b: Array[Byte], off: Int, rate: Int, channels: Int,
      firstBitrate: Int, n: Int, spf: Int, hasId3: Boolean,
      ver: String): InternalRow = {
    if (n == 0) return null
    val rest = b.length - off
    val id3v1 = rest == 128 && b(off) == 'T' && b(off + 1) == 'A' &&
      b(off + 2) == 'G'
    if (rest != 0 && !id3v1) return null
    new GenericInternalRow(Array[Any](UTF8String.fromString(ver), rate,
      channels, firstBitrate, n, n.toLong * spf * 1000L / rate, hasId3))
  }

  /** Deterministic Layer III fixture: optional ID3v2 prefix (syncsafe
    * length `id3Len`) carrying REAL TIT2/TPE1/TALB text frames when
    * they fit (values from [[FlacMeta.tagTitle]] etc. — the
    * [[AudioTags]] surface; tag version v2.4 with syncsafe frame
    * sizes when seed%3==0, else v2.3 plain-32-bit; zero padding
    * fills the rest) or opaque filler when id3Len is too small; then
    * `nFrames` frames whose bitrate index is
    * `1 + ((seed + i·vbrStep) mod 7)` — vbrStep 0 gives CBR, anything
    * else exercises the per-frame length recomputation — and whose
    * padding bit alternates with `(seed + i) mod 2`; optional ID3v1
    * trailer. verSel: 0 → MPEG-1, 1 → MPEG-2, 2 → MPEG-2.5. */
  def encode(nFrames: Int, verSel: Int, rateIdx: Int, mono: Boolean,
      seed: Long, vbrStep: Int, id3Len: Int, id3v1: Boolean): Array[Byte] = {
    require(nFrames >= 1 && nFrames <= 10000 && verSel >= 0 && verSel <= 2 &&
      rateIdx >= 0 && rateIdx <= 2 && id3Len >= 0 && id3Len < (1 << 28))
    val verBits = verSel match { case 0 => 3; case 1 => 2; case _ => 0 }
    val rate = (verSel match {
      case 0 => RateV1; case 1 => RateV2; case _ => RateV25
    })(rateIdx)
    val bitrates = if (verSel == 0) BitrateV1 else BitrateV2
    val coef = if (verSel == 0) 144000 else 72000
    val out = new java.io.ByteArrayOutputStream()
    if (id3Len > 0) {
      val tagVer = if (seed % 3 == 0) 4 else 3
      out.write('I'); out.write('D'); out.write('3')
      out.write(tagVer); out.write(0); out.write(0) // no flags
      out.write((id3Len >>> 21) & 0x7F); out.write((id3Len >>> 14) & 0x7F)
      out.write((id3Len >>> 7) & 0x7F); out.write(id3Len & 0x7F)
      // text encoding rotates by seed so the UTF-16 paths are
      // load-bearing in the oracled fixture queries: seed%5==1 ->
      // encoding 1 (BOM'd UTF-16LE), seed%5==2 on a v2.4 tag ->
      // encoding 2 (BOM-less UTF-16BE), else ISO-8859-1. The decoded
      // VALUES are identical either way (ASCII seeds), so the
      // doc_id-recomputable oracle is unchanged.
      val enc: Int =
        if (seed % 5 == 1) 1
        else if (seed % 5 == 2 && tagVer == 4) 2
        else 0
      def payload(v: String): Array[Byte] = enc match {
        case 1 =>
          val bs = new Array[Byte](2 + v.length * 2)
          bs(0) = 0xFF.toByte; bs(1) = 0xFE.toByte // LE BOM
          var i = 0
          while (i < v.length) {
            bs(2 + 2 * i) = v(i).toByte; bs(3 + 2 * i) = 0; i += 1
          }
          bs
        case 2 =>
          val bs = new Array[Byte](v.length * 2)
          var i = 0
          while (i < v.length) {
            bs(2 * i) = 0; bs(2 * i + 1) = v(i).toByte; i += 1
          }
          bs
        case _ => v.getBytes("ISO-8859-1")
      }
      val frames = Seq("TIT2" -> FlacMeta.tagTitle(seed),
        "TPE1" -> FlacMeta.tagArtist(seed), "TALB" -> FlacMeta.tagAlbum(seed))
      val need = frames.map { case (_, v) => 11 + payload(v).length }.sum
      if (need <= id3Len) {
        var written = 0
        frames.foreach { case (fid, v) =>
          fid.foreach(c => out.write(c))
          val pl = payload(v)
          val fsize = 1 + pl.length
          if (tagVer == 4) {
            out.write((fsize >>> 21) & 0x7F); out.write((fsize >>> 14) & 0x7F)
            out.write((fsize >>> 7) & 0x7F); out.write(fsize & 0x7F)
          } else {
            out.write(fsize >>> 24); out.write((fsize >>> 16) & 0xFF)
            out.write((fsize >>> 8) & 0xFF); out.write(fsize & 0xFF)
          }
          out.write(0); out.write(0) // frame flags
          out.write(enc) // text encoding byte
          out.write(pl, 0, pl.length)
          written += 10 + fsize
        }
        while (written < id3Len) { out.write(0); written += 1 } // padding
      } else {
        var i = 0
        while (i < id3Len) { out.write(((seed + i) % 128).toInt); i += 1 }
      }
    }
    var i = 0
    while (i < nFrames) {
      val brIdx = 1 + (((seed + i.toLong * vbrStep) % 7) + 7).toInt % 7
      val pad = ((seed + i) % 2).toInt.abs
      val frameLen = coef * bitrates(brIdx) / rate + pad
      out.write(0xFF)
      out.write(0xE0 | (verBits << 3) | (0x1 << 1) | 0x1) // layer III, no CRC
      out.write((brIdx << 4) | (rateIdx << 2) | (pad << 1))
      out.write(if (mono) 0xC0 else 0x00)
      var j = 4
      while (j < frameLen) { out.write(((seed + 11 * j) % 256).toInt); j += 1 }
      i += 1
    }
    if (id3v1) {
      out.write('T'); out.write('A'); out.write('G')
      var k = 3
      while (k < 128) { out.write(0); k += 1 }
    }
    out.toByteArray
  }
}
