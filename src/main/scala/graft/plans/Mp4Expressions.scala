package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** VIDEO: MP4 / ISO-BMFF container triage — the dominant real-crawl
  * video container (MP4/MOV/3GP all share the ISO/IEC 14496-12 box
  * grammar), completing the media family's header-pass coverage next
  * to the RIFF walk (AVI/WAV) and the chunk walks (PNG/GIF). No codec
  * is touched: the triage answers the corpus-curation questions —
  * is it a video? how long? how many tracks of what kind? what
  * resolution? — from the box tree alone, which is exactly the cheap
  * scan a 100 TB crawl runs BEFORE deciding what to pay full decode
  * for.
  *
  * `graft_mp4_meta(binary)` → (brand, timescale, duration, n_tracks,
  * video_tracks, audio_tracks, width, height, n_fragments, n_samples,
  * video_codec, audio_codec, n_samples_stbl), NULL when the bytes
  * are not a parseable ISO-BMFF stream. Codec identity comes from the
  * stsd sample-description walk (trak → mdia → minf → stbl → stsd
  * first-entry fourcc: avc1/hvc1/av01, mp4a/...) — the filter a real
  * curation pipeline applies before paying any decode; the
  * non-fragmented sample count reads stsz's fixed-offset count field.
  * From the public spec:
  *
  *  - a box is `size(u32 BE) + type(4cc)`; size==1 switches to a
  *    64-bit largesize after the type; size==0 means "to the end of
  *    the enclosing container" (legal for a file's last box);
  *  - `ftyp` carries the major brand; `moov` is the metadata
  *    container: `mvhd` (version 0 = 32-bit times, version 1 =
  *    64-bit) yields timescale + duration; each `trak` yields its
  *    `tkhd` 16.16 fixed-point presentation dims and its
  *    `mdia`/`hdlr` handler fourcc (`vide`/`soun`) for track-kind
  *    counts. Width/height report the FIRST video track (NULL for
  *    audio-only files).
  *
  * Total function: parse-or-NULL, never throw (fuzzed beside the
  * other media parsers). The walk is bounded two ways against hostile
  * headers — every box advance is monotone (size >= 8, or the 16-byte
  * largesize header minimum), and a global visited-box ceiling bounds
  * TIME even for adversarial deeply-split trees. Same execution shape
  * as [[AviMeta]]: a static per-row byte walk inside whole-stage
  * codegen. */
case class Mp4Meta(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_mp4_meta expects a binary column, got ${child.dataType.catalogString}")
  override def dataType: DataType = Mp4Meta.schema
  override def nullable: Boolean = true
  override def prettyName: String = "graft_mp4_meta"

  override def nullSafeEval(input: Any): Any =
    Mp4Meta.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => s"""
      ${ev.value} = graft.plans.Mp4Meta.parse($b);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): Mp4Meta =
    copy(child = newChild)
}

object Mp4Meta {

  val schema: StructType = StructType(Seq(
    StructField("brand", StringType),
    StructField("timescale", IntegerType),
    StructField("duration", LongType),
    StructField("n_tracks", IntegerType),
    StructField("video_tracks", IntegerType),
    StructField("audio_tracks", IntegerType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    // fragmented-MP4 (DASH/HLS) triage: movie-fragment count and the
    // total trun sample count across all track fragments — 0/0 for a
    // plain progressive file
    StructField("n_fragments", IntegerType),
    StructField("n_samples", LongType),
    // codec identity (stsd sample-entry fourcc of the FIRST video /
    // audio track — avc1/hvc1/av01, mp4a/...): the filter-on-codec
    // triage a real crawl runs before paying any decode ("keep H.264,
    // drop AV1"); NULL when the track carries no sample description
    StructField("video_codec", StringType),
    StructField("audio_codec", StringType),
    // stsz-derived total sample count across all tracks' sample
    // tables — the non-fragmented twin of n_samples (0 when no stbl)
    StructField("n_samples_stbl", LongType)))

  /** Hostile-header ceiling on boxes visited across ALL nesting
    * levels: bounds walk time; memory is O(1) regardless. Sized past
    * the encoder's own envelope (64 fragments x 8 tracks of
    * traf/tfhd/trun triples). */
  val MaxBoxes = 4096

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF
  private def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def be64(b: Array[Byte], i: Int): Long =
    (be32(b, i) << 32) | be32(b, i + 4)
  private def typ(b: Array[Byte], i: Int, t: String): Boolean =
    b(i) == t.charAt(0).toByte && b(i + 1) == t.charAt(1).toByte &&
      b(i + 2) == t.charAt(2).toByte && b(i + 3) == t.charAt(3).toByte

  /** Mutable walk state shared by the nested loops: the global
    * visited-box counter, the extracted file-level fields, and the
    * CURRENT trak's accumulation (reset per `trak`, classified when
    * its subtree walk returns). Local to each parse call. */
  private final class St {
    var boxes = 0
    var brand: String = null
    var timescale = -1
    var duration = -1L
    var nTracks = 0; var vid = 0; var aud = 0
    var w = -1; var h = -1
    // per-trak: tkhd dims (level 2) + hdlr kind (level 3) + stsd
    // sample-entry fourcc and stsz sample count (level 7)
    var trakW = -1; var trakH = -1
    var trakKind = 0 // 0 = other/unknown, 1 = vide, 2 = soun
    var trakCodec: String = null
    var trakSamples = -1L
    // fragmented-MP4 accumulation (moof/traf/trun)
    var nFrags = 0; var nSamples = 0L
    // first video / audio track's codec + summed stsz counts
    var vcodec: String = null; var acodec: String = null
    var nSamplesStbl = 0L
  }

  def parse(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 16) return null
    // cheap signature gate before any walk: the first box must be a
    // known file-level type (every real file leads with ftyp; moov/
    // free/mdat leads occur in practice for ftyp-less QuickTime)
    if (!typ(b, 4, "ftyp") && !typ(b, 4, "styp") && !typ(b, 4, "moov") &&
        !typ(b, 4, "free") && !typ(b, 4, "skip") && !typ(b, 4, "mdat") &&
        !typ(b, 4, "wide"))
      return null
    val st = new St
    if (!walkChildren(b, 0, b.length, 0, st)) return null
    if (st.brand == null || st.timescale <= 0 || st.duration < 0) return null
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(st.brand), st.timescale, st.duration,
      st.nTracks, st.vid, st.aud,
      if (st.w >= 0) st.w else null, if (st.h >= 0) st.h else null,
      st.nFrags, st.nSamples,
      if (st.vcodec != null) UTF8String.fromString(st.vcodec) else null,
      if (st.acodec != null) UTF8String.fromString(st.acodec) else null,
      st.nSamplesStbl))
  }

  /** Walks the boxes in [from, to) at nesting `level` (0 = file level,
    * 1 = moov children, 2 = trak children, 3 = mdia children).
    * Returns false on structural corruption (nulls the parse). */
  private def walkChildren(b: Array[Byte], from: Int, to: Int, level: Int,
      st: St): Boolean = {
    var p = from
    while (p + 8 <= to) {
      st.boxes += 1
      if (st.boxes > MaxBoxes) return false
      val size32 = be32(b, p)
      var body = p + 8
      var end = 0L
      if (size32 == 1L) {
        if (p + 16 > to) return false
        val large = be64(b, p + 8)
        if (large < 16 || large > to - p) return false
        end = p + large; body = p + 16
      } else if (size32 == 0L) {
        end = to // "to end of enclosing container" (last box)
      } else {
        if (size32 < 8 || size32 > to - p) return false
        end = p + size32
      }
      val boxEnd = end.toInt
      if (level == 0 && (typ(b, p + 4, "ftyp") || typ(b, p + 4, "styp"))) {
        // ftyp leads self-contained files, styp leads DASH segments;
        // first one wins as the reported brand
        if (body + 4 > boxEnd) return false
        if (st.brand == null) st.brand = new String(b, body, 4, "US-ASCII")
      } else if (level == 0 && typ(b, p + 4, "moof")) {
        st.nFrags += 1
        if (!walkChildren(b, body, boxEnd, 4, st)) return false
      } else if (level == 4 && typ(b, p + 4, "traf")) {
        if (!walkChildren(b, body, boxEnd, 5, st)) return false
      } else if (level == 5 && typ(b, p + 4, "trun")) {
        // FullBox 4, then sample_count (u32)
        if (body + 8 > boxEnd) return false
        st.nSamples += be32(b, body + 4)
      } else if (level == 0 && typ(b, p + 4, "moov")) {
        if (!walkChildren(b, body, boxEnd, 1, st)) return false
      } else if (level == 1 && typ(b, p + 4, "mvhd")) {
        // FullBox: version(1) flags(3); v0 = u32 times, v1 = u64
        if (body + 4 > boxEnd) return false
        val v = u8(b, body)
        if (v == 0) {
          if (body + 20 > boxEnd) return false
          st.timescale = be32(b, body + 12).toInt
          st.duration = be32(b, body + 16)
        } else if (v == 1) {
          if (body + 32 > boxEnd) return false
          st.timescale = be32(b, body + 20).toInt
          st.duration = be64(b, body + 24)
          if (st.duration < 0) return false
        } else return false
      } else if (level == 1 && typ(b, p + 4, "trak")) {
        st.nTracks += 1
        st.trakW = -1; st.trakH = -1; st.trakKind = 0
        st.trakCodec = null; st.trakSamples = -1L
        if (!walkChildren(b, body, boxEnd, 2, st)) return false
        st.trakKind match {
          case 1 =>
            st.vid += 1
            if (st.w < 0 && st.trakW > 0 && st.trakH > 0) {
              st.w = st.trakW; st.h = st.trakH
            }
            if (st.vcodec == null) st.vcodec = st.trakCodec
          case 2 =>
            st.aud += 1
            if (st.acodec == null) st.acodec = st.trakCodec
          case _ =>
        }
        if (st.trakSamples > 0) st.nSamplesStbl += st.trakSamples
      } else if (level == 2 && typ(b, p + 4, "tkhd")) {
        // v0 body: ver/flags 4 + times 8 + id 4 + res 4 + dur 4 +
        // res 8 + layer/alt/vol/res 8 + matrix 36, then 16.16 w, h;
        // v1 widens times+duration by 12 bytes before the tail
        if (body + 4 > boxEnd) return false
        val dimOff = u8(b, body) match {
          case 0 => body + 76
          case 1 => body + 88
          case _ => return false
        }
        if (dimOff + 8 > boxEnd) return false
        st.trakW = (be32(b, dimOff) >> 16).toInt
        st.trakH = (be32(b, dimOff + 4) >> 16).toInt
      } else if (level == 2 && typ(b, p + 4, "mdia")) {
        if (!walkChildren(b, body, boxEnd, 3, st)) return false
      } else if (level == 3 && typ(b, p + 4, "hdlr")) {
        // FullBox 4 + pre_defined 4, then the handler fourcc
        if (body + 12 > boxEnd) return false
        if (typ(b, body + 8, "vide")) st.trakKind = 1
        else if (typ(b, body + 8, "soun")) st.trakKind = 2
        else st.trakKind = 0
      } else if (level == 3 && typ(b, p + 4, "minf")) {
        if (!walkChildren(b, body, boxEnd, 6, st)) return false
      } else if (level == 6 && typ(b, p + 4, "stbl")) {
        if (!walkChildren(b, body, boxEnd, 7, st)) return false
      } else if (level == 7 && typ(b, p + 4, "stsd")) {
        // FullBox 4 + entry_count 4, then sample entries (each itself
        // a box: size + format fourcc). The FIRST entry's fourcc is
        // the track's codec identity — the crawl-triage filter key.
        if (body + 8 > boxEnd) return false
        val entries = be32(b, body + 4)
        if (entries > 0) {
          // entry header: size(4) + fourcc(4); require printable ASCII
          // so hostile bytes can't masquerade as a codec name
          if (body + 16 > boxEnd) return false
          var i = 0
          var ok = true
          while (i < 4) {
            val c = u8(b, body + 12 + i)
            if (c < 0x20 || c > 0x7E) ok = false
            i += 1
          }
          if (!ok) return false
          st.trakCodec = new String(b, body + 12, 4, "US-ASCII")
        }
      } else if (level == 7 && typ(b, p + 4, "stsz")) {
        // FullBox 4 + sample_size 4 + sample_count 4: the count sits
        // at a fixed offset whatever the (possibly huge) size table
        // holds — O(1), no entry iteration, hostile-size-proof
        if (body + 12 > boxEnd) return false
        st.trakSamples = be32(b, body + 8)
      }
      // every other box (free/skip/mdat/mdhd/minf/...) is skipped by size
      p = boxEnd
    }
    p == to // trailing bytes that are not a whole box = corrupt
  }
}

/** `graft_mp4_encode(w, h, n_video, n_audio, timescale, duration,
  * seed)` → binary: a structurally valid ISO-BMFF file — ftyp
  * ("isom"), an optional `free` box (64-bit largesize on some seeds,
  * certifying the largesize path in every consumer), `moov` with
  * `mvhd` (version 0 or 1 by seed) and one `trak` per track — video
  * traks carry 16.16 tkhd dims + an `mdia`/`hdlr` of `vide`, audio
  * traks zero dims + `soun` — and a trailing `mdat` that on some
  * seeds uses size==0 ("to end of file"), certifying that path too.
  * Deterministic in its arguments, so the DuckDB oracle restates
  * every header field from the doc_id arithmetic directly. */
case class Mp4Encode(children: Seq[Expression]) extends Expression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = {
    val expected = Seq(IntegerType, IntegerType, IntegerType, IntegerType,
      IntegerType, LongType, IntegerType, IntegerType, LongType)
    if (children.length == 9 && children.map(_.dataType) == expected)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_mp4_encode expects (int w, int h, int nVideo, int nAudio, " +
        "int timescale, long duration, int nFragments, int samplesPerFrag, " +
        "long seed)")
  }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_mp4_encode"

  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.exists(_ == null)) null
    else Mp4Encode.encode(vs(0).asInstanceOf[Int], vs(1).asInstanceOf[Int],
      vs(2).asInstanceOf[Int], vs(3).asInstanceOf[Int],
      vs(4).asInstanceOf[Int], vs(5).asInstanceOf[Long],
      vs(6).asInstanceOf[Int], vs(7).asInstanceOf[Int],
      vs(8).asInstanceOf[Long])
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Mp4Encode = copy(children = newChildren)
}

object Mp4Encode {

  private def be16(o: java.io.ByteArrayOutputStream, v: Int): Unit = {
    o.write((v >> 8) & 0xFF); o.write(v & 0xFF)
  }
  private def be32(o: java.io.ByteArrayOutputStream, v: Long): Unit = {
    o.write(((v >> 24) & 0xFF).toInt); o.write(((v >> 16) & 0xFF).toInt)
    o.write(((v >> 8) & 0xFF).toInt); o.write((v & 0xFF).toInt)
  }
  private def be64(o: java.io.ByteArrayOutputStream, v: Long): Unit = {
    be32(o, v >>> 32); be32(o, v & 0xFFFFFFFFL)
  }
  private def fourcc(o: java.io.ByteArrayOutputStream, t: String): Unit =
    t.foreach(c => o.write(c.toInt))
  private def bytesOf(f: java.io.ByteArrayOutputStream => Unit): Array[Byte] = {
    val o = new java.io.ByteArrayOutputStream(); f(o); o.toByteArray
  }
  private def box(o: java.io.ByteArrayOutputStream, t: String,
      body: Array[Byte]): Unit = {
    be32(o, 8L + body.length); fourcc(o, t); o.write(body, 0, body.length)
  }

  def encode(w: Int, h: Int, nVideo: Int, nAudio: Int, timescale: Int,
      duration: Long, nFragments: Int, samplesPerFrag: Int,
      seed: Long): Array[Byte] = {
    if (w <= 0 || w > 8192 || h <= 0 || h > 8192) return null
    if (nVideo < 0 || nVideo > 8 || nAudio < 0 || nAudio > 8 ||
        nVideo + nAudio < 1) return null
    if (nFragments < 0 || nFragments > 64 ||
        (nFragments > 0 && samplesPerFrag <= 0)) return null
    if (timescale <= 0 || duration < 0 || seed < 0) return null
    val mvhdV1 = (seed & 1L) == 1L
    if (!mvhdV1 && duration > 0xFFFFFFFFL) return null // v0 stores u32
    val tkhdV1 = (seed & 2L) == 2L
    val largeFree = seed % 5 == 0
    val openMdat = seed % 7 == 0

    val mvhd = bytesOf { o =>
      o.write(if (mvhdV1) 1 else 0); o.write(0); o.write(0); o.write(0)
      if (mvhdV1) { be64(o, 0L); be64(o, 0L); be32(o, timescale.toLong); be64(o, duration) }
      else { be32(o, 0L); be32(o, 0L); be32(o, timescale.toLong); be32(o, duration) }
      be32(o, 0x00010000L); be16(o, 0x0100) // rate 1.0, volume 1.0
      be16(o, 0); be32(o, 0L); be32(o, 0L) // reserved
      // unity matrix
      be32(o, 0x00010000L); be32(o, 0L); be32(o, 0L)
      be32(o, 0L); be32(o, 0x00010000L); be32(o, 0L)
      be32(o, 0L); be32(o, 0L); be32(o, 0x40000000L)
      (0 until 6).foreach(_ => be32(o, 0L)) // pre_defined
      be32(o, nVideo.toLong + nAudio + 1) // next_track_ID
    }

    def tkhd(trackId: Int, tw: Int, th: Int): Array[Byte] = bytesOf { o =>
      o.write(if (tkhdV1) 1 else 0); o.write(0); o.write(0); o.write(7) // enabled
      if (tkhdV1) { be64(o, 0L); be64(o, 0L); be32(o, trackId.toLong); be32(o, 0L); be64(o, duration) }
      else { be32(o, 0L); be32(o, 0L); be32(o, trackId.toLong); be32(o, 0L); be32(o, duration) }
      be32(o, 0L); be32(o, 0L) // reserved
      be16(o, 0); be16(o, 0) // layer, alternate_group
      be16(o, if (tw == 0) 0x0100 else 0); be16(o, 0) // volume (audio), reserved
      be32(o, 0x00010000L); be32(o, 0L); be32(o, 0L)
      be32(o, 0L); be32(o, 0x00010000L); be32(o, 0L)
      be32(o, 0L); be32(o, 0L); be32(o, 0x40000000L)
      be32(o, tw.toLong << 16); be32(o, th.toLong << 16) // 16.16 fixed
    }

    def hdlr(kind: String, name: String): Array[Byte] = bytesOf { o =>
      be32(o, 0L); be32(o, 0L); fourcc(o, kind)
      be32(o, 0L); be32(o, 0L); be32(o, 0L) // reserved
      name.foreach(c => o.write(c.toInt)); o.write(0)
    }

    def mdhd: Array[Byte] = bytesOf { o =>
      be32(o, 0L); be32(o, 0L); be32(o, 0L)
      be32(o, timescale.toLong); be32(o, duration)
      be16(o, 0x55C4); be16(o, 0) // language "und", pre_defined
    }

    // codec fourccs + per-track sample count, deterministic in seed so
    // the DuckDB oracle restates them from doc_id arithmetic
    val vcodecName = Seq("avc1", "hvc1", "av01")((seed % 3).toInt)
    val stblSamples = seed % 97 + 1

    def stsd(codec: String): Array[Byte] = bytesOf { o =>
      be32(o, 0L); be32(o, 1L) // ver/flags, entry_count = 1
      // minimal SampleEntry body: 6 reserved bytes + data_reference_index
      box(o, codec, bytesOf { e =>
        (0 until 6).foreach(_ => e.write(0)); be16(e, 1)
      })
    }

    def stsz: Array[Byte] = bytesOf { o =>
      be32(o, 0L) // ver/flags
      be32(o, 1L) // sample_size != 0: constant size, NO per-sample table
      be32(o, stblSamples)
    }

    def trak(trackId: Int, video: Boolean): Array[Byte] = bytesOf { o =>
      box(o, "tkhd", if (video) tkhd(trackId, w, h) else tkhd(trackId, 0, 0))
      box(o, "mdia", bytesOf { m =>
        box(m, "mdhd", mdhd)
        box(m, "hdlr", hdlr(if (video) "vide" else "soun",
          if (video) "VideoHandler" else "SoundHandler"))
        box(m, "minf", bytesOf { n =>
          box(n, "stbl", bytesOf { s =>
            box(s, "stsd", stsd(if (video) vcodecName else "mp4a"))
            box(s, "stsz", stsz)
          })
        })
      })
    }

    val moov = bytesOf { o =>
      box(o, "mvhd", mvhd)
      var id = 1
      (0 until nVideo).foreach { _ => box(o, "trak", trak(id, video = true)); id += 1 }
      (0 until nAudio).foreach { _ => box(o, "trak", trak(id, video = false)); id += 1 }
    }

    bytesOf { o =>
      box(o, "ftyp", bytesOf { f =>
        fourcc(f, "isom"); be32(f, 0x200L); fourcc(f, "isom"); fourcc(f, "mp42")
      })
      val freeBody = Array.fill[Byte]((seed % 11).toInt + 1)(0x66)
      if (largeFree) { // 64-bit largesize free box
        be32(o, 1L); fourcc(o, "free"); be64(o, 16L + freeBody.length)
        o.write(freeBody, 0, freeBody.length)
      } else box(o, "free", freeBody)
      box(o, "moov", moov)
      // movie fragments (fMP4): moof [mfhd + one traf per track, each
      // carrying a trun with its sample count] followed by its mdat
      (0 until nFragments).foreach { fi =>
        box(o, "moof", bytesOf { m =>
          box(m, "mfhd", bytesOf { x => be32(x, 0L); be32(x, fi.toLong + 1) })
          (1 to nVideo + nAudio).foreach { tid =>
            box(m, "traf", bytesOf { t =>
              box(t, "tfhd", bytesOf { x => be32(x, 0L); be32(x, tid.toLong) })
              box(t, "trun", bytesOf { x =>
                be32(x, 0L); be32(x, samplesPerFrag.toLong)
              })
            })
          }
        })
        box(o, "mdat", Array.fill[Byte](((seed + fi) % 7).toInt + 1)(0x6D))
      }
      val payload = Array.fill[Byte]((seed % 13).toInt + 2)(0x6D)
      if (openMdat) { // size==0: mdat extends to end of file
        be32(o, 0L); fourcc(o, "mdat"); o.write(payload, 0, payload.length)
      } else box(o, "mdat", payload)
    }
  }
}
