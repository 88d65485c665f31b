package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal column plumbing (north-star extension): treat media as
  * opaque `binary` columns with typed metadata, decoded by REAL
  * parsers — [[imageMeta]]/[[audioMeta]]/[[pixelStats]] parse
  * PNG/JPEG/WAV headers and uncompressed BMP pixels from the public
  * file-format specs via native codegen'd expressions
  * (plans.ImageExpressions), and [[featureExtract]] runs the
  * production shape: a MAGIC-BYTE dispatch over a mixed-format media
  * column, routing each payload to its format's parser inside one
  * whole-stage-codegen'd scan. No codec stubs remain: every decode in
  * this file walks actual bytes per spec. (Formats needing external
  * codecs — video, compressed audio — would slot in as further
  * codegen'd expressions behind the same dispatch.)
  */
object Multimodal {

  /** The documents table as a multimodal table: text re-encoded as the
    * opaque binary payload + deterministic digests. Fully
    * SQL-expressible, so this query carries the oracle for the binary
    * plumbing. */
  def binaryMeta(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"),
        sha2(col("text"), 256).as("digest"))
      .orderBy(col("doc_id"))

  /** Frame sampling over an opaque payload: k evenly-spaced fixed-width
    * windows per document, each digested — the shape of "sample N video
    * frames / audio windows and fingerprint them" with the codec
    * stubbed to substring+md5 (deterministic, so this query carries an
    * exact oracle; a real build swaps the window expression for a
    * decoder call, the explode/offset/digest plumbing is unchanged).
    * One generator per row, no shuffle at all. */
  def frameSample(spark: SparkSession, dir: String, k: Int = 4): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"), length(col("text")).as("n"))
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(0), lit(k - 1))).as("i"),
        greatest(lit(1), (col("n") / k).cast("int")).as("step"))
      .select(col("doc_id"),
        col("i").cast("long").as("frame_idx"),
        (lit(1) + col("i") * col("step")).cast("long").as("start"),
        md5(col("text").substr(lit(1) + col("i") * col("step"), lit(32))).as("digest"))
      .orderBy(col("doc_id"), col("frame_idx"))

  /** REAL feature extraction over a MIXED-format media column — the
    * production shape of a multimodal curation pass: one scan, a
    * magic-byte dispatch (`BM` / `RIFF..WAVE` / PNG signature / JPEG
    * SOI, read from the payload bytes, never from out-of-band hints)
    * routing each row to its format's native parser, and a unified
    * metadata/feature row out. All four decoders are the real
    * spec-walking expressions (plans.ImageExpressions); BMP rows carry
    * an actual pixel-derived feature (mean channel value from the
    * decoded sums). CaseWhen short-circuits per row, so each payload
    * pays exactly its own format's parse, in whole-stage codegen.
    *
    * The corpus is constructed per-row to the public specs from doc_id
    * arithmetic (doc_id%4 picks the format; every 97th doc is a
    * deliberate non-media payload that must yield NULLs), so the
    * DuckDB oracle recomputes the expected output directly and the
    * compare is an exact construct→dispatch→parse round trip. */
  def featureExtract(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.call_function
    val id = col("doc_id")
    val q = (id / 4).cast("long")
    def bh(n: org.apache.spark.sql.Column) = lpad(hex(n.cast("long") % 256), 2, "0")
    def le16h(n: org.apache.spark.sql.Column) =
      concat(bh(n), bh((n.cast("long") / 256).cast("long")))
    def le32h(n: org.apache.spark.sql.Column) =
      concat(le16h(n.cast("long") % 65536), le16h((n.cast("long") / 65536).cast("long")))
    def be(n: org.apache.spark.sql.Column, hexDigits: Int) =
      unhex(lpad(hex(n), hexDigits, "0"))

    // BMP (id%4==0): 24bpp bottom-up, alternating two-pixel pattern
    val bw = (lit(2) * (lit(1) + q % 3)).cast("long")
    val bhgt = (lit(1) + q % 4).cast("long")
    val rowSize = ((bw * 3 + 3) / 4).cast("long") * 4
    val pxA = concat(bh(id), bh(id * 3), bh(id * 7))
    val pxB = concat(bh(id * 11), bh(id * 13), bh(id * 17))
    val rowHex = concat(
      call_function("repeat", concat(pxA, pxB), (bw / 2).cast("int")),
      call_function("repeat", lit("00"), (rowSize - bw * 3).cast("int")))
    val bmpPayload = unhex(concat(
      lit("424D"), le32h(lit(54L) + rowSize * bhgt), lit("00000000"), le32h(lit(54L)),
      le32h(lit(40L)), le32h(bw), le32h(bhgt), le16h(lit(1L)), le16h(lit(24L)),
      le32h(lit(0L)), le32h(rowSize * bhgt), le32h(lit(2835L)), le32h(lit(2835L)),
      le32h(lit(0L)), le32h(lit(0L)), call_function("repeat", rowHex, bhgt.cast("int"))))

    // WAV (id%4==1): PCM fmt chunk; odd q prepends a JUNK chunk so the
    // walk — not a fixed offset — is certified here too
    val rate = (lit(8000) * (lit(1) + q % 6)).cast("long")
    val wchan = (lit(1) + q % 2).cast("long")
    val wbits = (lit(8) * (lit(1) + q % 3)).cast("long")
    val fmtChunk = concat(
      lit("666D742010000000" + "0100"),
      le16h(wchan), le32h(rate), le32h(rate * wchan * wbits / 8),
      le16h(wchan * wbits / 8), le16h(wbits))
    val wavBody = when(q % 2 === 1, concat(lit("4A554E4B04000000DEADBEEF"), fmtChunk))
      .otherwise(fmtChunk)
    val wavPayload = unhex(concat(
      lit("52494646"), le32h((length(wavBody) / 2).cast("long") + 4),
      lit("57415645"), wavBody))

    // PNG (id%4==2) / JPEG (id%4==3): signature+IHDR / SOI+APP0+SOF0
    val iw = (id % 1021 + 16).cast("int")
    val ih = ((id * 7) % 739 + 16).cast("int")
    val pngPayload = concat(
      unhex(lit("89504E470D0A1A0A" + "0000000D" + "49484452")),
      be(iw, 8), be(ih, 8), unhex(lit("0806000000" + "00000000")))
    val jpegPayload = concat(
      unhex(lit("FFD8" + "FFE000104A46494600010100000100010000")),
      unhex(lit("FFC00011" + "08")), be(ih, 4), be(iw, 4),
      unhex(lit("03012200021101031101")))

    val payload = when(id % 97 === 0, encode(col("text").substr(1, 16), "UTF-8"))
      .when(id % 4 === 0, bmpPayload)
      .when(id % 4 === 1, wavPayload)
      .when(id % 4 === 2, pngPayload)
      .otherwise(jpegPayload)

    // ---- the dispatch: magic bytes -> that format's parser ----------
    val p = col("media")
    val isBmp = hex(col("media").substr(1, 2)) === "424D"
    val isWav = hex(col("media").substr(1, 4)) === "52494646" &&
      hex(col("media").substr(9, 4)) === "57415645"
    val isImg = hex(col("media").substr(1, 8)) === "89504E470D0A1A0A" ||
      hex(col("media").substr(1, 2)) === "FFD8"
    val bmp = graft.plans.VectorExpressions.bmpStats(p)
    val wav = graft.plans.VectorExpressions.wavMeta(p)
    val img = graft.plans.VectorExpressions.imgMeta(p)
    val nullInt = lit(null).cast("int")
    Tables.documents(spark, dir)
      .select(col("doc_id"), payload.as("media"))
      .select(
        col("doc_id"),
        length(p).cast("long").as("n_bytes"),
        when(isBmp, when(bmp.isNotNull, "bmp"))
          .when(isWav, when(wav.isNotNull, "wav"))
          .when(isImg, img.getField("format")).as("media_type"),
        when(isBmp, bmp.getField("width"))
          .when(isImg, img.getField("width")).otherwise(nullInt).as("width"),
        when(isBmp, bmp.getField("height"))
          .when(isImg, img.getField("height")).otherwise(nullInt).as("height"),
        when(isBmp, when(bmp.isNotNull, 3))
          .when(isWav, wav.getField("channels")).otherwise(nullInt).as("channels"),
        when(isWav, wav.getField("sample_rate")).otherwise(nullInt).as("sample_rate"),
        when(isBmp, round(
          (bmp.getField("sum_r") + bmp.getField("sum_g") + bmp.getField("sum_b")) /
            (lit(3.0) * bmp.getField("n_pixels")), 6))
          .otherwise(lit(null).cast("double")).as("mean_px"))
      .orderBy(col("doc_id"))
  }

  /** Real multimodal decode: PNG/JPEG header parsing over a binary
    * media column via the codegen'd [[graft.plans.ImageMeta]]
    * expression (magic bytes, IHDR offsets, JPEG segment walk — the
    * public file-format specs, see ImageExpressions.scala).
    *
    * The container ships no image files, so the media column is
    * CONSTRUCTED per-row to the byte layout of the specs themselves —
    * a spec-conformant PNG signature+IHDR or SOI+APP0(JFIF)+SOF0
    * stream carrying dimensions derived from doc_id (and a deliberate
    * non-image payload every 97th doc) — and the parser must invert
    * that construction exactly: format routing, big-endian dims at the
    * right offsets, APP0 skipped by its length field, NULL on the
    * corrupt rows. Construction is plain codegen'd byte concat
    * (hex/lpad/unhex big-endians), so the whole query is one
    * shuffle-free scan; the DuckDB oracle recomputes the expected
    * metadata from the same doc_id arithmetic, making the compare an
    * exact round-trip check of the parser. (Unit tests additionally
    * feed multi-segment JPEGs and truncation edge cases —
    * ImageMetaSpec.) */
  def imageMeta(spark: SparkSession, dir: String): DataFrame = {
    val w = (col("doc_id") % 1021 + 16).cast("int")
    val h = ((col("doc_id") * 7) % 739 + 16).cast("int")
    def be(n: org.apache.spark.sql.Column, hexDigits: Int) =
      unhex(lpad(hex(n), hexDigits, "0"))
    // PNG: signature, IHDR length (13), "IHDR", w, h, bit depth 8,
    // color type 6 (RGBA), compression/filter/interlace 0, CRC bytes
    val png = concat(
      unhex(lit("89504E470D0A1A0A" + "0000000D" + "49484452")),
      be(w, 8), be(h, 8),
      unhex(lit("0806000000" + "00000000")))
    // JPEG: SOI, APP0/JFIF (16-byte segment the parser must SKIP via
    // its length field), then SOF0 (len 17, precision 8, h, w, 3
    // components 4:2:0)
    val jpeg = concat(
      unhex(lit("FFD8" + "FFE000104A46494600010100000100010000")),
      unhex(lit("FFC00011" + "08")), be(h, 4), be(w, 4),
      unhex(lit("03012200021101031101")))
    val corrupt = encode(col("text").substr(1, 16), "UTF-8")
    val payload = when(col("doc_id") % 97 === 0, corrupt)
      .when(col("doc_id") % 2 === 0, png)
      .otherwise(jpeg)
    Tables.documents(spark, dir)
      .select(col("doc_id"), payload.as("img"))
      .select(col("doc_id"),
        length(col("img")).cast("long").as("n_bytes"),
        graft.plans.VectorExpressions.imgMeta(col("img")).as("m"))
      .select(col("doc_id"), col("n_bytes"),
        col("m.format").as("format"),
        col("m.width").as("width"),
        col("m.height").as("height"))
      .orderBy(col("doc_id"))
  }

  /** Audio twin of [[imageMeta]]: WAV header decode over constructed
    * spec-conformant RIFF/WAVE streams (plans.WavMeta walks the chunk
    * list by little-endian size fields). Odd doc_ids carry a JUNK chunk
    * BEFORE fmt so the chunk walk — not a fixed offset read — is what
    * the oracle certifies; every 89th doc is a deliberate non-WAV
    * payload that must parse NULL. */
  def audioMeta(spark: SparkSession, dir: String): DataFrame = {
    val rate = (lit(8000) * (lit(1) + col("doc_id") % 6)).cast("int")
    val channels = (lit(1) + col("doc_id") % 2).cast("int")
    val bits = (lit(8) * (lit(1) + col("doc_id") % 3)).cast("int")
    // little-endian byte strings from integral columns (all values here
    // are small positive ints, so the double `/` then long cast is exact
    // floor division)
    def byteOf(n: org.apache.spark.sql.Column) =
      unhex(lpad(hex(n.cast("long") % 256), 2, "0"))
    def le16(n: org.apache.spark.sql.Column) =
      concat(byteOf(n), byteOf((n.cast("long") / 256).cast("long")))
    def le32(n: org.apache.spark.sql.Column) =
      concat(le16(n.cast("long") % 65536), le16((n.cast("long") / 65536).cast("long")))
    val byteRate = (rate.cast("long") * channels * bits / 8).cast("long")
    val blockAlign = (channels.cast("long") * bits / 8).cast("long")
    val fmtChunk = concat(
      unhex(lit("666D742010000000" + "0100")), // "fmt ", size 16 LE, PCM
      le16(channels), le32(rate), le32(byteRate), le16(blockAlign), le16(bits))
    val junkChunk = unhex(lit("4A554E4B04000000DEADBEEF")) // "JUNK", size 4 LE, payload
    val riff = (body: org.apache.spark.sql.Column) =>
      concat(unhex(lit("52494646")), le32(length(body) + 4), unhex(lit("57415645")), body)
    val wav = when(col("doc_id") % 2 === 1, riff(concat(junkChunk, fmtChunk)))
      .otherwise(riff(fmtChunk))
    val payload = when(col("doc_id") % 89 === 0, encode(col("text").substr(1, 12), "UTF-8"))
      .otherwise(wav)
    Tables.documents(spark, dir)
      .select(col("doc_id"), payload.as("audio"))
      .select(col("doc_id"),
        length(col("audio")).cast("long").as("n_bytes"),
        graft.plans.VectorExpressions.wavMeta(col("audio")).as("m"))
      .select(col("doc_id"), col("n_bytes"),
        col("m.channels").as("channels"),
        col("m.sample_rate").as("sample_rate"),
        col("m.bits").as("bits"))
      .orderBy(col("doc_id"))
  }

  /** REAL pixel decode (plans.BmpStats): per-document uncompressed
    * 24-bit BMPs are constructed to the public spec — 14-byte file
    * header, 40-byte info header, raw BGR rows each padded to a 4-byte
    * boundary — carrying an alternating two-pixel pattern whose exact
    * integer channel sums the decoder must reproduce. Docs where
    * doc_id % 5 = 0 encode NEGATIVE height (top-down row order, same
    * sums) so orientation handling is certified too; every 83rd doc is
    * a non-BMP payload that must decode NULL. A wrong treatment of row
    * padding, BGR order, or orientation changes the sums and fails the
    * oracle round-trip. */
  def pixelStats(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.call_function
    def bh(n: org.apache.spark.sql.Column) = lpad(hex(n.cast("long") % 256), 2, "0")
    def le16h(n: org.apache.spark.sql.Column) =
      concat(bh(n), bh((n.cast("long") / 256).cast("long")))
    def le32h(n: org.apache.spark.sql.Column) =
      concat(le16h(n.cast("long") % 65536), le16h((n.cast("long") / 65536).cast("long")))
    val id = col("doc_id")
    val w = (lit(2) * (lit(1) + id % 3)).cast("long")  // 2 | 4 | 6
    val h = (lit(1) + id % 4).cast("long")             // 1..4
    val rowSize = ((w * 3 + 3) / 4).cast("long") * 4   // 4-byte row alignment
    val pad = (rowSize - w * 3).cast("int")
    val pxA = concat(bh(id), bh(id * 3), bh(id * 7))          // stored B,G,R
    val pxB = concat(bh(id * 11), bh(id * 13), bh(id * 17))
    val rowHex = concat(
      call_function("repeat", concat(pxA, pxB), (w / 2).cast("int")),
      call_function("repeat", lit("00"), pad))
    val dataHex = call_function("repeat", rowHex, h.cast("int"))
    val imgSize = rowSize * h
    val hEnc = when(id % 5 === 0, lit(4294967296L) - h).otherwise(h) // two's-complement top-down
    val bmp = unhex(concat(
      lit("424D"), le32h(lit(54L) + imgSize), lit("00000000"), le32h(lit(54L)),
      le32h(lit(40L)), le32h(w), le32h(hEnc), le16h(lit(1L)), le16h(lit(24L)),
      le32h(lit(0L)), le32h(imgSize), le32h(lit(2835L)), le32h(lit(2835L)),
      le32h(lit(0L)), le32h(lit(0L)), dataHex))
    val payload = when(id % 83 === 0, encode(col("text").substr(1, 10), "UTF-8"))
      .otherwise(bmp)
    Tables.documents(spark, dir)
      .select(col("doc_id"), payload.as("img"))
      .select(col("doc_id"), graft.plans.VectorExpressions.bmpStats(col("img")).as("s"))
      .select(col("doc_id"),
        col("s.width").as("width"), col("s.height").as("height"),
        col("s.sum_r").as("sum_r"), col("s.sum_g").as("sum_g"),
        col("s.sum_b").as("sum_b"), col("s.n_pixels").as("n_pixels"))
      .orderBy(col("doc_id"))
  }

}
