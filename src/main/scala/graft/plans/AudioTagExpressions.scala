package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** AUDIO TAG triage — the audio twin of the EXIF pass: title / artist
  * / album without decoding a single audio frame, the signals a crawl
  * pipeline dedups and cohorts on (same-recording-different-encode
  * dedup keys, per-artist corpus balance).
  *
  * `graft_audio_tags(binary)` dispatches on the leading magic:
  *
  *  - `fLaC`: the metadata-block chain walk ([[FlacMeta]]'s grammar)
  *    to the VORBIS_COMMENT block (type 4), then the Vorbis comment
  *    structure (little-endian u32 lengths: vendor string, comment
  *    count, then `KEY=value` UTF-8 entries; keys case-insensitive
  *    per spec) — TITLE / ARTIST / ALBUM collected, vendor reported;
  *  - `ID3`: an ID3v2.2, v2.3 or v2.4 tag (v2.2: 3-char IDs + 3-byte
  *    plain-BE sizes, text frames TT2/TP1/TAL; v2.3/v2.4: frame sizes
  *    plain-32-bit vs syncsafe — the one wire difference that matters
  *    here), walking text frames TIT2 / TPE1 / TALB; ISO-8859-1,
  *    UTF-8, BOM'd UTF-16 (encoding 1) and v2.4's BOM-less UTF-16BE
  *    (encoding 2) all decode STRICTLY — a missing BOM, odd length,
  *    or malformed surrogate declines the field to NULL (the byte
  *    order is never guessed, mojibake never served); padding
  *    terminates the frame walk.
  *
  * Anything else — including a bare MP3 frame chain with no ID3 tag —
  * is NULL: tags either exist structurally or the row has none.
  * Parse-or-NULL with every length bounds-checked, ≤4096 blocks /
  * ≤256 comments / ≤256 frames ceilings, O(tag bytes) work, O(1)
  * memory, whole-stage codegen. (Reference analogue:
  * aristoteles.py:334-478's opaque-payload model, deepened exactly
  * like the EXIF/MP4 triage tiers.) */
case class AudioTags(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_audio_tags expects a binary column, got ${child.dataType.catalogString}")
  override def dataType: DataType = AudioTags.schema
  override def nullable: Boolean = true
  override def prettyName: String = "graft_audio_tags"

  override def nullSafeEval(input: Any): Any =
    AudioTags.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => s"""
      ${ev.value} = graft.plans.AudioTags.parse($b);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): AudioTags =
    copy(child = newChild)
}

object AudioTags {

  val schema: StructType = StructType(Seq(
    StructField("container", StringType), // "flac" | "mp3"
    StructField("title", StringType),
    StructField("artist", StringType),
    StructField("album", StringType),
    StructField("vendor", StringType))) // FLAC only

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF
  private def le32(b: Array[Byte], i: Int): Long =
    u8(b, i).toLong | (u8(b, i + 1).toLong << 8) |
      (u8(b, i + 2).toLong << 16) | (u8(b, i + 3).toLong << 24)
  private def be24(b: Array[Byte], i: Int): Int =
    (u8(b, i) << 16) | (u8(b, i + 1) << 8) | u8(b, i + 2)
  private def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1).toLong << 16) |
      (u8(b, i + 2).toLong << 8) | u8(b, i + 3).toLong

  /** Decode of b[at, at+len) refusing control bytes — hostile bytes
    * cannot masquerade as a title; trailing NULs stripped. */
  private def text(b: Array[Byte], at: Int, len0: Int,
      charset: String = "UTF-8"): String = {
    var len = len0
    while (len > 0 && b(at + len - 1) == 0) len -= 1
    if (len < 0) return null
    var i = 0
    while (i < len) { if (u8(b, at + i) < 0x20) return null; i += 1 }
    new String(b, at, len, charset)
  }

  /** Strict UTF-16 decode of b[at, at+len): BOM'd UTF-16 (ID3
    * encoding 1, v2.3/v2.4) or BOM-less UTF-16BE (encoding 2, v2.4
    * only). Trailing 16-bit NUL terminators are stripped AFTER the
    * BOM; odd-length payloads, a missing BOM where one is required,
    * malformed surrogates, and decoded control characters all decline
    * to null — the dominant encoding for non-ASCII MP3 tags decodes,
    * but a byte order is never guessed and mojibake never served. */
  private def textUtf16(b: Array[Byte], at0: Int, len0: Int,
      bomRequired: Boolean): String = {
    var at = at0; var len = len0
    var cs: java.nio.charset.Charset = null
    if (len >= 2 && u8(b, at) == 0xFF && u8(b, at + 1) == 0xFE) {
      cs = java.nio.charset.StandardCharsets.UTF_16LE; at += 2; len -= 2
    } else if (len >= 2 && u8(b, at) == 0xFE && u8(b, at + 1) == 0xFF) {
      cs = java.nio.charset.StandardCharsets.UTF_16BE; at += 2; len -= 2
    } else if (!bomRequired) cs = java.nio.charset.StandardCharsets.UTF_16BE
    else return null
    if (len < 0 || (len & 1) != 0) return null
    while (len >= 2 && b(at + len - 1) == 0 && b(at + len - 2) == 0) len -= 2
    if (len == 0) return ""
    val dec = cs.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
    val s = try dec.decode(java.nio.ByteBuffer.wrap(b, at, len)).toString
    catch { case _: java.nio.charset.CharacterCodingException => return null }
    var i = 0
    while (i < s.length) { if (s.charAt(i) < 0x20) return null; i += 1 }
    s
  }

  def parse(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 10) return null
    if (b(0) == 'f' && b(1) == 'L' && b(2) == 'a' && b(3) == 'C') parseFlac(b)
    else if (b(0) == 'I' && b(1) == 'D' && b(2) == '3') parseId3(b)
    else null
  }

  private def row(container: String, title: String, artist: String,
      album: String, vendor: String): InternalRow =
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(container),
      if (title == null) null else UTF8String.fromString(title),
      if (artist == null) null else UTF8String.fromString(artist),
      if (album == null) null else UTF8String.fromString(album),
      if (vendor == null) null else UTF8String.fromString(vendor)))

  /** FLAC: chain walk to VORBIS_COMMENT, then the Vorbis comment
    * structure. A structurally sound chain with NO comment block is a
    * valid row with NULL tag fields. */
  private def parseFlac(b: Array[Byte]): InternalRow = {
    if (b.length < 42) return null
    if ((u8(b, 4) & 0x7F) != 0 || be24(b, 5) != 34) return null // STREAMINFO first
    var last = (u8(b, 4) & 0x80) != 0
    var off = 8 + 34
    var nBlocks = 1
    var vcAt = -1; var vcEnd = -1
    while (!last && nBlocks < 4096) {
      if (off + 4 > b.length) return null
      last = (u8(b, off) & 0x80) != 0
      val tpe = u8(b, off) & 0x7F
      if (tpe == 0 || tpe == 127) return null
      val len = be24(b, off + 1)
      if (off + 4 + len > b.length) return null
      if (tpe == 4 && vcAt < 0) { vcAt = off + 4; vcEnd = off + 4 + len }
      off += 4 + len
      nBlocks += 1
    }
    if (!last) return null
    if (vcAt < 0) return row("flac", null, null, null, null)
    // Vorbis comment structure (all lengths LE u32, all inside block)
    var p = vcAt
    if (p + 4 > vcEnd) return null
    val vlen = le32(b, p)
    if (vlen < 0 || p + 4 + vlen > vcEnd) return null
    val vendor = text(b, p + 4, vlen.toInt)
    p += 4 + vlen.toInt
    if (p + 4 > vcEnd) return null
    val nc = le32(b, p)
    if (nc < 0 || nc > 256) return null
    p += 4
    var title: String = null; var artist: String = null; var album: String = null
    var c = 0L
    while (c < nc) {
      if (p + 4 > vcEnd) return null
      val clen = le32(b, p)
      if (clen < 0 || p + 4 + clen > vcEnd) return null
      // split at the first '=': key (case-insensitive per spec) = value
      var eq = -1
      var i = 0
      while (eq < 0 && i < clen) {
        if (b(p + 4 + i) == '=') eq = i
        i += 1
      }
      if (eq > 0) {
        val key = new String(b, p + 4, eq, "US-ASCII").toUpperCase
        val v = text(b, p + 4 + eq + 1, clen.toInt - eq - 1)
        key match {
          case "TITLE" if title == null => title = v
          case "ARTIST" if artist == null => artist = v
          case "ALBUM" if album == null => album = v
          case _ => ()
        }
      }
      p += 4 + clen.toInt
      c += 1
    }
    row("flac", title, artist, album, vendor)
  }

  /** ID3v2.2 text-frame walk (the 1990s-heritage grammar still common
    * on old rips): 3-char frame IDs + 3-byte plain-BE sizes, no frame
    * flags; text frames TT2/TP1/TAL with encoding 0 = ISO-8859-1 or
    * 1 = BOM'd UCS-2 (decoded via the same strict UTF-16 path — UCS-2
    * is its BMP subset). Unsynchronised/compressed tags decline. */
  private def parseId3v22(b: Array[Byte], tagEnd: Int): InternalRow = {
    var p = 10
    var title: String = null; var artist: String = null; var album: String = null
    var frames = 0
    var done = false
    while (!done && p + 6 <= tagEnd && frames < 256) {
      if (b(p) == 0) done = true // zero padding ends the frame area
      else {
        val id = new String(b, p, 3, "US-ASCII")
        if (!id.forall(ch => (ch >= 'A' && ch <= 'Z') || (ch >= '0' && ch <= '9')))
          return null
        val fsize = be24(b, p + 3).toLong
        if (fsize < 0 || p + 6L + fsize > tagEnd) return null
        if (fsize >= 1 && id.startsWith("T")) {
          val enc = u8(b, p + 6)
          val v =
            if (enc == 0) text(b, p + 7, fsize.toInt - 1, "ISO-8859-1")
            else if (enc == 1)
              textUtf16(b, p + 7, fsize.toInt - 1, bomRequired = true)
            else null
          id match {
            case "TT2" if title == null => title = v
            case "TP1" if artist == null => artist = v
            case "TAL" if album == null => album = v
            case _ => ()
          }
        }
        p += 6 + fsize.toInt
        frames += 1
      }
    }
    row("mp3", title, artist, album, null)
  }

  /** ID3v2.2/2.3/2.4 text-frame walk (v2.2 hands off to
    * [[parseId3v22]] — 6-byte frames, a different grammar). Declines
    * unsynchronised tags and extended headers — NULL, never a
    * misread. */
  private def parseId3(b: Array[Byte]): InternalRow = {
    val ver = u8(b, 3)
    if (ver != 2 && ver != 3 && ver != 4) return null
    if ((u8(b, 5) & 0xE0) != 0) return null // unsync/ext/experimental bits
    var size = 0
    var i = 6
    while (i < 10) {
      if ((u8(b, i) & 0x80) != 0) return null
      size = (size << 7) | u8(b, i)
      i += 1
    }
    val tagEnd = 10 + size
    if (tagEnd > b.length) return null
    if (ver == 2) return parseId3v22(b, tagEnd)
    var p = 10
    var title: String = null; var artist: String = null; var album: String = null
    var frames = 0
    var done = false
    while (!done && p + 10 <= tagEnd && frames < 256) {
      if (b(p) == 0) done = true // zero padding ends the frame area
      else {
        val id = new String(b, p, 4, "US-ASCII")
        if (!id.forall(ch => (ch >= 'A' && ch <= 'Z') || (ch >= '0' && ch <= '9')))
          return null
        val fsize: Long =
          if (ver == 4) {
            // v2.4 frame sizes are syncsafe: high bit clear in each byte
            if ((u8(b, p + 4) & 0x80) != 0 || (u8(b, p + 5) & 0x80) != 0 ||
              (u8(b, p + 6) & 0x80) != 0 || (u8(b, p + 7) & 0x80) != 0) return null
            ((u8(b, p + 4) << 21) | (u8(b, p + 5) << 14) |
              (u8(b, p + 6) << 7) | u8(b, p + 7)).toLong
          } else be32(b, p + 4)
        // bounds in LONG: a hostile v2.3 size near 2^31 overflows the
        // Int sum and would sneak past an Int comparison
        if (fsize < 0 || p + 10L + fsize > tagEnd) return null
        val flags = (u8(b, p + 8) << 8) | u8(b, p + 9)
        // compressed/encrypted/grouped frames: skip, never misread
        val plain = (flags & 0x00FF) == 0 && (flags & 0xF000) == 0
        if (plain && fsize >= 1 && id.startsWith("T")) {
          val enc = u8(b, p + 10)
          // 0 = ISO-8859-1, 3 = UTF-8; 1 = BOM'd UTF-16 (v2.3/v2.4);
          // 2 = BOM-less UTF-16BE (v2.4 ONLY — in v2.3 it's invalid
          // and declines). Order is never guessed: encoding 1 without
          // a BOM declines the field, not the tag.
          val v =
            if (enc == 0) text(b, p + 11, fsize.toInt - 1, "ISO-8859-1")
            else if (enc == 3) text(b, p + 11, fsize.toInt - 1)
            else if (enc == 1)
              textUtf16(b, p + 11, fsize.toInt - 1, bomRequired = true)
            else if (enc == 2 && ver == 4)
              textUtf16(b, p + 11, fsize.toInt - 1, bomRequired = false)
            else null
          id match {
            case "TIT2" if title == null => title = v
            case "TPE1" if artist == null => artist = v
            case "TALB" if album == null => album = v
            case _ => ()
          }
        }
        p += 10 + fsize.toInt // bounded by tagEnd above
        frames += 1
      }
    }
    row("mp3", title, artist, album, null)
  }
}
