package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** PDF TEXT extraction, first tier — the part of a PDF an LLM corpus
  * pipeline actually wants, built on the triage's xref machinery
  * ([[PdfMeta.chainWalk]]: both table layouts, /Prev chains, object
  * streams, FlateDecode) plus three new pieces from ISO 32000 alone:
  * a full object parser (§7.3: literal/hex strings, names, arrays,
  * dicts, indirect references), the page-TREE walk (§7.7.3 —
  * intermediate /Pages nodes, attribute inheritance of /Resources),
  * and a content-stream interpreter over the text operator subset
  * (§9.4): BT/ET, Tj, TJ, ', ", Td, TD, T*, Tm, Tf — plus q/Q font
  * save/restore (§8.4.2) and Do over /Form XObjects (§8.10: the
  * form's content executes in place under its OWN /Resources with
  * the implicit state save/restore, depth-bounded; image XObjects
  * are inert).
  *
  * `graft_pdf_page_texts(binary)` → `array<string>`, one element per
  * leaf page in page-tree order. Extraction contract (documented
  * because layout reconstruction is heuristic by nature, and the
  * contract must be deterministic for the oracle):
  *
  *  - Tj / the string operand of ' and " append the decoded string;
  *  - TJ appends its string elements; a numeric element <= -100
  *    (thousandths of an em — a gap wider than a tenth of the font
  *    size, the conventional word-break cut) appends ONE space;
  *    smaller kerning adjustments append nothing;
  *  - line-advance operators (Td/TD with a nonzero ty, T*, ', ", Tm)
  *    append '\n' — but only when the page buffer is non-empty and
  *    does not already end with one, so a positioning preamble before
  *    the first show never fabricates blank lines;
  *  - multiple /Contents streams concatenate with a newline between
  *    (§7.8.2 treats them as one stream with whitespace between);
  *  - pages with no /Contents contribute an empty string.
  *
  * Character decode has three tiers. A SIMPLE font's /ToUnicode
  * CMap, when present, is the extraction AUTHORITY (§9.10.2 lists it
  * first): 1-byte codes through its bfchar/bfrange sections — the
  * only faithful path for the symbolic subsetted fonts modern
  * writers emit. Without one, SYMBOLIC fonts (descriptor flag bit 3,
  * or the Symbol/ZapfDingbats standard-14 names) DECLINE — their
  * codes index glyphs, not characters — and non-symbolic simple
  * fonts go through the Appendix D encodings (transcribed below):
  * /WinAnsiEncoding,
  * /StandardEncoding, /MacRomanEncoding, an absent /Encoding
  * (Standard — the
  * non-symbolic Type1 default), or an /Encoding DICT with
  * /BaseEncoding and /Differences — the §9.6.5 per-code overrides
  * resolved through an Adobe-Glyph-List-convention name map (ASCII +
  * Latin-1 + the publishing set + the algorithmic uniXXXX/uXXXX
  * forms). /Type0 COMPOSITE fonts (§9.7 — the dominant modern-PDF
  * case) decode when /Encoding is the NAME Identity-H (2-byte codes)
  * and a /ToUnicode CMap stream (§9.10.3) is present: its
  * bfchar/bfrange sections map each code to well-formed UTF-16 text
  * (multi-unit targets and surrogate PAIRS included), the range
  * increment walks the final UTF-16 unit and declines rather than
  * enter the surrogate block. The mojibake-never law from the HTTP
  * text tier applies at PAGE granularity: a code the encoding leaves
  * UNDEFINED, a glyph NAME outside the map, an unmapped CID, a
  * ragged (odd-length) 2-byte string, a font outside both tiers
  * (/MacExpertEncoding, symbolic fonts, Identity-V vertical writing,
  * a Type0 with no /ToUnicode, `usecmap` of anything but Identity-H
  * — embedded CMap streams themselves decode, see [[parseCidCMap]]),
  * an inline image (BI — its raw payload
  * would desynchronize any token walk), a Do naming a missing or
  * non-Form/Image XObject, an orphan Q, a form nest past depth 8
  * (incl. reference cycles), or a stream filter outside
  * the served set — FlateDecode, LZWDecode (§7.4.4, EarlyChange
  * quirk honored), ASCIIHexDecode, ASCII85Decode, chained per the
  * §7.4 /Filter array up to 4 deep —
  * DECLINES that page — a NULL array element — while the rest of the
  * document still serves (fonts decode lazily on Tf, so a broken
  * font poisons only pages that select it). STRUCTURAL failures —
  * the xref chain, the catalog, the page TREE — decline the whole
  * document (NULL). Encrypted documents serve through the standard
  * security handler when the USER password is empty ([[PdfCrypt]]:
  * RC4 V1/V2, AESV2, AESV3 R5/R6); a real password or a non-Standard
  * handler declines. Either way nothing is ever garbled; each
  * declined case is a later tier.
  *
  * Parse-or-NULL bounds throughout: object parse depth 16, 4096
  * array elements / 256 dict pairs / 64 KiB strings, 2048 page-tree
  * nodes / 512 leaf pages, 4096 resolved objects per document with
  * cycle detection, every inflate behind the shared 1 MiB bomb
  * ceiling, and a global token guard per content stream. */
case class PdfPageTexts(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_pdf_page_texts expects a binary column, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_pdf_page_texts"

  override def nullSafeEval(input: Any): Any =
    PdfPageTexts.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => s"""
      ${ev.value} = graft.plans.PdfPageTexts.parse($b);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): PdfPageTexts =
    copy(child = newChild)
}

object PdfPageTexts {

  private val MaxDepth = 16
  private val MaxArr = 4096
  private val MaxDictPairs = 256
  private val MaxStr = 1 << 16
  private val MaxTreeNodes = 2048
  private val MaxPages = 512
  private val MaxResolved = 4096
  private val MaxOps = 1 << 20

  // ---- object model (§7.3) ------------------------------------------

  private sealed trait PObj
  private final case class PNum(v: Double) extends PObj
  private final case class PName(v: String) extends PObj
  private final case class PStr(v: Array[Byte]) extends PObj
  private final case class PArr(v: Vector[PObj]) extends PObj
  private final case class PDict(m: Map[String, PObj]) extends PObj
  private final case class PRef(num: Long) extends PObj
  private final case class PBool(v: Boolean) extends PObj
  private case object PNull extends PObj
  /** An indirect stream object: its dict plus the DECODED payload. */
  private final case class PStream(dict: PDict, data: Array[Byte]) extends PObj

  /** Decline-by-exception internally (cheaper to write than Option
    * threading through a recursive grammar); [[parse]] catches it once
    * at the top. Never escapes this object. */
  private final class Decline extends RuntimeException(null, null, false, false)
  private def decline(): Nothing = throw new Decline

  private def isWs(c: Int): Boolean =
    c == ' ' || c == '\n' || c == '\r' || c == '\t' || c == '\f' || c == 0
  private def isDelim(c: Int): Boolean =
    c == '(' || c == ')' || c == '<' || c == '>' || c == '[' || c == ']' ||
      c == '{' || c == '}' || c == '/' || c == '%'

  // ---- lexer / object parser ----------------------------------------

  private final class Lex(val b: Array[Byte], var i: Int) {
    def atEnd: Boolean = i >= b.length

    def skipWs(): Unit = {
      var guard = 0
      while (i < b.length && guard < MaxOps) {
        if (isWs(b(i) & 0xFF)) i += 1
        else if (b(i) == '%') {
          while (i < b.length && b(i) != '\n' && b(i) != '\r') i += 1
        } else return
        guard += 1
      }
    }

    def peek: Int = if (i < b.length) b(i) & 0xFF else -1

    /** A regular-character token (operator or bare keyword). */
    def token(): String = {
      skipWs()
      val start = i
      while (i < b.length && !isWs(b(i) & 0xFF) && !isDelim(b(i) & 0xFF) &&
        i - start < 32) i += 1
      if (i == start) decline()
      new String(b, start, i - start, "ISO-8859-1")
    }

    def name(): String = {
      // caller consumed '/'
      val sb = new java.lang.StringBuilder(16)
      while (i < b.length && !isWs(b(i) & 0xFF) && !isDelim(b(i) & 0xFF)) {
        if (sb.length > 256) decline()
        val c = b(i) & 0xFF
        if (c == '#' && i + 2 < b.length) { // #xx hex escape (§7.3.5)
          val h = Character.digit(b(i + 1), 16)
          val l = Character.digit(b(i + 2), 16)
          if (h < 0 || l < 0) decline()
          sb.append(((h << 4) | l).toChar)
          i += 3
        } else { sb.append(c.toChar); i += 1 }
      }
      sb.toString
    }

    def number(): Double = {
      skipWs()
      val start = i
      var seen = false
      if (i < b.length && (b(i) == '+' || b(i) == '-')) i += 1
      while (i < b.length && ((b(i) >= '0' && b(i) <= '9') || b(i) == '.') &&
        i - start < 24) { seen = true; i += 1 }
      if (!seen) decline()
      val s = new String(b, start, i - start, "ISO-8859-1")
      try s.toDouble catch { case _: NumberFormatException => decline() }
    }

    /** Literal string (§7.3.4.2): balanced parens, the eight escapes,
      * octal escapes, escaped-EOL continuation. */
    def literalString(): Array[Byte] = {
      // caller consumed '('
      val out = new java.io.ByteArrayOutputStream(64)
      var depth = 1
      var guard = 0
      while (depth > 0) {
        if (i >= b.length || guard > MaxStr) decline()
        guard += 1
        val c = b(i) & 0xFF; i += 1
        if (c == '\\') {
          if (i >= b.length) decline()
          val e = b(i) & 0xFF; i += 1
          e match {
            case 'n' => out.write('\n')
            case 'r' => out.write('\r')
            case 't' => out.write('\t')
            case 'b' => out.write('\b')
            case 'f' => out.write('\f')
            case '(' => out.write('(')
            case ')' => out.write(')')
            case '\\' => out.write('\\')
            case '\r' => if (i < b.length && b(i) == '\n') i += 1 // line fold
            case '\n' => ()
            case d if d >= '0' && d <= '7' =>
              var v = d - '0'
              var k = 0
              while (k < 2 && i < b.length && b(i) >= '0' && b(i) <= '7') {
                v = v * 8 + (b(i) - '0'); i += 1; k += 1
              }
              out.write(v & 0xFF)
            case other => out.write(other) // \x = x (§7.3.4.2)
          }
        } else if (c == '(') { depth += 1; out.write('(') }
        else if (c == ')') { depth -= 1; if (depth > 0) out.write(')') }
        else out.write(c)
      }
      out.toByteArray
    }

    /** Hex string (§7.3.4.3); odd final digit pads with 0. */
    def hexString(): Array[Byte] = {
      // caller consumed '<'
      val out = new java.io.ByteArrayOutputStream(32)
      var hi = -1
      var guard = 0
      while (true) {
        if (i >= b.length || guard > MaxStr * 2) decline()
        guard += 1
        val c = b(i) & 0xFF; i += 1
        if (c == '>') {
          if (hi >= 0) out.write(hi << 4)
          return out.toByteArray
        } else if (!isWs(c)) {
          val d = Character.digit(c, 16)
          if (d < 0) decline()
          if (hi < 0) hi = d else { out.write((hi << 4) | d); hi = -1 }
        }
      }
      null // unreachable
    }

    /** One object. `refs` allows the `N G R` indirect-reference form
      * (object space); content-stream operands set it false so bare
      * integers stay numbers. */
    def obj(depth: Int, refs: Boolean): PObj = {
      if (depth > MaxDepth) decline()
      skipWs()
      if (i >= b.length) decline()
      val c = b(i) & 0xFF
      if (c == '/') { i += 1; PName(name()) }
      else if (c == '(') { i += 1; PStr(literalString()) }
      else if (c == '[') {
        i += 1
        val buf = Vector.newBuilder[PObj]
        var n = 0
        while ({ skipWs(); peek != ']' }) {
          if (n >= MaxArr || atEnd) decline()
          buf += obj(depth + 1, refs)
          n += 1
        }
        i += 1
        PArr(buf.result())
      } else if (c == '<') {
        if (i + 1 < b.length && b(i + 1) == '<') {
          i += 2
          val m = Map.newBuilder[String, PObj]
          var n = 0
          while ({ skipWs(); !(peek == '>' && i + 1 < b.length && b(i + 1) == '>') }) {
            if (n >= MaxDictPairs || atEnd) decline()
            skipWs()
            if (peek != '/') decline()
            i += 1
            val k = name()
            m += k -> obj(depth + 1, refs)
            n += 1
          }
          i += 2
          PDict(m.result())
        } else { i += 1; PStr(hexString()) }
      } else if (c == '+' || c == '-' || c == '.' || (c >= '0' && c <= '9')) {
        val v = number()
        if (refs && v >= 0 && v == math.floor(v)) {
          // lookahead for "gen R"
          val mark = i
          skipWs()
          val p2 = peek
          if (p2 >= '0' && p2 <= '9') {
            try {
              number()
              skipWs()
              if (peek == 'R') {
                i += 1
                val after = if (i < b.length) b(i) & 0xFF else ' '
                if (isWs(after) || isDelim(after)) return PRef(v.toLong)
              }
            } catch { case _: Decline => () }
          }
          i = mark
        }
        PNum(v)
      } else {
        token() match {
          case "true" => PBool(true)
          case "false" => PBool(false)
          case "null" => PNull
          case _ => decline()
        }
      }
    }
  }

  // ---- LZW (ISO 32000 §7.4.4) ----------------------------------------

  /** The PDF flavor of LZW: MSB-first variable-width codes (9→12
    * bits), code 256 = clear-table, 257 = EOD, new entries from 258.
    * The EarlyChange quirk (default 1) widens the code one step EARLY
    * — at table size 511/1023/2047 instead of 512/1024/2048.
    * [[decode]] is strict parse-or-NULL: an out-of-range code, a
    * table overflow without a clear, a stream that ends without EOD,
    * or output past the ceiling all return null. [[encode]] is the
    * fixture twin (the round-trip differential), mirroring the
    * decoder's table growth exactly — including the one-entry lag
    * between encoder and decoder dictionaries that the width
    * bookkeeping must track. */
  private[graft] object LzwCodec {

    def decode(b: Array[Byte], earlyChange: Int, ceiling: Int): Array[Byte] = {
      if (b == null) return null
      val prefix = new Array[Int](4096)
      val suffix = new Array[Byte](4096)
      val length = new Array[Int](4096)
      var i = 0
      while (i < 256) { prefix(i) = -1; suffix(i) = i.toByte; length(i) = 1; i += 1 }
      var next = 258
      var width = 9
      val out = new java.io.ByteArrayOutputStream(math.min(b.length * 3, 1 << 16))
      val tmp = new Array[Byte](4096)
      // MSB-first bit reader
      var bitBuf = 0L
      var nbits = 0
      var pos = 0
      def read(): Int = {
        while (nbits < width) {
          if (pos >= b.length) return -1
          bitBuf = (bitBuf << 8) | (b(pos) & 0xFF); pos += 1; nbits += 8
        }
        val v = ((bitBuf >>> (nbits - width)) & ((1 << width) - 1)).toInt
        nbits -= width
        v
      }
      /** Emit one table entry; returns its FIRST byte, or -1 past the
        * ceiling. */
      def emit(code: Int): Int = {
        val l = length(code)
        if (out.size() + l > ceiling) return -1
        var c = code
        var k = l
        while (c >= 0) { k -= 1; tmp(k) = suffix(c); c = prefix(c) }
        out.write(tmp, 0, l)
        tmp(0) & 0xFF
      }
      var prev = -1
      while (true) {
        val code = read()
        if (code < 0) return null // ran out of bits before EOD
        if (code == 256) { next = 258; width = 9; prev = -1 }
        else if (code == 257) return out.toByteArray
        else if (prev < 0) {
          if (code > 255) return null // first code after clear: literal only
          if (emit(code) < 0) return null
          prev = code
        } else {
          if (code > next || next >= 4096) return null
          val first =
            if (code < next) {
              val f = emit(code)
              if (f < 0) return null
              f
            } else {
              // KwKwK: the entry being defined right now
              var c = prev
              while (prefix(c) >= 0) c = prefix(c)
              suffix(c) & 0xFF
            }
          prefix(next) = prev
          suffix(next) = first.toByte
          length(next) = length(prev) + 1
          next += 1
          if (code == next - 1 && emit(code) < 0) return null // the KwKwK emit
          prev = code
          if (width < 12 && next + earlyChange >= (1 << width)) width += 1
        }
      }
      null // unreachable
    }

    def encode(data: Array[Byte], earlyChange: Int): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream(data.length)
      var bitBuf = 0L
      var nbits = 0
      var width = 9
      def write(code: Int): Unit = {
        bitBuf = (bitBuf << width) | code; nbits += width
        while (nbits >= 8) {
          out.write(((bitBuf >>> (nbits - 8)) & 0xFF).toInt); nbits -= 8
        }
      }
      // (prefixCode << 8 | byte) -> code
      val dict = new java.util.HashMap[Integer, Integer]()
      var encNext = 258
      var decNext = 258 // the DECODER's table size: lags encNext by one
      var first = true
      def postEmit(): Unit = {
        if (!first) decNext += 1
        first = false
        if (width < 12 && decNext + earlyChange >= (1 << width)) width += 1
      }
      write(256)
      if (data.length > 0) {
        var w = data(0) & 0xFF
        var i = 1
        while (i < data.length) {
          val k = data(i) & 0xFF
          val key = Integer.valueOf((w << 8) | k)
          val hit = dict.get(key)
          if (hit != null) w = hit.intValue()
          else {
            write(w); postEmit()
            if (encNext < 4096) { dict.put(key, encNext); encNext += 1 }
            else {
              write(256)
              dict.clear(); encNext = 258; decNext = 258; width = 9; first = true
            }
            w = k
          }
          i += 1
        }
        write(w); postEmit()
      }
      write(257)
      if (nbits > 0) out.write(((bitBuf << (8 - nbits)) & 0xFF).toInt)
      out.toByteArray
    }
  }

  /** §7.4.2 ASCIIHexDecode: hex pairs, whitespace skipped, '>' is
    * EOD (an odd final digit pads with 0); any other character, or a
    * missing EOD, declines (null). */
  private[graft] def asciiHexDecode(b: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(b.length / 2)
    var hi = -1
    var i = 0
    while (i < b.length) {
      val c = b(i) & 0xFF
      if (c == '>') {
        if (hi >= 0) out.write(hi << 4)
        return out.toByteArray
      } else if (!isWs(c)) {
        val d = Character.digit(c, 16)
        if (d < 0) return null
        if (hi < 0) hi = d else { out.write((hi << 4) | d); hi = -1 }
      }
      i += 1
    }
    null // no EOD marker
  }

  /** §7.4.3 ASCII85Decode: 5 chars '!'..'u' → 4 bytes base 85; 'z' =
    * four zero bytes (only between groups); whitespace skipped; '~>'
    * is EOD, with a final partial group of n chars (2..4) yielding
    * n−1 bytes via 'u' padding. Value overflow past 2^32−1, a 1-char
    * partial group, 'z' inside a group, any other character, or a
    * missing EOD declines (null). */
  private[graft] def ascii85Decode(b: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(b.length)
    val group = new Array[Int](5)
    var n = 0
    def flush(chars: Int): Boolean = {
      var v = 0L
      var k = 0
      while (k < 5) { v = v * 85 + (if (k < chars) group(k) else 84); k += 1 }
      if (v > 0xFFFFFFFFL) return false
      var shift = 24
      var emitted = 0
      while (emitted < chars - 1) {
        out.write(((v >>> shift) & 0xFF).toInt)
        shift -= 8
        emitted += 1
      }
      true
    }
    var i = 0
    while (i < b.length) {
      val c = b(i) & 0xFF
      if (c == '~') {
        if (i + 1 >= b.length || b(i + 1) != '>') return null
        if (n == 1) return null // a 1-char partial group is malformed
        if (n > 1 && !flush(n)) return null
        return out.toByteArray
      } else if (c == 'z') {
        if (n != 0) return null // 'z' inside a group is malformed
        out.write(0); out.write(0); out.write(0); out.write(0)
      } else if (c >= '!' && c <= 'u') {
        group(n) = c - '!'
        n += 1
        if (n == 5) { if (!flush(5)) return null; n = 0 }
      } else if (!isWs(c)) return null
      i += 1
    }
    null // no EOD marker
  }

  /** The encoder twins for the fixture differential. */
  private[graft] def asciiHexEncode(data: Array[Byte]): Array[Byte] = {
    val sb = new java.lang.StringBuilder(data.length * 2 + 1)
    data.foreach(x => sb.append(f"${x & 0xFF}%02x"))
    sb.append('>')
    sb.toString.getBytes("ISO-8859-1")
  }

  private[graft] def ascii85Encode(data: Array[Byte]): Array[Byte] = {
    val sb = new java.lang.StringBuilder(data.length * 5 / 4 + 8)
    var i = 0
    while (i < data.length) {
      val rem = math.min(4, data.length - i)
      var v = 0L
      var k = 0
      while (k < 4) {
        v = (v << 8) | (if (k < rem) data(i + k) & 0xFF else 0)
        k += 1
      }
      if (v == 0 && rem == 4) sb.append('z')
      else {
        val cs = new Array[Char](5)
        var w = v
        k = 4
        while (k >= 0) { cs(k) = ('!' + (w % 85).toInt).toChar; w /= 85; k -= 1 }
        var emit = 0
        while (emit < rem + 1) { sb.append(cs(emit)); emit += 1 }
      }
      i += 4
    }
    sb.append("~>")
    sb.toString.getBytes("ISO-8859-1")
  }

  // ---- indirect-object resolution -----------------------------------

  /** Per-document resolution state: the chain's entry map plus a memo
    * with in-progress markers (cycle = decline). */
  private final class Resolver(b: Array[Byte],
      entries: java.util.HashMap[Long, PdfMeta.Entry]) {
    private val memo = new java.util.HashMap[Long, PObj]()
    private val inProgress = new java.util.HashSet[Long]()
    private var resolved = 0
    /** The standard-security-handler decryptor, installed AFTER the
      * /Encrypt dict itself was resolved (it is never encrypted). */
    var crypt: PdfCrypt = null

    def apply(o: PObj): PObj = o match {
      case PRef(n) => resolve(n)
      case other => other
    }

    /** Clear in-flight markers after a PAGE-scoped decline was caught:
      * an exception mid-resolve leaves entries that would read as
      * false cycles on the next page. The memo only ever holds
      * COMPLETED results, so it stays. */
    def recover(): Unit = inProgress.clear()

    def resolve(num: Long): PObj = {
      val hit = memo.get(num)
      if (hit != null) return hit
      if (!inProgress.add(num)) decline() // reference cycle
      resolved += 1
      if (resolved > MaxResolved) decline()
      val e = entries.get(num)
      if (e == null) decline()
      val out = e.kind match {
        case 1 => atOffset(e.a)
        case 2 => fromObjStm(e.a, num)
        case _ => decline()
      }
      inProgress.remove(num)
      memo.put(num, out)
      out
    }

    /** Parse the object at a type-1 entry's byte offset; if its dict
      * is followed by `stream`, decode the payload (§7.3.8). */
    private def atOffset(off: Long): PObj = {
      if (off < 0 || off >= b.length) decline()
      val lex = new Lex(b, off.toInt)
      val objNum = lex.number() // "N G obj" — the pair keys Algorithm 1
      lex.skipWs()
      val genNum = lex.number()
      if (lex.token() != "obj") decline()
      val o = lex.obj(0, refs = true)
      val mark = lex.i
      lex.skipWs()
      val isStream = lex.i + 6 <= b.length &&
        new String(b, lex.i, 6, "ISO-8859-1") == "stream"
      if (!isStream) { lex.i = mark; return o }
      val dict = o match { case d: PDict => d; case _ => decline() }
      lex.i += 6
      if (lex.i < b.length && b(lex.i) == '\r') lex.i += 1
      if (lex.i >= b.length || b(lex.i) != '\n') decline()
      lex.i += 1
      val len = this(dict.m.getOrElse("Length", decline())) match {
        case PNum(v) if v >= 0 && v == math.floor(v) => v.toLong
        case _ => decline()
      }
      if (lex.i + len > b.length) decline()
      val body = java.util.Arrays.copyOfRange(b, lex.i, lex.i + len.toInt)
      // decryption precedes the filter pipeline (§7.6.2 order); xref
      // streams are NEVER encrypted whatever the handler says
      val plain =
        if (crypt == null) body
        else dict.m.get("Type") match {
          case Some(PName("XRef")) => body
          case _ =>
            val d = crypt.decryptStream(objNum.toLong, genNum.toInt, body)
            if (d == null) decline()
            d
        }
      val raw = decodeFilters(dict, plain)
      PStream(dict, raw)
    }

    /** The §7.4 filter pipeline: /Filter as a name or an array of up
      * to 4 names applied in order, /DecodeParms a parallel dict /
      * null / array. The served set — FlateDecode, LZWDecode
      * (EarlyChange 0|1), ASCIIHexDecode, ASCII85Decode — covers
      * every spec'd text-bearing combination (the classic legacy
      * chain is [/ASCII85Decode /FlateDecode]); anything else is the
      * recorded envelope. Every stage is strict parse-or-NULL behind
      * the shared 1 MiB ceiling. */
    private def decodeFilters(dict: PDict, raw: Array[Byte]): Array[Byte] = {
      val filters: Vector[String] = dict.m.get("Filter") match {
        case None => return raw
        case Some(PName(n)) => Vector(n)
        case Some(PArr(elems)) =>
          elems.map { case PName(n) => n; case _ => decline() }
        case _ => decline()
      }
      if (filters.isEmpty || filters.length > 4) decline()
      val parms: Vector[Option[Map[String, PObj]]] =
        dict.m.get("DecodeParms") match {
          case None => Vector.fill(filters.length)(None)
          case Some(PDict(p)) =>
            if (filters.length != 1) decline()
            Vector(Some(p))
          case Some(PNull) => Vector.fill(filters.length)(None)
          case Some(PArr(elems)) =>
            if (elems.length != filters.length) decline()
            elems.map {
              case PDict(p) => Some(p)
              case PNull => None
              case _ => decline()
            }
          case _ => decline()
        }
      var data = raw
      var k = 0
      while (k < filters.length) {
        data = applyFilter(filters(k), parms(k), data)
        k += 1
      }
      data
    }

    private def applyFilter(name: String, parms: Option[Map[String, PObj]],
        data: Array[Byte]): Array[Byte] = {
      // a predictor on a text-bearing stream is never emitted by real
      // writers; declining beats silently misreading rows of bytes
      parms.foreach(_.get("Predictor") match {
        case None | Some(PNum(1)) => ()
        case _ => decline()
      })
      name match {
        case "FlateDecode" =>
          val out = PdfMeta.flate(data, 0, data.length)
          if (out == null) decline()
          out
        case "LZWDecode" =>
          val early = parms.flatMap(_.get("EarlyChange")) match {
            case None => 1
            case Some(PNum(1)) => 1
            case Some(PNum(0)) => 0
            case _ => decline()
          }
          val out = LzwCodec.decode(data, early, 1 << 20)
          if (out == null) decline()
          out
        case "ASCIIHexDecode" =>
          val out = asciiHexDecode(data)
          if (out == null) decline()
          out
        case "ASCII85Decode" =>
          val out = ascii85Decode(data)
          if (out == null) decline()
          out
        case _ => decline() // DCT/JBIG2/CCITT/RunLength/Crypt: envelope
      }
    }

    /** A type-2 entry: member `num` of object stream `stmNum`
      * (§7.5.7). Members are headerless and never streams. */
    private def fromObjStm(stmNum: Long, num: Long): PObj = {
      val container = resolve(stmNum) match {
        case s: PStream => s
        case _ => decline()
      }
      (container.dict.m.get("Type"), container.dict.m.get("N"),
        container.dict.m.get("First")) match {
        case (Some(PName("ObjStm")), Some(PNum(n)), Some(PNum(first)))
            if n > 0 && n <= 4096 && first >= 0 =>
          val data = container.data
          val h = new Lex(data, 0)
          var k = 0
          while (k < n.toInt) {
            val objNum = h.number()
            val rel = h.number()
            if (objNum == num) {
              val at = first + rel
              if (at < 0 || at >= data.length) decline()
              return new Lex(data, at.toInt).obj(0, refs = true)
            }
            k += 1
          }
          decline()
        case _ => decline()
      }
    }
  }

  // ---- encodings (ISO 32000 Appendix D) -------------------------------

  /** WinAnsiEncoding: the cp1252 high table with Appendix D's own
    * quirks — 0xA0 is a second code for SPACE and 0xAD for HYPHEN
    * (not no-break space / soft hyphen); the five cp1252 holes are
    * undefined. 0 = undefined (decline). */
  private[plans] val WinAnsi: Array[Char] = {
    val t = new Array[Char](256)
    var i = 0x20
    while (i <= 0x7E) { t(i) = i.toChar; i += 1 }
    // 0x80..0x9F: the cp1252 printables; the five holes (81 8D 8F
    // 90 9D) stay 0 = undefined (decline, never garble)
    val high = Seq(
      0x80 -> '€', 0x82 -> '‚', 0x83 -> 'ƒ', 0x84 -> '„',
      0x85 -> '…', 0x86 -> '†', 0x87 -> '‡', 0x88 -> 'ˆ',
      0x89 -> '‰', 0x8A -> 'Š', 0x8B -> '‹', 0x8C -> 'Œ',
      0x8E -> 'Ž', 0x91 -> '‘', 0x92 -> '’', 0x93 -> '“',
      0x94 -> '”', 0x95 -> '•', 0x96 -> '–', 0x97 -> '—',
      0x98 -> '˜', 0x99 -> '™', 0x9A -> 'š', 0x9B -> '›',
      0x9C -> 'œ', 0x9E -> 'ž', 0x9F -> 'Ÿ')
    high.foreach { case (c, ch) => t(c) = ch }
    i = 0xA0
    while (i <= 0xFF) { t(i) = i.toChar; i += 1 }
    t(0xA0) = ' ' // space's second code
    t(0xAD) = '-' // hyphen's second code
    t
  }

  /** StandardEncoding, transcribed from the Appendix D table. The two
    * ASCII-range deviations are 0x27 → quoteright and 0x60 →
    * quoteleft; the high range is the sparse Adobe set. 0 = undefined. */
  private[plans] val Standard: Array[Char] = {
    val t = new Array[Char](256)
    var i = 0x20
    while (i <= 0x7E) { t(i) = i.toChar; i += 1 }
    t(0x27) = '’' // quoteright
    t(0x60) = '‘' // quoteleft
    val high = Seq(
      0xA1 -> '¡', 0xA2 -> '¢', 0xA3 -> '£', 0xA4 -> '⁄',
      0xA5 -> '¥', 0xA6 -> 'ƒ', 0xA7 -> '§', 0xA8 -> '¤',
      0xA9 -> '\'', 0xAA -> '“', 0xAB -> '«', 0xAC -> '‹',
      0xAD -> '›', 0xAE -> 'ﬁ', 0xAF -> 'ﬂ',
      0xB1 -> '–', 0xB2 -> '†', 0xB3 -> '‡', 0xB4 -> '·',
      0xB6 -> '¶', 0xB7 -> '•', 0xB8 -> '‚', 0xB9 -> '„',
      0xBA -> '”', 0xBB -> '»', 0xBC -> '…', 0xBD -> '‰',
      0xBF -> '¿',
      0xC1 -> '`', 0xC2 -> '´', 0xC3 -> 'ˆ', 0xC4 -> '˜',
      0xC5 -> '¯', 0xC6 -> '˘', 0xC7 -> '˙', 0xC8 -> '¨',
      0xCA -> '˚', 0xCB -> '¸', 0xCD -> '˝', 0xCE -> '˛',
      0xCF -> 'ˇ', 0xD0 -> '—',
      0xE1 -> 'Æ', 0xE3 -> 'ª', 0xE8 -> 'Ł', 0xE9 -> 'Ø',
      0xEA -> 'Œ', 0xEB -> 'º',
      0xF1 -> 'æ', 0xF5 -> 'ı', 0xF8 -> 'ł', 0xF9 -> 'ø',
      0xFA -> 'œ', 0xFB -> 'ß')
    high.foreach { case (c, ch) => t(c) = ch }
    t
  }

  /** MacRomanEncoding: ASCII + the Mac OS Roman high table, built
    * from the JDK's own x-MacRoman decoder (an independent
    * transcription of the same Apple table) with Appendix D's OWN
    * deviations patched on top: 0xCA is a second code for SPACE (not
    * no-break space), 0xDB is the CURRENCY sign (Appendix D predates
    * Mac OS 8.5 moving the euro there), and 0xF0 (the Apple-logo
    * glyph) stays undefined — no faithful Unicode char exists, so
    * that code declines rather than guesses. On a JRE without the
    * charset the high range stays undefined (those codes decline —
    * still faithful, never garbled). */
  private[plans] val MacRoman: Array[Char] = {
    val t = new Array[Char](256)
    var i = 0x20
    while (i <= 0x7E) { t(i) = i.toChar; i += 1 }
    try {
      val dec = java.nio.charset.Charset.forName("x-MacRoman")
      i = 0x80
      while (i <= 0xFF) {
        val s = new String(Array(i.toByte), dec)
        if (s.length == 1 && s.charAt(0) != '�') t(i) = s.charAt(0)
        i += 1
      }
      t(0xCA) = ' '
      t(0xDB) = '¤'
      t(0xF0) = 0.toChar
    } catch { case _: Exception => () }
    t
  }

  /** Glyph-name → character map for /Differences (the Adobe Glyph
    * List conventions): ASCII names, letters as their own names, the
    * Latin-1 accented set, the Appendix D publishing set, and the
    * algorithmic uniXXXX / uXXXX forms. A name outside all of these
    * DECLINES the document — faithful-or-NULL, never a guessed
    * glyph. */
  private[plans] val GlyphNames: Map[String, Char] = {
    val ascii = Seq(
      "space" -> ' ', "exclam" -> '!', "quotedbl" -> '"',
      "numbersign" -> '#', "dollar" -> '$', "percent" -> '%',
      "ampersand" -> '&', "quotesingle" -> '\'', "parenleft" -> '(',
      "parenright" -> ')', "asterisk" -> '*', "plus" -> '+',
      "comma" -> ',', "hyphen" -> '-', "period" -> '.', "slash" -> '/',
      "colon" -> ':', "semicolon" -> ';', "less" -> '<', "equal" -> '=',
      "greater" -> '>', "question" -> '?', "at" -> '@',
      "bracketleft" -> '[', "backslash" -> '\\', "bracketright" -> ']',
      "asciicircum" -> '^', "underscore" -> '_', "grave" -> '`',
      "braceleft" -> '{', "bar" -> '|', "braceright" -> '}',
      "asciitilde" -> '~')
    val letters = (('A' to 'Z') ++ ('a' to 'z')).map(c => c.toString -> c)
    val digits = Seq("zero", "one", "two", "three", "four", "five",
      "six", "seven", "eight", "nine").zipWithIndex
      .map { case (n, i) => n -> ('0' + i).toChar }
    val latin1 = Seq(
      "exclamdown" -> '¡', "cent" -> '¢', "sterling" -> '£',
      "currency" -> '¤', "yen" -> '¥', "brokenbar" -> '¦',
      "section" -> '§', "dieresis" -> '¨', "copyright" -> '©',
      "ordfeminine" -> 'ª', "guillemotleft" -> '«', "logicalnot" -> '¬',
      "registered" -> '®', "macron" -> '¯', "degree" -> '°',
      "plusminus" -> '±', "acute" -> '´', "mu" -> 'µ',
      "paragraph" -> '¶', "periodcentered" -> '·', "cedilla" -> '¸',
      "ordmasculine" -> 'º', "guillemotright" -> '»',
      "onequarter" -> '¼', "onehalf" -> '½', "threequarters" -> '¾',
      "questiondown" -> '¿',
      "Agrave" -> 'À', "Aacute" -> 'Á', "Acircumflex" -> 'Â',
      "Atilde" -> 'Ã', "Adieresis" -> 'Ä', "Aring" -> 'Å', "AE" -> 'Æ',
      "Ccedilla" -> 'Ç', "Egrave" -> 'È', "Eacute" -> 'É',
      "Ecircumflex" -> 'Ê', "Edieresis" -> 'Ë', "Igrave" -> 'Ì',
      "Iacute" -> 'Í', "Icircumflex" -> 'Î', "Idieresis" -> 'Ï',
      "Eth" -> 'Ð', "Ntilde" -> 'Ñ', "Ograve" -> 'Ò', "Oacute" -> 'Ó',
      "Ocircumflex" -> 'Ô', "Otilde" -> 'Õ', "Odieresis" -> 'Ö',
      "multiply" -> '×', "Oslash" -> 'Ø', "Ugrave" -> 'Ù',
      "Uacute" -> 'Ú', "Ucircumflex" -> 'Û', "Udieresis" -> 'Ü',
      "Yacute" -> 'Ý', "Thorn" -> 'Þ', "germandbls" -> 'ß',
      "agrave" -> 'à', "aacute" -> 'á', "acircumflex" -> 'â',
      "atilde" -> 'ã', "adieresis" -> 'ä', "aring" -> 'å', "ae" -> 'æ',
      "ccedilla" -> 'ç', "egrave" -> 'è', "eacute" -> 'é',
      "ecircumflex" -> 'ê', "edieresis" -> 'ë', "igrave" -> 'ì',
      "iacute" -> 'í', "icircumflex" -> 'î', "idieresis" -> 'ï',
      "eth" -> 'ð', "ntilde" -> 'ñ', "ograve" -> 'ò', "oacute" -> 'ó',
      "ocircumflex" -> 'ô', "otilde" -> 'õ', "odieresis" -> 'ö',
      "divide" -> '÷', "oslash" -> 'ø', "ugrave" -> 'ù',
      "uacute" -> 'ú', "ucircumflex" -> 'û', "udieresis" -> 'ü',
      "yacute" -> 'ý', "thorn" -> 'þ', "ydieresis" -> 'ÿ')
    val publishing = Seq(
      "quoteleft" -> '‘', "quoteright" -> '’', "quotedblleft" -> '“',
      "quotedblright" -> '”', "quotesinglbase" -> '‚',
      "quotedblbase" -> '„', "dagger" -> '†', "daggerdbl" -> '‡',
      "bullet" -> '•', "ellipsis" -> '…', "perthousand" -> '‰',
      "guilsinglleft" -> '‹', "guilsinglright" -> '›',
      "endash" -> '–', "emdash" -> '—', "trademark" -> '™',
      "Euro" -> '€', "florin" -> 'ƒ', "circumflex" -> 'ˆ',
      "tilde" -> '˜', "Scaron" -> 'Š', "scaron" -> 'š',
      "Zcaron" -> 'Ž', "zcaron" -> 'ž', "OE" -> 'Œ', "oe" -> 'œ',
      "Ydieresis" -> 'Ÿ', "fi" -> 'ﬁ', "fl" -> 'ﬂ', "fraction" -> '⁄',
      "dotlessi" -> 'ı', "Lslash" -> 'Ł', "lslash" -> 'ł',
      "breve" -> '˘', "dotaccent" -> '˙', "ring" -> '˚',
      "ogonek" -> '˛', "caron" -> 'ˇ', "hungarumlaut" -> '˝')
    (ascii ++ letters ++ digits ++ latin1 ++ publishing).toMap
  }

  private def glyphChar(name: String): Char =
    GlyphNames.getOrElse(name, {
      // AGL algorithmic forms: uniXXXX (exactly 4 hex) / uXXXX-uXXXXXX
      val hex =
        if (name.startsWith("uni") && name.length == 7) name.substring(3)
        else if (name.startsWith("u") && name.length >= 5 && name.length <= 7)
          name.substring(1)
        else decline()
      if (!hex.forall(c => Character.digit(c, 16) >= 0)) decline()
      val cp = Integer.parseInt(hex, 16)
      // BMP, printable, not a surrogate — outside that, decline (the
      // Char tables cannot carry supplementary planes faithfully)
      if (cp < 0x20 || cp > 0xFFFF || (cp >= 0xD800 && cp <= 0xDFFF))
        decline()
      cp.toChar
    })

  /** A decodable font: a simple 1-byte Appendix D table, a simple
    * font's 1-byte /ToUnicode map, or an Identity-H CID font's 2-byte
    * code → unicode map. */
  private sealed trait FontDec
  private final case class SimpleFont(table: Array[Char]) extends FontDec
  private final case class ByteMapFont(map: java.util.HashMap[Integer, String])
    extends FontDec
  private final case class CidFont(map: java.util.HashMap[Integer, String])
    extends FontDec
  /** An embedded-CMap composite font: the /Encoding stream's
    * codespace segments the show string into 1- and 2-byte codes;
    * the /ToUnicode map is keyed by (length, value) — see
    * [[codeKey]]. */
  private final case class CmapFont(cs: CodeSpace,
      map: java.util.HashMap[Integer, String]) extends FontDec

  /** A parsed codespacerange set: inclusive first-byte spans per code
    * length (the byte-length dispatch is BY FIRST BYTE — mixed-length
    * spans sharing a first byte decline at parse time, so the
    * segmentation is never ambiguous). */
  private final case class CodeSpace(
      one: Vector[(Int, Int)], two: Vector[(Int, Int)]) {
    def lenAt(first: Int): Int = {
      var i = 0
      while (i < one.length) {
        if (first >= one(i)._1 && first <= one(i)._2) return 1
        i += 1
      }
      i = 0
      while (i < two.length) {
        if (first >= two(i)._1 && first <= two(i)._2) return 2
        i += 1
      }
      0 // outside every range: decline at the call site
    }
  }

  /** Variable-width code → map key: 1-byte codes live at 0..255,
    * 2-byte at 0x10000+code — the lengths never collide. */
  private def codeKey(len: Int, code: Int): Int =
    if (len == 1) code else 0x10000 + code

  /** The decode for one font object, or decline.
    *
    * For simple fonts a /ToUnicode CMap, when present, is the
    * extraction AUTHORITY (§9.10.2 lists it first) — 1-byte codes
    * through its bfchar/bfrange sections. Without one, a SYMBOLIC
    * font declines: its codes index glyphs, not characters, so the
    * Appendix D tables would serve mojibake (symbolic = the
    * FontDescriptor's flag bit 3, or the two symbolic standard-14
    * base fonts). Non-symbolic fonts take the Appendix D path. */
  private def fontDec(r: Resolver, font: PObj): FontDec = {
    val dict = r(font) match { case PDict(m) => m; case _ => decline() }
    dict.get("Subtype") match {
      case Some(PName("Type0")) => return cidFont(r, dict)
      case Some(PName("Type1")) | Some(PName("TrueType")) |
        Some(PName("Type3")) | Some(PName("MMType1")) | None => ()
      case _ => decline()
    }
    dict.get("ToUnicode") match {
      case Some(tuRef) => r(tuRef) match {
        case s: PStream => return ByteMapFont(parseToUnicode(s.data, 1))
        case _ => decline()
      }
      case None => ()
    }
    if (isSymbolic(r, dict)) decline()
    SimpleFont(simpleTable(r, dict))
  }

  /** §9.8.2 flag bit 3 on the font descriptor, or a symbolic
    * standard-14 base font (those ship no descriptor). */
  private def isSymbolic(r: Resolver, dict: Map[String, PObj]): Boolean = {
    dict.get("BaseFont") match {
      case Some(PName(n)) if n == "Symbol" || n == "ZapfDingbats" => return true
      case _ => ()
    }
    dict.get("FontDescriptor") match {
      case None => false
      case Some(fd) => r(fd) match {
        case PDict(d) => d.get("Flags") match {
          case Some(PNum(f)) if f >= 0 && f == math.floor(f) =>
            (f.toLong & 4L) != 0
          case _ => decline() // a malformed descriptor: never guess
        }
        case _ => decline()
      }
    }
  }

  /** The /Type0 tier (§9.7), horizontal writing only. /Encoding is
    * either the NAME Identity-H (2-byte codes) or an EMBEDDED CMAP
    * STREAM (§9.7.5.3) whose codespacerange sections drive the 1-/
    * 2-byte code segmentation (the CJK composite case; cidrange
    * content is glyph selection and inert for extraction); an
    * embedded CMap may incorporate Identity-H's 2-byte codespace via
    * `usecmap`. Vertical writing (Identity-V or /WMode 1), `usecmap`
    * of any OTHER CMap (predefined CJK resources are external), and
    * 3-/4-byte codespaces stay the recorded envelope. Unicode text
    * comes from the font's /ToUnicode CMap (§9.10.3) in both forms;
    * a Type0 with no /ToUnicode declines: CIDs carry no inherent
    * character identity, serving them would be a guess. */
  private def cidFont(r: Resolver, dict: Map[String, PObj]): FontDec = {
    val enc = r(dict.getOrElse("Encoding", decline()))
    val tu = r(dict.getOrElse("ToUnicode", decline())) match {
      case s: PStream => s.data
      case _ => decline()
    }
    enc match {
      case PName("Identity-H") => CidFont(parseToUnicode(tu, 2))
      case s: PStream =>
        CmapFont(parseCidCMap(s.data), parseToUnicode(tu, -1))
      case _ => decline()
    }
  }

  /** An embedded /Encoding CMap stream: collect the codespacerange
    * spans (1- and 2-byte; anything wider declines), reject vertical
    * writing (/WMode 1), leave cidrange/cidchar inert. `usecmap`
    * composition (§9.7.5.3) incorporates the used CMap's codespace
    * when — and only when — the operand is the spec-defined
    * Identity-H name (the 2-byte <0000> <FFFF> space): Identity-V is
    * vertical and the predefined CJK CMaps are external resources
    * this offline tier does not ship, so both decline. Mixed-length
    * spans sharing a first byte decline — the show-string
    * segmentation must be deterministic. */
  private def parseCidCMap(data: Array[Byte]): CodeSpace = {
    val lex = new Lex(data, 0)
    var guard = 0
    val one = Vector.newBuilder[(Int, Int)]
    val two = Vector.newBuilder[(Int, Int)]
    var sawSpace = false
    // the name object immediately preceding a usecmap operator (any
    // other intervening object clears it — usecmap's operand is the
    // name on the operand stack, nothing looser)
    var lastName: String = null
    while ({ lex.skipWs(); !lex.atEnd }) {
      guard += 1
      if (guard > MaxOps) decline()
      val c = lex.peek
      if (c == '/') {
        lex.i += 1
        val n = lex.name()
        if (n == "WMode") {
          lex.obj(0, refs = false) match {
            case PNum(v) if v == 0 => ()
            case _ => decline() // vertical writing: recorded envelope
          }
        }
        lastName = n
      } else if (c == '(' || c == '<' || c == '[' || c == '+' || c == '-' ||
        c == '.' || (c >= '0' && c <= '9')) {
        lex.obj(0, refs = false)
        lastName = null
      } else lex.token() match {
        case "begincodespacerange" =>
          lastName = null
          var going = true
          while (going) {
            lex.skipWs()
            if (lex.atEnd) decline()
            if (lex.peek == '<') {
              val lo = lex.obj(0, refs = false) match {
                case PStr(bs) => bs
                case _ => decline()
              }
              val hi = lex.obj(0, refs = false) match {
                case PStr(bs) => bs
                case _ => decline()
              }
              if (lo.length != hi.length) decline()
              sawSpace = true
              lo.length match {
                case 1 => one += (((lo(0) & 0xFF), (hi(0) & 0xFF)))
                case 2 => two += (((lo(0) & 0xFF), (hi(0) & 0xFF)))
                case _ => decline() // 3-/4-byte codes: recorded envelope
              }
            } else if (lex.token() != "endcodespacerange") decline()
            else going = false
          }
        case "usecmap" =>
          // only Identity-H composes; its codespace is the full
          // 2-byte band (ISO 32000 9.7.5.2 defines it in the spec
          // itself — nothing external to resolve)
          if (lastName != "Identity-H") decline()
          two += ((0x00, 0xFF))
          sawSpace = true
          lastName = null
        case _ => lastName = null // cidrange/cidchar content and PS shell: inert
      }
    }
    if (!sawSpace) decline()
    val cs = CodeSpace(one.result(), two.result())
    // the first-byte dispatch must be unambiguous
    var f = 0
    while (f < 256) {
      val in1 = cs.one.exists(r => f >= r._1 && f <= r._2)
      val in2 = cs.two.exists(r => f >= r._1 && f <= r._2)
      if (in1 && in2) decline()
      f += 1
    }
    cs
  }

  /** Total bfchar/bfrange mapping PUTS a ToUnicode CMap may perform —
    * bounds the expansion work of hostile wide ranges. */
  private val MaxCidPuts = 1 << 17
  private val MaxBfSegments = 4096

  /** §9.10.3 ToUnicode CMap: a PostScript-dialect stream whose
    * beginbfchar/endbfchar pairs and beginbfrange/endbfrange triples
    * define code → UTF-16BE text; `codeBytes` is the tier's code
    * width (2 for Identity-H composite fonts, 1 for simple fonts).
    * Source codes of any other width decline; destination strings
    * must be well-formed UTF-16 (surrogates only in pairs, never
    * empty); the range-increment form walks the LAST UTF-16 unit and
    * declines on overflow or entry into the surrogate block;
    * `usecmap` composition declines. The PostScript wrapper
    * (findresource, dict/begin/end, CIDSystemInfo, codespacerange
    * contents) is inert. */
  private def parseToUnicode(data: Array[Byte],
      codeBytes: Int): java.util.HashMap[Integer, String] = {
    val map = new java.util.HashMap[Integer, String]()
    val lex = new Lex(data, 0)
    var guard = 0
    var segments = 0
    var puts = 0

    def put(code: Int, s: String): Unit = {
      puts += 1
      if (puts > MaxCidPuts) decline()
      map.put(code, s)
    }
    // codeBytes -1 = the variable-width embedded-CMap tier: 1- and
    // 2-byte codes both legal, keyed by (length, value) via codeKey
    def srcCode(o: PObj): Int = o match {
      case PStr(bs) if bs.length == codeBytes =>
        if (codeBytes == 1) bs(0) & 0xFF
        else ((bs(0) & 0xFF) << 8) | (bs(1) & 0xFF)
      case PStr(bs) if codeBytes == -1 && bs.length == 1 =>
        codeKey(1, bs(0) & 0xFF)
      case PStr(bs) if codeBytes == -1 && bs.length == 2 =>
        codeKey(2, ((bs(0) & 0xFF) << 8) | (bs(1) & 0xFF))
      case _ => decline() // a code outside this tier's width
    }
    /** The next section element, or None at the section's end token. */
    def elemOrEnd(end: String): Option[PObj] = {
      lex.skipWs()
      if (lex.atEnd) decline()
      val c = lex.peek
      if (c == '<' || c == '(' || c == '[') Some(lex.obj(0, refs = false))
      else { if (lex.token() != end) decline(); None }
    }

    while ({ lex.skipWs(); !lex.atEnd }) {
      guard += 1
      if (guard > MaxOps) decline()
      val c = lex.peek
      if (c == '/' || c == '(' || c == '<' || c == '[' || c == '+' ||
        c == '-' || c == '.' || (c >= '0' && c <= '9')) {
        lex.obj(0, refs = false) // counts, codespace bounds, wrapper dicts
      } else lex.token() match {
        case "beginbfchar" =>
          var going = true
          while (going) {
            segments += 1
            if (segments > MaxBfSegments) decline()
            elemOrEnd("endbfchar") match {
              case None => going = false
              case Some(src) =>
                val dst = lex.obj(0, refs = false) match {
                  case PStr(bs) => utf16be(bs)
                  case _ => decline()
                }
                put(srcCode(src), dst)
            }
          }
        case "beginbfrange" =>
          var going = true
          while (going) {
            segments += 1
            if (segments > MaxBfSegments) decline()
            elemOrEnd("endbfrange") match {
              case None => going = false
              case Some(loObj) =>
                val lo = srcCode(loObj)
                val hi = srcCode(lex.obj(0, refs = false))
                if (hi < lo) decline()
                // variable-width tier: a range must stay in one width
                if (codeBytes == -1 && (lo >= 0x10000) != (hi >= 0x10000))
                  decline()
                lex.obj(0, refs = false) match {
                  case PStr(base) =>
                    val s0 = utf16be(base)
                    var k = 0
                    while (k <= hi - lo) { put(lo + k, bumpLast(s0, k)); k += 1 }
                  case PArr(elems) =>
                    if (elems.length != hi - lo + 1) decline()
                    var k = 0
                    elems.foreach {
                      case PStr(bs) => put(lo + k, utf16be(bs)); k += 1
                      case _ => decline()
                    }
                  case _ => decline()
                }
            }
          }
        case "usecmap" => decline() // CMap composition: recorded envelope
        case _ => () // PostScript wrapper: inert
      }
    }
    map
  }

  /** Decode a CMap destination as UTF-16BE; decline on odd length,
    * emptiness, over-long targets, or unpaired surrogates — a lone
    * surrogate would garble every downstream UTF-8 encode. */
  private def utf16be(bs: Array[Byte]): String = {
    if (bs.length == 0 || bs.length % 2 != 0 || bs.length > 64) decline()
    val n = bs.length / 2
    val cs = new Array[Char](n)
    var i = 0
    while (i < n) {
      cs(i) = (((bs(2 * i) & 0xFF) << 8) | (bs(2 * i + 1) & 0xFF)).toChar
      i += 1
    }
    var k = 0
    while (k < n) {
      val ch = cs(k)
      if (Character.isHighSurrogate(ch)) {
        if (k + 1 >= n || !Character.isLowSurrogate(cs(k + 1))) decline()
        k += 2
      } else if (Character.isLowSurrogate(ch)) decline()
      else k += 1
    }
    new String(cs)
  }

  /** The bfrange increment: base's final UTF-16 unit advanced by k.
    * Declines when the base ends in a surrogate or the advance would
    * overflow or land in the surrogate block — never a garbled char. */
  private def bumpLast(base: String, k: Int): String = {
    if (k == 0) return base
    val last = base.charAt(base.length - 1)
    if (Character.isSurrogate(last)) decline()
    val v = last.toInt + k
    if (v > 0xFFFF || (v >= 0xD800 && v <= 0xDFFF)) decline()
    base.substring(0, base.length - 1) + v.toChar
  }

  /** The simple-encoding table for one non-composite font dict. */
  private def simpleTable(r: Resolver, dict: Map[String, PObj]): Array[Char] = {
    r(dict.getOrElse("Encoding", PName("StandardEncoding"))) match {
      case PName("WinAnsiEncoding") => WinAnsi
      case PName("StandardEncoding") => Standard
      case PName("MacRomanEncoding") => MacRoman
      case PDict(enc) =>
        val base = enc.get("BaseEncoding") match {
          case Some(PName("WinAnsiEncoding")) => WinAnsi
          case Some(PName("MacRomanEncoding")) => MacRoman
          case Some(PName("StandardEncoding")) | None => Standard
          case _ => decline()
        }
        enc.get("Differences") match {
          case None => base
          case Some(dref) => r(dref) match {
            case PArr(elems) =>
              // §9.6.5: an integer sets the next code, each following
              // name claims consecutive codes
              val t = base.clone()
              var code = -1
              elems.foreach {
                case PNum(n) =>
                  if (n < 0 || n > 255 || n != math.floor(n)) decline()
                  code = n.toInt
                case PName(g) =>
                  if (code < 0 || code > 255) decline()
                  t(code) = glyphChar(g)
                  code += 1
                case _ => decline()
              }
              t
            case _ => decline()
          }
        }
      case _ => decline() // MacExpert/symbolic: envelope
    }
  }

  // ---- the content-stream interpreter ---------------------------------

  private final class PageState {
    val out = new java.lang.StringBuilder(256)
    private var font: FontDec = null
    // q/Q: the text-relevant slice of the graphics state is the
    // selected font — Tf inside q..Q must not leak past the Q
    // (§8.4.2; a leaked font decodes the following shows through the
    // WRONG table, which is exactly the garbling this tier refuses)
    private val saved = new scala.collection.mutable.ArrayBuffer[FontDec](4)
    // ONE op budget shared across the page and every form XObject it
    // invokes — nested forms cannot multiply work past MaxOps
    var ops = 0

    // a form XObject executes with the q-stack FLOOR raised to its
    // entry depth: its content cannot pop the invoker's saved entries
    // (a hostile 'Q ... q' body would otherwise swap the invoker's
    // restore target while keeping the net depth balanced)
    private var floor = 0

    def setFontDec(f: FontDec): Unit = font = f
    def fontNow: FontDec = font
    def push(): Unit = {
      if (saved.length >= 64) decline() // runaway q nesting
      saved += font
    }
    def pop(): Unit = {
      if (saved.length <= floor) decline() // an orphan Q: invalid nesting
      font = saved.remove(saved.length - 1)
    }
    def depth: Int = saved.length
    def raiseFloor(): Int = { val f0 = floor; floor = saved.length; f0 }
    def restoreFloor(f0: Int): Unit = floor = f0

    def newline(): Unit = {
      val len = out.length
      if (len > 0 && out.charAt(len - 1) != '\n') out.append('\n')
    }

    def show(s: Array[Byte]): Unit = font match {
      case null => decline() // show before any Tf
      case SimpleFont(table) =>
        var i = 0
        while (i < s.length) {
          val ch = table(s(i) & 0xFF)
          if (ch == 0) decline() // undefined code: never garble
          out.append(ch)
          i += 1
        }
      case ByteMapFont(map) =>
        var i = 0
        while (i < s.length) {
          val u = map.get(s(i) & 0xFF)
          if (u == null) decline() // unmapped code: never garble
          out.append(u)
          i += 1
        }
      case CidFont(map) =>
        // Identity-H strings are 2-byte codes; a ragged string would
        // desynchronize every following code — decline
        if (s.length % 2 != 0) decline()
        var i = 0
        while (i < s.length) {
          val u = map.get(((s(i) & 0xFF) << 8) | (s(i + 1) & 0xFF))
          if (u == null) decline() // unmapped CID: never garble
          out.append(u)
          i += 2
        }
      case CmapFont(cs, map) =>
        // the embedded CMap's codespace segments the string; a first
        // byte outside every range, a truncated 2-byte code, or an
        // unmapped code declines — never a resynchronization guess
        var i = 0
        while (i < s.length) {
          val len = cs.lenAt(s(i) & 0xFF)
          if (len == 0 || i + len > s.length) decline()
          val code =
            if (len == 1) s(i) & 0xFF
            else ((s(i) & 0xFF) << 8) | (s(i + 1) & 0xFF)
          val u = map.get(codeKey(len, code))
          if (u == null) decline()
          out.append(u)
          i += len
        }
    }
  }

  /** The resource context a content stream runs under: lazy font and
    * XObject lookups against ITS OWN /Resources dict (a form XObject
    * gets a fresh context over its own resources; one missing there
    * falls back to the invoker's, the universal reader-compat rule
    * for pre-1.2 forms). */
  private final class ResCtx(r: Resolver, res: Option[PObj]) {
    private lazy val resMap: Map[String, PObj] = res match {
      case None => Map.empty
      case Some(o) => r(o) match {
        case PDict(m) => m
        case _ => decline()
      }
    }
    private lazy val fontRaw: Map[String, PObj] = resMap.get("Font") match {
      case None => Map.empty
      case Some(f) => r(f) match {
        case PDict(m) => m
        case _ => decline()
      }
    }
    // fonts decode LAZILY on Tf: a broken font in the resource dict
    // only poisons pages that actually select it
    private val fontCache = new java.util.HashMap[String, FontDec]()
    def font(n: String): FontDec = {
      val hit = fontCache.get(n)
      if (hit != null) hit
      else {
        val d = fontDec(r, fontRaw.getOrElse(n, decline()))
        fontCache.put(n, d)
        d
      }
    }
    /** Resolve a Do operand: Some((form stream, the context its
      * content runs under)) for /Form, None for /Image (paints
      * pixels, no text effect), decline for anything else or a name
      * the dict does not carry. The resolved form CONTEXT is memoized
      * per name so a page invoking the same form many times parses
      * its fonts once (the per-page font-cache discipline, extended
      * to forms). */
    private val xobjCache =
      new java.util.HashMap[String, Option[(PStream, ResCtx)]]()
    def xobjForm(n: String): Option[(PStream, ResCtx)] = {
      val hit = xobjCache.get(n)
      if (hit != null) return hit
      val xm = resMap.get("XObject") match {
        case None => decline() // a Do with no /XObject dict at all
        case Some(x) => r(x) match {
          case PDict(m) => m
          case _ => decline()
        }
      }
      val out = r(xm.getOrElse(n, decline())) match {
        case s: PStream => s.dict.m.get("Subtype") match {
          case Some(PName("Image")) => None
          case Some(PName("Form")) =>
            Some((s, new ResCtx(r, s.dict.m.get("Resources").orElse(res))))
          case _ => decline() // /PS and friends: the recorded envelope
        }
        case _ => decline()
      }
      xobjCache.put(n, out)
      out
    }
  }

  private val MaxFormDepth = 8

  private def runContent(data: Array[Byte], st: PageState, ctx: ResCtx,
      r: Resolver, depth: Int): Unit = {
    if (depth > MaxFormDepth) decline() // incl. form reference cycles
    val lex = new Lex(data, 0)
    val operands = new scala.collection.mutable.ArrayBuffer[PObj](8)
    while ({ lex.skipWs(); !lex.atEnd }) {
      st.ops += 1
      if (st.ops > MaxOps) decline()
      val c = lex.peek
      if (c == '/' || c == '(' || c == '<' || c == '[' || c == '+' ||
        c == '-' || c == '.' || (c >= '0' && c <= '9')) {
        if (operands.length >= 32) decline()
        operands += lex.obj(0, refs = false)
      } else {
        val op = lex.token()
        op match {
          case "Tf" => operands.headOption match {
            case Some(PName(n)) if operands.length == 2 =>
              st.setFontDec(ctx.font(n))
            case _ => decline()
          }
          case "Tj" => operands match {
            case collection.Seq(PStr(s)) => st.show(s)
            case _ => decline()
          }
          case "'" => operands match {
            case collection.Seq(PStr(s)) => st.newline(); st.show(s)
            case _ => decline()
          }
          case "\"" => operands match {
            case collection.Seq(PNum(_), PNum(_), PStr(s)) =>
              st.newline(); st.show(s)
            case _ => decline()
          }
          case "TJ" => operands match {
            case collection.Seq(PArr(elems)) =>
              elems.foreach {
                case PStr(s) => st.show(s)
                case PNum(v) => if (v <= -100) st.out.append(' ')
                case _ => decline()
              }
            case _ => decline()
          }
          case "Td" | "TD" => operands match {
            case collection.Seq(PNum(_), PNum(ty)) =>
              if (ty != 0) st.newline()
            case _ => decline()
          }
          case "T*" | "Tm" => st.newline()
          case "q" => st.push()
          case "Q" => st.pop()
          case "Do" => operands match {
            case collection.Seq(PName(n)) => ctx.xobjForm(n) match {
              case None => () // an image paints pixels: no text effect
              case Some((s, formCtx)) =>
                // §8.10.1: Do saves the graphics state, paints the
                // form, restores — a font the form selects must not
                // leak into the invoker's following shows, the form's
                // q/Q must balance within it, and the raised floor
                // keeps its Qs off the invoker's saved entries
                val f0 = st.fontNow
                val d0 = st.depth
                val fl0 = st.raiseFloor()
                runContent(s.data, st, formCtx, r, depth + 1)
                if (st.depth != d0) decline()
                st.restoreFloor(fl0)
                st.setFontDec(f0)
            }
            case _ => decline()
          }
          case "BI" => decline() // inline image: raw bytes would
          // desynchronize the token walk — recorded envelope
          case _ => () // BT/ET/graphics/state ops: no text effect
        }
        operands.clear()
      }
    }
  }

  // ---- the page-tree walk ----------------------------------------------

  def parse(b: Array[Byte]): GenericArrayData =
    try {
      val chain = PdfMeta.chainWalk(b)
      if (chain == null) return null
      val r = new Resolver(b, chain.entries)
      if (chain.encrypted) {
        // the standard security handler, EMPTY user password only —
        // the "permissions-protected" PDF every viewer opens silently;
        // a real password (the /U check fails) or a non-Standard
        // handler declines the document whole
        if (chain.encObj < 0) return null
        val encDict = r.resolve(chain.encObj) match {
          case PDict(m) => m
          case _ => return null
        }
        // buildCrypt handles the whole matrix, including /StmF
        // /Identity (or ABSENT — Identity is the §7.6.5 default) under
        // V>=4, where streams are plaintext: that path installs the
        // pass-through sentinel but STILL verifies the empty user
        // password first, so a real-password document declines
        // (page-text strings ride inside content streams; top-level
        // file strings under /StrF carry no page text, so no string
        // decryptor is needed)
        val crypt = buildCrypt(r, encDict, chain.id0)
        if (crypt == null) return null
        r.crypt = crypt
      }
      val catalog = r.resolve(chain.root) match {
        case PDict(m) => m; case _ => decline()
      }
      val pagesRef = catalog.getOrElse("Pages", decline())
      // iterative depth-first walk, document order; (node, inherited
      // /Resources) — §7.7.3.4 inheritable attributes
      var stack = List[(PObj, Option[PObj])]((pagesRef, None))
      val pages = Vector.newBuilder[Any]
      var nodes = 0
      var nPages = 0
      while (stack.nonEmpty) {
        nodes += 1
        if (nodes > MaxTreeNodes) decline()
        val (ref, inh) = stack.head
        stack = stack.tail
        val node = r(ref) match { case PDict(m) => m; case _ => decline() }
        val res = node.get("Resources").orElse(inh)
        node.get("Type") match {
          case Some(PName("Pages")) =>
            val kids = r(node.getOrElse("Kids", decline())) match {
              case PArr(k) => k; case _ => decline()
            }
            stack = kids.map(k => (k, res)).toList ::: stack
          case Some(PName("Page")) =>
            nPages += 1
            if (nPages > MaxPages) decline()
            // the decline unit is the PAGE: a font/filter/code
            // outside the envelope nulls this element, the rest of
            // the document still serves
            pages += (try UTF8String.fromString(pageText(r, node, res))
              catch { case _: Decline => r.recover(); null })
          case _ => decline()
        }
      }
      new GenericArrayData(pages.result().toArray[Any])
    } catch { case _: Decline => null }

  /** The /Encrypt dict → a [[PdfCrypt]], or null (unsupported tier /
    * wrong password). Field extraction only — the algorithms live in
    * [[PdfCrypt.make]]. */
  private def buildCrypt(r: Resolver, m: Map[String, PObj],
      id0: Array[Byte]): PdfCrypt = {
    def num(k: String, dflt: Long): Long = m.get(k).map(r(_)) match {
      case Some(PNum(v)) if v == math.floor(v) => v.toLong
      case None => dflt
      case _ => Long.MinValue
    }
    def bytes(k: String): Array[Byte] = m.get(k).map(r(_)) match {
      case Some(PStr(v)) => v
      case _ => null
    }
    val filter = m.get("Filter").map(r(_)) match {
      case Some(PName(n)) => n
      case _ => return null
    }
    val v = num("V", 0)
    val rev = num("R", 0)
    val len = num("Length", 40)
    val p = num("P", Long.MinValue)
    if (v == Long.MinValue || rev == Long.MinValue || len == Long.MinValue ||
      p == Long.MinValue) return null
    val encMeta = m.get("EncryptMetadata").map(r(_)) match {
      case Some(PBool(x)) => x
      case None => true
      case _ => return null
    }
    var cfm = ""
    var stmfStd = false
    if (v >= 4) {
      // /StmF selects the stream filter; ABSENT defaults to Identity
      // (§7.6.5), under which streams are plaintext — serve through
      // the pass-through sentinel, gated on the same empty-user
      // /U (V=4) or SHA (V=5) validation as the encrypted tiers
      val stmfIdentity = m.get("StmF").map(r(_)) match {
        case None => true
        case Some(PName("Identity")) => true
        case _ => false
      }
      if (stmfIdentity) {
        return if (PdfCrypt.verifyEmptyUser(v.toInt, rev.toInt, len.toInt,
          bytes("O"), bytes("U"), p, encMeta, id0)) PdfCrypt.IdentityStreams
        else null
      }
      val stdCf = m.get("CF").map(r(_)) match {
        case Some(PDict(cf)) => cf.get("StdCF").map(r(_)) match {
          case Some(PDict(s)) => s
          case _ => return null
        }
        case _ => return null
      }
      cfm = stdCf.get("CFM") match {
        case Some(PName(n)) => n
        case _ => return null
      }
      stmfStd = m.get("StmF").map(r(_)) match {
        case Some(PName("StdCF")) => true
        case _ => false
      }
    }
    PdfCrypt.make(filter, v.toInt, rev.toInt, len.toInt, bytes("O"),
      bytes("U"), bytes("OE"), bytes("UE"), p, encMeta, cfm, stmfStd, id0)
  }

  private def pageText(r: Resolver, page: Map[String, PObj],
      res: Option[PObj]): String = {
    val ctx = new ResCtx(r, res)
    val st = new PageState
    page.get("Contents") match {
      case None => ()
      case Some(contents) =>
        val streams = r(contents) match {
          case s: PStream => Vector(s)
          case PArr(elems) => elems.map(e => r(e) match {
            case s: PStream => s; case _ => decline()
          })
          case _ => decline()
        }
        streams.foreach { s =>
          // §7.8.2: multiple streams act as one with whitespace between
          if (st.out.length > 0) st.newline()
          runContent(s.data, st, ctx, r, 0)
        }
    }
    st.out.toString
  }
}

/** `graft_pdf_text_encode(seed, n_pages)` → binary: a classic-xref PDF
  * whose pages carry REAL content streams — the fixture for the text
  * tier, every decoded character (seed, page) arithmetic so the
  * DuckDB oracle restates the extraction verbatim.
  *
  * Grammar coverage cycles on seed so every few corpus rows land each
  * path:
  *  - font encoding: even seeds /WinAnsiEncoding (cp1252-family bytes
  *    0x80/0x93/0x94/0x96/0xE9 in line 3), odd seeds Standard — via an
  *    explicit /StandardEncoding name (seed%4==1) or an ABSENT
  *    /Encoding (seed%4==3, the default path), with Standard's own
  *    bytes (quoteleft/right 0x60/0x27, guillemets 0xAB/0xBB, the fi
  *    ligature 0xAE, endash 0xB1);
  *  - seed%3==0: content streams behind /FlateDecode;
  *  - seed%5==0: an INTERMEDIATE /Pages node splits the kids and
  *    /Resources lives on the page-tree ROOT only (inheritance);
  *  - seed%7==0: /Contents is an ARRAY of two streams split mid-page;
  *  - seed%11==0: the /Encoding DICT form with /Differences remapping
  *    codes 65/66 to /eacute + /uni20AC (named AND algorithmic glyph
  *    resolution, plus the consecutive-codes rule), so line 1's tail
  *    decodes "é€" instead of "A";
  *  - seed%13==0: a /Type0 Identity-H font (2-byte hex-string codes)
  *    with a REAL /ToUnicode CMap — an ASCII bfrange (increment
  *    form), bfchars for é/€, a surrogate-PAIR target (U+1D11E) and a
  *    multi-unit "ffi" target, plus an ARRAY-form bfrange — so CID
  *    docs decode "é€𝄞ffi" in line 1 and "ABC end" in line 3,
  *    certifying every CMap section shape against the oracle;
  *  - seed%17==0: the SECOND page (when present) shows code 0x81 —
  *    undefined in WinAnsi AND Standard, and an unmapped CID through
  *    the Type0 path — so the page-granular envelope yields a NULL
  *    element there while the document's other pages serve
  *    ([[badPage]] is the oracle's restatement);
  *  - seed%19==0: every stream rides /LZWDecode (default EarlyChange)
  *    instead of Flate — the §7.4.4 filter exercised end to end,
  *    invisible in the output like the Flate docs;
  *  - seed%23==0: every stream rides the classic legacy CHAIN
  *    [/ASCII85Decode /FlateDecode] (§7.4.2-3 + the §7.4 array form,
  *    decode applied in array order), equally invisible;
  *  - seed%29==0 (and not CID): the font is a SYMBOLIC subsetted
  *    TrueType (descriptor flag bit 3) whose /ToUnicode CMap is the
  *    decode authority — a 1-byte ASCII bfrange plus a bfchar
  *    mapping code 0x01 to U+2603 — so line 1's tail decodes "☃"
  *    and line 3 is "sym end" (the modern-writer case where Appendix
  *    D would be mojibake);
  *  - seed%31==0 (non-cid/sym): line 2 is painted by a /Form XOBJECT
  *    (Do) carrying its OWN font resource, and the page wraps a
  *    throwaway font switch in q/Q — the decoded text is unchanged,
  *    so the oracle doubles as the state-restore differential (a
  *    leaked font decodes line 3 through the wrong table);
  *  - every page: escaped parens + an octal escape in line 1, a TJ
  *    array whose -250 gap is a word break and -40 is not, and a '
  *    (move-show) for line 3. */
case class PdfTextEncode(children: Seq[Expression]) extends Expression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = {
    val expected = Seq(LongType, IntegerType)
    if (children.length == 2 && children.map(_.dataType) == expected)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_pdf_text_encode expects (long seed, int n_pages)")
  }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_pdf_text_encode"

  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.exists(_ == null)) null
    else PdfTextEncode.encode(vs(0).asInstanceOf[Long], vs(1).asInstanceOf[Int])
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): PdfTextEncode =
    copy(children = newChildren)
}

object PdfTextEncode {

  // ISO-8859-1 is byte-bijective: binary payloads ride the
  // StringBuilder losslessly (the PdfEncode discipline)
  private def bin(bytes: Array[Byte]): String = new String(bytes, "ISO-8859-1")

  private def zlib(payload: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    try {
      d.setInput(payload); d.finish()
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](4096)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      out.toByteArray
    } finally d.end()
  }

  /** Line 3's SHOWN bytes per encoding — paired with [[decodedLine3]],
    * which the oracle restates. */
  private def line3Bytes(winAnsi: Boolean): String =
    if (winAnsi) "café q   end" // é “q” – € in cp1252
    else "caf`q' «g» ®n ± end" // ‘ ’ « » ﬁ –

  /** What [[PdfPageTexts]] must decode page p (0-based) to — the
    * oracle's contract, kept next to the encoder that implies it.
    * seed%13==0 docs use the Type0 Identity-H font: line 1's tail is
    * the CMap specials "é€𝄞ffi" and line 3 is the array-range "ABC
    * end". Otherwise seed%11==0 docs carry a /Differences encoding
    * remapping codes 65/66 ('A'/'B') to eacute and uni20AC, so their
    * line-1 tail decodes "é€" where plain docs show "A". */
  /** True when the fixture plants page p (0-based) as a DECLINED
    * page: seed%17==0 docs carry an undefined/unmapped code on their
    * second page, so [[PdfPageTexts]] serves a NULL element there. */
  def badPage(seed: Long, p: Int): Boolean = seed % 17 == 0 && p == 1

  def decodedPage(seed: Long, p: Int): String = {
    if (badPage(seed, p)) return null
    if (seed % 13 == 0)
      return s"Doc $seed (page ${p + 1}) é€𝄞ffi\nalpha betagamma\nABC end"
    if (seed % 29 == 0)
      return s"Doc $seed (page ${p + 1}) ☃\nalpha betagamma\nsym end"
    val winAnsi = seed % 2 == 0
    val line3 =
      if (winAnsi) "café “q” – € end"
      else "caf‘q’ «g» ﬁn – end"
    val tail = if (seed % 11 == 0) "é€" else "A"
    s"Doc $seed (page ${p + 1}) $tail\nalpha betagamma\n$line3"
  }

  def encode(seed: Long, nPages: Int): Array[Byte] = {
    if (seed < 0 || nPages < 1 || nPages > 64) return null
    val winAnsi = seed % 2 == 0
    val flated = seed % 3 == 0
    val treed = seed % 5 == 0
    val splitContents = seed % 7 == 0
    val diffs = seed % 11 == 0
    val cid = seed % 13 == 0
    val lzw = seed % 19 == 0
    val a85 = seed % 23 == 0
    val sym = !cid && seed % 29 == 0
    // form docs show line 2 from INSIDE a /Form XObject with its own
    // font, plus an in-page q/Q-wrapped font switch — the decoded text
    // is IDENTICAL to the plain layout, so the oracle is unchanged and
    // any state leak (a font surviving the Q or the Do's implicit
    // restore) decodes line 3 through the wrong table and is caught
    val form = !cid && !sym && seed % 31 == 0

    val sb = new StringBuilder()
    sb.append("%PDF-1.6\n%")
    val filler = (seed % 37).toInt + 4
    var i = 0
    while (i < filler) { sb.append(('a' + ((seed + 7 * i) % 26)).toChar); i += 1 }
    sb.append("\n")

    val offsets = new scala.collection.mutable.ArrayBuffer[Int]()
    def obj(body: String): Int = {
      offsets += sb.length
      val num = offsets.length
      sb.append(s"$num 0 obj\n$body\nendobj\n")
      num
    }
    def streamObj(payload: Array[Byte], extraKeys: String): Int = {
      val (data, filter) =
        if (a85) (PdfPageTexts.ascii85Encode(zlib(payload)),
          "/Filter [ /ASCII85Decode /FlateDecode ] ")
        else if (lzw) (PdfPageTexts.LzwCodec.encode(payload, 1), "/Filter /LZWDecode ")
        else if (flated) (zlib(payload), "/Filter /FlateDecode ")
        else (payload, "")
      obj(s"<< $extraKeys$filter/Length ${data.length} >>\nstream\n" +
        bin(data) + "\nendstream")
    }

    // ASCII text as 2-byte Identity-H hex codes (the CMap's ASCII
    // bfrange maps code == code point)
    def cidHex(s: String): String = s.map(c => f"${c.toInt}%04x").mkString

    // content stream SOURCE per page, split point after line 2's TJ;
    // the line-1 tail is \101 ('A') — or \101\102 on Differences docs,
    // whose encoding remaps those codes to eacute + uni20AC. CID docs
    // write the same layout in 2-byte hex strings: the line-1 tail is
    // the four bfchar specials (0100 é, 0101 €, 0102 the surrogate-
    // pair 𝄞, 0104 the multi-unit ffi), line 3 the array-form range
    // 0200..0202 ("ABC") + ASCII
    def contentA(p: Int): String =
      if (badPage(seed, p))
        // code 0x81: a WinAnsi hole, undefined in Standard, and (as
        // the 2-byte pair "x\201" = CID 0x7881) unmapped through the
        // Type0 path — this page declines under EVERY font variant
        "BT /F1 12 Tf 72 720 Td (x\\201) Tj "
      else if (form)
        // line 1 under F1; a q/Q-wrapped switch to the form's font
        // (the Q must restore F1); line 2 painted by the form XObject
        // (whose implicit save/restore must hand F1 back for line 3)
        s"BT /F1 12 Tf 72 720 Td (Doc $seed \\(page ${p + 1}\\) \\101" +
          (if (diffs) "\\102" else "") + ") Tj ET " +
          "q BT /FD 12 Tf ET Q /X1 Do BT "
      else if (cid)
        s"BT /F1 12 Tf 72 720 Td <${cidHex(s"Doc $seed (page ${p + 1}) ")}" +
          "0100010101020104> Tj " +
          s"0 -14 TD [<${cidHex("alpha")}> -250 <${cidHex("beta")}> -40 " +
          s"<${cidHex("gamma")}>] TJ "
      else if (sym)
        // ASCII rides the 1-byte bfrange; \001 is the bfchar snowman
        s"BT /F1 12 Tf 72 720 Td (Doc $seed \\(page ${p + 1}\\) \\001) Tj " +
          "0 -14 TD [(alpha) -250 (beta) -40 (gamma)] TJ "
      else
        s"BT /F1 12 Tf 72 720 Td (Doc $seed \\(page ${p + 1}\\) \\101" +
          (if (diffs) "\\102" else "") + ") Tj " +
          "0 -14 TD [(alpha) -250 (beta) -40 (gamma)] TJ "
    def contentB(): String =
      if (cid) s"<020002010202${cidHex(" end")}> ' ET"
      else if (sym) "(sym end) ' ET"
      else s"(${line3Bytes(winAnsi)}) ' ET"

    // object numbering: 1 Catalog, 2 Pages root, 3 Font, [4,5 the
    // intermediate nodes], [then descendant font + ToUnicode stream
    // on CID docs], then per page: Page, content stream(s)
    val fontNum = 3
    val interNums = if (treed) Seq(4, 5) else Seq.empty
    val descNum = 4 + interNums.length
    val tuNum = descNum + 1
    val fontBody = {
      if (cid)
        s"<< /Type /Font /Subtype /Type0 /BaseFont /GraftCID " +
          s"/Encoding /Identity-H /DescendantFonts [ $descNum 0 R ] " +
          s"/ToUnicode $tuNum 0 R >>"
      else if (sym)
        // symbolic subsetted TrueType: no /Encoding, the descriptor's
        // flag bit 3 set, the ToUnicode CMap the decode authority
        s"<< /Type /Font /Subtype /TrueType /BaseFont /GRAFTS+Sym " +
          s"/FontDescriptor $descNum 0 R /ToUnicode $tuNum 0 R >>"
      else {
        val enc =
          if (diffs)
            // the §9.6.5 dict form: 65 -> eacute, then uni20AC claims 66
            // (the consecutive-codes rule); BaseEncoding rides when the
            // doc is a WinAnsi one, absent -> Standard otherwise
            " /Encoding << " +
              (if (winAnsi) "/BaseEncoding /WinAnsiEncoding " else "") +
              "/Differences [ 65 /eacute /uni20AC ] >>"
          else if (winAnsi) " /Encoding /WinAnsiEncoding"
          else if (seed % 4 == 1) " /Encoding /StandardEncoding"
          else "" // absent /Encoding: the Standard default path
        s"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica$enc >>"
      }
    }
    // form docs add the FD font + the /Form XObject stream in the
    // descNum/tuNum slots (form excludes cid/sym, so no collision)
    val fdNum = descNum
    val xformNum = tuNum
    val firstPageNum = 3 + interNums.length +
      (if (cid || sym || form) 2 else 0) + 1

    // the ToUnicode CMap SOURCE (§9.10.3) — the full PostScript shell
    // real writers emit, with every section shape the parser serves:
    // an increment-form ASCII bfrange, bfchars incl. a surrogate pair
    // and a multi-unit target, and an array-form bfrange
    val cmapSrc =
      "/CIDInit /ProcSet findresource begin\n" +
        "12 dict begin\nbegincmap\n" +
        "/CIDSystemInfo << /Registry (Adobe) /Ordering (UCS) /Supplement 0 >> def\n" +
        "/CMapName /Adobe-Identity-UCS def\n/CMapType 2 def\n" +
        "1 begincodespacerange\n<0000> <ffff>\nendcodespacerange\n" +
        "1 beginbfrange\n<0020> <007e> <0020>\nendbfrange\n" +
        "4 beginbfchar\n<0100> <00e9>\n<0101> <20ac>\n" +
        "<0102> <d834dd1e>\n<0104> <006600660069>\nendbfchar\n" +
        "1 beginbfrange\n<0200> <0202> [<0041> <0042> <0043>]\nendbfrange\n" +
        "endcmap\nCMapName currentdict /CMap defineresource pop\nend\nend"

    // the 1-byte simple-font CMap: ASCII identity range + the bfchar
    // snowman at code 0x01
    val cmap1Src =
      "/CIDInit /ProcSet findresource begin\n" +
        "12 dict begin\nbegincmap\n" +
        "/CMapName /Graft-Sym-UCS def\n/CMapType 2 def\n" +
        "1 begincodespacerange\n<00> <ff>\nendcodespacerange\n" +
        "1 beginbfrange\n<20> <7e> <0020>\nendbfrange\n" +
        "1 beginbfchar\n<01> <2603>\nendbfchar\n" +
        "endcmap\nend\nend"
    val perPage = if (splitContents) 3 else 2
    def pageNum(p: Int) = firstPageNum + p * perPage
    val resourcesStr =
      if (form)
        // FD rides the page dict too (the in-page q/Q exercise selects
        // it); the form still resolves FD through its OWN resources
        s"/Resources << /Font << /F1 $fontNum 0 R /FD $fdNum 0 R >> " +
          s"/XObject << /X1 $xformNum 0 R >> >>"
      else s"/Resources << /Font << /F1 $fontNum 0 R >> >>"

    // Catalog + Pages root (+ intermediates) are emitted FIRST so
    // object numbers match offsets positionally in the classic table
    obj("<< /Type /Catalog /Pages 2 0 R >>")
    if (!treed) {
      val kids = (0 until nPages).map(p => s"${pageNum(p)} 0 R").mkString(" ")
      obj(s"<< /Type /Pages /Kids [ $kids ] /Count $nPages >>")
      obj(fontBody)
    } else {
      // root holds /Resources (inherited by every leaf); kids split
      // between two intermediate /Pages nodes
      obj(s"<< /Type /Pages /Kids [ 4 0 R 5 0 R ] /Count $nPages $resourcesStr >>")
      obj(fontBody)
      val cut = (nPages + 1) / 2
      val kidsA = (0 until cut).map(p => s"${pageNum(p)} 0 R").mkString(" ")
      val kidsB = (cut until nPages).map(p => s"${pageNum(p)} 0 R").mkString(" ")
      obj(s"<< /Type /Pages /Parent 2 0 R /Kids [ $kidsA ] /Count $cut >>")
      // an empty /Kids array is legal and keeps the walk honest when
      // every page landed in the first half (nPages == 1)
      obj(s"<< /Type /Pages /Parent 2 0 R /Kids [ $kidsB ] /Count ${nPages - cut} >>")
    }
    if (form) {
      // FD: a Differences font whose BASE is the OPPOSITE of the page
      // font's — if the Do restore or the Q pop leaks it, line 3's
      // bytes decode through the wrong table (a visible mismatch on
      // Standard docs, a decline on WinAnsi ones), never silently
      obj(s"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica /Encoding << " +
        (if (!winAnsi) "/BaseEncoding /WinAnsiEncoding " else "") +
        "/Differences [ 65 /eacute ] >> >>")
      val formSrc = "BT /FD 12 Tf 0 -14 TD [(alpha) -250 (beta) -40 (gamma)] TJ ET"
      streamObj(formSrc.getBytes("ISO-8859-1"),
        "/Type /XObject /Subtype /Form /BBox [ 0 0 612 792 ] " +
          s"/Resources << /Font << /FD $fdNum 0 R >> >> ")
    }
    if (cid) {
      obj("<< /Type /Font /Subtype /CIDFontType2 /BaseFont /GraftCID " +
        "/CIDSystemInfo << /Registry (Adobe) /Ordering (Identity) " +
        "/Supplement 0 >> /CIDToGIDMap /Identity >>")
      streamObj(cmapSrc.getBytes("ISO-8859-1"), "")
    } else if (sym) {
      obj("<< /Type /FontDescriptor /FontName /GRAFTS+Sym /Flags 4 " +
        "/FontBBox [ 0 0 1000 1000 ] /ItalicAngle 0 /Ascent 800 " +
        "/Descent -200 /CapHeight 700 /StemV 80 >>")
      streamObj(cmap1Src.getBytes("ISO-8859-1"), "")
    }
    (0 until nPages).foreach { p =>
      val contentRefs =
        if (splitContents) s"[ ${pageNum(p) + 1} 0 R ${pageNum(p) + 2} 0 R ]"
        else s"${pageNum(p) + 1} 0 R"
      val pageRes = if (treed) "" else s" $resourcesStr"
      obj(s"<< /Type /Page /Parent 2 0 R /MediaBox [ 0 0 612 792 ]$pageRes " +
        s"/Contents $contentRefs >>")
      if (splitContents) {
        streamObj(contentA(p).getBytes("ISO-8859-1"), "")
        streamObj(contentB().getBytes("ISO-8859-1"), "")
      } else {
        streamObj((contentA(p) + contentB()).getBytes("ISO-8859-1"), "")
      }
    }

    val size = offsets.length + 1
    val xrefAt = sb.length
    sb.append(s"xref\n0 $size\n")
    sb.append("0000000000 65535 f \n")
    offsets.foreach(o => sb.append(f"$o%010d 00000 n \n"))
    sb.append(s"trailer\n<< /Size $size /Root 1 0 R >>\nstartxref\n$xrefAt\n%%EOF\n")
    sb.toString.getBytes("ISO-8859-1")
  }
}

/** `graft_pdf_cmap_encode(seed, n_pages)` → binary: a REAL composite-
  * font PDF whose /Encoding is an EMBEDDED CMAP STREAM (§9.7.5.3) with
  * a MIXED-WIDTH codespace — 1-byte codes <00>-<7f> and 2-byte codes
  * <8000>-<ffff>, the CJK shift-JIS shape — plus a variable-width
  * /ToUnicode (an ASCII bfrange over the 1-byte band, bfchars over
  * the 2-byte band incl. a surrogate-pair target). Every shown
  * character is (seed, p) arithmetic: [[PdfCMapEncode.decodedPage]]. */
case class PdfCMapEncode(children: Seq[Expression]) extends Expression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = {
    val expected = Seq(LongType, IntegerType)
    if (children.length == 2 && children.map(_.dataType) == expected)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_pdf_cmap_encode expects (long seed, int n_pages)")
  }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_pdf_cmap_encode"

  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.exists(_ == null)) null
    else PdfCMapEncode.encode(vs(0).asInstanceOf[Long], vs(1).asInstanceOf[Int])
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): PdfCMapEncode =
    copy(children = newChildren)
}

object PdfCMapEncode {

  /** What [[PdfPageTexts]] must decode page p (0-based) to — the
    * oracle's contract: ASCII through the 1-byte band (even seeds)
    * or 2-byte codes under the Identity-H usecmap space (odd seeds),
    * é/€/𝄞 through the 2-byte bfchars either way. */
  def decodedPage(seed: Long, p: Int): String =
    s"Cmap $seed page ${p + 1} é€𝄞 ${(seed + p) % 5}"

  private def asciiHex(s: String): String =
    s.map(c => f"${c.toInt}%02x").mkString
  private def asciiHex4(s: String): String =
    s.map(c => f"${c.toInt}%04x").mkString

  def encode(seed: Long, nPages: Int): Array[Byte] = {
    if (seed < 0 || nPages < 1 || nPages > 64) return null
    // even seeds: an own mixed 1-/2-byte codespace; odd seeds: NO own
    // codespace — the 2-byte band arrives via `/Identity-H usecmap`
    // (§9.7.5.3 composition), every show code 2 bytes wide. Both
    // decode to the same contract string, so one oracle column
    // certifies both forms.
    val useCmap = seed % 2 == 1
    val encodingCMap =
      if (useCmap)
        "%!PS-Adobe-3.0 Resource-CMap\n" +
          "/CIDInit /ProcSet findresource begin\n12 dict begin\nbegincmap\n" +
          "/Identity-H usecmap\n" +
          "/CIDSystemInfo << /Registry (Graft) /Ordering (Mixed) " +
          "/Supplement 0 >> def\n" +
          "/CMapName /Graft-Use-H def\n/CMapType 1 def\n/WMode 0 def\n" +
          "1 begincidrange\n<8000> <80ff> 100\nendcidrange\n" +
          "endcmap\nCMapName currentdict /CMap defineresource pop\nend\nend"
      else
        "%!PS-Adobe-3.0 Resource-CMap\n" +
          "/CIDInit /ProcSet findresource begin\n12 dict begin\nbegincmap\n" +
          "/CIDSystemInfo << /Registry (Graft) /Ordering (Mixed) " +
          "/Supplement 0 >> def\n" +
          "/CMapName /Graft-Mixed-H def\n/CMapType 1 def\n/WMode 0 def\n" +
          "2 begincodespacerange\n<00> <7f>\n<8000> <ffff>\n" +
          "endcodespacerange\n" +
          "2 begincidrange\n<20> <7e> 1\n<8000> <80ff> 100\nendcidrange\n" +
          "endcmap\nCMapName currentdict /CMap defineresource pop\nend\nend"
    val toUnicode =
      if (useCmap)
        "/CIDInit /ProcSet findresource begin\n12 dict begin\nbegincmap\n" +
          "/CMapName /Graft-Use-UCS def\n/CMapType 2 def\n" +
          "1 begincodespacerange\n<0000> <ffff>\n" +
          "endcodespacerange\n" +
          "1 beginbfrange\n<0020> <007e> <0020>\nendbfrange\n" +
          "3 beginbfchar\n<8001> <00e9>\n<8002> <20ac>\n<8003> <d834dd1e>\n" +
          "endbfchar\nendcmap\nend\nend"
      else
        "/CIDInit /ProcSet findresource begin\n12 dict begin\nbegincmap\n" +
          "/CMapName /Graft-Mixed-UCS def\n/CMapType 2 def\n" +
          "2 begincodespacerange\n<00> <7f>\n<8000> <ffff>\n" +
          "endcodespacerange\n" +
          "1 beginbfrange\n<20> <7e> <0020>\nendbfrange\n" +
          "3 beginbfchar\n<8001> <00e9>\n<8002> <20ac>\n<8003> <d834dd1e>\n" +
          "endbfchar\nendcmap\nend\nend"

    val sb = new StringBuilder()
    sb.append("%PDF-1.6\n%âãÏÓ\n")
    val offsets = new scala.collection.mutable.ArrayBuffer[Int]()
    def obj(body: String): Int = {
      offsets += sb.length
      val num = offsets.length
      sb.append(s"$num 0 obj\n$body\nendobj\n")
      num
    }
    val kids = (0 until nPages).map(p => s"${7 + p * 2} 0 R").mkString(" ")
    obj("<< /Type /Catalog /Pages 2 0 R >>")
    obj(s"<< /Type /Pages /Kids [ $kids ] /Count $nPages >>")
    obj("<< /Type /Font /Subtype /Type0 /BaseFont /GraftMixed " +
      "/Encoding 5 0 R /DescendantFonts [ 4 0 R ] /ToUnicode 6 0 R >>")
    obj("<< /Type /Font /Subtype /CIDFontType2 /BaseFont /GraftMixed " +
      "/CIDSystemInfo << /Registry (Graft) /Ordering (Mixed) " +
      "/Supplement 0 >> /CIDToGIDMap /Identity >>")
    obj(s"<< /Type /CMap /CMapName /Graft-Mixed-H /WMode 0 " +
      s"/Length ${encodingCMap.length} >>\nstream\n$encodingCMap\nendstream")
    obj(s"<< /Length ${toUnicode.length} >>\nstream\n$toUnicode\nendstream")
    (0 until nPages).foreach { pg =>
      val contentNum = 7 + pg * 2 + 1
      obj(s"<< /Type /Page /Parent 2 0 R /MediaBox [ 0 0 612 792 ] " +
        s"/Resources << /Font << /F1 3 0 R >> >> /Contents $contentNum 0 R >>")
      // even seeds: the show string MIXES widths — ASCII 1-byte codes
      // around the three 2-byte specials, exactly the segmentation
      // under test; odd seeds: EVERY code is 2 bytes wide under the
      // usecmap'd Identity-H space
      val hexStr =
        if (useCmap)
          asciiHex4(s"Cmap $seed page ${pg + 1} ") +
            "800180028003" + asciiHex4(s" ${(seed + pg) % 5}")
        else
          asciiHex(s"Cmap $seed page ${pg + 1} ") +
            "800180028003" + asciiHex(s" ${(seed + pg) % 5}")
      val src = s"BT /F1 12 Tf 72 720 Td <$hexStr> Tj ET"
      obj(s"<< /Length ${src.length} >>\nstream\n$src\nendstream")
    }
    val size = offsets.length + 1
    val xrefAt = sb.length
    sb.append(s"xref\n0 $size\n")
    sb.append("0000000000 65535 f \n")
    offsets.foreach(o => sb.append(f"$o%010d 00000 n \n"))
    sb.append(s"trailer\n<< /Size $size /Root 1 0 R >>\nstartxref\n$xrefAt\n%%EOF\n")
    sb.toString.getBytes("ISO-8859-1")
  }
}
