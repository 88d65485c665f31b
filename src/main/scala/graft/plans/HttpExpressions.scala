package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** HTTP response-message triage — the layer between a WARC response
  * record and its HTML: Common Crawl's response payloads are raw
  * HTTP/1.x messages (RFC 9112 §2.1), so a real ingest strips the
  * status line + header block before any text work and keeps the
  * status / content type for routing (non-200s and non-text types are
  * dropped long before extraction).
  *
  * `graft_http_body(binary)` → `struct<status int, content_type
  * string, charset string, body binary>`:
  *
  *  - status line `HTTP/1.<d> <3 digits> <reason>` (reason optional);
  *  - CRLF header block, names case-insensitive; `Content-Type`
  *    reported as its media type alone (lowercased — the routing
  *    key), with the `charset` PARAMETER kept separately (lowercased,
  *    quotes stripped) — the text pipeline's decode key, never
  *    silently dropped;
  *  - the body = everything after the blank line. When a
  *    `Content-Length` header is present it must not claim MORE than
  *    the bytes available (a lying length is a truncated capture —
  *    decline); fewer is allowed (the WARC record's own length is
  *    authoritative, trailing bytes beyond the claim are kept out);
  *  - `Transfer-Encoding: chunked` bodies are DE-CHUNKED (RFC 9112
  *    §7.1 — crawlers store what the wire carried): hex sizes,
  *    per-chunk CRLFs, the 0-chunk terminator; trailers skipped;
  *  - `Content-Encoding: gzip`/`x-gzip`/`deflate` bodies are DECODED
  *    (RFC 9110 §8.4 — a large fraction of real wire bodies are
  *    content-coded, and serving compressed bytes as "the body" hands
  *    garbage to every text consumer): gzip through the CRC-gated,
  *    bomb-ceilinged member walk ([[GzipMeta.inflateAll]]), deflate as
  *    zlib with the ubiquitous raw-deflate server-bug fallback
  *    ([[GzipMeta.inflateZlibOrRaw]]). Framing is removed FIRST, then the
  *    content coding (RFC 9112 §6.1 layering). A coding we cannot
  *    decode (`br`, `zstd`, `compress`, stacked codings) DECLINES the
  *    row — compressed bytes must never masquerade as content
  *    (decline envelope: no brotli/zstd decoder offline in the JDK).
  *
  * Parse-or-NULL: malformed status line, header without ':', chunk
  * framing errors, content-coding decode failures, and bounds
  * violations NULL the row; 64 headers, 4 KiB lines, 4096 chunks,
  * 1 MiB inflated. */
case class HttpBody(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_http_body expects a binary column, got ${child.dataType.catalogString}")
  override def dataType: DataType = HttpBody.schema
  override def nullable: Boolean = true
  override def prettyName: String = "graft_http_body"

  override def nullSafeEval(input: Any): Any =
    HttpBody.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => s"""
      ${ev.value} = graft.plans.HttpBody.parse($b);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): HttpBody =
    copy(child = newChild)
}

object HttpBody {

  val schema: StructType = StructType(Seq(
    StructField("status", IntegerType),
    StructField("content_type", StringType),
    StructField("charset", StringType),
    StructField("body", BinaryType)))

  private val MaxHeaders = 64
  private val MaxLine = 4096
  private val MaxChunks = 4096

  def parse(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 14) return null
    var i = 0
    def line(): String = {
      val start = i
      while (i + 1 < b.length && !(b(i) == '\r' && b(i + 1) == '\n') &&
        i - start < MaxLine) i += 1
      if (i + 1 >= b.length || b(i) != '\r') return null
      val s = new String(b, start, i - start, "ISO-8859-1")
      i += 2
      s
    }
    val status = line()
    if (status == null || !status.startsWith("HTTP/1.") ||
      status.length < 12 || !status.charAt(7).isDigit ||
      status.charAt(8) != ' ') return null
    val code = status.substring(9, 12)
    if (!code.forall(_.isDigit) ||
      (status.length > 12 && status.charAt(12) != ' ')) return null
    var contentType: String = null
    var charset: String = null
    var contentLength = -1L
    var chunked = false
    var contentCoding: String = null // lowercased; null = identity
    var headers = 0
    var done = false
    while (!done && headers < MaxHeaders) {
      val l = line()
      if (l == null) return null
      if (l.isEmpty) done = true
      else {
        val colon = l.indexOf(':')
        if (colon <= 0) return null
        val name = l.substring(0, colon).trim.toLowerCase(java.util.Locale.ROOT)
        val value = l.substring(colon + 1).trim
        name match {
          case "content-type" =>
            val semi = value.indexOf(';')
            val t = (if (semi >= 0) value.substring(0, semi) else value).trim
            contentType = t.toLowerCase(java.util.Locale.ROOT)
            // keep the charset parameter (RFC 9110 §8.3.1) — the
            // long tail of legacy pages declares windows-1252 /
            // ISO-8859-1 here, and dropping it manufactures mojibake
            if (semi >= 0) value.substring(semi + 1).split(';').foreach { p =>
              val eq = p.indexOf('=')
              if (eq > 0 &&
                p.substring(0, eq).trim.equalsIgnoreCase("charset")) {
                val v = p.substring(eq + 1).trim.stripPrefix("\"")
                  .stripSuffix("\"").trim
                if (v.nonEmpty) charset = v.toLowerCase(java.util.Locale.ROOT)
              }
            }
          case "content-length" =>
            if (value.isEmpty || !value.forall(_.isDigit) ||
              value.length > 15) return null
            contentLength = value.toLong
          case "transfer-encoding" =>
            if (value.toLowerCase(java.util.Locale.ROOT).contains("chunked"))
              chunked = true
          case "content-encoding" =>
            // token list; `identity` entries are no-ops (RFC 9110)
            val codings = value.toLowerCase(java.util.Locale.ROOT)
              .split(',').map(_.trim).filter(c => c.nonEmpty && c != "identity")
            if (codings.length > 1) return null // stacked codings: decline
            if (codings.length == 1) contentCoding = codings(0)
          case _ => ()
        }
        headers += 1
      }
    }
    if (!done) return null
    val body: Array[Byte] =
      if (chunked) {
        // RFC 9112 §7.1: <hex size>CRLF <data>CRLF ... 0CRLF [trailers] CRLF
        val out = new java.io.ByteArrayOutputStream()
        var chunks = 0
        var terminated = false
        while (!terminated && chunks < MaxChunks) {
          val sizeLine = line()
          if (sizeLine == null) return null
          // chunk extensions after ';' are ignored (RFC 9112 §7.1.1)
          val semi = sizeLine.indexOf(';')
          val hexStr = (if (semi >= 0) sizeLine.substring(0, semi) else sizeLine).trim
          if (hexStr.isEmpty || hexStr.length > 7 ||
            !hexStr.forall(c => c.isDigit || ('a' <= c.toLower && c.toLower <= 'f')))
            return null
          val sz = java.lang.Long.parseLong(hexStr, 16)
          if (sz == 0) {
            // trailer section: lines until the blank terminator
            var t = line()
            var guard = 0
            while (t != null && t.nonEmpty && guard < MaxHeaders) { t = line(); guard += 1 }
            if (t == null || t.nonEmpty) return null
            terminated = true
          } else {
            if (i + sz + 2 > b.length) return null
            out.write(b, i, sz.toInt)
            i += sz.toInt
            if (b(i) != '\r' || b(i + 1) != '\n') return null
            i += 2
            chunks += 1
          }
        }
        if (!terminated) return null
        out.toByteArray
      } else {
        val avail = b.length - i
        val take =
          if (contentLength < 0) avail.toLong
          else if (contentLength > avail) return null // lying length
          else contentLength
        java.util.Arrays.copyOfRange(b, i, i + take.toInt)
      }
    // layering (RFC 9112 §6.1): transfer coding removed above, the
    // CONTENT coding removed here — what remains is the representation
    val decoded: Array[Byte] = contentCoding match {
      case null => body
      case "gzip" | "x-gzip" =>
        GzipMeta.inflateAll(body) match {
          case Some(d) => d
          case None => return null // corrupt / truncated / bomb: decline
        }
      case "deflate" =>
        GzipMeta.inflateZlibOrRaw(body) match {
          case Some(d) => d
          case None => return null
        }
      case _ => return null // br / zstd / compress: no decoder offline
    }
    new GenericInternalRow(Array[Any](
      code.toInt,
      if (contentType == null) null else UTF8String.fromString(contentType),
      if (charset == null) null else UTF8String.fromString(charset),
      decoded))
  }

  /** Fixture twin: wrap `body` in a deterministic HTTP/1.1 response.
    * mode 0 = Content-Length; 1 = chunked (seed-derived chunk sizes,
    * an extension on the first chunk, one trailer); 2 = neither
    * (read-to-end). coding 0 = identity; 1 = gzip (JDK
    * GZIPOutputStream — the writer IS an independent reference for
    * the decode path); 2 = deflate as a zlib stream (JDK Deflater);
    * 3 = deflate RAW (the server-bug form the fallback exists for).
    * Coding is applied BEFORE framing (the wire layering), so
    * chunked-then-gzip rows exercise the full de-chunk → inflate
    * stack. status/content-type ride from the caller so the oracle
    * restates them. */
  def wrap(seed: Long, status: Int, contentType: String, body: Array[Byte],
      mode: Int, coding: Int): Array[Byte] = {
    if (seed < 0 || status < 100 || status > 999 ||
      mode < 0 || mode > 2 || coding < 0 || coding > 3) return null
    val coded: Array[Byte] = coding match {
      case 0 => body
      case 1 =>
        val bos = new java.io.ByteArrayOutputStream()
        val gz = new java.util.zip.GZIPOutputStream(bos)
        gz.write(body); gz.close()
        bos.toByteArray
      case _ =>
        val raw = coding == 3
        val d = new java.util.zip.Deflater(
          java.util.zip.Deflater.DEFAULT_COMPRESSION, raw)
        try {
          d.setInput(body); d.finish()
          val bos = new java.io.ByteArrayOutputStream()
          val window = new Array[Byte](4096)
          while (!d.finished()) {
            val n = d.deflate(window)
            bos.write(window, 0, n)
          }
          bos.toByteArray
        } finally d.end()
    }
    val sb = new StringBuilder()
    sb.append(s"HTTP/1.1 $status OK\r\n")
    sb.append(s"Server: graft/${seed % 10}\r\n")
    sb.append(s"Content-Type: $contentType\r\n")
    if (coding == 1) sb.append("Content-Encoding: gzip\r\n")
    if (coding == 2 || coding == 3) sb.append("Content-Encoding: deflate\r\n")
    mode match {
      case 0 => sb.append(s"Content-Length: ${coded.length}\r\n\r\n")
      case 1 => sb.append("Transfer-Encoding: chunked\r\n\r\n")
      case _ => sb.append(s"X-Graft-Seed: $seed\r\n\r\n")
    }
    val head = sb.toString.getBytes("ISO-8859-1")
    if (mode != 1) return head ++ coded
    // chunked: split the coded body into seed-sized chunks
    val out = new java.io.ByteArrayOutputStream()
    out.write(head, 0, head.length)
    var at = 0
    var k = 0
    while (at < coded.length) {
      val sz = math.min(coded.length - at, (seed % 97 + 40 + 13 * k).toInt)
      val ext = if (k == 0) ";graft=1" else ""
      val hdr = s"${sz.toHexString}$ext\r\n".getBytes("ISO-8859-1")
      out.write(hdr, 0, hdr.length)
      out.write(coded, at, sz)
      out.write('\r'); out.write('\n')
      at += sz
      k += 1
    }
    val tail = "0\r\nX-Trailer: t\r\n\r\n".getBytes("ISO-8859-1")
    out.write(tail, 0, tail.length)
    out.toByteArray
  }
}

/** `graft_http_text(body, charset)` → string: the BODY bytes decoded
  * to text, charset-aware — the step `cast(body as string)` gets
  * wrong for every legacy page (it assumes UTF-8, so the long
  * windows-1252 / ISO-8859-1 tail of a real crawl arrives as
  * mojibake). Decode key, in priority order (WHATWG Encoding
  * sniffing, simplified to the batch case):
  *
  *  1. the `charset` argument — the Content-Type parameter the HTTP
  *     triage kept ([[HttpBody]]);
  *  2. an HTML `<meta charset=…>` / `http-equiv` prescan over the
  *     first 1024 bytes (the HTML5 prescan window);
  *  3. UTF-8.
  *
  * Labels normalize per the WHATWG Encoding registry: `iso-8859-1`,
  * `latin1`, `us-ascii` and friends ARE `windows-1252` (the standard
  * maps them, because real pages labeled 8859-1 use cp1252 bytes),
  * decoded by the spec's own byte table (the five undefined cp1252
  * bytes map to their C1 controls, never an error). UTF-8 decodes
  * STRICTLY. The five multi-byte East-Asian legacy encodings decode
  * through the JDK charsets implementing their WHATWG indexes —
  * shift_jis (= Windows-31J, incl. the `sjis`/`ms_kanji` labels),
  * euc-jp, gbk (incl. every `gb2312` label), big5 (the
  * HKSCS-extended index), euc-kr (= windows-949) — strictly:
  * malformed or unmappable sequences DECLINE, never U+FFFD. The
  * whole WHATWG SINGLE-BYTE family decodes by 256-entry index
  * tables ([[sbTable]]: windows-1250-1258, windows-874 incl. the
  * tis-620/iso-8859-11 labels, iso-8859-2..8/13/15 — with -9 → 1254
  * per the registry and the -7 2003 euro revision — koi8-r/u,
  * ibm866, macintosh, x-mac-cyrillic, x-user-defined), an undefined
  * index position declining. iso-8859-10/-14/-16 stay the recorded
  * envelope (no faithful index offline). The mojibake-never law: an
  * undecodable body (malformed bytes, an unknown label) returns NULL
  * — a declined row is recoverable, silently garbled text poisons
  * every downstream dedup/quality/tokenize pass. */
case class HttpText(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_http_text expects (binary body, string charset)")
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_http_text"

  // the charset argument is OPTIONAL per row (NULL = sniff) — only a
  // NULL body nulls the result structurally
  override def eval(input: InternalRow): Any = {
    val b = left.eval(input)
    if (b == null) return null
    val cs = right.eval(input)
    HttpText.decode(b.asInstanceOf[Array[Byte]],
      if (cs == null) null else cs.asInstanceOf[UTF8String].toString)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    val csArg = ctx.freshName("charsetArg")
    ev.copy(code = org.apache.spark.sql.catalyst.expressions.codegen.Block
      .BlockHelper(new StringContext(s"""
        ${leftGen.code}
        boolean ${ev.isNull} = true;
        UTF8String ${ev.value} = null;
        if (!${leftGen.isNull}) {
          ${rightGen.code}
          UTF8String $csArg = ${rightGen.isNull} ? null : ${rightGen.value};
          ${ev.value} = graft.plans.HttpText.decode(${leftGen.value},
            $csArg == null ? null : $csArg.toString());
          ${ev.isNull} = ${ev.value} == null;
        }
      """)).code())
  }

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): HttpText = copy(left = l, right = r)
}

object HttpText {

  /** WHATWG windows-1252 high table: bytes 0x80..0x9F → code points
    * (the five holes 0x81/0x8D/0x8F/0x90/0x9D map to their C1
    * controls per the standard's index, never an error). 0x00..0x7F
    * are ASCII and 0xA0..0xFF are the Latin-1 identity. */
  private[plans] val Cp1252High: Array[Char] = Array(
    '€', '', '‚', 'ƒ', '„', '…', '†', '‡',
    'ˆ', '‰', 'Š', '‹', 'Œ', '', 'Ž', '',
    '', '‘', '’', '“', '”', '•', '–', '—',
    '˜', '™', 'š', '›', 'œ', '', 'ž', 'Ÿ')

  /** WHATWG label → canonical name, the subset a crawl pipeline
    * meets: the UTF-8 labels, the pile of labels the standard maps
    * to windows-1252 (including all of ISO-8859-1's), the five
    * multi-byte East-Asian legacy encodings, and the UTF-16 family
    * (the bare "utf-16" label IS utf-16le per the standard; a BOM,
    * checked before any label, outranks). Unknown label → null → the
    * caller declines. */
  private def canonical(label: String): String =
    label.trim.toLowerCase(java.util.Locale.ROOT) match {
      case "utf-8" | "utf8" | "unicode-1-1-utf-8" => "utf-8"
      case "windows-1252" | "cp1252" | "x-cp1252" | "ansi_x3.4-1968" |
        "ascii" | "us-ascii" | "iso-8859-1" | "iso8859-1" | "iso88591" |
        "iso_8859-1" | "iso-ir-100" | "l1" | "latin1" | "csisolatin1" |
        "cp819" | "ibm819" | "iso_8859-1:1987" => "windows-1252"
      case "shift_jis" | "shift-jis" | "sjis" | "x-sjis" | "csshiftjis" |
        "ms_kanji" | "ms932" | "windows-31j" => "shift_jis"
      case "euc-jp" | "x-euc-jp" | "cseucpkdfmtjapanese" => "euc-jp"
      case "gbk" | "gb2312" | "gb_2312" | "gb_2312-80" | "chinese" |
        "csgb2312" | "csiso58gb231280" | "iso-ir-58" | "x-gbk" => "gbk"
      case "big5" | "big5-hkscs" | "cn-big5" | "csbig5" | "x-x-big5" => "big5"
      case "euc-kr" | "korean" | "csksc56011987" | "iso-ir-149" |
        "ks_c_5601-1987" | "ks_c_5601-1989" | "ksc5601" | "ksc_5601" |
        "windows-949" => "euc-kr"
      case "utf-16" | "utf-16le" | "unicode" | "csunicode" | "ucs-2" |
        "unicodefeff" | "iso-10646-ucs-2" => "utf-16le"
      case "utf-16be" | "unicodefffe" => "utf-16be"
      // ---- the WHATWG single-byte family (each a 256-entry index;
      // decoded through [[sbTable]]) ----
      case "cp1250" | "windows-1250" | "x-cp1250" => "windows-1250"
      case "cp1251" | "windows-1251" | "x-cp1251" => "windows-1251"
      case "cp1253" | "windows-1253" | "x-cp1253" => "windows-1253"
      // WHATWG maps the iso-8859-9 (latin5 / Turkish) labels to
      // windows-1254 — the same superset relationship as latin1
      case "cp1254" | "csisolatin5" | "iso-8859-9" | "iso-ir-148" |
        "iso8859-9" | "iso88599" | "iso_8859-9" | "iso_8859-9:1989" |
        "l5" | "latin5" | "windows-1254" | "x-cp1254" => "windows-1254"
      case "cp1255" | "windows-1255" | "x-cp1255" => "windows-1255"
      case "cp1256" | "windows-1256" | "x-cp1256" => "windows-1256"
      case "cp1257" | "windows-1257" | "x-cp1257" => "windows-1257"
      case "cp1258" | "windows-1258" | "x-cp1258" => "windows-1258"
      // likewise iso-8859-11 (Thai) labels ARE windows-874
      case "dos-874" | "iso-8859-11" | "iso8859-11" | "iso885911" |
        "tis-620" | "windows-874" => "windows-874"
      case "csisolatin2" | "iso-8859-2" | "iso-ir-101" | "iso8859-2" |
        "iso88592" | "iso_8859-2" | "iso_8859-2:1987" | "l2" |
        "latin2" => "iso-8859-2"
      case "csisolatin3" | "iso-8859-3" | "iso-ir-109" | "iso8859-3" |
        "iso88593" | "iso_8859-3" | "iso_8859-3:1988" | "l3" |
        "latin3" => "iso-8859-3"
      case "csisolatin4" | "iso-8859-4" | "iso-ir-110" | "iso8859-4" |
        "iso88594" | "iso_8859-4" | "iso_8859-4:1988" | "l4" |
        "latin4" => "iso-8859-4"
      case "csisolatincyrillic" | "cyrillic" | "iso-8859-5" |
        "iso-ir-144" | "iso8859-5" | "iso88595" | "iso_8859-5" |
        "iso_8859-5:1988" => "iso-8859-5"
      case "arabic" | "asmo-708" | "csiso88596e" | "csiso88596i" |
        "csisolatinarabic" | "ecma-114" | "iso-8859-6" | "iso-8859-6-e" |
        "iso-8859-6-i" | "iso-ir-127" | "iso8859-6" | "iso88596" |
        "iso_8859-6" | "iso_8859-6:1987" => "iso-8859-6"
      case "csisolatingreek" | "ecma-118" | "elot_928" | "greek" |
        "greek8" | "iso-8859-7" | "iso-ir-126" | "iso8859-7" |
        "iso88597" | "iso_8859-7" | "iso_8859-7:1987" |
        "sun_eu_greek" => "iso-8859-7"
      // -8 (visual) and -8-i (logical) are distinct WHATWG encodings
      // with the SAME index; for byte decoding they are one table
      case "csiso88598e" | "csisolatinhebrew" | "hebrew" | "iso-8859-8" |
        "iso-8859-8-e" | "iso-ir-138" | "iso8859-8" | "iso88598" |
        "iso_8859-8" | "iso_8859-8:1988" | "visual" |
        "csiso88598i" | "iso-8859-8-i" | "logical" => "iso-8859-8"
      case "iso-8859-13" | "iso8859-13" | "iso885913" => "iso-8859-13"
      case "csisolatin9" | "iso-8859-15" | "iso8859-15" | "iso885915" |
        "iso_8859-15" | "l9" => "iso-8859-15"
      case "cskoi8r" | "koi" | "koi8" | "koi8-r" | "koi8_r" => "koi8-r"
      case "koi8-ru" | "koi8-u" => "koi8-u"
      case "866" | "cp866" | "csibm866" | "ibm866" => "ibm866"
      case "csmacintosh" | "mac" | "macintosh" | "x-mac-roman" =>
        "macintosh"
      case "x-mac-cyrillic" | "x-mac-ukrainian" => "x-mac-cyrillic"
      // x-user-defined is defined by the Encoding standard itself:
      // ASCII + a private-use ramp (legacy binary-over-XHR pages)
      case "x-user-defined" => "x-user-defined"
      // iso-8859-10/-14/-16: labels the stripped JRE has no faithful
      // index for — the recorded envelope
      case _ => null
    }

  /** The single-byte canonical names [[decode]] serves via a 256-char
    * table. */
  private val SingleByte = Set(
    "windows-1250", "windows-1251", "windows-1253", "windows-1254",
    "windows-1255", "windows-1256", "windows-1257", "windows-1258",
    "windows-874", "iso-8859-2", "iso-8859-3", "iso-8859-4",
    "iso-8859-5", "iso-8859-6", "iso-8859-7", "iso-8859-8",
    "iso-8859-13", "iso-8859-15", "koi8-r", "koi8-u", "ibm866",
    "macintosh", "x-mac-cyrillic", "x-user-defined")

  private val sbCache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Char]]()

  /** The 256-entry WHATWG index for a single-byte canonical name:
    * 0x00-0x7F are ASCII in every member; the high half builds from
    * the JDK decoder implementing the vendor page, then the
    * spec-exact patches land on top —
    *  - windows-125x / windows-874: a 0x80-0x9F position the vendor
    *    page leaves undefined is its C1 control in the WHATWG index
    *    (the cp1252-holes rule, generalized);
    *  - windows-1253 0xAA/0xD2/0xFF and windows-1257 0xA1/0xA5 and
    *    windows-874 0xDB-0xDE/0xFC-0xFF are UNMAPPED in the index
    *    (decode → error), whatever a best-fit decoder says;
    *  - windows-1255 0xCA is U+05BA (the index adds it over the
    *    vendor page);
    *  - iso-8859-7 carries the 2003 revision: 0xA4 → € and 0xA5 → ₯;
    *  - macintosh 0xBD is U+03A9 GREEK CAPITAL OMEGA (the index
    *    deviates from the JDK's MacRoman OHM SIGN).
    * A 0 entry is undefined: a body byte landing there DECLINES
    * (mojibake-never — WHATWG "decode error" is this tier's NULL). */
  private[plans] def sbTable(name: String): Array[Char] = {
    val hit = sbCache.get(name)
    if (hit != null) return hit
    if (name == "x-user-defined") {
      // defined wholly by the Encoding standard: ASCII + the
      // U+F780..U+F7FF private-use ramp — no JDK decoder involved
      val t = new Array[Char](256)
      var i = 0
      while (i < 256) {
        t(i) = if (i < 0x80) i.toChar else (0xF780 + i - 0x80).toChar
        i += 1
      }
      sbCache.put(name, t)
      return t
    }
    val jdk = name match {
      case "windows-874" => "x-windows-874"
      case "koi8-r" => "KOI8-R"
      case "koi8-u" => "KOI8-U"
      case "ibm866" => "IBM866"
      case "macintosh" => "x-MacRoman"
      case "x-mac-cyrillic" => "x-MacCyrillic"
      case other => other // windows-125x and iso-8859-x resolve directly
    }
    // a stripped JRE (no jdk.charsets module) lacks these vendor
    // decoders: the table is null and the caller DECLINES, matching
    // the strictDecode posture — never an exception out of a task
    val cs =
      try java.nio.charset.Charset.forName(jdk)
      catch {
        case _: java.nio.charset.UnsupportedCharsetException => return null
        case _: java.nio.charset.IllegalCharsetNameException => return null
      }
    val t = new Array[Char](256)
    var i = 0
    while (i < 256) {
      if (i < 0x80) t(i) = i.toChar
      else {
        val s = new String(Array(i.toByte), cs)
        if (s.length == 1 && s.charAt(0) != '�') t(i) = s.charAt(0)
      }
      i += 1
    }
    if ((name.startsWith("windows-125") || name == "windows-874")) {
      i = 0x80
      while (i < 0xA0) { if (t(i) == 0) t(i) = i.toChar; i += 1 }
    }
    name match {
      case "windows-1253" => t(0xAA) = 0; t(0xD2) = 0; t(0xFF) = 0
      case "windows-1255" => t(0xCA) = '\u05BA'
      case "windows-1257" => t(0xA1) = 0; t(0xA5) = 0
      case "windows-874" =>
        var j = 0xDB
        while (j <= 0xDE) { t(j) = 0; j += 1 }
        j = 0xFC
        while (j <= 0xFF) { t(j) = 0; j += 1 }
      case "iso-8859-7" => t(0xA4) = '\u20AC'; t(0xA5) = '\u20AF'
      case "macintosh" => t(0xBD) = '\u03A9'
      case "x-mac-cyrillic" =>
        // the index carries the Mac OS 9.0 revision: \u20AC at 0xFF (the
        // older table's currency sign) and \u0490/\u0491 at 0xA2/0xB6 where the
        // JDK's pre-9.0 table has \u00A2 and the partial-differential sign
        t(0xFF) = '\u20AC'
        t(0xA2) = '\u0490'
        t(0xB6) = '\u0491'
      case "koi8-u" =>
        // the WHATWG koi8-u index is the KOI8-RU variant: it carries
        // the Belarusian \u045E/\u040E at 0xAE/0xBE where the JDK's RFC-2319
        // KOI8-U has box-drawing glyphs
        t(0xAE) = '\u045E'; t(0xBE) = '\u040E'
      case _ => ()
    }
    sbCache.put(name, t)
    t
  }

  /** Fixture-encoder twin: text → bytes by inverting [[sbTable]].
    * Null when a character has no byte in the index — the fixture
    * must be representable, never best-fit. */
  private[graft] def singleByteEncode(text: String, name: String): Array[Byte] = {
    val t = sbTable(name)
    if (t == null) return null
    val out = new Array[Byte](text.length)
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      var b = -1
      var j = 0
      // t(j)==0 marks "undefined" everywhere but j==0 (the real NUL)
      while (j < 256 && b < 0) { if (t(j) == c && (c != 0 || j == 0)) b = j; j += 1 }
      if (b < 0) return null
      out(i) = b.toByte
      i += 1
    }
    out
  }

  /** The JDK charset implementing each multi-byte canonical name —
    * per the WHATWG indexes: shift_jis IS Windows-31J (CP932), euc-kr
    * IS windows-949, big5 includes the HKSCS extension. */
  private def jdkName(canonical: String): String = canonical match {
    case "shift_jis" => "windows-31j"
    case "euc-jp" => "EUC-JP"
    case "gbk" => "GBK"
    case "big5" => "Big5-HKSCS"
    case "euc-kr" => "x-windows-949"
    case _ => null
  }

  /** Strict decode through a JDK decoder: malformed input and
    * unmappable sequences DECLINE (mojibake-never), never U+FFFD. */
  private def strictDecode(body: Array[Byte], charset: String): UTF8String =
    try {
      val dec = java.nio.charset.Charset.forName(charset).newDecoder()
        .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
        .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
      UTF8String.fromString(dec.decode(java.nio.ByteBuffer.wrap(body)).toString)
    } catch {
      case _: java.nio.charset.CharacterCodingException => null
      case _: java.nio.charset.UnsupportedCharsetException => null // stripped JRE
    }

  private val MetaWindow = 1024
  private val metaRe =
    """(?is)<meta[^>]{0,256}?charset\s*=\s*["']?\s*([a-zA-Z0-9_\-:.]+)""".r

  def decode(body: Array[Byte], declared: String): UTF8String = {
    if (body == null) return null
    // WHATWG BOM sniffing OUTRANKS the declared label (Encoding §4.2
    // "decode" step 1): a UTF-8 / UTF-16 BOM picks the encoding and
    // is consumed, whatever the Content-Type header claimed — a
    // UTF-16LE page behind a charset=utf-8 header is commonplace and
    // decoding it as UTF-8 would be mojibake or a spurious decline
    if (body.length >= 2) {
      val b0 = body(0) & 0xFF
      val b1 = body(1) & 0xFF
      if (b0 == 0xEF && b1 == 0xBB && body.length >= 3 &&
        (body(2) & 0xFF) == 0xBF)
        return strictDecode(
          java.util.Arrays.copyOfRange(body, 3, body.length), "UTF-8")
      if (b0 == 0xFE && b1 == 0xFF)
        return strictDecode(
          java.util.Arrays.copyOfRange(body, 2, body.length), "UTF-16BE")
      if (b0 == 0xFF && b1 == 0xFE)
        return strictDecode(
          java.util.Arrays.copyOfRange(body, 2, body.length), "UTF-16LE")
    }
    val label =
      if (declared != null) declared
      else {
        // HTML5 prescan: a <meta charset> (or http-equiv content=)
        // inside the first 1024 bytes; the window is ASCII-compatible
        // in every charset we decode, so the latin-1 view is safe
        val head = new String(body, 0,
          math.min(body.length, MetaWindow), "ISO-8859-1")
        val m = metaRe.findFirstMatchIn(head).map(_.group(1)).orNull
        // the HTML prescan algorithm's one label rewrite: a
        // META-declared x-user-defined means windows-1252 (the ramp
        // is correct only for the transport-layer label)
        if (m != null &&
          m.trim.equalsIgnoreCase("x-user-defined")) "windows-1252"
        else m
      }
    val cs = if (label == null) "utf-8" else canonical(label)
    cs match {
      case "utf-8" => strictDecode(body, "UTF-8")
      case "windows-1252" =>
        val out = new Array[Char](body.length)
        var i = 0
        while (i < body.length) {
          val u = body(i) & 0xFF
          out(i) =
            if (u < 0x80 || u >= 0xA0) u.toChar
            else Cp1252High(u - 0x80)
          i += 1
        }
        UTF8String.fromString(new String(out))
      case "shift_jis" | "euc-jp" | "gbk" | "big5" | "euc-kr" =>
        strictDecode(body, jdkName(cs))
      case "utf-16le" => strictDecode(body, "UTF-16LE")
      case "utf-16be" => strictDecode(body, "UTF-16BE")
      case sb if sb != null && SingleByte.contains(sb) =>
        // the WHATWG single-byte family: table lookup, an undefined
        // index position declines (the spec's decode error)
        val t = sbTable(sb)
        if (t == null) return null // stripped JRE: decline, never throw
        val out = new Array[Char](body.length)
        var i = 0
        while (i < body.length) {
          val u = body(i) & 0xFF
          val c = t(u)
          if (c == 0 && u != 0) return null
          out(i) = c
          i += 1
        }
        UTF8String.fromString(new String(out))
      case _ => null // unknown label: decline, never guess-garble
    }
  }
}

/** `graft_http_wrap(seed, status, content_type, body, mode, coding)`
  * → binary: the fixture's HTTP response builder (see
  * [[HttpBody.wrap]]). */
case class HttpWrap(children: Seq[Expression]) extends Expression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = {
    val expected = Seq(LongType, IntegerType, StringType, BinaryType,
      IntegerType, IntegerType)
    if (children.length == 6 && children.map(_.dataType) == expected)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_http_wrap expects (long seed, int status, string content_type, binary body, int mode, int coding)")
  }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_http_wrap"

  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.exists(_ == null)) null
    else HttpBody.wrap(vs(0).asInstanceOf[Long], vs(1).asInstanceOf[Int],
      vs(2).asInstanceOf[UTF8String].toString,
      vs(3).asInstanceOf[Array[Byte]], vs(4).asInstanceOf[Int],
      vs(5).asInstanceOf[Int])
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HttpWrap = copy(children = newChildren)
}
