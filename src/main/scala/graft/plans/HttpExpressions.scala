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
  * mojibake-never law: an undecodable body (malformed bytes, an
  * unknown label) returns NULL — a declined row is recoverable,
  * silently garbled text poisons every downstream
  * dedup/quality/tokenize pass. */
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
      case _ => null
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
        metaRe.findFirstMatchIn(head).map(_.group(1)).orNull
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
