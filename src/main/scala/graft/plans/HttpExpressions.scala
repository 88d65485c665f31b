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
  * string, body binary>`:
  *
  *  - status line `HTTP/1.<d> <3 digits> <reason>` (reason optional);
  *  - CRLF header block, names case-insensitive; `Content-Type`
  *    reported as its media type alone (parameters after ';'
  *    dropped, lowercased — the routing key, not the charset);
  *  - the body = everything after the blank line, raw. When a
  *    `Content-Length` header is present it must not claim MORE than
  *    the bytes available (a lying length is a truncated capture —
  *    decline); fewer is allowed (the WARC record's own length is
  *    authoritative, trailing bytes beyond the claim are kept out);
  *  - `Transfer-Encoding: chunked` bodies are DE-CHUNKED (RFC 9112
  *    §7.1 — crawlers store what the wire carried): hex sizes,
  *    per-chunk CRLFs, the 0-chunk terminator; trailers skipped.
  *
  * Parse-or-NULL: malformed status line, header without ':', chunk
  * framing errors, and bounds violations NULL the row; 64 headers,
  * 4 KiB lines, 4096 chunks. */
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
    var contentLength = -1L
    var chunked = false
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
          case "content-length" =>
            if (value.isEmpty || !value.forall(_.isDigit) ||
              value.length > 15) return null
            contentLength = value.toLong
          case "transfer-encoding" =>
            if (value.toLowerCase(java.util.Locale.ROOT).contains("chunked"))
              chunked = true
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
    new GenericInternalRow(Array[Any](
      code.toInt,
      if (contentType == null) null else UTF8String.fromString(contentType),
      body))
  }

  /** Fixture twin: wrap `body` in a deterministic HTTP/1.1 response.
    * mode 0 = Content-Length; 1 = chunked (seed-derived chunk sizes,
    * an extension on the first chunk, one trailer); 2 = neither
    * (read-to-end). status/content-type ride from the caller so the
    * oracle restates them. */
  def wrap(seed: Long, status: Int, contentType: String, body: Array[Byte],
      mode: Int): Array[Byte] = {
    if (seed < 0 || status < 100 || status > 999 || mode < 0 || mode > 2) return null
    val sb = new StringBuilder()
    sb.append(s"HTTP/1.1 $status OK\r\n")
    sb.append(s"Server: graft/${seed % 10}\r\n")
    sb.append(s"Content-Type: $contentType\r\n")
    mode match {
      case 0 => sb.append(s"Content-Length: ${body.length}\r\n\r\n")
      case 1 => sb.append("Transfer-Encoding: chunked\r\n\r\n")
      case _ => sb.append(s"X-Graft-Seed: $seed\r\n\r\n")
    }
    val head = sb.toString.getBytes("ISO-8859-1")
    if (mode != 1) return head ++ body
    // chunked: split the body into 1..4 seed-sized chunks
    val out = new java.io.ByteArrayOutputStream()
    out.write(head, 0, head.length)
    var at = 0
    var k = 0
    while (at < body.length) {
      val sz = math.min(body.length - at, (seed % 97 + 40 + 13 * k).toInt)
      val ext = if (k == 0) ";graft=1" else ""
      val hdr = s"${sz.toHexString}$ext\r\n".getBytes("ISO-8859-1")
      out.write(hdr, 0, hdr.length)
      out.write(body, at, sz)
      out.write('\r'); out.write('\n')
      at += sz
      k += 1
    }
    val tail = "0\r\nX-Trailer: t\r\n\r\n".getBytes("ISO-8859-1")
    out.write(tail, 0, tail.length)
    out.toByteArray
  }
}

/** `graft_http_wrap(seed, status, content_type, body, mode)` → binary:
  * the fixture's HTTP response builder (see [[HttpBody.wrap]]). */
case class HttpWrap(children: Seq[Expression]) extends Expression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = {
    val expected = Seq(LongType, IntegerType, StringType, BinaryType, IntegerType)
    if (children.length == 5 && children.map(_.dataType) == expected)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_http_wrap expects (long seed, int status, string content_type, binary body, int mode)")
  }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_http_wrap"

  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.exists(_ == null)) null
    else HttpBody.wrap(vs(0).asInstanceOf[Long], vs(1).asInstanceOf[Int],
      vs(2).asInstanceOf[UTF8String].toString,
      vs(3).asInstanceOf[Array[Byte]], vs(4).asInstanceOf[Int])
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HttpWrap = copy(children = newChildren)
}
