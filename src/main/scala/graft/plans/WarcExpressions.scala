package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** WARC record triage — the container EVERY web-scale text corpus
  * starts from (Common Crawl ships WARC; so does every Heritrix-
  * family crawler), parsed from the public ISO 28500 grammar. This is
  * the ingest-side pass a 100 TB pipeline runs before any HTML or
  * text work: split the archive into records, read the typed headers,
  * and route response payloads onward.
  *
  * `graft_warc_records(binary)` → `array<struct<warc_type string,
  * target_uri string, content_length bigint>>`, one element per
  * record in order:
  *
  *  - a COMPRESSED archive (gzip magic) is split at gzip-member
  *    boundaries — ISO 28500 Annex D's one-record-per-member layout,
  *    the reason range requests into petabyte archives work — each
  *    member inflated through the gzip triage's machinery (same bomb
  *    ceiling, CRC-validated, see GzipMeta.inflateMember) and parsed
  *    as exactly one record;
  *  - an UNCOMPRESSED archive ("WARC/" magic) is parsed record-by-
  *    record, each skipped by its Content-Length (never scanned —
  *    a payload may legally contain "WARC/1.0");
  *  - per record: the `WARC/1.x` version line, CRLF header block
  *    (names case-insensitive), the mandatory Content-Length, the
  *    payload skip, and the two-CRLF record terminator.
  *
  * Parse-or-NULL: any structural failure (bad version line, missing
  * Content-Length, lying lengths, missing terminator, a member that
  * is not exactly one record) NULLs the DOCUMENT — an archive that
  * doesn't parse end-to-end must surface as broken, not as a shorter
  * record list. Bounds: 4096 records, 64 headers/record, 4 KiB
  * header lines. */
case class WarcRecords(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_warc_records expects a binary column, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(WarcRecords.recordSchema, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_warc_records"

  override def nullSafeEval(input: Any): Any =
    WarcRecords.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => s"""
      ${ev.value} = graft.plans.WarcRecords.parse($b);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): WarcRecords =
    copy(child = newChild)
}

object WarcRecords {

  val recordSchema: StructType = StructType(Seq(
    StructField("warc_type", StringType),
    StructField("target_uri", StringType),
    StructField("content_length", LongType)))

  private val MaxRecords = 4096
  private val MaxHeaders = 64
  private val MaxHeaderLine = 4096

  /** One record at `off` in `b`; returns (type, uri, clen, end) or
    * None. `end` sits after the record's two-CRLF terminator. */
  private def record(b: Array[Byte], off: Int): Option[(String, String, Long, Int)] = {
    var i = off
    def line(): String = {
      val start = i
      while (i + 1 < b.length && !(b(i) == '\r' && b(i + 1) == '\n') &&
        i - start < MaxHeaderLine) i += 1
      if (i + 1 >= b.length || b(i) != '\r') return null
      val s = new String(b, start, i - start, "ISO-8859-1")
      i += 2
      s
    }
    val version = line()
    if (version == null || !version.startsWith("WARC/1.") ||
      version.length != 8 || !version.charAt(7).isDigit) return None
    var warcType: String = null
    var uri: String = null
    var clen = -1L
    var headers = 0
    var done = false
    while (!done && headers < MaxHeaders) {
      val l = line()
      if (l == null) return None
      if (l.isEmpty) done = true
      else {
        val colon = l.indexOf(':')
        if (colon <= 0) return None
        val name = l.substring(0, colon).trim.toLowerCase(java.util.Locale.ROOT)
        val value = l.substring(colon + 1).trim
        name match {
          case "warc-type" => warcType = value
          case "warc-target-uri" => uri = value
          case "content-length" =>
            if (value.isEmpty || !value.forall(_.isDigit) ||
              value.length > 15) return None
            clen = value.toLong
          case _ => ()
        }
        headers += 1
      }
    }
    if (!done || warcType == null || clen < 0) return None
    // payload skip (length-delimited — NEVER scanned) + the
    // two-CRLF record terminator (ISO 28500 §4)
    if (i + clen + 4 > b.length) return None
    i += clen.toInt
    if (b(i) != '\r' || b(i + 1) != '\n' ||
      b(i + 2) != '\r' || b(i + 3) != '\n') return None
    Some((warcType, uri, clen, i + 4))
  }

  private def row(t: String, uri: String, clen: Long): InternalRow =
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(t),
      if (uri == null) null else UTF8String.fromString(uri),
      clen))

  /** The FIRST response record's (target_uri, payload bytes), or null
    * — the ingest hop that routes crawl content onward (the archive up
    * to and including that record must be structurally sound; the
    * same per-record grammar and gzip machinery as [[parse]]). */
  def parseResponse(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 12) return null
    def fromRecord(bytes: Array[Byte], uri: String, clen: Long,
        end: Int): InternalRow =
      new GenericInternalRow(Array[Any](
        if (uri == null) null else UTF8String.fromString(uri),
        java.util.Arrays.copyOfRange(bytes, end - 4 - clen.toInt, end - 4)))
    if ((b(0) & 0xFF) == 0x1F && (b(1) & 0xFF) == 0x8B) {
      var at = 0
      var seen = 0
      while (at < b.length && seen < MaxRecords) {
        GzipMeta.inflateMember(b, at) match {
          case None => return null
          case Some((bytes, end)) =>
            record(bytes, 0) match {
              case Some((t, uri, clen, recEnd)) if recEnd == bytes.length =>
                if (t == "response") return fromRecord(bytes, uri, clen, recEnd)
              case _ => return null
            }
            at = end; seen += 1
        }
      }
      null
    } else if (b.length >= 7 && new String(b, 0, 5, "ISO-8859-1") == "WARC/") {
      var at = 0
      var seen = 0
      while (at < b.length && seen < MaxRecords) {
        record(b, at) match {
          case None => return null
          case Some((t, uri, clen, end)) =>
            if (t == "response") return fromRecord(b, uri, clen, end)
            at = end; seen += 1
        }
      }
      null
    } else null
  }

  def parse(b: Array[Byte]): GenericArrayData = {
    if (b == null || b.length < 12) return null
    val out = new scala.collection.mutable.ArrayBuffer[InternalRow]()
    if ((b(0) & 0xFF) == 0x1F && (b(1) & 0xFF) == 0x8B) {
      // compressed archive: one record per gzip member (Annex D)
      var at = 0
      while (at < b.length && out.length < MaxRecords) {
        GzipMeta.inflateMember(b, at) match {
          case None => return null
          case Some((bytes, end)) =>
            record(bytes, 0) match {
              // the member must hold EXACTLY one record
              case Some((t, uri, clen, recEnd)) if recEnd == bytes.length =>
                out += row(t, uri, clen)
              case _ => return null
            }
            at = end
        }
      }
      if (at != b.length) return null // record-count ceiling exceeded
    } else if (b.length >= 7 &&
      new String(b, 0, 5, "ISO-8859-1") == "WARC/") {
      var at = 0
      while (at < b.length && out.length < MaxRecords) {
        record(b, at) match {
          case None => return null
          case Some((t, uri, clen, end)) =>
            out += row(t, uri, clen)
            at = end
        }
      }
      if (at != b.length) return null
    } else return null
    if (out.isEmpty) null else new GenericArrayData(out.toArray[Any])
  }
}

/** `graft_warc_encode(seed, compressed)` → binary: a three-record WARC
  * archive for the fixture corpus — warcinfo (no URI), request, and
  * response records sharing a seed-derived target URI, each content
  * length its own seed arithmetic, every payload deterministic filler.
  * `compressed` emits the Annex D layout (one gzip member per record,
  * through the gzip fixture encoder's Deflater); both layouts carry
  * IDENTICAL records, so one oracle certifies both paths. */
case class WarcEncode(children: Seq[Expression]) extends Expression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = {
    val expected = Seq(LongType, BooleanType)
    if (children.length == 2 && children.map(_.dataType) == expected)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_warc_encode expects (long seed, boolean compressed)")
  }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_warc_encode"

  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.exists(_ == null)) null
    else WarcEncode.encode(vs(0).asInstanceOf[Long], vs(1).asInstanceOf[Boolean])
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): WarcEncode = copy(children = newChildren)
}

object WarcEncode {

  /** The three records' (type, uri, content_length) as pure seed
    * arithmetic — the contract the DuckDB oracle restates. */
  def recordPlan(seed: Long): Seq[(String, String, Int)] = {
    val uri = s"http://ex${seed % 100}.org/p${seed % 13}"
    Seq(
      ("warcinfo", null, (seed % 40 + 10).toInt),
      ("request", uri, (seed % 30 + 8).toInt),
      ("response", uri, (seed % 200 + 50).toInt))
  }

  /** Deterministic filler payload for record `idx`. */
  private def filler(seed: Long, idx: Int, clen: Int): Array[Byte] =
    Array.tabulate(clen)(j =>
      (((seed + 17L * idx + 7L * j) % 251 + 251) % 251).toByte)

  private def recordBytes(seed: Long, idx: Int, t: String, uri: String,
      payload: Array[Byte]): Array[Byte] = {
    val sb = new StringBuilder()
    sb.append("WARC/1.0\r\n")
    sb.append(s"WARC-Type: $t\r\n")
    sb.append(s"WARC-Record-ID: <urn:graft:$seed-$idx>\r\n")
    if (uri != null) sb.append(s"WARC-Target-URI: $uri\r\n")
    sb.append(s"Content-Length: ${payload.length}\r\n")
    sb.append("\r\n")
    val head = sb.toString.getBytes("ISO-8859-1")
    head ++ payload ++ "\r\n\r\n".getBytes("ISO-8859-1")
  }

  private def gzipMember(payload: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(0x1F); out.write(0x8B); out.write(8); out.write(0)
    out.write(0); out.write(0); out.write(0); out.write(0) // MTIME
    out.write(0); out.write(3) // XFL, OS=unix
    val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
    try {
      d.setInput(payload); d.finish()
      val buf = new Array[Byte](4096)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    } finally d.end()
    val crc = new java.util.zip.CRC32()
    crc.update(payload)
    def w32(v: Long): Unit = {
      out.write(v.toInt & 0xFF); out.write((v >> 8).toInt & 0xFF)
      out.write((v >> 16).toInt & 0xFF); out.write((v >> 24).toInt & 0xFF)
    }
    w32(crc.getValue)
    w32(payload.length.toLong)
    out.toByteArray
  }

  def encode(seed: Long, compressed: Boolean): Array[Byte] =
    encodeWith(seed, compressed, None)

  /** The same three-record archive with an EXPLICIT response body —
    * the composed-pipeline fixture (the body is the HTML page the
    * ingest query extracts); None = the default filler. */
  def encodeWith(seed: Long, compressed: Boolean,
      responseBody: Option[Array[Byte]]): Array[Byte] = {
    if (seed < 0) return null
    val out = new java.io.ByteArrayOutputStream()
    recordPlan(seed).zipWithIndex.foreach { case ((t, uri, clen), idx) =>
      val payload =
        if (t == "response") responseBody.getOrElse(filler(seed, idx, clen))
        else filler(seed, idx, clen)
      val rec = recordBytes(seed, idx, t, uri, payload)
      val bytes = if (compressed) gzipMember(rec) else rec
      out.write(bytes, 0, bytes.length)
    }
    out.toByteArray
  }
}

/** `graft_warc_response(binary)` → `struct<target_uri string,
  * payload binary>`: the first response record's URI + raw payload —
  * the hop that routes crawl content onward. */
case class WarcResponse(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_warc_response expects a binary column, got ${child.dataType.catalogString}")
  override def dataType: DataType = StructType(Seq(
    StructField("target_uri", StringType),
    StructField("payload", BinaryType)))
  override def nullable: Boolean = true
  override def prettyName: String = "graft_warc_response"

  override def nullSafeEval(input: Any): Any =
    WarcRecords.parseResponse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => s"""
      ${ev.value} = graft.plans.WarcRecords.parseResponse($b);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): WarcResponse =
    copy(child = newChild)
}

/** `graft_warc_wrap(seed, compressed, body)` → binary: the fixture
  * archive with `body` as the response record's payload — the
  * composed-ingest corpus builder. */
case class WarcWrap(children: Seq[Expression]) extends Expression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = {
    val expected = Seq(LongType, BooleanType, BinaryType)
    if (children.length == 3 && children.map(_.dataType) == expected)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_warc_wrap expects (long seed, boolean compressed, binary body)")
  }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_warc_wrap"

  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.exists(_ == null)) null
    else WarcEncode.encodeWith(vs(0).asInstanceOf[Long],
      vs(1).asInstanceOf[Boolean],
      Some(vs(2).asInstanceOf[Array[Byte]]))
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): WarcWrap = copy(children = newChildren)
}
