package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** pptx slide-text extraction — the third member of the ZIP-of-XML
  * office family. DrawingML wraps presentation text in `<a:p>`
  * paragraphs of `<a:r><a:t>` runs inside each `ppt/slides/slideN.xml`
  * part, so the docx tag-scan discipline applies with the `a:`
  * prefix and a per-slide part walk on top.
  *
  * `graft_pptx_slides(binary)` → `array<string>`, one element per
  * slide in deck order (slide1, slide2, ... — consecutive parts until
  * the first missing number, the layout every real writer emits; cap
  * 256):
  *
  *  - `<a:p>` paragraphs join with '\n' within a slide;
  *  - `<a:t>` run contents concatenate in document order, entities
  *    and numeric references decoded;
  *  - `<a:br/>` appends '\n' (DrawingML's explicit line break);
  *  - `<a:pPr>`/`<a:rPr>` property blocks and all other elements are
  *    inert by the tag-name-delimiter rule.
  *
  * Each part arrives through the census's CRC-gated [[ZipExtract]].
  * NULL when the archive is corrupt, has NO slide parts at all (a
  * deck with zero slides is not a deck), or exceeds the 256-slide /
  * 8192-paragraph caps with more content present — over-cap
  * declines, never truncates. Shared 1 MiB extract ceiling per
  * part. */
case class PptxSlides(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_pptx_slides expects a binary column, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_pptx_slides"

  override def nullSafeEval(input: Any): Any =
    PptxSlides.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => s"""
      ${ev.value} = graft.plans.PptxSlides.parse($b);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): PptxSlides =
    copy(child = newChild)
}

object PptxSlides {

  private val MaxSlides = 256
  private val MaxParas = 8192

  private def delimAt(x: String, at: Int): Boolean =
    at >= x.length || {
      val c = x.charAt(at)
      c == '>' || c == '/' || c == ' ' || c == '\t' || c == '\n' || c == '\r'
    }

  private val DrawingMlNs =
    "http://schemas.openxmlformats.org/drawingml/2006/main"

  /** One slide part's text: the docx walk with the `a:` prefix. Null
    * on malformed nesting — or when the slide binds the DrawingML
    * namespace to a prefix OTHER than `a:` (the scan would silently
    * read such a slide as empty; every real writer binds `a:`, so
    * the rename case declines instead). A slide with no DrawingML
    * binding at all stays legal: a genuinely empty slide has no text
    * namespace to bind. */
  private def slideText(x: String): String = {
    var nsAt = x.indexOf(DrawingMlNs)
    while (nsAt >= 0) {
      if (nsAt < 9 || !x.regionMatches(nsAt - 9, "xmlns:a=\"", 0, 9))
        return null
      nsAt = x.indexOf(DrawingMlNs, nsAt + 1)
    }
    val out = new java.lang.StringBuilder(128)
    var at = 0
    var paras = 0
    while (paras < MaxParas) {
      var open = x.indexOf("<a:p", at)
      while (open >= 0 && !delimAt(x, open + 4)) open = x.indexOf("<a:p", open + 4)
      if (open < 0) return out.toString
      val openGt = x.indexOf('>', open)
      if (openGt < 0) return null
      if (paras > 0) out.append('\n')
      paras += 1
      if (x.charAt(openGt - 1) == '/') at = openGt + 1
      else {
        val end = x.indexOf("</a:p>", openGt)
        if (end < 0) return null
        var i = openGt + 1
        while (i < end) {
          val lt = x.indexOf('<', i)
          if (lt < 0 || lt >= end) i = end
          else if (x.startsWith("<a:t", lt) && delimAt(x, lt + 4)) {
            val gt = x.indexOf('>', lt)
            if (gt < 0 || gt > end) return null
            if (x.charAt(gt - 1) == '/') i = gt + 1
            else {
              val close = x.indexOf("</a:t>", gt + 1)
              if (close < 0 || close > end) return null
              out.append(DocxText.decodeEntities(x.substring(gt + 1, close)))
              i = close + 6
            }
          } else if (x.startsWith("<a:br", lt) && delimAt(x, lt + 5)) {
            out.append('\n')
            val gt = x.indexOf('>', lt)
            if (gt < 0 || gt > end) return null
            i = gt + 1
          } else i = lt + 1
        }
        at = end + 6
      }
    }
    // cap reached: decline if more paragraphs remain (never truncate)
    var more = x.indexOf("<a:p", at)
    while (more >= 0 && !delimAt(x, more + 4)) more = x.indexOf("<a:p", more + 4)
    if (more >= 0) null else out.toString
  }

  def parse(zip: Array[Byte]): GenericArrayData = {
    val slides = Vector.newBuilder[UTF8String]
    var n = 1
    var done = false
    while (!done && n <= MaxSlides) {
      val part = ZipExtract.extract(zip, s"ppt/slides/slide$n.xml")
      if (part == null) done = true
      else {
        val text = slideText(new String(part, "UTF-8"))
        if (text == null) return null
        slides += UTF8String.fromString(text)
        n += 1
      }
    }
    // slide part numbers need not be contiguous (order is normatively
    // presentation.xml's sldIdLst, and parts aren't renumbered on
    // deletion): any slideK.xml at or beyond the walk's stop point in
    // the central directory means the consecutive walk would silently
    // truncate the deck — decline rather than serve a partial deck.
    // This also covers the deck-bigger-than-MaxSlides case.
    val names = ZipEntries.entryNames(zip)
    if (names == null) return null
    val SlidePart = "ppt/slides/slide([0-9]+)\\.xml".r
    var j = 0
    while (j < names.length) {
      names(j) match {
        case SlidePart(k) if k.length > 9 || k.toInt >= n => return null
        case _ =>
      }
      j += 1
    }
    val out = slides.result()
    if (out.isEmpty) null else new GenericArrayData(out.toArray[Any])
  }
}

/** `graft_pptx_encode(seed, n_slides)` → binary: a REAL pptx written
  * by the JDK's ZipOutputStream with the minimal OPC part set. Each
  * slide carries two DrawingML paragraphs — a title run and a body
  * split across runs with live entities plus an `<a:br/>` on
  * (seed+i)%2==0 slides — all (seed, slide) arithmetic for the
  * oracle ([[PptxEncode.decodedSlide]]). */
case class PptxEncode(children: Seq[Expression]) extends Expression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = {
    val expected = Seq(LongType, IntegerType)
    if (children.length == 2 && children.map(_.dataType) == expected)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_pptx_encode expects (long seed, int n_slides)")
  }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_pptx_encode"

  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.exists(_ == null)) null
    else PptxEncode.encode(vs(0).asInstanceOf[Long], vs(1).asInstanceOf[Int])
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): PptxEncode = copy(children = newChildren)
}

object PptxEncode {

  /** Slide i's (1-based) decoded text — the oracle's contract. */
  def decodedSlide(seed: Long, i: Int): String = {
    val k = (seed + i) % 9
    val brk = if ((seed + i) % 2 == 0) "\nmore" else ""
    s"Slide $i of deck $seed\nnote & <pt> k=$k$brk"
  }

  private val ContentTypes =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
      |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
      |<Default Extension="xml" ContentType="application/xml"/>
      |<Override PartName="/ppt/presentation.xml" ContentType="application/vnd.openxmlformats-officedocument.presentationml.presentation.main+xml"/>
      |</Types>""".stripMargin

  private val Rels =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
      |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="ppt/presentation.xml"/>
      |</Relationships>""".stripMargin

  def encode(seed: Long, nSlides: Int): Array[Byte] = {
    if (seed < 0 || nSlides < 1 || nSlides > 64) return null
    def slide(i: Int): String = {
      val k = (seed + i) % 9
      val brkRun =
        if ((seed + i) % 2 == 0) "<a:r><a:br/><a:t>more</a:t></a:r>" else ""
      "<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>\n" +
        "<p:sld xmlns:a=\"http://schemas.openxmlformats.org/drawingml/2006/main\" " +
        "xmlns:p=\"http://schemas.openxmlformats.org/presentationml/2006/main\">" +
        "<p:cSld><p:spTree><p:sp><p:txBody>" +
        s"<a:p><a:pPr lvl=\"0\"/><a:r><a:t>Slide $i of deck $seed</a:t></a:r></a:p>" +
        "<a:p><a:r><a:t>note &amp; </a:t></a:r>" +
        s"<a:r><a:rPr b=\"1\"/><a:t>&lt;pt&gt; k=$k</a:t></a:r>$brkRun</a:p>" +
        "</p:txBody></p:sp></p:spTree></p:cSld></p:sld>"
    }
    val presentation =
      "<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>\n" +
        "<p:presentation xmlns:p=\"http://schemas.openxmlformats.org/presentationml/2006/main\">" +
        "<p:sldIdLst>" +
        (1 to nSlides).map(i => s"""<p:sldId id="${255 + i}"/>""").mkString +
        "</p:sldIdLst></p:presentation>"
    val bos = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bos)
    try {
      z.putNextEntry(new java.util.zip.ZipEntry("[Content_Types].xml"))
      z.write(ContentTypes.getBytes("UTF-8")); z.closeEntry()
      z.putNextEntry(new java.util.zip.ZipEntry("_rels/.rels"))
      z.write(Rels.getBytes("UTF-8")); z.closeEntry()
      // the main part — also graft_zip_kind's routing anchor
      z.putNextEntry(new java.util.zip.ZipEntry("ppt/presentation.xml"))
      z.write(presentation.getBytes("UTF-8")); z.closeEntry()
      (1 to nSlides).foreach { i =>
        z.putNextEntry(new java.util.zip.ZipEntry(s"ppt/slides/slide$i.xml"))
        z.write(slide(i).getBytes("UTF-8")); z.closeEntry()
      }
    } finally z.close()
    bos.toByteArray
  }
}
