package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** sitemaps.org XML triage — the discovery half of the crawl-policy
  * pair (robots.txt points at it via `Sitemap:`): a fetcher reads the
  * sitemap to learn WHAT to crawl and how fresh it is. Parsed as the
  * protocol's fixed element subset (the files are machine-generated
  * against a 9-element schema — no general XML machinery needed or
  * wanted at corpus scale):
  *
  * `graft_sitemap_urls(xml)` → `array<struct<kind string, loc string,
  * lastmod string>>`:
  *
  *  - a `<urlset>` document yields kind `url` rows from its `<url>`
  *    entries; a `<sitemapindex>` yields kind `sitemap` rows from its
  *    `<sitemap>` entries (the two-level layout big sites ship);
  *  - per entry: `<loc>` required (entries without one SKIP — the
  *    protocol's own lenience), `<lastmod>` optional (null);
  *  - the five XML entities decode in loc values (URLs legally carry
  *    `&amp;`);
  *  - NULL only when the document has neither root element (not a
  *    sitemap at all). Bounds: 4096 entries, 4 KiB values. */
case class SitemapUrls(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_sitemap_urls expects a string column, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(Sitemap.schema, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_sitemap_urls"

  override def nullSafeEval(input: Any): Any =
    Sitemap.parse(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => s"""
      ${ev.value} = graft.plans.Sitemap.parse($t.toString());
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): SitemapUrls =
    copy(child = newChild)
}

object Sitemap {

  val schema: StructType = StructType(Seq(
    StructField("kind", StringType),
    StructField("loc", StringType),
    StructField("lastmod", StringType)))

  private val MaxEntries = 4096
  private val MaxValue = 4096

  private def decode(s: String): String =
    s.replace("&lt;", "<").replace("&gt;", ">").replace("&quot;", "\"")
      .replace("&apos;", "'").replace("&amp;", "&")

  /** The text content of the FIRST `<tag>...</tag>` inside
    * [from, to), trimmed; null when absent or oversized. */
  private def element(x: String, tag: String, from: Int, to: Int): String = {
    val open = x.indexOf(s"<$tag>", from)
    if (open < 0 || open >= to) return null
    val start = open + tag.length + 2
    val close = x.indexOf(s"</$tag>", start)
    if (close < 0 || close > to || close - start > MaxValue) return null
    x.substring(start, close).trim
  }

  def parse(xml: String): GenericArrayData = {
    if (xml == null) return null
    val (entryTag, kind) =
      if (xml.contains("<urlset")) ("url", "url")
      else if (xml.contains("<sitemapindex")) ("sitemap", "sitemap")
      else return null
    val out = new scala.collection.mutable.ArrayBuffer[InternalRow]()
    var at = 0
    var n = 0
    while (n < MaxEntries) {
      val open = xml.indexOf(s"<$entryTag>", at)
      if (open < 0) return new GenericArrayData(out.toArray[Any])
      val close = xml.indexOf(s"</$entryTag>", open)
      if (close < 0) return new GenericArrayData(out.toArray[Any])
      val loc = element(xml, "loc", open, close)
      val lastmod = element(xml, "lastmod", open, close)
      if (loc != null && loc.nonEmpty)
        out += new GenericInternalRow(Array[Any](
          UTF8String.fromString(kind),
          UTF8String.fromString(decode(loc)),
          if (lastmod == null) null else UTF8String.fromString(lastmod)))
      at = close + entryTag.length + 3
      n += 1
    }
    new GenericArrayData(out.toArray[Any])
  }
}
