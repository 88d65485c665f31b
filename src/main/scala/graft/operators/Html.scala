package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** HTML ingestion surface: visible-text extraction, link harvest, URL
  * normalization, and domain-blocklist filtering — the web-crawl front
  * end of a training-data pipeline (C4 §2.1, RefinedWeb §3.1), which
  * the reference never needs (aristoteles.py ingests numeric SQLite
  * rows) but any 100 TB text corpus starts from.
  *
  * The corpus is a per-dir synthesized HTML FIXTURE persisted to
  * parquet (same ingest-time discipline as [[Multimodal]]'s media
  * fixture): each document's text is wrapped in a deterministic page —
  * head/title, a style block, a script block whose body contains `<`,
  * `>` and `&&` (the tokens that break regex strippers), a comment,
  * character entities, and two anchors whose hrefs carry entity-coded
  * query strings, mixed-case scheme/host, default ports and fragments.
  * Because synthesis is deterministic from the documents table, every
  * query here is FULLY oracled: DuckDB reconstructs the expected
  * output from the raw columns, so extraction-composed-with-synthesis
  * is checked end to end (round-trip identity), not just eyeballed.
  *
  * Scale shape: extraction is one codegen'd scan (plans.HtmlText —
  * no UDF, no interpreter fallback); link normalization is built-in
  * string functions over the same scan; the blocklist filter is a
  * broadcast anti-join (a blocklist is metadata-sized at any corpus
  * scale). Nothing here shuffles except the final per-domain count. */
object Html {

  /** Deterministic page around one document row (doc_id, text, source,
    * lang). Kept in one concat so fixture writes are a single
    * projection — no per-row format cost beyond string building.
    * Exposed to [[Multimodal]]'s warchtml fixture: the composed
    * WARC-ingest query wraps THIS page as the response payload, so its
    * oracle is the proven text_html_extract round-trip contract. */
  private[operators] def htmlOf: Column = {
    val id = col("doc_id").cast("string")
    val m7 = (col("doc_id") % 7).cast("string")
    concat(
      lit("<!DOCTYPE html>\n<html lang=\""), col("lang"),
      lit("\">\n<head>\n<title>Doc "), id, lit(" - "), col("source"),
      lit("</title>\n<style type=\"text/css\">body { margin: 0; } p.main { color: #222; }</style>\n" +
        "<script type=\"text/javascript\">if (x < 3 && y > 1) { track(\"doc-"), id,
      lit("\"); }</script>\n<meta charset=\"utf-8\"/>\n</head>\n<body>\n" +
        "<!-- synthesized fixture; id="), id,
      lit(" -->\n<h1 id=\"h"), id, lit("\">Doc "), id,
      lit("</h1>\n<p class=\"main\">"), col("text"),
      lit("</p>\n<p>Entities: &amp; &lt;b&gt; &quot;q&quot; &#65;&#x42; &unknown; &nbsp;end</p>\n<ul>\n" +
        "<li><a href=\"https://www."), col("source"), lit(".example.com:443/docs/"), id,
      lit("?ref=feed&amp;src="), col("source"), lit("#frag\">more "), m7,
      lit("</a></li>\n<li><a href=\"HTTP://"), col("source"),
      lit(".Example.COM:80/index.html\">home</a></li>\n</ul>\n</body>\n</html>"))
  }

  /** Writes the per-corpus HTML fixture: one row per document,
    * (doc_id, html). Ingest-time batch job — in production the pages
    * already live in storage (WARC/WET); queries read parquet. */
  def writeHtmlFixture(spark: SparkSession, dir: String, path: String): Unit =
    // documentsParallel: spread the single-row-group doc table before
    // the synthesis projection AND give the fixture multiple files, so
    // the extraction queries' scans parallelize too
    Tables.documentsParallel(spark, dir)
      .select(col("doc_id"), htmlOf.as("html"))
      .write.mode("overwrite").parquet(path)

  private val htmlCache =
    new graft.AppScopedCache[String](Similarity.deleteLocalDir(_), cleanupOnAppEnd = true)

  /** One persisted HTML fixture per corpus, built on first use under a
    * scratch dir deleted on app end — mirrors Multimodal.mediaFixturePath. */
  def htmlFixturePath(spark: SparkSession, dir: String): String =
    htmlCache.getOrCompute(spark, s"$dir#html") {
      val path = java.nio.file.Files.createTempDirectory("graft_html_").toString
      writeHtmlFixture(spark, dir, path)
      path
    }

  /** Release one corpus's HTML fixture now (next query rebuilds). */
  def evictCorpus(spark: SparkSession, dir: String): Unit = {
    htmlCache.evict(spark, s"$dir#html")
    linksCache.evict(spark, s"$dir#links")
  }

  /** Fixture schema memoized per app like the Multimodal slices —
    * (doc_id, html) is immutable once written; skip the per-query
    * footer re-inference. */
  private val pagesSchemaCache =
    new graft.AppScopedCache[org.apache.spark.sql.types.StructType]()

  private def pages(spark: SparkSession, dir: String): DataFrame = {
    val path = htmlFixturePath(spark, dir)
    val schema = pagesSchemaCache.getOrCompute(spark, path)(
      spark.read.parquet(path).schema)
    spark.read.schema(schema).parquet(path)
  }

  /** Visible text per page via the native extractor — one codegen'd
    * scan over the fixture. Oracled as a ROUND-TRIP: extraction must
    * recover exactly the title/heading/body/entity text the synthesis
    * embedded, with script/style/comment content gone and whitespace
    * collapsed. */
  def htmlExtract(spark: SparkSession, dir: String): DataFrame =
    pages(spark, dir)
      .select(col("doc_id"),
        graft.plans.VectorExpressions.htmlText(col("html")).as("extracted"))
      .orderBy(col("doc_id"))

  /** Harvested + normalized links: every href, entity-decoded
    * (&amp; -> &), scheme/host lowercased, `www.` stripped, default
    * port dropped (non-default ports kept), fragment dropped. The
    * `domain` column is the normalized host — the key real pipelines
    * rate-limit, sample, and blocklist by. (A production registrable-
    * domain would consult the Public Suffix List; host-minus-www is
    * the deterministic stand-in at fixture scale.) */
  /** Entity decode for ATTRIBUTE values — the named entities alone,
    * deliberately NOT the full html-text extractor: its tag/comment/
    * whitespace machinery would corrupt a URL containing '<'+letter
    * (parsed as a tag and dropped to the next '>') or collapsible
    * whitespace. &amp; decodes LAST so a double-escaped &amp;lt;
    * yields the literal &lt;, matching browser attribute semantics. */
  private def decodeEntities(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
        "&#39;" -> "'", "&apos;" -> "'", "&amp;" -> "&")
      .foldLeft(c) { case (acc, (e, r)) =>
        regexp_replace(acc, java.util.regex.Pattern.quote(e),
          java.util.regex.Matcher.quoteReplacement(r))
      }

  def htmlLinks(spark: SparkSession, dir: String): DataFrame = {
    val href = decodeEntities(col("href")).as("url0")
    val exploded = pages(spark, dir)
      .select(col("doc_id"),
        explode(expr("regexp_extract_all(html, 'href=\"([^\"]+)\"', 1)")).as("href"))
      .select(col("doc_id"), href)
    val scheme = lower(regexp_extract(col("url0"), "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val host = regexp_replace(lower(parse_url(col("url0"), lit("HOST"))), "^www\\.", "")
    val port = regexp_extract(parse_url(col("url0"), lit("AUTHORITY")), ":(\\d+)$", 1)
    val keptPort = when(port === "" ||
      (scheme === "https" && port === "443") ||
      (scheme === "http" && port === "80"), lit(""))
      .otherwise(concat(lit(":"), port))
    val path = coalesce(parse_url(col("url0"), lit("PATH")), lit(""))
    val query = parse_url(col("url0"), lit("QUERY"))
    exploded
      .select(col("doc_id"),
        concat(scheme, lit("://"), host, keptPort, path,
          when(query.isNotNull, concat(lit("?"), query)).otherwise(lit(""))).as("url"),
        host.as("domain"))
      .orderBy(col("doc_id"), col("url"))
  }

  /** Parsed+normalized links, memoized per corpus (localCheckpoint):
    * the blocklist/cap/url-dedup family all consume the same link
    * table, so the regexp harvest + URL parse runs ONCE per corpus —
    * the build-once-serve-many discipline of the dedup pair memo. */
  private val linksCache =
    new graft.AppScopedCache[DataFrame](graft.AppScopedCache.unpersistPlanRDDs)

  private def linksMemo(spark: SparkSession, dir: String): DataFrame =
    linksCache.getOrCompute(spark, s"$dir#links") {
      htmlLinks(spark, dir).localCheckpoint(false)
    }

  /** URL-level exact dedup — the cheapest, highest-yield dedup in any
    * web pipeline (the same canonical URL fetched repeatedly): group
    * the NORMALIZED urls, report every url multiple documents share.
    * One hash aggregate over the harvested links; at corpus scale this
    * is the pre-pass that removes refetches before any content dedup
    * spends a cycle. On the fixture the per-source home links collide
    * (one per document of that source) while /docs/{id} urls are
    * unique — non-vacuous on both sides of the HAVING. */
  def urlDupGroups(spark: SparkSession, dir: String): DataFrame =
    linksMemo(spark, dir)
      .groupBy(col("url"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        min(col("doc_id")).as("min_doc"))
      .filter(col("n_docs") > 1)
      .orderBy(col("url"))

  /** Per-domain quota (domain balancing): cap each domain's
    * contribution at k documents, chosen by md5(doc_id) — a PURE
    * function of the row, so the kept set is engine/rerun/audit
    * reproducible (the sampleStratified discipline applied to the
    * over-represented-domain problem: C4 and RefinedWeb both bound
    * per-host contribution so one mirror farm can't dominate the mix).
    * One window over the (domain)-partitioned doc list. */
  def domainCap(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("domain"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    linksMemo(spark, dir)
      .select(col("doc_id"), col("domain")).distinct()
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .orderBy(col("domain"), col("rank"))
  }

  /** Deterministic fixture blocklist: the domains a crawl operator
    * would refuse (spam/SEO farms). Literal so both sides agree. */
  val blockedDomains: Seq[String] =
    Seq("src2", "src7", "src12", "src17").map(_ + ".example.com")

  /** Surviving docs per domain after the blocklist anti-join. The
    * domain is derived from the page's own links (the full harvest ->
    * normalize -> filter chain), not read from metadata — so this
    * query exercises the whole pipeline. Blocklist is broadcast:
    * metadata-sized at any corpus scale, no shuffle for the filter. */
  def domainBlocklist(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docDomains = linksMemo(spark, dir)
      .select(col("doc_id"), col("domain")).distinct()
    val blocked = blockedDomains.toDF("domain")
    docDomains
      .join(broadcast(blocked), Seq("domain"), "left_anti")
      .groupBy(col("domain"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("domain"))
  }

  /** Deterministic per-doc robots.txt (the crawl POLICY fixture):
    * a `*` group with a disallow/allow pair and a Crawl-delay, a
    * bot-specific group with a wildcard+anchor pattern, and a
    * standalone Sitemap — every directive doc_id arithmetic, so the
    * rules and gate queries are fully oracled. */
  private def robotsOf: Column = {
    val id = col("doc_id")
    concat(
      lit("# graft fixture "), id.cast("string"), lit("\n"),
      lit("User-agent: *\n"),
      lit("Disallow: /private"), (id % 5).cast("string"), lit("/\n"),
      lit("Allow: /private"), (id % 5).cast("string"), lit("/ok/\n"),
      lit("Crawl-delay: "), (id % 30 + 1).cast("string"), lit("\n\n"),
      lit("User-agent: graftbot\n"),
      lit("Disallow: /docs/*x"), (id % 9).cast("string"), lit(".tmp$\n"),
      lit("Sitemap: https://ex"), (id % 100).cast("string"),
      lit(".org/sitemap.xml\n"))
  }

  private def robotsTable(spark: SparkSession, dir: String): DataFrame =
    Tables.documentsParallel(spark, dir)
      .select(col("doc_id"), robotsOf.as("robots"))

  /** Deterministic per-doc sitemap.xml — the discovery half of the
    * policy pair: every 9th doc a two-level `<sitemapindex>`, the rest
    * `<urlset>` documents whose locs carry `&amp;`-coded query strings
    * (the entity-decode path is load-bearing on most rows). */
  private def sitemapOf: Column = {
    val id = col("doc_id")
    val m = (id % 100).cast("string")
    def urlEntry(i: Int): Column = concat(
      lit(s"<url><loc>https://ex"), m, lit(s".org/p$i?a=1&amp;b=$i</loc>"),
      lit("<lastmod>2024-01-"),
      lpad(((id + i) % 28 + 1).cast("string"), 2, "0"),
      lit("</lastmod></url>\n"))
    val urls = (0 until 6).map(i =>
      when(id % 6 >= i, urlEntry(i)).otherwise(lit(""))).reduce(concat(_, _))
    when(id % 9 === 0,
      concat(
        lit("<?xml version=\"1.0\"?>\n<sitemapindex xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">\n"),
        lit("<sitemap><loc>https://ex"), m, lit(".org/sitemap0.xml</loc>"),
        lit("<lastmod>2024-01-01</lastmod></sitemap>\n"),
        lit("<sitemap><loc>https://ex"), m, lit(".org/sitemap1.xml</loc>"),
        lit("<lastmod>2024-02-01</lastmod></sitemap>\n</sitemapindex>\n")))
      .otherwise(concat(
        lit("<?xml version=\"1.0\"?>\n<urlset xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">\n"),
        urls, lit("</urlset>\n")))
  }

  /** The sitemap entry list, one row per url/sitemap element — what a
    * crawl FRONTIER loads per host after the robots fetch. */
  def sitemapUrls(spark: SparkSession, dir: String): DataFrame =
    Tables.documentsParallel(spark, dir)
      .select(col("doc_id"), sitemapOf.as("xml"))
      .select(col("doc_id"),
        posexplode(graft.plans.VectorExpressions.sitemapUrls(col("xml"))))
      .select(col("doc_id"), col("pos").cast("int").as("url_idx"),
        col("col.kind").as("kind"), col("col.loc").as("loc"),
        col("col.lastmod").as("lastmod"))
      .orderBy(col("doc_id"), col("url_idx"))

  /** The parsed directive list, one row per (group agent × rule) plus
    * the standalone sitemaps — what a crawl scheduler materializes per
    * host. Malformed lines SKIP (robots.txt is famously dirty; a
    * policy parser that declined whole files would fail open). */
  def robotsRules(spark: SparkSession, dir: String): DataFrame =
    robotsTable(spark, dir)
      .select(col("doc_id"),
        posexplode(graft.plans.VectorExpressions.robotsRules(col("robots"))))
      .select(col("doc_id"), col("pos").cast("int").as("rule_idx"),
        col("col.agent").as("agent"), col("col.rule").as("rule"),
        col("col.path").as("path"))
      .orderBy(col("doc_id"), col("rule_idx"))

  /** The access VERDICT (RFC 9309 §2.2): five planted probes per doc
    * exercising group selection (exact token beats `*`), longest-match
    * allow-over-disallow, the `*` wildcard, and the `$` anchor — the
    * gate a compliant fetcher runs per URL before any fetch. */
  def robotsGate(spark: SparkSession, dir: String): DataFrame = {
    val id = col("doc_id")
    val p = (id % 5).cast("string")
    val w = (id % 9).cast("string")
    val cases = array(
      struct(lit(0).as("case_id"), lit("anybot").as("agent"),
        concat(lit("/private"), p, lit("/ok/page")).as("path")),
      struct(lit(1).as("case_id"), lit("anybot").as("agent"),
        concat(lit("/private"), p, lit("/secret")).as("path")),
      struct(lit(2).as("case_id"), lit("graftbot").as("agent"),
        concat(lit("/docs/ax"), w, lit(".tmp")).as("path")),
      struct(lit(3).as("case_id"), lit("graftbot").as("agent"),
        concat(lit("/docs/ax"), w, lit(".tmp.bak")).as("path")),
      struct(lit(4).as("case_id"), lit("anybot").as("agent"),
        concat(lit("/docs/ax"), w, lit(".tmp")).as("path")))
    robotsTable(spark, dir)
      .select(col("doc_id"), col("robots"), explode(cases).as("c"))
      .select(col("doc_id"), col("c.case_id").as("case_id"),
        col("c.agent").as("agent"), col("c.path").as("path"),
        graft.plans.VectorExpressions.robotsAllowed(
          col("robots"), col("c.agent"), col("c.path")).as("allowed"))
      .orderBy(col("doc_id"), col("case_id"))
  }
}
