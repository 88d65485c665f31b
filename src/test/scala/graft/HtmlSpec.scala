package graft

import org.apache.spark.sql.functions._
import graft.operators.Html
import graft.plans.HtmlText

/** plans.HtmlText semantics + the Html fixture pipeline.
  *
  * The extractor's contract: total over arbitrary strings (never
  * throws, never NULL), script/style/comment content dropped, entities
  * decoded, whitespace collapsed, HTML5 bare-`<` text rule. The
  * fixture queries are additionally oracled end to end by the driver
  * (round-trip identity — see Queries.scala), so this suite focuses on
  * the hand-reachable corners and hostile input. */
class HtmlSpec extends SparkSpec {

  private def x(s: String): String = HtmlText.extractString(s)

  test("tags drop, text survives, whitespace collapses") {
    assert(x("<p>hello   <b>big</b>\n world</p>") === "hello big world")
    assert(x("plain text, no markup") === "plain text, no markup")
    assert(x("  <div>  padded  </div>  ") === "padded")
    assert(x("") === "")
    assert(x("<div><br/><hr></div>") === "")
  }

  test("script and style content is dropped, case-insensitively") {
    assert(x("<script>if (a < b && c > d) { x('<p>'); }</script>after") === "after")
    assert(x("a<STYLE>p { color: #fff }</STyLE>b") === "a b")
    assert(x("<script src=\"x.js\">var y = 1;</script>ok") === "ok")
    // unterminated raw-text element swallows the rest (spec behavior)
    assert(x("keep<script>var a = 1;") === "keep")
  }

  test("comments drop; quoted '>' does not end a tag") {
    assert(x("a<!-- <p>not text</p> -->b") === "a b")
    assert(x("a<!-- unterminated") === "a")
    assert(x("""<a title="1 > 0" href='x>y'>in</a>""") === "in")
  }

  test("entities decode; unknown and malformed stay literal") {
    assert(x("&amp; &lt;b&gt; &quot;q&quot; &apos;a&apos;") === "& <b> \"q\" 'a'")
    assert(x("A&nbsp;B") === "A B")
    assert(x("&#65;&#x42;&#X43;") === "ABC")
    assert(x("&unknown; &amp &#xZZ; &#; & alone") === "&unknown; &amp &#xZZ; &#; & alone")
    // surrogate-range and out-of-range numeric refs stay literal
    assert(x("&#xD800; &#1114112;") === "&#xD800; &#1114112;")
    assert(x("&#128512;") === new String(Character.toChars(128512)))
  }

  test("HTML5 bare-'<' rule: non-markup '<' is text") {
    assert(x("x < 3 and y > 1") === "x < 3 and y > 1")
    assert(x("a <3 b") === "a <3 b")
    assert(x("5<6 but 7</b>") === "5<6 but 7")
    // only ASCII alpha opens a tag (r13 regression): '<' before a
    // non-Latin letter is TEXT per the HTML5 tag-open state — treating
    // it as a tag silently deleted CJK/Cyrillic content
    assert(x("x <中文> y") === "x <中文> y")
    assert(x("а <бв> г") === "а <бв> г")
  }

  test("abruptly-closed empty comments terminate (r13 regression)") {
    // "<!-->" and "<!--->" are COMPLETE comments per HTML5
    // (abrupt-closing-of-empty-comment) — the old parse searched for
    // '-->' past them and swallowed the whole rest of the document
    assert(x("<!-->hello world") === "hello world")
    assert(x("<!--->hello world") === "hello world")
    assert(x("a<!-->b<!--real comment-->c") === "a b c")
  }

  test("extractor is total over hostile input (fuzz, never throws)") {
    val alphabet = "<>&;/!?-\"' ab#xscriptstyleé中"
    val rnd = new scala.util.Random(42)
    var trials = 0
    while (trials < 20000) {
      val len = rnd.nextInt(60)
      val s = new String(Array.fill(len)(alphabet.charAt(rnd.nextInt(alphabet.length))))
      val out = x(s) // must not throw
      assert(out != null)
      // idempotence on tag-free output is NOT guaranteed (decoded
      // entities may re-form entity-like text), but collapse is:
      assert(!out.contains("  ") && out == out.trim)
      trials += 1
    }
  }

  test("codegen path equals interpreted path on hostile strings") {
    import spark.implicits._
    val alphabet = "<>&;/!?-\"' ab#xscriptstyleé中"
    val rnd = new scala.util.Random(7)
    val hostile = Seq.fill(2000) {
      val len = rnd.nextInt(80)
      new String(Array.fill(len)(alphabet.charAt(rnd.nextInt(alphabet.length))))
    }
    val viaSpark = hostile.toDF("s")
      .select(graft.plans.VectorExpressions.htmlText(col("s")).as("o"))
      .collect().map(_.getString(0))
    val viaStatic = hostile.map(x)
    assert(viaSpark.toSeq === viaStatic,
      "whole-stage-codegen extraction diverged from the static parser")
  }

  test("fixture round-trip: extraction recovers the synthesized text") {
    val rows = Html.htmlExtract(spark, sf).limit(5).collect()
    assert(rows.nonEmpty)
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"), col("text"))
      .filter(col("doc_id") < 5).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    rows.foreach { r =>
      val id = r.getLong(0)
      val (src, text) = docs(id)
      val expected = s"Doc $id - $src Doc $id ${text.trim.replaceAll("\\s+", " ")} " +
        s"""Entities: & <b> "q" AB &unknown; end more ${id % 7} home"""
      assert(r.getString(1) === expected, s"doc $id")
    }
  }

  test("links are harvested, entity-decoded, and normalized") {
    val rows = Html.htmlLinks(spark, sf).filter(col("doc_id") === 3).collect()
    assert(rows.length === 2)
    val src = Tables.documents(spark, sf).filter(col("doc_id") === 3)
      .select(col("source")).head().getString(0)
    assert(rows.map(_.getString(1)).toSeq === Seq(
      s"http://$src.example.com/index.html",
      s"https://$src.example.com/docs/3?ref=feed&src=$src"))
    assert(rows.forall(_.getString(2) == s"$src.example.com"))
  }

  test("domain blocklist filters whole domains via broadcast anti-join") {
    val out = Html.domainBlocklist(spark, sf).collect()
    val domains = out.map(_.getString(0)).toSet
    assert(Html.blockedDomains.forall(d => !domains.contains(d)))
    assert(domains.nonEmpty)
    // plan pin: the anti-join must be a broadcast, never a shuffle
    val plan = Html.domainBlocklist(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"expected broadcast anti-join in:\n$plan")
  }
}
