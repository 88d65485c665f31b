package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_html_text(string)` → string: visible-text extraction from
  * HTML markup — the step every public training-data pipeline runs
  * before cleaning and dedup (C4 §2.1 extracts text from WET/HTML;
  * RefinedWeb §3.1 runs trafilatura). The reference engine ingests
  * already-clean rows (aristoteles.py:240 reads a numeric SQLite
  * table), so this is extension surface, re-expressed Spark-first as
  * a native codegen'd expression rather than a per-row UDF.
  *
  * Semantics (single forward pass, never throws on hostile input):
  *  - tags are dropped; `>` inside a quoted attribute value does not
  *    terminate the tag (attribute quote tracking);
  *  - `<!-- ... -->` comments are dropped (unterminated comment =
  *    rest of input dropped);
  *  - the CONTENT of `<script>` and `<style>` elements is dropped
  *    up to the matching case-insensitive closing tag (script bodies
  *    legitimately contain `<`, `>`, `&&` — the reason naive regex
  *    tag-stripping corrupts real pages);
  *  - character entities in text are decoded: the five XML named
  *    entities, `&nbsp;` (to a plain space), and decimal/hex numeric
  *    references (`&#65;` / `&#x41;`); an unknown or malformed
  *    entity is kept literally;
  *  - all whitespace runs (including whitespace born from dropped
  *    tags and decoded `&nbsp;`) collapse to one ASCII space, and the
  *    result is trimmed — so extraction is layout-independent;
  *  - a bare `<` not followed by a letter, `/`, `!` or `?` is TEXT
  *    (the HTML5 tokenizer rule), so "x < 3" survives extraction.
  *
  * Unlike the binary parsers ([[ImageMeta]]) a malformed input is not
  * rejected to NULL: any string IS degenerate HTML (text with no
  * tags), so extraction is total — output may be empty, never null.
  * Runs inside whole-stage codegen via a static call, same execution
  * shape as [[ImageMeta]]: HTML-to-text over a 100 TB crawl table is
  * scan-speed, no interpreter fallback, no boxing. */
case class HtmlText(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_html_text expects a string column, got ${child.dataType.catalogString}")
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_html_text"

  override def nullSafeEval(input: Any): Any =
    HtmlText.extract(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.plans.HtmlText.extract($s)")

  override protected def withNewChildInternal(newChild: Expression): HtmlText =
    copy(child = newChild)
}

object HtmlText {

  /** Static entry point shared by eval and generated code. */
  def extract(s: UTF8String): UTF8String =
    UTF8String.fromString(extractString(s.toString))

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f'

  /** Case-insensitive indexOf for the two raw-text closing tags. */
  private def indexOfIgnoreCase(s: String, target: String, from: Int): Int = {
    val n = s.length - target.length
    var i = math.max(from, 0)
    while (i <= n) {
      if (s.regionMatches(true, i, target, 0, target.length)) return i
      i += 1
    }
    -1
  }

  private[graft] def extractString(s: String): String = {
    val n = s.length
    val sb = new java.lang.StringBuilder(math.min(n, 1 << 16))
    var i = 0
    var pendingWs = false // emit one space before the next visible char
    def append(cp: Int): Unit = {
      if (cp == ' ' || (cp < 128 && isWs(cp.toChar))) pendingWs = sb.length > 0
      else {
        if (pendingWs) { sb.append(' '); pendingWs = false }
        sb.appendCodePoint(cp)
      }
    }
    while (i < n) {
      val c = s.charAt(i)
      val markup = c == '<' && i + 1 < n && {
        val p = s.charAt(i + 1)
        // HTML5 tag-open: only ASCII alpha starts a tag — '<' before a
        // non-Latin letter is TEXT in every browser, and isLetter here
        // would silently delete CJK/Cyrillic content after a bare '<'
        ('a' <= p && p <= 'z') || ('A' <= p && p <= 'Z') ||
          p == '/' || p == '!' || p == '?'
      }
      if (markup) {
        if (s.startsWith("<!--", i)) {
          // abruptly-closed empty comments first (HTML5
          // abrupt-closing-of-empty-comment): "<!-->" and "<!--->"
          // are COMPLETE comments — searching for "-->" past them
          // would swallow the whole rest of the document
          if (s.startsWith("<!-->", i)) i += 5
          else if (s.startsWith("<!--->", i)) i += 6
          else {
            val e = s.indexOf("-->", i + 4)
            i = if (e < 0) n else e + 3
          }
          pendingWs = sb.length > 0 // dropped comment = word boundary
        } else {
          // tag name (letters only; "</x" has the name after the slash)
          var j = i + 1
          val closing = j < n && s.charAt(j) == '/'
          if (closing) j += 1
          val nameStart = j
          while (j < n && Character.isLetter(s.charAt(j))) j += 1
          val nameEnd = j
          // advance past '>' honoring single/double-quoted attributes
          var k = j
          var quote: Char = 0
          while (k < n && (quote != 0 || s.charAt(k) != '>')) {
            val ck = s.charAt(k)
            if (quote != 0) { if (ck == quote) quote = 0 }
            else if (ck == '"' || ck == '\'') quote = ck
            k += 1
          }
          i = if (k >= n) n else k + 1
          if (!closing) {
            val len = nameEnd - nameStart
            val isScript = len == 6 && s.regionMatches(true, nameStart, "script", 0, 6)
            val isStyle = len == 5 && s.regionMatches(true, nameStart, "style", 0, 5)
            if (isScript || isStyle) {
              val close = if (isScript) "</script" else "</style"
              val e = indexOfIgnoreCase(s, close, i)
              if (e < 0) i = n
              else {
                val gt = s.indexOf('>', e + close.length)
                i = if (gt < 0) n else gt + 1
              }
            }
          }
          pendingWs = sb.length > 0 // a dropped tag is a word boundary
        }
      } else if (c == '&') {
        // entity: up to 10 chars then ';' — else keep the '&' literally
        val sc = s.indexOf(';', i + 1)
        var cp = -1
        if (sc > i + 1 && sc - i <= 11) {
          val e = s.substring(i + 1, sc)
          cp =
            if (e == "amp") '&'
            else if (e == "lt") '<'
            else if (e == "gt") '>'
            else if (e == "quot") '"'
            else if (e == "apos") '\''
            else if (e == "nbsp") ' '
            else if (e.length > 1 && e.charAt(0) == '#') {
              try {
                val v =
                  if (e.length > 2 && (e.charAt(1) == 'x' || e.charAt(1) == 'X'))
                    Integer.parseInt(e.substring(2), 16)
                  else Integer.parseInt(e.substring(1))
                if (v >= 0 && v <= 0x10FFFF &&
                    !(v >= 0xD800 && v <= 0xDFFF)) v else -1
              } catch { case _: NumberFormatException => -1 }
            } else -1
        }
        if (cp >= 0) { append(cp); i = sc + 1 }
        else { append('&'); i += 1 }
      } else {
        append(c)
        i += 1
      }
    }
    sb.toString // pendingWs at end = trailing whitespace, dropped
  }
}
