package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** robots.txt — the crawl-side POLICY layer (RFC 9309), the file every
  * compliant fetcher reads before anything else. Two operators:
  *
  *  - `graft_robots_rules(txt)` → `array<struct<agent string, rule
  *    string, path string>>`: the parsed directive list — groups are
  *    one-or-more consecutive `User-agent` lines followed by their
  *    rules (each rule row repeated per group agent); `Sitemap` is a
  *    standalone directive (agent NULL, RFC 9309 §2.3) and
  *    `Crawl-delay` rides with its group (nonstandard but ubiquitous);
  *    unknown directives and comments (#) skip; rules before any
  *    group are ignored per the RFC.
  *
  *  - `graft_robots_allowed(txt, agent, path)` → boolean: the actual
  *    access verdict — group selection prefers an exact (case-
  *    insensitive) product-token match over the `*` groups (all
  *    matching groups' rules combine, §2.2.1); among matching
  *    allow/disallow patterns the LONGEST (most-specific, measured in
  *    pattern octets) wins, ties prefer allow (§2.2.2); `*` matches
  *    any char run and `$` anchors the pattern end (§2.2.3); an empty
  *    Disallow matches nothing; no matching rule → allowed.
  *
  * Malformed lines skip (robots.txt is famously dirty — a policy
  * parser that declines the whole file would FAIL OPEN on real
  * crawls). Bounds: RFC 9309 §2.4's 500 KiB parse floor (we cap at
  * 512 KiB / 64 Ki lines of ≤4 KiB), and a file EXCEEDING the cap
  * declines (NULL) rather than truncating silently — for a
  * policy-verdict operator, serving a verdict computed from half the
  * policy is the unsafe direction (a Disallow past the cap would
  * fail open). The wildcard matcher is the classic two-pointer scan
  * (no backtracking blowup). */
case class RobotsRules(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_robots_rules expects a string column, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(Robots.ruleSchema, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_robots_rules"

  override def nullSafeEval(input: Any): Any =
    Robots.rules(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => s"""
      ${ev.value} = graft.plans.Robots.rules($t.toString());
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): RobotsRules =
    copy(child = newChild)
}

/** `graft_robots_allowed(txt, agent, path)` → boolean (see [[Robots]]). */
case class RobotsAllowed(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(first, second, third).forall(_.dataType == StringType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_robots_allowed expects (string txt, string agent, string path)")
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_robots_allowed"

  override def nullSafeEval(t: Any, a: Any, p: Any): Any =
    Robots.allowed(t.asInstanceOf[UTF8String].toString,
      a.asInstanceOf[UTF8String].toString, p.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val boxed = ctx.freshName("robotsVerdict")
    nullSafeCodeGen(ctx, ev, (t, a, p) => s"""
      java.lang.Boolean $boxed =
        graft.plans.Robots.allowed($t.toString(), $a.toString(), $p.toString());
      ${ev.isNull} = $boxed == null;
      ${ev.value} = $boxed == null ? false : $boxed.booleanValue();
    """)
  }

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): RobotsAllowed = copy(first = f, second = s, third = t)
}

object Robots {

  val ruleSchema: StructType = StructType(Seq(
    StructField("agent", StringType),
    StructField("rule", StringType),
    StructField("path", StringType)))

  private val MaxLines = 65536
  private val MaxLine = 4096
  private val MaxChars = 512 * 1024 // RFC 9309 §2.4: parse ≥ 500 KiB

  private final case class Group(agents: Seq[String],
      rules: Seq[(String, String)])

  /** Parsed groups + standalone sitemap values + a truncation flag
    * (true = the input exceeded the parse bounds, so the returned
    * groups may be MISSING rules — verdict consumers must decline
    * rather than serve a possibly-fail-open answer). Malformed lines
    * skip. */
  private def parseGroups(txt: String): (Seq[Group], Seq[String], Boolean) = {
    val groups = new scala.collection.mutable.ArrayBuffer[Group]()
    val sitemaps = new scala.collection.mutable.ArrayBuffer[String]()
    var agents = new scala.collection.mutable.ArrayBuffer[String]()
    var rules = new scala.collection.mutable.ArrayBuffer[(String, String)]()
    var inAgents = false // consecutive user-agent lines stack into one group
    def closeGroup(): Unit = {
      if (agents.nonEmpty) groups += Group(agents.toSeq, rules.toSeq)
      agents = new scala.collection.mutable.ArrayBuffer[String]()
      rules = new scala.collection.mutable.ArrayBuffer[(String, String)]()
    }
    val lines = txt.split("\n", MaxLines + 1)
    // a line longer than MaxLine may hide a directive too — only an
    // over-cap line count or byte size marks the parse incomplete;
    // oversized single lines are handled below (skipped AND flagged)
    var truncated = txt.length > MaxChars || lines.length > MaxLines
    var li = 0
    while (li < lines.length && li < MaxLines) {
      val raw = lines(li)
      val noComment = {
        val h = raw.indexOf('#')
        if (h >= 0) raw.substring(0, h) else raw
      }
      val line = noComment.stripSuffix("\r").trim
      if (line.length > MaxLine) truncated = true
      if (line.nonEmpty && line.length <= MaxLine) {
        val colon = line.indexOf(':')
        if (colon > 0) {
          val key = line.substring(0, colon).trim.toLowerCase(java.util.Locale.ROOT)
          val value = line.substring(colon + 1).trim
          key match {
            case "user-agent" =>
              if (!inAgents) closeGroup()
              agents += value.toLowerCase(java.util.Locale.ROOT)
              inAgents = true
            case "allow" | "disallow" =>
              // rules before any user-agent line are ignored (RFC)
              if (agents.nonEmpty) rules += ((key, value))
              inAgents = false
            case "crawl-delay" =>
              if (agents.nonEmpty) rules += ((key, value))
              inAgents = false
            case "sitemap" =>
              sitemaps += value
              inAgents = false
            case _ =>
              inAgents = false // unknown directive: skip, ends an agent run
          }
        }
      }
      li += 1
    }
    closeGroup()
    (groups.toSeq, sitemaps.toSeq, truncated)
  }

  def rules(txt: String): GenericArrayData = {
    if (txt == null) return null
    val (groups, sitemaps, truncated) = parseGroups(txt)
    if (truncated) return null // incomplete rule list — decline the row
    val out = new scala.collection.mutable.ArrayBuffer[InternalRow]()
    for (g <- groups; a <- g.agents; (r, p) <- g.rules)
      out += new GenericInternalRow(Array[Any](
        UTF8String.fromString(a), UTF8String.fromString(r),
        UTF8String.fromString(p)))
    for (s <- sitemaps)
      out += new GenericInternalRow(Array[Any](
        null, UTF8String.fromString("sitemap"), UTF8String.fromString(s)))
    new GenericArrayData(out.toArray[Any])
  }

  /** RFC 9309 §2.2.3 pattern match: `*` = any char run, trailing `$`
    * anchors the end. Classic two-pointer scan with one backtrack
    * star — linear in practice, never exponential. */
  private[graft] def matches(pattern: String, path: String): Boolean = {
    if (pattern.isEmpty) return false // empty Disallow matches nothing
    val anchored = pattern.endsWith("$")
    val pat = if (anchored) pattern.substring(0, pattern.length - 1) else pattern
    var pi = 0; var si = 0
    var starP = -1; var starS = -1
    while (si < path.length) {
      if (pi < pat.length && (pat.charAt(pi) == path.charAt(si))) {
        pi += 1; si += 1
      } else if (pi < pat.length && pat.charAt(pi) == '*') {
        starP = pi; starS = si; pi += 1
      } else if (starP >= 0) {
        starS += 1; pi = starP + 1; si = starS
      } else return false
      if (pi == pat.length && !anchored) return true // prefix semantics
    }
    while (pi < pat.length && pat.charAt(pi) == '*') pi += 1
    pi == pat.length // anchored (or exact-length) end
  }

  /** Boxed verdict: null = DECLINE (the file exceeded the parse
    * bounds, so a Disallow may sit past what was read — RFC 9309
    * leaves over-limit handling to the crawler, and for a verdict
    * operator silently failing open is the unsafe direction). */
  def allowed(txt: String, agent: String, path: String): java.lang.Boolean = {
    if (txt == null || agent == null || path == null) return java.lang.Boolean.TRUE
    val (groups, _, truncated) = parseGroups(txt)
    if (truncated) return null
    val a = agent.toLowerCase(java.util.Locale.ROOT)
    val exact = groups.filter(_.agents.contains(a))
    val chosen = if (exact.nonEmpty) exact else groups.filter(_.agents.contains("*"))
    var bestLen = -1
    var bestAllow = true // no matching rule → allowed
    for (g <- chosen; (r, p) <- g.rules if r == "allow" || r == "disallow") {
      if (matches(p, path)) {
        val len = p.length
        // longest (most-specific) wins; ties prefer allow (§2.2.2)
        if (len > bestLen || (len == bestLen && r == "allow")) {
          bestLen = len
          bestAllow = r == "allow"
        }
      }
    }
    bestAllow
  }
}
