package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.plans.Robots

/** robots.txt policy layer (plans.Robots): RFC 9309 parsing and the
  * access verdict. Pins: group stacking, rule ordering, the
  * standalone Sitemap, dirty-input skipping (fail-open, never throw),
  * group selection (exact beats *), longest-match allow/disallow with
  * the allow tie-break, wildcard and $-anchor semantics, and the
  * empty-Disallow rule. */
class RobotsSpec extends AnyFunSuite {

  private val txt =
    """# policy
      |User-agent: *
      |Disallow: /a/
      |Allow: /a/ok/
      |Crawl-delay: 7
      |
      |User-agent: FooBot
      |User-agent: BarBot
      |Disallow: /shared/
      |
      |User-agent: WildBot
      |Disallow: /x/*.tmp$
      |Allow: /x/
      |Sitemap: https://e.org/s.xml
      |this line is garbage and must skip
      |Disallow-ish: /typo
      |""".stripMargin

  test("directive list: groups, stacking, sitemap, dirty lines skip") {
    val arr = Robots.rules(txt)
    val rows = (0 until arr.numElements()).map { i =>
      val r = arr.getStruct(i, 3)
      (if (r.isNullAt(0)) null else r.getUTF8String(0).toString,
        r.getUTF8String(1).toString, r.getUTF8String(2).toString)
    }
    assert(rows === Seq(
      ("*", "disallow", "/a/"),
      ("*", "allow", "/a/ok/"),
      ("*", "crawl-delay", "7"),
      // stacked agents: the shared rule repeats per agent
      ("foobot", "disallow", "/shared/"),
      ("barbot", "disallow", "/shared/"),
      ("wildbot", "disallow", "/x/*.tmp$"),
      ("wildbot", "allow", "/x/"),
      (null, "sitemap", "https://e.org/s.xml")))
  }

  test("verdicts: group selection, longest match, wildcard, anchor") {
    // '*' group: longest match wins; allow /a/ok/ beats disallow /a/
    assert(Robots.allowed(txt, "SomeBot", "/a/ok/page"))
    assert(!Robots.allowed(txt, "SomeBot", "/a/hidden"))
    assert(Robots.allowed(txt, "SomeBot", "/elsewhere"))
    // exact group beats '*': FooBot gets /shared/ denied, but NOT /a/
    // (its group REPLACES the * group, §2.2.1)
    assert(!Robots.allowed(txt, "FooBot", "/shared/x"))
    assert(Robots.allowed(txt, "foobot", "/a/hidden"), "exact group replaces *")
    // wildcard + anchor
    assert(!Robots.allowed(txt, "WildBot", "/x/a.tmp"))
    assert(Robots.allowed(txt, "WildBot", "/x/a.tmp.bak"), "$ must anchor")
    assert(Robots.allowed(txt, "WildBot", "/x/a.txt"))
    // tie: equal-length allow and disallow → allow
    val tie = "User-agent: *\nDisallow: /p/\nAllow: /q/\n"
    assert(Robots.allowed(tie, "b", "/q/z") && !Robots.allowed(tie, "b", "/p/z"))
    // empty Disallow matches nothing → everything allowed
    val open = "User-agent: *\nDisallow:\n"
    assert(Robots.allowed(open, "b", "/anything"))
    // no groups at all → allowed (fail open)
    assert(Robots.allowed("just junk\n", "b", "/x"))
  }

  test("sitemap entries: urlset, index, entity decode, lenient skips") {
    import graft.plans.Sitemap
    def rows(x: String): Seq[(String, String, String)] = {
      val arr = Sitemap.parse(x)
      if (arr == null) null
      else (0 until arr.numElements()).map { i =>
        val r = arr.getStruct(i, 3)
        (r.getUTF8String(0).toString, r.getUTF8String(1).toString,
          if (r.isNullAt(2)) null else r.getUTF8String(2).toString)
      }
    }
    val urlset =
      """<?xml version="1.0"?>
        |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |<url><loc>https://e.org/a?x=1&amp;y=2</loc><lastmod>2024-01-05</lastmod></url>
        |<url><lastmod>2024-01-06</lastmod></url>
        |<url><loc> https://e.org/b </loc></url>
        |</urlset>""".stripMargin
    assert(rows(urlset) === Seq(
      ("url", "https://e.org/a?x=1&y=2", "2024-01-05"), // entity decoded
      // the loc-less entry SKIPPED (protocol lenience), whitespace trims
      ("url", "https://e.org/b", null)))
    val index =
      "<sitemapindex><sitemap><loc>https://e.org/s1.xml</loc></sitemap>" +
      "<sitemap><loc>https://e.org/s2.xml</loc><lastmod>2024-02-01</lastmod></sitemap></sitemapindex>"
    assert(rows(index) === Seq(
      ("sitemap", "https://e.org/s1.xml", null),
      ("sitemap", "https://e.org/s2.xml", "2024-02-01")))
    // not a sitemap at all → NULL; an empty urlset → empty list
    assert(rows("<html><body>nope</body></html>") == null)
    assert(rows("<urlset></urlset>") === Seq())
  }

  test("over-cap files DECLINE the verdict instead of failing open") {
    // ADVICE r14 #4: a Disallow past the parse bound must not be
    // silently dropped — for a policy verdict, truncation declines
    val pad = (1 to 70000).map(i => s"# filler $i").mkString("\n")
    val big = s"User-agent: *\n$pad\nDisallow: /hidden/\n"
    assert(Robots.allowed(big, "bot", "/hidden/x") == null,
      "over-cap robots.txt served a verdict computed from half the policy")
    assert(Robots.rules(big) == null, "over-cap rule list not declined")
    // an oversized single line is also an incomplete parse
    val longLine = "User-agent: *\nDisallow: /" + "a" * 5000 + "\n"
    assert(Robots.allowed(longLine, "bot", "/x") == null)
    // a big-but-under-cap file still parses and serves verdicts
    val under = (1 to 400).map(i => s"# c $i").mkString("\n") +
      "\nUser-agent: *\nDisallow: /deep/\n"
    assert(Robots.allowed(under, "bot", "/deep/x") == java.lang.Boolean.FALSE)
    assert(Robots.allowed(under, "bot", "/ok") == java.lang.Boolean.TRUE)
  }

  test("wildcard matcher unit laws") {
    assert(Robots.matches("/a/", "/a/b"))        // prefix
    assert(!Robots.matches("/a/", "/b/a/"))      // anchored at start
    assert(Robots.matches("/*/z", "/any/thing/z")) // * spans slashes
    assert(Robots.matches("/a*b$", "/axxxb"))
    assert(!Robots.matches("/a*b$", "/axxxbc"))
    assert(Robots.matches("/a*b", "/axxxbc"))    // unanchored prefix after *
    assert(!Robots.matches("", "/x"))            // empty pattern: no match
    assert(Robots.matches("/*", "/"))
  }

  /** Independent-witness pin (the WARC half-compressed pattern): RFC
    * 9309 verdicts are a function of the SELECTED group's rule SET —
    * group order, rule order within a group, and interleaving with
    * other agents' groups are all presentation. A seeded generator
    * emits random rule sets; every permutation of groups and shuffle
    * of rules must produce identical verdicts for every (agent, path)
    * probe. A misreading that latches the first matching group or
    * gives earlier rules precedence cannot pass this, so the fixture
    * certifies the evaluator without a second implementation. */
  test("verdicts are invariant under group reordering and rule shuffles") {
    val rnd = new scala.util.Random(1234)
    (0 until 25).foreach { trial =>
      val agents = Seq("*", "alphabot", "betabot")
      val dirs = Seq("/a/", "/a/ok/", "/b/", "/b/*.tmp$", "/c/deep/", "/d")
      val groups = agents.map { a =>
        val n = rnd.nextInt(4) + 1
        val rules = (0 until n).map { _ =>
          val verb = if (rnd.nextBoolean()) "Allow" else "Disallow"
          s"$verb: ${dirs(rnd.nextInt(dirs.length))}"
        }
        a -> rules
      }
      def render(order: Seq[(String, Seq[String])], shuffleRules: Boolean): String =
        order.map { case (a, rules) =>
          val rs = if (shuffleRules) rnd.shuffle(rules) else rules
          s"User-agent: $a\n" + rs.mkString("\n") + "\n"
        }.mkString("\n")
      val probes = for {
        agent <- Seq("alphabot", "betabot", "otherbot")
        path <- Seq("/a/x", "/a/ok/x", "/b/f.tmp", "/b/f.tmp.bak", "/c/deep/z", "/d", "/e")
      } yield (agent, path)
      val baseline = render(groups, shuffleRules = false)
      val expected = probes.map { case (a, p) => Robots.allowed(baseline, a, p) }
      (0 until 6).foreach { _ =>
        val variant = render(rnd.shuffle(groups), shuffleRules = true)
        val got = probes.map { case (a, p) => Robots.allowed(variant, a, p) }
        assert(got === expected,
          s"trial $trial: verdicts changed under reordering\n$baseline\n---\n$variant")
      }
    }
  }
}
