package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's noise defenses as pure functions: the same-SF history
  * guard and the sustained-load rescue thresholds. No SparkSession —
  * these decisions must be right before any timing runs. */
class BenchLogicSpec extends AnyFunSuite {

  private val detail =
    """{"metric":"total","value":10.5,"unit":"sec","queries":{"q1":0.5,"q2":1.0,"q3":9.0},"sf":"/root/testdata/sf0.1"}"""

  test("history parses per-query times and keeps only same-SF records") {
    val h = Bench.parseHistory(detail, "/root/testdata/sf0.1")
    assert(h("q1") === 0.5 && h("q2") === 1.0 && h("q3") === 9.0)
    // recorded at a different SF: ignored entirely — cross-scale
    // comparison would flag everything (or nothing)
    assert(Bench.parseHistory(detail, "/root/testdata/sf0.01") === Map.empty)
    // a record without an sf field (pre-r12 format) still parses
    val old = """{"metric":"total","value":1.0,"queries":{"q1":0.5}}"""
    assert(Bench.parseHistory(old, "/root/testdata/sf0.1").get("q1").contains(0.5))
  }

  test("history parsing is anchored to the queries object, not the envelope") {
    // envelope fields (value, passes) must NOT become history entries:
    // a future query literally named `value` would otherwise compare
    // against the run TOTAL and always flag (or never)
    val h = Bench.parseHistory(detail, "/root/testdata/sf0.1")
    assert(!h.contains("value") && !h.contains("metric") && !h.contains("unit"))
    assert(h.size === 3)
    // a record with no queries object at all parses to empty, not junk
    val bare = """{"metric":"total","value":7.5,"unit":"sec"}"""
    assert(Bench.parseHistory(bare, "/root/testdata/sf0.1") === Map.empty)
  }

  test("full second pass fires only on a still-degraded end-of-run total") {
    val hist = Map("a" -> 1.0, "b" -> 1.0, "c" -> 1.0)
    // diffuse 20% on every line: under every per-query gate, but the
    // total is degraded — exactly the r11/r12 co-tenant signature
    assert(Bench.totalDegraded(Seq("a" -> 1.2, "b" -> 1.2, "c" -> 1.2), hist))
    // 5% diffuse: inside the noise band, no second pass
    assert(!Bench.totalDegraded(Seq("a" -> 1.05, "b" -> 1.05, "c" -> 1.05), hist))
    // new queries don't count toward the shared total
    assert(!Bench.totalDegraded(Seq("a" -> 1.0, "new_q" -> 9.0), hist))
    // no history (first run at this SF): never fires
    assert(!Bench.totalDegraded(Seq("a" -> 9.9), Map.empty))
  }

  test("rescue triggers only past +10% on the history-covered total") {
    val hist = Map("a" -> 1.0, "b" -> 1.0, "c" -> 1.0)
    // 5% inflation spread across lines: under the gate, no rescue
    assert(Bench.rescueCandidates(
      Seq("a" -> 1.05, "b" -> 1.05, "c" -> 1.05), hist) === Seq.empty)
    // 20% total inflation: rescue fires, but only >=1.5x lines re-time
    val redo = Bench.rescueCandidates(
      Seq("a" -> 1.6, "b" -> 1.0, "c" -> 1.0), hist)
    assert(redo === Seq("a"))
    // diffuse 20% on every line: nothing reaches 1.5x, nothing re-times
    // (the per-line floor keeps the extra pass bounded)
    assert(Bench.rescueCandidates(
      Seq("a" -> 1.2, "b" -> 1.2, "c" -> 1.2), hist) === Seq.empty)
  }

  test("rescue ignores history-free queries and empty history") {
    val hist = Map("a" -> 0.1)
    // the new query's 5 s does not count toward the shared total
    assert(Bench.rescueCandidates(
      Seq("a" -> 0.1, "new_query" -> 5.0), hist) === Seq.empty)
    // inflated shared line still flags even beside new queries
    assert(Bench.rescueCandidates(
      Seq("a" -> 0.2, "new_query" -> 5.0), hist) === Seq("a"))
    // no history at all (first run at this SF): never fires
    assert(Bench.rescueCandidates(Seq("a" -> 9.9), Map.empty) === Seq.empty)
  }

  test("a failed timing attempt can never win the best-of-two") {
    // ADVICE r13 #2: a query failing FAST (evicted fixture, transient
    // OOM) must not replace an honest slow measurement with its
    // near-zero failure time
    assert(Bench.bestChecked((0.8, true), (0.5, true)) === 0.5)
    assert(Bench.bestChecked((0.8, true), (0.01, false)) === 0.8)
    assert(Bench.bestChecked((0.01, false), (0.8, true)) === 0.8)
    // both failed: the SLOWER honest elapsed is recorded — a broken
    // query's cost shows instead of reading as zero
    assert(Bench.bestChecked((0.01, false), (0.3, false)) === 0.3)
  }
}
