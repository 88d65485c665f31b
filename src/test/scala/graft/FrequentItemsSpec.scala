package graft

import org.apache.spark.sql.functions._
import graft.plans.FrequentItemsAggregate
import graft.functions.TextFunctions
import graft.operators.TextAnalysis

/** Misra–Gries sketch: the published bounds checked under Spark's
  * partial/final aggregation (many partitions → many merges). */
class FrequentItemsSpec extends SparkSpec {

  private def sketch(items: Seq[String], k: Int, parts: Int): Map[String, Long] = {
    import spark.implicits._
    items.toDF("item").repartition(parts)
      .agg(FrequentItemsAggregate.freqItems(col("item"), k).as("c"))
      .select(explode(col("c")).as("e"))
      .select(col("e.item"), col("e.count_lb"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("dominant item survives across partitions with lower-bound counts") {
    // 60% one item, the rest spread over 40 keys; k=4 counters only
    val items = Seq.fill(600)("hot") ++ (0 until 400).map(i => s"cold${i % 40}")
    val got = sketch(items, k = 4, parts = 8)
    assert(got.contains("hot"), s"heavy item lost: $got")
    assert(got.size <= 4)
    // count is a lower bound within N/k of the truth
    assert(got("hot") <= 600L)
    assert(got("hot") >= 600L - items.size / 4)
  }

  test("no false negatives above N/k on the corpus token stream") {
    val toks = Tables.documents(spark, sf)
      .select(explode(TextFunctions.tokens(col("text"))).as("token"))
    val exact = toks.groupBy(col("token")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    val k = 16
    val cand = sketch(
      toks.collect().map(_.getString(0)).toSeq, k, parts = 8).keySet
    val mustKeep = exact.filter { case (_, c) => c > n / k }.keySet
    assert(mustKeep.subsetOf(cand),
      s"missed heavy hitters: ${mustKeep -- cand}")
  }

  test("adversarial decrement stream keeps the bound at k=2") {
    // alternate distinct singletons to force constant decrements around
    // one moderately frequent item
    val items = (0 until 300).flatMap(i => Seq("target", s"noise$i"))
    val got = sketch(items, k = 2, parts = 4)
    got.get("target").foreach { lb =>
      assert(lb <= 300L && lb >= 300L - items.size / 2)
    }
    // every surviving count is a valid lower bound
    got.foreach { case (item, lb) =>
      val truth = items.count(_ == item).toLong
      assert(lb <= truth, s"$item: lower bound $lb above truth $truth")
    }
  }

  test("two-pass heavy hitters equals the exact frequency threshold") {
    val got = TextAnalysis.heavyHitters(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val toks = Tables.documents(spark, sf)
      .select(explode(TextFunctions.tokens(col("text"))).as("token"))
    val exact = toks.groupBy(col("token")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum.toDouble
    val want = exact.filter { case (_, c) => c > n * 0.02 }
    assert(got === want)
    // the guarantee precondition is enforced
    intercept[IllegalArgumentException] {
      TextAnalysis.heavyHitters(spark, sf, k = 10, threshold = 0.05 / 10)
    }
  }
}
