package graft

import org.apache.spark.sql.functions._
import graft.operators.Bucketing

/** Co-located bucketed join: correctness vs the plain join AND the plan
  * property that makes it matter — no shuffle Exchange on the join. */
class BucketingSpec extends SparkSpec {

  test("bucketed join: no exchange in the join, results match plain join") {
    Bucketing.writeBucketed(spark, sf, buckets = 4)
    val df = Bucketing.colocatedJoin(spark)
    df.collect() // materialize so the AQE final plan is in place

    val plan = df.queryExecution.executedPlan.toString
    // the aggregation after the join still exchanges on o_orderstatus;
    // the JOIN itself must not — assert by locating the SortMergeJoin
    // subtree and checking it contains no Exchange below it
    val joinIdx = plan.indexOf("SortMergeJoin")
    assert(joinIdx >= 0, s"expected SortMergeJoin in:\n$plan")
    val belowJoin = plan.substring(joinIdx)
    assert(!belowJoin.contains("Exchange hashpartitioning(l_orderkey") &&
           !belowJoin.contains("Exchange hashpartitioning(o_orderkey"),
      s"bucketed join should not shuffle its inputs:\n$belowJoin")

    val expected = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
           count(lit(1)).as("n_items"))
      .orderBy(col("o_orderstatus"))
      .collect()
    assert(df.collect().map(_.toString).toSeq === expected.map(_.toString).toSeq)
  }
}
