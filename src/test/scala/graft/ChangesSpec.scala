package graft

import org.apache.spark.sql.functions._
import graft.operators.Changes

/** CDC MERGE + SCD2 semantics and their scale-shape plan pins. The
  * row-level outputs are additionally hash-checked against DuckDB
  * set-algebra oracles by the driver (Queries.scala). */
class ChangesSpec extends SparkSpec {

  test("mergeApply: deletes retire, updates replace, inserts append") {
    import spark.implicits._
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "s", "v")
    val changes = Seq(
      (2L, "U", "b2", 22.0), // update
      (3L, "D", null.asInstanceOf[String], 0.0), // delete
      (9L, "I", "new", 90.0) // insert
    ).toDF("k", "op", "s", "v")
    val out = Changes.mergeApply(base, changes, "k")
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(out.toSeq === Seq((1L, "a", 10.0), (2L, "b2", 22.0), (9L, "new", 90.0)))
  }

  test("merge of the orders CDC batch: counts follow the key residues") {
    val base = Tables.orders(spark, sf)
    val nBase = base.count()
    val n3 = base.filter(col("o_orderkey") % 10 === 3).count()
    val n5 = base.filter(col("o_orderkey") % 10 === 5).count()
    val n7 = base.filter(col("o_orderkey") % 10 === 7).count()
    val merged = Changes.mergeUpsert(spark, sf)
    // deletes remove n7; inserts add n5; updates replace in place
    assert(merged.count() === nBase - n7 + n5)
    assert(merged.filter(col("o_orderstatus") === "U").count() === n3)
    assert(merged.filter(col("o_orderkey") >= 10000000L).count() === n5)
  }

  test("merge plan: base is never shuffled — broadcast LEFT ANTI join") {
    val plan = Changes.mergeUpsert(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"expected broadcast anti-join in:\n$plan")
    assert(!plan.contains("SortMergeJoin"), "CDC apply must not sort-merge the base")
  }

  test("scd2: intervals chain per user, exactly one current row") {
    val out = Changes.scd2UserState(spark, sf)
    val byUser = out.collect().groupBy(_.getLong(0))
    assert(byUser.nonEmpty)
    byUser.foreach { case (u, rows) =>
      // exactly one open interval per user, and it is the last one
      assert(rows.count(_.getBoolean(5)) === 1, s"user $u")
      assert(rows.last.getBoolean(5), s"user $u")
      // valid_to of row i == valid_from of row i+1 (no gaps, no overlap)
      rows.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getLong(4) === b.getLong(3), s"user $u interval chain")
        case _ =>
      }
      // consecutive states differ (it IS a transition table)
      rows.sliding(2).foreach {
        case Array(a, b) => assert(a.getString(2) != b.getString(2), s"user $u")
        case _ =>
      }
    }
  }

  test("scd2 plan: both windows ride ONE exchange of the events") {
    val plan = Changes.scd2UserState(spark, sf).queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges === 1,
      s"expected a single hash exchange (windows share the sort), got $exchanges:\n$plan")
  }
}
