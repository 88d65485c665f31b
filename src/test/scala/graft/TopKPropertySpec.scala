package graft

import org.apache.spark.sql.functions._

/** Property-style test: graft_topk over arbitrary inputs equals the
  * specification `sortBy(score desc, id asc).take(k)` — including
  * duplicate scores, negative values, k larger than the input, and
  * the partial/merge path (multiple input partitions). Deterministic
  * seeded generation (25 cases) in place of a scalacheck bridge. */
class TopKPropertySpec extends SparkSpec {

  test("graft_topk == sort-take specification on random inputs") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    (1 to 25).foreach { trial =>
      val n = rnd.nextInt(60) + 1
      val k = rnd.nextInt(8) + 1
      val data = Seq.fill(n)((
        rnd.nextInt(3).toLong,                       // query_id
        rnd.nextInt(50).toLong,                      // neighbor_id
        math.rint(rnd.nextDouble() * 100 - 50) / 10  // score incl. dup values
      )).groupBy(t => (t._1, t._2)).map(_._2.head).toSeq // unique ids per query

      val got = data.toDF("query_id", "neighbor_id", "cos_sim")
        .repartition(3) // force the partial + merge path
        .groupBy(col("query_id"))
        .agg(graft.plans.TopKAggregate.topk(col("cos_sim"), col("neighbor_id"), k).as("t"))
        .select(col("query_id"), explode(col("t")).as("n"))
        .select(col("query_id"), col("n.neighbor_id"), col("n.cos_sim"), col("n.rank"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
        .groupBy(_._1).view
        .mapValues(_.sortBy(_._4).map(t => (t._2, t._3)).toSeq).toMap

      val expect = data.groupBy(_._1).view.mapValues { g =>
        g.sortBy(t => (-t._3, t._2)).take(k).map(t => (t._2, t._3)).toSeq
      }.toMap

      assert(got === expect, s"trial $trial (n=$n, k=$k)")
    }
  }
}
