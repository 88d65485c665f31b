package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Product-quantization ADC retrieval: shape/determinism invariants and
  * recall against the exact brute-force top-k — exact-value
  * certification is the generated DuckDB oracle's job (knnPqOracleFor,
  * from the served codebooks). */
class PqSpec extends SparkSpec {

  test("codebooks are well-formed and memoized") {
    val cb = Similarity.pqCodebooks(spark, sf)
    assert(cb.length === Similarity.PqSubspaces)
    cb.foreach { sub =>
      assert(sub.length === Similarity.PqCodes)
      sub.foreach(c => assert(c.length === Similarity.PqDim))
    }
    // build-once: a second call returns the identical artifact
    assert(Similarity.pqCodebooks(spark, sf) eq cb)
  }

  test("ADC serve returns k ranked neighbors per query, deterministically") {
    val rows = Similarity.knnPqAdc(spark, sf).collect()
    val byQuery = rows.groupBy(_.getAs[Long]("query_id"))
    assert(byQuery.keySet === Set(0L, 1L, 2L, 3L, 4L))
    byQuery.values.foreach { g =>
      assert(g.length === 5)
      val ranked = g.sortBy(_.getAs[Long]("rank"))
      assert(ranked.map(_.getAs[Long]("rank")).toSeq === (1L to 5L))
      // rank order is exact-cosine descending (id tiebreak)
      val sims = ranked.map(_.getAs[Double]("cos_sim"))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
      // no self-match
      val q = ranked.head.getAs[Long]("query_id")
      assert(!ranked.exists(_.getAs[Long]("neighbor_id") == q))
    }
    val again = Similarity.knnPqAdc(spark, sf).collect()
    assert(rows.map(_.toString).toSeq === again.map(_.toString).toSeq)
  }

  test("recall against exact top-5 clears the flat-PQ bar") {
    val pq = Similarity.knnPqAdc(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val exact = Similarity.knnBruteForce(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val hit = pq.intersect(exact).size.toDouble / exact.size
    // 4-bit flat PQ with a 20-candidate shortlist: recall well above
    // chance (20/corpus) but below exact — the compression trade the
    // operator exists to make. Floor chosen with margin under the
    // measured fixture recall.
    // (measured: 0.36 on the sf0.001 fixture, 0.60 at sf0.01)
    assert(hit >= 0.3, s"recall@5 = $hit")
    // every query keeps at least one true top-5 neighbor
    exact.groupBy(_._1).foreach { case (q, want) =>
      assert(want.exists(pq.contains), s"query $q lost all true neighbors")
    }
  }

  test("IVF-PQ composes both quantizers into a ranked, self-free top-k") {
    val rows = Similarity.knnIvfPq(spark, sf).collect()
    val byQuery = rows.groupBy(_.getAs[Long]("query_id"))
    assert(byQuery.keySet === Set(0L, 1L, 2L, 3L, 4L))
    byQuery.foreach { case (q, g) =>
      assert(g.length === 5)
      val ranked = g.sortBy(_.getAs[Long]("rank"))
      assert(ranked.map(_.getAs[Long]("rank")).toSeq === (1L to 5L))
      val sims = ranked.map(_.getAs[Double]("cos_sim"))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
      assert(!ranked.exists(_.getAs[Long]("neighbor_id") == q))
    }
    // the composed path returns a subset of the IVF candidate universe:
    // every neighbor it reports must also be reachable by the pure IVF
    // serve over the same probed cells when its shortlist is widest —
    // cross-check against plain IVF top-k overlap being nonzero
    // (identical cells, PQ only re-orders the coarse stage)
    val ivf = Similarity.knnIvfIndexed(spark, sf,
      Similarity.ivfIndexPath(spark, sf)).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val got = rows.map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    assert(got.intersect(ivf).nonEmpty)
    // determinism across serves
    val again = Similarity.knnIvfPq(spark, sf).collect()
    assert(rows.map(_.toString).toSeq === again.map(_.toString).toSeq)
  }

  test("residual coding lifts IVF-PQ recall above the raw-vector floor") {
    val ivfpq = Similarity.knnIvfPq(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val exact = Similarity.knnBruteForce(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val hit = ivfpq.intersect(exact).size.toDouble / exact.size
    info(s"IVF-PQ (residual) recall@5 = $hit")
    // raw-vector IVF-PQ measured 0.36 here (r11 verdict); residual
    // codebooks (true IVFADC) measure 0.60 on this fixture — the floor
    // sits above the old raw-vector ceiling with margin below the
    // measured residual recall
    assert(hit >= 0.45, s"residual IVF-PQ recall@5 = $hit")
  }
}
