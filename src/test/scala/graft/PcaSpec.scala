package graft

import graft.operators.Similarity

/** PCA embedding compression: orthonormality and variance-optimality
  * of the trained components (the properties that make the projection
  * a compression, not just any linear map), projection parity against
  * an in-memory reference, and the memoization contract. Exact-value
  * certification against DuckDB is the generated post-run oracle's job
  * (pcaOracles). */
class PcaSpec extends SparkSpec {

  private def embeddings(): Array[Array[Double]] =
    graft.Tables.embeddings(spark, sf).select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)

  test("components are orthonormal") {
    val comps = Similarity.pcaComponents(spark, sf)
    assert(comps.length === Similarity.PcaK)
    for (i <- comps.indices; j <- comps.indices) {
      val d = comps(i).zip(comps(j)).map { case (a, b) => a * b }.sum
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(d - want) < 1e-9, s"dot(c$i, c$j) = $d")
    }
  }

  test("the component subspace captures at least as much variance as any raw-axis pick") {
    // PCA optimality, checked against a concrete competitor: total
    // variance of the k projections >= total variance along the k
    // HIGHEST-variance raw axes (any axis-aligned compression is a
    // linear map too, so the optimum must dominate it)
    val e = embeddings()
    val n = e.length.toDouble
    val d = e.head.length
    def variance(vals: Array[Double]): Double = {
      val m = vals.sum / n
      vals.map(x => (x - m) * (x - m)).sum / n
    }
    val axisVar = (0 until d).map(i => variance(e.map(_(i)))).sorted.reverse
    val rawTopK = axisVar.take(Similarity.PcaK).sum
    val comps = Similarity.pcaComponents(spark, sf)
    val pcVar = comps.map(c =>
      variance(e.map(v => v.zip(c).map { case (a, b) => a * b }.sum))).sum
    assert(pcVar >= rawTopK - 1e-9,
      s"PCA variance $pcVar below the raw top-k axis variance $rawTopK")
  }

  test("projection matches the in-memory reference and is memoized") {
    val comps = Similarity.pcaComponents(spark, sf)
    assert(Similarity.pcaComponents(spark, sf) eq comps, "not memoized")
    val got = Similarity.pcaProject(spark, sf).collect()
    val ids = graft.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .sortBy(_._1)
    assert(got.length === ids.length)
    got.zip(ids).foreach { case (row, (id, v)) =>
      assert(row.getLong(0) === id)
      comps.zipWithIndex.foreach { case (c, j) =>
        val want = BigDecimal(v.zip(c).map { case (a, b) => a * b }.sum)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(math.abs(row.getDouble(1 + j) - want) < 1e-9,
          s"pc$j diverges for vec $id")
      }
    }
  }
}
