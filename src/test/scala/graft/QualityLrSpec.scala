package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** Learned quality classifier: distributed logistic regression whose
  * per-iteration work is one map-side-combined aggregation. The spec
  * certifies training (in-memory differential, convergence, weight
  * structure) — the scoring pass is certified cross-engine by the
  * post-run DuckDB oracle. */
class QualityLrSpec extends SparkSpec {

  private def sigmoid(z: Double): Double = 1.0 / (1.0 + math.exp(-z))

  private lazy val feats: Array[(Double, Double, Double, Double)] = {
    val t = col("text")
    val nTok = graft.functions.TextFunctions.tokenCount(t).cast("double")
    Tables.documents(spark, sf)
      .select(
        least(lit(1.0), nTok / 100.0).as("x1"),
        (size(graft.functions.TextFunctions.distinctTokens(t)).cast("double") / nTok).as("x2"),
        (graft.functions.TextFunctions.vocabHits(t,
          graft.functions.TextFunctions.stopwords("en")).cast("double") / nTok).as("x3"),
        (graft.functions.TextFunctions.qualityScore(t) > lit(0.6)).cast("double").as("y"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
  }

  test("distributed training matches the sequential in-memory reference") {
    val w = TextAnalysis.qualityLrWeights(spark, sf)
    // the same Newton/IRLS fit, summed sequentially on one thread —
    // the ridge-stabilized convex objective keeps summation-order
    // noise from amplifying
    val ref = Array(0.0, 0.0, 0.0, 0.0)
    for (_ <- 0 until TextAnalysis.LrIters) {
      val g = Array.fill(4)(0.0)
      val h = Array.ofDim[Double](4, 4)
      feats.foreach { case (x1, x2, x3, y) =>
        val x = Array(1.0, x1, x2, x3)
        val p = sigmoid(ref(0) + ref(1) * x1 + ref(2) * x2 + ref(3) * x3)
        val d = p - y
        val v = p * (1.0 - p)
        for (j <- 0 until 4) {
          g(j) += d * x(j)
          for (k <- 0 until 4) h(j)(k) += v * x(j) * x(k)
        }
      }
      for (j <- 0 until 4) { g(j) += TextAnalysis.LrRidge * ref(j); h(j)(j) += TextAnalysis.LrRidge }
      val step = TextAnalysis.solve4(h, g)
      for (j <- 0 until 4) ref(j) -= step(j)
    }
    for (j <- 0 until 4)
      assert(math.abs(w(j) - ref(j)) < 1e-4 * (1.0 + math.abs(ref(j))),
        s"w($j) diverged: spark=${w(j)} ref=${ref(j)}")
    // memoized artifact: the same array serves repeat calls
    assert(TextAnalysis.qualityLrWeights(spark, sf) eq w)
  }

  test("the learned boundary recovers the heuristic gate it distills") {
    val rows = TextAnalysis.qualityClassifier(spark, sf).collect()
    assert(rows.nonEmpty)
    val n = rows.length.toDouble
    val agree = rows.count(r => r.getBoolean(2) === r.getBoolean(3))
    // the label is a (rounded) linear threshold of x1/x2 — LR must
    // separate it well; 0.9 leaves slack for boundary docs
    assert(agree / n >= 0.9, s"train accuracy ${agree / n} ($agree/${rows.length})")
    // BOTH classes must be present, or the accuracy bar is vacuous
    val pos = rows.count(_.getBoolean(3))
    assert(pos > 0 && pos < rows.length,
      s"degenerate fixture labels: $pos/${rows.length} positive")
    // structure: longer and lexically richer documents score HIGHER
    // (the label increases in x1 and x2 by construction)
    val w = TextAnalysis.qualityLrWeights(spark, sf)
    assert(w(1) > 0 && w(2) > 0, s"w1/w2 should be positive: ${w.toSeq}")
  }

  test("margins are the exact rounded linear fold of the served weights") {
    val w = TextAnalysis.qualityLrWeights(spark, sf)
    val got = TextAnalysis.qualityClassifier(spark, sf).collect()
    assert(got.length === feats.length)
    // recompute per doc in the same left-to-right fold
    val expect = feats.map { case (x1, x2, x3, _) =>
      w(0) + w(1) * x1 + w(2) * x2 + w(3) * x3
    }
    // order: both sorted by doc_id; features collected in doc order?
    // collect order is not guaranteed — compare as sorted multisets
    val gotM = got.map(_.getDouble(1)).sorted
    val expM = expect.map(z => BigDecimal(z).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble).sorted
    gotM.zip(expM).foreach { case (a, b) =>
      assert(a === b, "margin fold diverges from the served weights")
    }
    // predicted is the UNROUNDED sign
    got.foreach { r =>
      if (r.getDouble(1) > 1e-6) assert(r.getBoolean(2))
      if (r.getDouble(1) < -1e-6) assert(!r.getBoolean(2))
    }
  }
}
