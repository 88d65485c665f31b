package graft

import graft.operators.{Dedup, Similarity, TextAnalysis}

/** Semantic invariants for the round-4 pipeline operators: the DuckDB
  * differential harness checks values; these pin the properties that
  * must hold regardless of corpus. */
class PipelineOpsSpec extends SparkSpec {

  test("dedup_survivors partitions the corpus: member counts sum to doc count") {
    val total = Tables.documents(spark, sf).count()
    val surv = Dedup.dedupSurvivors(spark, sf).collect()
    assert(surv.map(_.getAs[Long]("n_members")).sum === total)
    // every survivor id is its own cluster's canonical (min) member
    val clusters = Dedup.dedupClusters(spark, sf).collect()
      .groupBy(_.getAs[Long]("cluster_id"))
    surv.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(clusters(id).map(_.getAs[Long]("doc_id")).min === id)
      assert(r.getAs[Long]("n_members") === clusters(id).length)
    }
  }

  test("substring dedup finds an offset-shifted span that paragraphDedup misses") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // doc 1 carries a 25-token span; doc 2 carries the SAME span
    // starting at offset 7 — it straddles doc 2's fixed 20-token
    // window boundary, so no window hash can match doc 1's
    val span = (0 until 25).map(i => s"dup$i").mkString(" ")
    val docs = Seq(
      (1L, span + " " + (0 until 15).map(i => s"a$i").mkString(" ")),
      (2L, (0 until 7).map(i => s"b$i").mkString(" ") + " " + span + " " +
           (0 until 8).map(i => s"c$i").mkString(" ")),
      (3L, (0 until 40).map(i => s"z$i").mkString(" "))
    ).toDF("doc_id", "text")

    // paragraph (fixed-window) fingerprints share nothing across docs
    val paraFps = docs
      .select(col("doc_id"), graft.functions.TextFunctions.tokens(col("text")).as("tk"))
      .select(col("doc_id"), explode(transform(
        sequence(lit(0), floor((size(col("tk")) - 1) / 20).cast("int")),
        i => md5(array_join(slice(col("tk"), i * 20 + 1, lit(20)), " ")))).as("fp"))
      .groupBy("fp").agg(countDistinct("doc_id").as("nd"))
      .filter(col("nd") > 1).count()
    assert(paraFps === 0, "fixture broken: fixed windows were not offset-shifted")

    // the stride-1 gram chain reconstructs the exact maximal span in both docs
    val grams = Dedup.substringGrams(docs, 20).localCheckpoint(false)
    val spans = Dedup.substringSpansOf(grams, 20).collect()
      .map(r => (r.getLong(0), r.getAs[Long]("start_pos"),
        r.getAs[Long]("end_pos"), r.getAs[Long]("span_tokens")))
    assert(spans.toSeq === Seq((1L, 0L, 24L, 25L), (2L, 7L, 31L, 25L)),
      s"expected the 25-token span at offsets 0 and 7, got ${spans.toSeq}")
  }

  test("substring scrub removes exactly the duplicated spans from sf0.001") {
    import org.apache.spark.sql.functions._
    val spans = Dedup.substringDedup(spark, sf).collect()
      .groupBy(_.getLong(0))
      .map { case (d, rs) =>
        // covered tokens = union of [start, end] intervals (islands are
        // disjoint by construction)
        d -> rs.map(r => r.getAs[Long]("end_pos") - r.getAs[Long]("start_pos") + 1).sum
      }
    val out = Dedup.substringScrub(spark, sf).collect()
    assert(out.nonEmpty)
    val total = Tables.documents(spark, sf).count()
    assert(out.length.toLong === total, "scrub must keep the frame total")
    out.foreach { r =>
      val d = r.getLong(0)
      val nTok = r.getAs[Long]("n_tokens")
      val nRem = r.getAs[Long]("n_removed")
      val clean = r.getAs[String]("clean_text")
      assert(nRem === spans.getOrElse(d, 0L), s"doc $d removed $nRem")
      val keptLen = if (clean.isEmpty) 0 else clean.split(" ").length
      assert(keptLen.toLong === nTok - nRem, s"doc $d clean_text length")
    }
    assert(out.exists(_.getAs[Long]("n_removed") > 0),
      "fixture carries no duplicated spans - scrub untested")
  }

  test("length histogram covers every document exactly once") {
    val total = Tables.documents(spark, sf).count()
    val hist = TextAnalysis.lengthHistogram(spark, sf).collect()
    assert(hist.map(_.getAs[Long]("n_docs")).sum === total)
    assert(hist.forall(_.getAs[Long]("bucket_lo") % 20 === 0))
  }

  test("top bigrams are k rows in non-increasing frequency order") {
    val rows = TextAnalysis.topBigrams(spark, sf, k = 25).collect()
    assert(rows.length === 25)
    val ns = rows.map(_.getAs[Long]("n"))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b })
    assert(rows.forall(_.getAs[String]("bigram").split(" ").length === 2))
  }

  test("quantized rerank reports exact cosine and high recall vs brute force") {
    val rr = Similarity.knnQuantizedRerank(spark, sf).collect()
    val brute = Similarity.knnBruteForce(spark, sf).collect()
    val bruteSim = brute.map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")) ->
      r.getAs[Double]("cos_sim")).toMap
    // per query: exactly k ranked rows, ranks 1..k
    rr.groupBy(_.getAs[Long]("query_id")).foreach { case (_, g) =>
      assert(g.map(_.getAs[Long]("rank")).sorted.toSeq === (1L to 5L))
    }
    // re-ranked similarity is the EXACT cosine, so any (q, n) pair that
    // brute force also ranked must carry an identical score
    val overlap = rr.flatMap { r =>
      val key = (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))
      bruteSim.get(key).map(b => (r.getAs[Double]("cos_sim"), b))
    }
    assert(overlap.nonEmpty)
    overlap.foreach { case (got, want) => assert(math.abs(got - want) < 1e-9) }
    // int8 quantization on a 20%-wide coarse net: recall@5 should be near-total
    val recall = overlap.length.toDouble / brute.length
    assert(recall >= 0.8, s"recall@5 = $recall")
  }

  test("weighted sample prefers heavy documents and lowers to a top-k plan") {
    import org.apache.spark.sql.functions._
    import graft.operators.TextAnalysis
    val df = TextAnalysis.weightedSample(spark, sf, k = 16)
    // the top-k must be TakeOrderedAndProject (per-partition heaps),
    // never a global Sort + Limit
    assert(df.queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"),
      s"weighted sample lost its top-k plan:\n${df.queryExecution.executedPlan}")
    val rows = df.collect()
    assert(rows.length === 16)
    // priorities presented in the cut order, deterministic across runs
    val pri = rows.map(_.getAs[Double]("priority"))
    assert(pri.zip(pri.tail).forall { case (a, b) => a >= b })
    assert(df.collect().map(_.toString).toSeq === rows.map(_.toString).toSeq)
    // inclusion probability ∝ token count: the sample's mean length
    // must exceed the corpus mean (heavily weighted docs preferred)
    val sampleMean = rows.map(_.getAs[Long]("n_tokens")).sum.toDouble / rows.length
    val corpusMean = graft.Tables.documents(spark, sf)
      .agg(avg(graft.functions.TextFunctions.tokenCount(col("text")))).head.getDouble(0)
    assert(sampleMean > corpusMean,
      s"sample mean $sampleMean not above corpus mean $corpusMean")
  }
}
