package graft

import org.apache.spark.sql.functions._
import graft.operators.Search
import graft.functions.TextFunctions

/** Inverted-index search family: index consistency, serve-from-index
  * (no corpus rescan), AND semantics, and BM25 ranking sanity — the
  * exact-value certification is the DuckDB oracle's job. */
class SearchSpec extends SparkSpec {

  test("inverted index dictionary is consistent with a direct corpus scan") {
    val idx = Search.invertedIndex(spark, sf).collect()
    assert(idx.nonEmpty)
    val nDocs = Tables.documents(spark, sf).count()
    // every df within [1, nDocs]; cf >= df (a doc counted in df
    // contributes at least one occurrence)
    idx.foreach { r =>
      val df = r.getAs[Long]("df"); val cf = r.getAs[Long]("cf")
      assert(df >= 1 && df <= nDocs)
      assert(cf >= df)
    }
    // total collection frequency equals the corpus token count
    val cfSum = idx.map(_.getAs[Long]("cf")).sum
    val tokTotal = Tables.documents(spark, sf)
      .agg(sum(TextFunctions.tokenCount(col("text")))).head.getLong(0)
    assert(cfSum === tokTotal)
  }

  test("AND search matches a direct all-terms text filter") {
    val served = Search.searchAll(spark, sf).collect().map(_.getLong(0)).toSet
    val toks = TextFunctions.tokens(col("text"))
    val direct = Tables.documents(spark, sf)
      .filter(Search.QueryTerms.map(t => array_contains(toks, t)).reduce(_ && _))
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(served === direct)
    assert(served.nonEmpty)
  }

  test("serving runs from the memoized index, not a corpus scan") {
    Search.searchAll(spark, sf).count() // force the postings build
    val plan = Search.searchBm25(spark, sf).queryExecution.executedPlan.toString
    // the postings artifact is a checkpointed RDD scan; a documents
    // parquet FileScan in the serve plan would mean a corpus rescan
    assert(!plan.contains("documents.parquet"))
  }

  test("phrase search matches a driver-side sliding-window count") {
    val served = Search.searchPhrase(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val want = Tables.documents(spark, sf)
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("tk"))
      .collect()
      .map { r =>
        val tk = r.getSeq[String](1)
        val hits = tk.indices.dropRight(2).count(i =>
          tk(i) == Search.PhraseTerms(0) && tk(i + 1) == Search.PhraseTerms(1) &&
            tk(i + 2) == Search.PhraseTerms(2))
        (r.getLong(0), hits.toLong)
      }.filter(_._2 > 0).toMap
    assert(served === want)
    assert(served.nonEmpty)
  }

  test("PMI collocations are well-formed and match a hand-computed pair") {
    val rows = Search.collocationsPmi(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Long]("n_pair") >= 5L))
    val scores = rows.map(r => (r.getAs[Double]("pmi"),
      r.getAs[String]("w1"), r.getAs[String]("w2")))
    assert(scores.sameElements(scores.sortBy { case (s, a, b) => (-s, a, b) }))
    // recompute one pair from first principles
    val docs = Tables.documents(spark, sf)
      .select(TextFunctions.tokens(col("text")).as("tk")).collect()
      .map(_.getSeq[String](0))
    val head = rows.head
    val (w1, w2) = (head.getAs[String]("w1"), head.getAs[String]("w2"))
    val n1 = docs.map(_.length.toLong).sum.toDouble
    val n2 = n1 - docs.length
    val ca = docs.map(_.count(_ == w1).toLong).sum.toDouble
    val cb = docs.map(_.count(_ == w2).toLong).sum.toDouble
    val cab = docs.map(tk => tk.indices.dropRight(1)
      .count(i => tk(i) == w1 && tk(i + 1) == w2).toLong).sum.toDouble
    val want = math.log((cab / n2) / ((ca / n1) * (cb / n1)))
    assert(math.abs(head.getAs[Double]("pmi") - want) < 1e-3)
    assert(cab === head.getAs[Long]("n_pair").toDouble)
  }

  test("persisted segment index serves the full corpus and time-travels") {
    // across both committed segments: identical to the in-memory serve
    val seg = Search.searchAllIndexed(spark, sf).collect().map(_.toString).toSeq
    val mem = Search.searchAll(spark, sf).collect().map(_.toString).toSeq
    assert(seg === mem && seg.nonEmpty)
    // as of version 0: only base-segment (doc_id % 10 != 9) hits —
    // yesterday's index state answers with yesterday's corpus
    val v0 = Search.searchAllIndexed(spark, sf, asOf = Some(0L)).collect()
      .map(_.getLong(0))
    assert(v0.forall(_ % 10 != 9))
    val full = Search.searchAll(spark, sf).collect().map(_.getLong(0))
    assert(v0.toSet === full.filter(_ % 10 != 9).toSet)
    // each segment commit published its token bloom (term lookups can
    // skip segments)
    val table = Search.indexTablePath(spark, sf)
    val hist = graft.operators.CommitLog.history(spark, table)
    assert(hist.count() >= 2)
    // segment merge: compacting the index (a dataChange=false commit,
    // like any graft table) leaves every search answer unchanged — the
    // Lucene merge without a Lucene
    graft.operators.CommitLog.compact(spark, table, targetFiles = 1)
    val merged = Search.searchAllIndexed(spark, sf).collect().map(_.toString).toSeq
    assert(merged === mem)
    // plain compact dropped the Blooms: a probe for a token that does
    // not exist now opens the merged file (conservative keep) —
    // compactWithBloom restores skipping in one dataChange=false
    // commit: the same impossible probe opens ZERO files
    val ghost = "zz_no_such_token_zz"
    def filesOpened(): Int = graft.operators.CommitLog
      .scanEquals(spark, table, "token", ghost).inputFiles.length
    assert(filesOpened() > 0, "expected the bloom-less compacted file to open")
    graft.operators.CommitLog.compactWithBloom(spark, table,
      targetFiles = 1, bloomCols = Seq("token"))
    assert(filesOpened() === 0,
      "re-published Blooms must skip every file for an absent token")
    val recompacted = Search.searchAllIndexed(spark, sf).collect().map(_.toString).toSeq
    assert(recompacted === mem)
  }

  test("phrase + PMI serve from the persisted positional index, not a corpus re-tokenize") {
    Search.searchPhrase(spark, sf).count() // force the index build
    // phrase: plan-pinned NO documents FileScan at all — every row
    // comes from Bloom-pruned index-segment reads
    val phrasePlan = Search.searchPhrase(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!phrasePlan.contains("documents.parquet"))
    // PMI: the one allowed corpus touch is the count-star scan for
    // |docs| — it must read ZERO data columns (never the text)
    val pmiPlan = Search.collocationsPmi(spark, sf)
      .queryExecution.executedPlan.toString
    pmiPlan.split('\n').filter(_.contains("documents.parquet")).foreach { line =>
      assert(line.contains("ReadSchema: struct<>"),
        s"documents scan in the PMI serve plan reads columns: $line")
    }
    // time travel: as of version 0 only base-segment (doc_id%10 != 9)
    // positions exist, so phrase hits are base-only
    val v0 = Search.searchPhrase(spark, sf, asOf = Some(0L)).collect()
      .map(_.getLong(0))
    assert(v0.forall(_ % 10 != 9))
    val full = Search.searchPhrase(spark, sf).collect().map(_.getLong(0))
    assert(v0.toSet === full.filter(_ % 10 != 9).toSet)
  }

  test("BM25 served from persisted index + norms equals the in-memory path, corpus-free") {
    val mem = Search.searchBm25(spark, sf).collect().map(_.toString).toSeq
    val idx = Search.searchBm25Indexed(spark, sf).collect().map(_.toString).toSeq
    assert(idx === mem && idx.nonEmpty)
    // plan-pinned: the index-served ranking never opens the corpus
    val plan = Search.searchBm25Indexed(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("documents.parquet"),
      s"BM25-indexed serve rescans the corpus:\n$plan")
    // time travel: version 0 = base segments only (doc_id % 10 != 9
    // corpus) for BOTH artifacts — ranks must equal BM25 over just the
    // base corpus... which has different dl/df/N, so simply pin the
    // doc set and positivity
    val v0 = Search.searchBm25Indexed(spark, sf, asOf = Some(0L)).collect()
    assert(v0.nonEmpty && v0.forall(_.getLong(0) % 10 != 9))
    v0.foreach(r => assert(r.getDouble(2) > 0.0))
  }

  test("BM25 scores are positive, ordered, and slice back to the AND set") {
    val rows = Search.searchBm25(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("score") > 0.0)
      val n = r.getAs[Long]("n_terms")
      assert(n >= 1 && n <= Search.QueryTerms.size)
    }
    // presented order is score-descending (rounded), doc_id tiebreak
    val scores = rows.map(r => (r.getAs[Double]("score"), r.getAs[Long]("doc_id")))
    assert(scores.sameElements(scores.sortBy { case (s, id) => (-s, id) }))
    // the AND-match set is exactly the n_terms == |terms| slice
    val andDocs = Search.searchAll(spark, sf).collect().map(_.getLong(0)).toSet
    val fullDocs = rows.filter(_.getAs[Long]("n_terms") == Search.QueryTerms.size)
      .map(_.getAs[Long]("doc_id")).toSet
    assert(fullDocs === andDocs)
  }
}
