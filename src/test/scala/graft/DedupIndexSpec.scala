package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** The persisted dedup corpus index (Dedup.writeDedupIndex): the
  * standing corpus's token sets + thin MinHash band table as parquet,
  * the artifact a fresh session serves incremental ingest from without
  * re-scanning or re-signing the corpus. Pins:
  *  - serving from the index is row-identical to the live path;
  *  - the served plan reads the INDEX files and contains NO corpus
  *    document scan (the no-rebuild property — only the batch side
  *    touches the source table);
  *  - the bands layout partition-prunes on band_id (PartitionFilters).
  */
class DedupIndexSpec extends SparkSpec {

  test("index-served incremental dedup is row-identical to the live path") {
    val idx = Files.createTempDirectory("graft_dedupidx_test").toString
    Dedup.writeDedupIndex(spark, sf, idx)
    val served = Dedup.incrementalDedupIndexed(spark, sf, idx).collect()
    val live = Dedup.incrementalDedup(spark, sf).collect()
    assert(served.nonEmpty, "vacuous comparison: no incremental dups at this SF")
    assert(served.map(_.toString).toSeq === live.map(_.toString).toSeq)

    // the no-rebuild pin: the served plan's file scans are the index's
    // sets/bands parquet; the standing corpus is NEVER re-read — the
    // only documents access is the batch side, which sits behind its
    // memoized checkpoint (an ExistingRDD, not a file scan)
    val plan = Dedup.incrementalDedupIndexed(spark, sf, idx)
      .queryExecution.executedPlan.toString
    assert(plan.contains(s"$idx/sets") && plan.contains(s"$idx/bands"),
      s"expected index file scans in plan:\n$plan")
    assert(!plan.contains("documents.parquet"),
      s"corpus must not be re-scanned when serving from the index:\n$plan")
  }

  test("append: same band function, serve sees new docs, replay lands nothing") {
    val idx = Files.createTempDirectory("graft_dedupidx_append").toString
    Dedup.writeDedupIndex(spark, sf, idx)
    val setsBefore = spark.read.parquet(s"$idx/sets").count()
    import spark.implicits._
    // batch: one verbatim copy of a standing-corpus doc (band-identity
    // witness) + one novel doc (the serve-sees-new-docs witness)
    val srcRow = Tables.documents(spark, sf).filter(col("doc_id") % 10 =!= 0)
      .orderBy("doc_id").select("doc_id", "text").head
    val (srcId, srcText) = (srcRow.getLong(0), srcRow.getString(1))
    val novel = "zymurgy quokka perihelion brackish ontology flume " +
      "sextant umbra parallax dirigible"
    val batch = Seq((9000001L, srcText), (9000002L, novel)).toDF("doc_id", "text")
    Dedup.appendDedupIndexBatch(spark, idx, batch, batchId = 5L)

    // band-function identity: an identical token set must land the
    // IDENTICAL 16 (band_id, band_key) rows as the standing corpus's
    // copy — the frozen-band-function contract
    val bands = spark.read.parquet(s"$idx/bands")
    val agree = bands.filter(col("doc_id") === 9000001L)
      .select(col("band_id").cast("int").as("band_id"), col("band_key"))
      .join(bands.filter(col("doc_id") === srcId)
        .select(col("band_id").cast("int").as("band_id"), col("band_key")),
        Seq("band_id", "band_key"))
      .count()
    assert(agree === Dedup.NumBands.toLong,
      s"appended copy of doc $srcId shares only $agree/${Dedup.NumBands} band keys")

    // the indexed serve sees the appended doc with no corpus re-scan
    val probe = Seq((1L, novel)).toDF("doc_id", "text")
    val hits = Dedup.batchDedupIndexed(spark, idx, probe).collect()
    assert(hits.map(r => (r.getLong(0), r.getLong(1))).toSeq === Seq((1L, 9000002L)),
      s"expected the appended novel doc as the only near-dup, got ${hits.toSeq}")

    // replay: the same batchId lands NOTHING new (deterministic names
    // + pre-delete), and the serve result is unchanged
    Dedup.appendDedupIndexBatch(spark, idx, batch, batchId = 5L)
    assert(spark.read.parquet(s"$idx/sets").count() === setsBefore + 2)
    assert(spark.read.parquet(s"$idx/bands")
      .filter(col("doc_id") >= 9000000L).count() === 2L * Dedup.NumBands)
    assert(Dedup.batchDedupIndexed(spark, idx, probe).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq === Seq((1L, 9000002L)))
  }

  test("append extends a fitting vocab sidecar and retires an outgrown one") {
    val idx = Files.createTempDirectory("graft_dedupidx_vocab").toString
    Dedup.writeDedupIndex(spark, sf, idx)
    import spark.implicits._
    // plant a small sidecar THROUGH the Hadoop fs (LocalFileSystem is
    // checksummed: a raw java.nio overwrite of a sidecar writeDedupIndex
    // already wrote leaves a stale .crc and poisons the next read): the
    // append must keep the corpus-coverage invariant — extend while the
    // union fits, delete the moment it cannot
    val vocabFile = new java.io.File(idx, "_vocab.json")
    val hfs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val out = hfs.create(new org.apache.hadoop.fs.Path(idx, "_vocab.json"), true)
    try out.write("[1,2,3]".getBytes("UTF-8")) finally out.close()
    val tiny = Seq((9100001L, "alpha beta alpha")).toDF("doc_id", "text")
    Dedup.appendDedupIndexBatch(spark, idx, tiny, batchId = 11L)
    val extended = new String(
      java.nio.file.Files.readAllBytes(vocabFile.toPath), "UTF-8")
    val n = extended.stripPrefix("[").stripSuffix("]").split(",").length
    assert(vocabFile.exists() && n === 5, // 1,2,3 + hashed alpha/beta
      s"sidecar should hold the 5-token union, got $extended")
    // a batch with > 512 distinct tokens overflows any union (the
    // multi-word tier bound — 64 was the single-long bound before r14)
    val wide = Seq((9100002L, (1 to 520).map(i => s"tok$i").mkString(" ")))
      .toDF("doc_id", "text")
    Dedup.appendDedupIndexBatch(spark, idx, wide, batchId = 12L)
    assert(!vocabFile.exists(), "outgrown sidecar must be retired")
  }

  test("multi-word tier: a 65..512-symbol corpus serves popcount-verified, value-identical") {
    import spark.implicits._
    // synthetic corpus over a 100-word vocabulary — too big for the
    // single-long mask, inside the ≤512 multi-word tier. Docs share
    // 18-word subsets with 1-2 word edits so the %10 split has true
    // near-dups (jaccard 17/19 ≈ 0.8947 and 18/20 = 0.9).
    val words = (0 until 100).map(i => s"w$i")
    def doc(ids: Seq[Int]): String = ids.map(words).mkString(" ")
    val base = (0 until 18)
    val docs = Seq(
      (10L, doc(base)),                      // batch side (%10 == 0)
      (11L, doc(base :+ 50)),                // corpus near-dup of 10
      (20L, doc(base.map(_ + 40))),          // batch, different region
      (21L, doc(base.map(_ + 40) :+ 99)),    // corpus near-dup of 20
      (33L, doc(Seq(1, 5, 9))),              // corpus noise, tiny
      (47L, doc(60 until 99)),               // corpus noise
      (55L, doc(base.take(9)))               // corpus, jaccard 0.5 vs 10 — below gate
    ).toDF("doc_id", "text")
    val dir = Files.createTempDirectory("graft_mw_corpus").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val idx = Files.createTempDirectory("graft_dedupidx_mw").toString
    Dedup.writeDedupIndex(spark, dir, idx)
    // the sidecar must persist the >64-symbol vocabulary now
    val sidecar = new String(java.nio.file.Files.readAllBytes(
      new java.io.File(idx, "_vocab.json").toPath), "UTF-8")
    val nVocab = sidecar.stripPrefix("[").stripSuffix("]").split(",").length
    assert(nVocab > 64 && nVocab <= 512, s"expected 65..512 sidecar symbols, got $nVocab")

    // expected pairs from the GENERIC form (size(array_intersect) over
    // the raw token sets) — the value the popcount tier must reproduce
    val sets = docs.select(col("doc_id"),
      array_distinct(transform(
        graft.functions.TextFunctions.tokens(col("text")), t => xxhash64(t))).as("toks"))
    val expected = sets.filter(col("doc_id") % 10 =!= 0)
      .select(col("doc_id").as("dup_of"), col("toks").as("ta"))
      .crossJoin(sets.filter(col("doc_id") % 10 === 0)
        .select(col("doc_id").as("new_doc_id"), col("toks").as("tb")))
      .select(col("new_doc_id"), col("dup_of"),
        round(size(array_intersect(col("ta"), col("tb"))).cast("double") /
              size(array_union(col("ta"), col("tb"))), 4).as("jaccard"))
      .filter(col("jaccard") >= 0.8)
      .orderBy(col("new_doc_id"), col("dup_of"))
      .collect().map(_.toString).toSeq
    assert(expected.size === 2, s"fixture should plant exactly 2 cross-split near-dups: $expected")

    // index-served banded path (bandJoinVerify WordsTier arm)
    val served = Dedup.incrementalDedupIndexed(spark, dir, idx)
      .collect().map(_.toString).toSeq
    assert(served === expected, s"served=$served expected=$expected")
    // live broadcast path (setRepr/verifyPairs WordsTier)
    val live = Dedup.incrementalDedup(spark, dir)
      .collect().map(_.toString).toSeq
    assert(live === expected, s"live=$live expected=$expected")
    // batch-vs-index broadcast path (batchDedupIndexed WordsTier arm)
    val probe = Seq((500L, doc(base :+ 77))).toDF("doc_id", "text")
    val hits = Dedup.batchDedupIndexed(spark, idx, probe)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(hits === Seq((500L, 11L)), s"probe should near-dup doc 11 only: $hits")
  }

  test("compaction: serve identical, file counts bounded, newest batch kept replay-safe") {
    import spark.implicits._
    val idx = Files.createTempDirectory("graft_dedupidx_compact").toString
    Dedup.writeDedupIndex(spark, sf, idx)
    // several appended micro-batches fragment sets/ and every band dir
    def batch(b: Int) = Seq(
      (9200000L + b * 10, s"compactable batch$b doc alpha$b beta$b gamma$b"),
      (9200001L + b * 10, s"compactable batch$b doc alpha$b beta$b delta$b"))
      .toDF("doc_id", "text")
    (1 to 4).foreach(b => Dedup.appendDedupIndexBatch(spark, idx, batch(b), b.toLong))
    def dataFiles(sub: String): Seq[String] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(idx, sub)).map(_.getName)
        .filter(n => !n.startsWith("_") && !n.startsWith(".") && !n.endsWith(".crc"))
    }
    val vocabBefore = new java.io.File(idx, "_vocab.json").exists()
    val setsBefore = dataFiles("sets")
    val bandsBefore = dataFiles("bands")
    val probe = Seq((700L, "compactable batch2 doc alpha2 beta2 gamma2 extra")).toDF("doc_id", "text")
    val servedBefore = Dedup.batchDedupIndexed(spark, idx, probe)
      .collect().map(_.toString).toSeq
    assert(servedBefore.nonEmpty, "vacuous: probe found no near-dups pre-compaction")
    val setsRowsBefore = spark.read.parquet(s"$idx/sets")
      .orderBy("doc_id").collect().map(_.toString).toSeq

    val reports = Dedup.compactDedupIndex(spark, idx)
    assert(reports.nonEmpty, "fragmented index should trigger rewrites")

    // rows, serve results, and the sidecar are identical post-compaction
    assert(spark.read.parquet(s"$idx/sets")
      .orderBy("doc_id").collect().map(_.toString).toSeq === setsRowsBefore)
    assert(Dedup.batchDedupIndexed(spark, idx, probe)
      .collect().map(_.toString).toSeq === servedBefore)
    assert(new java.io.File(idx, "_vocab.json").exists() === vocabBefore,
      "compaction must not touch the vocabulary sidecar")
    // file counts shrink; the NEWEST batch's files survive for replay
    val setsAfter = dataFiles("sets")
    val bandsAfter = dataFiles("bands")
    assert(setsAfter.length < setsBefore.length,
      s"sets/: ${setsBefore.length} -> ${setsAfter.length}")
    assert(bandsAfter.length < bandsBefore.length,
      s"bands/: ${bandsBefore.length} -> ${bandsAfter.length}")
    assert(setsAfter.exists(_.startsWith("ddb4-")),
      "newest batch's set files must be excluded from the merge")
    // band_id partition pruning survives the rewrite
    val pruned = spark.read.parquet(s"$idx/bands").filter(col("band_id") === 3)
    assert(pruned.queryExecution.executedPlan.toString.contains("PartitionFilters"))
    // replay of the newest batch AFTER compaction is still exactly-once
    val totalSets = setsRowsBefore.length.toLong
    Dedup.appendDedupIndexBatch(spark, idx, batch(4), 4L)
    assert(spark.read.parquet(s"$idx/sets").count() === totalSets,
      "post-compaction replay duplicated the newest batch")
    // second pass: no-op
    assert(Dedup.compactDedupIndex(spark, idx).isEmpty)
  }

  test("bands layout partition-prunes on band_id") {
    val idx = Files.createTempDirectory("graft_dedupidx_prune").toString
    Dedup.writeDedupIndex(spark, sf, idx)
    val pruned = spark.read.parquet(s"$idx/bands").filter(col("band_id") === 3)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("band_id"),
      s"expected band_id partition pruning:\n$plan")
    assert(pruned.count() > 0)
    // partition count on disk matches NumBands
    val dirs = new java.io.File(s"$idx/bands").listFiles()
      .filter(_.getName.startsWith("band_id=")).length
    assert(dirs === Dedup.NumBands)
  }
}
