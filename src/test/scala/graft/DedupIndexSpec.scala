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
    // a batch with > 64 distinct tokens overflows any union
    val wide = Seq((9100002L, (1 to 70).map(i => s"tok$i").mkString(" ")))
      .toDF("doc_id", "text")
    Dedup.appendDedupIndexBatch(spark, idx, wide, batchId = 12L)
    assert(!vocabFile.exists(), "outgrown sidecar must be retired")
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
