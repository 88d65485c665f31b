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
