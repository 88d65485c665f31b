package graft

import org.apache.spark.sql.functions._
import graft.operators.Compaction

/** Compaction.compact: bin-packs fragmented partitions, preserves rows
  * bit-for-bit, skips already-compact partitions, and is idempotent. */
class CompactionSpec extends SparkSpec {

  private def dataFiles(dir: java.io.File): Seq[java.io.File] =
    Option(dir.listFiles()).getOrElse(Array.empty).toSeq
      .filter(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))

  test("fragmented day partitions pack to one file each; rows survive bit-for-bit") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_compact_").toString
    try {
      val src = Tables.events(spark, sf)
        .select(col("event_id"), col("user_id"), col("value"),
          date_format(col("ts"), "yyyy-MM-dd").as("day"))
      // simulate a micro-batched ingest: 8 small files per day
      src.repartition(8).write.mode("overwrite").partitionBy("day").parquet(tmp)
      val root = new java.io.File(tmp)
      val dayDirs = root.listFiles().filter(_.isDirectory).toSeq
      assert(dayDirs.nonEmpty)
      assert(dayDirs.forall(d => dataFiles(d).length > 1), "fixture not fragmented")
      val before = spark.read.parquet(tmp)
        .orderBy("event_id").collect().map(_.toString).toSeq

      val reports = Compaction.compact(spark, tmp, targetBytes = 1L << 30)

      assert(reports.length === dayDirs.length)
      assert(reports.forall(_.filesAfter === 1))
      dayDirs.foreach(d => assert(dataFiles(d).length === 1, d.getName))
      // no scratch dirs left behind
      assert(!root.listFiles().exists(_.getName.startsWith("_compact_tmp")))
      val after = spark.read.parquet(tmp)
        .orderBy("event_id").collect().map(_.toString).toSeq
      assert(after === before)

      // idempotent: a second pass finds nothing to do
      assert(Compaction.compact(spark, tmp, targetBytes = 1L << 30).isEmpty)
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
      ()
    }
  }

  test("already-compact partitions are not rewritten (work ∝ fragmentation)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_compact2_").toString
    try {
      import spark.implicits._
      // p=a compact (1 file), p=b fragmented (6 files)
      Seq.tabulate(100)(i => (i.toLong, "a")).toDF("id", "p")
        .coalesce(1).write.mode("overwrite").partitionBy("p").parquet(tmp)
      Seq.tabulate(100)(i => (1000L + i, "b")).toDF("id", "p")
        .repartition(6).write.mode("append").partitionBy("p").parquet(tmp)
      val aFile = dataFiles(new java.io.File(s"$tmp/p=a")).head
      val aStamp = (aFile.getName, aFile.lastModified())

      val reports = Compaction.compact(spark, tmp, targetBytes = 1L << 30)

      assert(reports.map(_.partition) === Seq("p=b"))
      assert(dataFiles(new java.io.File(s"$tmp/p=b")).length === 1)
      val aAfter = dataFiles(new java.io.File(s"$tmp/p=a")).head
      assert((aAfter.getName, aAfter.lastModified()) === aStamp,
        "compact touched an already-compact partition")
      assert(spark.read.parquet(tmp).count() === 200)
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
      ()
    }
  }

  test("targetBytes drives the packing factor, not a hardcoded 1") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_compact3_").toString
    try {
      import spark.implicits._
      Seq.tabulate(20000)(i => (i.toLong, s"payload-$i")).toDF("id", "s")
        .repartition(10).write.mode("overwrite").parquet(tmp)
      val bytes = dataFiles(new java.io.File(tmp)).map(_.length()).sum
      // aim for ~3 output files
      val reports = Compaction.compact(spark, tmp, targetBytes = bytes / 3 + 1)
      assert(reports.length === 1)
      val n = reports.head.filesAfter
      assert(n >= 2 && n <= 4, s"expected ~3 packed files, got $n")
      assert(spark.read.parquet(tmp).count() === 20000)
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
      ()
    }
  }
}
