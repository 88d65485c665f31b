package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Incremental IVF maintenance: appendIvfIndex must extend the index
  * under the FROZEN sidecar quantizer — never retrain, never rewrite
  * standing rows — and a fresh partition-pruned serve must see the
  * appended vectors with no rebuild. */
class IvfAppendSpec extends SparkSpec {

  private def sidecarBytes(path: String): Array[Byte] =
    java.nio.file.Files.readAllBytes(java.nio.file.Path.of(s"$path/_centroids.json"))

  test("append extends the index under the frozen quantizer") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_ivfappend_").toString
    try {
      val emb = Tables.embeddings(spark, sf)
      val total = emb.count()
      Similarity.writeIvfIndexFrom(spark,
        emb.filter(col("vec_id") % 2 === 0), tmp)
      val before = sidecarBytes(tmp)
      val nBefore = spark.read.parquet(tmp).count()
      assert(nBefore < total)

      Similarity.appendIvfIndex(spark, tmp,
        emb.filter(col("vec_id") % 2 === 1))

      // quantizer untouched — append may not retrain
      assert(java.util.Arrays.equals(before, sidecarBytes(tmp)),
        "append retrained or rewrote the sidecar quantizer")
      val idx = spark.read.parquet(tmp)
      assert(idx.count() === total)
      assert(idx.select("vec_id").distinct().count() === total)

      // appended rows landed in the argmax cell of the SIDECAR
      // quantizer (same assignment score the builder uses:
      // dot(v, c) - |c|^2/2)
      val cents = Similarity.readCentroidSidecar(spark, tmp)
      val odd = idx.withColumn("cell", col("cell").cast("int"))
        .filter(col("vec_id") % 2 === 1).limit(100).collect()
      assert(odd.nonEmpty)
      odd.foreach { r =>
        val v = r.getAs[scala.collection.Seq[Double]]("v").toArray
        val cell = r.getAs[Int]("cell")
        val scores = cents.map(c =>
          c.zip(v).map { case (a, b) => a * b }.sum - c.map(x => x * x).sum / 2.0)
        val best = scores.indexOf(scores.max) + 1 // array_position is 1-based
        assert(cell === best, s"vec ${r.getAs[Long]("vec_id")}")
      }

      // a fresh serve over the appended index sees the new vectors:
      // neighbors from the odd half are reachable
      val served = Similarity.knnIvfIndexed(spark, sf, tmp)
      assert(served.count() > 0)
      assert(served.filter(col("neighbor_id") % 2 === 1).count() > 0,
        "appended vectors never surfaced in a served probe")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
      ()
    }
  }

  test("streaming ingest appends micro-batches exactly-once under replay") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfstream_").toString
    val index = s"$dir/index"
    val feed = s"$dir/feed"
    val ckpt = s"$dir/ckpt"
    try {
      val emb = Tables.embeddings(spark, sf)
      val total = emb.count()
      Similarity.writeIvfIndexFrom(spark, emb.filter(col("vec_id") % 2 === 0), index)
      val sidecarBefore = sidecarBytes(index)

      // the incoming feed: odd vectors as 3 files -> 3 micro-batches
      emb.filter(col("vec_id") % 2 === 1).repartition(3)
        .write.parquet(feed)
      val q = graft.streaming.IncrementalIngest.ivfAppendWriter(
        graft.streaming.IncrementalIngest.embeddingsSource(spark, feed),
        index, ckpt).start()
      q.awaitTermination(120000)

      val idx = spark.read.parquet(index)
      assert(idx.count() === total)
      assert(idx.select("vec_id").distinct().count() === total)
      assert(java.util.Arrays.equals(sidecarBefore, sidecarBytes(index)),
        "streaming append retrained the quantizer")
      // batches landed under their own names (replay-addressable)
      val batchFiles = new java.io.File(index).listFiles()
        .filter(_.isDirectory).flatMap(_.listFiles())
        .map(_.getName).filter(_.startsWith("ivfb"))
      assert(batchFiles.nonEmpty)
      assert(batchFiles.map(_.takeWhile(_ != '-')).distinct.length >= 2,
        s"expected multiple micro-batches, saw: ${batchFiles.mkString(",")}")

      // REPLAY: land the same batch twice under one batchId (restart
      // between landing and offset commit) — exactly one copy survives
      val extra = emb.filter(col("vec_id") % 2 === 0).limit(40)
        .select((col("vec_id") + 1000000L).as("vec_id"),
          col("embedding"), col("label"))
      val nExtra = extra.count()
      Similarity.appendIvfIndexBatch(spark, index, extra, 777L)
      Similarity.appendIvfIndexBatch(spark, index, extra, 777L)
      assert(spark.read.parquet(index).count() === total + nExtra,
        "replayed batch landed twice")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
      ()
    }
  }

  test("compaction: serve identical, file count bounded, newest batch kept replay-safe") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_ivfcompact_").toString
    try {
      val emb = Tables.embeddings(spark, sf)
      Similarity.writeIvfIndexFrom(spark, emb.filter(col("vec_id") % 2 === 0), tmp)
      // five appended micro-batches fragment every cell directory
      def batchFrame(b: Int) = emb.filter(col("vec_id") % 10 === b)
        .select((col("vec_id") + b * 1000000L).as("vec_id"),
          col("embedding"), col("label"))
      (1 to 5).foreach(b => Similarity.appendIvfIndexBatch(spark, tmp, batchFrame(b), b.toLong))
      val sidecarBefore = sidecarBytes(tmp)
      def cellFiles = new java.io.File(tmp).listFiles()
        .filter(d => d.isDirectory && d.getName.startsWith("cell="))
        .flatMap(_.listFiles()).map(_.getName)
        .filter(n => !n.startsWith("_") && !n.startsWith("."))
      val filesBefore = cellFiles
      val rowsBefore = spark.read.parquet(tmp)
        .orderBy("vec_id").collect().map(_.toString).toSeq
      val servedBefore = Similarity.knnIvfIndexed(spark, sf, tmp)
        .collect().map(_.toString).toSeq

      val reports = Similarity.compactIvfIndex(spark, tmp)
      assert(reports.nonEmpty, "fragmented index should trigger at least one rewrite")

      // rows and served probes are bit-identical post-compaction
      assert(spark.read.parquet(tmp)
        .orderBy("vec_id").collect().map(_.toString).toSeq === rowsBefore)
      assert(Similarity.knnIvfIndexed(spark, sf, tmp)
        .collect().map(_.toString).toSeq === servedBefore)
      // file count strictly bounded: each compacted cell holds one
      // merged file (+ the kept newest-batch file when present)
      val filesAfter = cellFiles
      assert(filesAfter.length < filesBefore.length,
        s"expected fewer files, got ${filesBefore.length} -> ${filesAfter.length}")
      new java.io.File(tmp).listFiles()
        .filter(d => d.isDirectory && d.getName.startsWith("cell=")).foreach { d =>
          val names = d.listFiles().map(_.getName)
            .filter(n => !n.startsWith("_") && !n.startsWith("."))
          val kept = names.count(_.startsWith("ivfb5-"))
          assert(names.length - kept <= 1,
            s"cell ${d.getName} not packed to one file (+kept): ${names.mkString(",")}")
        }
      // the NEWEST batch's deterministically-named files survive —
      // the crash-replay pre-delete depends on them
      assert(filesAfter.exists(_.startsWith("ivfb5-")),
        "newest batch's files must be excluded from the merge")
      // (an older batch's file may survive only where its cell was
      // already compact — one non-kept file needs no rewrite)
      // quantizer sidecar untouched
      assert(java.util.Arrays.equals(sidecarBefore, sidecarBytes(tmp)))
      // replay of the newest batch AFTER compaction is still
      // exactly-once (its pre-delete finds its files intact)
      val totalRows = rowsBefore.length.toLong
      Similarity.appendIvfIndexBatch(spark, tmp, batchFrame(5), 5L)
      assert(spark.read.parquet(tmp).count() === totalRows,
        "post-compaction replay duplicated the newest batch")
      // a SECOND pass is a no-op (idempotence)
      assert(Similarity.compactIvfIndex(spark, tmp).isEmpty)
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
      ()
    }
  }
}
