package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-file compaction for partitioned parquet tables — the table
  * maintenance job every long-lived ingest needs: streaming
  * micro-batches, incremental appends ([[Similarity.appendIvfIndex]],
  * IncrementalIngest's day partitions) and dynamic partition
  * overwrites all accrete files far below the scan-efficient size, and
  * at 100 TB the resulting per-file open/footer cost dominates scan
  * time long before data volume does.
  *
  * Shape:
  *  - work is proportional to FRAGMENTATION, not table size: a
  *    partition is touched only when it has more files than
  *    ceil(bytes / targetBytes) — an already-compact partition is
  *    never read, rewritten, or even opened;
  *  - the rewrite is `coalesce(n)`, a map-only merge — compaction
  *    never shuffles (no key redistribution is wanted: file layout
  *    changes, row content and partition residency do not);
  *  - new files are fully written to a `_`-prefixed scratch dir
  *    (invisible to partition discovery) BEFORE any original is
  *    deleted, so a crash mid-pass never loses rows — it can leave a
  *    partition either un-compacted or doubled, and doubled is
  *    detectable/rerunnable because the swap is per-partition. A
  *    lakehouse table format would make the swap a metadata commit;
  *    over raw parquet the write-then-delete ordering is the honest
  *    equivalent.
  *
  * Z-ordered tables compose: [[Layout]] writes clustered files, this
  * job repacks them when later appends fragment the clustering unit. */
object Compaction {

  /** One compacted partition: dir (relative to the table root), file
    * count before/after, and the bytes rewritten. */
  final case class PartitionReport(partition: String, filesBefore: Int,
      filesAfter: Int, bytes: Long)

  private def isData(name: String): Boolean =
    !name.startsWith("_") && !name.startsWith(".")

  /** Bin-pack every fragmented leaf partition of `tablePath` into
    * ~targetBytes files. Returns one report per partition actually
    * rewritten (empty = table already compact; the pass is
    * idempotent). */
  def compact(spark: SparkSession, tablePath: String,
      targetBytes: Long = 128L << 20): Seq[PartitionReport] = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val fs = new Path(tablePath).getFileSystem(spark.sessionState.newHadoopConf())
    // qualified so relative-partition reporting strips a like prefix
    // (listStatus returns qualified file:/... paths)
    val root = fs.makeQualified(new Path(tablePath))

    def leaves(p: Path): Seq[Path] = {
      val dirs = fs.listStatus(p)
        .filter(s => s.isDirectory && isData(s.getPath.getName))
      if (dirs.isEmpty) Seq(p) else dirs.toSeq.flatMap(d => leaves(d.getPath))
    }

    leaves(root).flatMap { leaf =>
      val files = fs.listStatus(leaf)
        .filter(s => s.isFile && isData(s.getPath.getName))
      val bytes = files.map(_.getLen).sum
      val needed = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
      if (files.length <= needed) None
      else {
        val stamp = java.util.UUID.randomUUID().toString.take(8)
        val tmp = new Path(root, s"_compact_tmp_$stamp")
        // map-only merge of this partition's files; partition values
        // live in the directory name and are untouched
        spark.read.parquet(leaf.toString)
          .coalesce(needed)
          .write.mode("overwrite").parquet(tmp.toString)
        val fresh = fs.listStatus(tmp)
          .filter(s => s.isFile && isData(s.getPath.getName))
        // swap: new files land first, then originals go
        val moved = fresh.zipWithIndex.map { case (f, i) =>
          val dst = new Path(leaf, s"compact-$stamp-$i.parquet")
          require(fs.rename(f.getPath, dst), s"rename failed: ${f.getPath}")
          dst
        }
        files.foreach(f => fs.delete(f.getPath, false))
        fs.delete(tmp, true)
        val rel = leaf.toString.stripPrefix(root.toString).stripPrefix("/")
        Some(PartitionReport(if (rel.isEmpty) "." else rel,
          files.length, moved.length, bytes))
      }
    }
  }
}
