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
  *    deleted, and the swap runs under a TWO-MARKER protocol so a
  *    crash at ANY point is recovered by the next run without
  *    duplicating or losing a row: `_compact_intent_<s>` appears in
  *    the leaf before any rename (recovery: the partial
  *    `compact-<s>-*` copies are deleted — the originals are intact),
  *    is atomically renamed to `_compact_commit_<s>` once every new
  *    file has landed (recovery: the compacted set is complete, so
  *    the remaining originals are deleted), and the commit marker is
  *    removed only after every original delete has been VERIFIED.
  *    A lakehouse table format would make the swap a metadata commit;
  *    over raw parquet this ordering is the honest equivalent.
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
    * idempotent).
    *
    * `keepFile` names data files the pass must leave UNTOUCHED (they
    * are neither read, counted toward the bin-pack decision, nor
    * deleted) — the hook the replay-safe INDEX compactors use to
    * exclude the newest micro-batch's deterministically-named files,
    * whose presence a crash-replay's pre-delete depends on. */
  def compact(spark: SparkSession, tablePath: String,
      targetBytes: Long = 128L << 20,
      keepFile: String => Boolean = _ => false): Seq[PartitionReport] = {
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

    // crashed-run scratch sweep: a driver that died before writing its
    // intent marker leaves only a _compact_tmp_* dir; age-gated so a
    // concurrent run's young scratch is never reaped
    val now = System.currentTimeMillis()
    fs.listStatus(root)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("_compact_tmp_") &&
        now - s.getModificationTime >= 60 * 60 * 1000L)
      .foreach(s => fs.delete(s.getPath, true))

    /** Recover a leaf from any crash window of a previous run —
      * REQUIRED before reading it, or the rerun would merge originals
      * with a partial compacted copy and bake the duplicates in. */
    def recover(leaf: Path): Unit = {
      val entries = fs.listStatus(leaf)
      // commit marker: the compacted set is complete — finish the swap
      entries.filter(_.getPath.getName.startsWith("_compact_commit_")).foreach { m =>
        val s = m.getPath.getName.stripPrefix("_compact_commit_")
        // the marker lists the merged originals (one name per line);
        // delete exactly those. A legacy EMPTY marker (pre-list
        // protocol) falls back to deleting every non-compacted data
        // file — correct only because legacy runs had no keep set.
        val in = fs.open(m.getPath)
        val listed = (try new String(
          org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8") finally in.close())
          .split("\n").map(_.trim).filter(_.nonEmpty).toSet
        fs.listStatus(leaf)
          .filter { e =>
            val n = e.getPath.getName
            e.isFile && isData(n) && !n.startsWith(s"compact-$s-") &&
              (listed.isEmpty || listed.contains(n))
          }
          .foreach(e => require(fs.delete(e.getPath, false),
            s"recovery delete failed: ${e.getPath}"))
        fs.delete(m.getPath, false)
      }
      // intent marker without commit: renames were (possibly) partial
      // and every original is still present — drop the partial copies
      entries.filter(_.getPath.getName.startsWith("_compact_intent_")).foreach { m =>
        val s = m.getPath.getName.stripPrefix("_compact_intent_")
        fs.listStatus(leaf)
          .filter(e => e.isFile && e.getPath.getName.startsWith(s"compact-$s-"))
          .foreach(e => require(fs.delete(e.getPath, false),
            s"recovery delete failed: ${e.getPath}"))
        fs.delete(m.getPath, false)
        fs.delete(new Path(root, s"_compact_tmp_$s"), true)
      }
    }

    leaves(root).flatMap { leaf =>
      recover(leaf)
      val files = fs.listStatus(leaf)
        .filter(s => s.isFile && isData(s.getPath.getName) &&
          !keepFile(s.getPath.getName))
      val bytes = files.map(_.getLen).sum
      val needed = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
      if (files.length <= needed) None
      else {
        val stamp = java.util.UUID.randomUUID().toString.take(8)
        val tmp = new Path(root, s"_compact_tmp_$stamp")
        // map-only merge of this partition's files; partition values
        // live in the directory name and are untouched
        // read the merge set by explicit file list (NOT the leaf dir:
        // kept files must not be folded into the rewrite)
        spark.read.parquet(files.map(_.getPath.toString).toIndexedSeq: _*)
          .coalesce(needed)
          .write.mode("overwrite").parquet(tmp.toString)
        val fresh = fs.listStatus(tmp)
          .filter(s => s.isFile && isData(s.getPath.getName))
        // intent FIRST: a crash from here until the commit rename is
        // recovered by dropping the partial compact-<stamp>-* copies.
        // The marker CARRIES the merged originals' names: after the
        // atomic intent->commit rename, recovery deletes exactly that
        // set — never a file the run was told to keep.
        val intent = new Path(leaf, s"_compact_intent_$stamp")
        val mOut = fs.create(intent, true)
        try mOut.write(files.map(_.getPath.getName).mkString("\n").getBytes("UTF-8"))
        finally mOut.close()
        val moved = fresh.zipWithIndex.map { case (f, i) =>
          val dst = new Path(leaf, s"compact-$stamp-$i.parquet")
          require(fs.rename(f.getPath, dst), s"rename failed: ${f.getPath}")
          dst
        }
        // every new file has landed: flip intent -> commit atomically;
        // from here recovery finishes the delete side instead
        val commit = new Path(leaf, s"_compact_commit_$stamp")
        require(fs.rename(intent, commit), s"marker rename failed: $intent")
        // originals go, each delete VERIFIED — an unchecked miss would
        // leave a duplicate row set behind the removed marker
        files.foreach(f => require(fs.delete(f.getPath, false),
          s"delete failed (leaf left recoverable under $commit): ${f.getPath}"))
        fs.delete(commit, false)
        fs.delete(tmp, true)
        val rel = leaf.toString.stripPrefix(root.toString).stripPrefix("/")
        Some(PartitionReport(if (rel.isEmpty) "." else rel,
          files.length, moved.length, bytes))
      }
    }
  }
}
