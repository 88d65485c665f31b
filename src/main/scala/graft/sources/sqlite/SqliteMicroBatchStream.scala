package graft.sources.sqlite

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{
  MicroBatchStream, Offset, ReadAllAvailable, ReadLimit, ReadMaxRows,
  SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types.StructType

/** Streaming offset: the high-watermark rowid per station file. wview
  * appends samples with `dateTime INTEGER PRIMARY KEY` = the rowid, so
  * "everything after the last run" is exactly a rowid range — the same
  * resume-from-watermark contract the reference implements with its
  * YYYYMMDD state file (aristoteles.py:65-79), here checkpointed by
  * Spark's offset log instead. */
case class SqliteOffset(maxRowids: Map[String, Long]) extends Offset {
  override def json(): String =
    maxRowids.toSeq.sortBy(_._1).map { case (k, v) =>
      "\"" + k.replace("\\", "\\\\").replace("\"", "\\\"") + "\":" + v
    }.mkString("{", ",", "}")
}

object SqliteOffset {
  /** Parses only the flat {"path":long} shape json() emits. */
  def parse(json: String): SqliteOffset = {
    val entry = "\"((?:[^\"\\\\]|\\\\.)*)\"\\s*:\\s*(-?\\d+)".r
    SqliteOffset(entry.findAllMatchIn(json).map { m =>
      m.group(1).replace("\\\"", "\"").replace("\\\\", "\\") -> m.group(2).toLong
    }.toMap)
  }
}

/** Micro-batch stream over a station directory of `.sdb` files (or a
  * single file): each trigger reads only rowids in (lastMax, newMax]
  * per file — an O(tree-depth) max-rowid probe per file to discover
  * the new offset, then pruned b-tree range scans for the delta, never
  * a rescan of old data. New station files appearing mid-stream are
  * picked up with an implicit start offset of "beginning of file".
  *
  * At 100 TB this is the shape that matters: offset discovery is
  * metadata-sized (pages-per-probe ~ tree depth), and each
  * micro-batch's work is proportional to NEW data only. */
class SqliteMicroBatchStream(rootPath: String, table: String,
    fullSchema: StructType, required: StructType,
    lo: Long, hi: Long, stationCol: Option[String],
    maxRowsPerTrigger: Option[Long] = None)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  private def conf = new Configuration()

  // Trigger.AvailableNow: Spark would otherwise wrap this source and
  // DISCARD its read limit (the generic wrapper can't cap a custom
  // offset type) — implementing the trigger natively pins the target
  // head here, and rate-limited micro-batches walk up to it.
  @volatile private var availableNowTarget: Option[SqliteOffset] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(latestOffset().asInstanceOf[SqliteOffset])

  override def initialOffset(): Offset = SqliteOffset(Map.empty)

  override def deserializeOffset(json: String): Offset = SqliteOffset.parse(json)

  override def latestOffset(): Offset = {
    val files = SqlitePaths.resolve(rootPath, conf)
    SqliteOffset(files.flatMap { case (_, p) =>
      val f = SqliteFile.open(p, conf)
      // empty table -> no entry (absent = nothing to read)
      try f.maxRowid(f.tableRoot(table), Long.MinValue, Long.MaxValue).map(p -> _)
      finally f.close()
    }.toMap)
  }

  // ---- admission control (maxRowsPerTrigger) ------------------------

  override def getDefaultReadLimit: ReadLimit =
    maxRowsPerTrigger.map(n => ReadLimit.maxRows(n)).getOrElse(ReadLimit.allAvailable())

  /** True head of every file — what AvailableNow catches up to across
    * rate-limited triggers. */
  override def reportLatestOffset(): Offset = latestOffset()

  /** Advance each file's watermark by at most `maxRows` rows in total:
    * files are taken in path order; within the file that exhausts the
    * budget the cutoff rowid is found by binary search over the rowid
    * space with leaf-header COUNT probes (O(log(range) x count cost) —
    * rowids are sample times here, so dense-rank arithmetic doesn't
    * apply; the count probe is the b-tree's native rank oracle). */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val full = availableNowTarget
      .getOrElse(latestOffset().asInstanceOf[SqliteOffset])
    limit match {
      case _: ReadAllAvailable => full
      case r: ReadMaxRows =>
        val s = start.asInstanceOf[SqliteOffset].maxRowids
        var budget = r.maxRows()
        val capped = full.maxRowids.toSeq.sortBy(_._1).map { case (p, endRowid) =>
          val prev = s.get(p)
          val plo = prev match {
            case Some(v) if v == Long.MaxValue => Long.MaxValue
            case Some(v) => math.max(lo, v + 1)
            case None => lo
          }
          val phi = math.min(hi, endRowid)
          if (budget <= 0 || plo > phi) {
            // no budget (or nothing new): hold this file's watermark
            p -> prev.getOrElse(Long.MinValue)
          } else {
            val f = SqliteFile.open(p, conf)
            try {
              val root = f.tableRoot(table)
              val avail = f.countRows(root, plo, phi)
              if (avail <= budget) { budget -= avail; p -> endRowid }
              else {
                // smallest cutoff with count(plo..cutoff) >= budget.
                // Anchor the search at the file's true min rowid and
                // use an overflow-safe midpoint: plo can be
                // Long.MinValue (no pushed bound), where a + (b-a)/2
                // wraps and the search never terminates.
                var a = math.max(plo, f.minRowid(root, plo, phi).getOrElse(plo))
                var b = phi
                while (a < b) {
                  val mid = (a >> 1) + (b >> 1) + (a & b & 1L)
                  if (f.countRows(root, plo, mid) >= budget) b = mid else a = mid + 1
                }
                budget = 0
                p -> a
              }
            } finally f.close()
          }
        }.filterNot(_._2 == Long.MinValue).toMap
        SqliteOffset(capped)
      case other => throw new UnsupportedOperationException(s"read limit $other")
    }
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[SqliteOffset].maxRowids
    val e = end.asInstanceOf[SqliteOffset].maxRowids
    val stationByPath = SqlitePaths.resolve(rootPath, conf)
      .map { case (st, p) => p -> st }.toMap
    e.toSeq.sortBy(_._1).flatMap { case (p, endRowid) =>
      // a max rowid BELOW the checkpointed watermark means the file
      // was rebuilt/re-initialized in place — rowids restarted, and
      // this stream's offset contract cannot tell which rows are new.
      // Skipping is the safe choice (re-reading would double-ingest
      // into append sinks), but it must be LOUD: silence here is a
      // station that stops ingesting with no diagnostic.
      s.get(p).filter(_ > endRowid).foreach { prev =>
        System.err.println(
          s"[graft] sqlite stream: $p max rowid $endRowid regressed below " +
          s"watermark $prev (file rebuilt?); holding watermark, rows below it " +
          "are not ingested — reset the checkpoint to re-read this station")
      }
      val ploOpt = s.get(p) match {
        // a file already at Long.MaxValue can gain nothing more (and
        // prev + 1 would wrap)
        case Some(prev) if prev == Long.MaxValue => None
        case Some(prev) => Some(math.max(lo, prev + 1))
        case None => Some(lo)
      }
      ploOpt.toSeq.flatMap { plo =>
        val phi = math.min(hi, endRowid)
        if (plo > phi) Nil
        else {
          val station = stationByPath.getOrElse(p,
            SqlitePaths.stationOf(new org.apache.hadoop.fs.Path(p).getName))
          SqliteScan.pageGroups(p, table, plo, phi).map(pages =>
            SqlitePartition(p, table, pages, plo, phi, station, stationCol): InputPartition)
        }
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SqliteReaderFactory(fullSchema, required)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
