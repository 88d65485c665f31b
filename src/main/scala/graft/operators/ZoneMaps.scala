package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level zone maps: a per-file min/max manifest written at ingest
  * so a range scan can drop files WITHOUT opening them. Parquet's own
  * footer stats already skip row groups — but reading a footer is an
  * I/O round trip per file, and a 100 TB table is O(100k) files: the
  * listing + footer pass dominates short-range queries long before any
  * data page is touched. A metadata-sized manifest (one JSON line per
  * file) turns that into a driver-side filter — the same move every
  * lakehouse table format makes by keeping file stats in the commit
  * log, reproduced here over raw parquet.
  *
  * Composes with [[Layout]]: writeZOrdered produces files whose
  * per-file ranges are TIGHT on both clustered dimensions, which is
  * exactly what makes a zone map selective; an unclustered table's
  * zones all span the full domain and prune nothing (the manifest
  * faithfully reports that — the layout, not the map, is the enabler).
  *
  * Pruning is conservative: a file is kept unless its zone PROVABLY
  * excludes the predicate range (nulls-only zones keep). The scan
  * result is therefore identical to the unpruned filter — pruning is
  * an optimization, never a semantics change; [[scanRange]] re-applies
  * the predicate over the surviving files. */
object ZoneMaps {

  val ManifestName = "_zonemaps.json"

  /** Compute and persist per-file [min,max] for `cols` in one scan
    * (group by input_file_name — each task contributes its own files'
    * partial stats, one metadata-sized aggregate). Ingest-time: run
    * after a write/compaction pass, like ANALYZE. */
  def write(spark: SparkSession, tablePath: String, cols: Seq[String]): Unit = {
    require(cols.nonEmpty, "zone map needs at least one column")
    // zones are numeric intervals — [[candidateFiles]] compares as
    // Double, and the flat one-line manifest format has no escaping
    // for arbitrary string stats (a min/max value containing `,"`
    // would mis-split the hand parser). Gate the column types up
    // front rather than writing a manifest that can't be read back.
    // ONE reader serves the schema gate AND the stats scan — a second
    // spark.read.parquet would repeat the O(files) listing this module
    // exists to amortize
    val df = spark.read.parquet(tablePath)
    val schema = df.schema
    cols.foreach { c =>
      val dt = schema.fields.find(_.name == c).map(_.dataType).getOrElse(
        throw new IllegalArgumentException(s"zone map column $c not in $tablePath"))
      // NUMERIC only: [[scanRange]] re-applies `col >= lo` with Double
      // bounds, and for date/timestamp columns Spark's comparison units
      // (days / epoch SECONDS) disagree with any millis the manifest
      // would store — permitting them produced wrong-or-empty scans.
      // Zone dates by their epoch-day / epoch-second NUMERIC derivation
      // column instead.
      require(dt.isInstanceOf[org.apache.spark.sql.types.NumericType],
        s"zone map column $c has type ${dt.catalogString}: only numeric " +
        "columns have comparable interval zones (for dates/timestamps, " +
        "zone a numeric epoch derivation column instead)")
    }
    val aggs: Seq[Column] = cols.flatMap { c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))
    }
    val rows = df
      .groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
      .collect()
    val json = rows.map { r =>
      val file = r.getString(0)
      val stats = cols.flatMap { c =>
        Seq(s""""min_$c":${jsonVal(r.getAs[Any](s"min_$c"))}""",
          s""""max_$c":${jsonVal(r.getAs[Any](s"max_$c"))}""")
      }.mkString(",")
      s"""{"file":"$file",$stats}"""
    }.mkString("\n")
    val p = new Path(tablePath, ManifestName)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(p, true)
    try out.write(json.getBytes("UTF-8")) finally out.close()
  }

  private def jsonVal(v: Any): String = v match {
    case null => "null"
    case s: String => "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    case ts: java.sql.Timestamp => ts.getTime.toString // epoch millis
    case d: java.sql.Date => d.getTime.toString
    case other => other.toString
  }

  /** The manifest as rows: (file, min_c, max_c, ...) — numeric stats
    * come back as doubles (controlled format, written by [[write]]). */
  private[graft] def readManifest(spark: SparkSession,
      tablePath: String): Seq[Map[String, String]] = {
    val p = new Path(tablePath, ManifestName)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val in = fs.open(p)
    val text = try new String(
      org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8") finally in.close()
    // controlled one-line-per-file format: {"k":v,...} with string or
    // numeric/null values — a tiny hand parser, no JSON lib needed
    text.split("\n").toSeq.filter(_.nonEmpty).map { line =>
      val body = line.trim.stripPrefix("{").stripSuffix("}")
      // split on commas between fields: quoted values contain no commas
      // for the stats we write (file paths never carry commas here
      // either — scratch/temp dirs); keys are always quoted
      body.split(",(?=\")").map { kv =>
        val Array(k, v) = kv.split(":", 2)
        k.trim.stripPrefix("\"").stripSuffix("\"") ->
          v.trim.stripPrefix("\"").stripSuffix("\"")
      }.toMap
    }
  }

  /** Files whose zone may intersect [lo, hi] on `column` — the
    * driver-side prune. Numeric comparison; a file with null stats
    * (all-null zone or missing column) is conservatively kept. */
  private[graft] def candidateFiles(spark: SparkSession, tablePath: String,
      column: String, lo: Double, hi: Double): Seq[String] =
    readManifest(spark, tablePath).filter { m =>
      val mn = m.get(s"min_$column").filter(_ != "null").map(_.toDouble)
      val mx = m.get(s"max_$column").filter(_ != "null").map(_.toDouble)
      (mn, mx) match {
        case (Some(a), Some(b)) => !(b < lo || a > hi)
        case _ => true
      }
    }.map(_("file"))

  /** Range scan served from the manifest: only surviving files are
    * handed to the reader (no footer reads for pruned files), and the
    * predicate is re-applied so results are identical to an unpruned
    * scan. STALENESS-SAFE: the manifest is reconciled against the
    * table's CURRENT listing — files appended since [[write]] carry no
    * zone and are conservatively KEPT (never silently missing from
    * results), and manifest entries whose file has since been deleted
    * (compaction) are dropped instead of failing the read. `basePath`
    * keeps hive partition columns in the schema, identical to the
    * unpruned scan's. Returns an empty frame (correct schema) when
    * every zone excludes the range. */
  def scanRange(spark: SparkSession, tablePath: String,
      column: String, lo: Double, hi: Double): DataFrame = {
    val root = new Path(tablePath)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    def listDataFiles(p: Path): Seq[String] =
      fs.listStatus(p).toSeq.flatMap { s =>
        val n = s.getPath.getName
        if (n.startsWith("_") || n.startsWith(".")) Seq.empty
        else if (s.isDirectory) listDataFiles(s.getPath)
        else Seq(s.getPath.toString)
      }
    // membership compares SCHEME-NORMALIZED paths: input_file_name
    // URIs (file:///x) and listing paths (file:/x) differ in spelling
    def norm(s: String): String = new Path(s).toUri.getPath
    val liveByNorm: Map[String, String] =
      listDataFiles(fs.makeQualified(root)).map(p => norm(p) -> p).toMap
    val zoned = candidateFiles(spark, tablePath, column, lo, hi)
      .filter(f => liveByNorm.contains(norm(f)))
    val manifestedNorm = readManifest(spark, tablePath).map(m => norm(m("file"))).toSet
    val unzoned = liveByNorm.collect { // appended since write(): keep
      case (n, p) if !manifestedNorm.contains(n) => p
    }.toSeq
    val files = zoned ++ unzoned
    val pred = col(column) >= lo && col(column) <= hi
    if (files.isEmpty)
      spark.read.parquet(tablePath).filter(lit(false))
    else
      spark.read.option("basePath", tablePath).parquet(files: _*).filter(pred)
  }
}
