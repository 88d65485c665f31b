package graft.pipeline

import java.time.LocalDate
import java.time.format.DateTimeFormatter

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.UnitConversions

/** The aristoteles pipeline re-expressed Spark-first: incremental,
  * idempotent, batch ETL from per-station archive tables to a
  * day-partitioned columnar (parquet) archive, with a completeness gate,
  * conditional unit conversion, high-watermark state, and Prometheus
  * metrics. (SURVEY §2 S12, S14-S18; lifecycle §3 E1-E3.)
  *
  * Spark-native deltas from the reference, by design (SURVEY §1.4):
  *  - multi-station fan-in is a long-format union with a `station`
  *    column, not N copies of the pipeline;
  *  - the sink is parquet partitioned by (month, day) — already
  *    columnar, so the reference's per-column HDF5 shredding (S13) is
  *    free; dynamic partition overwrite reproduces the idempotent
  *    day-level rewrite, and Spark's commit protocol replaces the lock
  *    file;
  *  - two commit granularities: `perDayCommit = true` mirrors the
  *    reference's day-at-a-time write→advance ordering (:474-476 crash
  *    safety); `false` is the 100 TB backfill path — one job writes every
  *    pending day (each day one partition), then the watermark advances
  *    once.
  */
object ArchiveJob {

  case class StationSource(name: String, path: String,
      longitude: Option[Double] = None, latitude: Option[Double] = None,
      description: Option[String] = None)

  case class JobConfig(
      statePath: String,
      archivePath: String,
      instrument: String,
      stations: Seq[StationSource],
      metricsPath: Option[String] = None,
      /** Columnar sink format: "parquet" (default) or "orc" — the
        * north-star conversion target is "SQLite to Parquet/ORC"; both
        * carry the same day-partitioned layout and schema metadata.
        * "commitlog" publishes each day range as ONE transaction on the
        * graft commit-log table format instead: S14's idempotent
        * rewrite and S15's crash-safety become the log's snapshot +
        * batchId-ledger guarantees rather than directory-rename
        * choreography, and the archive gains time travel / change feed
        * / zone-map day pruning for free. */
      sinkFormat: String = "parquet")

  /** Run outcome, mirroring the reference's exit metrics (S18). */
  case class RunResult(
      status: Int,            // 0 nothing-to-do, 1 wrote, 2 gate-blocked, 3 error
      daysWritten: Int,
      firstDay: Option[LocalDate],
      yesterday: LocalDate,
      samplesYesterday: Map[String, Long])

  private val DayFmt = DateTimeFormatter.BASIC_ISO_DATE

  /** One station's archive table in WviewSchema (S1). A wview SQLite
    * database (the reference's actual input, aristoteles.py:229-230 —
    * conventionally *.sdb / *.sqlite / *.db) is read through the native
    * distributed SQLite source (graft.sources.sqlite): dateTime range
    * predicates push down to b-tree subtree pruning and the file is
    * scanned in parallel. Any other path is parquet with the same
    * schema (the already-columnar fast path). */
  def loadStation(spark: SparkSession, st: StationSource): DataFrame =
    if (SqliteExts.exists(e => st.path.endsWith(e))) {
      val raw = spark.read.format("sqlite").option("table", "archive").load(st.path)
      // project + coerce to WviewSchema: dateTime long, usUnits int,
      // sensors double; drops wview's extra columns (interval, ...)
      raw.select(
        col("dateTime").cast("long").as("dateTime") +:
        col("usUnits").cast("int").as("usUnits") +:
        WviewSchema.sensorNames.map(s => col(s).cast("double").as(s)): _*)
    } else spark.read.schema(WviewSchema.schema).parquet(st.path)

  private val SqliteExts = Seq(".sdb", ".sqlite", ".db")

  /** S12 — long-format fan-in: union of stations with a station tag. */
  def unionStations(spark: SparkSession, cfg: JobConfig): DataFrame =
    cfg.stations.map { st =>
      loadStation(spark, st).withColumn("station", lit(st.name))
    }.reduce(_ unionByName _)

  /** S10 — the conditional unit conversion projection over all 16
    * sensors, one codegen'd when/otherwise per column. */
  def convertUnits(df: DataFrame): DataFrame = {
    // Python truthiness (`if usUnits and value`, aristoteles.py:418):
    // ANY nonzero flag converts — weewx metric-variant codes (16/17)
    // included; `=== 1` would silently pass those rows through
    // unconverted. NULL compares to NULL -> otherwise branch -> value
    // passes through, matching `if None and v` being falsy.
    val us = col("usUnits") =!= 0
    val converted = WviewSchema.sensors.map { case (name, phys) =>
      UnitConversions.convert(phys, us, col(name)).as(name)
    }
    df.select(
      (col("dateTime") +: col("usUnits") +: col("station") +: converted): _*)
  }

  /** Per-station sample counts for one UTC day, inclusive bounds (S2/S5).
    * Returns counts only for stations present in the data. */
  def dayCounts(df: DataFrame, day: LocalDate): DataFrame = {
    val start = day.atStartOfDay(java.time.ZoneOffset.UTC).toEpochSecond
    val stop = start + 86399 // 23:59:59 — BETWEEN is inclusive-inclusive
    df.filter(col("dateTime").between(start, stop))
      .groupBy(col("station")).agg(count(lit(1)).as("n"))
  }

  /** S9/S17 — completeness gate: every configured station must have
    * exactly 288 samples for `day`. */
  def gatePasses(counts: Map[String, Long], stations: Seq[String]): Boolean =
    stations.forall(s => counts.getOrElse(s, 0L) == WviewSchema.SamplesPerDay.toLong)

  /** S6 — earliest day with data across all stations. */
  def firstAvailableDay(df: DataFrame): Option[LocalDate] =
    df.agg(min(col("dateTime"))).collect()(0) match {
      case row if row.isNullAt(0) => None
      case row => Some(java.time.Instant.ofEpochSecond(row.getLong(0))
        .atZone(java.time.ZoneOffset.UTC).toLocalDate)
    }

  /** E2 — state initialization (aristoteles.py:246-265): min first day
    * over stations, clamped; only acts when state is absent or `force`. */
  def resetState(spark: SparkSession, cfg: JobConfig,
      requested: Option[LocalDate], force: Boolean): Option[LocalDate] = {
    if (Watermark.read(cfg.statePath).isDefined && !force) return Watermark.read(cfg.statePath)
    val first = firstAvailableDay(unionStations(spark, cfg))
    first.map { f =>
      val init = Watermark.clamp(requested.getOrElse(f), f)
      Watermark.writeNext(cfg.statePath, init)
      init
    }
  }

  /** The day-partitioned conversion output for a set of days, ready for
    * the partitioned sink: adds month=YYYYMM / day=YYYYMMDD columns. */
  def outputFor(df: DataFrame, from: LocalDate, to: LocalDate): DataFrame = {
    val start = from.atStartOfDay(java.time.ZoneOffset.UTC).toEpochSecond
    val stop = to.atStartOfDay(java.time.ZoneOffset.UTC).toEpochSecond + 86399
    convertUnits(df.filter(col("dateTime").between(start, stop)))
      .withColumn("day", date_format(timestamp_seconds(col("dateTime")), "yyyyMMdd"))
      .withColumn("month", substring(col("day"), 1, 6))
  }

  /** Write one or more days to the archive, one parquet partition (and
    * one file) per day — the columnar analog of one .h5 per day (S14).
    * Dynamic partition overwrite makes re-runs idempotent. */
  private def writeDays(out: DataFrame, cfg: JobConfig): Unit =
    out.repartition(col("month"), col("day"))
      .sortWithinPartitions(col("station"), col("dateTime")) // S3: order is load-bearing
      .write.mode("overwrite")
      // pinned per write: under the session default (static) this
      // overwrite would truncate the WHOLE archive, not just the
      // re-run's day partitions — the job may run on a caller session
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("month", "day")
      .format(cfg.sinkFormat)
      .save(cfg.archivePath)

  /** The commit-log sink: the [from, to] day range lands as ONE
    * [[graft.operators.CommitLog.replaceRange]] transaction on
    * dateTime — old day files out, new day files (with their dateTime
    * zone maps) in, atomically; a reader sees the old day or the new
    * day, never a partial write. The batchId encodes the exact range,
    * so a re-run after a crash BETWEEN this commit and the watermark
    * advance finds itself in the ledger and lands nothing — the
    * reference's write→advance crash contract (aristoteles.py:474-476)
    * as a table-format guarantee. Returns true when the transaction
    * landed, false on a recognized replay (still a success: the data
    * is there). */
  private def writeDaysLog(spark: SparkSession, out: DataFrame,
      cfg: JobConfig, from: LocalDate, to: LocalDate): Boolean = {
    val start = from.atStartOfDay(java.time.ZoneOffset.UTC).toEpochSecond
    val stop = to.atStartOfDay(java.time.ZoneOffset.UTC).toEpochSecond + 86399
    val batchId = from.format(DayFmt).toLong * 100000000L + to.format(DayFmt).toLong
    graft.operators.CommitLog.replaceRange(spark, cfg.archivePath,
      out.repartition(col("month"), col("day"))
        .sortWithinPartitions(col("station"), col("dateTime")),
      "dateTime", start.toDouble, stop.toDouble,
      batchId = Some(batchId)).isDefined
  }

  /** E1 — the incremental run. */
  def run(spark: SparkSession, cfg: JobConfig,
      today: LocalDate,
      force: Boolean = false,
      stopDay: Option[LocalDate] = None,
      perDayCommit: Boolean = true): RunResult = {

    val yesterday = stopDay.getOrElse(today.minusDays(1))
    val stateOpt = Watermark.read(cfg.statePath)
    if (stateOpt.isEmpty) {
      // The reference emits metrics on EVERY terminal path, including the
      // bad-state abort (aristoteles/aristoteles.py:269-271 -> prom_and_exit
      // :484-485): an operator watching aristoteles_status must see the 3.
      publish(cfg, 3, 0, None, yesterday, Map.empty)
      return RunResult(3, 0, None, yesterday, Map.empty)
    }
    val firstDay = stateOpt.get

    val df = unionStations(spark, cfg).cache()
    try {
      val yCounts = dayCounts(df, yesterday).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap

      if (firstDay.isAfter(yesterday)) {
        publish(cfg, 0, 0, Some(firstDay), yesterday, yCounts)
        return RunResult(0, 0, Some(firstDay), yesterday, yCounts)
      }

      if (!gatePasses(yCounts, cfg.stations.map(_.name)) && !force) {
        publish(cfg, 2, 0, Some(firstDay), yesterday, yCounts)
        return RunResult(2, 0, Some(firstDay), yesterday, yCounts)
      }

      val days = Iterator.iterate(firstDay)(_.plusDays(1))
        .takeWhile(!_.isAfter(yesterday)).toSeq

      var written = 0
      val monthsTouched = scala.collection.mutable.LinkedHashSet.empty[String]
      if (perDayCommit) {
        // Reference ordering (:474-476): write day N, then advance state.
        days.foreach { day =>
          val out = outputFor(df, day, day)
          if (!out.isEmpty) { // S16: skip (no state advance) empty days
            if (cfg.sinkFormat == "commitlog") writeDaysLog(spark, out, cfg, day, day)
            else writeDays(out, cfg)
            monthsTouched += day.format(DateTimeFormatter.ofPattern("yyyyMM"))
            Watermark.advance(cfg.statePath, day)
            written += 1
          }
        }
      } else {
        // Backfill path: one job for the whole range, then one advance.
        val out = outputFor(df, firstDay, yesterday)
        // control-plane read: one row per day in the range, bounded small
        val daysPresent = out.select(col("day")).distinct().collect().map(_.getString(0))
        if (daysPresent.nonEmpty) {
          if (cfg.sinkFormat == "commitlog")
            writeDaysLog(spark, out, cfg, firstDay, yesterday)
          else writeDays(out, cfg)
          monthsTouched ++= daysPresent.map(_.substring(0, 6)).distinct
          Watermark.advance(cfg.statePath, yesterday)
          written = daysPresent.length
        }
      }
      // Acquisition attrs per monthly partition (aristoteles.py:393-402,
      // :443-458) — after data lands, before the run is declared done.
      AcqMetadata.write(cfg, monthsTouched, spark.sessionState.newHadoopConf())

      val status = if (written > 0) 1 else 0
      publish(cfg, status, written, Some(firstDay), yesterday, yCounts)
      RunResult(status, written, Some(firstDay), yesterday, yCounts)
    } catch {
      case e: Throwable =>
        // EVERY terminal path emits metrics (aristoteles.py's
        // prom_and_exit discipline): a mid-run read/write failure must
        // surface as status 3, not leave the previous run's 0/1 on
        // disk for the operator to trust indefinitely
        scala.util.Try(publish(cfg, 3, 0, Some(firstDay), yesterday, Map.empty))
        throw e
    } finally df.unpersist()
  }

  private def publish(cfg: JobConfig, status: Int, daysWritten: Int,
      firstDay: Option[LocalDate], yesterday: LocalDate,
      samples: Map[String, Long]): Unit =
    cfg.metricsPath.foreach { p =>
      PromMetrics.write(p, PromMetrics.Snapshot(
        status = status,
        reportTime = System.currentTimeMillis() / 1000,
        daysWritten = daysWritten,
        yesterday = yesterday.format(DayFmt).toLong,
        firstDay = firstDay.map(_.format(DayFmt).toLong).getOrElse(0L),
        samplesYesterday = samples))
    }
}
