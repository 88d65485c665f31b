package graft

import java.nio.file.Files
import java.time.LocalDate

import org.apache.spark.sql.{Row, SaveMode}
import org.apache.spark.sql.functions._
import graft.pipeline.{ArchiveJob, WviewSchema}
import graft.streaming.IncrementalIngest

/** Streaming incremental mode: file-source discovery with path-derived
  * station identity, watermarked per-station daily windows in append
  * mode, idempotent foreachBatch partitioned sink (batch_id
  * sub-partitions), checkpoint resume, and batch/streaming archive
  * equivalence on a two-station input. */
class StreamingSpec extends SparkSpec {

  private val d1 = LocalDate.of(2024, 3, 1)
  private val d2 = LocalDate.of(2024, 3, 2)

  private def dayRows(day: LocalDate, n: Int, offset: Int = 0): Seq[Row] = {
    val start = day.atStartOfDay(java.time.ZoneOffset.UTC).toEpochSecond
    (offset until offset + n).map { i =>
      Row.fromSeq((start + i * 300L).asInstanceOf[Any] :: 1 ::
        WviewSchema.sensorNames.map(_ => 50.0: Any).toList)
    }
  }

  /** One parquet file into `<dir>/<station>/` — the per-station layout
    * the streaming source derives identity from. */
  private def writeDay(dir: String, station: String, day: LocalDate, n: Int,
      offset: Int = 0): Unit =
    spark.createDataFrame(
        spark.sparkContext.parallelize(dayRows(day, n, offset), 1), WviewSchema.schema)
      .write.mode(SaveMode.Append).parquet(s"$dir/$station")

  test("watermarked daily window emits only closed days, per station") {
    val in = Files.createTempDirectory("graft-stream-in").toString
    writeDay(in, "stA", d1, 288)
    writeDay(in, "stB", d1, 288)
    writeDay(in, "stA", d2, 100) // d2 still "open" — max ts is mid-day d2

    val q = IncrementalIngest.startDailyCountsToMemory(spark, in, "daily_counts")
    q.processAllAvailable()
    // after batch 1 the watermark (max ts - 1 day) is inside d1, so
    // nothing has closed yet — the S17 late-data policy in action
    assert(spark.sql("SELECT * FROM daily_counts").count() === 0)

    // a later file (d3) advances the watermark past d1's window end;
    // d1 flushes for BOTH stations, d2 (within the late horizon) does not
    writeDay(in, "stA", d2.plusDays(1), 288)
    q.processAllAvailable()
    val rows = spark.sql("SELECT day, station, n_samples FROM daily_counts ORDER BY day, station").collect()
    q.stop()
    assert(rows.map(r => (r.getDate(0).toString, r.getString(1), r.getLong(2))).toSeq
      === Seq(("2024-03-01", "stA", 288L), ("2024-03-01", "stB", 288L)))
  }

  /** Run SQL against a fixture .sdb with whatever this container has:
    * the sqlite3 CLI when present, else python3's stdlib sqlite3
    * module; cancels the test (assume) when neither exists. */
  private def fixtureSql(db: java.nio.file.Path, stmt: String): Unit = {
    def run(cmd: String*): Option[Int] =
      try Some(new ProcessBuilder(cmd: _*).inheritIO().start().waitFor())
      catch { case _: java.io.IOException => None }
    val rc = run("sqlite3", db.toString, stmt).orElse(
      run("python3", "-c",
        "import sqlite3,sys; c=sqlite3.connect(sys.argv[1]); c.executescript(sys.argv[2]); c.close()",
        db.toString, stmt))
    assume(rc.isDefined, "neither sqlite3 CLI nor python3 available to author fixtures")
    assert(rc.get === 0, s"fixture sql failed: $stmt")
  }

  /** Like writeDay but with explicit outTemp values per sample. */
  private def writeValues(dir: String, station: String, day: LocalDate,
      vals: Seq[Double], offset: Int = 0): Unit = {
    val start = day.atStartOfDay(java.time.ZoneOffset.UTC).toEpochSecond
    val rows = vals.zipWithIndex.map { case (v, i) =>
      Row.fromSeq((start + (offset + i) * 300L).asInstanceOf[Any] :: 1 ::
        WviewSchema.sensorNames.map(n => if (n == "outTemp") v: Any else 50.0: Any).toList)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), WviewSchema.schema)
      .write.mode(SaveMode.Append).parquet(s"$dir/$station")
  }

  test("flatMapGroupsWithState anomaly detector: spikes emit, state spans batches") {
    val in = Files.createTempDirectory("graft-anom-in").toString
    // batch 1: 20 calm alternating samples — establishes mean~50.1,
    // sigma~0.1; nothing may emit
    writeValues(in, "stA", d1, (0 until 20).map(i => if (i % 2 == 0) 50.0 else 50.2))
    val q = IncrementalIngest.anomalies(spark, in)
      .writeStream.outputMode("append").format("memory").queryName("anoms").start()
    q.processAllAvailable()
    assert(spark.sql("SELECT * FROM anoms").count() === 0)

    // batch 2: calm, spike, calm — exactly the spike must emit, and
    // only because batch 1's state (n=20 >= minSamples) carried over
    writeValues(in, "stA", d1, Seq(50.0, 99.0, 50.2), offset = 20)
    q.processAllAvailable()
    val rows = spark.sql("SELECT station, value, expected, sigma FROM anoms").collect()
    q.stop()
    assert(rows.length === 1, rows.mkString("; "))
    assert(rows(0).getString(0) === "stA")
    assert(rows(0).getDouble(1) === 99.0)
    assert(math.abs(rows(0).getDouble(2) - 50.1) < 0.05) // running mean at spike time
    assert(rows(0).getDouble(3) > 0.0 && rows(0).getDouble(3) < 0.2)
  }

  test("anomaly detector: constant warmup (sigma=0) doesn't flag quantization noise") {
    val in = Files.createTempDirectory("graft-anom0-in").toString
    // perfectly constant warmup drives running sigma to 0; a bare
    // z-score flags ANY fluctuation — the minSigma floor must hold the
    // 0.2-unit quantization step back while still passing a real spike
    writeValues(in, "stB", d1, Seq.fill(15)(50.0))
    val q = IncrementalIngest.anomalies(spark, in)
      .writeStream.outputMode("append").format("memory").queryName("anoms0").start()
    q.processAllAvailable()
    writeValues(in, "stB", d1, Seq(50.2, 99.0, 50.0), offset = 15)
    q.processAllAvailable()
    val rows = spark.sql("SELECT value FROM anoms0").collect()
    q.stop()
    assert(rows.map(_.getDouble(0)).toSeq === Seq(99.0), rows.mkString("; "))
  }

  test("anomaly detector skips NULL sensor readings instead of dying") {
    val in = Files.createTempDirectory("graft-anomnull-in").toString
    // wview stores NULL for absent sensors; the tuple encoder is
    // non-nullable, so without the isNotNull filter the FIRST null
    // sample kills the whole streaming query
    val start = d1.atStartOfDay(java.time.ZoneOffset.UTC).toEpochSecond
    val vals: Seq[Any] = (0 until 15).map(i => if (i % 2 == 0) 50.0 else 50.2) ++
      Seq(null, null) // sensor dropout mid-stream
    val rows = vals.zipWithIndex.map { case (v, i) =>
      Row.fromSeq((start + i * 300L).asInstanceOf[Any] :: 1 ::
        WviewSchema.sensorNames.map(n => if (n == "outTemp") v else 50.0: Any).toList)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), WviewSchema.schema)
      .write.mode(SaveMode.Append).parquet(s"$in/stA")
    val q = IncrementalIngest.anomalies(spark, in)
      .writeStream.outputMode("append").format("memory").queryName("anomsnull").start()
    q.processAllAvailable() // would throw "Null value appeared in non-nullable field" unfiltered
    assert(spark.sql("SELECT * FROM anomsnull").count() === 0)
    // state survived the dropout: a later spike still emits, and the
    // running stats reflect only the 15 non-null warmup samples
    writeValues(in, "stA", d1, Seq(99.0), offset = 17)
    q.processAllAvailable()
    val out = spark.sql("SELECT value, expected FROM anomsnull").collect()
    q.stop()
    assert(out.map(_.getDouble(0)).toSeq === Seq(99.0), out.mkString("; "))
    assert(math.abs(out(0).getDouble(1) - 50.09) < 0.1)
  }

  test("stream-static join enriches the stream with broadcast station metadata") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft-enrich-in").toString
    writeDay(in, "stA", d1, 3)
    writeDay(in, "stB", d1, 2)
    val meta = Seq(("stA", 49.32, -119.62), ("stB", 47.0, -120.0))
      .toDF("station", "latitude", "longitude")
    val q = IncrementalIngest.enrichedSource(spark, in, meta)
      .select(col("station"), col("dateTime"), col("latitude"))
      .writeStream.outputMode("append").format("memory").queryName("enriched").start()
    q.processAllAvailable()
    q.stop()
    val rows = spark.sql("SELECT station, latitude FROM enriched").collect()
    assert(rows.length === 5)
    assert(rows.filter(_.getString(0) == "stA").forall(_.getDouble(1) === 49.32))
    assert(rows.filter(_.getString(0) == "stB").forall(_.getDouble(1) === 47.0))
  }

  test("stateful aggregation runs on the RocksDB state store (the 100 TB backend)") {
    // the default HDFS-backed store keeps all state on the JVM heap —
    // fine for tests, an OOM at production key counts; RocksDB spills
    // to native memory + disk and is the provider a real deployment
    // sets. Same query, same results, provider-specific metrics prove
    // it actually engaged.
    val in = Files.createTempDirectory("graft-rocks-in").toString
    writeDay(in, "stA", d1, 288)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val q = IncrementalIngest.startDailyCountsToMemory(spark, in, "rocksdb_counts")
      q.processAllAvailable()
      writeDay(in, "stA", d2.plusDays(1), 288) // advance watermark past d1
      q.processAllAvailable()
      val prog = q.lastProgress
      q.stop()
      val rows = spark.sql("SELECT day, station, n_samples FROM rocksdb_counts").collect()
      assert(rows.map(r => (r.getDate(0).toString, r.getString(1), r.getLong(2))).toSeq
        === Seq(("2024-03-01", "stA", 288L)))
      assert(prog.stateOperators.nonEmpty)
      val metricKeys = prog.stateOperators(0).customMetrics.keySet()
      import scala.jdk.CollectionConverters._
      assert(metricKeys.asScala.exists(_.toLowerCase.contains("rocksdb")),
        s"RocksDB provider did not engage; metrics: ${metricKeys.asScala.mkString(",")}")
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("session windows fuse bursts, split on gaps, close with the watermark") {
    val in = Files.createTempDirectory("graft-sess-in").toString
    // burst 1: 10 samples at 5-min cadence (00:00-00:45); burst 2
    // starts 55 min later (> the 30-min gap) with 6 samples
    writeDay(in, "stA", d1, 10)
    writeDay(in, "stA", d1, 6, offset = 20)

    val q = IncrementalIngest.startSessionCountsToMemory(spark, in, "sess_counts")
    q.processAllAvailable()
    // watermark (max ts - 1h) hasn't passed burst 2's end+gap yet
    assert(spark.sql("SELECT * FROM sess_counts").count() === 0)

    writeDay(in, "stA", d2, 1) // advance the watermark a day
    q.processAllAvailable()
    val rows = spark.sql(
      "SELECT session_start, session_end, station, n_samples FROM sess_counts " +
      "ORDER BY session_start").collect()
    q.stop()
    assert(rows.length === 2, rows.mkString("; "))
    assert(rows.map(_.getLong(3)).toSeq === Seq(10L, 6L))
    // session_window end = last event + gap
    val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
    def ts(r: Row, i: Int) = r.getTimestamp(i).toLocalDateTime.format(fmt)
    assert(ts(rows(0), 0) === "2024-03-01 00:00:00")
    assert(ts(rows(0), 1) === "2024-03-01 01:15:00") // 00:45 last + 30 min
    assert(ts(rows(1), 0) === "2024-03-01 01:40:00") // offset 20 x 5 min
    assert(ts(rows(1), 1) === "2024-03-01 02:35:00") // 02:05 last + 30 min
  }

  test("sqlite micro-batch stream: rowid watermark ingests only new rows") {
    val dir = Files.createTempDirectory("graft-sdb-stream")
    def res(name: String) = getClass.getResource(s"/sqlite/$name").getPath
    Files.copy(java.nio.file.Path.of(res("stA.sdb")), dir.resolve("stA.sdb"))
    Files.copy(java.nio.file.Path.of(res("stB.sdb")), dir.resolve("stB.sdb"))
    val out = Files.createTempDirectory("graft-sdb-out").toString
    val ckpt = Files.createTempDirectory("graft-sdb-ckpt").toString

    def runOnce(): Unit = {
      val q = IncrementalIngest.sqliteSource(spark, dir.toString)
        .select(col("station"), col("dateTime"), col("outTemp"), col("ts"))
        .writeStream
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .format("parquet")
        .option("path", out)
        .start()
      assert(q.awaitTermination(120000), "stream did not finish in time")
    }

    runOnce()
    val batchCount =
      spark.read.format("sqlite").load(dir.resolve("stA.sdb").toString).count() +
      spark.read.format("sqlite").load(dir.resolve("stB.sdb").toString).count()
    val first = spark.read.parquet(out)
    assert(first.count() === batchCount)
    assert(first.select("station").distinct().collect().map(_.getString(0)).toSet
      === Set("stA", "stB"))

    // grow stA in place — the reference's ".sdb snapshot drop" (its
    // wview input gains rows between runs, aristoteles.py:229-230)
    val newTimes = Seq(1709424000L, 1709424300L)
    val ins = newTimes.map(t =>
      s"INSERT INTO archive(dateTime, usUnits, interval, outTemp) VALUES ($t, 1, 5, 42.0);")
      .mkString(" ")
    fixtureSql(dir.resolve("stA.sdb"), ins)

    runOnce()
    val second = spark.read.parquet(out)
    assert(second.count() === batchCount + 2)
    // the second run read ONLY the delta: no (station, dateTime) dups
    assert(second.select("station", "dateTime").distinct().count() === batchCount + 2)
    val appended = second.filter(col("station") === "stA" && col("dateTime") >= newTimes.min)
      .collect()
    assert(appended.map(_.getLong(1)).sorted === newTimes.sorted.toArray)
    assert(appended.forall(_.getDouble(2) === 42.0))
  }

  test("sqlite stream picks up a NEW station file between triggers") {
    val dir = Files.createTempDirectory("graft-sdb-newst")
    def res(name: String) = getClass.getResource(s"/sqlite/$name").getPath
    Files.copy(java.nio.file.Path.of(res("stA.sdb")), dir.resolve("stA.sdb"))
    val out = Files.createTempDirectory("graft-sdb-newst-out").toString
    val ckpt = Files.createTempDirectory("graft-sdb-newst-ckpt").toString

    def runOnce(): Unit = {
      val q = IncrementalIngest.sqliteSource(spark, dir.toString)
        .select(col("station"), col("dateTime"))
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .format("parquet").option("path", out).start()
      assert(q.awaitTermination(120000))
    }

    runOnce()
    assert(spark.read.parquet(out).count() === 576) // stA alone
    // a station joins the fleet: its whole file is an implicit
    // from-the-beginning offset, existing stations stay incremental
    Files.copy(java.nio.file.Path.of(res("stB.sdb")), dir.resolve("stB.sdb"))
    runOnce()
    val byStation = spark.read.parquet(out).groupBy(col("station")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byStation === Map("stA" -> 576L, "stB" -> 575L))
  }

  test("rebuilt station file holds the watermark — no double ingest, no regress") {
    val dir = Files.createTempDirectory("graft-sdb-rebuild")
    def res(name: String) = getClass.getResource(s"/sqlite/$name").getPath
    Files.copy(java.nio.file.Path.of(res("stA.sdb")), dir.resolve("stA.sdb"))
    val out = Files.createTempDirectory("graft-sdb-rebuild-out").toString
    val ckpt = Files.createTempDirectory("graft-sdb-rebuild-ckpt").toString
    val oldMax = 1709423700L

    def runOnce(): Unit = {
      val q = IncrementalIngest.sqliteSource(spark, dir.toString)
        .select(col("station"), col("dateTime"))
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .format("parquet").option("path", out).start()
      assert(q.awaitTermination(120000))
    }
    def sql(stmt: String): Unit = fixtureSql(dir.resolve("stA.sdb"), stmt)

    runOnce()
    assert(spark.read.parquet(out).count() === 576)
    // rebuild in place: the file's max rowid drops far below the
    // checkpointed watermark — already-ingested rowid space
    sql(s"DELETE FROM archive WHERE dateTime > ${1709251200L + 3000}; VACUUM;")
    runOnce()
    assert(spark.read.parquet(out).count() === 576, "rebuild re-ingested old rowids")
    // rows inside the already-ingested rowid space stay held too
    sql(s"INSERT INTO archive(dateTime, usUnits, interval, outTemp) VALUES (${oldMax - 300}, 1, 5, 1.0);")
    runOnce()
    assert(spark.read.parquet(out).count() === 576, "held watermark leaked old-range rows")
    // only a rowid PAST the held watermark is genuinely new
    sql(s"INSERT INTO archive(dateTime, usUnits, interval, outTemp) VALUES (${oldMax + 300}, 1, 5, 2.0);")
    runOnce()
    val rows = spark.read.parquet(out)
    assert(rows.count() === 577)
    assert(rows.filter(col("dateTime") === oldMax + 300).count() === 1)
  }

  test("sqlite stream rate-limits with maxRowsPerTrigger (bounded micro-batches)") {
    val dir = Files.createTempDirectory("graft-sdb-rate")
    def res(name: String) = getClass.getResource(s"/sqlite/$name").getPath
    for (st <- Seq("stA", "stB"))
      Files.copy(java.nio.file.Path.of(res(s"$st.sdb")), dir.resolve(s"$st.sdb"))
    val out = Files.createTempDirectory("graft-sdb-rate-out").toString
    val ckpt = Files.createTempDirectory("graft-sdb-rate-ckpt").toString

    val q = IncrementalIngest.sqliteSource(spark, dir.toString, Some(300L))
      .select(col("station"), col("dateTime"))
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .format("parquet").option("path", out).start()
    assert(q.awaitTermination(120000))

    // complete (AvailableNow catches up to the reported head) and
    // exactly-once across the rate-limited batches
    val got = spark.read.parquet(out)
    assert(got.count() === 576 + 575)
    assert(got.distinct().count() === 576 + 575)
    // and the 1151 rows really arrived in >= ceil(1151/300) batches
    val offsetFiles = new java.io.File(s"$ckpt/offsets").listFiles()
      .filterNot(_.getName.startsWith(".")).length
    assert(offsetFiles >= 4, s"expected >=4 rate-limited batches, got $offsetFiles")
  }

  test("sqlite stream composes with the archive writer (streaming == batch archive)") {
    val root = Files.createTempDirectory("graft-sdb-compose").toString
    def res(name: String) = getClass.getResource(s"/sqlite/$name").getPath
    new java.io.File(s"$root/in").mkdirs()
    for (st <- Seq("stA", "stB"))
      Files.copy(java.nio.file.Path.of(res(s"$st.sdb")),
                 java.nio.file.Path.of(s"$root/in/$st.sdb"))

    // batch reference: the ArchiveJob reading the SAME .sdb files
    val cfg = ArchiveJob.JobConfig(
      statePath = s"$root/state", archivePath = s"$root/batch_archive",
      instrument = "cmp",
      stations = Seq(ArchiveJob.StationSource("stA", s"$root/in/stA.sdb"),
                     ArchiveJob.StationSource("stB", s"$root/in/stB.sdb")))
    ArchiveJob.resetState(spark, cfg, None, force = false)
    val mar1 = LocalDate.of(2024, 3, 1)
    assert(ArchiveJob.run(spark, cfg, today = mar1.plusDays(2), force = true).daysWritten === 2)

    // streaming path: native sqlite micro-batch source -> same sink
    val q = IncrementalIngest.archiveWriter(
      IncrementalIngest.sqliteSource(spark, s"$root/in"),
      s"$root/stream_archive", s"$root/ckpt").start()
    q.awaitTermination()

    val cols = Seq("day", "station", "dateTime", "usUnits") ++ WviewSchema.sensorNames
    val b = spark.read.parquet(s"$root/batch_archive")
      .select(cols.map(col): _*).orderBy(cols.map(col): _*).collect()
    val s = spark.read.parquet(s"$root/stream_archive")
      .select(cols.map(col): _*).orderBy(cols.map(col): _*).collect()
    assert(b.length === 576 + 575)
    assert(b.map(_.toString).toSeq === s.map(_.toString).toSeq)
  }

  test("foreachBatch sink: station from path, day split across batches survives, checkpoint resumes") {
    val in = Files.createTempDirectory("graft-stream-in2").toString
    val out = Files.createTempDirectory("graft-stream-out").toString
    val ckpt = Files.createTempDirectory("graft-stream-ckpt").toString
    // d1 for stA arrives as TWO files; maxFilesPerTrigger=1 forces the
    // day across two micro-batches — the case plain day-overwrite loses
    writeDay(in, "stA", d1, 144)
    writeDay(in, "stA", d1, 144, offset = 144)

    val q1 = IncrementalIngest.archiveWriter(
      IncrementalIngest.source(spark, in, maxFilesPerTrigger = 1), out, ckpt).start()
    q1.awaitTermination()
    assert(spark.read.parquet(out).count() === 288,
      "a day split across micro-batches must accumulate, not clobber")
    assert(spark.read.parquet(out).select("station").distinct().collect()
      .map(_.getString(0)).toSeq === Seq("stA"))

    // new station + new day; restart from checkpoint — only new data runs
    writeDay(in, "stB", d2, 50)
    val q2 = IncrementalIngest.archiveWriter(
      IncrementalIngest.source(spark, in, maxFilesPerTrigger = 1), out, ckpt).start()
    q2.awaitTermination()
    val byDayStation = spark.read.parquet(out).groupBy("day", "station").count()
      .collect().map(r => (r.get(0).toString, r.getString(1)) -> r.getLong(2)).toMap
    assert(byDayStation === Map(
      ("20240301", "stA") -> 288L, ("20240302", "stB") -> 50L))

    // converted values present (50F -> 10C for temperature sensors)
    val temps = spark.read.parquet(out)
      .filter(col("day") === "20240301").select("outTemp").distinct().collect()
    assert(temps.length === 1 && math.abs(temps(0).getDouble(0) - 10.0) < 1e-9)

    // compaction folds the closed day's batch sub-partitions into one
    // sorted file; content identical, batch= dirs gone
    val before = spark.read.parquet(out).filter(col("day") === "20240301")
      .drop("batch_id").orderBy(col("station"), col("dateTime")).collect()
    IncrementalIngest.compactDay(spark, out, "202403", "20240301")
    val dayDir = new java.io.File(s"$out/month=202403/day=20240301")
    val batchDirs = dayDir.listFiles().filter(_.getName.startsWith("batch_id="))
    assert(batchDirs.map(_.getName).toSeq === Seq("batch_id=-1"),
      "multi-batch dirs must fold into the reserved compacted partition")
    assert(batchDirs.head.listFiles().count(_.getName.endsWith(".parquet")) === 1,
      "compacted day should be a single file")
    val after = spark.read.parquet(out).filter(col("day") === "20240301")
      .drop("batch_id").orderBy(col("station"), col("dateTime")).collect()
    assert(before.map(_.toString).toSeq === after.map(_.toString).toSeq)
  }

  test("mapGroupsWithState station watermarks persist across restarts") {
    val in = Files.createTempDirectory("graft-stream-state-in").toString
    val ckpt = Files.createTempDirectory("graft-stream-state-ckpt").toString
    writeDay(in, "stA", d1, 288)
    writeDay(in, "stB", d1, 100)

    val progressDir = Files.createTempDirectory("graft-stream-state-out").toString
    def run(): Map[String, (Long, Long)] = {
      // foreachBatch sink: the memory sink cannot recover from a
      // checkpoint, and stateful update-mode output cannot use the
      // append-only file sink directly
      val q = IncrementalIngest.stationWatermarks(spark, in)
        .writeStream.outputMode("update")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[IncrementalIngest.StationProgress], _: Long) =>
          batch.write.mode(SaveMode.Append).parquet(progressDir); ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
      // latest progress row per station
      spark.read.parquet(progressDir)
        .groupBy(col("station"))
        .agg(max(col("max_date_time")), max(col("total_samples")))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    }
    val first = run()
    val d1Start = d1.atStartOfDay(java.time.ZoneOffset.UTC).toEpochSecond
    assert(first("stA") === (d1Start + 287 * 300L, 288L))
    assert(first("stB") === (d1Start + 99 * 300L, 100L))

    // restart with more data: state (cumulative counts, running max)
    // must carry over through the checkpointed state store
    spark.sql("DROP TABLE IF EXISTS station_wm")
    writeDay(in, "stB", d2, 50)
    val second = run()
    assert(second("stB") ===
      (d2.atStartOfDay(java.time.ZoneOffset.UTC).toEpochSecond + 49 * 300L, 150L),
      "stB state did not accumulate across restart")
    assert(!second.contains("stA") || second("stA")._2 === 288L)
  }

  test("replayed files dedup within the watermark (bounded state)") {
    val in = Files.createTempDirectory("graft-stream-dedup-in").toString
    val out = Files.createTempDirectory("graft-stream-dedup-out").toString
    val ckpt = Files.createTempDirectory("graft-stream-dedup-ckpt").toString
    // the same day delivered twice (wview replay after downtime)
    writeDay(in, "stA", d1, 288)
    writeDay(in, "stA", d1, 288)

    val q = IncrementalIngest.archiveWriter(
      IncrementalIngest.dedupedSource(spark, in), out, ckpt).start()
    q.awaitTermination()
    val n = spark.read.parquet(out).count()
    assert(n === 288, s"replayed rows must dedup: got $n")
  }

  test("streaming progress publishes Prometheus gauges atomically") {
    val in = Files.createTempDirectory("graft-stream-prom-in").toString
    val out = Files.createTempDirectory("graft-stream-prom-out").toString
    val ckpt = Files.createTempDirectory("graft-stream-prom-ckpt").toString
    val prom = s"${Files.createTempDirectory("graft-prom")}/stream.prom"
    writeDay(in, "stA", d1, 288)

    val listener = new graft.streaming.StreamingPromListener(prom)
    spark.streams.addListener(listener)
    try {
      val q = IncrementalIngest.archiveWriter(
        IncrementalIngest.source(spark, in), out, ckpt).start()
      q.awaitTermination()
      // listener bus is async; progress events land shortly after
      val deadline = System.nanoTime + 10e9.toLong
      var text = ""
      // wait for a SAMPLE line (the TYPE header appears before any
      // progress event has been delivered on the async bus)
      while (!text.contains("graft_stream_input_rows{query=\"") && System.nanoTime < deadline) {
        Thread.sleep(100)
        if (Files.exists(java.nio.file.Paths.get(prom)))
          text = Files.readString(java.nio.file.Paths.get(prom))
      }
      assert(text.contains("""graft_stream_input_rows{query="""),
        s"missing input-rows gauge in:\n$text")
      assert(text.contains("graft_stream_batch_id"))
      assert(text.contains("# TYPE graft_stream_active gauge"))
      // Prometheus text format: every family's lines must be ONE
      // contiguous group after its TYPE header — no metric name may
      // appear once another family's lines have started
      val familyOf = (line: String) =>
        if (line.startsWith("# TYPE ")) line.split(" ")(2)
        else line.takeWhile(c => c != '{' && c != ' ')
      val seqs = text.linesIterator.filter(_.nonEmpty).map(familyOf).toSeq
      val firstLast = seqs.zipWithIndex.groupBy(_._1).values.map(g =>
        (g.head._1, g.map(_._2).min, g.map(_._2).max))
      firstLast.foreach { case (fam, lo, hi) =>
        assert(seqs.slice(lo, hi + 1).forall(_ == fam),
          s"family $fam interleaved with others in:\n$text")
      }
    } finally spark.streams.removeListener(listener)
  }

  test("watermarked stream-stream join bounds state and matches batch join") {
    import org.apache.spark.sql.types._
    val root = Files.createTempDirectory("graft-ss-join").toString
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("event_id", LongType),
      StructField("ts_sec", LongType)))
    val base = d1.atStartOfDay(java.time.ZoneOffset.UTC).toEpochSecond
    // purchases at :10 and :90 min; signups at :00 and :60 min
    val purchases = Seq((1L, 100L, base + 600), (1L, 101L, base + 5400), (2L, 102L, base + 600))
    val signups = Seq((1L, 200L, base), (1L, 201L, base + 3600), (2L, 202L, base + 7200))
    def write(dir: String, rows: Seq[(Long, Long, Long)]): Unit =
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map(r =>
          org.apache.spark.sql.Row(r._1, r._2, r._3)), 1), schema)
        .write.mode(SaveMode.Append).parquet(dir)
    write(s"$root/purchases", purchases)
    write(s"$root/signups", signups)

    def stream(dir: String): org.apache.spark.sql.DataFrame =
      spark.readStream.schema(schema).parquet(dir)
        .withColumn("ts", timestamp_seconds(col("ts_sec")))

    val joined = IncrementalIngest.streamStreamJoin(
        stream(s"$root/purchases"), stream(s"$root/signups"),
        key = "user_id", horizon = "1 HOUR")
      .select(col("l.event_id").as("purchase_id"), col("r.event_id").as("signup_id"))
    val q = joined.writeStream.format("memory").queryName("ss_join")
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.sql("SELECT purchase_id, signup_id FROM ss_join")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // expected: purchase 100 (t+10m) joins signup 200 (t+0) within 1h;
    // purchase 101 (t+90m) joins 201 (t+60m) AND NOT 200 (>1h before);
    // purchase 102 has no preceding signup for user 2 (202 is later)
    assert(got === Set((100L, 200L), (101L, 201L)))
  }

  test("streaming archive matches batch archive on the same two-station input") {
    val root = Files.createTempDirectory("graft-stream-eq").toString
    for (st <- Seq("stA", "stB"); day <- Seq(d1, d2))
      writeDay(root + "/in", st, day, 288)

    // batch path (ArchiveJob over the same station dirs)
    val cfg = ArchiveJob.JobConfig(
      statePath = s"$root/state", archivePath = s"$root/batch_archive",
      instrument = "eq",
      stations = Seq(
        ArchiveJob.StationSource("stA", s"$root/in/stA"),
        ArchiveJob.StationSource("stB", s"$root/in/stB")))
    ArchiveJob.resetState(spark, cfg, None, force = false)
    assert(ArchiveJob.run(spark, cfg, today = d2.plusDays(1), force = true).daysWritten === 2)

    // streaming path
    val q = IncrementalIngest.archiveWriter(
      IncrementalIngest.source(spark, s"$root/in"), s"$root/stream_archive",
      s"$root/ckpt").start()
    q.awaitTermination()

    val cols = Seq("day", "station", "dateTime", "usUnits") ++ WviewSchema.sensorNames
    val batchRows = spark.read.parquet(s"$root/batch_archive")
      .select(cols.map(col): _*).orderBy(cols.map(col): _*).collect()
    val streamRows = spark.read.parquet(s"$root/stream_archive")
      .select(cols.map(col): _*).orderBy(cols.map(col): _*).collect()
    assert(batchRows.length === 4 * 288)
    assert(batchRows.map(_.toString).toSeq === streamRows.map(_.toString).toSeq)
  }

  test("streaming incremental dedup: micro-batches checked against the persisted index, exactly-once") {
    import graft.operators.Dedup
    val root = Files.createTempDirectory("graft-sdedup").toString
    val (idx, in, flags, ckpt) =
      (s"$root/idx", s"$root/in", s"$root/flags", s"$root/ckpt")
    Dedup.writeDedupIndex(spark, sf, idx)
    val corpus = Tables.documents(spark, sf)
      .filter(col("doc_id") % 10 =!= 0).select("doc_id", "text")
      .orderBy("doc_id").limit(2).collect()

    def writeDocs(docs: Seq[(Long, String)]): Unit = {
      import spark.implicits._
      docs.toDF("doc_id", "text").repartition(1)
        .write.mode(SaveMode.Append).parquet(in)
    }
    def runStream(): Unit = {
      val q = IncrementalIngest.dedupFlagsWriter(
        IncrementalIngest.documentsSource(spark, in), idx, flags, ckpt).start()
      q.awaitTermination()
    }

    // batch 1: one verbatim replay of a corpus doc + one novel doc
    writeDocs(Seq(
      (1000001L, corpus(0).getString(1)),
      (1000002L, "zzqa zzqb zzqc zzqd zzqe")))
    runStream()
    val f1 = spark.read.parquet(flags).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(f1.size === 2)
    assert(f1(1000001L).getBoolean(1), "replayed doc must flag as dup")
    assert(f1(1000001L).getDouble(3) === 1.0, "verbatim replay: jaccard 1.0")
    assert(!f1(1000002L).getBoolean(1) && f1(1000002L).isNullAt(2),
      "novel doc must pass clean")

    // batch 2 through a RESTARTED stream on the same checkpoint: only
    // the new file is processed, batch 1's flags are untouched
    writeDocs(Seq(
      (1000003L, corpus(1).getString(1)),
      (1000004L, "qqzx qqzy qqzz qqzw qqzv")))
    runStream()
    val f2 = spark.read.parquet(flags)
    assert(f2.count() === 4)
    assert(f2.select("batch_id").distinct().count() === 2)
    val m2 = f2.collect().map(r => r.getLong(0) -> r).toMap
    assert(m2(1000003L).getBoolean(1) && m2(1000003L).getDouble(3) === 1.0)
    assert(!m2(1000004L).getBoolean(1))
    assert(m2(1000001L).toString === f1(1000001L).toString, "batch-1 flag unchanged")

    // a third run with no new data changes nothing — exactly-once
    runStream()
    assert(spark.read.parquet(flags).count() === 4)

    // dispatch identity: a batch forced through the cross-side banded
    // path is row-identical to the broadcast steady-state path
    import spark.implicits._
    val probe = Seq((1000001L, corpus(0).getString(1)),
      (1000002L, "zzqa zzqb zzqc zzqd zzqe")).toDF("doc_id", "text")
    val broad = Dedup.batchDedupIndexed(spark, idx, probe)
    val banded = Dedup.batchDedupIndexed(spark, idx, probe, maxBroadcastBatch = 0)
    assert(broad.collect().map(_.toString).toSeq ===
      banded.collect().map(_.toString).toSeq)
    assert(broad.count() > 0)
  }

  test("change-feed stream: appends + DV deletes flow, compaction invisible, no-op replay lands nothing") {
    import graft.operators.CommitLog
    import spark.implicits._
    val t = Files.createTempDirectory("graft_cdc_src_").toString
    val out = Files.createTempDirectory("graft_cdc_out_").toString
    val ckpt = Files.createTempDirectory("graft_cdc_ckpt_").toString
    try {
      CommitLog.append(spark, t,
        Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "s").coalesce(1)) // v0

      def runOnce(): Unit = {
        val q = spark.readStream.format("graft-changes")
          .option("startingVersion", "0")
          .load(t)
          .writeStream.outputMode("append")
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .format("parquet").option("path", out)
          .start()
        assert(q.awaitTermination(120000), "change stream did not finish")
      }

      runOnce()
      val first = spark.read.parquet(out)
      assert(first.count() === 3)
      assert(first.select("_change_type").distinct().collect()
        .map(_.getString(0)).toSeq === Seq("insert"))
      assert(first.select("_commit_version").distinct().collect()
        .map(_.getLong(0)).toSeq === Seq(0L))
      assert(first.orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
        === Seq((1L, "a"), (2L, "b"), (3L, "c")))

      CommitLog.append(spark, t, Seq((4L, "d")).toDF("id", "s").coalesce(1)) // v1
      CommitLog.delete(spark, t, "id = 2")                                    // v2 (DV)
      CommitLog.compact(spark, t, targetFiles = 1)                            // v3 dataChange=false

      runOnce()
      val second = spark.read.parquet(out)
      assert(second.count() === 5, "expected exactly the v1 insert and the v2 DV delete")
      val news = second.filter(col("_commit_version") > 0)
        .orderBy("_commit_version").collect()
        .map(r => (r.getLong(0), r.getString(2), r.getLong(3)))
      assert(news.toSeq === Seq((4L, "insert", 1L), (2L, "delete", 2L)),
        s"got ${news.toSeq}")

      // nothing new: the replayed trigger plans zero slices
      runOnce()
      assert(spark.read.parquet(out).count() === 5, "no-op trigger must land nothing")
    } finally {
      Seq(t, out, ckpt).foreach(p =>
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p)))
    }
  }

  test("change-feed stream carries array columns (the embeddings medallion shape)") {
    import graft.operators.CommitLog
    import spark.implicits._
    val t = Files.createTempDirectory("graft_cdc_arr_").toString
    val out = Files.createTempDirectory("graft_cdc_arrout_").toString
    val ckpt = Files.createTempDirectory("graft_cdc_arrckpt_").toString
    try {
      CommitLog.append(spark, t,
        Seq((1L, Array(0.5f, -1.25f, 3.0f), Seq("a", "b")),
            (2L, Array(2.0f, 0.0f, -0.5f), Seq.empty[String]))
          .toDF("vec_id", "embedding", "tags").coalesce(1))
      val q = spark.readStream.format("graft-changes")
        .option("startingVersion", "0")
        .load(t)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .format("parquet").option("path", out)
        .start()
      assert(q.awaitTermination(120000), "array stream did not finish")
      val got = spark.read.parquet(out).orderBy("vec_id").collect()
      assert(got.length === 2)
      assert(got(0).getSeq[Float](1) === Seq(0.5f, -1.25f, 3.0f))
      assert(got(0).getSeq[String](2) === Seq("a", "b"))
      assert(got(1).getSeq[Float](1) === Seq(2.0f, 0.0f, -0.5f))
      assert(got(1).getSeq[String](2) === Seq.empty)
      assert(got.forall(_.getString(3) === "insert"))
    } finally {
      Seq(t, out, ckpt).foreach(p =>
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p)))
    }
  }

  test("change-feed stream -> commit-log sink is exactly-once under full re-delivery") {
    import graft.operators.CommitLog
    import spark.implicits._
    val bronze = Files.createTempDirectory("graft_cdc_bronze_").toString
    val silver = Files.createTempDirectory("graft_cdc_silver_").toString
    try {
      CommitLog.append(spark, bronze, Seq((1L, "a"), (2L, "b")).toDF("id", "s").coalesce(1)) // v0
      CommitLog.append(spark, bronze, Seq((3L, "c")).toDF("id", "s").coalesce(1))            // v1

      // batchId = the batch's max _commit_version: deterministic across
      // re-deliveries, so the destination ledger recognizes replays even
      // from a FRESH engine checkpoint
      def runOnce(): Unit = {
        val q = spark.readStream.format("graft-changes")
          .option("startingVersion", "0")
          .load(bronze)
          .writeStream
          .option("checkpointLocation",
            Files.createTempDirectory("graft_cdc_sckpt_").toString) // fresh: force re-delivery
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
            val inserts = df.filter(col("_change_type") === "insert")
            if (!inserts.isEmpty) {
              val srcV = inserts.agg(max(col("_commit_version"))).head.getLong(0)
              CommitLog.appendStream(spark, silver,
                inserts.drop("_change_type", "_commit_version"), batchId = srcV)
              ()
            }
          }
          .start()
        assert(q.awaitTermination(120000), "sink stream did not finish")
      }

      runOnce()
      assert(CommitLog.read(spark, silver).count() === 3)
      // full re-delivery (fresh checkpoint): the ledger refuses the replay
      runOnce()
      assert(CommitLog.read(spark, silver).count() === 3,
        "re-delivered batch landed twice — ledger did not recognize the replay")
    } finally {
      Seq(bronze, silver).foreach(p =>
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p)))
    }
  }

  test("streaming document triage: routed text extraction per micro-batch, exactly-once") {
    import graft.operators.{CommitLog, Multimodal}
    val in = Files.createTempDirectory("graft_doc_in_").toString
    val table = Files.createTempDirectory("graft_doc_triage_").toString
    try {
      // input = the mixed document corpus (PDF + the five PK kinds)
      // re-landed as a streaming (doc_id, payload) drop dir
      spark.read.parquet(s"${Multimodal.mediaFixturePath(spark, sf)}/docmix")
        .withColumnRenamed("docmix", "payload")
        .coalesce(1).write.mode("overwrite").parquet(in)
      val ckpt = Files.createTempDirectory("graft_doc_ckpt_").toString
      def runOnce(cp: String): Unit = {
        val q = graft.streaming.IncrementalIngest.docTriageWriter(
          graft.streaming.IncrementalIngest.mediaSource(spark, in), table, cp)
          .start()
        assert(q.awaitTermination(120000), "doc triage stream did not finish")
      }
      runOnce(ckpt)
      // streamed == batch, the shared-projection pin
      val want = Multimodal.docTriage(spark, sf).collect()
        .map(_.toString).sorted
      val got = CommitLog.read(spark, table).collect().map(_.toString).sorted
      assert(got.length === want.length, s"${got.length} vs ${want.length}")
      assert(got === want, "streamed doc triage diverges from the batch query")
      // the kind='other' bucket (unrecognized payloads) is accounted
      // for in BOTH sides — a decline is a counted row, never a drop
      assert(CommitLog.read(spark, table)
        .filter(org.apache.spark.sql.functions.col("kind") === "other")
        .count() > 0, "the 'other' bucket vanished from the streamed triage")
      // the plain-text tier serves in the stream too (the even %119
      // rows: BOM-sniffed strict decode, text present)
      assert(CommitLog.read(spark, table)
        .filter(org.apache.spark.sql.functions.col("kind") === "txt" &&
          org.apache.spark.sql.functions.col("text").isNotNull)
        .count() > 0, "the 'txt' tier vanished from the streamed triage")
      // fresh checkpoint (full re-delivery): the ledger lands nothing
      runOnce(Files.createTempDirectory("graft_doc_ckpt2_").toString)
      assert(CommitLog.read(spark, table).count() === want.length,
        "re-delivered doc batch landed twice")
    } finally {
      Seq(in, table).foreach(p =>
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p)))
    }
  }

  test("streaming media triage: full-family dispatch per micro-batch, exactly-once") {
    import graft.operators.{CommitLog, Multimodal}
    val in = Files.createTempDirectory("graft_media_in_").toString
    val table = Files.createTempDirectory("graft_media_triage_").toString
    try {
      // input = the mixed 8-format fixture re-landed as a streaming
      // (doc_id, payload) drop dir
      spark.read.parquet(s"${Multimodal.mediaFixturePath(spark, sf)}/mixed")
        .withColumnRenamed("mixed", "payload")
        .coalesce(1).write.mode("overwrite").parquet(in)
      val ckpt = Files.createTempDirectory("graft_media_ckpt_").toString
      def runOnce(cp: String): Unit = {
        val q = graft.streaming.IncrementalIngest.mediaTriageWriter(
          graft.streaming.IncrementalIngest.mediaSource(spark, in), table, cp)
          .start()
        assert(q.awaitTermination(120000), "media triage stream did not finish")
      }
      runOnce(ckpt)
      // the streamed table equals the batch dispatch row-for-row
      val want = Multimodal.dispatchAll(spark, sf).collect()
        .map(_.toString).sorted
      val got = CommitLog.read(spark, table).collect().map(_.toString).sorted
      assert(got.length === want.length, s"${got.length} vs ${want.length}")
      assert(got === want, "streamed triage diverges from the batch dispatch")
      // same checkpoint: nothing new to process
      runOnce(ckpt)
      assert(CommitLog.read(spark, table).count() === want.length)
      // FRESH checkpoint (full re-delivery): the batchId ledger
      // recognizes the replay and lands nothing
      runOnce(Files.createTempDirectory("graft_media_ckpt2_").toString)
      assert(CommitLog.read(spark, table).count() === want.length,
        "re-delivered media batch landed twice")
    } finally {
      Seq(in, table).foreach(p =>
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p)))
    }
  }

  test("streaming search-index maintenance: postings segments commit exactly-once with blooms") {
    import graft.operators.CommitLog
    val root = Files.createTempDirectory("graft-ssearch").toString
    val (in, idx, ckpt) = (s"$root/in", s"$root/idx", s"$root/ckpt")
    def writeDocs(docs: Seq[(Long, String)]): Unit = {
      import spark.implicits._
      docs.toDF("doc_id", "text").repartition(1)
        .write.mode(SaveMode.Append).parquet(in)
    }
    def runStream(): Unit = {
      val q = IncrementalIngest.searchIndexWriter(
        IncrementalIngest.documentsSource(spark, in), idx, ckpt).start()
      q.awaitTermination()
    }
    def andSearch(terms: Seq[String]): Set[Long] =
      terms.map(t => CommitLog.scanEquals(spark, idx, "token", t))
        .reduce(_ unionAll _)
        .groupBy(col("doc_id"))
        .agg(countDistinct(col("token")).as("n"))
        .filter(col("n") === terms.size)
        .collect().map(_.getLong(0)).toSet
    try {
      writeDocs((0L until 20L).map(i => (i, s"alpha beta w${i % 5}")))
      runStream()
      val v1 = CommitLog.latestVersion(spark, idx)
      // keyword search over the streamed index sees every arrived doc
      assert(andSearch(Seq("alpha", "w3")) === Set(3L, 8L, 13L, 18L))
      // second arrival: only new docs index; a new commit lands
      writeDocs(Seq((100L, "alpha beta w3 gamma")))
      runStream()
      assert(CommitLog.latestVersion(spark, idx) > v1)
      assert(andSearch(Seq("alpha", "w3")) === Set(3L, 8L, 13L, 18L, 100L))
      assert(andSearch(Seq("gamma", "beta")) === Set(100L))
      // exactly-once: re-delivering a committed batch lands nothing
      import spark.implicits._
      val ids = CommitLog.committedBatchIds(spark, idx)
      val n0 = CommitLog.read(spark, idx).count()
      val replay = CommitLog.appendStream(spark, idx,
        Seq(("phantom", 999L, 1L)).toDF("token", "doc_id", "tf"),
        ids.head, bloomCols = Seq("token"))
      assert(replay.isEmpty && CommitLog.read(spark, idx).count() === n0)
      // every streamed segment carries its token bloom: a term that no
      // segment contains prunes ALL files driver-side (empty scan)
      assert(andSearch(Seq("zeta")) === Set.empty)
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    }
  }

  test("full streaming index maintenance: phrase + BM25 serve the arrived corpus") {
    import graft.operators.{CommitLog, Search}
    val root = Files.createTempDirectory("graft-fsearch").toString
    val (in, idx, pos, norms, ckpt) =
      (s"$root/in", s"$root/idx", s"$root/pos", s"$root/norms", s"$root/ckpt")
    def writeDocs(docs: Seq[(Long, String)]): Unit = {
      import spark.implicits._
      docs.toDF("doc_id", "text").repartition(1)
        .write.mode(SaveMode.Append).parquet(in)
    }
    def runStream(): Unit = {
      val q = IncrementalIngest.searchIndexFullWriter(
        IncrementalIngest.documentsSource(spark, in), idx, pos, norms, ckpt).start()
      q.awaitTermination()
    }
    try {
      writeDocs(Seq(
        (1L, "big order scan runs fast"),
        (2L, "the big order scan again big order scan"),
        (3L, "no phrase here order big scan")))
      runStream()
      // phrase over the STREAMED positional table: docs 1 and 2 match
      // "big order scan" (doc 2 twice); doc 3 has the words, not the phrase
      val hits = Search.phraseFromIndex(spark, pos, Seq("big", "order", "scan"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(hits === Map(1L -> 1L, 2L -> 2L))
      // BM25 over the STREAMED index + norms: every doc containing any
      // term scores; the doc repeating the terms with similar length
      // outranks
      val ranked = Search.bm25FromIndex(spark, idx, norms, Seq("big", "order"))
        .collect()
      assert(ranked.map(_.getLong(0)).toSet === Set(1L, 2L, 3L))
      assert(ranked.head.getLong(0) === 2L, "tf-heavy doc must rank first")
      // second arrival updates all three artifacts; the phrase answer grows
      writeDocs(Seq((10L, "big order scan")))
      runStream()
      val hits2 = Search.phraseFromIndex(spark, pos, Seq("big", "order", "scan"))
        .collect().map(_.getLong(0)).toSet
      assert(hits2 === Set(1L, 2L, 10L))
      // the three tables committed under the same batch ids (ledger
      // parity: a crash between commits replays only the missing side)
      val ids = Seq(idx, pos, norms).map(CommitLog.committedBatchIds(spark, _).toSet)
      assert(ids.distinct.size === 1, s"batch ledgers diverged: $ids")
      // norms zones carry doc_id extents (streamed segments publish
      // stats like batch ones)
      val normRows = CommitLog.read(spark, norms).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(normRows(2L) === 8L && normRows(10L) === 3L)
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    }
  }

  test("search-index transaction: a crash between child commits is never servable") {
    import graft.operators.{CommitLog, Search}
    val root = Files.createTempDirectory("graft-txnsearch").toString
    val (in, idx, pos, norms, man, ckpt) =
      (s"$root/in", s"$root/idx", s"$root/pos", s"$root/norms",
        s"$root/man", s"$root/ckpt")
    def writeDocs(docs: Seq[(Long, String)]): Unit = {
      import spark.implicits._
      docs.toDF("doc_id", "text").repartition(1)
        .write.mode(SaveMode.Append).parquet(in)
    }
    def runStream(): Unit = {
      val q = IncrementalIngest.searchIndexFullWriter(
        IncrementalIngest.documentsSource(spark, in), idx, pos, norms, ckpt,
        manifestDir = Some(man)).start()
      q.awaitTermination()
    }
    val phrase = Seq("big", "order", "scan")
    def phraseDocs() = Search.phrasePinned(spark, man, pos, phrase)
      .collect().map(_.getLong(0)).toSet
    def bm25Docs() = Search.bm25Pinned(spark, man, idx, norms, Seq("big", "order"))
      .collect().map(_.getLong(0)).toSet
    def andDocs() = Search.andPinned(spark, man, idx, Seq("big", "order"))
      .collect().map(_.getLong(0)).toSet
    try {
      // before any transaction: pinned serving refuses loudly
      intercept[IllegalStateException](phraseDocs())
      // trigger 0: a complete transaction
      writeDocs(Seq(
        (1L, "big order scan runs fast"),
        (2L, "the big order scan again big order scan"),
        (3L, "no phrase here order big scan")))
      runStream()
      assert(phraseDocs() === Set(1L, 2L))
      assert(bm25Docs() === Set(1L, 2L, 3L) && andDocs() === Set(1L, 2L, 3L))

      // trigger 1 dies mid-transaction: the docs arrived, and the
      // norms + positions children committed under batchId 1, but the
      // index child and the PARENT MANIFEST never landed (exactly the
      // crash window the parent commit exists for)
      val newDocs = Seq((10L, "big order scan"))
      writeDocs(newDocs)
      import spark.implicits._
      val positions1 = newDocs.toDF("doc_id", "text")
        .select(org.apache.spark.sql.functions.col("doc_id"),
          org.apache.spark.sql.functions.posexplode(
            graft.functions.TextFunctions.tokens(
              org.apache.spark.sql.functions.col("text"))))
        .select(org.apache.spark.sql.functions.col("doc_id"),
          org.apache.spark.sql.functions.col("col").as("token"),
          (org.apache.spark.sql.functions.col("pos") + 1).cast("long").as("pos"))
      val norms1 = positions1.groupBy("doc_id")
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).cast("long").as("dl"))
      // the crash simulation commits AS the writer (same identity the
      // replay will carry) — a bare commit would model a different
      // co-writer, whose entries no longer suppress the writer's epochs
      val wid = (t: String) =>
        Some(graft.streaming.IncrementalIngest.appId("searchIndexFull", t))
      assert(CommitLog.appendStream(spark, norms, norms1, 1L,
        statsCols = Seq("doc_id"), app = wid(norms)).isDefined)
      assert(CommitLog.appendStream(spark, pos, positions1, 1L,
        bloomCols = Seq("token"), app = wid(pos)).isDefined)

      // an UNPINNED read of the positions table already sees the
      // half-landed trigger — this is the window
      assert(Search.phraseFromIndex(spark, pos, phrase)
        .collect().map(_.getLong(0)).toSet === Set(1L, 2L, 10L))
      // every PINNED serving path still answers from the complete
      // transaction: no partial trigger is ever servable
      assert(phraseDocs() === Set(1L, 2L), "partial batch leaked into phrase")
      assert(bm25Docs() === Set(1L, 2L, 3L), "partial batch leaked into BM25")
      assert(andDocs() === Set(1L, 2L, 3L), "partial batch leaked into AND")

      // the replay completes the transaction: the two committed
      // children no-op through their ledgers (versionForBatchId
      // recovers their versions for the manifest), the index child and
      // the parent land, and the trigger becomes visible atomically
      runStream()
      assert(phraseDocs() === Set(1L, 2L, 10L))
      assert(bm25Docs() === Set(1L, 2L, 3L, 10L) && andDocs() === Set(1L, 2L, 3L, 10L))
      // ledger parity held throughout — including the parent's
      val ids = Seq(idx, pos, norms, man).map(CommitLog.committedBatchIds(spark, _))
      assert(ids.forall(_ === Set(0L, 1L)), s"ledgers diverged: $ids")
      // no child committed twice for the replayed batch
      assert(CommitLog.read(spark, norms).filter("doc_id = 10").count() === 1)
      // ONE manifest resolve per pinned query: a second txnPins read
      // inside bm25Pinned could pin index at txn N and norms at N+1 if
      // a writer committed in between — the exact mixed state the
      // manifest prevents. Pin the count so the single-resolve
      // contract cannot silently regress.
      CommitLog.txnResolves.set(0)
      bm25Docs()
      assert(CommitLog.txnResolves.get() === 1L,
        s"bm25Pinned resolved the manifest ${CommitLog.txnResolves.get()} times; " +
          "both roles must come from ONE txnPins snapshot")

      // the THIRD crash window: ALL children commit but the parent
      // manifest never lands — the transaction is complete on disk yet
      // must stay INVISIBLE to pinned serving until the replay
      // publishes the parent (visibility is the manifest's, not the
      // children's)
      val encore = Seq((20L, "big order scan encore"))
      writeDocs(encore)
      val positions2 = encore.toDF("doc_id", "text")
        .select(org.apache.spark.sql.functions.col("doc_id"),
          org.apache.spark.sql.functions.posexplode(
            graft.functions.TextFunctions.tokens(
              org.apache.spark.sql.functions.col("text"))))
        .select(org.apache.spark.sql.functions.col("doc_id"),
          org.apache.spark.sql.functions.col("col").as("token"),
          (org.apache.spark.sql.functions.col("pos") + 1).cast("long").as("pos"))
      val postings2 = positions2.groupBy("token", "doc_id")
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("tf"))
      val norms2 = postings2.groupBy("doc_id")
        .agg(org.apache.spark.sql.functions.sum(
          org.apache.spark.sql.functions.col("tf")).cast("long").as("dl"))
      assert(CommitLog.appendStream(spark, norms, norms2, 2L,
        statsCols = Seq("doc_id"), app = wid(norms)).isDefined)
      assert(CommitLog.appendStream(spark, pos, positions2, 2L,
        bloomCols = Seq("token"), app = wid(pos)).isDefined)
      assert(CommitLog.appendStream(spark, idx, postings2, 2L,
        bloomCols = Seq("token"), app = wid(idx)).isDefined)
      assert(phraseDocs() === Set(1L, 2L, 10L),
        "fully-committed-but-unpublished transaction leaked into phrase")
      assert(bm25Docs() === Set(1L, 2L, 3L, 10L),
        "fully-committed-but-unpublished transaction leaked into BM25")
      // replay: all three children no-op through their ledgers, the
      // parent lands, doc 20 becomes visible atomically
      runStream()
      assert(phraseDocs() === Set(1L, 2L, 10L, 20L))
      assert(bm25Docs() === Set(1L, 2L, 3L, 10L, 20L))
      assert(CommitLog.read(spark, norms).filter("doc_id = 20").count() === 1)
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    }
  }

  test("quarantine writer routes constraint violators to the dead-letter table") {
    import graft.operators.CommitLog
    val root = Files.createTempDirectory("graft-dlq").toString
    val (in, main, dlq, ckpt) = (s"$root/in", s"$root/main", s"$root/dlq", s"$root/ckpt")
    try {
      import spark.implicits._
      // seed + constraints on the main table
      CommitLog.append(spark, main, Seq((0L, 0.5)).toDF("id", "score"))
      CommitLog.addConstraint(spark, main, "score_unit", "score >= 0 AND score <= 1")
      CommitLog.addConstraint(spark, main, "id_positive", "id >= 0")
      // dirty feed: 2 valid, 1 score violation, 1 violating BOTH rules
      // (alphabetically-first rule name must win), 1 NULL score (SQL
      // CHECK: NULL passes)
      Seq((1L, 0.9), (2L, 0.1), (3L, 1.5), (-4L, 9.0))
        .toDF("id", "score")
        .union(Seq(5L).toDF("id").select(col("id"), lit(null).cast("double").as("score")))
        .repartition(1).write.parquet(in)
      val q = IncrementalIngest.quarantineWriter(
        spark.readStream.schema("id LONG, score DOUBLE").parquet(in),
        main, dlq, ckpt).start()
      q.awaitTermination()

      val mainIds = CommitLog.read(spark, main).select("id")
        .collect().map(_.getLong(0)).toSet
      assert(mainIds === Set(0L, 1L, 2L, 5L), s"main table: $mainIds")
      val bad = CommitLog.read(spark, dlq)
        .collect().map(r => r.getAs[Long]("id") -> r.getAs[String]("_violated")).toMap
      assert(bad === Map(3L -> "score_unit", -4L -> "id_positive"))
      // replay of a committed batch lands nothing on either side
      val ids = CommitLog.committedBatchIds(spark, main)
      val (n1, n2) = (CommitLog.read(spark, main).count(), CommitLog.read(spark, dlq).count())
      IncrementalIngest.quarantineWriter(
        spark.readStream.schema("id LONG, score DOUBLE").parquet(in),
        main, dlq, s"$root/ckpt2") // fresh checkpoint: engine re-delivers
      assert(CommitLog.appendStream(spark, main,
        Seq((99L, 0.2)).toDF("id", "score"), ids.head).isEmpty)
      assert(CommitLog.read(spark, main).count() === n1)
      assert(CommitLog.read(spark, dlq).count() === n2)
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    }
  }
}
