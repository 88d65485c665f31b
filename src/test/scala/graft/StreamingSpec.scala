package graft

import java.nio.file.Files
import java.time.LocalDate

import org.apache.spark.sql.{Row, SaveMode}
import org.apache.spark.sql.functions._
import graft.pipeline.WviewSchema
import graft.streaming.IncrementalIngest

/** Streaming incremental mode: file-source discovery, watermarked daily
  * windows in append mode, foreachBatch partitioned sink, checkpoint
  * resume. */
class StreamingSpec extends SparkSpec {

  private val d1 = LocalDate.of(2024, 3, 1)
  private val d2 = LocalDate.of(2024, 3, 2)

  private def dayRows(day: LocalDate, n: Int): Seq[Row] = {
    val start = day.atStartOfDay(java.time.ZoneOffset.UTC).toEpochSecond
    (0 until n).map { i =>
      Row.fromSeq((start + i * 300L).asInstanceOf[Any] :: 1 ::
        WviewSchema.sensorNames.map(_ => 50.0: Any).toList)
    }
  }

  private def writeDay(dir: String, day: LocalDate, n: Int, part: Int): Unit =
    spark.createDataFrame(spark.sparkContext.parallelize(dayRows(day, n), 1),
        WviewSchema.schema)
      .write.mode(SaveMode.Append).parquet(dir)

  test("watermarked daily window emits only closed days (append mode)") {
    val in = Files.createTempDirectory("graft-stream-in").toString
    writeDay(in, d1, 288, 0)
    writeDay(in, d2, 100, 1) // d2 still "open" — max ts is mid-day d2

    val q = IncrementalIngest.startDailyCountsToMemory(spark, in, "daily_counts")
    q.processAllAvailable()
    // after batch 1 the watermark (max ts - 1 day) is inside d1, so
    // nothing has closed yet — the S17 late-data policy in action
    assert(spark.sql("SELECT * FROM daily_counts").count() === 0)

    // a later file (d3) advances the watermark past d1's window end;
    // d1 flushes, d2 (still within the late horizon) does not
    writeDay(in, d2.plusDays(1), 288, 2)
    q.processAllAvailable()
    val rows = spark.sql("SELECT day, n_samples FROM daily_counts ORDER BY day").collect()
    q.stop()
    assert(rows.map(r => (r.getDate(0).toString, r.getLong(1))).toSeq
      === Seq(("2024-03-01", 288L)))
  }

  test("foreachBatch archive sink writes day partitions; checkpoint resumes") {
    val in = Files.createTempDirectory("graft-stream-in2").toString
    val out = Files.createTempDirectory("graft-stream-out").toString
    val ckpt = Files.createTempDirectory("graft-stream-ckpt").toString
    writeDay(in, d1, 288, 0)

    val q1 = IncrementalIngest.archiveWriter(
      IncrementalIngest.source(spark, in), out, ckpt).start()
    q1.awaitTermination()
    assert(Files.exists(java.nio.file.Paths.get(s"$out/month=202403/day=20240301")))
    val n1 = spark.read.parquet(out).count()
    assert(n1 === 288)

    // new file arrives; restart from checkpoint — only the new data runs
    writeDay(in, d2, 50, 1)
    val q2 = IncrementalIngest.archiveWriter(
      IncrementalIngest.source(spark, in), out, ckpt).start()
    q2.awaitTermination()
    val byDay = spark.read.parquet(out).groupBy("day").count()
      .collect().map(r => r.get(0).toString -> r.getLong(1)).toMap
    assert(byDay === Map("20240301" -> 288L, "20240302" -> 50L))

    // converted values present (50F -> 10C for temperature sensors)
    val temps = spark.read.parquet(out)
      .filter(col("day") === "20240301").select("outTemp").distinct().collect()
    assert(temps.length === 1 && math.abs(temps(0).getDouble(0) - 10.0) < 1e-9)
  }
}
