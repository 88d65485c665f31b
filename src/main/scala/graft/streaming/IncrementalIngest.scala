package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.Row

import graft.pipeline.{ArchiveJob, WviewSchema}

/** Phase 4 — the reference's incremental semantics (SURVEY §2 S15/S17)
  * re-expressed as Structured Streaming:
  *
  *  - the file source discovers new station files — the streaming
  *    analog of "resume where the last run left off"; the checkpoint
  *    directory *is* the state file (S15), maintained exactly-once by
  *    Spark instead of hand-rolled YYYYMMDD text;
  *  - `withWatermark("ts", "1 day")` + a tumbling daily window in
  *    append mode emits a day only after the watermark passes its end —
  *    the declarative form of the reference's "refuse to emit until
  *    yesterday is complete / wait for late replays" policy (S17,
  *    README.md:14-19). A shorter watermark is the `--force` analog;
  *  - `foreachBatch` drives the same idempotent day-partitioned parquet
  *    sink as the batch job (S14), so batch and streaming mode share
  *    one storage layout.
  */
object IncrementalIngest {

  /** Streaming source over a directory of wview-schema parquet files,
    * with event-time + station columns prepared. */
  def source(spark: SparkSession, inputDir: String): DataFrame =
    spark.readStream
      .schema(WviewSchema.schema)
      .option("maxFilesPerTrigger", "16")
      .parquet(inputDir)
      .withColumn("ts", timestamp_seconds(col("dateTime")))

  /** Daily completeness aggregation (S5/S8/S9 in streaming form): one
    * row per (station-less) day window carrying per-day sample counts;
    * append mode + watermark ==> a window is emitted once, when it can
    * no longer receive late data. */
  def dailyCounts(src: DataFrame, watermarkDelay: String = "1 day"): DataFrame =
    src.withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), "1 day").as("day_window"))
      .agg(count(lit(1)).as("n_samples"))
      .select(to_date(col("day_window.start")).as("day"), col("n_samples"))

  /** Convert + append to the day-partitioned archive via foreachBatch:
    * each micro-batch runs the batch sink path, so day partitions are
    * rewritten idempotently under replay (exactly-once effect). */
  def archiveWriter(src: DataFrame, archivePath: String,
      checkpointDir: String): DataStreamWriter[Row] = {
    src.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val converted = ArchiveJob.convertUnits(
              batch.withColumn("station", lit("stream")))
            .withColumn("day",
              date_format(timestamp_seconds(col("dateTime")), "yyyyMMdd"))
            .withColumn("month", substring(col("day"), 1, 6))
          converted
            .repartition(col("month"), col("day"))
            .sortWithinPartitions(col("station"), col("dateTime"))
            .write.mode("overwrite")
            .partitionBy("month", "day")
            .parquet(archivePath)
        }
        ()
      }
  }

  /** Run the gated daily aggregation into an in-memory sink (smoke /
    * test harness): returns the started query. */
  def startDailyCountsToMemory(spark: SparkSession, inputDir: String,
      queryName: String, watermarkDelay: String = "1 day"): StreamingQuery =
    dailyCounts(source(spark, inputDir), watermarkDelay)
      .writeStream
      .outputMode(OutputMode.Append)
      .format("memory")
      .queryName(queryName)
      .start()
}
