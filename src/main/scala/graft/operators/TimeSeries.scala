package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.UnitConversions

/** Reference-parity time-series operators (SURVEY §2 S1-S12) expressed
  * over the driver's `events` table, which stands in for the wview
  * `archive` table (FIXTURES.md role mapping: ts ↔ dateTime,
  * user_id ↔ station, value ↔ sensor reading, event_type ↔ usUnits-style
  * discriminant).
  *
  * Every operator is a declarative DataFrame expression: filters and
  * projections reach the parquet scan (PushedFilters / ReadSchema),
  * aggregations run partial+final hash-agg, and the only global sorts are
  * the deterministic `orderBy` each query needs for the driver's
  * hash-compare. At 100 TB each of these is a single scan + at most one
  * shuffle.
  */
object TimeSeries {

  /** S1 — projected scan (aristoteles.py:329-330, :340-345): explicit
    * column list, never `*`. */
  def scanProject(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      .orderBy(col("event_id"))

  /** S2 — inclusive range predicate (aristoteles.py:303-306, :343-345:
    * WHERE dateTime BETWEEN ? AND ?, both bounds inclusive). */
  def rangeFilter(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .filter(Tables.tsGte("2024-01-10 00:00:00") && Tables.tsLte("2024-01-19 23:59:59"))
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      .orderBy(col("event_id"))

  /** S3 — ordered scan (aristoteles.py:343 ORDER BY dateTime). Output
    * order is load-bearing in the reference (rows land positionally in
    * HDF5 arrays); tie-break on event_id for a total order. */
  def orderedScan(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_id"), to_date(col("ts")).as("day"), col("user_id"))
      .orderBy(col("day"), col("event_id"))

  /** S4 — first record per source (aristoteles.py:240-241:
    * ORDER BY dateTime LIMIT 1 per station = min). Expressed as the
    * aggregate Catalyst would rewrite the sort+limit into anyway. */
  def firstPerStation(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"))
      // the event_id OF the chronologically first record (argmin with
      // an event_id tie-break for a total order) — a bare min(event_id)
      // would report some OTHER record's id whenever ids are not
      // assigned in ts order
      .agg(min(to_date(col("ts"))).as("first_day"),
           min_by(col("event_id"), struct(col("ts"), col("event_id")))
             .as("first_event_id"))
      .orderBy(col("user_id"))

  /** S5 — count under a range predicate (aristoteles.py:302-313:
    * yesterday's sample count per station). */
  def countInRange(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .filter(Tables.tsGte("2024-01-10 00:00:00") && Tables.tsLte("2024-01-19 23:59:59"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_samples"))
      .orderBy(col("user_id"))

  /** S6 + S7 — min across sources, clamped (aristoteles.py:250-259:
    * first_day = max(requested, min over stations of first record)). */
  def clampedFirstDay(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(min(to_date(col("ts"))).as("station_first"))
      .agg(min(col("station_first")).as("global_first"))
      .select(
        col("global_first"),
        greatest(lit("2024-01-15").cast("date"), col("global_first"))
          .as("clamped_first"))

  /** S8 — tumbling daily window (aristoteles.py:334 span_range("day")):
    * one group per UTC day. */
  def dailyRollup(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events"),
           round(sum(col("value")), 2).as("sum_value"))
      .orderBy(col("day"))

  /** S9 — completeness gate (aristoteles.py:296-327: proceed only when
    * every station has exactly 288 samples; here the analogous
    * HAVING-count gate per (station, day)). */
  def completenessGate(spark: SparkSession, dir: String, minSamples: Long = 5): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n_samples"))
      .filter(col("n_samples") >= minSamples)
      .orderBy(col("user_id"), col("day"))

  /** S9 all-stations form: a day passes only if EVERY configured
    * station clears the bar (aristoteles.py:316-327 `all(...)` over
    * the INI's station sections) — including a station with ZERO
    * events that day, which produces no group row and is invisible to
    * a bare min: the day's station count must equal the configured
    * set's size. The reference gates a handful of configured stations,
    * not the whole population; user_id < [[GateStations]] plays that
    * configured set here. */
  val GateStations = 5

  def gateAllStations(spark: SparkSession, dir: String, minSamples: Long = 1): DataFrame =
    Tables.events(spark, dir)
      .filter(col("user_id") < GateStations)
      .groupBy(to_date(col("ts")).as("day"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("day"))
      .agg(min(col("n")).as("min_station_samples"),
           count(lit(1)).as("n_stations"))
      .filter(col("min_station_samples") >= minSamples &&
        col("n_stations") === GateStations)
      .orderBy(col("day"))

  /** S10 — conditional unit conversion with the zero-skip quirk
    * (aristoteles.py:414-436; see UnitConversions). event_type='purchase'
    * plays the usUnits=1 role; value is converted mph -> km/h. */
  def unitConversion(spark: SparkSession, dir: String): DataFrame = {
    val us = col("event_type") === lit("purchase")
    Tables.events(spark, dir)
      .select(
        col("event_id"),
        col("event_type"),
        col("value"),
        round(UnitConversions.speed(us, col("value")), 4).as("value_kmh"),
        round(UnitConversions.temperature(us, col("value")), 4).as("value_c"),
        round(UnitConversions.pressure(us, col("value")), 4).as("value_hpa"))
      .orderBy(col("event_id"))
  }

  /** S11 — null handling (aristoteles.py:346: SQL NULL -> NaN float
    * coercion; we keep NULLs internal and only materialize sentinels at
    * the boundary). Demonstrated with nullif/coalesce + a regex field
    * extraction from the JSON-ish props column. */
  def nullHandling(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(
        col("event_id"),
        coalesce(nullif(col("value"), lit(0.0)), lit(-1.0)).as("value_or_sentinel"),
        regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("long").as("prop_k"))
      .orderBy(col("event_id"))

  /** S12 — multi-source fan-in (aristoteles.py:337-346: same scan per
    * station DB, results side by side). Long-format union with a source
    * tag, then a per-source rollup — the Spark-native shape that avoids
    * the reference's N-copies-of-the-pipeline structure (SURVEY §1.4). */
  def multiSourceUnion(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val a = ev.filter(col("event_type") === "purchase")
      .select(lit("src_purchase").as("source"), col("event_id"), col("value"))
    val b = ev.filter(col("event_type") === "signup")
      .select(lit("src_signup").as("source"), col("event_id"), col("value"))
    a.unionByName(b)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .orderBy(col("source"))
  }

  /** Flagship (SURVEY §7 Phase 0): daily rollup with completeness gate +
    * conversion — scan, filter, project, window, aggregate, gate, sort in
    * one declarative plan. */
  def flagship(spark: SparkSession, dir: String): DataFrame = {
    val us = col("event_type") === lit("purchase")
    Tables.events(spark, dir)
      .filter(Tables.tsGte("2024-01-01 00:00:00"))
      .select(
        col("user_id"),
        to_date(col("ts")).as("day"),
        UnitConversions.speed(us, col("value")).as("value_metric"))
      .groupBy(col("user_id"), col("day"))
      .agg(count(lit(1)).as("n_samples"),
           round(sum(col("value_metric")), 2).as("sum_metric"))
      .filter(col("n_samples") >= 1)
      .orderBy(col("user_id"), col("day"))
  }
}
