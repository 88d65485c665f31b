package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.TimeSeries

/** Central registry: query name -> (SparkSession, sfDir) => DataFrame,
  * plus the DuckDB oracle SQL for each (driver contract, SURVEY §5).
  *
  * Conventions (load-bearing for the driver's hash-compare):
  *  - every query ends in an explicit total-order `orderBy`;
  *  - every computed column is aliased identically in Spark and SQL;
  *  - double aggregates are `round(..., 2..4)` on both sides so
  *    summation-order ulp differences can't flip the hash;
  *  - integer aggregates are BIGINT on both sides (DuckDB sum(int)
  *    returns HUGEINT, so oracles CAST where needed).
  */
object Queries {
  type Q = (SparkSession, String) => DataFrame

  val timeSeries: Map[String, Q] = Map(
    "s1_scan_project" -> (TimeSeries.scanProject _),
    "s2_range_filter" -> (TimeSeries.rangeFilter _),
    "s3_ordered_scan" -> (TimeSeries.orderedScan _),
    "s4_first_per_station" -> (TimeSeries.firstPerStation _),
    "s5_count_range" -> (TimeSeries.countInRange _),
    "s6_s7_clamped_first_day" -> (TimeSeries.clampedFirstDay _),
    "s8_daily_rollup" -> (TimeSeries.dailyRollup _),
    "s9_completeness_gate" -> ((s: SparkSession, d: String) => TimeSeries.completenessGate(s, d)),
    "s9_gate_all_stations" -> ((s: SparkSession, d: String) => TimeSeries.gateAllStations(s, d)),
    "s10_unit_conversion" -> (TimeSeries.unitConversion _),
    "s11_null_handling" -> (TimeSeries.nullHandling _),
    "s12_multi_source_union" -> (TimeSeries.multiSourceUnion _),
    "flagship_daily_gate" -> (TimeSeries.flagship _)
  )

  val timeSeriesOracles: Map[String, String] = Map(
    "s1_scan_project" ->
      "SELECT event_id, user_id, event_type, value FROM events ORDER BY event_id",
    "s2_range_filter" ->
      ("SELECT event_id, user_id, event_type, value FROM events " +
       "WHERE ts >= TIMESTAMP '2024-01-10 00:00:00' AND ts <= TIMESTAMP '2024-01-19 23:59:59' " +
       "ORDER BY event_id"),
    "s3_ordered_scan" ->
      "SELECT event_id, CAST(ts AS DATE) AS day, user_id FROM events ORDER BY day, event_id",
    "s4_first_per_station" ->
      ("SELECT user_id, CAST(min(ts) AS DATE) AS first_day, min(event_id) AS first_event_id " +
       "FROM events GROUP BY user_id ORDER BY user_id"),
    "s5_count_range" ->
      ("SELECT user_id, count(*) AS n_samples FROM events " +
       "WHERE ts >= TIMESTAMP '2024-01-10 00:00:00' AND ts <= TIMESTAMP '2024-01-19 23:59:59' " +
       "GROUP BY user_id ORDER BY user_id"),
    "s6_s7_clamped_first_day" ->
      ("SELECT CAST(min(ts) AS DATE) AS global_first, " +
       "greatest(DATE '2024-01-15', CAST(min(ts) AS DATE)) AS clamped_first FROM events"),
    "s8_daily_rollup" ->
      ("SELECT CAST(ts AS DATE) AS day, count(*) AS n_events, round(sum(value), 2) AS sum_value " +
       "FROM events GROUP BY day ORDER BY day"),
    "s9_completeness_gate" ->
      ("SELECT user_id, CAST(ts AS DATE) AS day, count(*) AS n_samples FROM events " +
       "GROUP BY user_id, day HAVING count(*) >= 5 ORDER BY user_id, day"),
    "s9_gate_all_stations" ->
      ("SELECT day, min(n) AS min_station_samples, count(*) AS n_stations FROM " +
       "(SELECT CAST(ts AS DATE) AS day, user_id, count(*) AS n FROM events GROUP BY 1, 2) " +
       "GROUP BY day HAVING min(n) >= 1 ORDER BY day"),
    "s10_unit_conversion" ->
      ("SELECT event_id, event_type, value, " +
       "round(CASE WHEN event_type = 'purchase' AND value <> 0 THEN value * 1.609344 ELSE value END, 4) AS value_kmh, " +
       "round(CASE WHEN event_type = 'purchase' AND value <> 0 THEN (value - 32.0) * 5.0 / 9.0 ELSE value END, 4) AS value_c, " +
       "round(CASE WHEN event_type = 'purchase' AND value <> 0 THEN value * 33.863886 ELSE value END, 4) AS value_hpa " +
       "FROM events ORDER BY event_id"),
    "s11_null_handling" ->
      ("SELECT event_id, coalesce(nullif(value, 0.0), -1.0) AS value_or_sentinel, " +
       "TRY_CAST(regexp_extract(props, '\"k\": (\\d+)', 1) AS BIGINT) AS prop_k " +
       "FROM events ORDER BY event_id"),
    "s12_multi_source_union" ->
      ("SELECT source, count(*) AS n, round(sum(value), 2) AS sum_value FROM (" +
       "SELECT 'src_purchase' AS source, event_id, value FROM events WHERE event_type = 'purchase' " +
       "UNION ALL " +
       "SELECT 'src_signup' AS source, event_id, value FROM events WHERE event_type = 'signup'" +
       ") GROUP BY source ORDER BY source"),
    "flagship_daily_gate" ->
      ("SELECT user_id, CAST(ts AS DATE) AS day, count(*) AS n_samples, " +
       "round(sum(CASE WHEN event_type = 'purchase' AND value <> 0 THEN value * 1.609344 ELSE value END), 2) AS sum_metric " +
       "FROM events WHERE ts >= TIMESTAMP '2024-01-01 00:00:00' " +
       "GROUP BY user_id, day HAVING count(*) >= 1 ORDER BY user_id, day")
  )

  def all: Map[String, Q] = timeSeries
  def oracles: Map[String, String] = timeSeriesOracles
}
