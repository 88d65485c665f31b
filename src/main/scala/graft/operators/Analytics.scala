package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Second-wave analytics surface: SQL-API entry, statistical aggregates,
  * exact percentiles, lateral explode, pivot, and an as-of join.
  *
  * The as-of join is the one operator here Spark has no primitive for;
  * it is built as the scalable single-pass form — union both sides,
  * one window per key carrying the last left-side value forward — not a
  * range-join explosion (SURVEY §7: compose built-ins before custom
  * plans). */
object Analytics {

  /** TPC-H Q6 via the SQL API over registered temp views — the engine's
    * SQL entry point (same Catalyst plan as the DataFrame form). */
  def q6ForecastRevenue(spark: SparkSession, dir: String): DataFrame = {
    // PER-CALL view name, dropped after analysis: a fixed name is
    // session-global mutable state — a concurrent call for another
    // corpus could replace it between registration and spark.sql,
    // silently resolving this query against the wrong corpus. sql()
    // analyzes eagerly, so the returned plan no longer needs the view.
    val view = s"li_q6_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    Tables.lineitem(spark, dir).createOrReplaceTempView(view)
    try spark.sql(s"""
      SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
      FROM $view
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        AND l_discount BETWEEN 0.03 AND 0.07
        AND l_quantity < 24
    """)
    finally { spark.catalog.dropTempView(view); () }
  }

  /** Statistical aggregates (variance family + correlation). */
  def statsAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
        round(var_samp(col("l_quantity")), 4).as("var_qty"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("corr_qty_price"),
        round(covar_samp(col("l_quantity"), col("l_extendedprice")), 2).as("covar_qty_price"))
      .orderBy(col("l_returnflag"))

  /** Exact interpolated percentiles (the sketch-free baseline;
    * approx_percentile is the 100 TB path, exercised in tests since its
    * sketch values aren't portable across engines). */
  def percentiles(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .agg(
        round(expr("percentile(o_totalprice, 0.5)"), 2).as("p50"),
        round(expr("percentile(o_totalprice, 0.9)"), 2).as("p90"),
        round(expr("percentile(o_totalprice, 0.99)"), 2).as("p99"))
      .orderBy(col("o_orderpriority"))

  /** Lateral explode: corpus word frequencies — the canonical
    * explode -> hash-aggregate pipeline (map-side combined). */
  def wordCounts(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word"))

  /** Pivot (conditional-aggregation form under the hood): revenue by
    * returnflag x linestatus. Fixed pivot values keep the schema static
    * — at scale an open-ended pivot would need a values pre-pass. */
  def pivotSales(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(round(sum(col("l_extendedprice")), 2))
      .orderBy(col("l_returnflag"))

  /** As-of join: for every purchase event, the most recent signup (<=)
    * by the same user. Single pass: union tagged sides, per-user window
    * ordered by time carries the last signup forward — no range join,
    * no explosion; one shuffle on user_id. Comparison happens on
    * microsecond longs so the DuckDB oracle (native ASOF JOIN on the
    * same longs) is exact. */
  def asofJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"),
              unix_micros(col("ts")).as("ts_us"))
      .filter(col("event_type").isin("purchase", "signup"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("is_purchase"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.withColumn("is_purchase", (col("event_type") === "purchase").cast("int"))
      // signups sort before purchases at the same instant, so a
      // same-timestamp signup is visible to the purchase (<= semantics)
      .withColumn("last_signup_id",
        last(when(col("event_type") === "signup", col("event_id")), ignoreNulls = true).over(w))
      .withColumn("last_signup_value",
        last(when(col("event_type") === "signup", col("value")), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
              col("last_signup_id"), round(col("last_signup_value"), 2).as("signup_value"))
      .orderBy(col("event_id"))
  }

  /** 7-day trailing moving average of daily event value — a RANGE
    * window frame (value-based, not row-based: missing days widen
    * nothing). One shuffle to the single ordering; daily pre-aggregate
    * first so the window runs over days, not raw events. */
  def movingAvg(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(sum(col("value")).as("day_value"))
      .withColumn("day_num", datediff(col("day"), lit("2024-01-01")))
    val w = Window.orderBy(col("day_num")).rangeBetween(-6, 0)
    daily
      .withColumn("ma7", round(avg(col("day_value")).over(w), 2))
      .select(col("day"), round(col("day_value"), 2).as("day_value"), col("ma7"))
      .orderBy(col("day"))
  }

  /** Sketch aggregates — the 100 TB forms of COUNT(DISTINCT) and
    * percentile: HyperLogLog++ and an online quantile sketch, both
    * partial-aggregable (one map-side pass, tiny merge) where their
    * exact twins shuffle every distinct value. Sketch internals differ
    * across engines, so correctness is a differential error-bound test
    * against the exact answers (ExtensionsSpec), not a DuckDB hash
    * compare. */
  def approxSketches(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_orderkey"), rsd = 0.02).as("approx_orders"),
        round(element_at(expr("approx_percentile(l_extendedprice, array(0.5, 0.99), 10000)"), 1), 2)
          .as("approx_p50"),
        round(element_at(expr("approx_percentile(l_extendedprice, array(0.5, 0.99), 10000)"), 2), 2)
          .as("approx_p99"))
      .orderBy(col("l_returnflag"))

  /** Exact counterpart of [[approxSketches]] — same grouping, same
    * measures, exact operators — so the sketch path's SHAPE (grouping,
    * aliasing, ordering) is validated end-to-end by the DuckDB oracle
    * even though the sketch VALUES are contractually engine-specific
    * (their bound is the <=5% differential test in ExtensionsSpec,
    * which compares approxSketches against exactly this frame). */
  def sketchExact(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_orderkey")).as("exact_orders"),
        round(expr("percentile(l_extendedprice, 0.5)"), 2).as("exact_p50"),
        round(expr("percentile(l_extendedprice, 0.99)"), 2).as("exact_p99"))
      .orderBy(col("l_returnflag"))

  /** Array aggregation surface: per-user distinct event types built
    * with collect_set/sort_array — the pattern for assembling nested
    * columns out of flat events. The array is emitted joined to a
    * string so external compare harnesses can hash the column; the
    * nested form stays visible via n_types. */
  def arrayAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(
        sort_array(collect_set(col("event_type"))).as("event_types_arr"),
        count(lit(1)).as("n_events"))
      .select(col("user_id"),
        array_join(col("event_types_arr"), ",").as("event_types"),
        size(col("event_types_arr")).cast("long").as("n_types"), col("n_events"))
      .orderBy(col("user_id"))

  /** Two-step funnel (signup -> purchase within 1 hour): per user, the
    * first signup and the first purchase AT OR AFTER it, then the
    * conversion flag — the sequential-pattern query every product
    * analytics stack runs. Two filtered aggregations and one join on
    * user_id; no window over the raw event stream, so the shuffle
    * carries one row per user, not per event. */
  def funnelSignupPurchase(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val s = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("ts")).as("s_ts"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"))
      .join(s, Seq("user_id"))
      .filter(col("ts") >= col("s_ts"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("p_ts"))
    s.join(p, Seq("user_id"), "left")
      .select(col("user_id"), col("s_ts"), col("p_ts"),
        coalesce(col("p_ts") <= col("s_ts") + expr("INTERVAL 1 HOUR"), lit(false))
          .as("converted_1h"))
      .orderBy(col("user_id"))
  }

  /** Calendar-spine gap filling: a sparse per-day series (purchases of
    * a user subset) left-joined onto the generated full day range, with
    * missing days zero-filled and flagged — the densify step required
    * before any window arithmetic that assumes contiguous days. The
    * spine comes from one sequence() over the corpus bounds (a one-row
    * aggregate exploded), never a driver-side date loop. */
  def gapFillDaily(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val sparse = ev
      .filter(col("event_type") === "purchase" && col("user_id") < 5)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(round(sum(col("value")), 2).as("day_value"))
    val spine = ev.agg(min(to_date(col("ts"))).as("lo"), max(to_date(col("ts"))).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"))).as("day"))
    spine.join(sparse, Seq("day"), "left")
      .select(col("day"),
        coalesce(col("day_value"), lit(0.0)).as("day_value"),
        col("day_value").isNotNull.as("had_data"))
      .orderBy(col("day"))
  }

  /** Linear interpolation over the densified day spine — the step past
    * [[gapFillDaily]]'s zero-fill: missing days take the straight line
    * between the nearest observed neighbors (time-weighted by day
    * distance), edge gaps clamp to the nearest observation — the
    * resample-and-interpolate shape every telemetry pipeline needs
    * before rate/derivative math. last/first over IGNORE NULLS
    * running frames find both anchors in TWO window passes (no
    * self-join per gap); at 100 TB the window partitions by series
    * key and each partition is days-sized. */
  def interpolateDaily(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val sparse = ev
      .filter(col("event_type") === "click" && col("user_id") < 3)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(avg(col("value")).as("day_value"))
    val spine = ev.agg(min(to_date(col("ts"))).as("lo"), max(to_date(col("ts"))).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"))).as("day"))
    val wPrev = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.orderBy(col("day"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val anchored = spine.join(sparse, Seq("day"), "left")
      .withColumn("pv", last(col("day_value"), ignoreNulls = true).over(wPrev))
      .withColumn("pd",
        last(when(col("day_value").isNotNull, col("day")), ignoreNulls = true).over(wPrev))
      .withColumn("nv", first(col("day_value"), ignoreNulls = true).over(wNext))
      .withColumn("nd",
        first(when(col("day_value").isNotNull, col("day")), ignoreNulls = true).over(wNext))
    val interp = when(col("day_value").isNotNull, col("day_value"))
      .when(col("pv").isNull, col("nv"))
      .when(col("nv").isNull, col("pv"))
      .otherwise(col("pv") + (col("nv") - col("pv")) *
        datediff(col("day"), col("pd")) / datediff(col("nd"), col("pd")))
    anchored
      .select(col("day"), round(interp, 4).as("value_interp"),
        col("day_value").isNotNull.as("had_data"))
      .orderBy(col("day"))
  }

  /** Two-series reconciliation via FULL OUTER join — the
    * completeness-audit shape (which days have clicks but no views,
    * and vice versa). The join key coalesces through the USING-column
    * form; a day missing from one side carries NULL metrics and
    * both_present=false. Completes the join-type surface alongside
    * the semi/anti/left registrations. */
  def fullOuterReconcile(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    def side(t: String, alias: String): DataFrame = ev
      .filter(col("event_type") === t && col("user_id") < 2)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as(s"n_$alias"),
        round(sum(col("value")), 2).as(s"sum_$alias"))
    side("click", "click")
      .join(side("view", "view"), Seq("day"), "full_outer")
      .select(col("day"), col("n_click"), col("sum_click"),
        col("n_view"), col("sum_view"),
        (col("n_click").isNotNull && col("n_view").isNotNull).as("both_present"))
      .orderBy(col("day"))
  }

  /** Seasonal decomposition (STL-lite): daily totals split into trend
    * (7-day centered moving average), weekly seasonal (mean detrended
    * value per day-of-week slot), and residual — the
    * anomaly-vs-seasonality triage every metrics pipeline runs.
    * Day-of-week is computed as pmod(day - epoch_anchor, 7), NOT
    * dayofweek(): Spark numbers Sunday=1..7 while DuckDB numbers
    * Sunday=0..6. The oracle mirrors pmod's always-non-negative
    * result with ((diff % 7) + 7) % 7 — DuckDB's bare % follows the
    * dividend sign, so a fixture day before the anchor would
    * otherwise go negative only on the oracle side. Edge days keep
    * their partial centered windows (same
    * frame semantics both sides). */
  def seasonalDecompose(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(sum(col("value")).as("day_value"))
    val wTrend = Window.orderBy(col("day")).rowsBetween(-3, 3)
    val withTrend = daily
      .withColumn("trend", avg(col("day_value")).over(wTrend))
      .withColumn("dow",
        pmod(datediff(col("day"), lit("2024-01-01").cast("date")), lit(7)))
      .withColumn("detrended", col("day_value") - col("trend"))
    val wSeason = Window.partitionBy(col("dow"))
    withTrend
      .withColumn("seasonal", avg(col("detrended")).over(wSeason))
      .select(col("day"), col("dow").cast("int").as("dow"),
        round(col("day_value"), 2).as("day_value"),
        round(col("trend"), 4).as("trend"),
        round(col("seasonal"), 4).as("seasonal"),
        round(col("detrended") - col("seasonal"), 4).as("residual"))
      .orderBy(col("day"))
  }

  /** Rolling 7-day Pearson correlation between two daily series (click
    * vs view volume) — the co-movement diagnostic dashboards run over
    * every metric pair. One aggregate to daily grain, then a windowed
    * corr(): Pearson is scale-invariant, so Spark's and the oracle's
    * sample/population conventions cancel and round(4) seals the
    * residual float noise. Windows shorter than 2 points are NULL in
    * both engines. */
  def rollingCorr(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .filter(col("event_type").isin("click", "view"))
      .groupBy(to_date(col("ts")).as("day"))
      .agg(
        sum(when(col("event_type") === "click", col("value"))).as("click_v"),
        sum(when(col("event_type") === "view", col("value"))).as("view_v"))
    // RANGE frame over the day NUMBER, not 7 observed rows: with a
    // gap a row frame silently spans more than 7 calendar days — the
    // same reasoning movingAvg documents (oracle mirrored)
    val w = Window.orderBy(col("day_num")).rangeBetween(-6, Window.currentRow)
    daily
      .withColumn("day_num", datediff(col("day"), lit("2024-01-01").cast("date")))
      .select(col("day"),
        round(col("click_v"), 2).as("click_v"),
        round(col("view_v"), 2).as("view_v"),
        round(corr(col("click_v"), col("view_v")).over(w), 4).as("corr_7d"))
      .orderBy(col("day"))
  }

  /** Day-over-day delta via lag(): the windowed change-detection shape
    * (daily totals then a 1-row lookback over the day order). First day
    * has NULL delta in both engines. */
  def dayOverDay(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(round(sum(col("value")), 2).as("day_value"))
      .withColumn("prev_value",
        lag(col("day_value"), 1).over(Window.orderBy(col("day"))))
      .withColumn("prev_day", lag(col("day"), 1).over(Window.orderBy(col("day"))))
      // day-over-day means the CALENDAR previous day: across a gap the
      // lagged row is older than one day and the delta is NULL, not a
      // multi-day jump presented as daily change (oracle mirrored)
      .select(col("day"), col("day_value"),
        when(datediff(col("day"), col("prev_day")) === 1,
          round(col("day_value") - col("prev_value"), 2)).as("delta"))
      .orderBy(col("day"))

  /** JSON column surface: path extraction (get_json_object) and typed
    * parsing (from_json with an explicit schema) over the events props
    * column — the schema-on-read pattern for semi-structured payload
    * columns; both are codegen'd expressions, no UDF. */
  def jsonFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k_path"),
        from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k",
            org.apache.spark.sql.types.LongType))))
          .getField("k").as("k_typed"))
      .orderBy(col("event_id"))

  /** Session gap: a >6h pause in a user's event stream closes the
    * session. Microsecond longs end-to-end so the oracle is exact. */
  val SessionGapUs: Long = 6L * 3600 * 1000000

  /** Sessionization — the gaps-and-islands operator every behavioral
    * pipeline needs: lag flags a session break, a running sum of flags
    * numbers the sessions, then one aggregate per (user, session). Two
    * window passes + one agg over a single shuffle on user_id; at scale
    * the shuffle is the unavoidable partition-by-entity and everything
    * else is within-partition. */
  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    e.withColumn("prev_us", lag(col("ts_us"), 1).over(w))
      .withColumn("new_sess",
        when(col("prev_us").isNull || col("ts_us") - col("prev_us") > SessionGapUs, 1)
          .otherwise(0))
      .withColumn("session_id",
        sum(col("new_sess")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("long"))
      .groupBy(col("user_id"), col("session_id"))
      .agg(min(col("ts_us")).as("session_start_us"),
           max(col("ts_us")).as("session_end_us"),
           count(lit(1)).as("n_events"))
      .withColumn("duration_secs",
        expr("(session_end_us - session_start_us) div 1000000"))
      .orderBy(col("user_id"), col("session_id"))
  }

  /** Cohort retention: users grouped by their first-seen day, distinct
    * actives counted at each day offset — the canonical product-
    * analytics self-join (first-touch aggregate joined back to the
    * event stream on the entity key; one shuffle on user_id feeds
    * both sides, then one (cohort, offset) aggregate). */
  def cohortRetention(spark: SparkSession, dir: String, maxOffset: Int = 7): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("day"))
    val firstDay = ev.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
    ev.join(firstDay, Seq("user_id"))
      .select(col("user_id"), col("cohort_day"),
        datediff(col("day"), col("cohort_day")).cast("long").as("day_offset"))
      .filter(col("day_offset").between(0, maxOffset))
      .groupBy(col("cohort_day"), col("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("cohort_day"), col("day_offset"))
  }

  /** Column profiling — the data-quality pass an ingest pipeline runs
    * before accepting a drop: null count, exact distinct count, and
    * numeric range per column, in ONE scan of the fact table.
    *
    * Plan: melt the 6 profiled columns to narrow (col_name, value)
    * rows with stack(), then aggregate TWICE — groupBy(col_name,
    * value) with map-side partial aggregation, then groupBy(col_name)
    * over the distinct pairs. Exactness is preserved (the second
    * stage counts the distinct-pair rows), but unlike the previous
    * multi-count(DISTINCT) plan there is no Expand multiplying the
    * shuffle x(lanes+1): the one data-sized shuffle is keyed
    * (col, value) and map-side combine compresses it to the per-
    * partition distinct cardinality; stage two is sized by the global
    * distinct cardinality. At 100 TB that is the difference between
    * shuffling ~7x the table and shuffling its distinct values.
    * Nulls and min/max ride the same pass (the null group's count is
    * the null count; v_num lanes are NULL for categorical columns). */
  def profileColumns(spark: SparkSession, dir: String): DataFrame = {
    val numeric = Seq("l_orderkey", "l_quantity", "l_extendedprice", "l_discount")
    val categorical = Seq("l_returnflag", "l_linestatus")
    val cols = numeric ++ categorical
    // value identity via CAST(x AS STRING): injective per column (a
    // double/decimal/string each round-trips), so distinct-on-string
    // equals distinct-on-value; the double lane feeds min/max
    val stackArgs = cols.map { c =>
      val num = if (numeric.contains(c)) s"CAST($c AS DOUBLE)" else "CAST(NULL AS DOUBLE)"
      s"'$c', CAST($c AS STRING), $num"
    }.mkString(", ")
    // the scan input is one parquet row group (= one task) at test SF,
    // so spread the narrow 6-column projection first; hash, not
    // round-robin (round-robin pays a defensive local sort under
    // sortBeforeRepartition). At scale the file count provides the
    // parallelism and this shuffle stays proportional to the narrow
    // projection, not the full row.
    Tables.lineitem(spark, dir)
      .select(cols.map(col): _*)
      .repartition(spark.sparkContext.defaultParallelism, col("l_orderkey"))
      .selectExpr(s"stack(${cols.length}, $stackArgs) AS (col_name, v_str, v_num)")
      .groupBy(col("col_name"), col("v_str"))
      .agg(count(lit(1)).as("cnt"), min(col("v_num")).as("mn"), max(col("v_num")).as("mx"))
      .groupBy(col("col_name"))
      .agg(
        // sum over when(): stays BIGINT in both engines (the oracle's
        // count(*) - count(col) types BIGINT too)
        sum(when(col("v_str").isNull, col("cnt")).otherwise(lit(0L))).as("n_nulls"),
        count(when(col("v_str").isNotNull, lit(1))).as("n_distinct"),
        round(min(col("mn")), 4).as("min_v"),
        round(max(col("mx")), 4).as("max_v"))
      .orderBy(col("col_name"))
  }
}
