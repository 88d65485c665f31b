package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{Analytics, Changes, Dedup, Graph, Html, Lake, Multimodal, Quality, Relational, Search, Similarity, TextAnalysis, TimeSeries}

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
    // first_event_id = the id OF the chronologically first record
    // (argmin, event_id tie-break) — the engine's min_by twin
    "s4_first_per_station" ->
      ("SELECT user_id, CAST(min(ts) AS DATE) AS first_day, " +
       "(list(event_id ORDER BY ts, event_id))[1] AS first_event_id " +
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
    // a station with ZERO events that day produces no group row and is
    // invisible to a bare min — the gate requires the day's station
    // count to equal the CONFIGURED set's size (the reference's
    // all(...) over the INI stations; user_id < 5 plays that set)
    "s9_gate_all_stations" ->
      ("SELECT day, min(n) AS min_station_samples, count(*) AS n_stations FROM " +
       "(SELECT CAST(ts AS DATE) AS day, user_id, count(*) AS n FROM events " +
       "WHERE user_id < 5 GROUP BY 1, 2) " +
       "GROUP BY day HAVING min(n) >= 1 AND count(*) = 5 ORDER BY day"),
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

  val relational: Map[String, Q] = Map(
    "q1_pricing_summary" -> (Relational.q1PricingSummary _),
    "q3_shipping_priority" -> (Relational.q3ShippingPriority _),
    "q5_local_supplier_volume" -> (Relational.q5LocalSupplierVolume _),
    "q_semi_join" -> (Relational.semiJoinCustomersWithUrgent _),
    "q_anti_join" -> (Relational.antiJoinCustomersNoUrgent _),
    "q_window_top3_per_customer" -> (Relational.windowTop3PerCustomer _),
    "q_window_running_sum" -> (Relational.windowRunningSum _),
    "q_topk_orders" -> (Relational.topKOrders _),
    "q_setops_intersect" -> (Relational.setOpsIntersect _),
    "q_setops_except" -> (Relational.setOpsExcept _),
    "q_setops_except_all" -> (Relational.setOpsExceptAll _),
    "q_setops_intersect_all" -> (Relational.setOpsIntersectAll _),
    "q_unpivot" -> (Relational.unpivotMeasures _),
    "q_distinct_counts" -> (Relational.distinctCounts _),
    "q_rollup_sales" -> (Relational.rollupSales _),
    "q_grouping_sets" -> (Relational.groupingSetsSales _),
    "q_cube_sales" -> (Relational.cubeSales _),
    "q_case_agg_by_status" -> (Relational.caseAggByStatus _),
    "q_above_avg_suppliers" -> (Relational.aboveAvgSuppliers _),
    "q_string_funcs" -> (Relational.stringFuncs _),
    "q_date_funcs" -> (Relational.dateFuncs _),
    "q_latest_order_per_customer" -> (Relational.latestOrderPerCustomer _),
    "q_catalog_sql" -> (graft.sources.GraftCatalog.customersPerNationSql _),
    "q_salted_join" -> (Relational.saltedJoinRevenue _),
    "q_salted_join_left" -> (Relational.saltedJoinLeftRevenue _),
    "q_range_join" -> (Relational.rangeJoinActivity _),
    "q4_order_priority" -> (Relational.q4OrderPriority _),
    "q7_volume_shipping" -> (Relational.q7VolumeShipping _),
    "q10_returned_items" -> (Relational.q10ReturnedItems _),
    "q13_order_distribution" -> (Relational.q13OrderDistribution _),
    "q14_promo_revenue" -> (Relational.q14PromoRevenue _),
    "q15_top_supplier" -> (Relational.q15TopSupplier _),
    "q18_large_orders" -> (Relational.q18LargeOrders _),
    "q_window_misc" -> (Relational.windowMisc _),
    "q17_small_quantity" -> (Relational.q17SmallQuantity _),
    "q19_discounted_revenue" -> (Relational.q19DiscountedRevenue _),
    "q21_late_shippers" -> (Relational.q21LateShippers _),
    "q22_idle_balance" -> (Relational.q22IdleBalance _),
    "q2_min_cost_supplier" -> (Relational.q2MinCostSupplier _),
    "q8_market_share" -> (Relational.q8MarketShare _),
    "q9_product_profit" -> (Relational.q9ProductProfit _),
    "q11_important_parts" -> (Relational.q11ImportantParts _),
    "q12_ship_delay_priority" -> (Relational.q12ShipDelayPriority _),
    "q16_supplier_relation" -> (Relational.q16SupplierRelation _),
    "q20_volume_suppliers" -> (Relational.q20VolumeSuppliers _)
  )

  val relationalOracles: Map[String, String] = Map(
    "q1_pricing_summary" ->
      ("SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty, " +
       "round(sum(l_extendedprice), 2) AS sum_base_price, " +
       "round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price, " +
       "round(avg(l_quantity), 4) AS avg_qty, round(avg(l_extendedprice), 4) AS avg_price, " +
       "round(avg(l_discount), 6) AS avg_disc, count(*) AS count_order " +
       "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00' " +
       "GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"),
    "q3_shipping_priority" ->
      ("SELECT l_orderkey, CAST(o_orderdate AS DATE) AS o_date, " +
       "round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue " +
       "FROM customer, orders, lineitem " +
       "WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey AND l_orderkey = o_orderkey " +
       "AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00' AND l_shipdate > TIMESTAMP '1996-01-01 00:00:00' " +
       "GROUP BY l_orderkey, o_date ORDER BY revenue DESC, l_orderkey LIMIT 10"),
    "q5_local_supplier_volume" ->
      ("SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue " +
       "FROM region, nation, customer, orders, lineitem, supplier " +
       "WHERE r_name = 'AFRICA' AND n_regionkey = r_regionkey AND c_nationkey = n_nationkey " +
       "AND o_custkey = c_custkey AND l_orderkey = o_orderkey AND l_suppkey = s_suppkey " +
       "AND s_nationkey = c_nationkey " +
       "AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00' " +
       "GROUP BY n_name ORDER BY n_name"),
    "q_semi_join" ->
      ("SELECT c_custkey, c_name, c_mktsegment FROM customer " +
       "WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT') " +
       "ORDER BY c_custkey"),
    "q4_order_priority" ->
      ("SELECT o_orderpriority, count(*) AS order_count FROM orders " +
       "WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00' " +
       "AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey " +
       "AND l_shipdate > o_orderdate + INTERVAL 75 DAY) " +
       "GROUP BY o_orderpriority ORDER BY o_orderpriority"),
    "q7_volume_shipping" ->
      ("SELECT supp_nation, cust_nation, l_year, round(sum(volume), 2) AS revenue FROM (" +
       "SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation, " +
       "CAST(year(l_shipdate) AS INTEGER) AS l_year, " +
       "l_extendedprice * (1 - l_discount) AS volume " +
       "FROM supplier, lineitem, orders, customer, nation n1, nation n2 " +
       "WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey AND c_custkey = o_custkey " +
       "AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey " +
       "AND n1.n_nationkey < 5 AND n2.n_nationkey < 5 AND n1.n_name <> n2.n_name " +
       "AND l_shipdate >= TIMESTAMP '1995-01-01 00:00:00' AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00') " +
       "GROUP BY supp_nation, cust_nation, l_year ORDER BY supp_nation, cust_nation, l_year"),
    "q_anti_join" ->
      ("SELECT c_custkey, c_name, round(c_acctbal, 2) AS acctbal FROM customer " +
       "WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT') " +
       "ORDER BY c_custkey"),
    "q_window_top3_per_customer" ->
      ("SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS totalprice, CAST(rn AS INTEGER) AS rn FROM " +
       "(SELECT o_custkey, o_orderkey, o_totalprice, " +
       "row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn FROM orders) " +
       "WHERE rn <= 3 ORDER BY o_custkey, rn"),
    "q_window_running_sum" ->
      ("SELECT l_suppkey, l_orderkey, l_linenumber, round(sum(l_quantity) OVER " +
       "(PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity " +
       "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_qty " +
       "FROM lineitem ORDER BY l_suppkey, l_orderkey, l_linenumber, running_qty"),
    "q_topk_orders" ->
      ("SELECT o_orderkey, round(o_totalprice, 2) AS totalprice FROM orders " +
       "ORDER BY totalprice DESC, o_orderkey LIMIT 20"),
    "q_setops_intersect" ->
      ("SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT' " +
       "INTERSECT SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW' " +
       "ORDER BY o_custkey"),
    "q_setops_except" ->
      ("SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT' " +
       "EXCEPT SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW' " +
       "ORDER BY o_custkey"),
    "q_setops_except_all" ->
      ("SELECT o_custkey, count(*) AS multiplicity FROM (" +
       "SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT' " +
       "EXCEPT ALL SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW') " +
       "GROUP BY o_custkey ORDER BY o_custkey"),
    "q_setops_intersect_all" ->
      ("SELECT o_custkey, count(*) AS multiplicity FROM (" +
       "SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT' " +
       "INTERSECT ALL SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW') " +
       "GROUP BY o_custkey ORDER BY o_custkey"),
    "q_unpivot" ->
      ("SELECT measure, count(*) AS n, round(sum(value), 2) AS total, round(avg(value), 4) AS mean " +
       "FROM (SELECT l_orderkey, l_linenumber, measure, value FROM lineitem " +
       "UNPIVOT (value FOR measure IN (l_quantity AS quantity, l_extendedprice AS extendedprice, " +
       "l_discount AS discount, l_tax AS tax))) " +
       "GROUP BY measure ORDER BY measure"),
    "q_distinct_counts" ->
      ("SELECT l_returnflag, count(DISTINCT l_orderkey) AS n_orders, " +
       "count(DISTINCT l_suppkey) AS n_suppliers, count(*) AS n_rows " +
       "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"),
    "q_rollup_sales" ->
      ("SELECT coalesce(l_returnflag, 'ALL') AS returnflag, coalesce(l_linestatus, 'ALL') AS linestatus, " +
       "round(sum(l_extendedprice), 2) AS sum_price, count(*) AS n " +
       "FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus) ORDER BY returnflag, linestatus"),
    "q_grouping_sets" ->
      ("SELECT coalesce(l_returnflag, 'ALL') AS returnflag, coalesce(l_linestatus, 'ALL') AS linestatus, " +
       "round(sum(l_extendedprice), 2) AS sum_price, count(*) AS n " +
       "FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ()) " +
       "ORDER BY returnflag, linestatus"),
    "q_cube_sales" ->
      ("SELECT coalesce(o_orderstatus, 'ALL') AS status, coalesce(o_orderpriority, 'ALL') AS priority, " +
       "round(sum(o_totalprice), 2) AS sum_price, count(*) AS n " +
       "FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority) ORDER BY status, priority"),
    "q_case_agg_by_status" ->
      ("SELECT o_orderpriority, " +
       "round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice ELSE 0.0 END), 2) AS open_total, " +
       "round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0.0 END), 2) AS filled_total, " +
       "round(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice ELSE 0.0 END), 2) AS pending_total " +
       "FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"),
    "q_above_avg_suppliers" ->
      ("SELECT s_suppkey, s_name, round(s_acctbal, 2) AS acctbal FROM supplier " +
       "WHERE s_acctbal > (SELECT avg(s_acctbal) FROM supplier) ORDER BY s_suppkey"),
    "q_string_funcs" ->
      ("SELECT p_partkey, upper(p_brand) AS brand_upper, substring(p_name, 1, 8) AS name_prefix, " +
       "length(p_name) AS name_len, concat_ws('-', p_type, p_brand) AS type_brand " +
       "FROM part WHERE p_name LIKE '%a%' ORDER BY p_partkey"),
    "q_date_funcs" ->
      ("SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year, CAST(month(o_orderdate) AS INTEGER) AS o_month, " +
       "count(*) AS n_orders, round(sum(o_totalprice), 2) AS sum_price " +
       "FROM orders GROUP BY o_year, o_month ORDER BY o_year, o_month"),
    "q_latest_order_per_customer" ->
      ("SELECT o_custkey, o_orderkey, o_date FROM " +
       "(SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS o_date, " +
       "row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn FROM orders) " +
       "WHERE rn = 1 ORDER BY o_custkey"),
    "q_catalog_sql" ->
      ("SELECT n_name, count(*) AS n_customers, round(sum(c_acctbal), 2) AS total_bal " +
       "FROM customer JOIN nation ON c_nationkey = n_nationkey " +
       "GROUP BY n_name ORDER BY n_name"),
    "q10_returned_items" ->
      ("SELECT c_custkey, c_name, round(c_acctbal, 2) AS acctbal, n_name, " +
       "CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6)) * " +
       "(1 - CAST(l_discount AS DECIMAL(18,6)))), 2) AS DOUBLE) AS revenue " +
       "FROM customer, orders, lineitem, nation " +
       "WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey AND c_nationkey = n_nationkey " +
       "AND l_returnflag = 'R' " +
       "AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00' " +
       "GROUP BY c_custkey, c_name, c_acctbal, n_name " +
       "ORDER BY revenue DESC, c_custkey LIMIT 20"),
    "q13_order_distribution" ->
      ("SELECT c_count, count(*) AS custdist FROM (" +
       "SELECT c_custkey, count(o_orderkey) AS c_count FROM customer " +
       "LEFT OUTER JOIN orders ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT' " +
       "GROUP BY c_custkey) GROUP BY c_count ORDER BY custdist DESC, c_count DESC"),
    "q14_promo_revenue" ->
      ("SELECT round(100.0 * CAST(sum(CASE WHEN p_type = 'PROMO' " +
       "THEN CAST(l_extendedprice AS DECIMAL(18,6)) * (1 - CAST(l_discount AS DECIMAL(18,6))) " +
       "ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE) / " +
       "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6)) * " +
       "(1 - CAST(l_discount AS DECIMAL(18,6)))) AS DOUBLE), 4) AS promo_revenue_pct " +
       "FROM lineitem, part WHERE l_partkey = p_partkey " +
       "AND l_shipdate >= TIMESTAMP '1996-03-01 00:00:00' AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'"),
    "q15_top_supplier" ->
      ("WITH r AS (SELECT l_suppkey, round(sum(CAST(l_extendedprice AS DECIMAL(18,6)) * " +
       "(1 - CAST(l_discount AS DECIMAL(18,6)))), 2) AS trd " +
       "FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' " +
       "AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00' GROUP BY l_suppkey) " +
       "SELECT s_suppkey, s_name, CAST(trd AS DOUBLE) AS total_revenue " +
       "FROM r JOIN supplier ON l_suppkey = s_suppkey " +
       "WHERE trd = (SELECT max(trd) FROM r) ORDER BY s_suppkey"),
    "q18_large_orders" ->
      ("SELECT c_custkey, c_name, o_orderkey, CAST(o_orderdate AS DATE) AS o_date, " +
       "round(o_totalprice, 2) AS totalprice, total_qty FROM " +
       "(SELECT l_orderkey, round(sum(l_quantity), 2) AS total_qty FROM lineitem " +
       "GROUP BY l_orderkey HAVING round(sum(l_quantity), 2) > 300) big " +
       "JOIN orders ON l_orderkey = o_orderkey JOIN customer ON o_custkey = c_custkey " +
       "ORDER BY totalprice DESC, o_orderkey"),
    "q_window_misc" ->
      ("SELECT o_orderkey, o_orderpriority, CAST(ntile(4) OVER w AS INTEGER) AS quartile, " +
       "round(cume_dist() OVER w, 6) AS cd, lead(o_orderkey, 1) OVER w AS next_key, " +
       "first_value(o_orderkey) OVER w AS cheapest_key " +
       "FROM orders WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey) " +
       "ORDER BY o_orderkey"),
    "q17_small_quantity" ->
      ("SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))) / 7.0, 2) AS DOUBLE) AS avg_yearly " +
       "FROM lineitem, part WHERE p_partkey = l_partkey AND p_brand = 'Brand#3' " +
       "AND l_quantity < (SELECT 0.5 * avg(l2.l_quantity) FROM lineitem l2 " +
       "WHERE l2.l_partkey = part.p_partkey)"),
    "q19_discounted_revenue" ->
      ("SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6)) * " +
       "(1 - CAST(l_discount AS DECIMAL(18,6)))), 2) AS DOUBLE) AS revenue " +
       "FROM lineitem, part WHERE p_partkey = l_partkey AND (" +
       "(p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11) OR " +
       "(p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20) OR " +
       "(p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30))"),
    "q21_late_shippers" ->
      ("SELECT s_name, count(*) AS numwait FROM supplier, lineitem l1, orders " +
       "WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey AND o_orderstatus = 'F' " +
       "AND EXISTS (SELECT 1 FROM lineitem l2 WHERE l2.l_orderkey = l1.l_orderkey " +
       "AND l2.l_suppkey <> l1.l_suppkey) " +
       "AND NOT EXISTS (SELECT 1 FROM lineitem l3 WHERE l3.l_orderkey = l1.l_orderkey " +
       "AND l3.l_suppkey <> l1.l_suppkey AND l3.l_shipdate > l1.l_shipdate) " +
       "GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 25"),
    "q22_idle_balance" ->
      ("SELECT n_name, count(*) AS numcust, " +
       "CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,6))), 2) AS DOUBLE) AS totacctbal " +
       "FROM customer, nation WHERE c_nationkey = n_nationkey " +
       "AND c_acctbal > (SELECT avg(c2.c_acctbal) FROM customer c2 WHERE c2.c_acctbal > 0) " +
       "AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey " +
       "AND o_orderpriority = '5-LOW') " +
       "GROUP BY n_name ORDER BY n_name"),
    "q2_min_cost_supplier" ->
      ("SELECT p_partkey, s_suppkey, s_name, min_unit_price_e4 FROM (" +
       "SELECT DISTINCT l_partkey AS p_partkey, l_suppkey, unit_price_e4 AS min_unit_price_e4 FROM (" +
       "SELECT l_partkey, l_suppkey, CAST(floor(l_extendedprice * 10000.0 / l_quantity) AS BIGINT) AS unit_price_e4, " +
       "min(CAST(floor(l_extendedprice * 10000.0 / l_quantity) AS BIGINT)) OVER (PARTITION BY l_partkey) AS min_unit " +
       "FROM lineitem JOIN part ON l_partkey = p_partkey AND p_size = 10) " +
       "WHERE unit_price_e4 = min_unit) " +
       "JOIN supplier ON l_suppkey = s_suppkey ORDER BY p_partkey, s_suppkey"),
    // the oracle is the UNSALTED join: salting must be invisible
    "q_salted_join" ->
      ("SELECT o_orderstatus, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue, " +
       "count(*) AS n_items FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
       "GROUP BY o_orderstatus ORDER BY o_orderstatus"),
    // the oracle is the plain LEFT JOIN: unmatched big-side rows must
    // surface exactly once through the salted path
    "q_salted_join_left" ->
      ("SELECT coalesce(o_orderstatus, '(none)') AS status_bucket, " +
       "round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue, " +
       "count(*) AS n_items FROM lineitem LEFT JOIN " +
       "(SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderstatus = 'F') o " +
       "ON l_orderkey = o_orderkey GROUP BY 1 ORDER BY 1"),
    // the oracle is the NAIVE non-equi BETWEEN join: binning must be invisible
    "q_range_join" ->
      ("WITH w AS (SELECT o_custkey AS window_cust, CAST(min(o_orderdate) AS DATE) AS w_start, " +
       "CAST(min(o_orderdate) AS DATE) + 90 AS w_end FROM orders WHERE o_custkey <= 200 GROUP BY o_custkey), " +
       "p AS (SELECT CAST(o_orderdate AS DATE) AS d, o_totalprice FROM orders) " +
       "SELECT w.window_cust, w.w_start, w.w_end, count(*) AS n_orders, " +
       "round(sum(p.o_totalprice), 2) AS total_price " +
       "FROM w JOIN p ON p.d BETWEEN w.w_start AND w.w_end " +
       "GROUP BY 1, 2, 3 ORDER BY window_cust"),
    "q8_market_share" ->
      ("SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year, " +
       "CAST(round(sum(CASE WHEN sn.n_name = 'NATION_3' THEN " +
       "CAST(l_extendedprice AS DECIMAL(18,6)) * (1 - CAST(l_discount AS DECIMAL(18,6))) " +
       "ELSE CAST(0 AS DECIMAL(18,6)) END) / " +
       "sum(CAST(l_extendedprice AS DECIMAL(18,6)) * (1 - CAST(l_discount AS DECIMAL(18,6)))), 6) AS DOUBLE) AS mkt_share " +
       "FROM lineitem JOIN part ON l_partkey = p_partkey AND p_type = 'STANDARD' " +
       "JOIN orders ON l_orderkey = o_orderkey " +
       "JOIN supplier ON l_suppkey = s_suppkey " +
       "JOIN nation sn ON s_nationkey = sn.n_nationkey " +
       "WHERE o_custkey IN (SELECT c_custkey FROM customer " +
       "JOIN nation cn ON c_nationkey = cn.n_nationkey " +
       "JOIN region ON cn.n_regionkey = r_regionkey AND r_name = 'EUROPE') " +
       "GROUP BY o_year ORDER BY o_year"),
    "q9_product_profit" ->
      ("SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year, " +
       "CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6)) * " +
       "(1 - CAST(l_discount AS DECIMAL(18,6))) - " +
       "CAST(0.5 AS DECIMAL(18,6)) * CAST(p_retailprice AS DECIMAL(18,6)) * " +
       "CAST(l_quantity AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_profit " +
       "FROM lineitem JOIN part ON l_partkey = p_partkey AND p_type = 'PROMO' " +
       "JOIN orders ON l_orderkey = o_orderkey " +
       "JOIN supplier ON l_suppkey = s_suppkey " +
       "JOIN nation ON s_nationkey = n_nationkey " +
       // GROUP BY the base column: the bare alias `nation` binds to the
       // TABLE nation in DuckDB's scope, not the select-list alias
       "GROUP BY n_name, o_year ORDER BY n_name, o_year DESC"),
    "q11_important_parts" ->
      ("WITH pv AS (SELECT l_partkey AS p_partkey, " +
       "sum(CAST(l_extendedprice AS DECIMAL(18,6)) * (1 - CAST(l_discount AS DECIMAL(18,6)))) AS part_value " +
       "FROM lineitem WHERE l_suppkey IN (SELECT s_suppkey FROM supplier " +
       "JOIN nation ON s_nationkey = n_nationkey AND n_name = 'NATION_1') " +
       "GROUP BY l_partkey) " +
       "SELECT p_partkey, CAST(round(part_value, 2) AS DOUBLE) AS part_value FROM pv " +
       "WHERE part_value > (SELECT sum(part_value) * CAST(0.001 AS DECIMAL(18,6)) FROM pv) " +
       "ORDER BY part_value DESC, p_partkey"),
    "q12_ship_delay_priority" ->
      ("SELECT CAST(floor(date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) / 30.0) * 30 AS BIGINT) AS delay_band, " +
       "CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count, " +
       "CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count " +
       "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
       "WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00' " +
       "GROUP BY delay_band ORDER BY delay_band"),
    "q16_supplier_relation" ->
      ("SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt " +
       "FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) " +
       "JOIN part ON l_partkey = p_partkey " +
       "WHERE p_brand <> 'Brand#5' AND p_size IN (1, 4, 9, 14, 19, 24, 29, 34) " +
       "AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0) " +
       "GROUP BY p_brand, p_type, p_size " +
       "ORDER BY supplier_cnt DESC, p_brand, p_type, p_size"),
    "q20_volume_suppliers" ->
      ("WITH li96 AS (SELECT l_partkey, l_suppkey, l_quantity FROM lineitem " +
       "WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00' " +
       "AND l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'PROMO')), " +
       "ps AS (SELECT l_partkey, l_suppkey, sum(l_quantity) AS supp_qty FROM li96 GROUP BY 1, 2), " +
       "pt AS (SELECT l_partkey, sum(l_quantity) AS total_qty FROM li96 GROUP BY 1) " +
       "SELECT s_suppkey, s_name, n_name FROM supplier " +
       "JOIN nation ON s_nationkey = n_nationkey " +
       "WHERE s_suppkey IN (SELECT DISTINCT ps.l_suppkey FROM ps JOIN pt ON ps.l_partkey = pt.l_partkey " +
       "WHERE supp_qty > total_qty * 0.25) " +
       "ORDER BY s_suppkey")
  )

  val extensions: Map[String, Q] = Map(
    "text_stats" -> (TextAnalysis.stats _),
    "text_quality" -> (TextAnalysis.quality _),
    "text_quality_classifier" -> ((s: SparkSession, d: String) =>
      TextAnalysis.qualityClassifier(s, d)),
    "text_lang_guess" -> (TextAnalysis.langGuess _),
    "text_fingerprints" -> (TextAnalysis.fingerprints _),
    "text_per_source_stats" -> (TextAnalysis.perSourceStats _),
    "text_token_counts" -> (TextAnalysis.tokenCounts _),
    "text_tfidf_top_terms" -> ((s: SparkSession, d: String) => TextAnalysis.tfidfTopTerms(s, d)),
    "text_rolling_hash" -> (TextAnalysis.rollingFingerprints _),
    "text_quality_gate" -> ((s: SparkSession, d: String) => TextAnalysis.qualityGate(s, d)),
    "sim_embed_quantized" -> (Similarity.quantizeEmbeddings _),
    "dedup_exact_summary" -> (Dedup.exactSummary _),
    "dedup_fingerprint_groups" -> (Dedup.fingerprintGroups _),
    "dedup_jaccard_pairs" -> (Dedup.jaccardPairsSampled _),
    "dedup_minhash_lsh" -> (Dedup.minhashLshPairs _),
    "dedup_simhash" -> (Dedup.simhashes _),
    "dedup_clusters" -> ((s: SparkSession, d: String) => Dedup.dedupClusters(s, d)),
    "dedup_shingle_pairs" -> (Dedup.shingleLshPairs _),
    "dedup_report" -> (Dedup.dedupReport _),
    "dedup_survivors" -> (Dedup.dedupSurvivors _),
    "text_length_histogram" -> ((s: SparkSession, d: String) => TextAnalysis.lengthHistogram(s, d)),
    "text_top_bigrams" -> ((s: SparkSession, d: String) => TextAnalysis.topBigrams(s, d)),
    "text_doc_packing" -> ((s: SparkSession, d: String) => TextAnalysis.docPacking(s, d)),
    "q_profile_columns" -> (Analytics.profileColumns _),
    "q_cohort_retention" -> ((s: SparkSession, d: String) => Analytics.cohortRetention(s, d)),
    "text_lm_score" -> (TextAnalysis.lmScore _),
    "pipeline_curation_manifest" ->
      ((s: SparkSession, d: String) => TextAnalysis.curationManifest(s, d)),
    "dedup_incremental" -> ((s: SparkSession, d: String) => Dedup.incrementalDedup(s, d)),
    "dedup_incremental_indexed" ->
      ((s: SparkSession, d: String) => Dedup.incrementalDedupServed(s, d)),
    "text_contamination" -> ((s: SparkSession, d: String) => TextAnalysis.contamination(s, d)),
    "text_repetition" -> (TextAnalysis.repetition _),
    "knn_quantized_rerank" -> ((s: SparkSession, d: String) => Similarity.knnQuantizedRerank(s, d)),
    "knn_pq_adc" -> ((s: SparkSession, d: String) => Similarity.knnPqAdc(s, d)),
    "sim_pca_project" -> ((s: SparkSession, d: String) => Similarity.pcaProject(s, d)),
    "knn_ivf_pq" -> ((s: SparkSession, d: String) => Similarity.knnIvfPq(s, d)),
    "sim_diversity_sample" -> ((s: SparkSession, d: String) => Similarity.diversitySample(s, d)),
    "knn_filtered" -> ((s: SparkSession, d: String) => Similarity.knnFiltered(s, d)),
    "dedup_simhash_pairs" -> (Dedup.simhashPairs _),
    "sim_embed_norms" -> (Similarity.norms _),
    "sim_label_centroids" -> (Similarity.labelCentroids _),
    "knn_brute_cosine" -> ((s: SparkSession, d: String) => Similarity.knnBruteForce(s, d)),
    "sim_range_search" -> ((s: SparkSession, d: String) => Similarity.rangeSearch(s, d)),
    "sim_range_search_ivf" -> ((s: SparkSession, d: String) => Similarity.rangeSearchIvfServed(s, d)),
    "knn_ivf" -> ((s: SparkSession, d: String) => Similarity.knnIvfServed(s, d)),
    "dedup_semantic" -> ((s: SparkSession, d: String) => Similarity.semanticDedup(s, d)),
    "sim_embed_near_dup" -> (Similarity.embeddingNearDupPairs _),
    "sim_embed_candidates" -> (Similarity.embeddingCandidatePairs _),
    "pipeline_quality_fusion" -> ((s: SparkSession, d: String) => Similarity.qualityFusion(s, d)),
    "mm_binary_meta" -> (Multimodal.binaryMeta _),
    "mm_feature_extract" -> (Multimodal.featureExtract _),
    "mm_dispatch_all" -> (Multimodal.dispatchAll _),
    "mm_frame_sample" -> ((s: SparkSession, d: String) => Multimodal.frameSample(s, d)),
    "mm_image_meta" -> (Multimodal.imageMeta _),
    "mm_gif_meta" -> (Multimodal.gifMeta _),
    "mm_audio_meta" -> (Multimodal.audioMeta _),
    "mm_pixel_stats" -> (Multimodal.pixelStats _),
    "mm_png_pixels" -> (Multimodal.pngPixels _),
    "mm_gif_pixels" -> (Multimodal.gifPixelsQ _),
    "mm_gif_frames" -> (Multimodal.gifFramesQ _),
    "mm_png_frames" -> (Multimodal.pngFramesQ _),
    "mm_jpeg_pixels" -> (Multimodal.jpegPixelsQ _),
    "mm_jpeg12" -> (Multimodal.jpeg12Q _),
    "mm_bmp_resize" -> (Multimodal.bmpResizeQ _),
    "mm_jpeg_color" -> (Multimodal.jpegColorQ _),
    "mm_jpeg_progressive" -> (Multimodal.jpegProgressiveQ _),
    "mm_jpeg_lossless" -> (Multimodal.jpegLosslessQ _),
    "mm_video_meta" -> (Multimodal.videoMeta _),
    "mm_mp4_meta" -> (Multimodal.mp4MetaQ _),
    "mm_webp_meta" -> (Multimodal.webpMetaQ _),
    "mm_gzip_meta" -> (Multimodal.gzipMetaQ _),
    "mm_pdf_meta" -> (Multimodal.pdfMetaQ _),
    "text_pdf_extract" -> (Multimodal.pdfTextQ _),
    "mm_zip_entries" -> (Multimodal.zipEntriesQ _),
    "mm_tar_entries" -> (Multimodal.tarEntriesQ _),
    "mm_zip_extract" -> (Multimodal.zipExtractQ _),
    "pipeline_docx_ingest" -> (Multimodal.docxIngest _),
    "text_rtf_extract" -> (Multimodal.rtfIngest _),
    "text_doc_extract" -> (Multimodal.docBinIngest _),
    "text_xls_extract" -> (Multimodal.xlsBinIngest _),
    "text_ppt_extract" -> (Multimodal.pptBinIngest _),
    "text_pdf_encrypted" -> (Multimodal.pdfEncryptedTextQ _),
    "text_pdf_cmap" -> (Multimodal.pdfCMapTextQ _),
    "mm_cfb_entries" -> (Multimodal.cfbEntriesQ _),
    "text_odt_extract" -> (Multimodal.odtIngest _),
    "pipeline_ods_ingest" -> (Multimodal.odsIngest _),
    "pipeline_odp_ingest" -> (Multimodal.odpIngest _),
    "pipeline_xlsx_ingest" -> (Multimodal.xlsxIngest _),
    "pipeline_pptx_ingest" -> (Multimodal.pptxIngest _),
    "pipeline_epub_ingest" -> (Multimodal.epubIngest _),
    "pipeline_office_ingest" -> (Multimodal.officeIngest _),
    "pipeline_doc_triage" -> (Multimodal.docTriage _),
    "mm_warc_records" -> (Multimodal.warcRecordsQ _),
    "pipeline_warc_ingest" -> (Multimodal.warcIngest _),
    "pipeline_http_ingest" -> (Multimodal.warcHttpIngest _),
    "pipeline_pdf_ingest" -> (Multimodal.warcPdfIngest _),
    "pipeline_http_charset" -> (Multimodal.httpCharsetIngest _),
    "text_robots_rules" -> (Html.robotsRules _),
    "text_sitemap_urls" -> (Html.sitemapUrls _),
    "pipeline_robots_gate" -> (Html.robotsGate _),
    "mm_avif_meta" -> (Multimodal.avifMetaQ _),
    "mm_flac_meta" -> (Multimodal.flacMetaQ _),
    "mm_mp3_meta" -> (Multimodal.mp3MetaQ _),
    "mm_exif_meta" -> (Multimodal.exifMetaQ _),
    "mm_flac_tags" -> (Multimodal.flacTagsQ _),
    "mm_mp3_tags" -> (Multimodal.mp3TagsQ _),
    "mm_tiff_pixels" -> (Multimodal.tiffPixelsQ _),
    "mm_video_frames" -> (Multimodal.videoFrames _),
    "mm_audio_pcm" -> (Multimodal.audioPcm _),
    "mm_audio_g711" -> (Multimodal.audioG711 _),
    "mm_audio_float" -> (Multimodal.audioFloat _),
    "text_sample_stratified" -> ((s: SparkSession, d: String) => TextAnalysis.sampleStratified(s, d)),
    "pipeline_weighted_sample" -> ((s: SparkSession, d: String) => TextAnalysis.weightedSample(s, d)),
    "text_heavy_hitters" -> ((s: SparkSession, d: String) => TextAnalysis.heavyHitters(s, d)),
    "text_bpe_pairs" -> ((s: SparkSession, d: String) => TextAnalysis.bpePairs(s, d)),
    "text_bpe_merges" -> ((s: SparkSession, d: String) => TextAnalysis.bpeMerges(s, d)),
    "text_bpe_tokenize" -> ((s: SparkSession, d: String) => TextAnalysis.bpeTokenize(s, d)),
    "text_clean" -> ((s: SparkSession, d: String) => TextAnalysis.clean(s, d)),
    "dedup_paragraphs" -> ((s: SparkSession, d: String) => Dedup.paragraphDedup(s, d)),
    "dedup_paragraph_flags" -> ((s: SparkSession, d: String) => Dedup.paragraphFlags(s, d)),
    "dedup_substrings" -> ((s: SparkSession, d: String) => Dedup.substringDedup(s, d)),
    "dedup_substring_scrub" -> ((s: SparkSession, d: String) => Dedup.substringScrub(s, d)),
    "text_html_extract" -> (Html.htmlExtract _),
    "text_html_links" -> (Html.htmlLinks _),
    "pipeline_domain_blocklist" -> (Html.domainBlocklist _),
    "q_merge_upsert" -> (Changes.mergeUpsert _),
    "q_lake_pushdown_scan" -> (Lake.pushdownScan _),
    "q_lake_agg_pushdown" -> (Lake.aggPushdown _),
    "q_lake_group_pushdown" -> (Lake.groupAggPushdown _),
    "q_lake_spj_join" -> (Lake.spjJoin _),
    "q_lake_runtime_prune" -> (Lake.runtimePrune _),
    "q_scd2_user_state" -> (Changes.scd2UserState _),
    "dedup_url_groups" -> (Html.urlDupGroups _),
    "pipeline_domain_cap" -> ((s: SparkSession, d: String) => Html.domainCap(s, d)),
    "text_chunks" -> ((s: SparkSession, d: String) => TextAnalysis.chunks(s, d)),
    "text_pii_redact" -> (TextAnalysis.piiRedact _),
    "pipeline_quality_report" -> (Quality.report _),
    "text_inverted_index" -> (Search.invertedIndex _),
    "text_search_and" -> ((s: SparkSession, d: String) => Search.searchAll(s, d)),
    "text_search_bm25" -> ((s: SparkSession, d: String) => Search.searchBm25(s, d)),
    "text_search_phrase" -> ((s: SparkSession, d: String) => Search.searchPhrase(s, d)),
    "text_search_indexed" -> ((s: SparkSession, d: String) => Search.searchAllIndexed(s, d)),
    "text_search_bm25_indexed" -> ((s: SparkSession, d: String) => Search.searchBm25Indexed(s, d)),
    "text_collocations_pmi" -> ((s: SparkSession, d: String) => Search.collocationsPmi(s, d)),
    "q_pagerank_suppliers" -> (Graph.pagerankSuppliers _)
  )

  // Shared oracle fragments: DuckDB twins of TextFunctions.normalize /
  // tokens / fingerprint. Spark regexp_replace is global; DuckDB needs
  // the explicit 'g' flag.
  private val duckNorm = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
  private val duckToks = s"string_split($duckNorm, ' ')"
  private val duckUniq = s"list_distinct($duckToks)"
  // Postings table (token, doc_id, tf) — the DuckDB twin of
  // Search.postings, built from the same tokenizer.
  private val duckPostings =
    s"SELECT token, doc_id, count(*) AS tf FROM " +
    s"(SELECT doc_id, unnest($duckToks) AS token FROM documents) GROUP BY token, doc_id"
  private val duckTermsIn =
    graft.operators.Search.QueryTerms.mkString("('", "', '", "')")
  private val duckFp = s"md5(array_to_string(list_sort($duckUniq), ' '))"
  private def duckHits(words: Seq[String]): String =
    s"CAST(len(list_filter($duckToks, t -> list_contains(${words.mkString("['", "', '", "']")}, t))) AS BIGINT)"

  // BPE training fragments: corpus word-frequency table + per-word
  // character symbols (string_split(word, '') — the exact twin of the
  // engine's substr-indexed charSyms), and the adjacent-pair count
  // template parameterized by the vocab CTE of a given round.
  private val duckBpeVocab =
    s"wf AS (SELECT word, count(*) AS freq FROM " +
    s"(SELECT unnest($duckToks) AS word FROM documents) " +
    "WHERE len(word) > 0 GROUP BY word), " +
    "v0 AS (SELECT freq, string_split(word, '') AS s FROM wf)"
  private def duckBpePairs(v: String): String =
    s"SELECT s[g] AS a, s[g+1] AS b, sum(freq) AS cnt FROM $v, " +
    "unnest(generate_series(1, len(s) - 1)) AS t(g) " +
    "WHERE len(s) >= 2 GROUP BY 1, 2"

  // DuckDB twin of TextFunctions.qualityScore (shared by text_quality
  // and the percentile gate)
  private val duckQuality =
    s"round(least(1.0, CAST(len($duckToks) AS DOUBLE) / 100.0) * 0.5 + " +
    s"CAST(len($duckUniq) AS DOUBLE) / len($duckToks) * 0.5, 4)"

  // DuckDB twin of Dedup.simhashes: same md5-derived 64-bit token hash
  // (two unsigned 32-bit hex halves), same +/-1 bit votes, same additive
  // two's-complement reassembly. Generated, not hand-typed, so the 64
  // terms stay mechanically in sync with SimhashBitWeight.
  private val duckSimhashCte: String = {
    val bitSums = (0 until 64).map { i =>
      val half = if (i < 32) s"(lo >> $i)" else s"(hi >> ${i - 32})"
      s"SUM(CASE WHEN ($half & 1) = 1 THEN 1 ELSE -1 END) AS b$i"
    }.mkString(", ")
    // bit 63's weight written as (-MAX - 1) to stay a BIGINT literal
    // (DuckDB parses -9223372036854775808 via HUGEINT promotion, which
    // would leak int128 into the result type)
    val assemble = (0 until 64).map { i =>
      val w = if (i == 63) "(-9223372036854775807 - 1)" else (1L << i).toString
      s"CASE WHEN b$i > 0 THEN $w ELSE 0 END"
    }.mkString(" + ")
    s"WITH toks AS (SELECT doc_id, unnest($duckUniq) AS tok FROM documents), " +
    "h AS (SELECT doc_id, ('0x' || substr(md5(tok), 1, 8))::BIGINT AS hi, " +
    "('0x' || substr(md5(tok), 9, 8))::BIGINT AS lo FROM toks), " +
    s"v AS (SELECT doc_id, $bitSums FROM h GROUP BY doc_id), " +
    s"sim AS (SELECT doc_id, CAST($assemble AS BIGINT) AS simhash FROM v) "
  }

  /** DuckDB twin of Similarity.bucketPairs: the 8 random-hyperplane sign
    * bits (identical plane literals, generated from the one Scala
    * source) -> bucket equi-join -> cosine. Verifies the bucketing
    * machinery itself — including that an empty near-dup result on a
    * corpus with no true near-dups is CORRECT, not vacuous. */
  private def simBucketPairsSql(threshold: Option[Double]): String = {
    val planes = graft.operators.Similarity.duckPlaneLiterals
    val bits = planes.zipWithIndex.map { case (p, j) =>
      s"(CASE WHEN list_dot_product(v, $p) >= 0 THEN ${1L << j} ELSE 0 END)"
    }.mkString(" + ")
    val where = threshold.map(t => s"WHERE cos_sim >= $t ").getOrElse("")
    "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings), " +
    s"b AS (SELECT vec_id, v, $bits AS bucket FROM e), " +
    "p AS (SELECT a.vec_id AS vec_a, c.vec_id AS vec_b, " +
    "round(list_dot_product(a.v, c.v) / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(c.v, c.v))), 4) AS cos_sim " +
    "FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id) " +
    s"SELECT vec_a, vec_b, cos_sim FROM p ${where}ORDER BY vec_a, vec_b"
  }

  /** Shared recursive-reachability CTE chain for the dedup cluster
    * oracles; trailing comma so consumers append their own final CTE /
    * SELECT. */
  private val dedupClustersCte: String =
    s"WITH RECURSIVE t AS (SELECT doc_id, $duckUniq AS toks FROM documents), " +
    "p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, " +
    "round(CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) / " +
    "len(list_distinct(list_concat(a.toks, b.toks))), 4) AS jaccard " +
    "FROM t a, t b WHERE a.doc_id < b.doc_id), " +
    "e AS (SELECT doc_a AS src, doc_b AS dst FROM p WHERE jaccard >= 0.8 " +
    "UNION ALL SELECT doc_b AS src, doc_a AS dst FROM p WHERE jaccard >= 0.8), " +
    "reach AS (SELECT doc_id, doc_id AS label FROM documents " +
    "UNION SELECT e.src AS doc_id, r.label FROM e JOIN reach r ON e.dst = r.doc_id) "

  val extensionOracles: Map[String, String] = Map(
    "sim_embed_near_dup" -> simBucketPairsSql(Some(0.95)),
    "sim_embed_candidates" -> simBucketPairsSql(None),
    "text_stats" ->
      (s"SELECT doc_id, length(text) AS n_chars_actual, CAST(len($duckToks) AS BIGINT) AS n_tokens, " +
       s"CAST(len($duckUniq) AS BIGINT) AS n_uniq_tokens, " +
       s"round(CAST(len($duckUniq) AS DOUBLE) / len($duckToks), 4) AS uniq_ratio, " +
       s"CAST(ceil(CAST(length($duckNorm) AS DOUBLE) / 4.0) AS BIGINT) AS n_subwords " +
       "FROM documents ORDER BY doc_id"),
    "text_tfidf_top_terms" ->
      (s"WITH tok AS (SELECT doc_id, unnest($duckToks) AS term FROM documents), " +
       "tf AS (SELECT doc_id, term, count(*) AS cnt FROM tok GROUP BY doc_id, term), " +
       s"dl AS (SELECT doc_id, CAST(len($duckToks) AS BIGINT) AS n_tok FROM documents), " +
       "df AS (SELECT term, count(*) AS df FROM tf GROUP BY term), " +
       "n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents), " +
       "s AS (SELECT tf.doc_id, tf.term, round((CAST(cnt AS DOUBLE) / n_tok) * ln(n / df), 6) AS tfidf " +
       "FROM tf JOIN dl ON tf.doc_id = dl.doc_id JOIN df ON tf.term = df.term CROSS JOIN n), " +
       "r AS (SELECT doc_id, term, tfidf, CAST(row_number() OVER " +
       "(PARTITION BY doc_id ORDER BY tfidf DESC, term) AS BIGINT) AS rank FROM s) " +
       "SELECT doc_id, term, tfidf, rank FROM r WHERE rank <= 3 ORDER BY doc_id, rank"),
    "text_quality_gate" ->
      // the n_src = 1 escape mirrors the engine: a single-document
      // source's percent_rank is 0.0, and the relative gate must not
      // delete the scarce sources it exists to protect
      (s"WITH q AS (SELECT doc_id, source, $duckQuality AS quality FROM documents), " +
       "p AS (SELECT doc_id, source, quality, percent_rank() OVER " +
       "(PARTITION BY source ORDER BY quality, doc_id) AS pr, " +
       "count(*) OVER (PARTITION BY source) AS n_src FROM q) " +
       "SELECT doc_id, source, quality, round(pr, 6) AS pr FROM p " +
       "WHERE pr >= 0.6 OR n_src = 1 ORDER BY doc_id"),
    "sim_embed_quantized" ->
      ("WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings), " +
       "d AS (SELECT vec_id, unnest(v) AS x, CAST(unnest(range(1, len(v) + 1)) AS BIGINT) AS dim FROM e), " +
       "st AS (SELECT dim, min(x) AS lo, max(x) AS hi FROM d GROUP BY dim), " +
       "c AS (SELECT vec_id, x, lo, hi, CASE WHEN hi = lo THEN 0 ELSE " +
       "CAST(round((x - lo) * 255.0 / (hi - lo), 0) AS INTEGER) END AS code " +
       "FROM d JOIN st ON d.dim = st.dim) " +
       "SELECT vec_id, round(sqrt(avg(pow(x - (lo + code * (hi - lo) / 255.0), 2))) * 1000.0, 6) AS rmse_x1000, " +
       "CAST(sum(code) AS BIGINT) AS code_sum FROM c GROUP BY vec_id ORDER BY vec_id"),
    "text_quality" ->
      (s"SELECT doc_id, q AS quality, q > 0.6 AS keep FROM (SELECT doc_id, " +
       s"$duckQuality AS q " +
       "FROM documents) ORDER BY doc_id"),
    "text_lang_guess" ->
      (s"SELECT doc_id, lang AS lang_label, hits_en, hits_de, hits_fr, hits_es, " +
       "CASE WHEN hits_en >= hits_de AND hits_en >= hits_fr AND hits_en >= hits_es THEN 'en' " +
       "WHEN hits_de >= hits_fr AND hits_de >= hits_es THEN 'de' " +
       "WHEN hits_fr >= hits_es THEN 'fr' ELSE 'es' END AS lang_guess FROM (" +
       s"SELECT doc_id, lang, ${duckHits(graft.functions.TextFunctions.stopwords("en"))} AS hits_en, " +
       s"${duckHits(graft.functions.TextFunctions.stopwords("de"))} AS hits_de, " +
       s"${duckHits(graft.functions.TextFunctions.stopwords("fr"))} AS hits_fr, " +
       s"${duckHits(graft.functions.TextFunctions.stopwords("es"))} AS hits_es " +
       "FROM documents) ORDER BY doc_id"),
    "text_fingerprints" ->
      (s"SELECT doc_id, $duckFp AS fp FROM documents ORDER BY doc_id"),
    "text_rolling_hash" ->
      (s"SELECT doc_id, $duckFp AS fp_set, " +
       // NULL guard: list_prepend(0, NULL) is [0] in DuckDB, which
       // would hash a NULL text to 0 where Spark propagates NULL
       "CASE WHEN text IS NULL THEN NULL ELSE " +
       s"list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform($duckToks, " +
       "t -> ('0x' || substr(md5(t), 1, 8))::BIGINT)), " +
       "(acc, h) -> (acc * 31 + h) % 2147483647) END AS fp_rolling " +
       "FROM documents ORDER BY doc_id"),
    "text_token_counts" ->
      (s"SELECT doc_id, CAST(len($duckToks) AS BIGINT) AS n_ws_tokens, " +
       "CAST(len(regexp_extract_all(text, ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+')) AS BIGINT) AS n_bpe_tokens " +
       "FROM documents ORDER BY doc_id"),
    "text_per_source_stats" ->
      (s"SELECT source, count(*) AS n_docs, " +
       s"round(avg(CAST(len($duckToks) AS DOUBLE)), 4) AS avg_tokens, " +
       s"round(avg(round(least(1.0, CAST(len($duckToks) AS DOUBLE) / 100.0) * 0.5 + " +
       s"CAST(len($duckUniq) AS DOUBLE) / len($duckToks) * 0.5, 4)), 4) AS avg_quality, " +
       s"count(DISTINCT $duckFp) AS n_distinct_fps " +
       "FROM documents GROUP BY source ORDER BY source"),
    "dedup_exact_summary" ->
      (s"SELECT count(*) AS n_docs, count(DISTINCT md5(text)) AS n_distinct_texts, " +
       s"count(DISTINCT $duckFp) AS n_distinct_fps FROM documents"),
    "dedup_fingerprint_groups" ->
      (s"SELECT fp, count(*) AS n_docs, min(doc_id) AS min_doc_id FROM " +
       s"(SELECT doc_id, $duckFp AS fp FROM documents) " +
       "GROUP BY fp HAVING count(*) > 1 ORDER BY fp"),
    "dedup_incremental" ->
      (s"WITH t AS (SELECT doc_id, $duckUniq AS toks FROM documents) " +
       "SELECT new_doc_id, dup_of, jaccard FROM (" +
       "SELECT n.doc_id AS new_doc_id, o.doc_id AS dup_of, " +
       "round(CAST(len(list_intersect(o.toks, n.toks)) AS DOUBLE) / " +
       "len(list_distinct(list_concat(o.toks, n.toks))), 4) AS jaccard " +
       "FROM (SELECT * FROM t WHERE doc_id % 10 = 0) n, " +
       "(SELECT * FROM t WHERE doc_id % 10 <> 0) o) " +
       "WHERE jaccard >= 0.8 ORDER BY new_doc_id, dup_of"),
    // served from the persisted corpus index — same contract, same
    // exact cross-side Jaccard twin as dedup_incremental
    "dedup_incremental_indexed" ->
      (s"WITH t AS (SELECT doc_id, $duckUniq AS toks FROM documents) " +
       "SELECT new_doc_id, dup_of, jaccard FROM (" +
       "SELECT n.doc_id AS new_doc_id, o.doc_id AS dup_of, " +
       "round(CAST(len(list_intersect(o.toks, n.toks)) AS DOUBLE) / " +
       "len(list_distinct(list_concat(o.toks, n.toks))), 4) AS jaccard " +
       "FROM (SELECT * FROM t WHERE doc_id % 10 = 0) n, " +
       "(SELECT * FROM t WHERE doc_id % 10 <> 0) o) " +
       "WHERE jaccard >= 0.8 ORDER BY new_doc_id, dup_of"),
    "text_lm_score" ->
      (s"WITH tok AS (SELECT doc_id, unnest($duckToks) AS term FROM documents), " +
       "freq AS (SELECT term, count(*) AS tf FROM tok GROUP BY term), " +
       "tot AS (SELECT CAST(count(*) AS DOUBLE) AS n_total FROM tok) " +
       "SELECT doc_id, round(avg(-ln(tf / n_total)), 4) AS nll, " +
       "count(*) AS n_tokens FROM tok JOIN freq USING (term), tot " +
       "GROUP BY doc_id ORDER BY doc_id"),
    "dedup_jaccard_pairs" ->
      (s"WITH t AS (SELECT doc_id, $duckUniq AS toks FROM documents WHERE doc_id % 5 = 0) " +
       "SELECT doc_a, doc_b, jaccard FROM (" +
       "SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, " +
       "round(CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) / " +
       "len(list_distinct(list_concat(a.toks, b.toks))), 4) AS jaccard " +
       "FROM t a, t b WHERE a.doc_id < b.doc_id) " +
       "WHERE jaccard >= 0.5 ORDER BY doc_a, doc_b"),
    // MinHash LSH: the banding is not SQL-portable (xxhash64), but the
    // *verified* output contract is "all pairs with exact Jaccard >=
    // 0.8" — at the banding parameters in Dedup the miss probability is
    // ~3e-8, and on the driver's fixed sf0.01 corpus recall is exactly
    // 1.0 (checked differentially), so the exact-pairs oracle holds.
    "dedup_minhash_lsh" ->
      (s"WITH t AS (SELECT doc_id, $duckUniq AS toks FROM documents) " +
       "SELECT doc_a, doc_b, jaccard FROM (" +
       "SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, " +
       "round(CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) / " +
       "len(list_distinct(list_concat(a.toks, b.toks))), 4) AS jaccard " +
       "FROM t a, t b WHERE a.doc_id < b.doc_id) " +
       "WHERE jaccard >= 0.8 ORDER BY doc_a, doc_b"),
    // Connected components via recursive reachability: every label a doc
    // can reach through the >=0.8-exact-Jaccard graph, then min per doc.
    // Valid as the LSH-cluster oracle for the same reason as
    // dedup_minhash_lsh: pair recall is 1.0 on this corpus (differential
    // test), so both sides close over an identical edge set.
    "dedup_clusters" ->
      (dedupClustersCte +
       "SELECT doc_id, min(label) AS cluster_id, min(label) = doc_id AS is_canonical " +
       "FROM reach GROUP BY doc_id ORDER BY doc_id"),
    "dedup_report" ->
      (dedupClustersCte +
       ", c AS (SELECT doc_id, min(label) AS cluster_id, min(label) = doc_id AS is_canonical " +
       "FROM reach GROUP BY doc_id) " +
       "SELECT count(*) AS n_docs, count(DISTINCT cluster_id) AS n_clusters, " +
       "CAST(sum(CASE WHEN is_canonical THEN 1 ELSE 0 END) AS BIGINT) AS n_canonical, " +
       "round(CAST(count(DISTINCT cluster_id) AS DOUBLE) / count(*), 4) AS keep_ratio FROM c"),
    "pipeline_curation_manifest" ->
      (dedupClustersCte +
       ", c AS (SELECT doc_id, min(label) AS cluster_id FROM reach GROUP BY doc_id), " +
       "surv AS (SELECT doc_id FROM c WHERE doc_id = cluster_id), " +
       s"kept AS (SELECT doc_id, source, CAST(len($duckToks) AS BIGINT) AS n_tokens " +
       s"FROM documents WHERE $duckQuality > 0.5 " +
       "AND doc_id IN (SELECT doc_id FROM surv)), " +
       "pk AS (SELECT doc_id, source, n_tokens, CAST(floor((sum(n_tokens) OVER " +
       "(PARTITION BY source ORDER BY doc_id) - n_tokens) / 2048.0) AS BIGINT) AS seq_id FROM kept) " +
       "SELECT doc_id, source, seq_id, n_tokens FROM pk ORDER BY doc_id"),
    // Shingle near-dups: same recall argument as dedup_minhash_lsh —
    // banding at these parameters misses a 0.8-pair w.p. ~3e-8, and
    // recall is exactly 1.0 on the fixed corpus (differential test), so
    // the exact all-pairs oracle holds.
    "dedup_shingle_pairs" ->
      (s"WITH t AS (SELECT doc_id, $duckToks AS tk FROM documents), " +
       "s AS (SELECT doc_id, list_distinct(list_transform(range(1, len(tk) - 1), " +
       "i -> array_to_string(list_slice(tk, i, i + 2), ' '))) AS sh FROM t WHERE len(tk) >= 3) " +
       "SELECT doc_a, doc_b, jaccard FROM (" +
       "SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, " +
       "round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / " +
       "len(list_distinct(list_concat(a.sh, b.sh))), 4) AS jaccard " +
       "FROM s a JOIN s b ON a.doc_id < b.doc_id) " +
       "WHERE jaccard >= 0.8 ORDER BY doc_a, doc_b"),
    "dedup_simhash" ->
      (duckSimhashCte + "SELECT doc_id, simhash FROM sim ORDER BY doc_id"),
    // Hamming<=3 via 4x16-bit pigeonhole banding on the Spark side is
    // EXACT (a <=3-bit-differing pair always shares an intact band), so
    // the brute-force all-pairs oracle is a true twin, not approximate.
    "dedup_simhash_pairs" ->
      (duckSimhashCte +
       "SELECT doc_a, doc_b, hamming FROM (" +
       "SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, " +
       "CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming " +
       "FROM sim a JOIN sim b ON a.doc_id < b.doc_id) " +
       "WHERE hamming <= 3 ORDER BY doc_a, doc_b"),
    "dedup_survivors" ->
      (dedupClustersCte +
       ", c AS (SELECT doc_id, min(label) AS cluster_id FROM reach GROUP BY doc_id) " +
       "SELECT cluster_id AS doc_id, count(*) AS n_members, count(*) > 1 AS is_dup_cluster " +
       "FROM c GROUP BY cluster_id ORDER BY doc_id"),
    "text_length_histogram" ->
      (s"SELECT source, CAST((len($duckToks) // 20) * 20 AS BIGINT) AS bucket_lo, " +
       "count(*) AS n_docs FROM documents GROUP BY source, bucket_lo " +
       "ORDER BY source, bucket_lo"),
    "text_top_bigrams" ->
      (s"SELECT bigram, count(*) AS n FROM (SELECT unnest(list_transform(range(1, len(tk)), " +
       "i -> tk[i] || ' ' || tk[i + 1])) AS bigram FROM " +
       s"(SELECT $duckToks AS tk FROM documents)) " +
       "GROUP BY bigram ORDER BY n DESC, bigram LIMIT 25"),
    // BPE round-0 pair-frequency table: the quantity the tokenizer
    // trainer's first merge maximizes — statically SQL-expressible
    // (the trained merge list itself is oracled post-run, bpeOracles)
    "text_bpe_pairs" ->
      (s"WITH $duckBpeVocab, p AS (${duckBpePairs("v0")}) " +
       "SELECT a, b, CAST(cnt AS BIGINT) AS cnt FROM p " +
       "ORDER BY cnt DESC, a, b LIMIT 50"),
    "text_doc_packing" ->
      (s"WITH d AS (SELECT source, doc_id, CAST(len($duckToks) AS BIGINT) AS tok FROM documents), " +
       "b AS (SELECT source, doc_id, tok, CAST(floor((sum(tok) OVER " +
       "(PARTITION BY source ORDER BY doc_id) - tok) / 2048.0) AS BIGINT) AS seq_id FROM d) " +
       "SELECT source, seq_id, count(*) AS n_docs, CAST(sum(tok) AS BIGINT) AS n_tokens " +
       "FROM b GROUP BY source, seq_id ORDER BY source, seq_id"),
    "text_contamination" ->
      (s"WITH tk AS (SELECT doc_id, $duckToks AS t FROM documents), " +
       "g AS (SELECT doc_id, list_distinct(list_transform(range(1, len(t) - 2), " +
       "i -> array_to_string(t[i:i+3], ' '))) AS gs FROM tk WHERE len(t) >= 4), " +
       "e AS (SELECT doc_id, CAST(len(gs) AS BIGINT) AS n_grams, unnest(gs) AS gram FROM g), " +
       "bench AS (SELECT DISTINCT gram FROM e WHERE doc_id % 50 = 0) " +
       "SELECT doc_id, count(*) AS n_hits, any_value(n_grams) AS n_grams, " +
       "round(count(*) / any_value(n_grams), 4) AS contamination_ratio " +
       "FROM e JOIN bench USING (gram) WHERE doc_id % 50 <> 0 " +
       "GROUP BY doc_id ORDER BY doc_id"),
    "text_repetition" ->
      (s"SELECT doc_id, CAST(coalesce(len(g), 0) AS BIGINT) AS n_grams_total, " +
       "CAST(coalesce(len(list_distinct(g)), 0) AS BIGINT) AS n_grams_distinct, " +
       "CASE WHEN coalesce(len(g), 0) > 0 THEN round(1.0 - " +
       "CAST(len(list_distinct(g)) AS DOUBLE) / len(g), 4) ELSE 0.0 END AS rep_ratio FROM " +
       s"(SELECT doc_id, CASE WHEN len(t) >= 3 THEN list_transform(range(1, len(t) - 1), " +
       "i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) ELSE [] END AS g FROM " +
       s"(SELECT doc_id, $duckToks AS t FROM documents)) ORDER BY doc_id"),
    "knn_quantized_rerank" ->
      ("WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings), " +
       "d AS (SELECT vec_id, unnest(v) AS x, CAST(unnest(range(1, len(v) + 1)) AS BIGINT) AS dim FROM e), " +
       "st AS (SELECT dim, min(x) AS lo, max(x) AS hi FROM d GROUP BY dim), " +
       "dq AS (SELECT vec_id, dim, lo + (CASE WHEN hi = lo THEN 0 ELSE " +
       "CAST(round((x - lo) * 255.0 / (hi - lo), 0) AS INTEGER) END) * (hi - lo) / 255.0 AS xq " +
       "FROM d JOIN st USING (dim)), " +
       "r AS (SELECT vec_id, list(xq ORDER BY dim) AS vq FROM dq GROUP BY vec_id), " +
       "p AS (SELECT vec_id AS query_id, vq AS q FROM r WHERE vec_id < 5), " +
       "coarse AS (SELECT query_id, r.vec_id AS neighbor_id, " +
       "round(list_dot_product(q, vq) / (sqrt(list_dot_product(q, q)) * sqrt(list_dot_product(vq, vq))), 4) AS cos_sim " +
       "FROM r, p WHERE r.vec_id <> query_id), " +
       "cr AS (SELECT query_id, neighbor_id, CAST(row_number() OVER " +
       "(PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS BIGINT) AS crank FROM coarse), " +
       "sl AS (SELECT query_id, neighbor_id FROM cr WHERE crank <= 20), " +
       "ep AS (SELECT vec_id AS query_id, v AS q FROM e WHERE vec_id < 5), " +
       "ex AS (SELECT sl.query_id, sl.neighbor_id, " +
       "round(list_dot_product(ep.q, e.v) / (sqrt(list_dot_product(ep.q, ep.q)) * sqrt(list_dot_product(e.v, e.v))), 4) AS cos_sim " +
       "FROM sl JOIN e ON sl.neighbor_id = e.vec_id JOIN ep ON sl.query_id = ep.query_id), " +
       "rr AS (SELECT query_id, neighbor_id, cos_sim, CAST(row_number() OVER " +
       "(PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS BIGINT) AS rank FROM ex) " +
       "SELECT query_id, neighbor_id, cos_sim, rank FROM rr WHERE rank <= 5 ORDER BY query_id, rank"),
    "sim_embed_norms" ->
      ("SELECT vec_id, round(sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x))), 4) AS l2_norm " +
       "FROM embeddings ORDER BY vec_id"),
    "sim_label_centroids" ->
      ("SELECT label, CAST(dim AS BIGINT) AS dim, round(avg(CAST(v AS DOUBLE)), 6) AS mean_v, " +
       "count(*) AS n_vecs FROM (" +
       "SELECT label, unnest(embedding) AS v, " +
       "unnest(range(1, len(embedding) + 1)) AS dim FROM embeddings) " +
       "GROUP BY label, dim ORDER BY label, dim"),
    "knn_filtered" ->
      ("WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label FROM embeddings), " +
       "p AS (SELECT vec_id AS query_id, v AS q, label FROM e WHERE vec_id < 5), " +
       "s AS (SELECT query_id, vec_id AS neighbor_id, e.label, " +
       "round(list_dot_product(q, v) / (sqrt(list_dot_product(q, q)) * sqrt(list_dot_product(v, v))), 4) AS cos_sim " +
       "FROM e JOIN p ON e.label = p.label AND vec_id <> query_id), " +
       "r AS (SELECT query_id, neighbor_id, label, cos_sim, " +
       "CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS BIGINT) AS rank FROM s) " +
       "SELECT query_id, neighbor_id, label, cos_sim, rank FROM r WHERE rank <= 5 ORDER BY query_id, rank"),
    "knn_brute_cosine" ->
      ("WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings), " +
       "p AS (SELECT vec_id AS query_id, v AS q FROM e WHERE vec_id < 5), " +
       "s AS (SELECT query_id, vec_id AS neighbor_id, " +
       "round(list_dot_product(q, v) / (sqrt(list_dot_product(q, q)) * sqrt(list_dot_product(v, v))), 4) AS cos_sim " +
       "FROM e, p WHERE vec_id <> query_id), " +
       "r AS (SELECT query_id, neighbor_id, cos_sim, " +
       "CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS BIGINT) AS rank FROM s) " +
       "SELECT query_id, neighbor_id, cos_sim, rank FROM r WHERE rank <= 5 ORDER BY query_id, rank"),
    // range search twin: same scored set as knn_brute_cosine, cut on
    // the ROUNDED cosine (engine-portable) instead of ranked — the
    // recall-complete retrieval shape
    "sim_range_search" ->
      ("WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings), " +
       "p AS (SELECT vec_id AS query_id, v AS q FROM e WHERE vec_id < 5), " +
       "s AS (SELECT query_id, vec_id AS neighbor_id, " +
       "round(list_dot_product(q, v) / (sqrt(list_dot_product(q, q)) * sqrt(list_dot_product(v, v))), 4) AS cos_sim " +
       "FROM e, p WHERE vec_id <> query_id) " +
       "SELECT query_id, neighbor_id, cos_sim FROM s WHERE cos_sim >= 0.2 " +
       "ORDER BY query_id, neighbor_id"),
    // the IVF-served range search is VALUE-IDENTICAL to brute by the
    // conservative cell bound (Similarity.rangeCells scaladoc), so the
    // brute oracle certifies it verbatim — the strongest witness shape:
    // an independent engine computing the un-indexed answer
    "sim_range_search_ivf" ->
      ("WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings), " +
       "p AS (SELECT vec_id AS query_id, v AS q FROM e WHERE vec_id < 5), " +
       "s AS (SELECT query_id, vec_id AS neighbor_id, " +
       "round(list_dot_product(q, v) / (sqrt(list_dot_product(q, q)) * sqrt(list_dot_product(v, v))), 4) AS cos_sim " +
       "FROM e, p WHERE vec_id <> query_id) " +
       "SELECT query_id, neighbor_id, cos_sim FROM s WHERE cos_sim >= 0.2 " +
       "ORDER BY query_id, neighbor_id"),
    "pipeline_quality_fusion" ->
      ("WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings), " +
       "d AS (SELECT label, unnest(v) AS x, CAST(unnest(range(1, len(v) + 1)) AS BIGINT) AS dim FROM e), " +
       "cm AS (SELECT label, dim, round(avg(x), 6) AS m FROM d GROUP BY label, dim), " +
       "cent AS (SELECT label, list(m ORDER BY dim) AS c FROM cm GROUP BY label), " +
       s"q AS (SELECT doc_id, $duckQuality AS quality FROM documents), " +
       "j AS (SELECT e.vec_id AS doc_id, e.label, " +
       "round(sqrt(list_dot_product(v, v)), 4) AS l2_norm, " +
       "round(list_dot_product(v, c) / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(c, c))), 4) AS centroid_cos " +
       "FROM e JOIN cent USING (label)) " +
       "SELECT j.doc_id, label, quality, l2_norm, centroid_cos, " +
       "(quality > 0.5 AND centroid_cos >= 0.15) AS keep " +
       "FROM j JOIN q ON j.doc_id = q.doc_id ORDER BY j.doc_id"),
    "mm_binary_meta" ->
      ("SELECT doc_id, octet_length(encode(text)) AS n_bytes, sha256(text) AS digest " +
       "FROM documents ORDER BY doc_id"),
    // the media column is constructed per-row from doc_id arithmetic
    // (doc_id%4 picks BMP/WAV/PNG/JPEG, every 97th doc is non-media),
    // so the oracle recomputes the expected unified metadata directly —
    // the compare is an exact construct -> magic-byte-dispatch -> parse
    // round trip across all four real decoders at once
    "mm_feature_extract" ->
      ("WITH d AS (SELECT doc_id, text, doc_id % 97 = 0 AS corrupt, " +
       "doc_id % 4 AS f, doc_id // 4 AS q, " +
       "2*(1 + (doc_id // 4) % 3) AS bw, 1 + (doc_id // 4) % 4 AS bhh, " +
       "((2*(1 + (doc_id // 4) % 3)*3 + 3) // 4) * 4 AS rs FROM documents) " +
       "SELECT doc_id, " +
       "CAST(CASE WHEN corrupt THEN octet_length(encode(substring(text, 1, 16))) " +
       "WHEN f = 0 THEN 54 + rs * bhh " +
       "WHEN f = 1 THEN CASE WHEN q % 2 = 1 THEN 48 ELSE 36 END " +
       "WHEN f = 2 THEN 33 ELSE 39 END AS BIGINT) AS n_bytes, " +
       "CASE WHEN corrupt THEN NULL WHEN f = 0 THEN 'bmp' WHEN f = 1 THEN 'wav' " +
       "WHEN f = 2 THEN 'png' ELSE 'jpeg' END AS media_type, " +
       "CAST(CASE WHEN corrupt THEN NULL WHEN f = 0 THEN bw " +
       "WHEN f >= 2 THEN doc_id % 1021 + 16 END AS INTEGER) AS width, " +
       "CAST(CASE WHEN corrupt THEN NULL WHEN f = 0 THEN bhh " +
       "WHEN f >= 2 THEN (doc_id * 7) % 739 + 16 END AS INTEGER) AS height, " +
       "CAST(CASE WHEN corrupt THEN NULL WHEN f = 0 THEN 3 " +
       "WHEN f = 1 THEN 1 + q % 2 END AS INTEGER) AS channels, " +
       "CAST(CASE WHEN corrupt THEN NULL WHEN f = 1 THEN 8000*(1 + q % 6) " +
       "END AS INTEGER) AS sample_rate, " +
       "CASE WHEN corrupt OR f <> 0 THEN NULL ELSE round(" +
       "(bhh*(bw//2)*((doc_id*7)%256 + (doc_id*17)%256) " +
       "+ bhh*(bw//2)*((doc_id*3)%256 + (doc_id*13)%256) " +
       "+ bhh*(bw//2)*((doc_id)%256 + (doc_id*11)%256)) " +
       "/ (3.0 * bw * bhh), 6) END AS mean_px " +
       "FROM d ORDER BY doc_id"),
    // the FULL-FAMILY dispatch: doc_id%8 picks one of EIGHT real
    // formats (every 173rd doc is non-media text); the oracle restates
    // the unified metadata per format from the same arithmetic — one
    // wrong magic route, field mapping, or duration division fails the
    // hash across a whole format slice
    "mm_dispatch_all" ->
      ("WITH d AS (SELECT doc_id, doc_id % 173 = 0 AS corrupt, " +
       "doc_id % 11 AS f, doc_id // 11 AS q FROM documents), " +
       "m AS (SELECT doc_id, corrupt, f, q, " +
       // mp3 sample-rate table indexed by verSel*3 + rateIdx
       "([44100, 48000, 32000, 22050, 24000, 16000, 11025, 12000, 8000])" +
       "[CAST(doc_id % 3 AS INTEGER) * 3 + CAST((doc_id // 3) % 3 AS INTEGER) + 1] AS mp3rate " +
       "FROM d) " +
       "SELECT doc_id, " +
       "CASE WHEN corrupt THEN NULL WHEN f = 0 THEN 'bmp' WHEN f = 1 THEN 'wav' " +
       "WHEN f = 2 THEN 'png' WHEN f = 3 THEN 'jpeg' WHEN f = 4 THEN 'flac' " +
       "WHEN f = 5 THEN 'mp3' WHEN f = 6 THEN 'mp4' WHEN f = 7 THEN 'tiff' " +
       "WHEN f = 8 THEN 'pdf' WHEN f = 9 THEN 'gzip' ELSE 'warc' END AS media_type, " +
       "CAST(CASE WHEN corrupt THEN NULL " +
       "WHEN f = 0 THEN 2 * (1 + q % 3) " +
       "WHEN f = 2 OR f = 3 OR f = 7 THEN doc_id % 1021 + 16 " +
       "WHEN f = 6 AND doc_id % 3 <> 0 THEN doc_id % 600 + 16 END AS INTEGER) AS width, " +
       "CAST(CASE WHEN corrupt THEN NULL " +
       "WHEN f = 0 THEN 1 + q % 4 " +
       "WHEN f = 2 OR f = 3 OR f = 7 THEN (doc_id * 7) % 739 + 16 " +
       "WHEN f = 6 AND doc_id % 3 <> 0 THEN (doc_id * 3) % 400 + 16 END AS INTEGER) AS height, " +
       "CAST(CASE WHEN corrupt THEN NULL WHEN f = 0 THEN 3 " +
       "WHEN f = 1 THEN 1 + q % 2 WHEN f = 4 THEN doc_id % 8 + 1 " +
       "WHEN f = 5 THEN CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 2 END END AS INTEGER) AS channels, " +
       "CAST(CASE WHEN corrupt THEN NULL WHEN f = 1 THEN 8000 * (1 + q % 6) " +
       "WHEN f = 4 THEN doc_id % 48000 + 8000 " +
       "WHEN f = 5 THEN mp3rate END AS INTEGER) AS sample_rate, " +
       "CAST(CASE WHEN corrupt THEN NULL " +
       "WHEN f = 4 THEN (doc_id * 441 % 100000000) * 1000 // (doc_id % 48000 + 8000) " +
       "WHEN f = 5 THEN (doc_id % 50 + 3) * (CASE WHEN doc_id % 3 = 0 THEN 1152 ELSE 576 END) * 1000 // mp3rate " +
       "WHEN f = 6 THEN (doc_id % 100000 + 1000) * 1000 // ((doc_id % 4 + 1) * 600) " +
       "END AS BIGINT) AS duration_ms " +
       "FROM m ORDER BY doc_id"),
    "mm_frame_sample" ->
      ("SELECT doc_id, CAST(i AS BIGINT) AS frame_idx, " +
       "CAST(1 + i * greatest(1, length(text) // 4) AS BIGINT) AS start, " +
       "md5(substring(text, CAST(1 + i * greatest(1, length(text) // 4) AS INTEGER), 32)) AS digest " +
       "FROM documents, (SELECT unnest(range(4)) AS i) ORDER BY doc_id, frame_idx"),
    // the payload layout is deterministic doc_id arithmetic, so the
    // oracle recomputes the EXPECTED header metadata directly — the
    // compare is then an exact construct->parse round-trip check of the
    // Spark-side PNG/JPEG header parser (plans.ImageMeta)
    "mm_image_meta" ->
      ("SELECT doc_id, " +
       "CAST(CASE WHEN doc_id % 97 = 0 THEN octet_length(encode(substring(text, 1, 16))) " +
       "WHEN doc_id % 4 = 0 THEN 33 WHEN doc_id % 4 = 1 THEN 39 " +
       "WHEN doc_id % 4 = 2 THEN 30 ELSE 38 END AS BIGINT) AS n_bytes, " +
       "CASE WHEN doc_id % 97 = 0 THEN NULL WHEN doc_id % 4 = 0 THEN 'png' " +
       "WHEN doc_id % 4 = 1 THEN 'jpeg' WHEN doc_id % 4 = 2 THEN 'webp' " +
       "ELSE 'tiff' END AS format, " +
       "CASE WHEN doc_id % 97 = 0 THEN NULL ELSE CAST(doc_id % 1021 + 16 AS INTEGER) END AS width, " +
       "CASE WHEN doc_id % 97 = 0 THEN NULL ELSE CAST((doc_id * 7) % 739 + 16 AS INTEGER) END AS height " +
       "FROM documents ORDER BY doc_id"),
    // GIF twin: header + LSD reconstruction from the same arithmetic
    "mm_gif_meta" ->
      ("SELECT doc_id, " +
       "CAST(CASE WHEN doc_id % 101 = 0 THEN octet_length(encode(substring(text, 1, 14))) ELSE 13 END AS BIGINT) AS n_bytes, " +
       "CASE WHEN doc_id % 101 = 0 THEN NULL WHEN doc_id % 2 = 0 THEN '87a' ELSE '89a' END AS version, " +
       "CASE WHEN doc_id % 101 = 0 THEN NULL ELSE CAST(doc_id % 641 + 9 AS INTEGER) END AS width, " +
       "CASE WHEN doc_id % 101 = 0 THEN NULL ELSE CAST((doc_id * 5) % 509 + 7 AS INTEGER) END AS height " +
       "FROM documents ORDER BY doc_id"),
    // WAV twin of mm_image_meta: expected metadata recomputed from the
    // same doc_id arithmetic -> exact construct->parse round-trip check
    // of the RIFF chunk walk (incl. the JUNK chunk odd docs carry)
    "mm_audio_meta" ->
      ("SELECT doc_id, " +
       "CAST(CASE WHEN doc_id % 89 = 0 THEN octet_length(encode(substring(text, 1, 12))) " +
       "WHEN doc_id % 2 = 1 THEN 48 ELSE 36 END AS BIGINT) AS n_bytes, " +
       "CASE WHEN doc_id % 89 = 0 THEN NULL ELSE CAST(1 + doc_id % 2 AS INTEGER) END AS channels, " +
       "CASE WHEN doc_id % 89 = 0 THEN NULL ELSE CAST(8000 * (1 + doc_id % 6) AS INTEGER) END AS sample_rate, " +
       "CASE WHEN doc_id % 89 = 0 THEN NULL ELSE CAST(8 * (1 + doc_id % 3) AS INTEGER) END AS bits " +
       "FROM documents ORDER BY doc_id"),
    // pixel-sum twin: expected integer channel sums recomputed from the
    // construction arithmetic (H * W/2 copies of each pattern pixel) —
    // wrong row padding, BGR order, or top-down handling changes them
    "mm_pixel_stats" -> {
      def chan(a: String, b: String) =
        s"(1 + doc_id % 4) * (1 + doc_id % 3) * ((doc_id * $a) % 256 + (doc_id * $b) % 256)"
      "SELECT doc_id, " +
      "CASE WHEN doc_id % 83 = 0 THEN NULL ELSE CAST(2 * (1 + doc_id % 3) AS INTEGER) END AS width, " +
      "CASE WHEN doc_id % 83 = 0 THEN NULL ELSE CAST(1 + doc_id % 4 AS INTEGER) END AS height, " +
      s"CASE WHEN doc_id % 83 = 0 THEN NULL ELSE CAST(${chan("7", "17")} AS BIGINT) END AS sum_r, " +
      s"CASE WHEN doc_id % 83 = 0 THEN NULL ELSE CAST(${chan("3", "13")} AS BIGINT) END AS sum_g, " +
      s"CASE WHEN doc_id % 83 = 0 THEN NULL ELSE CAST(${chan("1", "11")} AS BIGINT) END AS sum_b, " +
      "CASE WHEN doc_id % 83 = 0 THEN NULL ELSE CAST(2 * (1 + doc_id % 3) * (1 + doc_id % 4) AS BIGINT) END AS n_pixels " +
      "FROM documents ORDER BY doc_id"
    },
    // nearest-neighbor thumbnail twin: the fixture BMP alternates two
    // pixel values by COLUMN PARITY (rows identical), so which source
    // columns the 3x2 target samples — floor(x2*w/3) — is pure integer
    // arithmetic; 2x for the two identical target rows. A wrong sample
    // map, row flip, or padding treatment changes the sums.
    "mm_bmp_resize" -> {
      def cell(a: String, b: String) =
        s"sum(CASE WHEN ((x2 * w) // 3) % 2 = 0 THEN (doc_id * $a) % 256 ELSE (doc_id * $b) % 256 END)"
      "WITH d AS (SELECT doc_id, 2 * (1 + doc_id % 3) AS w FROM documents), " +
      "g AS (SELECT doc_id, w, unnest(range(3)) AS x2 FROM d WHERE doc_id % 83 <> 0), " +
      s"s AS (SELECT doc_id, 2 * ${cell("7", "17")} AS sr, " +
      s"2 * ${cell("3", "13")} AS sg, 2 * ${cell("1", "11")} AS sb " +
      "FROM g GROUP BY doc_id) " +
      "SELECT d.doc_id, " +
      "CASE WHEN d.doc_id % 83 = 0 THEN NULL ELSE 3 END AS width, " +
      "CASE WHEN d.doc_id % 83 = 0 THEN NULL ELSE 2 END AS height, " +
      "CAST(s.sr AS BIGINT) AS sum_r, CAST(s.sg AS BIGINT) AS sum_g, " +
      "CAST(s.sb AS BIGINT) AS sum_b, " +
      "CASE WHEN d.doc_id % 83 = 0 THEN NULL ELSE CAST(6 AS BIGINT) END AS n_pixels " +
      "FROM d LEFT JOIN s ON d.doc_id = s.doc_id ORDER BY d.doc_id"
    },
    // compressed-pixel twin: the encoder writes pixel (x,y) channels
    // from doc_id arithmetic (PngEncode scaladoc), so the oracle
    // recomputes the exact channel sums per doc — certifying the whole
    // inflate + five-filter unfilter + IDAT-concat path byte-exactly
    "mm_png_pixels" ->
      ("WITH d AS (SELECT doc_id, 2 + doc_id % 5 AS w, 5 + doc_id % 4 AS h FROM documents), " +
       "px AS (SELECT doc_id, w, h, unnest(range(w * h)) AS i FROM d WHERE doc_id % 103 <> 0), " +
       "s AS (SELECT doc_id, " +
       "sum((doc_id + 3 * (i % w) + 7 * (i // w)) % 256) AS sr, " +
       "sum((2 * doc_id + 5 * (i % w) + (i // w)) % 256) AS sg, " +
       "sum((3 * doc_id + (i % w) + 11 * (i // w)) % 256) AS sb " +
       "FROM px GROUP BY doc_id) " +
       "SELECT d.doc_id, " +
       "CASE WHEN d.doc_id % 103 = 0 THEN NULL ELSE CAST(d.w AS INTEGER) END AS width, " +
       "CASE WHEN d.doc_id % 103 = 0 THEN NULL ELSE CAST(d.h AS INTEGER) END AS height, " +
       "CAST(s.sr AS BIGINT) AS sum_r, CAST(s.sg AS BIGINT) AS sum_g, " +
       "CAST(s.sb AS BIGINT) AS sum_b, " +
       "CASE WHEN d.doc_id % 103 = 0 THEN NULL ELSE CAST(d.w * d.h AS BIGINT) END AS n_pixels " +
       "FROM d LEFT JOIN s ON d.doc_id = s.doc_id ORDER BY d.doc_id"),
    // LZW twin: the GIF encoder writes palette index (doc_id + x + 2y)
    // mod 64 over the palette (doc_id+5i, 2*doc_id+3i, doc_id+7i+1)
    // mod 256 (GifEncode scaladoc), so the oracle recomputes the exact
    // channel sums per doc — certifying the variable-width LZW decode,
    // extension skip, and palette lookup byte-exactly
    "mm_gif_pixels" ->
      ("WITH d AS (SELECT doc_id, 16 + doc_id % 17 AS w, 16 + doc_id % 13 AS h FROM documents), " +
       "px AS (SELECT doc_id, w, h, unnest(range(w * h)) AS i FROM d WHERE doc_id % 107 <> 0), " +
       "s AS (SELECT doc_id, " +
       "sum((doc_id + 5 * ((doc_id + (i % w) + 2 * (i // w)) % 64)) % 256) AS sr, " +
       "sum((2 * doc_id + 3 * ((doc_id + (i % w) + 2 * (i // w)) % 64)) % 256) AS sg, " +
       "sum((doc_id + 7 * ((doc_id + (i % w) + 2 * (i // w)) % 64) + 1) % 256) AS sb " +
       "FROM px GROUP BY doc_id) " +
       "SELECT d.doc_id, " +
       "CASE WHEN d.doc_id % 107 = 0 THEN NULL ELSE CAST(d.w AS INTEGER) END AS width, " +
       "CASE WHEN d.doc_id % 107 = 0 THEN NULL ELSE CAST(d.h AS INTEGER) END AS height, " +
       "CAST(s.sr AS BIGINT) AS sum_r, CAST(s.sg AS BIGINT) AS sum_g, " +
       "CAST(s.sb AS BIGINT) AS sum_b, " +
       "CASE WHEN d.doc_id % 107 = 0 THEN NULL ELSE CAST(d.w * d.h AS BIGINT) END AS n_pixels " +
       "FROM d LEFT JOIN s ON d.doc_id = s.doc_id ORDER BY d.doc_id"),
    // ANIMATED twin: frame f's pixel index is (doc_id + 7f + x + 2y)
    // mod 64 over the same seed palette (GifEncode.encodeAnim), so the
    // oracle recomputes every frame's exact channel sums — the LZW
    // decode, per-frame palette scoping, and inter-frame GCE walk are
    // all certified by the hash; corrupt docs (doc_id % 107 = 0)
    // explode to no rows like mm_video_frames
    "mm_gif_frames" ->
      ("WITH d AS (SELECT doc_id, 12 + doc_id % 16 AS w, 10 + doc_id % 12 AS h, " +
       "1 + doc_id % 3 AS nf FROM documents WHERE doc_id % 107 <> 0), " +
       "f AS (SELECT doc_id, w, h, unnest(range(nf)) AS fi FROM d), " +
       "px AS (SELECT doc_id, fi, w, h, unnest(range(w * h)) AS i FROM f), " +
       "s AS (SELECT doc_id, fi, w, h, " +
       "sum((doc_id + 5 * ((doc_id + 7 * fi + (i % w) + 2 * (i // w)) % 64)) % 256) AS sr, " +
       "sum((2 * doc_id + 3 * ((doc_id + 7 * fi + (i % w) + 2 * (i // w)) % 64)) % 256) AS sg, " +
       "sum((doc_id + 7 * ((doc_id + 7 * fi + (i % w) + 2 * (i // w)) % 64) + 1) % 256) AS sb " +
       "FROM px GROUP BY doc_id, fi, w, h) " +
       "SELECT doc_id, CAST(fi AS INTEGER) AS frame_idx, " +
       "CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height, " +
       "CAST(sr AS BIGINT) AS sum_r, CAST(sg AS BIGINT) AS sum_g, " +
       "CAST(sb AS BIGINT) AS sum_b, CAST(w * h AS BIGINT) AS n_pixels " +
       "FROM s ORDER BY doc_id, frame_idx"),
    // APNG twin: frame f of doc d uses the static-PNG formulas at
    // shifted seed d + 17f (PngEncode.encodeApng), so the oracle
    // recomputes every frame's exact channel sums — acTL/fcTL/fdAT
    // walk, per-frame zlib streams, and fdAT concatenation are all
    // certified by the hash
    "mm_png_frames" ->
      ("WITH d AS (SELECT doc_id, 8 + doc_id % 14 AS w, 6 + doc_id % 10 AS h, " +
       "1 + doc_id % 3 AS nf FROM documents WHERE doc_id % 103 <> 0), " +
       "f AS (SELECT doc_id, w, h, unnest(range(nf)) AS fi, doc_id + 17 * unnest(range(nf)) AS sd FROM d), " +
       "px AS (SELECT doc_id, fi, w, h, sd, unnest(range(w * h)) AS i FROM f), " +
       "s AS (SELECT doc_id, fi, w, h, " +
       "sum((sd + 3 * (i % w) + 7 * (i // w)) % 256) AS sr, " +
       "sum((2 * sd + 5 * (i % w) + (i // w)) % 256) AS sg, " +
       "sum((3 * sd + (i % w) + 11 * (i // w)) % 256) AS sb " +
       "FROM px GROUP BY doc_id, fi, w, h) " +
       "SELECT doc_id, CAST(fi AS INTEGER) AS frame_idx, " +
       "CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height, " +
       "CAST(sr AS BIGINT) AS sum_r, CAST(sg AS BIGINT) AS sum_g, " +
       "CAST(sb AS BIGINT) AS sum_b, CAST(w * h AS BIGINT) AS n_pixels " +
       "FROM s ORDER BY doc_id, frame_idx"),
    // baseline-DCT twin: the JPEG encoder writes per-8x8-block-constant
    // gray (doc_id + 5*bx + 11*by) mod 256, which survives the lossy
    // codec EXACTLY (DC = 8*(v-128), quantizer 8 — JpegEncode
    // scaladoc), so the oracle recomputes the decoded sums precisely —
    // certifying Huffman entropy decode, DC prediction + restart
    // resets, dequant, IDCT, and edge-MCU cropping byte-exactly
    "mm_jpeg_pixels" ->
      ("WITH d AS (SELECT doc_id, 9 + doc_id % 23 AS w, 9 + (doc_id * 3) % 19 AS h FROM documents), " +
       "px AS (SELECT doc_id, w, h, unnest(range(w * h)) AS i FROM d WHERE doc_id % 109 <> 0), " +
       "s AS (SELECT doc_id, " +
       "sum((doc_id + 5 * ((i % w) // 8) + 11 * ((i // w) // 8)) % 256) AS sg " +
       "FROM px GROUP BY doc_id) " +
       "SELECT d.doc_id, " +
       "CASE WHEN d.doc_id % 109 = 0 THEN NULL ELSE CAST(d.w AS INTEGER) END AS width, " +
       "CASE WHEN d.doc_id % 109 = 0 THEN NULL ELSE CAST(d.h AS INTEGER) END AS height, " +
       "CAST(s.sg AS BIGINT) AS sum_r, CAST(s.sg AS BIGINT) AS sum_g, " +
       "CAST(s.sg AS BIGINT) AS sum_b, " +
       "CASE WHEN d.doc_id % 109 = 0 THEN NULL ELSE CAST(d.w * d.h AS BIGINT) END AS n_pixels " +
       "FROM d LEFT JOIN s ON d.doc_id = s.doc_id ORDER BY d.doc_id"),
    // 12-bit extended-sequential twin of mm_jpeg_pixels: same blocky
    // lossless-by-construction trick, sample values mod 4096 (SOF1,
    // Pq=1 DQT, 16-symbol DC table — one wrong wide-entry read, level
    // shift, clamp bound, or category gate fails the hash)
    "mm_jpeg12" ->
      ("WITH d AS (SELECT doc_id, 9 + doc_id % 23 AS w, 9 + (doc_id * 3) % 19 AS h FROM documents), " +
       "px AS (SELECT doc_id, w, h, unnest(range(w * h)) AS i FROM d WHERE doc_id % 157 <> 0), " +
       "s AS (SELECT doc_id, " +
       "sum((doc_id + 5 * ((i % w) // 8) + 11 * ((i // w) // 8)) % 4096) AS sg " +
       "FROM px GROUP BY doc_id) " +
       "SELECT d.doc_id, " +
       "CASE WHEN d.doc_id % 157 = 0 THEN NULL ELSE CAST(d.w AS INTEGER) END AS width, " +
       "CASE WHEN d.doc_id % 157 = 0 THEN NULL ELSE CAST(d.h AS INTEGER) END AS height, " +
       "CAST(s.sg AS BIGINT) AS sum_r, CAST(s.sg AS BIGINT) AS sum_g, " +
       "CAST(s.sg AS BIGINT) AS sum_b, " +
       "CASE WHEN d.doc_id % 157 = 0 THEN NULL ELSE CAST(d.w * d.h AS BIGINT) END AS n_pixels " +
       "FROM d LEFT JOIN s ON d.doc_id = s.doc_id ORDER BY d.doc_id"),
    // COLOR twin of mm_jpeg_pixels: the constant-block construction
    // makes (y, cb, cr) — hence each clamped RGB channel — constant per
    // LUMA block (a luma block lies inside one chroma region), so the
    // oracle enumerates blocks: y/cb/cr from the seed formulas, the
    // JFIF matrix with floor(x+0.5) EXACTLY as the decoder computes it,
    // weighted by each block's cropped pixel count. One wrong
    // interleave order, chroma index, predictor reset, or conversion
    // constant fails the hash.
    "mm_jpeg_color" ->
      ("WITH d AS (SELECT doc_id, 9 + doc_id % 23 AS w, 9 + (doc_id * 3) % 19 AS h, " +
       "CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 2 END AS hs, " +
       "CASE WHEN doc_id % 3 = 2 THEN 2 ELSE 1 END AS vs " +
       "FROM documents), " +
       "blk AS (SELECT doc_id, w, h, hs, vs, " +
       "unnest(range(((w + 7) // 8) * ((h + 7) // 8))) AS bi, (w + 7) // 8 AS nbx " +
       "FROM d WHERE doc_id % 109 <> 0), " +
       "v AS (SELECT doc_id, w, h, bi % nbx AS bx, bi // nbx AS by, " +
       "(doc_id + 5 * (bi % nbx) + 11 * (bi // nbx)) % 256 AS y, " +
       "(3 * doc_id + 7 * ((bi % nbx) // hs) + 13 * ((bi // nbx) // vs) + 64) % 256 AS cb, " +
       "(5 * doc_id + 3 * ((bi % nbx) // hs) + 17 * ((bi // nbx) // vs) + 128) % 256 AS cr " +
       "FROM blk), " +
       "s AS (SELECT doc_id, " +
       "sum(least(greatest(floor(y + 1.402 * (cr - 128) + 0.5), 0), 255) * " +
       "  (least(8, w - 8 * bx) * least(8, h - 8 * by))) AS sr, " +
       "sum(least(greatest(floor(y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128) + 0.5), 0), 255) * " +
       "  (least(8, w - 8 * bx) * least(8, h - 8 * by))) AS sg, " +
       "sum(least(greatest(floor(y + 1.772 * (cb - 128) + 0.5), 0), 255) * " +
       "  (least(8, w - 8 * bx) * least(8, h - 8 * by))) AS sb " +
       "FROM v GROUP BY doc_id) " +
       "SELECT d.doc_id, " +
       "CASE WHEN d.doc_id % 109 = 0 THEN NULL ELSE CAST(d.w AS INTEGER) END AS width, " +
       "CASE WHEN d.doc_id % 109 = 0 THEN NULL ELSE CAST(d.h AS INTEGER) END AS height, " +
       "CAST(s.sr AS BIGINT) AS sum_r, CAST(s.sg AS BIGINT) AS sum_g, " +
       "CAST(s.sb AS BIGINT) AS sum_b, " +
       "CASE WHEN d.doc_id % 109 = 0 THEN NULL ELSE CAST(d.w * d.h AS BIGINT) END AS n_pixels " +
       "FROM d LEFT JOIN s ON d.doc_id = s.doc_id ORDER BY d.doc_id"),
    // PROGRESSIVE twin: the SOF2 fixture carries the SAME
    // per-block-constant planes (gray rows where doc_id % 5 = 0 use
    // the luma value directly; color rows the JFIF conversion), so one
    // oracle covers the whole successive-approximation protocol: the
    // decoded image must be bit-identical to the baseline encoding of
    // the same planes, whatever the scan script did
    "mm_jpeg_progressive" ->
      ("WITH d AS (SELECT doc_id, 9 + doc_id % 23 AS w, 9 + (doc_id * 3) % 19 AS h, " +
       "CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 2 END AS hs, " +
       "CASE WHEN doc_id % 3 = 2 THEN 2 ELSE 1 END AS vs, " +
       "doc_id % 5 = 0 AS gray " +
       "FROM documents), " +
       "blk AS (SELECT doc_id, w, h, hs, vs, gray, " +
       "unnest(range(((w + 7) // 8) * ((h + 7) // 8))) AS bi, (w + 7) // 8 AS nbx " +
       "FROM d WHERE doc_id % 109 <> 0), " +
       "v AS (SELECT doc_id, w, h, gray, bi % nbx AS bx, bi // nbx AS by, " +
       "(doc_id + 5 * (bi % nbx) + 11 * (bi // nbx)) % 256 AS y, " +
       "(3 * doc_id + 7 * ((bi % nbx) // hs) + 13 * ((bi // nbx) // vs) + 64) % 256 AS cb, " +
       "(5 * doc_id + 3 * ((bi % nbx) // hs) + 17 * ((bi // nbx) // vs) + 128) % 256 AS cr " +
       "FROM blk), " +
       "s AS (SELECT doc_id, " +
       "sum(CASE WHEN gray THEN y ELSE least(greatest(floor(y + 1.402 * (cr - 128) + 0.5), 0), 255) END * " +
       "  (least(8, w - 8 * bx) * least(8, h - 8 * by))) AS sr, " +
       "sum(CASE WHEN gray THEN y ELSE least(greatest(floor(y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128) + 0.5), 0), 255) END * " +
       "  (least(8, w - 8 * bx) * least(8, h - 8 * by))) AS sg, " +
       "sum(CASE WHEN gray THEN y ELSE least(greatest(floor(y + 1.772 * (cb - 128) + 0.5), 0), 255) END * " +
       "  (least(8, w - 8 * bx) * least(8, h - 8 * by))) AS sb " +
       "FROM v GROUP BY doc_id) " +
       "SELECT d.doc_id, " +
       "CASE WHEN d.doc_id % 109 = 0 THEN NULL ELSE CAST(d.w AS INTEGER) END AS width, " +
       "CASE WHEN d.doc_id % 109 = 0 THEN NULL ELSE CAST(d.h AS INTEGER) END AS height, " +
       "CAST(s.sr AS BIGINT) AS sum_r, CAST(s.sg AS BIGINT) AS sum_g, " +
       "CAST(s.sb AS BIGINT) AS sum_b, " +
       "CASE WHEN d.doc_id % 109 = 0 THEN NULL ELSE CAST(d.w * d.h AS BIGINT) END AS n_pixels " +
       "FROM d LEFT JOIN s ON d.doc_id = s.doc_id ORDER BY d.doc_id"),
    // AUDIO sample twin: the WAV encoder writes frame i channel c as
    // ((doc_id + 31 i + 17 c) mod 65536) - 32768 (WavEncode scaladoc),
    // so the oracle recomputes the exact per-channel sums and the peak
    // amplitude — certifying the RIFF walk (JUNK before fmt, odd-size
    // padding) and the signed-LE sample decode
    "mm_audio_pcm" ->
      ("WITH d AS (SELECT doc_id, 64 + doc_id % 193 AS n, 1 + doc_id % 2 AS ch " +
       "FROM documents WHERE doc_id % 113 <> 0), " +
       "i AS (SELECT doc_id, n, ch, unnest(range(n)) AS i FROM d), " +
       "v AS (SELECT doc_id, (doc_id + 31 * i) % 65536 - 32768 AS l, " +
       "CASE WHEN ch = 2 THEN (doc_id + 31 * i + 17) % 65536 - 32768 END AS r FROM i), " +
       "s AS (SELECT doc_id, sum(l) AS sl, sum(r) AS sr, " +
       "max(greatest(abs(l), coalesce(abs(r), 0))) AS pk FROM v GROUP BY doc_id), " +
       "a AS (SELECT doc_id FROM documents) " +
       "SELECT a.doc_id, " +
       "CASE WHEN a.doc_id % 113 = 0 THEN NULL ELSE CAST(1 + a.doc_id % 2 AS INTEGER) END AS channels, " +
       "CASE WHEN a.doc_id % 113 = 0 THEN NULL ELSE CAST(8000 AS INTEGER) END AS sample_rate, " +
       "CASE WHEN a.doc_id % 113 = 0 THEN NULL ELSE CAST(16 AS INTEGER) END AS bits, " +
       "CASE WHEN a.doc_id % 113 = 0 THEN NULL ELSE CAST(64 + a.doc_id % 193 AS BIGINT) END AS n_frames, " +
       "CAST(s.sl AS BIGINT) AS sum_l, CAST(s.sr AS BIGINT) AS sum_r, " +
       "CAST(s.pk AS INTEGER) AS peak " +
       "FROM a LEFT JOIN s ON a.doc_id = s.doc_id ORDER BY a.doc_id"),
    // LOSSLESS-JPEG twin: SOF3 spatial prediction is lossless, so the
    // decoded sums ARE the pixel-formula sums (same formulas as the
    // TIFF fixture) — the oracle carries zero codec arithmetic while
    // the hash still certifies the Huffman difference decode, the
    // H.1.2.1 prediction rules (all seven predictors cycle on
    // doc_id%7), and the modulo-2^16 reconstruction
    "mm_jpeg_lossless" ->
      // precision cycles 8/12/16 bits on doc_id; lossless sums are the
      // raw pixel formulas mod 2^prec — still zero codec arithmetic
      ("WITH d AS (SELECT doc_id, 5 + doc_id % 21 AS w, 5 + (doc_id * 3) % 17 AS h, " +
       "doc_id % 5 = 0 AS gr, " +
       "CASE WHEN doc_id % 11 = 0 THEN 65536 WHEN doc_id % 3 = 0 THEN 4096 ELSE 256 END AS mv " +
       "FROM documents), " +
       "px AS (SELECT doc_id, w, h, gr, mv, unnest(range(w * h)) AS i FROM d WHERE doc_id % 151 <> 0), " +
       "s AS (SELECT doc_id, " +
       "sum(CASE WHEN gr THEN (doc_id + 5 * (i % w) + 3 * (i // w)) % mv " +
       "ELSE (doc_id + 3 * (i % w) + 7 * (i // w)) % mv END) AS sr, " +
       "sum(CASE WHEN gr THEN (doc_id + 5 * (i % w) + 3 * (i // w)) % mv " +
       "ELSE (2 * doc_id + 5 * (i % w) + (i // w)) % mv END) AS sg, " +
       "sum(CASE WHEN gr THEN (doc_id + 5 * (i % w) + 3 * (i // w)) % mv " +
       "ELSE (3 * doc_id + (i % w) + 11 * (i // w)) % mv END) AS sb " +
       "FROM px GROUP BY doc_id) " +
       "SELECT d.doc_id, " +
       "CASE WHEN d.doc_id % 151 = 0 THEN NULL ELSE CAST(d.w AS INTEGER) END AS width, " +
       "CASE WHEN d.doc_id % 151 = 0 THEN NULL ELSE CAST(d.h AS INTEGER) END AS height, " +
       "CAST(s.sr AS BIGINT) AS sum_r, CAST(s.sg AS BIGINT) AS sum_g, " +
       "CAST(s.sb AS BIGINT) AS sum_b, " +
       "CASE WHEN d.doc_id % 151 = 0 THEN NULL ELSE CAST(d.w * d.h AS BIGINT) END AS n_pixels " +
       "FROM d LEFT JOIN s ON d.doc_id = s.doc_id ORDER BY d.doc_id"),
    // IEEE-float twin: samples are dyadic k/256 (k = (doc_id + 29i +
    // 11c) mod 65536 - 32768), so the double sums are exact and
    // order-independent — the one construction under which float
    // audio admits a hash-exact SQL oracle
    "mm_audio_float" ->
      ("WITH d AS (SELECT doc_id, 32 + doc_id % 223 AS n, 1 + doc_id % 2 AS ch " +
       "FROM documents WHERE doc_id % 139 <> 0), " +
       "i AS (SELECT doc_id, n, ch, unnest(range(n)) AS i FROM d), " +
       "v AS (SELECT doc_id, ((doc_id + 29 * i) % 65536 - 32768) / 256.0 AS l, " +
       "CASE WHEN ch = 2 THEN ((doc_id + 29 * i + 11) % 65536 - 32768) / 256.0 END AS r FROM i), " +
       "s AS (SELECT doc_id, sum(l) AS sl, sum(r) AS srr, " +
       "max(greatest(abs(l), coalesce(abs(r), 0))) AS pk FROM v GROUP BY doc_id), " +
       "a AS (SELECT doc_id FROM documents) " +
       "SELECT a.doc_id, " +
       "CASE WHEN a.doc_id % 139 = 0 THEN NULL ELSE CAST(1 + a.doc_id % 2 AS INTEGER) END AS channels, " +
       "CASE WHEN a.doc_id % 139 = 0 THEN NULL ELSE CAST(44100 AS INTEGER) END AS sample_rate, " +
       "CASE WHEN a.doc_id % 139 = 0 THEN NULL ELSE CAST(32 + a.doc_id % 223 AS BIGINT) END AS n_frames, " +
       "CAST(s.sl AS DOUBLE) AS sum_l, CAST(s.srr AS DOUBLE) AS sum_r, " +
       "CAST(s.pk AS DOUBLE) AS peak " +
       "FROM a LEFT JOIN s ON a.doc_id = s.doc_id ORDER BY a.doc_id"),
    // G.711 twin: the data bytes ARE the law codes ((doc_id + 13i + 7c)
    // mod 256), so the oracle replays the public µ-law/A-law expansion
    // formulas (complement/xor, segment shift, bias, sign) over the
    // same arithmetic — one wrong segment boundary or sign convention
    // in the decoder fails the hash
    "mm_audio_g711" -> {
      def mu(c: String) =
        s"(CASE WHEN (255 - $c) >= 128 THEN 132 - ((((255 - $c) % 16) * 8 + 132) * (1 << (((255 - $c) // 16) % 8))) " +
        s"ELSE (((255 - $c) % 16) * 8 + 132) * (1 << (((255 - $c) // 16) % 8)) - 132 END)"
      def al(c: String) =
        s"((CASE WHEN xor($c, 85) >= 128 THEN 1 ELSE -1 END) * " +
        s"(CASE WHEN (xor($c, 85) // 16) % 8 = 0 THEN (xor($c, 85) % 16) * 16 + 8 " +
        s"ELSE ((xor($c, 85) % 16) * 16 + 264) * (1 << ((xor($c, 85) // 16) % 8 - 1)) END))"
      def dec(c: String) = s"(CASE WHEN mu THEN ${mu(c)} ELSE ${al(c)} END)"
      "WITH d AS (SELECT doc_id, 48 + doc_id % 211 AS n, (doc_id % 3) % 2 + 1 AS ch, " +
      "doc_id % 2 = 0 AS mu FROM documents WHERE doc_id % 137 <> 0), " +
      "i AS (SELECT doc_id, n, ch, mu, unnest(range(n)) AS i FROM d), " +
      "c AS (SELECT doc_id, ch, mu, (doc_id + 13 * i) % 256 AS cl, " +
      "CASE WHEN ch = 2 THEN (doc_id + 13 * i + 7) % 256 END AS cr FROM i), " +
      s"v AS (SELECT doc_id, ${dec("cl")} AS l, " +
      s"CASE WHEN cr IS NOT NULL THEN ${dec("cr")} END AS r FROM c), " +
      "s AS (SELECT doc_id, sum(l) AS sl, sum(r) AS srr, " +
      "max(greatest(abs(l), coalesce(abs(r), 0))) AS pk FROM v GROUP BY doc_id), " +
      "a AS (SELECT doc_id FROM documents) " +
      "SELECT a.doc_id, " +
      "CASE WHEN a.doc_id % 137 = 0 THEN NULL ELSE CAST((a.doc_id % 3) % 2 + 1 AS INTEGER) END AS channels, " +
      "CASE WHEN a.doc_id % 137 = 0 THEN NULL ELSE CAST(8000 AS INTEGER) END AS sample_rate, " +
      "CASE WHEN a.doc_id % 137 = 0 THEN NULL ELSE CAST(8 AS INTEGER) END AS bits, " +
      "CASE WHEN a.doc_id % 137 = 0 THEN NULL ELSE CAST(48 + a.doc_id % 211 AS BIGINT) END AS n_frames, " +
      "CAST(s.sl AS BIGINT) AS sum_l, CAST(s.srr AS BIGINT) AS sum_r, " +
      "CAST(s.pk AS INTEGER) AS peak " +
      "FROM a LEFT JOIN s ON a.doc_id = s.doc_id ORDER BY a.doc_id"
    },
    // VIDEO header triage twin: the AVI encoder writes avih/strh/strf
    // from doc_id arithmetic, so the oracle restates the header fields
    // directly — certifying the RIFF walk (incl. the odd-JUNK padding)
    // and the LE field offsets
    "mm_video_meta" ->
      ("SELECT doc_id, " +
       "CASE WHEN doc_id % 111 = 0 THEN NULL ELSE CAST(9 + doc_id % 15 AS INTEGER) END AS width, " +
       "CASE WHEN doc_id % 111 = 0 THEN NULL ELSE CAST(9 + (doc_id * 3) % 13 AS INTEGER) END AS height, " +
       "CASE WHEN doc_id % 111 = 0 THEN NULL ELSE CAST(1 + doc_id % 3 AS INTEGER) END AS n_frames, " +
       "CASE WHEN doc_id % 111 = 0 THEN NULL ELSE CAST(1 AS INTEGER) END AS n_streams, " +
       "CASE WHEN doc_id % 111 = 0 THEN NULL ELSE 'MJPG' END AS codec " +
       "FROM documents ORDER BY doc_id"),
    // TIFF pixel twin: the baseline-TIFF encoder writes pixel (x,y)
    // channels from doc_id arithmetic (TiffEncode scaladoc; mode%4>=2
    // is grayscale, which replicates its sum to all three channels;
    // mode = doc_id%48 also cycles uncompressed / LZW / LZW+predictor
    // strips, the tiled organization with padded edge tiles, the
    // separate-plane layout, and 16-bit samples stored as v*257 whose
    // high-byte sums equal the 8-bit formulas — all of which the
    // summed values are invariant to), so the oracle recomputes the
    // exact sums per doc —
    // certifying the IFD walk, the strip/tile/plane partitions, the
    // LZW + predictor decode, the tile-padding exclusion, and both
    // byte orders
    "mm_tiff_pixels" ->
      // modes 48-51 are palette: the pixel stores the gray-formula
      // INDEX; decoded channels are the ColorMap high bytes
      // (i, 2i%256, 3i%256) — the r channel equals the index, g/b wrap.
      // modes 52-63 are sub-8-bit packed gray/bilevel: the gray
      // formula reduced mod 2^bits (bits = 1/2/4 by (m-52)//4), raw
      // sample-value sums replicated to all three channels
      // modes 80-83 are 16-BIT palette: the 65536-entry ColorMap's
      // planes fold mod 256, so the channel sums share the 8-bit
      // palette closed forms — index width invisible BY DESIGN
      ("WITH d AS (SELECT doc_id, 4 + doc_id % 9 AS w, 4 + (doc_id * 3) % 7 AS h, " +
       "doc_id % 84 AS m FROM documents), " +
       "px AS (SELECT doc_id, w, h, m, " +
       "CASE WHEN m >= 52 AND m < 64 THEN (CASE (m - 52) // 4 WHEN 0 THEN 2 WHEN 1 THEN 4 ELSE 16 END) " +
       "ELSE 256 END AS md, " +
       "unnest(range(w * h)) AS i FROM d WHERE doc_id % 131 <> 0), " +
       "s AS (SELECT doc_id, " +
       "sum(CASE WHEN m >= 68 AND m < 72 THEN ((doc_id + 5 * (i % w) + 3 * (i // w)) % 16) * 17 " +
       "WHEN m >= 80 THEN (doc_id + 5 * (i % w) + 3 * (i // w)) % 256 " +
       "WHEN (m >= 48 AND m < 64) OR m % 4 >= 2 THEN (doc_id + 5 * (i % w) + 3 * (i // w)) % md " +
       "ELSE (doc_id + 3 * (i % w) + 7 * (i // w)) % 256 END) AS sr, " +
       "sum(CASE WHEN m >= 68 AND m < 72 THEN ((2 * ((doc_id + 5 * (i % w) + 3 * (i // w)) % 16)) % 16) * 17 " +
       "WHEN m >= 80 THEN (2 * (doc_id + 5 * (i % w) + 3 * (i // w))) % 256 " +
       "WHEN m >= 52 AND m < 64 THEN (doc_id + 5 * (i % w) + 3 * (i // w)) % md " +
       "WHEN m >= 48 AND m < 64 THEN (2 * ((doc_id + 5 * (i % w) + 3 * (i // w)) % 256)) % 256 " +
       "WHEN m % 4 >= 2 THEN (doc_id + 5 * (i % w) + 3 * (i // w)) % 256 " +
       "ELSE (2 * doc_id + 5 * (i % w) + (i // w)) % 256 END) AS sg, " +
       "sum(CASE WHEN m >= 68 AND m < 72 THEN ((3 * ((doc_id + 5 * (i % w) + 3 * (i // w)) % 16)) % 16) * 17 " +
       "WHEN m >= 80 THEN (3 * (doc_id + 5 * (i % w) + 3 * (i // w))) % 256 " +
       "WHEN m >= 52 AND m < 64 THEN (doc_id + 5 * (i % w) + 3 * (i // w)) % md " +
       "WHEN m >= 48 AND m < 64 THEN (3 * ((doc_id + 5 * (i % w) + 3 * (i // w)) % 256)) % 256 " +
       "WHEN m % 4 >= 2 THEN (doc_id + 5 * (i % w) + 3 * (i // w)) % 256 " +
       "ELSE (3 * doc_id + (i % w) + 11 * (i // w)) % 256 END) AS sb " +
       "FROM px GROUP BY doc_id) " +
       "SELECT d.doc_id, " +
       "CASE WHEN d.doc_id % 131 = 0 THEN NULL ELSE CAST(d.w AS INTEGER) END AS width, " +
       "CASE WHEN d.doc_id % 131 = 0 THEN NULL ELSE CAST(d.h AS INTEGER) END AS height, " +
       "CAST(s.sr AS BIGINT) AS sum_r, CAST(s.sg AS BIGINT) AS sum_g, " +
       "CAST(s.sb AS BIGINT) AS sum_b, " +
       "CASE WHEN d.doc_id % 131 = 0 THEN NULL ELSE CAST(d.w * d.h AS BIGINT) END AS n_pixels " +
       "FROM d LEFT JOIN s ON d.doc_id = s.doc_id ORDER BY d.doc_id"),
    // MP4 triage twin: the ISO-BMFF encoder writes ftyp/mvhd/tkhd/hdlr
    // from doc_id arithmetic (Mp4Encode scaladoc), so the oracle
    // restates every header field directly — certifying the box walk
    // incl. both mvhd/tkhd versions, the 64-bit largesize path, and
    // the size==0 open-mdat path, all of which cycle on doc_id
    // WebP triage twin: the container variant cycles on doc_id%3 and
    // every reported field is doc_id arithmetic (WebpEncode scaladoc)
    // — the oracle restates the whole row, certifying the VP8 frame
    // tag, VP8L packed dims + alpha bit, and VP8X flags paths alike
    // sitemap entries: two-level index docs on every 9th id, urlset
    // docs otherwise (1..6 urls, locs with &amp;-coded queries that
    // must DECODE) — every field doc_id arithmetic
    "text_sitemap_urls" ->
      ("SELECT doc_id, CAST(t.i AS INTEGER) AS url_idx, " +
       "CASE WHEN doc_id % 9 = 0 THEN 'sitemap' ELSE 'url' END AS kind, " +
       "CASE WHEN doc_id % 9 = 0 THEN " +
       "'https://ex' || CAST(doc_id % 100 AS VARCHAR) || '.org/sitemap' || CAST(t.i AS VARCHAR) || '.xml' " +
       "ELSE 'https://ex' || CAST(doc_id % 100 AS VARCHAR) || '.org/p' || CAST(t.i AS VARCHAR) || " +
       "'?a=1&b=' || CAST(t.i AS VARCHAR) END AS loc, " +
       "CASE WHEN doc_id % 9 = 0 THEN '2024-0' || CAST(t.i + 1 AS VARCHAR) || '-01' " +
       "ELSE '2024-01-' || lpad(CAST((doc_id + t.i) % 28 + 1 AS VARCHAR), 2, '0') END AS lastmod " +
       "FROM documents CROSS JOIN (VALUES (0), (1), (2), (3), (4), (5)) AS t(i) " +
       "WHERE (doc_id % 9 = 0 AND t.i < 2) OR (doc_id % 9 <> 0 AND t.i <= doc_id % 6) " +
       "ORDER BY doc_id, url_idx"),
    // robots.txt directives: fixed 5-row shape per doc (two groups +
    // the standalone sitemap), every path doc_id arithmetic
    "text_robots_rules" ->
      ("SELECT doc_id, CAST(t.i AS INTEGER) AS rule_idx, " +
       "CASE WHEN t.i <= 2 THEN '*' WHEN t.i = 3 THEN 'graftbot' ELSE NULL END AS agent, " +
       "CASE t.i WHEN 0 THEN 'disallow' WHEN 1 THEN 'allow' WHEN 2 THEN 'crawl-delay' " +
       "WHEN 3 THEN 'disallow' ELSE 'sitemap' END AS rule, " +
       "CASE t.i WHEN 0 THEN '/private' || CAST(doc_id % 5 AS VARCHAR) || '/' " +
       "WHEN 1 THEN '/private' || CAST(doc_id % 5 AS VARCHAR) || '/ok/' " +
       "WHEN 2 THEN CAST(doc_id % 30 + 1 AS VARCHAR) " +
       "WHEN 3 THEN '/docs/*x' || CAST(doc_id % 9 AS VARCHAR) || '.tmp$' " +
       "ELSE 'https://ex' || CAST(doc_id % 100 AS VARCHAR) || '.org/sitemap.xml' END AS path " +
       "FROM documents CROSS JOIN (VALUES (0), (1), (2), (3), (4)) AS t(i) " +
       "ORDER BY doc_id, rule_idx"),
    // the RFC 9309 verdict: group selection (exact token beats *),
    // longest-match allow-over-disallow, wildcard, $ anchor — the
    // expected booleans are invariants of the planted rule shapes
    "pipeline_robots_gate" ->
      ("SELECT doc_id, CAST(t.i AS INTEGER) AS case_id, " +
       "CASE WHEN t.i IN (0, 1, 4) THEN 'anybot' ELSE 'graftbot' END AS agent, " +
       "CASE t.i WHEN 0 THEN '/private' || CAST(doc_id % 5 AS VARCHAR) || '/ok/page' " +
       "WHEN 1 THEN '/private' || CAST(doc_id % 5 AS VARCHAR) || '/secret' " +
       "WHEN 3 THEN '/docs/ax' || CAST(doc_id % 9 AS VARCHAR) || '.tmp.bak' " +
       "ELSE '/docs/ax' || CAST(doc_id % 9 AS VARCHAR) || '.tmp' END AS path, " +
       "t.i IN (0, 3, 4) AS allowed " +
       "FROM documents CROSS JOIN (VALUES (0), (1), (2), (3), (4)) AS t(i) " +
       "ORDER BY doc_id, case_id"),
    // the FULL-stack ingest: WARC → HTTP message (status/type routing
    // drops the planted 404 text/plain rows) → HTML extraction; the
    // transfer mode (Content-Length / chunked / read-to-end, doc_id%3)
    // is invisible BY DESIGN — one oracle certifies de-chunking
    // against the length paths
    "pipeline_http_ingest" ->
      ("SELECT doc_id, " +
       "'http://ex' || CAST(doc_id % 100 AS VARCHAR) || '.org/p' || CAST(doc_id % 13 AS VARCHAR) AS target_uri, " +
       "CAST(200 AS INTEGER) AS status, " +
       "'Doc ' || CAST(doc_id AS VARCHAR) || ' - ' || source || " +
       "' Doc ' || CAST(doc_id AS VARCHAR) || ' ' || " +
       "regexp_replace(trim(text), '\\s+', ' ', 'g') || " +
       "' Entities: & <b> \"q\" AB &unknown; end more ' || " +
       "CAST(doc_id % 7 AS VARCHAR) || ' home' AS extracted " +
       "FROM documents WHERE doc_id % 163 <> 0 AND doc_id % 17 <> 0 ORDER BY doc_id"),
    // the charset leg: every surviving row's text is that variant's
    // decoded page whichever key decoded it — declared cp1252 (v0),
    // the WHATWG iso-8859-1→cp1252 label mapping (v1), the <meta
    // charset> prescan (v2, charset column NULL by design), honest
    // utf-8 (v3); v4 (utf-8 declared over cp1252 bytes) DECLINES and
    // is absent; v5-9 are the multi-byte East-Asian tier (shift_jis /
    // euc-jp / gb2312 / big5 / euc-kr), their REAL multi-byte wire
    // bytes invisible here BY DESIGN — the decoded unicode restated.
    // Transfer framing and content coding cycle underneath, invisible
    "pipeline_http_charset" ->
      ("SELECT doc_id, " +
       // variant 0's sub-cycle: the single-byte family, each row's
       // charset the DECLARED label (alias piles exercised: greek,
       // cp1256, latin2); variant 3's: honest utf-8 / BOM'd UTF-16LE
       // behind a charset=utf-8 header (the BOM outranks — same
       // decoded text) / labeled utf-16be
       "CASE doc_id % 10 WHEN 0 THEN " +
       "(CASE (doc_id // 10) % 6 WHEN 0 THEN 'windows-1252' " +
       "WHEN 1 THEN 'windows-1251' WHEN 2 THEN 'greek' " +
       "WHEN 3 THEN 'koi8-r' WHEN 4 THEN 'cp1256' ELSE 'latin2' END) " +
       "WHEN 1 THEN 'iso-8859-1' " +
       "WHEN 3 THEN (CASE WHEN (doc_id // 10) % 3 = 2 THEN 'utf-16be' ELSE 'utf-8' END) " +
       "WHEN 5 THEN 'shift_jis' WHEN 6 THEN 'euc-jp' " +
       "WHEN 7 THEN 'gb2312' WHEN 8 THEN 'big5' WHEN 9 THEN 'euc-kr' " +
       "ELSE NULL END AS charset, " +
       "'<html><head>' || " +
       "CASE WHEN doc_id % 10 = 2 THEN '<meta charset=\"windows-1252\">' ELSE '' END || " +
       "'</head><body>' || " +
       "CASE WHEN doc_id % 10 = 0 THEN " +
       "(CASE (doc_id // 10) % 6 WHEN 0 THEN 'Café “quote” – €' " +
       "WHEN 1 THEN 'Привет «мир» №' " +
       "WHEN 2 THEN 'Γειά σου € κόσμε' " +
       "WHEN 3 THEN 'Привет ё мир' " +
       "WHEN 4 THEN 'مرحبا بالعالم' " +
       "ELSE 'Žluťoučký kůň' END) " +
       "WHEN doc_id % 10 IN (5, 6) THEN 'こんにちは世界 テスト' " +
       "WHEN doc_id % 10 = 7 THEN '你好世界 测试' " +
       "WHEN doc_id % 10 = 8 THEN '你好世界 測試' " +
       "WHEN doc_id % 10 = 9 THEN '안녕하세요 세계' " +
       "ELSE 'Café “quote” – €' END || " +
       "' id=' || CAST(doc_id AS VARCHAR) || " +
       "'</body></html>' AS text " +
       "FROM documents WHERE doc_id % 141 <> 0 AND doc_id % 10 <> 4 " +
       "ORDER BY doc_id"),
    // the composed ingest: the response payload IS the html fixture's
    // page, so the expected extraction is text_html_extract's proven
    // round-trip expression; the URI is the WARC fixture's arithmetic;
    // compressed-vs-plain (doc_id%2) is invisible BY DESIGN
    "pipeline_warc_ingest" ->
      ("SELECT doc_id, " +
       "'http://ex' || CAST(doc_id % 100 AS VARCHAR) || '.org/p' || CAST(doc_id % 13 AS VARCHAR) AS target_uri, " +
       "'Doc ' || CAST(doc_id AS VARCHAR) || ' - ' || source || " +
       "' Doc ' || CAST(doc_id AS VARCHAR) || ' ' || " +
       "regexp_replace(trim(text), '\\s+', ' ', 'g') || " +
       "' Entities: & <b> \"q\" AB &unknown; end more ' || " +
       "CAST(doc_id % 7 AS VARCHAR) || ' home' AS extracted " +
       "FROM documents WHERE doc_id % 163 <> 0 ORDER BY doc_id"),
    // WARC triage twin: every doc (bar the corrupt gate) carries
    // exactly three records whose type/URI/length are doc_id
    // arithmetic (WarcEncode.recordPlan); compressed vs uncompressed
    // layout is invisible in the output BY DESIGN, so this one oracle
    // certifies the gzip member-split and the length-delimited walk
    // against each other
    "mm_warc_records" ->
      ("SELECT doc_id, CAST(t.i AS INTEGER) AS rec_idx, " +
       "CASE t.i WHEN 0 THEN 'warcinfo' WHEN 1 THEN 'request' ELSE 'response' END AS warc_type, " +
       "CASE WHEN t.i = 0 THEN NULL " +
       "ELSE 'http://ex' || CAST(doc_id % 100 AS VARCHAR) || '.org/p' || CAST(doc_id % 13 AS VARCHAR) " +
       "END AS target_uri, " +
       "CAST(CASE t.i WHEN 0 THEN doc_id % 40 + 10 WHEN 1 THEN doc_id % 30 + 8 " +
       "ELSE doc_id % 200 + 50 END AS BIGINT) AS content_length " +
       "FROM documents CROSS JOIN (VALUES (0), (1), (2)) AS t(i) " +
       "WHERE doc_id % 157 <> 0 ORDER BY doc_id, rec_idx"),
    // PDF triage twin: every field is doc_id arithmetic (PdfEncode
    // scaladoc) — the oracle restates the full startxref → xref →
    // trailer → Catalog → Pages walk: version minor, /Count, the
    // /Encrypt flag, and the in-use object census (catalog + pages
    // node + one object per page + the encrypt dict when present)
    "mm_pdf_meta" ->
      ("SELECT doc_id, " +
       "CASE WHEN doc_id % 151 = 0 THEN NULL " +
       "ELSE '1.' || CAST(doc_id % 8 AS VARCHAR) END AS version, " +
       "CASE WHEN doc_id % 151 = 0 THEN NULL " +
       "ELSE CAST(doc_id % 24 + 1 AS INTEGER) END AS n_pages, " +
       "CASE WHEN doc_id % 151 = 0 THEN NULL ELSE doc_id % 11 = 0 END AS encrypted, " +
       // census per layout (doc_id%3): classic = catalog + pages +
       // one per page (+enc); the xref-STREAM layouts add the xref
       // stream object itself (+1) and the ObjStm container (+1 more)
       "CASE WHEN doc_id % 151 = 0 THEN NULL " +
       "ELSE CAST(doc_id % 24 + 3 + doc_id % 3 + " +
       "CASE WHEN doc_id % 11 = 0 THEN 1 ELSE 0 END AS INTEGER) " +
       "END AS n_objects " +
       "FROM documents ORDER BY doc_id"),
    // the document leg of the composed ingest: the PDF text oracle's
    // page expression behind the WARC/HTTP/status gates â transfer
    // framing, content coding, and WARC compression are invisible BY
    // DESIGN, so this one oracle certifies de-chunking, gzip content
    // decode, and the PDF walk against each other
    "pipeline_pdf_ingest" ->
      ("SELECT doc_id, " +
       "'http://ex' || CAST(doc_id % 100 AS VARCHAR) || '.org/p' || CAST(doc_id % 13 AS VARCHAR) AS target_uri, " +
       "CAST(t.i AS INTEGER) AS page_no, " +
       "CASE WHEN doc_id % 17 = 0 AND t.i = 1 THEN NULL ELSE " +
       "'Doc ' || CAST(doc_id AS VARCHAR) || ' (page ' || CAST(t.i + 1 AS VARCHAR) || ') ' || " +
       "CASE WHEN doc_id % 13 = 0 THEN 'é€𝄞ffi' " +
       "WHEN doc_id % 29 = 0 THEN '☃' " +
       "WHEN doc_id % 11 = 0 THEN 'é€' ELSE 'A' END || chr(10) || " +
       "'alpha betagamma' || chr(10) || " +
       "CASE WHEN doc_id % 13 = 0 THEN 'ABC end' " +
       "WHEN doc_id % 29 = 0 THEN 'sym end' " +
       "WHEN doc_id % 2 = 0 THEN 'café “q” – € end' " +
       "ELSE 'caf‘q’ «g» ﬁn – end' END END AS page_text " +
       "FROM documents CROSS JOIN (VALUES (0), (1), (2), (3)) AS t(i) " +
       "WHERE doc_id % 159 <> 0 AND doc_id % 19 <> 0 AND t.i < doc_id % 4 + 1 " +
       "ORDER BY doc_id, page_no"),
    // xlsx ingest twin: one row per cell, ordered by ref; A-cells via
    // the REVERSED shared-string table (the index hop certified), B
    // numeric passthrough, C inline strings on r%3==0 rows only, the
    // styling-only D cells absent BY DESIGN
    "pipeline_xlsx_ingest" ->
      ("SELECT doc_id, c.col || CAST(t.r AS VARCHAR) AS ref, " +
       "CASE c.col WHEN 'A' THEN 'Item ' || CAST(doc_id + t.r AS VARCHAR) || ' & <co>' " +
       "WHEN 'B' THEN CAST((doc_id + 7 * t.r) % 1000 AS VARCHAR) " +
       "ELSE 'inline ' || CAST(t.r AS VARCHAR) END AS value " +
       "FROM documents CROSS JOIN (VALUES (1), (2), (3), (4)) AS t(r) " +
       "CROSS JOIN (VALUES ('A'), ('B'), ('C')) AS c(col) " +
       "WHERE doc_id % 133 <> 0 AND t.r <= doc_id % 4 + 1 " +
       "AND (c.col <> 'C' OR t.r % 3 = 0) " +
       "ORDER BY doc_id, ref"),
    // the document-triage twin: one row per mixed-corpus doc â kind
    // from the magic routing (doc_id%8), text = that format's units
    // joined with newlines (string_agg in unit order); plain zips are
    // kind-only with NULL text. The SAME unit expressions as the
    // per-unit ingest oracles, re-aggregated
    "pipeline_doc_triage" ->
      ("WITH d AS (SELECT doc_id, doc_id % 8 AS m, doc_id % 4 + 1 AS n4, " +
       "doc_id % 3 + 1 AS n3 FROM documents WHERE doc_id % 119 <> 0), " +
       "u AS (" +
       "SELECT doc_id, t.i AS idx, " +
       "'Para ' || CAST(t.i AS VARCHAR) || ' of doc ' || CAST(doc_id AS VARCHAR) || " +
       "' has & <tags> x=' || CAST((doc_id + t.i) % 7 AS VARCHAR) || " +
       "CASE WHEN (doc_id + t.i) % 3 = 0 THEN chr(9) || 'end' ELSE '' END AS unit " +
       "FROM d CROSS JOIN (VALUES (0), (1), (2), (3)) AS t(i) WHERE m = 0 AND t.i < n4 " +
       "UNION ALL " +
       "SELECT doc_id, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY t.r, c.col) - 1, " +
       "c.col || CAST(t.r AS VARCHAR) || '=' || " +
       "CASE c.col WHEN 'A' THEN 'Item ' || CAST(doc_id + t.r AS VARCHAR) || ' & <co>' " +
       "WHEN 'B' THEN CAST((doc_id + 7 * t.r) % 1000 AS VARCHAR) " +
       "ELSE 'inline ' || CAST(t.r AS VARCHAR) END " +
       "FROM d CROSS JOIN (VALUES (1), (2), (3), (4)) AS t(r) " +
       "CROSS JOIN (VALUES ('A'), ('B'), ('C')) AS c(col) " +
       "WHERE m = 1 AND t.r <= n4 AND (c.col <> 'C' OR t.r % 3 = 0) " +
       "UNION ALL " +
       "SELECT doc_id, t.i, " +
       "'Slide ' || CAST(t.i + 1 AS VARCHAR) || ' of deck ' || CAST(doc_id AS VARCHAR) || chr(10) || " +
       "'note & <pt> k=' || CAST((doc_id + t.i + 1) % 9 AS VARCHAR) || " +
       "CASE WHEN (doc_id + t.i + 1) % 2 = 0 THEN chr(10) || 'more' ELSE '' END " +
       "FROM d CROSS JOIN (VALUES (0), (1), (2)) AS t(i) WHERE m = 2 AND t.i < n3 " +
       "UNION ALL " +
       "SELECT doc_id, t.i, " +
       "'c' || CAST(t.i + 1 AS VARCHAR) || ' Chapter ' || CAST(t.i + 1 AS VARCHAR) || " +
       "' of book ' || CAST(doc_id AS VARCHAR) || ': alpha & beta ' || " +
       "CAST((doc_id + 3 * (t.i + 1)) % 11 AS VARCHAR) || ' done' " +
       "FROM d CROSS JOIN (VALUES (0), (1), (2)) AS t(i) WHERE m = 3 AND t.i < n3 " +
       "UNION ALL " +
       "SELECT doc_id, t.i, " +
       "'Doc ' || CAST(doc_id AS VARCHAR) || ' (page ' || CAST(t.i + 1 AS VARCHAR) || ') ' || " +
       "CASE WHEN doc_id % 13 = 0 THEN 'é€𝄞ffi' " +
       "WHEN doc_id % 29 = 0 THEN '☃' " +
       "WHEN doc_id % 11 = 0 THEN 'é€' ELSE 'A' END || chr(10) || " +
       "'alpha betagamma' || chr(10) || " +
       "CASE WHEN doc_id % 13 = 0 THEN 'ABC end' " +
       "WHEN doc_id % 29 = 0 THEN 'sym end' " +
       "WHEN doc_id % 2 = 0 THEN 'café “q” – € end' " +
       "ELSE 'caf‘q’ «g» ﬁn – end' END " +
       "FROM d CROSS JOIN (VALUES (0), (1), (2), (3)) AS t(i) WHERE m = 5 AND t.i < n4 " +
       // a %17 doc with >=2 pages has a DECLINED page: the whole-doc
       // text is NULL (excluding its units here leaves the LEFT JOIN
       // serving NULL), never a truncated concatenation
       "AND NOT (doc_id % 17 = 0 AND doc_id % 4 >= 1) " +
       "UNION ALL " +
       // rtf: decodedPara paragraphs + the trailing \par newline (the
       // empty unit at i = n4 makes string_agg end with chr(10))
       "SELECT doc_id, t.i, " +
       "CASE WHEN t.i = n4 THEN '' ELSE " +
       "'Para ' || CAST(t.i AS VARCHAR) || ' of doc ' || CAST(doc_id AS VARCHAR) || ': ' || " +
       "CASE CAST((doc_id + t.i) % 3 AS INTEGER) " +
       "WHEN 0 THEN '— “q” • fin' " +
       "WHEN 1 THEN 'café résumé' " +
       "ELSE '€ §' || chr(9) || 'end' END END " +
       "FROM d CROSS JOIN (VALUES (0), (1), (2), (3), (4)) AS t(i) " +
       "WHERE m = 6 AND t.i <= n4 " +
       "UNION ALL " +
       // odt: heading + items, no trailing newline
       "SELECT doc_id, t.i, " +
       "CASE WHEN t.i = 0 THEN 'Doc ' || CAST(doc_id AS VARCHAR) || ' heading' " +
       "ELSE 'Item ' || CAST(t.i AS VARCHAR) || ' of doc ' || CAST(doc_id AS VARCHAR) || " +
       "': a & b  <x=' || CAST((doc_id + t.i) % 9 AS VARCHAR) || '>' || " +
       "CASE WHEN (doc_id + t.i) % 3 = 0 THEN chr(9) || 'end' ELSE '' END " +
       "END " +
       "FROM d CROSS JOIN (VALUES (0), (1), (2), (3)) AS t(i) " +
       "WHERE m = 7 AND t.i < n4 " +
       "UNION ALL " +
       // binary .doc (the m=4 CFB sub-split): DocEncode.decodedPara
       // paragraphs, each ending with the \r paragraph mark (the empty
       // unit at i = n4 makes string_agg end with chr(10))
       "SELECT doc_id, t.i, " +
       "CASE WHEN t.i = n4 THEN '' ELSE " +
       "'Para ' || CAST(t.i AS VARCHAR) || ' of doc ' || CAST(doc_id AS VARCHAR) || ': ' || " +
       "CASE WHEN t.i < (n4 + 1) // 2 " +
       "THEN 'café §' || CAST((doc_id + t.i) % 9 AS VARCHAR) " +
       "ELSE '€ — 𝄞 ok' END END " +
       "FROM d CROSS JOIN (VALUES (0), (1), (2), (3), (4)) AS t(i) " +
       "WHERE m = 4 AND (doc_id // 8) % 4 = 1 AND t.i <= n4 " +
       "UNION ALL " +
       // binary .xls (the m=4 CFB sub-split): the BIFF8 grid as
       // row,col=value lines in row-then-column order —
       // XlsEncode.decodedRow restated (RK / SST / Number / MulRk /
       // Formula cached results / BoolErr / Label)
       "SELECT doc_id, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY t.r, c.col) - 1, " +
       "CAST(t.r AS VARCHAR) || ',' || CAST(c.col AS VARCHAR) || '=' || " +
       "CASE c.col " +
       "WHEN 1 THEN (CASE WHEN t.r % 2 = 0 THEN CAST((doc_id + 11 * t.r) % 500 AS VARCHAR) " +
       "WHEN ((doc_id + 11 * t.r) % 500) % 100 = 0 THEN CAST(((doc_id + 11 * t.r) % 500) // 100 AS VARCHAR) " +
       "WHEN ((doc_id + 11 * t.r) % 500) % 10 = 0 THEN CAST(((doc_id + 11 * t.r) % 500) // 100 AS VARCHAR) || '.' || CAST((((doc_id + 11 * t.r) % 500) % 100) // 10 AS VARCHAR) " +
       "ELSE CAST(((doc_id + 11 * t.r) % 500) // 100 AS VARCHAR) || '.' || lpad(CAST(((doc_id + 11 * t.r) % 500) % 100 AS VARCHAR), 2, '0') END) " +
       "WHEN 2 THEN 'Row ' || CAST(t.r AS VARCHAR) || ' of wb ' || CAST(doc_id AS VARCHAR) || " +
       "(CASE WHEN t.r % 2 = 1 THEN ' é€' ELSE ' ok' END) " +
       "WHEN 3 THEN CAST((doc_id + 7 * t.r) % 1000 AS VARCHAR) " +
       "WHEN 4 THEN CAST((doc_id + t.r) % 90 AS VARCHAR) " +
       "WHEN 5 THEN CAST((doc_id + t.r) % 90 + 1 AS VARCHAR) " +
       "WHEN 6 THEN (CASE WHEN t.r % 2 = 0 " +
       "THEN CAST((doc_id + 13 * t.r) % 777 AS VARCHAR) || '.5' " +
       "ELSE 'Fml ' || CAST(t.r AS VARCHAR) || ' é' || CAST((doc_id + t.r) % 7 AS VARCHAR) END) " +
       "WHEN 7 THEN (CASE WHEN t.r % 2 = 0 THEN " +
       "(CASE WHEN t.r % 4 = 0 THEN 'TRUE' ELSE 'FALSE' END) " +
       "ELSE '#DIV/0!' END) " +
       "ELSE 'Lbl ' || CAST(t.r AS VARCHAR) || ' of wb ' || CAST(doc_id AS VARCHAR) END " +
       "FROM d CROSS JOIN (VALUES (1), (2), (3), (4)) AS t(r) " +
       "CROSS JOIN (VALUES (1), (2), (3), (4), (5), (6), (7), (8)) AS c(col) " +
       "WHERE m = 4 AND (doc_id // 8) % 4 = 2 AND t.r <= n4 " +
       "AND (c.col <= 3 OR c.col IN (6, 7) " +
       "OR (c.col IN (4, 5) AND t.r % 3 = 0) " +
       "OR (c.col = 8 AND t.r % 3 = 1)) " +
       "UNION ALL " +
       // binary .ppt (the m=4 CFB sub-split): PptEncode.decodedSlide
       // restated — each slide's own text already contains a newline
       "SELECT doc_id, t.i, " +
       "CASE WHEN t.i % 2 = 0 THEN " +
       "'Deck ' || CAST(doc_id AS VARCHAR) || ' slide ' || CAST(t.i AS VARCHAR) || " +
       "' café' || chr(10) || 'line ' || CAST((doc_id + t.i) % 8 AS VARCHAR) " +
       "ELSE 'Deck ' || CAST(doc_id AS VARCHAR) || ' slide ' || CAST(t.i AS VARCHAR) || " +
       "' € 𝄞 k=' || CAST((doc_id + t.i) % 8 AS VARCHAR) END " +
       "FROM d CROSS JOIN (VALUES (1), (2), (3)) AS t(i) " +
       "WHERE m = 4 AND (doc_id // 8) % 4 = 3 AND t.i <= n3), " +
       "agg AS (SELECT doc_id, string_agg(unit, chr(10) ORDER BY idx) AS text " +
       "FROM u GROUP BY doc_id) " +
       "SELECT d.doc_id, " +
       "CASE m WHEN 0 THEN 'docx' WHEN 1 THEN 'xlsx' WHEN 2 THEN 'pptx' " +
       "WHEN 3 THEN 'epub' " +
       "WHEN 4 THEN (CASE (d.doc_id // 8) % 4 WHEN 1 THEN 'doc' " +
       "WHEN 2 THEN 'xls' WHEN 3 THEN 'ppt' ELSE 'zip' END) " +
       "WHEN 5 THEN 'pdf' " +
       "WHEN 6 THEN 'rtf' ELSE 'odt' END AS kind, " +
       "agg.text AS text " +
       "FROM d LEFT JOIN agg ON d.doc_id = agg.doc_id " +
       // the %119 no-container rows: even ids are plain text (raw /
       // BOM'd UTF-8 / BOM'd UTF-16LE all decode to the SAME string —
       // one column certifies all three paths), odd ids are a binary
       // blob the text gate refuses → the counted kind='other' bucket
       "UNION ALL SELECT doc_id, " +
       "CASE WHEN doc_id % 2 = 0 THEN 'txt' ELSE 'other' END AS kind, " +
       "CASE WHEN doc_id % 2 = 0 THEN substr(text, 1, 22) ELSE NULL END AS text " +
       "FROM documents WHERE doc_id % 119 = 0 " +
       "ORDER BY doc_id"),
    // the ROUTED attachment ingest twin: kind from doc_id%7, units
    // from each format's own contract — the docx paragraphs, xlsx
    // ref=value cells (position by row-then-column order), pptx
    // slides, epub chapters, and the unitless plain-zip rows whose
    // routing verdict is the payload
    "pipeline_office_ingest" ->
      ("WITH d AS (SELECT doc_id, doc_id % 7 AS m, doc_id % 4 + 1 AS n4, " +
       "doc_id % 3 + 1 AS n3 FROM documents WHERE doc_id % 121 <> 0), " +
       "u AS (" +
       "SELECT doc_id, 'docx' AS kind, t.i AS idx, " +
       "'Para ' || CAST(t.i AS VARCHAR) || ' of doc ' || CAST(doc_id AS VARCHAR) || " +
       "' has & <tags> x=' || CAST((doc_id + t.i) % 7 AS VARCHAR) || " +
       "CASE WHEN (doc_id + t.i) % 3 = 0 THEN chr(9) || 'end' ELSE '' END AS unit " +
       "FROM d CROSS JOIN (VALUES (0), (1), (2), (3)) AS t(i) WHERE m = 0 AND t.i < n4 " +
       "UNION ALL " +
       "SELECT doc_id, 'xlsx', ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY t.r, c.col) - 1, " +
       "c.col || CAST(t.r AS VARCHAR) || '=' || " +
       "CASE c.col WHEN 'A' THEN 'Item ' || CAST(doc_id + t.r AS VARCHAR) || ' & <co>' " +
       "WHEN 'B' THEN CAST((doc_id + 7 * t.r) % 1000 AS VARCHAR) " +
       "ELSE 'inline ' || CAST(t.r AS VARCHAR) END " +
       "FROM d CROSS JOIN (VALUES (1), (2), (3), (4)) AS t(r) " +
       "CROSS JOIN (VALUES ('A'), ('B'), ('C')) AS c(col) " +
       "WHERE m = 1 AND t.r <= n4 AND (c.col <> 'C' OR t.r % 3 = 0) " +
       "UNION ALL " +
       "SELECT doc_id, 'pptx', t.i, " +
       "'Slide ' || CAST(t.i + 1 AS VARCHAR) || ' of deck ' || CAST(doc_id AS VARCHAR) || chr(10) || " +
       "'note & <pt> k=' || CAST((doc_id + t.i + 1) % 9 AS VARCHAR) || " +
       "CASE WHEN (doc_id + t.i + 1) % 2 = 0 THEN chr(10) || 'more' ELSE '' END " +
       "FROM d CROSS JOIN (VALUES (0), (1), (2)) AS t(i) WHERE m = 2 AND t.i < n3 " +
       "UNION ALL " +
       "SELECT doc_id, 'epub', t.i, " +
       "'c' || CAST(t.i + 1 AS VARCHAR) || ' Chapter ' || CAST(t.i + 1 AS VARCHAR) || " +
       "' of book ' || CAST(doc_id AS VARCHAR) || ': alpha & beta ' || " +
       "CAST((doc_id + 3 * (t.i + 1)) % 11 AS VARCHAR) || ' done' " +
       "FROM d CROSS JOIN (VALUES (0), (1), (2)) AS t(i) WHERE m = 3 AND t.i < n3 " +
       "UNION ALL " +
       "SELECT doc_id, 'zip', -1, NULL FROM d WHERE m = 4 " +
       "UNION ALL " +
       "SELECT doc_id, 'odt', t.i, " +
       "CASE WHEN t.i = 0 THEN 'Doc ' || CAST(doc_id AS VARCHAR) || ' heading' " +
       "ELSE 'Item ' || CAST(t.i AS VARCHAR) || ' of doc ' || CAST(doc_id AS VARCHAR) || " +
       "': a & b  <x=' || CAST((doc_id + t.i) % 9 AS VARCHAR) || '>' || " +
       "CASE WHEN (doc_id + t.i) % 3 = 0 THEN chr(9) || 'end' ELSE '' END " +
       "END " +
       "FROM d CROSS JOIN (VALUES (0), (1), (2), (3)) AS t(i) " +
       "WHERE m = 5 AND t.i < n4 " +
       "UNION ALL " +
       // ods: row-major cells as 'r,c=v' units
       "SELECT doc_id, 'ods', ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY rr, cc) - 1, " +
       "CAST(rr AS VARCHAR) || ',' || CAST(cc AS VARCHAR) || '=' || vv FROM (" +
       "SELECT d.doc_id, t.r AS rr, 1 AS cc, " +
       "CAST((d.doc_id + 31 * t.r) % 1000 AS VARCHAR) || '.' || " +
       "CAST((d.doc_id + t.r) % 10 AS VARCHAR) AS vv " +
       "FROM d CROSS JOIN (VALUES (1), (2), (3), (4)) AS t(r) " +
       "WHERE m = 6 AND t.r <= n4 " +
       "UNION ALL " +
       "SELECT d.doc_id, t.r, CASE WHEN (d.doc_id + t.r) % 3 = 0 THEN 4 ELSE 2 END, " +
       "'Row ' || CAST(t.r AS VARCHAR) || ' of doc ' || CAST(d.doc_id AS VARCHAR) || ' & <ods>' " +
       "FROM d CROSS JOIN (VALUES (1), (2), (3), (4)) AS t(r) " +
       "WHERE m = 6 AND t.r <= n4 " +
       "UNION ALL " +
       "SELECT d.doc_id, t.r, " +
       "(CASE WHEN (d.doc_id + t.r) % 3 = 0 THEN 4 ELSE 2 END) + k.k, " +
       "'rep ' || CAST(t.r AS VARCHAR) " +
       "FROM d CROSS JOIN (VALUES (1), (2), (3), (4)) AS t(r) " +
       "CROSS JOIN (VALUES (1), (2)) AS k(k) " +
       "WHERE m = 6 AND t.r <= n4 AND (d.doc_id + t.r) % 4 = 0) q) " +
       "SELECT doc_id, kind, CAST(idx AS INTEGER) AS unit_idx, unit FROM u " +
       "ORDER BY doc_id, unit_idx"),
    // pptx ingest twin: one row per slide; title paragraph + the
    // split-run body with entities, the <a:br/> line break on
    // alternating slides — DrawingML property blocks invisible
    "pipeline_pptx_ingest" ->
      ("SELECT doc_id, CAST(t.i AS INTEGER) AS slide_no, " +
       "'Slide ' || CAST(t.i + 1 AS VARCHAR) || ' of deck ' || CAST(doc_id AS VARCHAR) || chr(10) || " +
       "'note & <pt> k=' || CAST((doc_id + t.i + 1) % 9 AS VARCHAR) || " +
       "CASE WHEN (doc_id + t.i + 1) % 2 = 0 THEN chr(10) || 'more' ELSE '' END AS slide_text " +
       "FROM documents CROSS JOIN (VALUES (0), (1), (2)) AS t(i) " +
       "WHERE doc_id % 129 <> 0 AND t.i < doc_id % 3 + 1 " +
       "ORDER BY doc_id, slide_no"),
    // epub ingest twin: one row per spine chapter in READING order
    // (the fixture's manifest is reversed BY DESIGN); the text is the
    // HtmlText extraction of the chapter XHTML — title visible,
    // <style> stripped, entities decoded, whitespace normalized
    "pipeline_epub_ingest" ->
      ("SELECT doc_id, CAST(t.i AS INTEGER) AS chapter_no, " +
       "'c' || CAST(t.i + 1 AS VARCHAR) || ' Chapter ' || CAST(t.i + 1 AS VARCHAR) || " +
       "' of book ' || CAST(doc_id AS VARCHAR) || ': alpha & beta ' || " +
       "CAST((doc_id + 3 * (t.i + 1)) % 11 AS VARCHAR) || ' done' AS chapter_text " +
       "FROM documents CROSS JOIN (VALUES (0), (1), (2)) AS t(i) " +
       "WHERE doc_id % 123 <> 0 AND t.i < doc_id % 3 + 1 " +
       "ORDER BY doc_id, chapter_no"),
    // PDF text-extraction twin: one row per (doc, page); the decoded
    // page text is PdfTextEncode.decodedPage restated â line 1 with
    // its escaped parens and octal-escape 'A', line 2's TJ word-break
    // contract (-250 = space, -40 = nothing), and line 3's encoding-
    // specific characters (WinAnsi on even docs, Standard on odd).
    // %13==0 docs are the Type0 Identity-H + /ToUnicode tier: line 1
    // carries the CMap bfchar specials (incl. a surrogate pair and a
    // multi-unit target), line 3 the array-form bfrange.
    // FlateDecode (%3), the intermediate-/Pages tree with inherited
    // resources (%5) and the two-stream /Contents array (%7) are
    // invisible BY DESIGN â one oracle certifies all the layouts
    "text_pdf_extract" ->
      ("SELECT doc_id, CAST(t.i AS INTEGER) AS page_no, " +
       "CASE WHEN doc_id % 17 = 0 AND t.i = 1 THEN NULL ELSE " +
       "'Doc ' || CAST(doc_id AS VARCHAR) || ' (page ' || CAST(t.i + 1 AS VARCHAR) || ') ' || " +
       "CASE WHEN doc_id % 13 = 0 THEN 'é€𝄞ffi' " +
       "WHEN doc_id % 29 = 0 THEN '☃' " +
       "WHEN doc_id % 11 = 0 THEN 'é€' ELSE 'A' END || chr(10) || " +
       "'alpha betagamma' || chr(10) || " +
       "CASE WHEN doc_id % 13 = 0 THEN 'ABC end' " +
       "WHEN doc_id % 29 = 0 THEN 'sym end' " +
       "WHEN doc_id % 2 = 0 THEN 'café “q” – € end' " +
       "ELSE 'caf‘q’ «g» ﬁn – end' END END AS page_text " +
       "FROM documents CROSS JOIN (VALUES (0), (1), (2), (3)) AS t(i) " +
       "WHERE doc_id % 151 <> 0 AND t.i < doc_id % 4 + 1 " +
       "ORDER BY doc_id, page_no"),
    // ZIP census twin: 1..6 entries per doc, every reported field
    // doc_id arithmetic (names e<i>.txt, methods alternate STORED 0 /
    // DEFLATED 8, sizes (doc_id+i)%100+10); the fixture writer is the
    // JDK itself, so the hash compare is a reference differential
    "mm_zip_entries" ->
      ("SELECT doc_id, CAST(t.i AS INTEGER) AS entry_idx, " +
       "'e' || CAST(t.i AS VARCHAR) || '.txt' AS name, " +
       "CAST(CASE WHEN t.i % 2 = 0 THEN 0 ELSE 8 END AS INTEGER) AS method, " +
       "CAST((doc_id + t.i) % 100 + 10 AS BIGINT) AS usize " +
       "FROM documents CROSS JOIN (VALUES (0), (1), (2), (3), (4), (5)) AS t(i) " +
       "WHERE doc_id % 149 <> 0 AND t.i < doc_id % 6 + 1 " +
       "ORDER BY doc_id, entry_idx"),
    // tar census twin: entry 0 a directory, 0..4 files; names cycle
    // plain / GNU-'L' long ((doc_id+i)%4=0, >100 chars — the census
    // must serve the 'L' payload, the header field is truncated) /
    // POSIX prefix-split ((doc_id+i)%7=0) / pax 'x' path
    // ((doc_id+i)%9=0 — UTF-8 name, fractional pax mtime floored,
    // pax size authoritative over a zero octal field); sizes and
    // mtimes are doc_id arithmetic (TarEncode.entryName/entrySize
    // contract); seed%3=0 archives carry an inert global 'g' header
    "mm_tar_entries" ->
      ("SELECT doc_id, CAST(t.i AS INTEGER) AS entry_idx, " +
       "CASE WHEN t.i = 0 THEN 'd' || CAST(doc_id % 10 AS VARCHAR) || '/' " +
       "WHEN (doc_id + t.i) % 4 = 0 THEN 'd' || CAST(doc_id % 10 AS VARCHAR) || " +
       "'/f' || CAST(t.i AS VARCHAR) || '_' || repeat('x', 110) || '.dat' " +
       "WHEN (doc_id + t.i) % 7 = 0 THEN 'p' || CAST(doc_id % 10 AS VARCHAR) || " +
       "'/f' || CAST(t.i AS VARCHAR) || '.dat' " +
       "WHEN (doc_id + t.i) % 9 = 0 THEN 'd' || CAST(doc_id % 10 AS VARCHAR) || " +
       "'/f' || CAST(t.i AS VARCHAR) || '_é.dat' " +
       "ELSE 'd' || CAST(doc_id % 10 AS VARCHAR) || '/f' || CAST(t.i AS VARCHAR) || '.dat' " +
       "END AS name, " +
       "CASE WHEN t.i = 0 THEN '5' ELSE '0' END AS typeflag, " +
       "CAST(CASE WHEN t.i = 0 THEN 0 ELSE (doc_id + 11 * t.i) % 200 + 5 END AS BIGINT) AS n_bytes, " +
       "CAST(CASE WHEN t.i = 0 THEN doc_id * 100 ELSE doc_id * 100 + t.i END AS BIGINT) AS mtime " +
       "FROM documents CROSS JOIN (VALUES (0), (1), (2), (3), (4)) AS t(i) " +
       "WHERE doc_id % 169 <> 0 AND t.i < doc_id % 5 + 1 " +
       "ORDER BY doc_id, entry_idx"),
    // ZIP extraction twin: the payload byte at position j is
    // (doc_id + 13i + 7j) % 251 (ZipEncode.payload), so length and the
    // two boundary bytes are closed-form doc_id arithmetic; content
    // BETWEEN the boundaries is certified by the expression's internal
    // CRC-32 gate (wrong bytes decline, they cannot hash-match)
    "mm_zip_extract" ->
      ("SELECT doc_id, CAST(t.i AS INTEGER) AS entry_idx, " +
       "CAST((doc_id + t.i) % 100 + 10 AS BIGINT) AS n_bytes, " +
       "CAST((doc_id + 13 * t.i) % 251 AS INTEGER) AS first_byte, " +
       "CAST((doc_id + 13 * t.i + 7 * ((doc_id + t.i) % 100 + 9)) % 251 AS INTEGER) AS last_byte " +
       "FROM documents CROSS JOIN (VALUES (0), (1), (2), (3), (4), (5)) AS t(i) " +
       "WHERE doc_id % 149 <> 0 AND t.i < doc_id % 6 + 1 " +
       "ORDER BY doc_id, entry_idx"),
    // docx ingest twin: one row per paragraph; the decoded text is
    // DocxEncode.decodedPara restated — three runs concatenated
    // (xml:space run keeps its padding, entities decode), the <w:pPr>
    // block invisible by the tag-delimiter rule, and the tab run on
    // every (doc_id+i)%3==0 paragraph
    "pipeline_docx_ingest" ->
      ("SELECT doc_id, CAST(t.i AS INTEGER) AS para_idx, " +
       "'Para ' || CAST(t.i AS VARCHAR) || ' of doc ' || CAST(doc_id AS VARCHAR) || " +
       "' has & <tags> x=' || CAST((doc_id + t.i) % 7 AS VARCHAR) || " +
       "CASE WHEN (doc_id + t.i) % 3 = 0 THEN chr(9) || 'end' ELSE '' END AS para " +
       "FROM documents CROSS JOIN (VALUES (0), (1), (2), (3)) AS t(i) " +
       "WHERE doc_id % 147 <> 0 AND t.i < doc_id % 4 + 1 " +
       "ORDER BY doc_id, para_idx"),
    // ODT extraction twin: OdtEncode.decodedPara restated — the
    // heading as paragraph 0, then items with inline spans invisible,
    // entities decoded, the <text:s text:c="2"/> double space, the
    // skipped annotation on (doc_id+i)%4==0 (absent BY DESIGN), and
    // the tab run on (doc_id+i)%3==0
    "text_odt_extract" ->
      ("SELECT doc_id, CAST(t.i AS INTEGER) AS para_idx, " +
       "CASE WHEN t.i = 0 THEN 'Doc ' || CAST(doc_id AS VARCHAR) || ' heading' " +
       "ELSE 'Item ' || CAST(t.i AS VARCHAR) || ' of doc ' || CAST(doc_id AS VARCHAR) || " +
       "': a & b  <x=' || CAST((doc_id + t.i) % 9 AS VARCHAR) || '>' || " +
       "CASE WHEN (doc_id + t.i) % 3 = 0 THEN chr(9) || 'end' ELSE '' END " +
       "END AS para " +
       "FROM documents CROSS JOIN (VALUES (0), (1), (2), (3)) AS t(i) " +
       "WHERE doc_id % 181 <> 0 AND t.i < doc_id % 4 + 1 " +
       "ORDER BY doc_id, para_idx"),
    // ODP deck twin: OdpEncode.decodedSlide restated — title + body
    // paragraphs joined by newline, the double-space escape, the tab
    // on (doc_id+k)%2==0 slides, and the speaker-notes block absent
    // BY DESIGN (skipped whole)
    "pipeline_odp_ingest" ->
      ("SELECT doc_id, CAST(t.k - 1 AS INTEGER) AS slide_no, " +
       "'Slide ' || CAST(t.k AS VARCHAR) || ' of show ' || CAST(doc_id AS VARCHAR) || " +
       "chr(10) || 'body & <pt>  j=' || CAST((doc_id + t.k) % 9 AS VARCHAR) || " +
       "CASE WHEN (doc_id + t.k) % 2 = 0 THEN chr(9) || 'note' ELSE '' END AS slide_text " +
       "FROM documents CROSS JOIN (VALUES (1), (2), (3)) AS t(k) " +
       "WHERE doc_id % 193 <> 0 AND t.k <= doc_id % 3 + 1 " +
       "ORDER BY doc_id, slide_no"),
    // ODS grid twin: OdsEncode.decodedRow restated — the float
    // column's office:value VERBATIM, the empty repeated gap shifting
    // B to col 4 on (doc_id+r)%3==0 rows, entities decoded from both
    // the string-value attribute (even rows) and the <text:p> body
    // (odd), and the repeated string cell expanded to both columns
    "pipeline_ods_ingest" ->
      ("SELECT doc_id, CAST(r AS INTEGER) AS row, CAST(c AS INTEGER) AS col, value FROM (" +
       "SELECT doc_id, t.r AS r, 1 AS c, " +
       "CAST((doc_id + 31 * t.r) % 1000 AS VARCHAR) || '.' || " +
       "CAST((doc_id + t.r) % 10 AS VARCHAR) AS value " +
       "FROM documents CROSS JOIN (VALUES (1), (2), (3), (4)) AS t(r) " +
       "WHERE doc_id % 191 <> 0 AND t.r <= doc_id % 4 + 1 " +
       "UNION ALL " +
       "SELECT doc_id, t.r, CASE WHEN (doc_id + t.r) % 3 = 0 THEN 4 ELSE 2 END, " +
       "'Row ' || CAST(t.r AS VARCHAR) || ' of doc ' || CAST(doc_id AS VARCHAR) || ' & <ods>' " +
       "FROM documents CROSS JOIN (VALUES (1), (2), (3), (4)) AS t(r) " +
       "WHERE doc_id % 191 <> 0 AND t.r <= doc_id % 4 + 1 " +
       "UNION ALL " +
       "SELECT doc_id, t.r, " +
       "(CASE WHEN (doc_id + t.r) % 3 = 0 THEN 4 ELSE 2 END) + k.k, " +
       "'rep ' || CAST(t.r AS VARCHAR) " +
       "FROM documents CROSS JOIN (VALUES (1), (2), (3), (4)) AS t(r) " +
       "CROSS JOIN (VALUES (1), (2)) AS k(k) " +
       "WHERE doc_id % 191 <> 0 AND t.r <= doc_id % 4 + 1 " +
       "AND (doc_id + t.r) % 4 = 0) " +
       "ORDER BY doc_id, row, col"),
    // RTF extraction twin: RtfEncode.decodedPara restated — the
    // fonttbl/colortbl/info/starred destinations invisible, paragraph
    // variants on (doc_id+i)%3 (named punctuation words / cp1252
    // \'hh escapes / \uN with its uc-protocol fallback SKIPPED), each
    // paragraph's \par a newline (incl. the trailing one)
    "text_rtf_extract" ->
      ("SELECT doc_id, string_agg(" +
       "'Para ' || CAST(t.i AS VARCHAR) || ' of doc ' || CAST(doc_id AS VARCHAR) || ': ' || " +
       "CASE CAST((doc_id + t.i) % 3 AS INTEGER) " +
       "WHEN 0 THEN '— “q” • fin' " +
       "WHEN 1 THEN 'café résumé' " +
       "ELSE '€ §' || chr(9) || 'end' END, " +
       "chr(10) ORDER BY t.i) || chr(10) AS text " +
       "FROM documents CROSS JOIN (VALUES (0), (1), (2), (3)) AS t(i) " +
       "WHERE doc_id % 179 <> 0 AND t.i < doc_id % 4 + 1 " +
       "GROUP BY doc_id ORDER BY doc_id"),
    // encrypted-PDF twin: one row per page, the shown text pure
    // doc_id arithmetic — hash-equality certifies the whole handler
    // matrix (RC4-40/128, AESV2, AESV3/R6) since a wrong key cannot
    // produce the plaintext
    "text_pdf_encrypted" ->
      ("SELECT doc_id, CAST(t.p AS INTEGER) AS page_no, " +
       "'Enc ' || CAST(doc_id AS VARCHAR) || ' page ' || CAST(t.p + 1 AS VARCHAR) || " +
       "' café ' || CAST((doc_id + t.p) % 7 AS VARCHAR) AS page_text " +
       "FROM documents CROSS JOIN (VALUES (0), (1), (2)) AS t(p) " +
       "WHERE doc_id % 155 <> 0 AND t.p < doc_id % 3 + 1 " +
       "ORDER BY doc_id, page_no"),
    // embedded-CMap composite twin: one row per page, the decoded
    // text doc_id arithmetic (ASCII through the 1-byte band, the
    // three specials through 2-byte bfchars — PdfCMapEncode contract)
    "text_pdf_cmap" ->
      ("SELECT doc_id, CAST(t.p AS INTEGER) AS page_no, " +
       "'Cmap ' || CAST(doc_id AS VARCHAR) || ' page ' || CAST(t.p + 1 AS VARCHAR) || " +
       "' é€𝄞 ' || CAST((doc_id + t.p) % 5 AS VARCHAR) AS page_text " +
       "FROM documents CROSS JOIN (VALUES (0), (1), (2)) AS t(p) " +
       "WHERE doc_id % 135 <> 0 AND t.p < doc_id % 3 + 1 " +
       "ORDER BY doc_id, page_no"),
    // Word 97 binary twin: paragraphs 0..n-1 each end with the \r
    // paragraph mark (→ chr(10)); the first ceil(n/2) live in the
    // cp1252 COMPRESSED piece, the rest in the UTF-16LE piece with an
    // astral pair (DocEncode.decodedPara contract) — the oracle
    // certifies the CFB walk, FIB, and piece table end to end
    "text_doc_extract" ->
      ("SELECT doc_id, string_agg(" +
       "'Para ' || CAST(t.i AS VARCHAR) || ' of doc ' || CAST(doc_id AS VARCHAR) || ': ' || " +
       "CASE WHEN t.i < (doc_id % 4 + 2) // 2 " +
       "THEN 'café §' || CAST((doc_id + t.i) % 9 AS VARCHAR) " +
       "ELSE '€ — 𝄞 ok' END, " +
       "chr(10) ORDER BY t.i) || chr(10) AS text " +
       "FROM documents CROSS JOIN (VALUES (0), (1), (2), (3)) AS t(i) " +
       "WHERE doc_id % 165 <> 0 AND t.i < doc_id % 4 + 1 " +
       "GROUP BY doc_id ORDER BY doc_id"),
    // PowerPoint 97 binary twin: slides joined with chr(10); even
    // slides a TextBytesAtom with an internal CR line break, odd a
    // TextCharsAtom with unicode (PptEncode.decodedSlide)
    "text_ppt_extract" ->
      ("SELECT doc_id, string_agg(" +
       "CASE WHEN t.i % 2 = 0 THEN " +
       "'Deck ' || CAST(doc_id AS VARCHAR) || ' slide ' || CAST(t.i AS VARCHAR) || " +
       "' café' || chr(10) || 'line ' || CAST((doc_id + t.i) % 8 AS VARCHAR) " +
       "ELSE 'Deck ' || CAST(doc_id AS VARCHAR) || ' slide ' || CAST(t.i AS VARCHAR) || " +
       "' € 𝄞 k=' || CAST((doc_id + t.i) % 8 AS VARCHAR) END, " +
       "chr(10) ORDER BY t.i) AS text " +
       "FROM documents CROSS JOIN (VALUES (1), (2), (3)) AS t(i) " +
       "WHERE doc_id % 125 <> 0 AND t.i <= doc_id % 3 + 1 " +
       "GROUP BY doc_id ORDER BY doc_id"),
    // Excel 97 binary twin: per row r — col 1 an RK (int on even r,
    // cents/100 on odd, restating Scala's shortest-double rendering),
    // col 2 the SST string (high-byte unicode tail on odd r), col 3 a
    // Number, cols 4-5 a MulRk run on r%3=0 (XlsEncode.decodedRow)
    "text_xls_extract" ->
      ("SELECT doc_id, CAST(t.r AS INTEGER) AS row, CAST(c.col AS INTEGER) AS col, " +
       "CASE c.col " +
       "WHEN 1 THEN (CASE WHEN t.r % 2 = 0 THEN CAST((doc_id + 11 * t.r) % 500 AS VARCHAR) " +
       "WHEN ((doc_id + 11 * t.r) % 500) % 100 = 0 THEN CAST(((doc_id + 11 * t.r) % 500) // 100 AS VARCHAR) " +
       "WHEN ((doc_id + 11 * t.r) % 500) % 10 = 0 THEN CAST(((doc_id + 11 * t.r) % 500) // 100 AS VARCHAR) || '.' || CAST((((doc_id + 11 * t.r) % 500) % 100) // 10 AS VARCHAR) " +
       "ELSE CAST(((doc_id + 11 * t.r) % 500) // 100 AS VARCHAR) || '.' || lpad(CAST(((doc_id + 11 * t.r) % 500) % 100 AS VARCHAR), 2, '0') END) " +
       "WHEN 2 THEN 'Row ' || CAST(t.r AS VARCHAR) || ' of wb ' || CAST(doc_id AS VARCHAR) || " +
       "(CASE WHEN t.r % 2 = 1 THEN ' é€' ELSE ' ok' END) " +
       "WHEN 3 THEN CAST((doc_id + 7 * t.r) % 1000 AS VARCHAR) " +
       "WHEN 4 THEN CAST((doc_id + t.r) % 90 AS VARCHAR) " +
       "WHEN 5 THEN CAST((doc_id + t.r) % 90 + 1 AS VARCHAR) " +
       // col 6: the Formula's cached result (a non-integral double /
       // the following String record); col 7: BoolErr booleans and
       // the cached error literal; col 8: the Label inline string
       "WHEN 6 THEN (CASE WHEN t.r % 2 = 0 " +
       "THEN CAST((doc_id + 13 * t.r) % 777 AS VARCHAR) || '.5' " +
       "ELSE 'Fml ' || CAST(t.r AS VARCHAR) || ' é' || CAST((doc_id + t.r) % 7 AS VARCHAR) END) " +
       "WHEN 7 THEN (CASE WHEN t.r % 2 = 0 THEN " +
       "(CASE WHEN t.r % 4 = 0 THEN 'TRUE' ELSE 'FALSE' END) " +
       "ELSE '#DIV/0!' END) " +
       "ELSE 'Lbl ' || CAST(t.r AS VARCHAR) || ' of wb ' || CAST(doc_id AS VARCHAR) " +
       "END AS value " +
       "FROM documents CROSS JOIN (VALUES (1), (2), (3), (4)) AS t(r) " +
       "CROSS JOIN (VALUES (1), (2), (3), (4), (5), (6), (7), (8)) AS c(col) " +
       "WHERE doc_id % 145 <> 0 AND t.r <= doc_id % 4 + 1 " +
       "AND (c.col <= 3 OR c.col IN (6, 7) " +
       "OR (c.col IN (4, 5) AND t.r % 3 = 0) " +
       "OR (c.col = 8 AND t.r % 3 = 1)) " +
       "ORDER BY doc_id, row, col"),
    // CFB directory census twin: every valid container carries exactly
    // Root Entry (type 5), WordDocument, 1Table (type 2) in directory
    // order — the layout-independent envelope row
    "mm_cfb_entries" ->
      ("SELECT doc_id, CAST(t.i AS INTEGER) AS entry_idx, " +
       "CASE t.i WHEN 0 THEN 'Root Entry' WHEN 1 THEN 'WordDocument' " +
       "ELSE '1Table' END AS name, " +
       "CAST(CASE WHEN t.i = 0 THEN 5 ELSE 2 END AS INTEGER) AS obj_type " +
       "FROM documents CROSS JOIN (VALUES (0), (1), (2)) AS t(i) " +
       "WHERE doc_id % 165 <> 0 ORDER BY doc_id, entry_idx"),
    // gzip triage twin: header variant cycles on doc_id%3, payload
    // length and mtime are doc_id arithmetic, a second member lands on
    // every 4th doc — the oracle restates the whole row, certifying
    // the optional-field walk, FHCRC, the JDK-inflated trailer
    // validation (crc_ok TRUE by construction), and the member counter
    "mm_gzip_meta" ->
      ("SELECT doc_id, " +
       "CASE WHEN doc_id % 139 = 0 OR doc_id % 3 = 0 THEN NULL " +
       "ELSE 'doc' || CAST(doc_id % 1000 AS VARCHAR) || '.txt' END AS fname, " +
       "CASE WHEN doc_id % 139 = 0 THEN NULL ELSE CAST(doc_id % 100000 AS BIGINT) END AS mtime, " +
       "CASE WHEN doc_id % 139 = 0 THEN NULL ELSE CAST(3 AS INTEGER) END AS os, " +
       "CASE WHEN doc_id % 139 = 0 THEN NULL ELSE doc_id % 3 = 1 END AS text_flag, " +
       "CASE WHEN doc_id % 139 = 0 THEN NULL ELSE CAST(doc_id % 120 + 30 AS BIGINT) END AS isize, " +
       "CASE WHEN doc_id % 139 = 0 THEN NULL ELSE CAST(doc_id % 120 + 30 AS BIGINT) END AS n_bytes, " +
       "CASE WHEN doc_id % 139 = 0 THEN NULL ELSE TRUE END AS crc_ok, " +
       "CASE WHEN doc_id % 139 = 0 THEN NULL " +
       "WHEN doc_id % 4 = 0 THEN CAST(2 AS INTEGER) ELSE CAST(1 AS INTEGER) END AS n_members " +
       "FROM documents ORDER BY doc_id"),
    "mm_webp_meta" ->
      ("SELECT doc_id, " +
       "CASE WHEN doc_id % 109 = 0 THEN NULL " +
       "WHEN doc_id % 3 = 0 THEN 'lossy' WHEN doc_id % 3 = 1 THEN 'lossless' " +
       "ELSE 'extended' END AS variant, " +
       "CASE WHEN doc_id % 109 = 0 THEN NULL ELSE CAST(doc_id % 640 + 10 AS INTEGER) END AS width, " +
       "CASE WHEN doc_id % 109 = 0 THEN NULL ELSE CAST((doc_id * 3) % 480 + 10 AS INTEGER) END AS height, " +
       "CASE WHEN doc_id % 109 = 0 THEN NULL " +
       "WHEN doc_id % 3 = 0 THEN FALSE ELSE doc_id % 2 = 0 END AS has_alpha, " +
       "CASE WHEN doc_id % 109 = 0 THEN NULL " +
       "WHEN doc_id % 3 = 2 THEN doc_id % 7 = 0 ELSE FALSE END AS has_anim, " +
       "CASE WHEN doc_id % 109 = 0 THEN NULL " +
       "WHEN doc_id % 3 = 2 THEN doc_id % 5 = 0 ELSE FALSE END AS has_exif " +
       "FROM documents ORDER BY doc_id"),
    // AVIF triage twin: brand/dims/depth/channels all doc_id
    // arithmetic (AvifEncode scaladoc) — certifies the ISO-BMFF walk
    // through meta/iprp/ipco to ispe + pixi on every non-filler row
    "mm_avif_meta" ->
      ("SELECT doc_id, " +
       "CASE WHEN doc_id % 113 = 0 THEN NULL " +
       "WHEN doc_id % 7 = 0 THEN 'avis' ELSE 'avif' END AS brand, " +
       "CASE WHEN doc_id % 113 = 0 THEN NULL ELSE CAST(doc_id % 800 + 16 AS INTEGER) END AS width, " +
       "CASE WHEN doc_id % 113 = 0 THEN NULL ELSE CAST((doc_id * 5) % 600 + 16 AS INTEGER) END AS height, " +
       "CASE WHEN doc_id % 113 = 0 THEN NULL " +
       "ELSE CAST((CASE doc_id % 3 WHEN 0 THEN 8 WHEN 1 THEN 10 ELSE 12 END) AS INTEGER) END AS depth, " +
       "CASE WHEN doc_id % 113 = 0 THEN NULL " +
       "ELSE CAST(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 3 END AS INTEGER) END AS channels, " +
       "CASE WHEN doc_id % 113 = 0 THEN NULL ELSE doc_id % 7 = 0 END AS animated " +
       "FROM documents ORDER BY doc_id"),
    "mm_mp4_meta" ->
      ("SELECT doc_id, " +
       "CASE WHEN doc_id % 127 = 0 THEN NULL ELSE 'isom' END AS brand, " +
       "CASE WHEN doc_id % 127 = 0 THEN NULL ELSE CAST((doc_id % 4 + 1) * 600 AS INTEGER) END AS timescale, " +
       "CASE WHEN doc_id % 127 = 0 THEN NULL ELSE CAST(doc_id % 100000 + 1000 AS BIGINT) END AS duration, " +
       "CASE WHEN doc_id % 127 = 0 THEN NULL ELSE CAST(doc_id % 3 + doc_id % 2 + 1 AS INTEGER) END AS n_tracks, " +
       "CASE WHEN doc_id % 127 = 0 THEN NULL ELSE CAST(doc_id % 3 AS INTEGER) END AS video_tracks, " +
       "CASE WHEN doc_id % 127 = 0 THEN NULL ELSE CAST(doc_id % 2 + 1 AS INTEGER) END AS audio_tracks, " +
       "CASE WHEN doc_id % 127 = 0 OR doc_id % 3 = 0 THEN NULL ELSE CAST(doc_id % 600 + 16 AS INTEGER) END AS width, " +
       "CASE WHEN doc_id % 127 = 0 OR doc_id % 3 = 0 THEN NULL ELSE CAST((doc_id * 3) % 400 + 16 AS INTEGER) END AS height, " +
       "CASE WHEN doc_id % 127 = 0 THEN NULL ELSE CAST((doc_id % 5) % 3 AS INTEGER) END AS n_fragments, " +
       "CASE WHEN doc_id % 127 = 0 THEN NULL ELSE CAST((doc_id % 5) % 3 * (10 + doc_id % 50) * (doc_id % 3 + doc_id % 2 + 1) AS BIGINT) END AS n_samples, " +
       // codec identity (stsd first-entry fourcc): video cycles
       // avc1/hvc1/av01 on seed%3 (NULL when the file has no video
       // track, i.e. doc_id%3=0); audio is mp4a (>=1 audio track always)
       "CASE WHEN doc_id % 127 = 0 OR doc_id % 3 = 0 THEN NULL " +
       "ELSE (['avc1', 'hvc1', 'av01'])[CAST(doc_id % 3 AS INTEGER) + 1] END AS video_codec, " +
       "CASE WHEN doc_id % 127 = 0 THEN NULL ELSE 'mp4a' END AS audio_codec, " +
       // stsz sample count: (seed%97 + 1) per track, summed over tracks
       "CASE WHEN doc_id % 127 = 0 THEN NULL " +
       "ELSE CAST((doc_id % 97 + 1) * (doc_id % 3 + doc_id % 2 + 1) AS BIGINT) END AS n_samples_stbl " +
       "FROM documents ORDER BY doc_id"),
    // EXIF triage twin: every IFD field cycles on doc_id
    // (ExifMeta.encode scaladoc) — the oracle restates orientation,
    // the sub-IFD DateTimeOriginal (which shadows IFD0's DateTime),
    // the Make string, and the container split; both byte orders
    // alternate per doc so one wrong endian branch fails half the rows
    "mm_exif_meta" ->
      ("SELECT doc_id, " +
       "CASE WHEN doc_id % 167 = 0 THEN NULL WHEN doc_id % 3 = 0 THEN 'tiff' ELSE 'jpeg' END AS container, " +
       "CASE WHEN doc_id % 167 = 0 THEN NULL ELSE CAST(doc_id % 8 + 1 AS INTEGER) END AS orientation, " +
       "CASE WHEN doc_id % 167 = 0 THEN NULL ELSE printf('%04d:%02d:%02d %02d:%02d:%02d', " +
       "2000 + doc_id % 20, doc_id * 3 % 12 + 1, doc_id * 7 % 28 + 1, " +
       "doc_id * 5 % 24, doc_id * 11 % 60, doc_id * 13 % 60) END AS datetime_original, " +
       "CASE WHEN doc_id % 167 = 0 THEN NULL ELSE 'cam' || CAST(doc_id % 5 AS VARCHAR) END AS make, " +
       // GPS in signed centiseconds of arc: the rational triple
       // (deg/1, min/1, csec/100) replays exactly under the decoder's
       // truncating division, hemisphere sign from the Ref tag
       "CASE WHEN doc_id % 167 = 0 THEN NULL ELSE CAST(" +
       "(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE -1 END) * (doc_id * 11 % 32400000) AS INTEGER) END AS lat_csec, " +
       "CASE WHEN doc_id % 167 = 0 THEN NULL ELSE CAST(" +
       "(CASE WHEN doc_id % 3 = 0 THEN -1 ELSE 1 END) * (doc_id * 13 % 64800000) AS INTEGER) END AS lon_csec " +
       "FROM documents ORDER BY doc_id"),
    // AUDIO TAG twins: every tag value is seed-derived
    // (FlacMeta.tagTitle/tagArtist/tagAlbum = t/a/b + seed mod
    // 1000/100/50), so the oracles restate the full VORBIS_COMMENT /
    // ID3v2 structures field-exact
    "mm_flac_tags" ->
      ("SELECT doc_id, " +
       "CASE WHEN doc_id % 149 = 0 THEN NULL ELSE 'flac' END AS container, " +
       "CASE WHEN doc_id % 149 = 0 THEN NULL ELSE 't' || CAST(doc_id % 1000 AS VARCHAR) END AS title, " +
       "CASE WHEN doc_id % 149 = 0 THEN NULL ELSE 'a' || CAST(doc_id % 100 AS VARCHAR) END AS artist, " +
       "CASE WHEN doc_id % 149 = 0 THEN NULL ELSE 'b' || CAST(doc_id % 50 AS VARCHAR) END AS album, " +
       "CASE WHEN doc_id % 149 = 0 THEN NULL ELSE 'graft' END AS vendor " +
       "FROM documents ORDER BY doc_id"),
    // MP3 side: docs without an ID3 tag (every 4th) have no tag
    // structure at all — NULL row, same as the corrupt docs
    "mm_mp3_tags" ->
      ("SELECT doc_id, " +
       "CASE WHEN doc_id % 163 = 0 OR doc_id % 4 = 0 THEN NULL ELSE 'mp3' END AS container, " +
       "CASE WHEN doc_id % 163 = 0 OR doc_id % 4 = 0 THEN NULL ELSE 't' || CAST(doc_id % 1000 AS VARCHAR) END AS title, " +
       "CASE WHEN doc_id % 163 = 0 OR doc_id % 4 = 0 THEN NULL ELSE 'a' || CAST(doc_id % 100 AS VARCHAR) END AS artist, " +
       "CASE WHEN doc_id % 163 = 0 OR doc_id % 4 = 0 THEN NULL ELSE 'b' || CAST(doc_id % 50 AS VARCHAR) END AS album, " +
       "CAST(NULL AS VARCHAR) AS vendor " +
       "FROM documents ORDER BY doc_id"),
    // FLAC triage twin: the encoder packs STREAMINFO fields straight
    // from doc_id arithmetic (FlacMeta.encode scaladoc), so the oracle
    // restates the 20-bit rate / 3-bit channels / 5-bit depth / 36-bit
    // count layout and the (id+7i) mod 256 MD5 bytes hex-exact —
    // certifying the packed-field bit boundaries and the block-chain
    // walk (the chain always carries VORBIS_COMMENT + PADDING → 3)
    "mm_flac_meta" ->
      ("SELECT doc_id, " +
       "CASE WHEN doc_id % 149 = 0 THEN NULL ELSE CAST(doc_id % 48000 + 8000 AS INTEGER) END AS sample_rate, " +
       "CASE WHEN doc_id % 149 = 0 THEN NULL ELSE CAST(doc_id % 8 + 1 AS INTEGER) END AS channels, " +
       "CASE WHEN doc_id % 149 = 0 THEN NULL ELSE CAST(doc_id % 29 + 4 AS INTEGER) END AS bits, " +
       "CASE WHEN doc_id % 149 = 0 THEN NULL ELSE CAST(doc_id * 441 % 100000000 AS BIGINT) END AS total_samples, " +
       "CASE WHEN doc_id % 149 = 0 THEN NULL ELSE CAST((doc_id * 441 % 100000000) * 1000 // (doc_id % 48000 + 8000) AS BIGINT) END AS duration_ms, " +
       "CASE WHEN doc_id % 149 = 0 THEN NULL ELSE CAST(3 AS INTEGER) END AS n_blocks, " +
       "CASE WHEN doc_id % 149 = 0 THEN NULL ELSE array_to_string(list_transform(range(0, 16), i -> printf('%02x', (doc_id + 7 * i) % 256)), '') END AS md5_hex " +
       "FROM documents ORDER BY doc_id"),
    // MP3 triage twin: every header field cycles on doc_id
    // (Mp3Meta.encode scaladoc) — version picks the (rate, bitrate,
    // samples-per-frame) tables, the first frame's bitrate index is
    // 1 + id%7, duration is frames·spf·1000/rate integer-divided; a
    // wrong table entry or frame-length coefficient desyncs the walk
    // and NULLs the whole row, so the hash certifies the chain
    "mm_mp3_meta" ->
      ("SELECT doc_id, " +
       "CASE WHEN doc_id % 163 = 0 THEN NULL ELSE (['1', '2', '2.5'])[CAST(doc_id % 3 AS INTEGER) + 1] END AS version, " +
       "CASE WHEN doc_id % 163 = 0 THEN NULL ELSE " +
       "([44100, 48000, 32000, 22050, 24000, 16000, 11025, 12000, 8000])" +
       "[CAST(doc_id % 3 AS INTEGER) * 3 + CAST((doc_id // 3) % 3 AS INTEGER) + 1] END AS sample_rate, " +
       "CASE WHEN doc_id % 163 = 0 THEN NULL WHEN doc_id % 2 = 0 THEN 1 ELSE 2 END AS channels, " +
       "CASE WHEN doc_id % 163 = 0 THEN NULL WHEN doc_id % 3 = 0 THEN " +
       "([32, 40, 48, 56, 64, 80, 96])[CAST(doc_id % 7 AS INTEGER) + 1] ELSE " +
       "([8, 16, 24, 32, 40, 48, 56])[CAST(doc_id % 7 AS INTEGER) + 1] END AS bitrate_kbps, " +
       "CASE WHEN doc_id % 163 = 0 THEN NULL ELSE CAST(doc_id % 50 + 3 AS INTEGER) END AS n_frames, " +
       "CASE WHEN doc_id % 163 = 0 THEN NULL ELSE CAST((doc_id % 50 + 3) * " +
       "(CASE WHEN doc_id % 3 = 0 THEN 1152 ELSE 576 END) * 1000 // " +
       "(([44100, 48000, 32000, 22050, 24000, 16000, 11025, 12000, 8000])" +
       "[CAST(doc_id % 3 AS INTEGER) * 3 + CAST((doc_id // 3) % 3 AS INTEGER) + 1]) AS BIGINT) END AS duration_ms, " +
       "CASE WHEN doc_id % 163 = 0 THEN NULL ELSE doc_id % 4 <> 0 END AS has_id3v2 " +
       "FROM documents ORDER BY doc_id"),
    // VIDEO frame-decode twin: frame f of doc d is a color JPEG seeded
    // d + 1000*f (AviEncode scaladoc), so the mm_jpeg_color block
    // enumeration runs per (doc, frame) with that seed — one wrong
    // frame boundary, chunk pad, or per-frame decode fails the hash
    "mm_video_frames" ->
      ("WITH d AS (SELECT doc_id, 9 + doc_id % 15 AS w, 9 + (doc_id * 3) % 13 AS h, " +
       "1 + doc_id % 3 AS nf, " +
       "CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 2 END AS hs, " +
       "CASE WHEN doc_id % 3 = 2 THEN 2 ELSE 1 END AS vs " +
       "FROM documents WHERE doc_id % 111 <> 0), " +
       "f AS (SELECT doc_id, w, h, hs, vs, unnest(range(nf)) AS fi FROM d), " +
       "blk AS (SELECT doc_id, fi, w, h, hs, vs, doc_id + 1000 * fi AS sd, " +
       "unnest(range(((w + 7) // 8) * ((h + 7) // 8))) AS bi, (w + 7) // 8 AS nbx " +
       "FROM f), " +
       "v AS (SELECT doc_id, fi, w, h, bi % nbx AS bx, bi // nbx AS by, " +
       "(sd + 5 * (bi % nbx) + 11 * (bi // nbx)) % 256 AS y, " +
       "(3 * sd + 7 * ((bi % nbx) // hs) + 13 * ((bi // nbx) // vs) + 64) % 256 AS cb, " +
       "(5 * sd + 3 * ((bi % nbx) // hs) + 17 * ((bi // nbx) // vs) + 128) % 256 AS cr " +
       "FROM blk), " +
       "s AS (SELECT doc_id, fi, w, h, " +
       "sum(least(greatest(floor(y + 1.402 * (cr - 128) + 0.5), 0), 255) * " +
       "  (least(8, w - 8 * bx) * least(8, h - 8 * by))) AS sr, " +
       "sum(least(greatest(floor(y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128) + 0.5), 0), 255) * " +
       "  (least(8, w - 8 * bx) * least(8, h - 8 * by))) AS sg, " +
       "sum(least(greatest(floor(y + 1.772 * (cb - 128) + 0.5), 0), 255) * " +
       "  (least(8, w - 8 * bx) * least(8, h - 8 * by))) AS sb " +
       "FROM v GROUP BY doc_id, fi, w, h) " +
       "SELECT doc_id, CAST(fi AS INTEGER) AS frame_idx, " +
       "CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height, " +
       "CAST(sr AS BIGINT) AS sum_r, CAST(sg AS BIGINT) AS sum_g, " +
       "CAST(sb AS BIGINT) AS sum_b, CAST(w * h AS BIGINT) AS n_pixels " +
       "FROM s ORDER BY doc_id, frame_idx"),
    // the sampler's keep decision is a pure function of doc_id (md5
    // uniform), so the oracle reproduces the EXACT sample — the whole
    // point of the deterministic form (sampleBy's RNG has no SQL twin)
    // two-pass heavy hitters: the sketch pass has no SQL twin, but the
    // MG no-false-negative bound + exact recount make the OUTPUT
    // exactly the frequency-threshold answer — the oracle states it
    // directly
    "text_heavy_hitters" ->
      (s"WITH u AS (SELECT unnest($duckToks) AS token FROM documents), " +
       "n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM u), " +
       "c AS (SELECT token, count(*) AS exact_count FROM u GROUP BY token) " +
       "SELECT token, exact_count FROM c CROSS JOIN n WHERE exact_count > n.n * 0.02 " +
       "ORDER BY exact_count DESC, token"),
    // Efraimidis–Spirakis priorities from the same md5 uniform; the
    // cut orders by the ROUNDED priority with doc_id tiebreak
    "pipeline_weighted_sample" ->
      (s"WITH s AS (SELECT doc_id, CAST(len($duckToks) AS BIGINT) AS n_tokens, " +
       "round(ln(greatest(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT / 4294967296.0, 1e-12)) / " +
       s"CAST(len($duckToks) AS DOUBLE), 6) AS priority FROM documents " +
       s"WHERE CAST(len($duckToks) AS BIGINT) > 0 AND len(trim(text)) > 0) " +
       "SELECT doc_id, n_tokens, priority FROM s ORDER BY priority DESC, doc_id LIMIT 64"),
    "text_sample_stratified" -> {
      val cases = graft.operators.TextAnalysis.DefaultSampleFractions
        .map { case (s, f) => s"WHEN source = '$s' THEN $f" }.mkString(" ")
      val dflt = graft.operators.TextAnalysis.DefaultSampleFraction
      "WITH s AS (SELECT doc_id, source, " +
      "('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT / 4294967296.0 AS u " +
      "FROM documents) " +
      "SELECT doc_id, source, round(u, 6) AS u FROM s " +
      s"WHERE u < (CASE $cases ELSE $dflt END) ORDER BY doc_id"
    },
    "text_clean" -> {
      // the pattern string passes through verbatim: DuckDB single-quoted
      // literals keep backslashes as-is (same convention as duckNorm)
      val scrub = "trim(regexp_replace(regexp_replace(lower(text), " +
        s"'${graft.operators.TextAnalysis.ScrubPattern}', ' ', 'g'), " +
        "'\\s+', ' ', 'g'))"
      val hits = graft.operators.TextAnalysis.CleanStopwords
        .map(w => s"(CASE WHEN list_contains(tk, '$w') THEN 1 ELSE 0 END)").mkString(" + ")
      val flag = graft.operators.TextAnalysis.CleanBadwords
        .map(w => s"list_contains(tk, '$w')").mkString(" OR ")
      s"WITH c AS (SELECT doc_id, $scrub AS s FROM documents), " +
      "t AS (SELECT doc_id, s, string_split(s, ' ') AS tk FROM c) " +
      s"SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_tokens, " +
      s"CAST($hits AS BIGINT) AS stop_hits, ($flag) AS flagged, " +
      "CAST(length(s) AS BIGINT) AS clean_len, md5(s) AS clean_fp " +
      s"FROM t WHERE len(tk) >= 40 AND ($hits) >= 2 ORDER BY doc_id"
    },
    "dedup_paragraphs" ->
      (s"WITH t AS (SELECT doc_id, $duckToks AS tk FROM documents), " +
       "c AS (SELECT doc_id, unnest(list_transform(range(1, 1 + CAST(ceil(len(tk) / 20.0) AS INTEGER)), " +
       "i -> md5(array_to_string(tk[(i-1)*20+1 : i*20], ' ')))) AS para_fp FROM t) " +
       "SELECT para_fp, count(DISTINCT doc_id) AS n_docs, count(*) AS n_occurrences, " +
       "min(doc_id) AS min_doc_id FROM c GROUP BY para_fp " +
       "HAVING count(DISTINCT doc_id) > 1 ORDER BY para_fp"),
    "dedup_substrings" ->
      (s"WITH t AS (SELECT doc_id, $duckToks AS tk FROM documents), " +
       "p AS (SELECT doc_id, tk, unnest(range(0, greatest(len(tk) - 19, 0))) AS pos FROM t), " +
       "g AS (SELECT doc_id, pos, md5(array_to_string(tk[pos+1 : pos+20], ' ')) AS fp FROM p), " +
       "m AS (SELECT doc_id, pos FROM g WHERE fp IN " +
       "(SELECT fp FROM g GROUP BY fp HAVING count(DISTINCT doc_id) > 1)), " +
       "r AS (SELECT doc_id, pos, pos - row_number() OVER " +
       "(PARTITION BY doc_id ORDER BY pos) AS island FROM m) " +
       "SELECT doc_id, CAST(min(pos) AS BIGINT) AS start_pos, " +
       "CAST(max(pos) + 19 AS BIGINT) AS end_pos, " +
       "CAST(max(pos) - min(pos) + 20 AS BIGINT) AS span_tokens " +
       "FROM r GROUP BY doc_id, island ORDER BY doc_id, start_pos"),
    "dedup_substring_scrub" ->
      (s"WITH t AS (SELECT doc_id, $duckToks AS tk FROM documents), " +
       "p AS (SELECT doc_id, tk, unnest(range(0, greatest(len(tk) - 19, 0))) AS pos FROM t), " +
       "g AS (SELECT doc_id, pos, md5(array_to_string(tk[pos+1 : pos+20], ' ')) AS fp FROM p), " +
       "m AS (SELECT doc_id, pos FROM g WHERE fp IN " +
       "(SELECT fp FROM g GROUP BY fp HAVING count(DISTINCT doc_id) > 1)), " +
       "cov AS (SELECT DISTINCT m.doc_id, m.pos + r.u AS ti FROM m, " +
       "(SELECT unnest(range(20)) AS u) r), " +
       "tok AS (SELECT doc_id, tk, unnest(range(len(tk))) AS ti FROM t), " +
       "kept AS (SELECT tok.doc_id, count(*) AS n_kept, " +
       "string_agg(tok.tk[tok.ti + 1], ' ' ORDER BY tok.ti) AS clean_text " +
       "FROM tok LEFT JOIN cov ON tok.doc_id = cov.doc_id AND tok.ti = cov.ti " +
       "WHERE cov.doc_id IS NULL GROUP BY tok.doc_id) " +
       "SELECT t.doc_id, CAST(len(t.tk) AS BIGINT) AS n_tokens, " +
       "CAST(len(t.tk) - coalesce(kept.n_kept, 0) AS BIGINT) AS n_removed, " +
       "coalesce(kept.clean_text, '') AS clean_text " +
       "FROM t LEFT JOIN kept ON t.doc_id = kept.doc_id ORDER BY t.doc_id"),
    "dedup_paragraph_flags" ->
      (s"WITH t AS (SELECT doc_id, $duckToks AS tk FROM documents), " +
       "c AS (SELECT doc_id, unnest(list_transform(range(1, 1 + CAST(ceil(len(tk) / 20.0) AS INTEGER)), " +
       "i -> md5(array_to_string(tk[(i-1)*20+1 : i*20], ' ')))) AS para_fp FROM t), " +
       "sh AS (SELECT para_fp FROM c GROUP BY para_fp HAVING count(DISTINCT doc_id) > 1) " +
       "SELECT doc_id, count(*) AS n_paras, " +
       "CAST(sum(CASE WHEN para_fp IN (SELECT para_fp FROM sh) THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_paras, " +
       "round(CAST(sum(CASE WHEN para_fp IN (SELECT para_fp FROM sh) THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 4) AS dup_ratio " +
       "FROM c GROUP BY doc_id ORDER BY doc_id"),
    // HTML fixture round-trip oracles: synthesis is deterministic from
    // the documents columns (Html.htmlOf), so DuckDB reconstructs the
    // EXPECTED extraction/normalization output directly — checking
    // extract∘synthesize = identity end to end.
    "text_html_extract" ->
      ("SELECT doc_id, 'Doc ' || CAST(doc_id AS VARCHAR) || ' - ' || source || " +
       "' Doc ' || CAST(doc_id AS VARCHAR) || ' ' || " +
       "regexp_replace(trim(text), '\\s+', ' ', 'g') || " +
       "' Entities: & <b> \"q\" AB &unknown; end more ' || " +
       "CAST(doc_id % 7 AS VARCHAR) || ' home' AS extracted " +
       "FROM documents ORDER BY doc_id"),
    "text_html_links" ->
      ("SELECT doc_id, url, domain FROM (" +
       "SELECT doc_id, 'https://' || source || '.example.com/docs/' || CAST(doc_id AS VARCHAR) || " +
       "'?ref=feed&src=' || source AS url, source || '.example.com' AS domain FROM documents " +
       "UNION ALL " +
       "SELECT doc_id, 'http://' || source || '.example.com/index.html' AS url, " +
       "source || '.example.com' AS domain FROM documents" +
       ") ORDER BY doc_id, url"),
    "pipeline_domain_blocklist" ->
      ("SELECT source || '.example.com' AS domain, CAST(count(*) AS BIGINT) AS n_docs " +
       "FROM documents WHERE source NOT IN ('src2', 'src7', 'src12', 'src17') " +
       "GROUP BY domain ORDER BY domain"),
    // only the per-source home links collide; /docs/{id} urls are unique
    "dedup_url_groups" ->
      ("SELECT 'http://' || source || '.example.com/index.html' AS url, " +
       "CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs, min(doc_id) AS min_doc " +
       "FROM documents GROUP BY source HAVING count(DISTINCT doc_id) > 1 ORDER BY url"),
    "pipeline_domain_cap" ->
      ("WITH d AS (SELECT doc_id, source || '.example.com' AS domain FROM documents), " +
       "r AS (SELECT doc_id, domain, CAST(row_number() OVER " +
       "(PARTITION BY domain ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS INTEGER) AS rank FROM d) " +
       "SELECT doc_id, domain, rank FROM r WHERE rank <= 10 ORDER BY domain, rank"),
    // sliding windows: chunk i covers tokens [(i-1)*16+1, (i-1)*16+32]
    // (inclusive DuckDB slice), one chunk per 16-token stride while new
    // tokens remain: n = 1 + ceil(max(len-32,0)/16)
    "text_chunks" ->
      // empty-string tokens filtered so empty docs emit ZERO chunks
      // (engine twin: filter(tokens(text), len > 0))
      (s"WITH t AS (SELECT doc_id, list_filter($duckToks, x -> len(x) > 0) AS tk FROM documents), " +
       "n AS (SELECT doc_id, tk, CASE WHEN len(tk) = 0 THEN 0 ELSE " +
       "1 + CAST(ceil(greatest(len(tk) - 32, 0) / 16.0) AS INTEGER) END AS nc FROM t), " +
       "c AS (SELECT doc_id, tk, unnest(range(1, nc + 1)) AS chunk_id FROM n) " +
       "SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id, " +
       "CAST(len(tk[(chunk_id-1)*16+1 : (chunk_id-1)*16+32]) AS BIGINT) AS n_tokens, " +
       "md5(array_to_string(tk[(chunk_id-1)*16+1 : (chunk_id-1)*16+32], ' ')) AS chunk_fp " +
       "FROM c ORDER BY doc_id, chunk_id"),
    // CDC MERGE: the oracle reconstructs the same deterministic change
    // batch (Changes.changeBatch) and applies MERGE semantics as set
    // algebra — row-level check of every survivor/update/insert.
    "q_merge_upsert" ->
      // touched keys = {k%10=3 (U)} ∪ {k%10=7 (D)} ∪ {k+10M : k%10=5 (I)};
      // the +10M insert keys don't exist in base, so base survivors are
      // exactly keys with k%10 NOT IN (3, 7)
      ("SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate FROM (" +
       "SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate " +
       "FROM orders WHERE o_orderkey % 10 NOT IN (3, 7) " +
       "UNION ALL SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus, " +
       "o_totalprice * 1.05, o_orderdate FROM orders WHERE o_orderkey % 10 = 3 " +
       "UNION ALL SELECT o_orderkey + 10000000, o_custkey, 'N', " +
       "o_totalprice * 0.5, o_orderdate FROM orders WHERE o_orderkey % 10 = 5" +
       ") ORDER BY o_orderkey"),
    // Through the graft DSv2 source: a commit-log twin of orders is
    // built once per corpus; the oracle only sees the source parquet —
    // any skipping bug (zone, bloom, row-group, DV) breaks the hash.
    "q_lake_pushdown_scan" ->
      ("SELECT o_orderstatus, count(*) AS cnt, " +
       "round(sum(o_totalprice), 2) AS total_price " +
       "FROM orders WHERE o_totalprice >= 150000.0 " +
       "GROUP BY o_orderstatus ORDER BY o_orderstatus"),
    // answered by the graft source ENTIRELY from commit-log zone maps
    // and row counts (GraftAggScan — zero file opens, plan-pinned);
    // the oracle actually reads every row, so the metadata answer must
    // be value-identical
    "q_lake_agg_pushdown" ->
      ("SELECT min(o_orderkey) AS min_key, max(o_orderkey) AS max_key, " +
       "min(o_totalprice) AS min_price, max(o_totalprice) AS max_price, " +
       "CAST(count(*) AS BIGINT) AS n_orders FROM orders"),
    // GROUPED metadata aggregate: the grouped commit-log twin is
    // written one commit per bucket, so every file's bucket zone is a
    // point and the source answers GROUP BY bucket from zone maps +
    // row counts alone (one row per bucket, zero file opens); the
    // oracle reads every raw row
    "q_lake_group_pushdown" ->
      ("SELECT o_orderkey % 4 AS bucket, CAST(count(*) AS BIGINT) AS n_orders, " +
       "min(o_orderkey) AS min_key, max(o_orderkey) AS max_key " +
       "FROM orders GROUP BY 1 ORDER BY bucket"),
    // STORAGE-PARTITIONED self-join: both sides of the key join read
    // the bucket-clustered table with clusterBy, so neither shuffles
    // (KeyGroupedPartitioning, plan-pinned); the oracle is the plain
    // self-join — co-location must be result-invisible. The key join
    // is 1:1, so the doubled price sums restate from one scan
    "q_lake_spj_join" ->
      ("SELECT o_orderkey % 4 AS bucket, CAST(count(*) AS BIGINT) AS n_orders, " +
       "round(sum(2 * o_totalprice), 2) AS total2 " +
       "FROM orders GROUP BY 1 ORDER BY bucket"),
    // RUNTIME-pruned join: the broadcast dim resolves to bucket {0}
    // (every o_orderkey % 8 = 0 key has % 4 = 0), the scan prunes
    // files with the runtime IN-set; the oracle is the static WHERE
    // equivalent — pruning must be result-invisible
    "q_lake_runtime_prune" ->
      ("SELECT o_orderkey % 4 AS bucket, CAST(count(*) AS BIGINT) AS n_orders, " +
       "round(sum(o_totalprice), 2) AS total " +
       "FROM orders WHERE o_orderkey % 4 = 0 GROUP BY 1 ORDER BY bucket"),
    "q_scd2_user_state" ->
      ("WITH e AS (SELECT user_id, event_id, event_type, epoch_ns(ts) // 1000 AS ts_us FROM events), " +
       "t AS (SELECT user_id, event_id, event_type, ts_us, " +
       "lag(event_type) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev_type FROM e), " +
       // null-safe distinctness, mirroring the engine: a transition
       // into a NULL event_type is a real state change
       "tr AS (SELECT user_id, event_id, event_type, ts_us FROM t " +
       "WHERE prev_type IS DISTINCT FROM event_type) " +
       "SELECT user_id, event_id, event_type AS state, ts_us AS valid_from_us, " +
       "lead(ts_us) OVER w AS valid_to_us, lead(ts_us) OVER w IS NULL AS is_current " +
       "FROM tr WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id) " +
       "ORDER BY user_id, valid_from_us, event_id"),
    // PII round-trip: the oracle re-synthesizes the identical contact
    // block from raw columns, then counts/redacts with the SAME
    // RE2-safe patterns (passed verbatim; DuckDB needs the 'g' flag,
    // Spark regexp_replace is global by default)
    "text_pii_redact" -> {
      val e = graft.operators.TextAnalysis.PiiEmailPattern
      val p = graft.operators.TextAnalysis.PiiPhonePattern
      val i = graft.operators.TextAnalysis.PiiIpPattern
      "WITH s AS (SELECT doc_id, text || CASE doc_id % 4 " +
      "WHEN 0 THEN ' reach user' || CAST(doc_id AS VARCHAR) || '@' || source || '.example.com' " +
      "WHEN 1 THEN ' call 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') " +
      "|| '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') " +
      "WHEN 2 THEN ' from host 10.' || CAST(doc_id % 200 AS VARCHAR) " +
      "|| '.' || CAST(doc_id % 250 AS VARCHAR) || '.' || CAST(doc_id % 100 AS VARCHAR) " +
      "ELSE '' END AS t FROM documents) " +
      s"SELECT doc_id, CAST(len(regexp_extract_all(t, '$e')) AS BIGINT) AS n_emails, " +
      s"CAST(len(regexp_extract_all(t, '$p')) AS BIGINT) AS n_phones, " +
      s"CAST(len(regexp_extract_all(t, '$i')) AS BIGINT) AS n_ips, " +
      s"md5(regexp_replace(regexp_replace(regexp_replace(t, '$e', '<EMAIL>', 'g'), " +
      s"'$i', '<IP>', 'g'), '$p', '<PHONE>', 'g')) AS redacted_fp " +
      "FROM s ORDER BY doc_id"
    },
    // quality expectations: one aggregate row pivoted to per-rule rows;
    // the lang allowlist rule fails by design (es/zh rows exist) so the
    // report witnesses both verdicts
    "pipeline_quality_report" ->
      ("WITH a AS (SELECT count(*) AS n, " +
       "sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS v_null, " +
       "sum(CASE WHEN n_chars <> length(text) THEN 1 ELSE 0 END) AS v_chars, " +
       "sum(CASE WHEN length(trim(text)) = 0 THEN 1 ELSE 0 END) AS v_empty, " +
       "sum(CASE WHEN lang NOT IN ('en', 'de', 'fr') THEN 1 ELSE 0 END) AS v_lang, " +
       "count(*) - count(DISTINCT doc_id) AS v_uniq FROM documents) " +
       "SELECT 'doc_id_not_null' AS rule, n AS n_checked, CAST(v_null AS BIGINT) AS n_violations, v_null = 0 AS pass FROM a " +
       "UNION ALL SELECT 'n_chars_consistent', n, CAST(v_chars AS BIGINT), v_chars = 0 FROM a " +
       "UNION ALL SELECT 'text_nonempty', n, CAST(v_empty AS BIGINT), v_empty = 0 FROM a " +
       "UNION ALL SELECT 'lang_allowlisted', n, CAST(v_lang AS BIGINT), v_lang = 0 FROM a " +
       "UNION ALL SELECT 'doc_id_unique', n, CAST(v_uniq AS BIGINT), v_uniq = 0 FROM a " +
       "ORDER BY rule"),
    // Inverted-index family: the oracle rebuilds the postings table
    // from scratch with the shared tokenizer (duckPostings) and runs
    // the same dictionary / AND-serve / BM25 math. BM25 constants are
    // the SAME literals the Spark expression uses (2.2 = k1+1, 0.25 =
    // 1-b) so both engines execute an identical double expression
    // tree; ordering is by the ROUNDED score so ranking cannot hinge
    // on sub-round float noise.
    "text_inverted_index" ->
      (s"WITH p AS ($duckPostings) " +
       "SELECT token, CAST(count(*) AS BIGINT) AS df, CAST(sum(tf) AS BIGINT) AS cf, " +
       "min(doc_id) AS min_doc FROM p GROUP BY token ORDER BY token"),
    "text_search_and" ->
      (s"WITH p AS ($duckPostings) " +
       s"SELECT doc_id, CAST(sum(tf) AS BIGINT) AS total_tf FROM p WHERE token IN $duckTermsIn " +
       s"GROUP BY doc_id HAVING count(DISTINCT token) = ${graft.operators.Search.QueryTerms.size} " +
       "ORDER BY doc_id"),
    "text_search_bm25" ->
      (s"WITH p AS ($duckPostings), " +
       "dl AS (SELECT doc_id, CAST(sum(tf) AS DOUBLE) AS dl FROM p GROUP BY doc_id), " +
       "st AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, sum(dl) / count(*) AS avgdl FROM dl), " +
       s"d AS (SELECT token, CAST(count(*) AS DOUBLE) AS df FROM p WHERE token IN $duckTermsIn GROUP BY token), " +
       "m AS (SELECT p.doc_id, CAST(p.tf AS DOUBLE) AS tf, dl.dl, d.df, st.n_docs, st.avgdl " +
       "FROM p JOIN dl USING (doc_id) JOIN d ON p.token = d.token CROSS JOIN st), " +
       "s AS (SELECT doc_id, ln((n_docs - df + 0.5) / (df + 0.5) + 1.0) * (tf * 2.2) / " +
       "(tf + 1.2 * (0.25 + 0.75 * dl / avgdl)) AS w FROM m) " +
       "SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms, round(sum(w), 4) AS score " +
       "FROM s GROUP BY doc_id ORDER BY score DESC, doc_id"),
    // BM25 from persisted index + norms segments: the oracle is the
    // SAME full-corpus SQL — (index segments) ∪ (norms segments) ≡
    // corpus is the property the hash certifies
    "text_search_bm25_indexed" ->
      (s"WITH p AS ($duckPostings), " +
       "dl AS (SELECT doc_id, CAST(sum(tf) AS DOUBLE) AS dl FROM p GROUP BY doc_id), " +
       "st AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, sum(dl) / count(*) AS avgdl FROM dl), " +
       s"d AS (SELECT token, CAST(count(*) AS DOUBLE) AS df FROM p WHERE token IN $duckTermsIn GROUP BY token), " +
       "m AS (SELECT p.doc_id, CAST(p.tf AS DOUBLE) AS tf, dl.dl, d.df, st.n_docs, st.avgdl " +
       "FROM p JOIN dl USING (doc_id) JOIN d ON p.token = d.token CROSS JOIN st), " +
       "s AS (SELECT doc_id, ln((n_docs - df + 0.5) / (df + 0.5) + 1.0) * (tf * 2.2) / " +
       "(tf + 1.2 * (0.25 + 0.75 * dl / avgdl)) AS w FROM m) " +
       "SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms, round(sum(w), 4) AS score " +
       "FROM s GROUP BY doc_id ORDER BY score DESC, doc_id"),
    // served from the PERSISTED two-segment commit-log index; the
    // oracle is the full-corpus SQL — base ∪ delta ≡ whole corpus is
    // exactly the property under test
    "text_search_indexed" ->
      (s"WITH p AS ($duckPostings) " +
       s"SELECT doc_id, CAST(sum(tf) AS BIGINT) AS total_tf FROM p WHERE token IN $duckTermsIn " +
       s"GROUP BY doc_id HAVING count(DISTINCT token) = ${graft.operators.Search.QueryTerms.size} " +
       "ORDER BY doc_id"),
    // phrase search: the oracle scans each token list for the aligned
    // 3-token window — the Spark side must produce the same counts
    // from positional-index equi-joins
    "text_search_phrase" -> {
      val Seq(w0, w1, w2) = graft.operators.Search.PhraseTerms
      s"WITH t AS (SELECT doc_id, $duckToks AS tk FROM documents), " +
      "h AS (SELECT doc_id, CAST(len(list_filter(range(1, len(tk) - 1), " +
      s"i -> tk[i] = '$w0' AND tk[i+1] = '$w1' AND tk[i+2] = '$w2')) AS BIGINT) AS n_hits FROM t) " +
      "SELECT doc_id, n_hits FROM h WHERE n_hits > 0 ORDER BY doc_id"
    },
    // PMI: identical operation order (counts cast to double, the
    // (c_ab/N2)/((c_a/N1)(c_b/N1)) nesting, natural log), ordering by
    // the rounded score
    "text_collocations_pmi" ->
      (s"WITH t AS (SELECT doc_id, $duckToks AS tk FROM documents), " +
       "u AS (SELECT unnest(tk) AS token FROM t), " +
       "c1 AS (SELECT token, CAST(count(*) AS DOUBLE) AS c FROM u GROUP BY token), " +
       "sc AS (SELECT CAST(count(*) AS DOUBLE) AS n1, " +
       "CAST(count(*) AS DOUBLE) - (SELECT CAST(count(*) AS DOUBLE) FROM t) AS n2 FROM u), " +
       "bg AS (SELECT unnest(list_transform(range(1, len(tk)), i -> {'a': tk[i], 'b': tk[i+1]})) AS b FROM t), " +
       "c2 AS (SELECT b.a AS w1, b.b AS w2, count(*) AS n_pair FROM bg GROUP BY 1, 2 HAVING count(*) >= 5) " +
       "SELECT w1, w2, n_pair, " +
       "round(ln((CAST(n_pair AS DOUBLE) / sc.n2) / ((ca.c / sc.n1) * (cb.c / sc.n1))), 4) + 0 AS pmi " +
       "FROM c2 JOIN c1 ca ON c2.w1 = ca.token JOIN c1 cb ON c2.w2 = cb.token CROSS JOIN sc " +
       "ORDER BY pmi DESC, w1, w2"),
    // PageRank unrolled to the same fixed 3 iterations over the same
    // symmetric customer<->supplier graph; constants ((1 - 0.85)
    // spelled as the subtraction so it is the same IEEE double Spark's
    // lit(1 - Damping) produces — the 0.15 literal is a DIFFERENT
    // double — 0.85, the
    // 2k/2k+1 node packing) mirror Graph.pagerankSuppliers literally.
    // Per-node in-rank sums are the only order-sensitive float step;
    // the final normalize-and-round(6) absorbs it, and the presented
    // ordering uses the rounded value.
    "q_pagerank_suppliers" ->
      ("WITH pairs AS (SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s " +
       "FROM orders JOIN lineitem ON o_orderkey = l_orderkey), " +
       "e AS (SELECT c AS src, s AS dst FROM pairs UNION ALL SELECT s AS src, c AS dst FROM pairs), " +
       "deg AS (SELECT src, CAST(count(*) AS DOUBLE) AS outdeg FROM e GROUP BY src), " +
       "nd AS (SELECT DISTINCT src AS node FROM e), " +
       "nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nd), " +
       "r0 AS (SELECT node, 1.0 / nn.n AS rank FROM nd CROSS JOIN nn), " +
       "a1 AS (SELECT e.dst AS node, sum(r0.rank / deg.outdeg) AS in_rank " +
       "FROM e JOIN r0 ON e.src = r0.node JOIN deg ON e.src = deg.src GROUP BY e.dst), " +
       "r1 AS (SELECT nd.node, (1 - 0.85) / nn.n + 0.85 * coalesce(a1.in_rank, 0.0) AS rank " +
       "FROM nd LEFT JOIN a1 USING (node) CROSS JOIN nn), " +
       "a2 AS (SELECT e.dst AS node, sum(r1.rank / deg.outdeg) AS in_rank " +
       "FROM e JOIN r1 ON e.src = r1.node JOIN deg ON e.src = deg.src GROUP BY e.dst), " +
       "r2 AS (SELECT nd.node, (1 - 0.85) / nn.n + 0.85 * coalesce(a2.in_rank, 0.0) AS rank " +
       "FROM nd LEFT JOIN a2 USING (node) CROSS JOIN nn), " +
       "a3 AS (SELECT e.dst AS node, sum(r2.rank / deg.outdeg) AS in_rank " +
       "FROM e JOIN r2 ON e.src = r2.node JOIN deg ON e.src = deg.src GROUP BY e.dst), " +
       "r3 AS (SELECT nd.node, (1 - 0.85) / nn.n + 0.85 * coalesce(a3.in_rank, 0.0) AS rank " +
       "FROM nd LEFT JOIN a3 USING (node) CROSS JOIN nn) " +
       "SELECT CAST((node - 1) // 2 AS BIGINT) AS supp_key, " +
       "round(rank * nn.n, 6) AS rank_norm FROM r3 CROSS JOIN nn WHERE node % 2 = 1 " +
       "ORDER BY rank_norm DESC, supp_key")
    // knn_ivf's oracle is generated post-run from the served quantizer
    // (see knnIvfOracle below).
  )

  val analytics: Map[String, Q] = Map(
    "q6_forecast_revenue" -> (Analytics.q6ForecastRevenue _),
    "q_stats_agg" -> (Analytics.statsAgg _),
    "q_percentiles" -> (Analytics.percentiles _),
    "q_word_counts" -> (Analytics.wordCounts _),
    "q_pivot_sales" -> (Analytics.pivotSales _),
    "q_asof_join" -> (Analytics.asofJoin _),
    "q_sessionize" -> (Analytics.sessionize _),
    "q_moving_avg" -> (Analytics.movingAvg _),
    "q_json_funcs" -> (Analytics.jsonFuncs _),
    "q_array_agg" -> (Analytics.arrayAgg _),
    "q_day_over_day" -> (Analytics.dayOverDay _),
    "q_funnel" -> (Analytics.funnelSignupPurchase _),
    "q_gap_fill" -> (Analytics.gapFillDaily _),
    "q_interpolate" -> (Analytics.interpolateDaily _),
    "q_rolling_corr" -> (Analytics.rollingCorr _),
    "q_seasonal_decompose" -> (Analytics.seasonalDecompose _),
    "q_full_outer_reconcile" -> (Analytics.fullOuterReconcile _),
    "q_approx_sketches" -> (Analytics.approxSketches _),
    "q_sketch_exact" -> (Analytics.sketchExact _)
  )

  val analyticsOracles: Map[String, String] = Map(
    "q6_forecast_revenue" ->
      ("SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue FROM lineitem " +
       "WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00' " +
       "AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24"),
    "q_cohort_retention" ->
      ("WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events), " +
       "f AS (SELECT user_id, min(day) AS cohort_day FROM ev GROUP BY user_id) " +
       "SELECT cohort_day, CAST(date_diff('day', cohort_day, day) AS BIGINT) AS day_offset, " +
       "count(DISTINCT user_id) AS n_users FROM ev JOIN f USING (user_id) " +
       "WHERE date_diff('day', cohort_day, day) BETWEEN 0 AND 7 " +
       "GROUP BY cohort_day, day_offset ORDER BY cohort_day, day_offset"),
    "q_profile_columns" -> {
      val numeric = Seq("l_orderkey", "l_quantity", "l_extendedprice", "l_discount")
      val categorical = Seq("l_returnflag", "l_linestatus")
      (numeric.map(c =>
        s"SELECT '$c' AS col_name, count(*) - count($c) AS n_nulls, " +
        s"count(DISTINCT $c) AS n_distinct, round(min(CAST($c AS DOUBLE)), 4) AS min_v, " +
        s"round(max(CAST($c AS DOUBLE)), 4) AS max_v FROM lineitem") ++
       categorical.map(c =>
        s"SELECT '$c', count(*) - count($c), count(DISTINCT $c), " +
        "CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE) FROM lineitem"))
        .mkString("SELECT * FROM (", " UNION ALL ", ") ORDER BY col_name")
    },
    "q_stats_agg" ->
      ("SELECT l_returnflag, round(stddev_samp(l_quantity), 4) AS sd_qty, " +
       "round(var_samp(l_quantity), 4) AS var_qty, " +
       "round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price, " +
       "round(covar_samp(l_quantity, l_extendedprice), 2) AS covar_qty_price " +
       "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"),
    "q_percentiles" ->
      ("SELECT o_orderpriority, round(quantile_cont(o_totalprice, 0.5), 2) AS p50, " +
       "round(quantile_cont(o_totalprice, 0.9), 2) AS p90, " +
       "round(quantile_cont(o_totalprice, 0.99), 2) AS p99 " +
       "FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"),
    "q_word_counts" ->
      (s"SELECT word, count(*) AS n FROM (SELECT unnest($duckToks) AS word FROM documents) " +
       "GROUP BY word ORDER BY n DESC, word"),
    "q_pivot_sales" ->
      ("SELECT l_returnflag, " +
       "round(sum(CASE WHEN l_linestatus = 'F' THEN l_extendedprice END), 2) AS \"F\", " +
       "round(sum(CASE WHEN l_linestatus = 'O' THEN l_extendedprice END), 2) AS \"O\" " +
       "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"),
    "q_asof_join" ->
      ("WITH e AS (SELECT event_id, user_id, event_type, value, epoch_ns(ts) // 1000 AS ts_us " +
       "FROM events WHERE event_type IN ('purchase', 'signup')), " +
       "p AS (SELECT * FROM e WHERE event_type = 'purchase'), " +
       "s AS (SELECT * FROM e WHERE event_type = 'signup') " +
       "SELECT p.event_id, p.user_id, s.event_id AS last_signup_id, round(s.value, 2) AS signup_value " +
       "FROM p ASOF LEFT JOIN s ON p.user_id = s.user_id AND p.ts_us >= s.ts_us " +
       "ORDER BY p.event_id"),
    "q_sessionize" ->
      ("WITH e AS (SELECT user_id, event_id, epoch_ns(ts) // 1000 AS ts_us FROM events), " +
       "f AS (SELECT user_id, event_id, ts_us, " +
       "CASE WHEN lag(ts_us) OVER w IS NULL OR ts_us - lag(ts_us) OVER w > 21600000000 THEN 1 ELSE 0 END AS new_sess " +
       "FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)), " +
       "s AS (SELECT user_id, ts_us, CAST(sum(new_sess) OVER " +
       "(PARTITION BY user_id ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id FROM f) " +
       "SELECT user_id, session_id, min(ts_us) AS session_start_us, max(ts_us) AS session_end_us, " +
       "count(*) AS n_events, (max(ts_us) - min(ts_us)) // 1000000 AS duration_secs " +
       "FROM s GROUP BY user_id, session_id ORDER BY user_id, session_id"),
    "q_moving_avg" ->
      ("WITH d AS (SELECT CAST(ts AS DATE) AS day, sum(value) AS day_value, " +
       "datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day_num FROM events GROUP BY 1, 3) " +
       "SELECT day, round(day_value, 2) AS day_value, " +
       "round(avg(day_value) OVER (ORDER BY day_num RANGE BETWEEN 6 PRECEDING AND CURRENT ROW), 2) AS ma7 " +
       "FROM d ORDER BY day"),
    "q_json_funcs" ->
      ("SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_path, " +
       "CAST(json_extract(props, '$.k') AS BIGINT) AS k_typed " +
       "FROM events ORDER BY event_id"),
    "q_gap_fill" ->
      ("WITH b AS (SELECT min(CAST(ts AS DATE)) AS lo, max(CAST(ts AS DATE)) AS hi FROM events), " +
       "spine AS (SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day FROM b), " +
       "p AS (SELECT CAST(ts AS DATE) AS day, round(sum(value), 2) AS day_value FROM events " +
       "WHERE event_type = 'purchase' AND user_id < 5 GROUP BY 1) " +
       "SELECT spine.day AS day, coalesce(day_value, 0.0) AS day_value, " +
       "day_value IS NOT NULL AS had_data " +
       "FROM spine LEFT JOIN p ON spine.day = p.day ORDER BY day"),
    // linear interpolation: IGNORE NULLS running frames find both
    // anchors; the line formula is written in the IDENTICAL operation
    // order as the Spark expression (DATE-DATE is integer days in
    // DuckDB, datediff in Spark)
    "q_interpolate" ->
      ("WITH b AS (SELECT min(CAST(ts AS DATE)) AS lo, max(CAST(ts AS DATE)) AS hi FROM events), " +
       "spine AS (SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day FROM b), " +
       "p AS (SELECT CAST(ts AS DATE) AS day, avg(value) AS day_value FROM events " +
       "WHERE event_type = 'click' AND user_id < 3 GROUP BY 1), " +
       "j AS (SELECT spine.day AS day, day_value FROM spine LEFT JOIN p ON spine.day = p.day), " +
       "w AS (SELECT day, day_value, " +
       "last_value(day_value IGNORE NULLS) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv, " +
       "last_value(CASE WHEN day_value IS NOT NULL THEN day END IGNORE NULLS) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd, " +
       "first_value(day_value IGNORE NULLS) OVER (ORDER BY day ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv, " +
       "first_value(CASE WHEN day_value IS NOT NULL THEN day END IGNORE NULLS) OVER (ORDER BY day ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd " +
       "FROM j) " +
       "SELECT day, round(CASE WHEN day_value IS NOT NULL THEN day_value " +
       "WHEN pv IS NULL THEN nv WHEN nv IS NULL THEN pv " +
       "ELSE pv + (nv - pv) * (day - pd) / (nd - pd) END, 4) AS value_interp, " +
       "day_value IS NOT NULL AS had_data FROM w ORDER BY day"),
    "q_full_outer_reconcile" ->
      ("WITH c AS (SELECT CAST(ts AS DATE) AS day, count(*) AS n_click, " +
       "round(sum(value), 2) AS sum_click FROM events " +
       "WHERE event_type = 'click' AND user_id < 2 GROUP BY 1), " +
       "v AS (SELECT CAST(ts AS DATE) AS day, count(*) AS n_view, " +
       "round(sum(value), 2) AS sum_view FROM events " +
       "WHERE event_type = 'view' AND user_id < 2 GROUP BY 1) " +
       "SELECT coalesce(c.day, v.day) AS day, n_click, sum_click, n_view, sum_view, " +
       "c.day IS NOT NULL AND v.day IS NOT NULL AS both_present " +
       "FROM c FULL JOIN v ON c.day = v.day ORDER BY day"),
    // STL-lite: dow = (day - anchor) % 7 because Spark and DuckDB
    // number dayofweek() differently; partial centered windows at the
    // edges have the same frame semantics in both engines
    "q_seasonal_decompose" ->
      ("WITH d AS (SELECT CAST(ts AS DATE) AS day, sum(value) AS day_value FROM events GROUP BY 1), " +
       "t AS (SELECT day, day_value, " +
       "avg(day_value) OVER (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS trend, " +
       "((day - DATE '2024-01-01') % 7 + 7) % 7 AS dow FROM d), " +
       "s AS (SELECT day, dow, day_value, trend, day_value - trend AS detrended, " +
       "avg(day_value - trend) OVER (PARTITION BY dow) AS seasonal FROM t) " +
       "SELECT day, CAST(dow AS INTEGER) AS dow, round(day_value, 2) AS day_value, " +
       "round(trend, 4) AS trend, round(seasonal, 4) AS seasonal, " +
       "round(detrended - seasonal, 4) AS residual FROM s ORDER BY day"),
    // Pearson is scale-invariant: sample/population n-1 conventions
    // cancel, round(4) seals residual float noise; <2-point windows
    // are NULL in both engines
    "q_rolling_corr" ->
      ("WITH d AS (SELECT CAST(ts AS DATE) AS day, " +
       "sum(CASE WHEN event_type = 'click' THEN value END) AS click_v, " +
       "sum(CASE WHEN event_type = 'view' THEN value END) AS view_v " +
       "FROM events WHERE event_type IN ('click', 'view') GROUP BY 1) " +
       // RANGE over the day number: a row frame would span more than 7
       // calendar days across gaps (engine mirrored)
       "SELECT day, round(click_v, 2) AS click_v, round(view_v, 2) AS view_v, " +
       "round(corr(click_v, view_v) OVER (ORDER BY (day - DATE '2024-01-01') " +
       "RANGE BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS corr_7d " +
       "FROM d ORDER BY day"),
    "q_funnel" ->
      ("WITH s AS (SELECT user_id, min(ts) AS s_ts FROM events WHERE event_type = 'signup' GROUP BY user_id), " +
       "p AS (SELECT e.user_id, min(e.ts) AS p_ts FROM events e JOIN s ON e.user_id = s.user_id " +
       "AND e.ts >= s.s_ts WHERE e.event_type = 'purchase' GROUP BY e.user_id) " +
       "SELECT s.user_id, s_ts, p_ts, coalesce(p_ts <= s_ts + INTERVAL 1 HOUR, false) AS converted_1h " +
       "FROM s LEFT JOIN p ON s.user_id = p.user_id ORDER BY s.user_id"),
    // delta only against the CALENDAR previous day (gap -> NULL),
    // mirroring the engine
    "q_day_over_day" ->
      ("WITH d AS (SELECT CAST(ts AS DATE) AS day, round(sum(value), 2) AS day_value " +
       "FROM events GROUP BY 1) " +
       "SELECT day, day_value, CASE WHEN day - lag(day) OVER (ORDER BY day) = 1 " +
       "THEN round(day_value - lag(day_value) OVER (ORDER BY day), 2) END AS delta " +
       "FROM d ORDER BY day"),
    "q_array_agg" ->
      ("SELECT user_id, array_to_string(list_sort(list_distinct(list(event_type))), ',') AS event_types, " +
       "CAST(len(list_distinct(list(event_type))) AS BIGINT) AS n_types, " +
       "count(*) AS n_events FROM events GROUP BY user_id ORDER BY user_id"),
    // q_approx_sketches itself stays no-oracle BY CONTRACT (sketch
    // values are engine-specific); its exact counterpart below shares
    // the grouping/aliasing/ordering so the sketch path's shape is
    // oracled end-to-end, and the <=5% differential test in
    // ExtensionsSpec bounds the sketch values against this exact frame.
    "q_sketch_exact" ->
      ("SELECT l_returnflag, count(DISTINCT l_orderkey) AS exact_orders, " +
       "round(quantile_cont(l_extendedprice, 0.5), 2) AS exact_p50, " +
       "round(quantile_cont(l_extendedprice, 0.99), 2) AS exact_p99 " +
       "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag")
  )

  // DuckDB twin of the served IVF path, generated from the EXACT
  // quantizer the query batch used (centroids are data-derived, so the
  // SQL exists only after knn_ivf has served — which is the order the
  // correctness harness runs in: all queries, then the oracle dump).
  // Cell assignment, top-2 probe cells, cosine, and the (rounded score
  // desc, id asc) top-5 all mirror Similarity.knnIvfIndexed.
  // Both centroid-parameterized oracles (knn_ivf, dedup_semantic) are
  // generated from the ONE served quantizer or not at all.
  // DuckDB twin of the PQ-ADC path, generated post-run from the EXACT
  // codebooks the query batch served (same contract as
  // centroidOracles): code assignment (first-max list_position), the
  // per-probe LUT, the FIXED-ORDER 8-lookup ADC sum, the rounded-score
  // shortlist cut, and the exact-cosine re-rank all mirror
  // Similarity.knnPqAdc literally.
  private def pqOracles: Map[String, String] = {
    import scala.jdk.CollectionConverters._
    val served = graft.operators.Similarity.servedCodebooks.asScala.toMap
    served.toSeq match {
      case Seq((_, cb)) => Map(knnPqOracleFor(cb))
      case Seq() =>
        Map("knn_pq_adc" ->
          "SELECT 'knn_pq_adc served no codebooks - query failed before training' AS error")
      case many =>
        System.err.println(
          s"[graft] pq oracle omitted: codebooks served for ${many.size} dirs " +
          s"(${many.map(_._1).mkString(", ")}) — cannot tell which the dump refers to")
        Map.empty
    }
  }

  private def knnPqOracleFor(cb: Seq[Seq[Array[Double]]]): (String, String) = {
    val m = graft.operators.Similarity.PqSubspaces
    val d = graft.operators.Similarity.PqDim
    val subScores = (0 until m).map { i =>
      val lo = i * d + 1; val hi = (i + 1) * d
      cb(i).map { c =>
        val l = c.mkString("[", ", ", "]::DOUBLE[]")
        val half = c.map(x => x * x).sum / 2.0
        s"list_dot_product(v[$lo:$hi], $l) - ($half)"
      }.mkString("[", ", ", "]") + s" AS s$i"
    }.mkString(", ")
    val codes = (0 until m)
      .map(i => s"CAST(list_position(s$i, list_max(s$i)) AS INTEGER)")
      .mkString("[", ", ", "]")
    val luts = (0 until m).map { i =>
      val lo = i * d + 1; val hi = (i + 1) * d
      cb(i).map { c =>
        val l = c.mkString("[", ", ", "]::DOUBLE[]")
        s"list_dot_product(q[$lo:$hi], $l)"
      }.mkString("[", ", ", "]") + s" AS l$i"
    }.mkString(", ")
    val adc = (0 until m).map(i => s"l$i[codes[${i + 1}]]").mkString(" + ")
    "knn_pq_adc" ->
      ("WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings), " +
       s"sc AS (SELECT vec_id, v, $subScores FROM e), " +
       s"c AS (SELECT vec_id, $codes AS codes FROM sc), " +
       "p AS (SELECT vec_id AS query_id, v AS q FROM e WHERE vec_id < 5), " +
       s"pl AS (SELECT query_id, $luts FROM p), " +
       "co AS (SELECT pl.query_id, c.vec_id AS neighbor_id, " +
       s"round($adc, 6) AS adc FROM c CROSS JOIN pl WHERE c.vec_id <> pl.query_id), " +
       "sl AS (SELECT query_id, neighbor_id FROM (SELECT query_id, neighbor_id, " +
       "row_number() OVER (PARTITION BY query_id ORDER BY adc DESC, neighbor_id) AS rn FROM co) " +
       "WHERE rn <= 20), " +
       "ex AS (SELECT sl.query_id, sl.neighbor_id, " +
       "round(list_dot_product(p.q, e.v) / (sqrt(list_dot_product(p.q, p.q)) * sqrt(list_dot_product(e.v, e.v))), 4) AS cos_sim " +
       "FROM sl JOIN e ON sl.neighbor_id = e.vec_id JOIN p ON sl.query_id = p.query_id), " +
       "r AS (SELECT query_id, neighbor_id, cos_sim, " +
       "CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS BIGINT) AS rank FROM ex) " +
       "SELECT query_id, neighbor_id, cos_sim, rank FROM r WHERE rank <= 5 ORDER BY query_id, rank")
  }

  // DuckDB twin of the composed IVF-PQ path: needs BOTH served
  // artifacts (index centroids + RESIDUAL codebooks) for the same
  // corpus. Probe cell ranking mirrors knnIvfOracleFor; codes/LUT/ADC
  // mirror knnPqOracleFor but over r = v − centroid(cell), with the
  // per-(probe, cell) base dot added back — the residual-IVFADC serve.
  private def ivfPqOracles: Map[String, String] = {
    import scala.jdk.CollectionConverters._
    val sc = graft.operators.Similarity.servedCentroids.asScala.toMap
    val sb = graft.operators.Similarity.servedIvfCodebooks.asScala.toMap
    (sc.toSeq, sb.toSeq) match {
      case (Seq((d1, cents)), Seq((d2, cb))) if d1 == d2 =>
        Map(knnIvfPqOracleFor(cents, cb))
      case (Seq(_), Seq(_)) =>
        System.err.println("[graft] ivf-pq oracle omitted: quantizer and codebooks " +
          "served for different corpora")
        Map.empty
      case (Seq(), _) | (_, Seq()) =>
        Map("knn_ivf_pq" ->
          "SELECT 'knn_ivf_pq served no quantizer or codebooks - query failed before serving' AS error")
      case _ =>
        System.err.println("[graft] ivf-pq oracle omitted: multiple corpora served")
        Map.empty
    }
  }

  private def knnIvfPqOracleFor(cents: Seq[Array[Double]],
      cb: Seq[Seq[Array[Double]]]): (String, String) = {
    val m = graft.operators.Similarity.PqSubspaces
    val d = graft.operators.Similarity.PqDim
    val dim = cents.head.length
    // the full centroid table as one DOUBLE[][] literal: indexed by the
    // 1-based cell id for the residual subtraction and the base dot
    val centsLit = cents.map(_.mkString("[", ", ", "]"))
      .mkString("[", ", ", "]::DOUBLE[][]")
    val cellScores = cents.map { c =>
      val lit = c.mkString("[", ", ", "]::DOUBLE[]")
      val half = c.map(x => x * x).sum / 2.0
      s"list_dot_product(v, $lit) - ($half)"
    }.mkString("[", ", ", "]")
    // residual sub-scores: the codebooks quantize rv = v − cents[cell]
    val subScores = (0 until m).map { i =>
      val lo = i * d + 1; val hi = (i + 1) * d
      cb(i).map { c =>
        val l = c.mkString("[", ", ", "]::DOUBLE[]")
        val half = c.map(x => x * x).sum / 2.0
        s"list_dot_product(rv[$lo:$hi], $l) - ($half)"
      }.mkString("[", ", ", "]") + s" AS s$i"
    }.mkString(", ")
    val codes = (0 until m)
      .map(i => s"CAST(list_position(s$i, list_max(s$i)) AS INTEGER)")
      .mkString("[", ", ", "]")
    val luts = (0 until m).map { i =>
      val lo = i * d + 1; val hi = (i + 1) * d
      cb(i).map { c =>
        val l = c.mkString("[", ", ", "]::DOUBLE[]")
        s"list_dot_product(q[$lo:$hi], $l)"
      }.mkString("[", ", ", "]") + s" AS l$i"
    }.mkString(", ")
    // ADC reconstructs dot(q, x) ≈ dot(q, centroid) + Σ lut lookups
    val adc = "qc + " + (0 until m).map(i => s"l$i[codes[${i + 1}]]").mkString(" + ")
    "knn_ivf_pq" ->
      ("WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings), " +
       s"csc AS (SELECT vec_id, v, $cellScores AS scores FROM e), " +
       "a AS (SELECT vec_id, v, scores, CAST(list_position(scores, list_max(scores)) AS INTEGER) AS cell FROM csc), " +
       "p0 AS (SELECT vec_id AS query_id, v AS q, scores FROM a WHERE vec_id < 5), " +
       "px AS (SELECT query_id, q, unnest(list_slice(list_reverse_sort(" +
       s"list_transform(range(1, ${cents.length + 1}), i -> {'s': scores[i], 'i': i})), 1, " +
       s"${graft.operators.Similarity.NumProbeCells})) AS cr FROM p0), " +
       "probes AS (SELECT query_id, q, CAST(cr.i AS INTEGER) AS cell FROM px), " +
       "rs AS (SELECT vec_id, cell, " +
       s"list_transform(range(1, ${dim + 1}), i -> v[i] - ($centsLit)[cell][i]) AS rv FROM a), " +
       s"sc AS (SELECT vec_id, cell, $subScores FROM rs), " +
       s"c AS (SELECT vec_id, cell, $codes AS codes FROM sc), " +
       s"pl AS (SELECT query_id, cell, list_dot_product(q, ($centsLit)[cell]) AS qc, $luts FROM probes), " +
       "co AS (SELECT pl.query_id, c.vec_id AS neighbor_id, " +
       s"round($adc, 6) AS adc FROM c JOIN pl ON c.cell = pl.cell AND c.vec_id <> pl.query_id), " +
       "sl AS (SELECT query_id, neighbor_id FROM (SELECT query_id, neighbor_id, " +
       "row_number() OVER (PARTITION BY query_id ORDER BY adc DESC, neighbor_id) AS rn FROM co) " +
       "WHERE rn <= 20), " +
       "ex AS (SELECT sl.query_id, sl.neighbor_id, " +
       "round(list_dot_product(p0.q, e.v) / (sqrt(list_dot_product(p0.q, p0.q)) * sqrt(list_dot_product(e.v, e.v))), 4) AS cos_sim " +
       "FROM sl JOIN e ON sl.neighbor_id = e.vec_id JOIN p0 ON sl.query_id = p0.query_id), " +
       "r AS (SELECT query_id, neighbor_id, cos_sim, " +
       "CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS BIGINT) AS rank FROM ex) " +
       "SELECT query_id, neighbor_id, cos_sim, rank FROM r WHERE rank <= 5 ORDER BY query_id, rank")
  }

  private def centroidOracles: Map[String, String] = {
    import scala.jdk.CollectionConverters._
    val served = graft.operators.Similarity.servedCentroids.asScala.toMap
    served.toSeq match {
      case Seq((_, cents)) =>
        Map(knnIvfOracleFor(cents), dedupSemanticOracleFor(cents),
          diversitySampleOracleFor(cents))
      case Seq() =>
        // queries failed (or never ran): emit sentinels so the compare
        // FAILS VISIBLY instead of silently recording "no oracle" —
        // the spark result parquets are missing/bogus in this case too
        Seq("knn_ivf", "dedup_semantic", "sim_diversity_sample").map(n => n ->
          s"SELECT '$n served no quantizer - query failed before reading the index sidecar' AS error")
          .toMap
      case many =>
        // ambiguous: several corpora served in this JVM; an arbitrary
        // pick could poison a correct run with a wrong-quantizer twin
        System.err.println(
          s"[graft] centroid oracles omitted: centroids served for ${many.size} dirs " +
          s"(${many.map(_._1).mkString(", ")}) — cannot tell which the dump refers to")
        Map.empty
    }
  }

  // DuckDB twin of semanticDedup served from the same quantizer: cell
  // assignment mirrors the index writer, within-cell lower-id pairs,
  // per-vector evidence + lowest-id-survivor decision at 0.95.
  private def dedupSemanticOracleFor(cents: Seq[Array[Double]]): (String, String) = {
    val scores = cents.map { c =>
      val lit = c.mkString("[", ", ", "]::DOUBLE[]")
      val half = c.map(x => x * x).sum / 2.0
      s"list_dot_product(v, $lit) - ($half)"
    }.mkString("[", ", ", "]")
    "dedup_semantic" ->
      ("WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings), " +
       s"sc AS (SELECT vec_id, v, $scores AS scores FROM e), " +
       "a AS (SELECT vec_id, v, CAST(list_position(scores, list_max(scores)) AS INTEGER) AS cell FROM sc), " +
       "p AS (SELECT x.vec_id, y.vec_id AS nb_id, " +
       "round(list_dot_product(x.v, y.v) / (sqrt(list_dot_product(x.v, x.v)) * sqrt(list_dot_product(y.v, y.v))), 4) AS c " +
       "FROM a x JOIN a y ON x.cell = y.cell AND y.vec_id < x.vec_id), " +
       "g AS (SELECT vec_id, count(*) AS n_prior, max(c) AS max_prior_cos, " +
       "min(CASE WHEN c >= 0.95 THEN nb_id END) AS dup_of FROM p GROUP BY vec_id) " +
       "SELECT a.vec_id, a.cell, coalesce(g.n_prior, 0) AS n_prior, g.max_prior_cos, " +
       "(g.dup_of IS NOT NULL) AS is_dup, g.dup_of " +
       "FROM a LEFT JOIN g USING (vec_id) ORDER BY a.vec_id")
  }

  // DuckDB twin of diversitySample from the same served quantizer:
  // argmax cell assignment, the exact md5-uniform priority, per-cell
  // row_number quota — mirrors Similarity.diversitySample literally.
  private def diversitySampleOracleFor(cents: Seq[Array[Double]]): (String, String) = {
    val scores = cents.map { c =>
      val lit = c.mkString("[", ", ", "]::DOUBLE[]")
      val half = c.map(x => x * x).sum / 2.0
      s"list_dot_product(v, $lit) - ($half)"
    }.mkString("[", ", ", "]")
    "sim_diversity_sample" ->
      ("WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings), " +
       s"sc AS (SELECT vec_id, $scores AS scores FROM e), " +
       "a AS (SELECT vec_id, CAST(list_position(scores, list_max(scores)) AS INTEGER) AS cell FROM sc), " +
       "s AS (SELECT cell, vec_id, " +
       "('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8))::BIGINT / 4294967296.0 AS u FROM a), " +
       "r AS (SELECT cell, vec_id, u, " +
       "CAST(row_number() OVER (PARTITION BY cell ORDER BY u, vec_id) AS INTEGER) AS pick FROM s) " +
       "SELECT cell, vec_id, pick, round(u, 6) AS u FROM r WHERE pick <= 8 " +
       "ORDER BY cell, pick")
  }

  private def knnIvfOracleFor(cents: Seq[Array[Double]]): (String, String) = {
      val scores = cents.map { c =>
        val lit = c.mkString("[", ", ", "]::DOUBLE[]")
        val half = c.map(x => x * x).sum / 2.0
        s"list_dot_product(v, $lit) - ($half)"
      }.mkString("[", ", ", "]")
      "knn_ivf" ->
        ("WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings), " +
         s"sc AS (SELECT vec_id, v, $scores AS scores FROM e), " +
         "a AS (SELECT vec_id, v, scores, CAST(list_position(scores, list_max(scores)) AS INTEGER) AS cell FROM sc), " +
         "p0 AS (SELECT vec_id AS query_id, v AS q, scores FROM a WHERE vec_id < 5), " +
         "px AS (SELECT query_id, q, unnest(list_slice(list_reverse_sort(" +
         s"list_transform(range(1, ${cents.length + 1}), i -> {'s': scores[i], 'i': i})), 1, " +
         s"${graft.operators.Similarity.NumProbeCells})) AS cr FROM p0), " +
         "probes AS (SELECT query_id, q, CAST(cr.i AS INTEGER) AS cell FROM px), " +
         "scored AS (SELECT query_id, a.vec_id AS neighbor_id, " +
         "round(list_dot_product(q, v) / (sqrt(list_dot_product(q, q)) * sqrt(list_dot_product(v, v))), 4) AS cos_sim " +
         "FROM a JOIN probes ON a.cell = probes.cell AND a.vec_id <> probes.query_id), " +
         "r AS (SELECT query_id, neighbor_id, cos_sim, " +
         "CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS BIGINT) AS rank FROM scored) " +
         "SELECT query_id, neighbor_id, cos_sim, rank FROM r WHERE rank <= 5 ORDER BY query_id, rank")
    }

  // Post-run BPE-merges oracle, generated from the SERVED merge list
  // (same contract as the ANN quantizer oracles): the SQL recomputes
  // EVERY round's argmax pair from scratch and replays the engine's
  // merges through list_reduce (the identical left fold) — a single
  // wrong merge, tie-break, or fold step makes some round's emitted
  // row differ and the hash fails.
  private def bpeOracles: Map[String, String] = {
    import scala.jdk.CollectionConverters._
    val served = graft.operators.TextAnalysis.servedBpeMerges.asScala.toMap
    served.toSeq match {
      case Seq((_, merges)) if merges.nonEmpty =>
        Map("text_bpe_merges" -> bpeMergesOracleFor(merges),
          "text_bpe_tokenize" -> bpeTokenizeOracleFor(merges))
      case Seq() | Seq((_, Seq())) =>
        Seq("text_bpe_merges", "text_bpe_tokenize").map(n => n ->
          s"SELECT '$n served no merges - query failed before training' AS error")
          .toMap
      case many =>
        System.err.println(
          s"[graft] bpe oracle omitted: merges served for ${many.size} dirs " +
          s"(${many.map(_._1).mkString(", ")}) — cannot tell which the dump refers to")
        Map.empty
    }
  }

  private def bpeMergesOracleFor(merges: Seq[(String, String, Long)]): String = {
    def esc(s: String) = s.replace("'", "''")
    val ctes = new StringBuilder
    val rows = new StringBuilder
    merges.zipWithIndex.foreach { case ((a, b, _), i) =>
      val r = i + 1
      ctes ++= s"p$r AS (${duckBpePairs(s"v${r - 1}")}), "
      ctes ++= s"t$r AS (SELECT a, b, cnt FROM p$r ORDER BY cnt DESC, a, b LIMIT 1), "
      // the vocab rewrite applies the ENGINE's r-th merge as literals:
      // if it is not t_r's own argmax, row r (and every later round)
      // diverges — the round-by-round certification
      val (ea, eb, em) = (esc(a), esc(b), esc(a + b))
      ctes ++= s"v$r AS (SELECT freq, CASE WHEN len(s) <= 1 THEN s ELSE " +
        s"list_reduce(list_transform(s, e -> [e]), (acc, x) -> " +
        s"CASE WHEN acc[-1] = '$ea' AND x[1] = '$eb' " +
        s"THEN acc[1:len(acc)-1] || ['$em'] ELSE acc || x END) END AS s " +
        s"FROM v${r - 1}), "
      if (r > 1) rows ++= " UNION ALL "
      rows ++= s"SELECT $r AS rank, a AS pair_a, b AS pair_b, a || b AS merged, " +
        s"CAST(cnt AS BIGINT) AS freq FROM t$r"
    }
    s"WITH $duckBpeVocab, ${ctes.toString.stripSuffix(", ")} " +
      s"SELECT rank, pair_a, pair_b, merged, freq FROM ($rows) ORDER BY rank"
  }

  // Tokenizer APPLICATION twin: every word runs the served merge chain
  // (one list_reduce per merge, the engine's fold literally) and the
  // per-doc char/token totals must agree — certifies that applying the
  // artifact downstream gives identical segmentations cross-engine.
  private def bpeTokenizeOracleFor(merges: Seq[(String, String, Long)]): String = {
    def esc(s: String) = s.replace("'", "''")
    val chain = merges.zipWithIndex.map { case ((a, b, _), i) =>
      val r = i + 1
      val (ea, eb, em) = (esc(a), esc(b), esc(a + b))
      s"s$r AS (SELECT doc_id, nc, CASE WHEN len(s) <= 1 THEN s ELSE " +
        s"list_reduce(list_transform(s, e -> [e]), (acc, x) -> " +
        s"CASE WHEN acc[-1] = '$ea' AND x[1] = '$eb' " +
        s"THEN acc[1:len(acc)-1] || ['$em'] ELSE acc || x END) END AS s " +
        s"FROM s${r - 1})"
    }.mkString(", ")
    s"WITH w AS (SELECT doc_id, unnest($duckToks) AS word FROM documents), " +
      "w2 AS (SELECT doc_id, word FROM w WHERE len(word) > 0), " +
      "s0 AS (SELECT doc_id, len(word) AS nc, string_split(word, '') AS s FROM w2), " +
      s"$chain " +
      s"SELECT doc_id, CAST(sum(nc) AS BIGINT) AS n_chars, " +
      s"CAST(sum(len(s)) AS BIGINT) AS n_bpe_tokens " +
      s"FROM s${merges.length} GROUP BY doc_id ORDER BY doc_id"
  }

  // Post-run PCA oracle (same served-artifact contract as pqOracles):
  // the DuckDB twin recomputes every projection from the SERVED
  // component literals via list_dot_product — a wrong component order,
  // sign, or summation diverges some row's rounded coordinate.
  private def pcaOracles: Map[String, String] = {
    import scala.jdk.CollectionConverters._
    val served = graft.operators.Similarity.servedPca.asScala.toMap
    served.toSeq match {
      case Seq((_, comps)) if comps.nonEmpty =>
        val cols = comps.zipWithIndex.map { case (c, j) =>
          val l = c.mkString("[", ", ", "]::DOUBLE[]")
          s"round(list_dot_product(CAST(embedding AS DOUBLE[]), $l), 6) AS pc$j"
        }.mkString(", ")
        Map("sim_pca_project" ->
          s"SELECT vec_id, $cols FROM embeddings ORDER BY vec_id")
      case Seq() =>
        Map("sim_pca_project" ->
          "SELECT 'sim_pca_project served no components - query failed before training' AS error")
      case many =>
        System.err.println(
          s"[graft] pca oracle omitted: components served for ${many.size} dirs " +
          s"(${many.map(_._1).mkString(", ")}) — cannot tell which the dump refers to")
        Map.empty
    }
  }

  // Post-run logistic-regression oracle (same served-artifact contract
  // as bpeOracles/pcaOracles): the DuckDB twin recomputes every
  // document's features and the linear margin with the SERVED weights
  // as literals in the identical left-to-right multiply-add fold — a
  // wrong feature definition, weight order, or fold shape diverges
  // some row's rounded margin (or flips a predicted bit) and the hash
  // fails. The sigmoid never appears: w-dot-x is bit-reproducible
  // across engines, libm exp is not.
  private def qualityLrOracles: Map[String, String] = {
    import scala.jdk.CollectionConverters._
    val served = graft.operators.TextAnalysis.servedQualityLr.asScala.toMap
    served.toSeq match {
      case Seq((_, w)) if w.length == 4 =>
        val hits = duckHits(graft.functions.TextFunctions.stopwords("en"))
        val z = s"(${w(0)}) + (${w(1)}) * x1 + (${w(2)}) * x2 + (${w(3)}) * x3"
        Map("text_quality_classifier" ->
          (s"WITH f AS (SELECT doc_id, " +
           s"least(1.0, CAST(len($duckToks) AS DOUBLE) / 100.0) AS x1, " +
           s"CAST(len($duckUniq) AS DOUBLE) / len($duckToks) AS x2, " +
           s"CAST($hits AS DOUBLE) / len($duckToks) AS x3, " +
           s"$duckQuality AS q FROM documents) " +
           s"SELECT doc_id, round($z, 6) AS margin, ($z) > 0 AS predicted, " +
           "q > 0.6 AS label FROM f ORDER BY doc_id"))
      case Seq() =>
        Map("text_quality_classifier" ->
          "SELECT 'text_quality_classifier served no weights - query failed before training' AS error")
      case many =>
        System.err.println(
          s"[graft] quality-lr oracle omitted: weights served for ${many.size} dirs " +
          s"(${many.map(_._1).mkString(", ")}) — cannot tell which the dump refers to")
        Map.empty
    }
  }

  def all: Map[String, Q] = timeSeries ++ relational ++ extensions ++ analytics
  def oracles: Map[String, String] =
    timeSeriesOracles ++ relationalOracles ++ extensionOracles ++ analyticsOracles ++
      centroidOracles ++ pqOracles ++ ivfPqOracles ++ bpeOracles ++ pcaOracles ++
      qualityLrOracles
}
