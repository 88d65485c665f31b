package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Catalog surface: every engine table registered as an EXTERNAL
  * parquet table in the session catalog, so users address data the way
  * they would on a production cluster — `spark.table("lineitem")`,
  * `spark.sql("SELECT ... FROM lineitem JOIN nation ...")` — instead of
  * raw paths. External tables carry no data copy: dropping one touches
  * only metadata, and the files stay where the lake put them.
  *
  * At 100 TB the catalog is what makes governance work (schema
  * evolution, statistics for the CBO via ANALYZE TABLE, bucketed table
  * specs for exchange-free joins — see operators/Bucketing). Locally it
  * is backed by the per-JVM Derby metastore; registration is
  * idempotent (drop-if-exists first, metadata-only for external
  * tables).
  */
object GraftCatalog {

  /** The engine's relational + extension tables (TESTDATA.md). `events`
    * is registered too; [[register]] sets the confs that make its `ts`
    * column read as session-TZ TimestampType on the current layout
    * (timestamp[us], isAdjustedToUTC=false) and as raw int64 nanos on
    * the legacy one (see graft.Tables.events for the branch). */
  val TableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  /** Register-once bookkeeping: metastore DDL (drop + create x 10
    * tables) is fixed-cost setup, not per-query work. The memo holds
    * the dir the session's tables CURRENTLY point at — table names are
    * session-global, so registering a different dir re-runs the DDL
    * (and switching back re-runs it again); only a same-dir repeat is
    * a no-op. */
  private val registeredDir = new graft.AppScopedCache[String]()

  /** Idempotently register every table over `dir` and return the names. */
  def register(spark: SparkSession, dir: String): Seq[String] = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    def ddl(): String = {
      TableNames.foreach { name =>
        spark.sql(s"DROP TABLE IF EXISTS $name")
        spark.catalog.createTable(name, "parquet",
          Map("path" -> s"$dir/$name.parquet"))
      }
      dir
    }
    // check-then-act is racy on the single contended memo key: another
    // thread's register(otherDir) can win the re-registration, so loop
    // until the memo agrees with OUR dir and fail loudly if it never
    // does. SCOPE of the guarantee: agreement at RETURN time — the
    // session's table names are a single global namespace, so a
    // concurrent register(otherDir) AFTER this returns can still
    // repoint them before this caller's queries run. Concurrent
    // multi-corpus use needs external coordination (or per-dir table
    // names); the engine's own drivers register one corpus per session.
    var attempts = 0
    var got = registeredDir.getOrCompute(spark, "dir")(ddl())
    while (got != dir && attempts < 5) {
      registeredDir.evict(spark, "dir")
      got = registeredDir.getOrCompute(spark, "dir")(ddl())
      attempts += 1
    }
    if (got != dir)
      throw new IllegalStateException(
        s"catalog registration raced: wanted $dir but the session registered $got")
    TableNames
  }

  /** Forget the register-once memo (e.g. after external DDL dropped
    * one of the tables behind the session's back), so the next
    * [[register]] call redoes the DDL. Session-global — there is ONE
    * memo, not one per dir (a dir parameter here would misleadingly
    * suggest dir-scoped resets). */
  def reset(spark: SparkSession): Unit =
    registeredDir.evict(spark, "dir")

  /** Table + column statistics for the cost-based optimizer: row
    * counts, sizes, per-column NDV/min/max/null counts. At 100 TB this
    * is what lets Catalyst order multi-way joins by selectivity and
    * pick broadcast sides from facts instead of thresholds; refreshed
    * after each ingest wave, it is metadata-sized work. */
  def analyze(spark: SparkSession, tables: Seq[String] = TableNames): Unit =
    tables.foreach { t =>
      spark.sql(s"ANALYZE TABLE $t COMPUTE STATISTICS FOR ALL COLUMNS")
    }

  /** A query surface proof: plain SQL over catalog tables only (no
    * paths anywhere) — customers per nation with total balances. */
  def customersPerNationSql(spark: SparkSession, dir: String): DataFrame = {
    register(spark, dir)
    spark.sql(
      """SELECT n_name, count(*) AS n_customers, round(sum(c_acctbal), 2) AS total_bal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin)
  }
}
