package graft

import org.apache.spark.sql.functions._
import graft.sources.GraftCatalog

/** Catalog registration: external tables, idempotency, SQL access. */
class CatalogSpec extends SparkSpec {

  test("register exposes every engine table via the catalog") {
    val names = GraftCatalog.register(spark, sf)
    val listed = spark.catalog.listTables().collect().map(_.name).toSet
    assert(names.toSet.subsetOf(listed))
    // catalog read == path read
    assert(spark.table("lineitem").count() ===
      Tables.lineitem(spark, sf).count())
    // external: table type recorded as EXTERNAL, data not copied
    assert(spark.catalog.listTables().collect()
      .find(_.name == "lineitem").get.tableType === "EXTERNAL")
  }

  test("registration is idempotent and re-points to the given dir") {
    GraftCatalog.register(spark, sf)
    GraftCatalog.register(spark, sf) // second call must not throw
    assert(spark.table("nation").count() === 25)
  }

  test("pure-SQL query over catalog tables joins and aggregates") {
    val rows = GraftCatalog.customersPerNationSql(spark, sf).collect()
    assert(rows.nonEmpty)
    val viaPaths = Tables.customer(spark, sf)
      .join(Tables.nation(spark, sf), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_customers"), round(sum(col("c_acctbal")), 2).as("total_bal"))
      .orderBy(col("n_name")).collect()
    assert(rows.map(_.toString).toSeq === viaPaths.map(_.toString).toSeq)
  }

  test("ANALYZE records table and column statistics for the CBO") {
    GraftCatalog.register(spark, sf)
    GraftCatalog.analyze(spark, Seq("nation", "customer"))
    val stats = spark.sql("DESCRIBE TABLE EXTENDED nation").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(stats.get("Statistics").exists(s => s.contains("rows")),
      s"no row-count statistic recorded: ${stats.get("Statistics")}")
    // column-level stats present (NDV etc.)
    val colStats = spark.sql("DESCRIBE EXTENDED nation n_nationkey").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(colStats.get("distinct_count").exists(_ != "NULL"),
      s"no NDV for n_nationkey: $colStats")
  }

  test("dropping an external table leaves the data files intact") {
    GraftCatalog.register(spark, sf)
    spark.sql("DROP TABLE region")
    assert(Tables.region(spark, sf).count() === 5) // files untouched
    GraftCatalog.register(spark, sf) // restore for other tests
  }
}
