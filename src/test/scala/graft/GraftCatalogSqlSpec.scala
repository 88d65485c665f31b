package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.CommitLog

/** SQL over commit-log tables through the `graft` catalog plugin:
  * path addressing, SQL time travel, INSERT, CREATE/ALTER DDL mapped
  * onto the log's declared-schema contract. */
class GraftCatalogSqlSpec extends SparkSpec {

  private def tempTable(): String =
    java.nio.file.Files.createTempDirectory("graft_cat_").toString

  private def cleanup(p: String): Unit = {
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p))
    ()
  }

  private def ensureCatalog(): Unit =
    spark.conf.set("spark.sql.catalog.graft",
      "graft.sources.grafttable.GraftCatalogPlugin")

  test("SELECT over graft.`path` with pushdown-capable filters") {
    val t = tempTable()
    try {
      import spark.implicits._
      ensureCatalog()
      CommitLog.appendWithStats(spark, t,
        Seq.tabulate(40)(i => (i.toLong, s"r$i")).toDF("id", "s"),
        statsCols = Seq("id"))
      val got = spark.sql(s"SELECT id, s FROM graft.`$t` WHERE id >= 30 ORDER BY id")
      assert(got.count() === 10)
      assert(got.head.getLong(0) === 30L)
    } finally cleanup(t)
  }

  test("SQL time travel: VERSION AS OF and TIMESTAMP AS OF") {
    val t = tempTable()
    try {
      import spark.implicits._
      ensureCatalog()
      CommitLog.append(spark, t, Seq((1L, "a")).toDF("id", "s"))
      CommitLog.append(spark, t, Seq((2L, "b")).toDF("id", "s"))
      assert(spark.sql(s"SELECT * FROM graft.`$t` VERSION AS OF 0").count() === 1)
      assert(spark.sql(s"SELECT * FROM graft.`$t` VERSION AS OF 1").count() === 2)
      val ts0 = CommitLog.commitTimestampMillis(spark, t, 0L).get
      // literal in the session TZ (UTC here) — AS OF takes literals,
      // not arbitrary expressions
      val lit = java.time.Instant.ofEpochMilli(ts0)
        .atZone(java.time.ZoneId.of(spark.conf.get("spark.sql.session.timeZone")))
        .toLocalDateTime.format(java.time.format.DateTimeFormatter
          .ofPattern("yyyy-MM-dd HH:mm:ss.SSS"))
      assert(spark.sql(
        s"SELECT * FROM graft.`$t` TIMESTAMP AS OF '$lit'").count() === 1)
      intercept[IllegalArgumentException] {
        spark.sql(s"SELECT * FROM graft.`$t` VERSION AS OF 99").count()
      }
    } finally cleanup(t)
  }

  test("INSERT INTO appends one atomic commit; INSERT OVERWRITE replaces") {
    val t = tempTable()
    try {
      import spark.implicits._
      ensureCatalog()
      CommitLog.append(spark, t, Seq((1L, "a")).toDF("id", "s"))
      spark.sql(s"INSERT INTO graft.`$t` VALUES (2L, 'b'), (3L, 'c')")
      assert(CommitLog.read(spark, t).count() === 3)
      assert(CommitLog.latestVersion(spark, t) === 1L) // ONE commit for the insert
      // INSERT OVERWRITE routes via truncate in static overwrite mode
      // (the session default here is dynamic, for the archive job)
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
      try spark.sql(s"INSERT OVERWRITE graft.`$t` VALUES (9L, 'z')")
      finally spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      assert(CommitLog.read(spark, t).count() === 1)
      assert(CommitLog.read(spark, t, asOf = Some(1L)).count() === 3) // history intact
    } finally cleanup(t)
  }

  test("CREATE TABLE declares the schema; the write gate holds for SQL writes") {
    val t = tempTable() + "/newtbl"
    try {
      ensureCatalog()
      spark.sql(s"CREATE TABLE graft.`$t` (id BIGINT, score DOUBLE)")
      assert(CommitLog.tableSchema(spark, t).get ===
        StructType(Seq(StructField("id", LongType), StructField("score", DoubleType))))
      spark.sql(s"INSERT INTO graft.`$t` VALUES (1L, 0.5)")
      assert(CommitLog.read(spark, t).count() === 1)
      intercept[Exception] { // second CREATE refused
        spark.sql(s"CREATE TABLE graft.`$t` (x INT)")
      }
    } finally cleanup(t.stripSuffix("/newtbl"))
  }

  test("ALTER TABLE ADD COLUMNS widens via evolveSchema; old files null-fill") {
    val t = tempTable()
    try {
      import spark.implicits._
      ensureCatalog()
      spark.sql(s"CREATE TABLE graft.`$t` (id BIGINT, s STRING)")
      spark.sql(s"INSERT INTO graft.`$t` VALUES (1L, 'a')")
      spark.sql(s"ALTER TABLE graft.`$t` ADD COLUMNS (score DOUBLE)")
      spark.sql(s"INSERT INTO graft.`$t` VALUES (2L, 'b', 0.5)")
      val got = spark.sql(s"SELECT * FROM graft.`$t` ORDER BY id").collect()
      assert(got.length === 2)
      assert(got(0).isNullAt(2) && got(1).getDouble(2) === 0.5)
      // r14: RENAME COLUMN now succeeds via column mapping
      // (metadata-only — ColumnMappingSpec covers the full surface)
      spark.sql(s"ALTER TABLE graft.`$t` RENAME COLUMN s TO label")
      assert(spark.sql(s"SELECT * FROM graft.`$t`").columns.toSeq ===
        Seq("id", "label", "score"))
      // a retype is still refused — it would orphan existing files
      intercept[Exception] {
        spark.sql(s"ALTER TABLE graft.`$t` ALTER COLUMN id TYPE INT")
      }
    } finally cleanup(t)
  }

  test("DELETE FROM with a translatable WHERE is one metadata (DV) commit") {
    val t = tempTable()
    try {
      import spark.implicits._
      ensureCatalog()
      CommitLog.appendWithStats(spark, t,
        Seq.tabulate(40)(i => (i.toLong, s"r$i")).toDF("id", "s")
          .repartition(2), statsCols = Seq("id"))
      val v0 = CommitLog.latestVersion(spark, t)
      val files0 = CommitLog.snapshot(spark, t).toSet
      spark.sql(s"DELETE FROM graft.`$t` WHERE id >= 30")
      assert(CommitLog.read(spark, t).count() === 30)
      // metadata-only: same data files, one new commit, history intact
      assert(CommitLog.snapshot(spark, t).toSet === files0)
      assert(CommitLog.latestVersion(spark, t) === v0 + 1)
      assert(CommitLog.read(spark, t, asOf = Some(v0)).count() === 40)
      // string equality and AND translate too
      spark.sql(s"DELETE FROM graft.`$t` WHERE s = 'r5' AND id < 10")
      assert(CommitLog.read(spark, t).count() === 29)
      assert(CommitLog.read(spark, t).filter($"s" === "r5").count() === 0)
    } finally cleanup(t)
  }

  test("DELETE without WHERE and TRUNCATE TABLE are one remove-all commit") {
    val t = tempTable()
    try {
      ensureCatalog()
      spark.sql(s"CREATE TABLE graft.`$t` (id BIGINT, s STRING)")
      spark.sql(s"INSERT INTO graft.`$t` VALUES (1L, 'a'), (2L, 'b')")
      val v0 = CommitLog.latestVersion(spark, t)
      spark.sql(s"DELETE FROM graft.`$t`")
      assert(CommitLog.read(spark, t).count() === 0) // empty, declared shape
      assert(CommitLog.snapshot(spark, t).isEmpty)
      assert(CommitLog.read(spark, t, asOf = Some(v0)).count() === 2) // time travel
      spark.sql(s"INSERT INTO graft.`$t` VALUES (3L, 'c')")
      spark.sql(s"TRUNCATE TABLE graft.`$t`")
      assert(CommitLog.read(spark, t).count() === 0)
      assert(spark.sql(s"SELECT * FROM graft.`$t`").count() === 0)
    } finally cleanup(t)
  }

  test("untranslatable DELETE condition falls back to the COW rewrite") {
    val t = tempTable()
    try {
      import spark.implicits._
      ensureCatalog()
      CommitLog.append(spark, t,
        Seq.tabulate(10)(i => (i.toLong, s"r$i")).toDF("id", "s"))
      val files0 = CommitLog.snapshot(spark, t).toSet
      // id % 2 = 0 can't become a DV metadata delete — the row-level
      // operation rewrites the matched files instead (GraftDmlSpec
      // pins the COW semantics; here: the route exists and is exact)
      spark.sql(s"DELETE FROM graft.`$t` WHERE id % 2 = 0")
      val rows = CommitLog.read(spark, t).collect()
      assert(rows.length === 5 && rows.forall(_.getLong(0) % 2 == 1))
      assert(CommitLog.snapshot(spark, t).toSet != files0) // rewritten, not DV'd
    } finally cleanup(t)
  }

  test("DROP and RENAME are storage operations, refused by the catalog") {
    val t = tempTable()
    try {
      import spark.implicits._
      ensureCatalog()
      CommitLog.append(spark, t, Seq((1L, "a")).toDF("id", "s"))
      intercept[Exception] { spark.sql(s"DROP TABLE graft.`$t`") }
      assert(CommitLog.read(spark, t).count() === 1) // untouched
    } finally cleanup(t)
  }
}
