package graft

import org.apache.spark.sql.functions._

import graft.operators.CommitLog

/** SQL row-level DML on commit-log tables: UPDATE and MERGE INTO via
  * the group-based copy-on-write operation (file granularity), plus
  * COW DELETE for conditions the metadata (deletion-vector) path can't
  * translate. The load-bearing claims:
  *
  *  - unmatched rows of a matched file flow through the rewrite
  *    (row-filtering the COW scan would silently drop them);
  *  - untouched files survive BY NAME — the blast radius is the file
  *    set, not the table;
  *  - one atomic commit per statement, history time-travelable;
  *  - DV-deleted rows cannot resurrect through a rewrite;
  *  - CHECK constraints refuse the whole statement before visibility. */
class GraftDmlSpec extends SparkSpec {

  private def tempTable(): String =
    java.nio.file.Files.createTempDirectory("graft_dml_").toString

  private def cleanup(p: String): Unit = {
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p))
    ()
  }

  private def ensureCatalog(): Unit =
    spark.conf.set("spark.sql.catalog.graft",
      "graft.sources.grafttable.GraftCatalogPlugin")

  /** Two single-file commits with disjoint id zones: file A ids 0..19,
    * file B ids 20..39, both statted on id. */
  private def twoFileTable(t: String): Unit = {
    import spark.implicits._
    spark.sql(s"CREATE TABLE graft.`$t` (id BIGINT, s STRING, v DOUBLE)")
    CommitLog.appendWithStats(spark, t,
      Seq.tabulate(20)(i => (i.toLong, s"r$i", i * 1.0)).toDF("id", "s", "v")
        .coalesce(1), statsCols = Seq("id"))
    CommitLog.appendWithStats(spark, t,
      Seq.tabulate(20)(i => ((i + 20).toLong, s"r${i + 20}", (i + 20) * 1.0))
        .toDF("id", "s", "v").coalesce(1), statsCols = Seq("id"))
  }

  test("UPDATE rewrites matched files only; unmatched rows survive") {
    val t = tempTable()
    try {
      ensureCatalog()
      twoFileTable(t)
      val before = CommitLog.snapshot(spark, t)
      assert(before.size === 2)
      val fileA = before.head // ids 0..19 (commit order)
      // touches only ids 30..39 — file B; file A's zone excludes it
      spark.sql(s"UPDATE graft.`$t` SET s = 'upd', v = v * 2 WHERE id >= 30")
      val after = CommitLog.snapshot(spark, t)
      assert(after.contains(fileA), "untouched file must survive BY NAME")
      assert(!after.contains(before(1)), "matched file must be replaced")
      val rows = CommitLog.read(spark, t).orderBy("id").collect()
      assert(rows.length === 40)
      // matched rows updated
      assert(rows.filter(_.getLong(0) >= 30).forall(r =>
        r.getString(1) == "upd" && r.getDouble(2) == r.getLong(0) * 2.0))
      // UNMATCHED rows of the matched file (ids 20..29) untouched
      assert(rows.filter(r => r.getLong(0) >= 20 && r.getLong(0) < 30)
        .forall(r => r.getString(1).startsWith("r") &&
          r.getDouble(2) == r.getLong(0) * 1.0))
      // one commit; pre-update state time-travels
      val v = CommitLog.latestVersion(spark, t)
      assert(CommitLog.read(spark, t, asOf = Some(v - 1))
        .filter(col("s") === "upd").count() === 0)
      // rewritten file carries fresh id zone stats (skipping survives DML)
      val stats = CommitLog.fileStats(spark, t)
      val newFile = after.filterNot(before.contains).head
      assert(stats.get(newFile).exists(_.contains("id")))
    } finally cleanup(t)
  }

  test("UPDATE with a non-pushable condition stays row-correct") {
    val t = tempTable()
    try {
      ensureCatalog()
      twoFileTable(t)
      // id % 10 = 5 is not zone-translatable; runtime group filtering
      // (or a full rewrite) must both land the same rows
      spark.sql(s"UPDATE graft.`$t` SET v = -1.0 WHERE id % 10 = 5")
      val rows = CommitLog.read(spark, t).orderBy("id").collect()
      assert(rows.length === 40)
      assert(rows.count(_.getDouble(2) == -1.0) === 4) // 5, 15, 25, 35
      assert(rows.filter(_.getLong(0) % 10 != 5)
        .forall(r => r.getDouble(2) == r.getLong(0) * 1.0))
    } finally cleanup(t)
  }

  test("runtime group filter narrows a zone-blind UPDATE to matched files") {
    val t = tempTable()
    try {
      ensureCatalog()
      twoFileTable(t)
      val before = CommitLog.snapshot(spark, t)
      val fileA = before.head
      // s = 'r35' lives only in file B, but the id zones can't see that
      // (string equality, no bloom): only the runtime group filter —
      // Spark's matched-_file subquery feeding GraftCowScan.filter —
      // can keep file A out of the rewrite
      spark.sql(s"UPDATE graft.`$t` SET v = 0.0 WHERE s = 'r35'")
      val after = CommitLog.snapshot(spark, t)
      assert(after.contains(fileA),
        "zone-blind update rewrote an unmatched file — runtime group " +
        "filtering is not engaging")
      assert(!after.contains(before(1)))
      val rows = CommitLog.read(spark, t).orderBy("id").collect()
      assert(rows.length === 40)
      assert(rows.find(_.getLong(0) == 35L).get.getDouble(2) === 0.0)
    } finally cleanup(t)
  }

  test("MERGE INTO upserts through one atomic rewrite") {
    val t = tempTable()
    try {
      import spark.implicits._
      ensureCatalog()
      twoFileTable(t)
      Seq((10L, "m10", 100.0), (35L, "m35", 350.0), (99L, "m99", 990.0))
        .toDF("id", "s", "v").createOrReplaceTempView("changes")
      val v0 = CommitLog.latestVersion(spark, t)
      spark.sql(
        s"""MERGE INTO graft.`$t` AS tgt USING changes AS src ON tgt.id = src.id
           |WHEN MATCHED THEN UPDATE SET s = src.s, v = src.v
           |WHEN NOT MATCHED THEN INSERT (id, s, v) VALUES (src.id, src.s, src.v)
           |""".stripMargin)
      val rows = CommitLog.read(spark, t).orderBy("id").collect()
      assert(rows.length === 41)
      assert(rows.find(_.getLong(0) == 10L).get.getString(1) === "m10")
      assert(rows.find(_.getLong(0) == 35L).get.getString(1) === "m35")
      assert(rows.find(_.getLong(0) == 99L).get.getDouble(2) === 990.0)
      // untouched-by-key rows intact
      assert(rows.find(_.getLong(0) == 11L).get.getString(1) === "r11")
      // pre-merge state still readable
      assert(CommitLog.read(spark, t, asOf = Some(v0)).count() === 40)
    } finally cleanup(t)
  }

  test("MERGE WHEN MATCHED DELETE removes rows; source-only insert lands") {
    val t = tempTable()
    try {
      import spark.implicits._
      ensureCatalog()
      twoFileTable(t)
      Seq((3L, "x", 0.0), (77L, "new77", 7.0))
        .toDF("id", "s", "v").createOrReplaceTempView("changes2")
      spark.sql(
        s"""MERGE INTO graft.`$t` AS tgt USING changes2 AS src ON tgt.id = src.id
           |WHEN MATCHED THEN DELETE
           |WHEN NOT MATCHED THEN INSERT *
           |""".stripMargin)
      val rows = CommitLog.read(spark, t).orderBy("id").collect()
      assert(rows.length === 40) // -1 deleted, +1 inserted
      assert(!rows.exists(_.getLong(0) == 3L))
      assert(rows.find(_.getLong(0) == 77L).get.getString(1) === "new77")
    } finally cleanup(t)
  }

  test("COW DELETE serves conditions the DV path cannot translate") {
    val t = tempTable()
    try {
      ensureCatalog()
      twoFileTable(t)
      spark.sql(s"DELETE FROM graft.`$t` WHERE id % 2 = 0")
      val rows = CommitLog.read(spark, t).orderBy("id").collect()
      assert(rows.length === 20)
      assert(rows.forall(_.getLong(0) % 2 == 1))
    } finally cleanup(t)
  }

  test("a DV-deleted row cannot resurrect through an UPDATE rewrite") {
    val t = tempTable()
    try {
      ensureCatalog()
      twoFileTable(t)
      CommitLog.delete(spark, t, "id = 25") // DV on file B
      assert(CommitLog.read(spark, t).count() === 39)
      spark.sql(s"UPDATE graft.`$t` SET s = 'upd' WHERE id >= 20")
      val rows = CommitLog.read(spark, t).collect()
      assert(rows.length === 39)
      assert(!rows.exists(_.getLong(0) == 25L), "DV-deleted row resurrected")
    } finally cleanup(t)
  }

  test("CHECK constraints refuse the whole UPDATE before visibility") {
    val t = tempTable()
    try {
      ensureCatalog()
      twoFileTable(t)
      CommitLog.addConstraint(spark, t, "v_nonneg", "v >= 0")
      val v0 = CommitLog.latestVersion(spark, t)
      intercept[Exception] {
        spark.sql(s"UPDATE graft.`$t` SET v = -5.0 WHERE id < 3")
      }
      assert(CommitLog.latestVersion(spark, t) === v0)
      assert(CommitLog.read(spark, t).filter(col("v") < 0).count() === 0)
    } finally cleanup(t)
  }

  test("SELECT can project the _file metadata column") {
    val t = tempTable()
    try {
      ensureCatalog()
      twoFileTable(t)
      val files = spark.sql(s"SELECT DISTINCT _file FROM graft.`$t`").collect()
        .map(_.getString(0)).toSet
      assert(files.size === 2)
      assert(files.forall(_.startsWith(t)))
    } finally cleanup(t)
  }

  test("DELETE with a NULL literal in the predicate falls back, never NPEs") {
    val t = tempTable()
    try {
      ensureCatalog()
      twoFileTable(t)
      // c IN ('r1', NULL): SQL three-valued logic — r1 deleted, every
      // other row's predicate is NULL (not TRUE) so it survives; the
      // pushed-translation path must refuse the NULL literal cleanly
      // and let the row-level path evaluate it
      spark.sql(s"DELETE FROM graft.`$t` WHERE s IN ('r1', NULL)")
      val left = spark.sql(s"SELECT id FROM graft.`$t` ORDER BY id")
        .collect().map(_.getLong(0))
      assert(left.length === 39 && !left.contains(1L))
    } finally cleanup(t)
  }
}
