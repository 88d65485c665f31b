package graft

import org.apache.spark.sql.functions._
import graft.operators.CommitLog
import graft.pipeline.Maintenance

/** Maintenance CLI: argument validation (Left) and each subcommand
  * end-to-end (Right), sharing the suite session. */
class MaintenanceSpec extends SparkSpec {

  test("usage and validation errors are Left, never throws") {
    assert(Maintenance.run(spark, Array.empty).isLeft)
    assert(Maintenance.run(spark, Array("frobnicate", "/tmp/x")).isLeft)
    assert(Maintenance.run(spark, Array("compact", "/tmp/x", "0")).isLeft)
    assert(Maintenance.run(spark, Array("compact-ivf-index", "/tmp/x", "0")).isLeft)
    assert(Maintenance.run(spark, Array("compact-dedup-index", "/tmp/x", "-3")).isLeft)
    assert(Maintenance.run(spark, Array("zonemap", "/tmp/x", "")).isLeft)
    assert(Maintenance.run(spark, Array("vacuum", "/tmp/x", "notaversion")).isLeft)
  }

  test("compact + zonemap subcommands drive the real operators") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_maint_").toString
    try {
      import spark.implicits._
      Seq.tabulate(500)(i => (i.toLong, i * 2.0)).toDF("id", "v")
        .repartition(6).write.mode("overwrite").parquet(tmp)
      val r = Maintenance.run(spark, Array("compact", tmp, "512"))
      assert(r.isRight && r.toOption.get.contains("-> 1 files"), r.toString)
      val z = Maintenance.run(spark, Array("zonemap", tmp, "id,v"))
      assert(z.isRight)
      assert(new java.io.File(s"$tmp/_zonemaps.json").exists())
      assert(spark.read.parquet(tmp).count() === 500)
      // the index-compaction subcommands route to the replay-safe
      // wrappers (full behavior pinned in IvfAppendSpec/DedupIndexSpec;
      // here: an already-compact index is a Right no-op)
      val idx = java.nio.file.Files.createTempDirectory("graft_maint_ivf").toString
      graft.operators.Similarity.writeIvfIndex(spark, sf, idx)
      Maintenance.run(spark, Array("compact-ivf-index", idx, "512")) match {
        case Right(_) => ()
        case Left(e) => fail(s"compact-ivf-index failed: $e")
      }
      val didx = java.nio.file.Files.createTempDirectory("graft_maint_ddidx").toString
      graft.operators.Dedup.writeDedupIndex(spark, sf, didx)
      Maintenance.run(spark, Array("compact-dedup-index", didx, "512")) match {
        case Right(_) => ()
        case Left(e) => fail(s"compact-dedup-index failed: $e")
      }
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(idx))
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(didx))
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
      ()
    }
  }

  test("log-compact + vacuum subcommands drive the commit log") {
    val t = java.nio.file.Files.createTempDirectory("graft_maintlog_").toString
    try {
      import spark.implicits._
      CommitLog.append(spark, t, Seq((1L, "a")).toDF("id", "s"))
      CommitLog.append(spark, t, Seq((2L, "b")).toDF("id", "s"))
      val r = Maintenance.run(spark, Array("log-compact", t))
      assert(r.isRight && r.toOption.get.startsWith("committed v"), r.toString)
      val cv = CommitLog.latestVersion(spark, t)
      assert(Maintenance.run(spark, Array("vacuum", t, cv.toString)).isRight)
      assert(CommitLog.read(spark, t).count() === 2)
      assert(CommitLog.versions(spark, t) === Seq(cv))
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(t))
      ()
    }
  }

  test("log-compact-bloom + zorder subcommands drive the metadata-publishing rewrites") {
    val t = java.nio.file.Files.createTempDirectory("graft_maintmeta_").toString
    try {
      import spark.implicits._
      import org.apache.spark.sql.functions.col
      CommitLog.append(spark, t,
        Seq.tabulate(60)(i => (i.toLong, i * 2L, s"k$i")).toDF("a", "b", "key"))
      // N-ary zorder publishes zones on both clustered dims
      val z = Maintenance.run(spark, Array("zorder", t, "4", "a,b"))
      assert(z.isRight && z.toOption.get.startsWith("committed v"), z.toString)
      assert(CommitLog.scanRange(spark, t, "b", 0L, 10L).inputFiles.length <
        CommitLog.snapshot(spark, t, None).size)
      // bloom-publishing compaction: an impossible key probe opens 0 files
      val c = Maintenance.run(spark, Array("log-compact-bloom", t, "1", "key"))
      assert(c.isRight && c.toOption.get.startsWith("committed v"), c.toString)
      assert(CommitLog.scanEquals(spark, t, "key", "nope").inputFiles.isEmpty)
      assert(CommitLog.read(spark, t).count() === 60)
      // validation
      assert(Maintenance.run(spark, Array("zorder", t, "4", "a")).isLeft)
      assert(Maintenance.run(spark, Array("log-compact-bloom", t, "0", "key")).isLeft)
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(t))
      ()
    }
  }

  test("cluster-by rewrites into point-zone files that serve grouped pushdown") {
    val t = java.nio.file.Files.createTempDirectory("graft_maintclust_").toString
    try {
      import spark.implicits._
      import org.apache.spark.sql.functions.{col, count, lit, max}
      // interleaved keys: no file starts out with a point zone for k
      CommitLog.append(spark, t,
        Seq.tabulate(60)(i => (i.toLong, i % 3)).toDF("id", "k")
          .coalesce(2))
      val before = spark.read.format("graft").load(t)
        .groupBy(col("k")).agg(count(lit(1)).as("n"))
      assert(!before.queryExecution.executedPlan.toString.contains("GraftAggScan"),
        "pre-recluster grouped agg must not claim metadata service")
      val r = Maintenance.run(spark, Array("cluster-by", t, "k"))
      assert(r.isRight && r.toOption.get.startsWith("committed v"), r.toString)
      // every live file now stores k as a point: grouped COUNT serves
      // from metadata, rows and values unchanged
      val after = spark.read.format("graft").load(t)
        .groupBy(col("k")).agg(count(lit(1)).as("n"), max(col("id")).as("hi"))
        .orderBy(col("k"))
      assert(after.queryExecution.executedPlan.toString.contains("GraftAggScan"),
        "reclustered table must serve grouped aggregates from zones")
      assert(after.collect().map(x => (x.getInt(0), x.getLong(1), x.getLong(2))).toSeq ===
        Seq((0, 20L, 57L), (1, 20L, 58L), (2, 20L, 59L)))
      assert(CommitLog.read(spark, t).count() === 60)
      // NULL cluster keys refuse (no zone to be a point of)
      val tn = java.nio.file.Files.createTempDirectory("graft_maintnull_").toString
      try {
        CommitLog.append(spark, tn,
          Seq((1L, Some(1)), (2L, None)).toDF("id", "k"))
        assert(Maintenance.run(spark, Array("cluster-by", tn, "k")).isLeft)
      } finally {
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tn)); ()
      }
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(t))
      ()
    }
  }

  test("restore + history subcommands drive the commit log") {
    val t = java.nio.file.Files.createTempDirectory("graft_maintres_").toString
    try {
      import spark.implicits._
      CommitLog.append(spark, t, Seq((1L, "a")).toDF("id", "s").coalesce(1)) // v0
      CommitLog.overwrite(spark, t, Seq((9L, "z")).toDF("id", "s").coalesce(1)) // v1
      val r = Maintenance.run(spark, Array("restore", t, "0"))
      assert(r.isRight && r.toOption.get.contains("restored to v0 as commit v2"), r.toString)
      assert(CommitLog.read(spark, t).collect().map(_.getLong(0)).toSeq === Seq(1L))
      val h = Maintenance.run(spark, Array("history", t))
      assert(h.isRight, h.toString)
      val lines = h.toOption.get.linesIterator.toSeq
      assert(lines.length === 3 && lines.head.startsWith("v0 @"), h.toString)
      assert(lines.head.contains(": +1/-0"), h.toString)
      // bad version: a Left, not a crash
      assert(Maintenance.run(spark, Array("restore", t, "99")).isLeft)
      assert(Maintenance.run(spark, Array("history", s"$t-missing")).isLeft)
      // TIMESTAMP AS OF resolve: the v1 stamp maps back to v1, both as
      // epoch millis and as an ISO instant
      val t1 = CommitLog.commitTimestampMillis(spark, t, 1L).get
      val r1 = Maintenance.run(spark, Array("version-at", t, t1.toString))
      assert(r1.isRight && r1.toOption.get.startsWith("v1"), r1.toString)
      val iso = java.time.Instant.ofEpochMilli(t1).toString
      val r2 = Maintenance.run(spark, Array("version-at", t, iso))
      assert(r2.isRight && r2.toOption.get.startsWith("v1"), r2.toString)
      assert(Maintenance.run(spark, Array("version-at", t, "not-a-time")).isLeft)
      // before the first commit: refused with the horizon message
      val r3 = Maintenance.run(spark, Array("version-at", t, "0"))
      assert(r3.isLeft && r3.swap.toOption.get.contains("horizon"), r3.toString)
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(t))
      ()
    }
  }

  test("constraints + add-constraint subcommands drive the table gate") {
    import spark.implicits._
    val t = java.nio.file.Files.createTempDirectory("graft_mcons_").toString + "/t"
    try {
      graft.operators.CommitLog.append(spark, t, Seq((1L, 0.5)).toDF("id", "score"))
      assert(Maintenance.run(spark, Array("constraints", t)) === Right("no constraints"))
      val a = Maintenance.run(spark,
        Array("add-constraint", t, "score_unit", "score", ">=", "0", "AND", "score", "<=", "1"))
      assert(a.isRight, a)
      val l = Maintenance.run(spark, Array("constraints", t))
      assert(l === Right("score_unit: CHECK (score >= 0 AND score <= 1)"))
      // existing data violating the rule refuses as Left, never throws
      assert(Maintenance.run(spark,
        Array("add-constraint", t, "impossible", "score", ">", "2")).isLeft)
      // the gate is live: a violating append refuses
      intercept[Exception] {
        graft.operators.CommitLog.append(spark, t, Seq((2L, 7.0)).toDF("id", "score"))
      }
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(new java.io.File(t).getParent))
      ()
    }
  }
}
