package graft

import org.apache.spark.sql.functions._
import graft.operators.{Layout, ZoneMaps}

/** ZoneMaps: manifest write, driver-side file pruning, result
  * equivalence, and the composition with the Z-order layout (clustered
  * files -> tight zones -> real pruning; the manifest is honest about
  * an unclustered table pruning nothing). */
class ZoneMapsSpec extends SparkSpec {

  test("range scan prunes files by manifest and matches the unpruned result") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_zm_").toString
    try {
      // value-sorted write -> tight per-file value zones
      Tables.events(spark, sf)
        .select(col("event_id"), col("user_id"), col("value"))
        .repartitionByRange(8, col("value"))
        .sortWithinPartitions(col("value"))
        .write.mode("overwrite").parquet(tmp)
      ZoneMaps.write(spark, tmp, Seq("value", "event_id"))
      assert(new java.io.File(s"$tmp/${ZoneMaps.ManifestName}").exists())

      val all = spark.read.parquet(tmp)
      val Array(lo, hi) = all.agg(
        expr("percentile(value, 0.4)"), expr("percentile(value, 0.6)"))
        .collect()(0).toSeq.map(_.asInstanceOf[Double]).toArray

      val pruned = ZoneMaps.scanRange(spark, tmp, "value", lo, hi)
      val expected = all.filter(col("value") >= lo && col("value") <= hi)
      assert(pruned.count() === expected.count())
      assert(pruned.select(sum("event_id")).head.getLong(0) ===
        expected.select(sum("event_id")).head.getLong(0))

      // the point: fewer FILES handed to the reader, not just fewer rows
      val nTotal = ZoneMaps.candidateFiles(spark, tmp, "value",
        Double.MinValue, Double.MaxValue).length
      val nPruned = ZoneMaps.candidateFiles(spark, tmp, "value", lo, hi).length
      assert(nTotal === 8)
      assert(nPruned < nTotal / 2,
        s"a 20%-range scan should drop most sorted files, kept $nPruned/$nTotal")
      assert(pruned.inputFiles.length === nPruned)
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
      ()
    }
  }

  test("write rejects string columns up front — the manifest has no escaping for them") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_zm_").toString
    try {
      import spark.implicits._
      // a string min/max containing `,"` would mis-split the flat
      // hand-parsed manifest; candidateFiles compares as Double anyway,
      // so a string zone could never prune — reject at write time
      Seq((1L, """x,"y"""), (2L, "plain")).toDF("id", "s")
        .write.mode("overwrite").parquet(tmp)
      intercept[IllegalArgumentException] {
        ZoneMaps.write(spark, tmp, Seq("s"))
      }
      intercept[IllegalArgumentException] {
        ZoneMaps.write(spark, tmp, Seq("missing_col"))
      }
      ZoneMaps.write(spark, tmp, Seq("id")) // numeric still fine
      assert(ZoneMaps.candidateFiles(spark, tmp, "id", 1, 2).nonEmpty)
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
      ()
    }
  }

  test("a range excluded by every zone yields an empty frame, right schema") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_zm2_").toString
    try {
      Tables.events(spark, sf).select(col("event_id"), col("value"))
        .coalesce(2).write.mode("overwrite").parquet(tmp)
      ZoneMaps.write(spark, tmp, Seq("value"))
      val out = ZoneMaps.scanRange(spark, tmp, "value", 1e12, 2e12)
      assert(out.count() === 0)
      assert(out.columns.toSeq === Seq("event_id", "value"))
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
      ()
    }
  }

  test("zone maps over a Z-ordered table prune on BOTH dimensions") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_zm3_").toString
    try {
      val src = Tables.events(spark, sf)
        .select(col("event_id"), col("user_id").cast("double").as("u"),
          col("value"))
      Layout.writeZOrdered(src, "u", "value", tmp, files = 16)
      ZoneMaps.write(spark, tmp, Seq("u", "value"))
      val uMax = src.agg(max("u")).head.getDouble(0)
      // a narrow box on the FIRST dim
      val kept1 = ZoneMaps.candidateFiles(spark, tmp, "u", 0, uMax / 4).length
      // and on the SECOND dim — 1-D sorting could never prune this one
      val vs = src.agg(min("value"), max("value")).head
      val (vLo, vHi) = (vs.getDouble(0), vs.getDouble(1))
      val kept2 = ZoneMaps.candidateFiles(spark, tmp, "value",
        vLo, vLo + (vHi - vLo) / 4).length
      assert(kept1 < 16 && kept2 < 16,
        s"z-order zones should prune both dims, kept u=$kept1 value=$kept2 of 16")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
      ()
    }
  }
}
