package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.Layout

/** Z-order layout: the file-level min/max boxes must be tight on BOTH
  * dimensions (that's the entire point — a single-column sort is tight
  * on one and spans the other), and the layout must be a pure reshuffle
  * (no rows gained/lost/changed). */
class LayoutSpec extends SparkSpec {

  /** Per output file: (minA, maxA, minB, maxB) — the footer-stat view. */
  private def fileBoxes(path: String, a: String, b: String): Seq[(Double, Double, Double, Double)] = {
    val files = new java.io.File(path).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).map(_.getPath).toSeq
    files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min(col(a).cast("double")), max(col(a).cast("double")),
             min(col(b).cast("double")), max(col(b).cast("double")))
        .head()
      (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
    }
  }

  test("z-order layout is boxed on both dims; single-col sort spans the other") {
    val df = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
    val (aSpan, bSpan) = {
      val r = df.agg(
        max("l_orderkey").cast("double") - min("l_orderkey").cast("double"),
        max("l_partkey").cast("double") - min("l_partkey").cast("double")).head()
      (r.getDouble(0), r.getDouble(1))
    }
    val zDir = Files.createTempDirectory("zorder").toString
    val sDir = Files.createTempDirectory("sorted").toString
    Layout.writeZOrdered(df, "l_orderkey", "l_partkey", zDir, files = 16)
    df.repartitionByRange(16, col("l_orderkey"))
      .sortWithinPartitions(col("l_orderkey"))
      .write.mode("overwrite").parquet(sDir)

    // lossless reshuffle
    val back = spark.read.parquet(zDir)
    assert(back.count() === df.count())
    assert(back.columns.sorted.toSeq === df.columns.sorted.toSeq)
    assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty)

    // the discriminating metric is the PER-DIMENSION range, not box
    // area (mean area is ~1/files for any space-filling layout): the
    // 1-D sort is tight on orderkey but each of its files spans ~the
    // whole partkey domain, so partkey predicates prune nothing; the
    // z-curve bounds BOTH dims at ~1/sqrt(files) of their spans
    val zBoxes = fileBoxes(zDir, "l_orderkey", "l_partkey")
    val sBoxes = fileBoxes(sDir, "l_orderkey", "l_partkey")
    def meanBRange(boxes: Seq[(Double, Double, Double, Double)]): Double =
      boxes.map(b => (b._4 - b._3) / bSpan).sum / boxes.length
    val zB = meanBRange(zBoxes)
    val sB = meanBRange(sBoxes)
    assert(sB > 0.85, s"1-D layout unexpectedly tight on partkey ($sB) — bad baseline")
    assert(zB < 0.5 * sB, s"z-order partkey ranges not tighter: z=$zB vs sorted=$sB")
    // and orderkey stays bounded too (z-order trades a constant, not
    // the dimension): every file's orderkey range is a fraction of span
    assert(zBoxes.map(b => (b._2 - b._1) / aSpan).max < 0.75,
      "z-order lost orderkey locality entirely")

    // the practical consequence: a partkey-only predicate can skip
    // most z-ordered files on footer stats alone, and no 1-D-sorted ones
    def skipped(boxes: Seq[(Double, Double, Double, Double)],
        loB: Double, hiB: Double): Int =
      boxes.count(b => b._4 < loB || b._3 > hiB)
    val zSkipped = skipped(zBoxes, 100, 300)
    val sSkipped = skipped(sBoxes, 100, 300)
    assert(zSkipped > sSkipped,
      s"z-order should let footer stats skip files: z=$zSkipped vs sorted=$sSkipped")
  }

  test("3-D z-order bounds every dimension; commit-log OPTIMIZE ZORDER BY serves it") {
    val df = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"))
    val dims = Seq("l_orderkey", "l_partkey", "l_suppkey")
    val spans = dims.map { d =>
      val r = df.agg(max(col(d)).cast("double") - min(col(d)).cast("double")).head()
      d -> r.getDouble(0)
    }.toMap
    val zDir = Files.createTempDirectory("zorder3").toString
    Layout.writeZOrderedN(df, dims, zDir, files = 27)
    val back = spark.read.parquet(zDir)
    assert(back.count() === df.count())
    assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty)
    // every dimension's per-file range must be bounded away from the
    // full span (a 1-D sort leaves two of the three at ~1.0)
    val files = new java.io.File(zDir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getPath).toSeq
    dims.foreach { d =>
      val mean = files.map { f =>
        val r = spark.read.parquet(f)
          .agg(min(col(d).cast("double")), max(col(d).cast("double"))).head()
        (r.getDouble(1) - r.getDouble(0)) / spans(d)
      }.sum / files.length
      assert(mean < 0.7, s"3-D z-order not bounded on $d: mean range $mean")
    }
    // the commit-log composition: OPTIMIZE ZORDER BY three columns,
    // zone maps on all three in one dataChange=false commit
    val t = Files.createTempDirectory("zorder3_table").toString
    try {
      graft.operators.CommitLog.append(spark, t, df)
      val before = graft.operators.CommitLog.read(spark, t).count()
      graft.operators.CommitLog.optimizeZOrderBy(spark, t, dims, files = 9)
      assert(graft.operators.CommitLog.read(spark, t).count() === before)
      // a range predicate on the LAST dim prunes files via zones
      val all = graft.operators.CommitLog.snapshot(spark, t, None).size
      val pruned = graft.operators.CommitLog.scanRange(
        spark, t, "l_suppkey", 1L, 3L).inputFiles.length
      assert(pruned < all, s"zone pruning on the 3rd z-dim: $pruned vs $all files")
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(t))
  }

  test("mortonN matches a reference interleave and enforces the bit budget") {
    // N=3, bits=4: expression vs driver-side reference
    def ref3(a: Long, b: Long, c: Long, bits: Int): Long =
      (for (i <- 0 until bits; (v, j) <- Seq(a, b, c).zipWithIndex)
        yield ((v >> i) & 1L) << (i * 3 + (2 - j))).reduce(_ | _)
    val rows = spark.range(0, 16).select(col("id"),
        Layout.mortonN(Seq(col("id"), lit(5L), lit(9L)), 4).as("z"))
      .orderBy("id").collect()
    rows.foreach { r =>
      assert(r.getLong(1) === ref3(r.getLong(0), 5L, 9L, 4))
    }
    // 2-D morton is exactly the N=2 instance
    val eq = spark.range(0, 64).select(
      (Layout.morton(col("id"), lit(21L), bits = 6) ===
        Layout.mortonN(Seq(col("id"), lit(21L)), 6)).as("ok")).collect()
    assert(eq.forall(_.getBoolean(0)))
    // bit budget: bits*n must stay below the sign bit
    intercept[IllegalArgumentException] { Layout.mortonN(Seq(lit(1L), lit(1L), lit(1L)), 22) }
    Layout.mortonN(Seq(lit(1L), lit(1L), lit(1L)), 21)
    intercept[IllegalArgumentException] {
      Layout.mortonN(Seq(lit(1L), lit(1L), lit(1L), lit(1L)), 16) }
    Layout.mortonN(Seq(lit(1L), lit(1L), lit(1L), lit(1L)), 15)
  }

  test("morton rejects bit widths that would reach the long sign bit") {
    // bits = 32 would shift an interleaved bit to position 63: negative
    // z-values, corrupted curve order — must fail fast at plan build
    intercept[IllegalArgumentException] { Layout.morton(lit(1L), lit(1L), bits = 32) }
    intercept[IllegalArgumentException] { Layout.morton(lit(1L), lit(1L), bits = 0) }
    // 31 is the documented ceiling and must stay legal
    Layout.morton(lit(1L), lit(1L), bits = 31)
  }

  test("morton interleaving is order-preserving per dimension at fixed other") {
    // sanity on the bit math: along one axis (other fixed), z is monotone
    val rows = spark.range(0, 256)
      .select(col("id"),
        Layout.morton(col("id"), lit(7L), bits = 8).as("za"),
        Layout.morton(lit(7L), col("id"), bits = 8).as("zb"))
      .orderBy(col("id")).collect()
    val za = rows.map(_.getAs[Long]("za"))
    val zb = rows.map(_.getAs[Long]("zb"))
    assert(za.zip(za.tail).forall { case (x, y) => x < y })
    assert(zb.zip(zb.tail).forall { case (x, y) => x < y })
    // and the expression matches a driver-side reference interleave
    def ref(a: Long, b: Long, bits: Int): Long =
      (0 until bits).map(i => (((a >> i) & 1L) << (2 * i + 1)) | (((b >> i) & 1L) << (2 * i)))
        .reduce(_ | _)
    rows.foreach { r =>
      val id = r.getAs[Long]("id")
      assert(r.getAs[Long]("za") === ref(id, 7L, 8))
      assert(r.getAs[Long]("zb") === ref(7L, id, 8))
    }
  }
}
