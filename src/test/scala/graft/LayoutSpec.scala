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
