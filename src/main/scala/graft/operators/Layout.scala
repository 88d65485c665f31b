package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) clustering so that
  * parquet min/max footer stats prune files and row groups for range
  * predicates on EITHER (or both) of two dimensions — the standard
  * lakehouse layout optimization for "100 TB, filtered by (k1, k2)
  * boxes" workloads. A single-column sort gives perfect pruning on that
  * column and none on the other; interleaving the dimensions' bits
  * gives ~sqrt-of-file-count-tight bounding boxes on both.
  *
  * Everything is expression-level (codegen'd bit arithmetic), the write
  * is one range repartition + in-partition sort — no driver data path
  * beyond the 1-row min/max frame, which rides the plan as a broadcast
  * cross join. */
object Layout {

  /** Interleave the low `bits` bits of two already-normalized long
    * columns (a in odd positions, b in even): the Morton index. A
    * static fold over bit positions — 2*bits shift/mask terms, all
    * inside whole-stage codegen. */
  def morton(a: Column, b: Column, bits: Int = 16): Column = {
    // bits = 31 is the ceiling: the top term shifts to position
    // 2*(bits-1)+1 = 61; at bits >= 32 interleaved bits would reach the
    // sign bit, z-values go negative, and the range partition of the
    // curve is silently corrupted — fail fast instead
    require(bits >= 1 && bits <= 31,
      s"morton bits must be in [1, 31] (got $bits): 2*(bits-1)+1 must stay below the long sign bit")
    (0 until bits).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i + 1)
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i))
    }.reduce(_ bitwiseOR _)
  }

  /** Normalize a numeric column to [0, 2^bits) against the given
    * bounds (computed once per write, broadcast). */
  private def normalize(v: Column, lo: Column, hi: Column, bits: Int): Column = {
    val span = when(hi > lo, hi - lo).otherwise(lit(1.0))
    least(floor((v.cast("double") - lo) / span * ((1L << bits) - 1)), lit((1L << bits) - 1))
      .cast("long")
  }

  /** The z-value of (colA, colB) with bounds attached as a broadcast
    * 1-row frame — min/max never touch the driver. */
  def withZValue(df: DataFrame, colA: String, colB: String, bits: Int = 16): DataFrame = {
    val bounds = df.agg(
      min(col(colA).cast("double")).as("_loA"), max(col(colA).cast("double")).as("_hiA"),
      min(col(colB).cast("double")).as("_loB"), max(col(colB).cast("double")).as("_hiB"))
    df.crossJoin(broadcast(bounds))
      .withColumn("_z", morton(
        normalize(col(colA), col("_loA"), col("_hiA"), bits),
        normalize(col(colB), col("_loB"), col("_hiB"), bits), bits))
      .drop("_loA", "_hiA", "_loB", "_hiB")
  }

  /** Write `df` as `files` parquet files clustered on the z-curve of
    * (colA, colB): range-repartition by z (contiguous curve segments
    * per file — balanced even when the value distribution is skewed,
    * because ranges come from a sample of the actual z distribution),
    * sort within partitions (tight row-group stats inside each file). */
  def writeZOrdered(df: DataFrame, colA: String, colB: String,
      path: String, files: Int, bits: Int = 16): Unit =
    withZValue(df, colA, colB, bits)
      .repartitionByRange(files, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
      .write.mode("overwrite").parquet(path)
}
