package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) clustering so that
  * parquet min/max footer stats prune files and row groups for range
  * predicates on ANY subset of N dimensions — the standard lakehouse
  * layout optimization for "100 TB, filtered by (k1, .., kN) boxes"
  * workloads (Delta's OPTIMIZE ZORDER BY shape). A single-column sort
  * gives perfect pruning on that column and none on the others;
  * interleaving the dimensions' bits gives curve-segment bounding
  * boxes tight in every dimension at once.
  *
  * Everything is expression-level (codegen'd bit arithmetic), the write
  * is one range repartition + in-partition sort — no driver data path
  * beyond the 1-row min/max frame, which rides the plan as a broadcast
  * cross join. */
object Layout {

  /** Interleave the low `bits` bits of N already-normalized long
    * columns: the Morton index. Bit i of column j lands at position
    * i*N + (N-1-j), so earlier columns take the more significant
    * positions within each round — for N=2 this is exactly the classic
    * (a odd, b even) interleave. A static fold over N*bits shift/mask
    * terms, all inside whole-stage codegen. */
  def mortonN(cols: Seq[Column], bits: Int): Column = {
    val n = cols.length
    require(n >= 2, s"mortonN needs >= 2 columns (got $n)")
    // the top term shifts to (bits-1)*n + (n-1) = bits*n - 1, which
    // must stay below the long sign bit (position 63) — at bits*n >=
    // 64 z-values would go negative and the range partition of the
    // curve would be silently corrupted; fail fast instead
    require(bits >= 1 && bits * n <= 63,
      s"morton bits must satisfy 1 <= bits and bits*$n <= 63 (got $bits)")
    (for {
      i <- 0 until bits
      (c, j) <- cols.zipWithIndex
    } yield shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), i * n + (n - 1 - j)))
      .reduce(_ bitwiseOR _)
  }

  /** Two-dimensional Morton index — the N=2 instance of [[mortonN]]
    * (a in odd positions, b in even), kept as the named 2-D API. */
  def morton(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31,
      s"morton bits must be in [1, 31] (got $bits): 2*(bits-1)+1 must stay below the long sign bit")
    mortonN(Seq(a, b), bits)
  }

  /** Normalize a numeric column to [0, 2^bits) against the given
    * bounds (computed once per write, broadcast). */
  private def normalize(v: Column, lo: Column, hi: Column, bits: Int): Column = {
    val span = when(hi > lo, hi - lo).otherwise(lit(1.0))
    least(floor((v.cast("double") - lo) / span * ((1L << bits) - 1)), lit((1L << bits) - 1))
      .cast("long")
  }

  /** The z-value of N columns with bounds attached as a broadcast
    * 1-row frame — min/max never touch the driver. Default bit width
    * spends the full sub-sign-bit budget evenly: 63/N bits per
    * dimension (31 for 2-D, 21 for 3-D, 15 for 4-D...). */
  def withZValueN(df: DataFrame, cols: Seq[String], bits: Int = 0): DataFrame = {
    val n = cols.length
    val b = if (bits > 0) bits else 63 / n
    val bounds = df.agg(
      min(col(cols.head).cast("double")).as(s"_lo0"),
      (max(col(cols.head).cast("double")).as(s"_hi0") +:
        cols.zipWithIndex.tail.flatMap { case (c, j) => Seq(
          min(col(c).cast("double")).as(s"_lo$j"),
          max(col(c).cast("double")).as(s"_hi$j")) }): _*)
    val drop = cols.indices.flatMap(j => Seq(s"_lo$j", s"_hi$j"))
    df.crossJoin(broadcast(bounds))
      .withColumn("_z", mortonN(
        cols.zipWithIndex.map { case (c, j) =>
          normalize(col(c), col(s"_lo$j"), col(s"_hi$j"), b) }, b))
      .drop(drop: _*)
  }

  /** Two-dimensional z-value — kept as the named 2-D API (the
    * commit-log OPTIMIZE path's current shape). */
  def withZValue(df: DataFrame, colA: String, colB: String, bits: Int = 16): DataFrame =
    withZValueN(df, Seq(colA, colB), bits)

  /** Write `df` as `files` parquet files clustered on the z-curve of
    * N columns: range-repartition by z (contiguous curve segments per
    * file — balanced even when the value distribution is skewed,
    * because ranges come from a sample of the actual z distribution),
    * sort within partitions (tight row-group stats inside each file). */
  def writeZOrderedN(df: DataFrame, cols: Seq[String],
      path: String, files: Int, bits: Int = 0): Unit =
    withZValueN(df, cols, bits)
      .repartitionByRange(files, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
      .write.mode("overwrite").parquet(path)

  def writeZOrdered(df: DataFrame, colA: String, colB: String,
      path: String, files: Int, bits: Int = 16): Unit =
    writeZOrderedN(df, Seq(colA, colB), path, files, bits)
}
