package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.Similarity

/** IVF-served range search (Similarity.rangeSearchIvfServed): the
  * indexed tier must be VALUE-IDENTICAL to the brute yardstick — the
  * spherical-triangle cell bound is conservative by proof, and these
  * pins hold it to that: corpus equivalence, a planted-cluster case
  * where pruning provably FIRES and results still match, the pure
  * conservativeness property over random data, bound widening across
  * appends, and the boundless-sidecar fallback. */
class RangeSearchIvfSpec extends SparkSpec {

  private def bruteRange(emb: DataFrame, probes: DataFrame,
      t: Double): Seq[(Long, Long, Double)] =
    emb.crossJoin(broadcast(probes))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(Similarity.cosine(col("q"), col("v")), 4).as("cos_sim"))
      .filter(col("cos_sim") >= t)
      .orderBy(col("query_id"), col("neighbor_id"))
      .collect().toIndexedSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))

  private def rows(df: DataFrame): Seq[(Long, Long, Double)] =
    df.collect().toIndexedSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))

  test("served range search equals brute on the sf corpus") {
    val brute = rows(Similarity.rangeSearch(spark, sf))
    val served = rows(Similarity.rangeSearchIvfServed(spark, sf))
    assert(served === brute)
    assert(brute.nonEmpty, "yardstick degenerate: no matches at 0.2")
  }

  /** Two tight clusters around orthogonal directions: a high-threshold
    * probe aligned with cluster A must PRUNE the cells holding cluster
    * B — and still return exactly the brute answer. */
  test("planted clusters: pruning fires and the answer stays exact") {
    import scala.jdk.CollectionConverters._
    val dim = 8
    val rnd = new scala.util.Random(7)
    def jitter(base: Int): Seq[Float] =
      (0 until dim).map(d =>
        (if (d == base) 1.0 else 0.0) + rnd.nextGaussian() * 0.01).map(_.toFloat)
    val vecs = (0 until 40).map(i => (i.toLong, jitter(0))) ++
      (40 until 80).map(i => (i.toLong, jitter(3)))
    val embSchema = StructType(Seq(StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val emb = spark.createDataFrame(
      vecs.map { case (id, v) => Row(id, v) }.asJava, embSchema)
    val tmp = java.nio.file.Files.createTempDirectory("graft_rstest_").toString
    try {
      Similarity.writeIvfIndexFrom(spark, emb, tmp)
      val probeQ = (0 until dim).map(d => if (d == 0) 1.0 else 0.0).toArray
      val probesSchema = StructType(Seq(StructField("query_id", LongType),
        StructField("q", ArrayType(DoubleType))))
      val probes = spark.createDataFrame(
        java.util.List.of(Row(1000L, probeQ.toIndexedSeq)), probesSchema)
      val threshold = 0.9
      val served = rows(Similarity.rangeSearchIvfCore(spark, tmp, probes, threshold))
      val brute = bruteRange(
        emb.select(col("vec_id"),
          transform(col("embedding"), x => x.cast("double")).as("v")),
        probes, threshold)
      assert(served === brute)
      assert(served.nonEmpty && served.forall(_._2 < 40),
        "expected exactly the cluster-A members")
      // pruning PROVABLY fired: cluster B's cells are not visited
      val cents = Similarity.readCentroidSidecar(spark, tmp)
      val bounds = Similarity.readCellBoundsSidecar(spark, tmp).get
      val thetas = bounds.map(b => math.acos(math.max(-1.0, math.min(1.0, b))))
      val kept = Similarity.rangeCells(cents, Some(thetas), probeQ, threshold)
      assert(kept.size < Similarity.NumCells,
        s"no cell was pruned: kept=$kept bounds=${bounds.mkString(",")}")
      // conservativeness on this corpus: every brute match's cell kept
      val cellOf = spark.read.parquet(tmp)
        .select(col("vec_id"), col("cell").cast("int")).collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      brute.foreach { case (_, nb, _) =>
        assert(kept.contains(cellOf(nb)), s"match $nb sits in a pruned cell")
      }
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
      ()
    }
  }

  /** The pure property: for random vectors, any member whose ROUNDED
    * cosine clears the threshold lives in a kept cell — the exact
    * guarantee the serve path relies on. */
  test("rangeCells is conservative over random corpora (property)") {
    val rnd = new scala.util.Random(11)
    val dim = 6
    def vec(): Array[Double] = Array.fill(dim)(rnd.nextGaussian())
    (0 until 20).foreach { _ =>
      val cents = Seq.fill(4)(vec())
      val members = Seq.fill(120)(vec())
      def cell(v: Array[Double]): Int = {
        val scores = cents.map(c =>
          c.zip(v).map { case (a, b) => a * b }.sum - c.map(x => x * x).sum / 2.0)
        scores.indexOf(scores.max) + 1
      }
      def cos(a: Array[Double], b: Array[Double]): Double = {
        val na = math.sqrt(a.map(x => x * x).sum)
        val nb = math.sqrt(b.map(x => x * x).sum)
        a.zip(b).map { case (x, y) => x * y }.sum / (na * nb)
      }
      val byCell = members.groupBy(cell)
      val bounds = (1 to 4).map(c =>
        byCell.get(c).map(_.map(v => cos(cents(c - 1), v)).min).getOrElse(1.0))
      val thetas = bounds.map(b => math.acos(math.max(-1.0, math.min(1.0, b)))).toArray
      val q = vec()
      for (t <- Seq(0.3, 0.6, 0.9)) {
        val kept = Similarity.rangeCells(cents.map(identity), Some(thetas), q, t)
        members.foreach { v =>
          val rounded = BigDecimal(cos(q, v))
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
          if (rounded >= t)
            assert(kept.contains(cell(v)),
              s"t=$t member at cos=${cos(q, v)} in pruned cell ${cell(v)}")
        }
      }
    }
  }

  test("appends widen the bound sidecar and keep the served answer exact") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_rswiden_").toString
    try {
      val emb = Tables.embeddings(spark, sf)
      Similarity.writeIvfIndexFrom(spark, emb.filter(col("vec_id") % 2 === 0), tmp)
      val before = Similarity.readCellBoundsSidecar(spark, tmp).get
      Similarity.appendIvfIndex(spark, tmp, emb.filter(col("vec_id") % 2 === 1))
      val after = Similarity.readCellBoundsSidecar(spark, tmp).get
      assert(before.zip(after).forall { case (b, a) => a <= b + 1e-12 },
        "append narrowed a bound")
      // served over the full index equals brute over the full corpus
      val probes = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"),
          transform(col("embedding"), x => x.cast("double")).as("q"))
      val served = rows(Similarity.rangeSearchIvfCore(spark, tmp, probes, 0.2))
      val brute = rows(Similarity.rangeSearch(spark, sf))
      assert(served === brute)
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
      ()
    }
  }

  test("tighten-range-bounds recovers exact bounds after crash-widened drift") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_rstighten_").toString
    try {
      val emb = Tables.embeddings(spark, sf)
      Similarity.writeIvfIndexFrom(spark, emb, tmp)
      val exact = Similarity.readCellBoundsSidecar(spark, tmp).get
      // simulate crash residue: a widen landed (bounds -1 everywhere)
      // but its batch's rows never did — serving is conservative-slow.
      // (Written through the Hadoop fs so the local .crc stays honest.)
      val p = new org.apache.hadoop.fs.Path(s"$tmp/_cellbounds.json")
      val hfs = p.getFileSystem(spark.sessionState.newHadoopConf())
      val os = hfs.create(p, true)
      os.write(Array.fill(Similarity.NumCells)(-1.0)
        .mkString("[", ",", "]").getBytes("UTF-8"))
      os.close()
      val probes = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"),
          transform(col("embedding"), x => x.cast("double")).as("q"))
      val brute = rows(Similarity.rangeSearch(spark, sf))
      assert(rows(Similarity.rangeSearchIvfCore(spark, tmp, probes, 0.2)) === brute,
        "drifted bounds must stay value-identical (just slower)")
      // the maintenance verb recomputes exactly from the index rows
      val r = graft.pipeline.Maintenance.run(spark,
        Array("tighten-range-bounds", tmp))
      assert(r.isRight, r.toString)
      val tightened = Similarity.readCellBoundsSidecar(spark, tmp).get
      exact.zip(tightened).foreach { case (e, t) =>
        assert(math.abs(e - t) < 1e-12, "tighten must land on the exact bound")
      }
      assert(rows(Similarity.rangeSearchIvfCore(spark, tmp, probes, 0.2)) === brute)
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
      ()
    }
  }

  test("a boundless (pre-sidecar) index serves without pruning, still exact") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_rsnobound_").toString
    try {
      val emb = Tables.embeddings(spark, sf)
      Similarity.writeIvfIndexFrom(spark, emb, tmp)
      java.nio.file.Files.delete(java.nio.file.Path.of(s"$tmp/_cellbounds.json"))
      val probes = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"),
          transform(col("embedding"), x => x.cast("double")).as("q"))
      val served = rows(Similarity.rangeSearchIvfCore(spark, tmp, probes, 0.2))
      assert(served === rows(Similarity.rangeSearch(spark, sf)))
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
      ()
    }
  }

  test("the served plan partition-prunes on cell") {
    val plan = Similarity.rangeSearchIvfServed(spark, sf)
      .queryExecution.executedPlan.toString
    val pf = "PartitionFilters: \\[[^\\]]*cell".r
    assert(pf.findFirstIn(plan).isDefined,
      s"index scan lost its cell PartitionFilters:\n$plan")
  }
}
