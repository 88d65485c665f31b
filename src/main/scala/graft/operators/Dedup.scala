package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions._

/** Deduplication operators for the LLM-data-pipeline surface (north-star
  * extension): exact, fingerprint (bag-of-words), sampled exact Jaccard,
  * MinHash+LSH, and SimHash.
  *
  * Scale design (the part that matters at 100 TB):
  *  - exact/fingerprint dedup is a single hash-aggregate — one shuffle on
  *    the digest, map-side combined;
  *  - all-pairs Jaccard is quadratic, so it exists only as a *sampled*
  *    baseline; the production path is MinHash banding, which turns
  *    near-dup search into an equi-join on (band_id, band_key) — linear
  *    shuffle volume, skew handled by AQE;
  *  - SimHash reduces each doc to 64 bits; the pigeonhole band join
  *    (4x16 bits) finds all pairs within Hamming distance 3 without a
  *    cross join;
  *  - candidate pairs are verified with exact Jaccard before reporting —
  *    LSH only prunes, it never asserts.
  */
object Dedup {

  /** Exact + fingerprint dedup summary — corpus-level counts. */
  def exactSummary(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(md5(col("text"))).as("n_distinct_texts"),
        countDistinct(fingerprint(col("text"))).as("n_distinct_fps"))

  /** Bag-of-words duplicate groups: same sorted distinct token set.
    * (The synthetic corpus has these; exact-text dupes it does not.) */
  def fingerprintGroups(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(fingerprint(col("text")).as("fp"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("min_doc_id"))
      .filter(col("n_docs") > 1)
      .orderBy(col("fp"))

  private def tokenSets(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), distinctTokens(col("text")).as("toks"))

  private def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b))

  /** Exact n-gram(1) Jaccard over a deterministic 20% sample — the
    * quadratic brute-force baseline, deliberately bounded. */
  def jaccardPairsSampled(spark: SparkSession, dir: String): DataFrame = {
    val t = tokenSets(spark, dir).filter(col("doc_id") % 5 === 0)
    val a = t.select(col("doc_id").as("doc_a"), col("toks").as("toks_a"))
    val b = t.select(col("doc_id").as("doc_b"), col("toks").as("toks_b"))
    a.join(b, col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
              round(jaccard(col("toks_a"), col("toks_b")), 4).as("jaccard"))
      .filter(col("jaccard") >= 0.5)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  // MinHash parameters: 32 hashes, 16 bands x 2 rows. For Jaccard j the
  // candidate probability is 1-(1-j^2)^16: j=0.8 -> ~1-3e-8 (never
  // missed in practice), j=0.3 -> 0.78 (pruned cheaply by verification).
  val NumHashes = 32
  val BandRows = 2
  val NumBands: Int = NumHashes / BandRows

  /** Per-document MinHash signature: mh_i = min over tokens of
    * xxhash64(token + "#" + i). Pure codegen'd HOFs — no UDF. */
  def minhashSignatures(spark: SparkSession, dir: String): DataFrame =
    tokenSets(spark, dir).withColumn("mh",
      array((0 until NumHashes).map(i =>
        array_min(transform(col("toks"),
          t => xxhash64(concat(t, lit("#" + i)))))): _*))

  /** MinHash LSH near-dup pairs, verified with exact Jaccard >= 0.8.
    * Blocking is an equi-join on (band_id, band_key): linear in corpus
    * size + candidate count, never quadratic. */
  def minhashLshPairs(spark: SparkSession, dir: String): DataFrame = {
    val sigs = minhashSignatures(spark, dir)
    val bands = sigs.select(
      col("doc_id"),
      posexplode(array((0 until NumBands).map(bId =>
        xxhash64(concat_ws(",",
          (0 until BandRows).map(r => col("mh")(bId * BandRows + r).cast("string")): _*))): _*)))
      .withColumnRenamed("pos", "band_id")
      .withColumnRenamed("col", "band_key")
    val x = bands.select(col("band_id"), col("band_key"), col("doc_id").as("doc_a"))
    val y = bands.select(col("band_id"), col("band_key"), col("doc_id").as("doc_b"))
    val cand = x.join(y, Seq("band_id", "band_key"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"))
      .distinct()
    val t = tokenSets(spark, dir)
    val ta = t.select(col("doc_id").as("doc_a"), col("toks").as("toks_a"))
    val tb = t.select(col("doc_id").as("doc_b"), col("toks").as("toks_b"))
    cand.join(ta, Seq("doc_a")).join(tb, Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
              round(jaccard(col("toks_a"), col("toks_b")), 4).as("jaccard"))
      .filter(col("jaccard") >= 0.8)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** 64-bit SimHash per document: explode distinct tokens, per-bit +/-1
    * vote sums in one hash-aggregate, reassemble the sign vector. */
  def simhashes(spark: SparkSession, dir: String): DataFrame = {
    val th = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(distinctTokens(col("text"))).as("tok"))
      .select(col("doc_id"), xxhash64(col("tok")).as("h"))
    val bitSums = (0 until 64).map(i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(lit(1L)) === 1, 1L).otherwise(-1L)).as(s"b$i"))
    th.groupBy(col("doc_id"))
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"),
        (0 until 64).map(i =>
          when(col(s"b$i") > 0, shiftleft(lit(1L), i)).otherwise(lit(0L)))
          .reduce(_ bitwiseOR _).as("simhash"))
      .orderBy(col("doc_id"))
  }

  /** SimHash near-dup pairs within Hamming distance 3. Pigeonhole over
    * 4x16-bit bands: any pair with <=3 differing bits shares at least one
    * intact band, so an equi-join on band value finds every such pair. */
  def simhashPairs(spark: SparkSession, dir: String): DataFrame = {
    val sh = simhashes(spark, dir)
    val bands = sh.select(
      col("doc_id"), col("simhash"),
      posexplode(array((0 until 4).map(k =>
        shiftright(col("simhash"), k * 16).bitwiseAND(lit(0xFFFFL))): _*)))
      .withColumnRenamed("pos", "band_id")
      .withColumnRenamed("col", "band_val")
    val x = bands.select(col("band_id"), col("band_val"),
      col("doc_id").as("doc_a"), col("simhash").as("sh_a"))
    val y = bands.select(col("band_id"), col("band_val"),
      col("doc_id").as("doc_b"), col("simhash").as("sh_b"))
    x.join(y, Seq("band_id", "band_val"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
              bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= 3)
      .orderBy(col("doc_a"), col("doc_b"))
  }
}
