package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Change-data ops: CDC MERGE (upsert/delete apply) and SCD2 interval
  * building — the warehouse maintenance surface the reference never
  * needs (its archive is append-only with idempotent day overwrite,
  * aristoteles.py:418-430) but any curated 100 TB corpus does: fact
  * corrections arrive as CDC batches, dimension history is queried
  * as-of.
  *
  * Scale shape: a CDC batch is orders of magnitude smaller than the
  * base table, so [[mergeApply]] does ONE broadcast anti-join on the
  * touched keys (no shuffle of the base) + a union of the upsert
  * payloads. In a partitioned deployment the union lands as a dynamic
  * partition overwrite of only the touched partitions (the
  * ArchiveJob.scala discipline); here the merge result is the
  * queryable frame itself. SCD2 is two window passes over the same
  * (user, time) sort — one partition-local sort, no extra shuffle. */
object Changes {

  /** Deterministic CDC batch derived from orders — updates reprice
    * key%10==3 (+5%, status 'U'), deletes remove key%10==7, inserts
    * re-key key%10==5 at +10M with half price, status 'N'. Derived,
    * not random, so the DuckDB oracle reconstructs it exactly. */
  private[graft] def changeBatch(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"), col("o_orderdate"))
    // NOTE: no round() on the reprices — this is a row-level op (no
    // summation-order ambiguity), and round()'s decimalization of a
    // half-way double differs between engines (Spark 250020.015 ->
    // .01, DuckDB -> .02). The raw IEEE products are bit-identical
    // everywhere; rounding would ADD divergence here, not remove it.
    val u = o.filter(col("o_orderkey") % 10 === 3)
      .select(col("o_orderkey"), lit("U").as("op"), col("o_custkey"),
        lit("U").as("o_orderstatus"),
        (col("o_totalprice") * 1.05).as("o_totalprice"), col("o_orderdate"))
    val d = o.filter(col("o_orderkey") % 10 === 7)
      .select(col("o_orderkey"), lit("D").as("op"),
        lit(null).cast("long").as("o_custkey"),
        lit(null).cast("string").as("o_orderstatus"),
        lit(null).cast("double").as("o_totalprice"),
        lit(null).cast("timestamp").as("o_orderdate"))
    val i = o.filter(col("o_orderkey") % 10 === 5)
      .select((col("o_orderkey") + 10000000L).as("o_orderkey"), lit("I").as("op"),
        col("o_custkey"), lit("N").as("o_orderstatus"),
        (col("o_totalprice") * 0.5).as("o_totalprice"), col("o_orderdate"))
    u.unionByName(d).unionByName(i)
  }

  /** MERGE semantics (Delta/Iceberg MERGE INTO, re-expressed as joins):
    * rows whose key appears in the change batch leave the base via a
    * broadcast LEFT ANTI join (U and D both retire the old row); the
    * batch's U and I payloads union in as the new versions. The base
    * table is never shuffled — at 100 TB that is the whole game; the
    * anti-join's build side is just the touched-key set. */
  def mergeApply(base: DataFrame, changes: DataFrame, key: String): DataFrame = {
    val touched = changes.select(col(key)).distinct()
    base.join(broadcast(touched), Seq(key), "left_anti")
      .unionByName(changes.filter(col("op").isin("U", "I")).drop("op"))
  }

  /** The registered merge query: apply [[changeBatch]] to orders and
    * return the merged table, totally ordered — every surviving,
    * updated, and inserted row is hash-checked against the oracle's
    * set-algebra reconstruction (row-level, not summary-level). */
  def mergeUpsert(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"), col("o_orderdate"))
    mergeApply(base, changeBatch(spark, dir), "o_orderkey")
      .orderBy(col("o_orderkey"))
  }

  /** SCD2 build from an event stream: per user, each change of
    * event_type opens a validity interval [valid_from_us, valid_to_us)
    * closed by the next change (NULL = current). Two stacked windows
    * over ONE (user_id, ts, event_id) sort: lag to find transitions,
    * lead over the filtered transitions to close intervals — Catalyst
    * reuses the partition sort, so the whole build is a single
    * shuffle-and-sort of the events at any scale. */
  def scd2UserState(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    val transitions = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      // NULL-SAFE distinctness: a transition INTO a NULL event_type is
      // a real state change ('A' =!= null is NULL, not true — the old
      // filter dropped it and the prior state silently absorbed the
      // null period); the first row's prev is NULL, also distinct
      .filter(!(col("prev_type") <=> col("event_type")))
    transitions
      .withColumn("valid_to_us", lead(col("ts_us"), 1).over(w))
      .select(col("user_id"), col("event_id"), col("event_type").as("state"),
        col("ts_us").as("valid_from_us"), col("valid_to_us"),
        col("valid_to_us").isNull.as("is_current"))
      // event_id (the event that OPENED the interval — natural SCD2
      // lineage) makes the order total even when two transitions share
      // a timestamp
      .orderBy(col("user_id"), col("valid_from_us"), col("event_id"))
  }
}
