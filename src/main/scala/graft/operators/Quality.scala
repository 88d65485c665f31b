package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Data-quality expectations — the validation suite a pipeline runs
  * against every corpus drop before anything downstream trusts it
  * (the Deequ / dbt-test / Delta-constraint shape): each rule is a
  * named violation predicate, the report is one row per rule with the
  * checked/violated counts and a pass verdict. ONE aggregate over one
  * scan computes every rule (sum-of-indicator columns side by side),
  * then the single result row pivots into the per-rule report
  * driver-side via explode — rule count is metadata-sized, row count
  * is not, so the scan is the only data-sized work at any scale.
  *
  * The default suite over `documents` mixes rules that hold (null /
  * uniqueness / consistency invariants the generator guarantees) with
  * rules that genuinely fail on the corpus (the language allowlist
  * excludes real rows) — a report that can only say "pass" witnesses
  * nothing. */
object Quality {

  /** (rule name, violation indicator): indicator evaluates 1 on a row
    * violating the rule, 0 otherwise. */
  private def rowRules: Seq[(String, Column)] = Seq(
    "doc_id_not_null" -> when(col("doc_id").isNull, 1L).otherwise(0L),
    "n_chars_consistent" -> when(col("n_chars") =!= length(col("text")), 1L).otherwise(0L),
    "text_nonempty" -> when(length(trim(col("text"))) === 0, 1L).otherwise(0L),
    "lang_allowlisted" -> when(!col("lang").isin("en", "de", "fr"), 1L).otherwise(0L)
  )

  def report(spark: SparkSession, dir: String): DataFrame = {
    val aggs =
      rowRules.map { case (n, ind) => sum(ind).as(s"v_$n") } ++
      // uniqueness is a table-level rule: violations = rows - distinct
      Seq((count(lit(1)) - countDistinct(col("doc_id"))).as("v_doc_id_unique"),
        count(lit(1)).as("n"))
    val ruleNames = rowRules.map(_._1) :+ "doc_id_unique"
    Tables.documents(spark, dir)
      .agg(aggs.head, aggs.tail: _*)
      .select(explode(array(ruleNames.map(n =>
        struct(lit(n).as("rule"), col("n").as("n_checked"),
          col(s"v_$n").cast("long").as("n_violations"))): _*)).as("r"))
      .select(col("r.rule"), col("r.n_checked"), col("r.n_violations"),
        (col("r.n_violations") === 0L).as("pass"))
      .orderBy(col("rule"))
  }
}
