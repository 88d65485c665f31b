package graft

/** Smoke coverage: every registered query runs and the contract invariants
  * hold (oracle for each query, non-empty flagship). Value-level
  * correctness is the DuckDB differential harness (tools/check_oracle.py,
  * driver t2). */
class QueriesSpec extends SparkSpec {

  test("entry returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query runs at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      withClue(s"query $name: ")(assert(n >= 0))
    }
  }

  test("every SQL-expressible query has an oracle with matching name") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("oracle output column names match Spark output column names") {
    // The driver sorts columns by name before hashing; a name mismatch is
    // a silent hash fail. Cheap static check: every alias in the Spark
    // result must appear in the oracle SQL text.
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      val cols = SparkEntry.queries(name)(spark, sf).columns
      cols.foreach { c =>
        withClue(s"$name column $c not in oracle SQL: ")(
          assert(sql.toLowerCase.contains(c.toLowerCase)))
      }
    }
  }
}
