package graft

import org.apache.spark.sql.SparkSession

/** One-query timing harness: `runMain graft.TimeQuery <name> [reps]`
  * times a single registered query at SPARK_GRAFT_SF_DIR after the
  * same warmup discipline as [[Bench]] — the tool for root-causing a
  * single bench line without paying a full suite run. Prints one line
  * per rep plus min/median. */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val reps = if (args.length > 1) args(1).toInt else 5
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    val times = (0 until reps).map { i =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val t = (System.nanoTime() - t0) / 1e9
      println(f"[time] $name rep$i: $t%.3f s")
      t
    }
    val sorted = times.sorted
    println(f"[time] $name min=${sorted.head}%.3f median=${sorted(reps / 2)}%.3f")
    spark.stop()
  }
}
