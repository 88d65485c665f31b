package graft

import org.apache.spark.sql.SparkSession

/** Plan-capture harness: `runMain graft.PlanDump <outDir> <suffix> <name>[,name...]`
  * writes each query's `.explain("formatted")` output to
  * `<outDir>/<name>_<suffix>.txt` — the evidence file the optimization
  * rounds commit (plans/rNN/<query>_before.txt / _after.txt) so plan
  * claims (Exchange counts, join strategies, PushedFilters) are
  * checkable without running Spark. Uses the same session config as
  * Bench so the captured plan is the benched plan. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names: Seq[String] =
      if (args.length > 2 && args(2) != "all") args(2).split(',').toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { name =>
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"),
          plan.getBytes("UTF-8"))
        println(s"[plandump] wrote $name")
      } catch { case e: Throwable =>
        println(s"[plandump] $name failed: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
