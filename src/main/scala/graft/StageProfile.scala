package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Stage-level profiler: `runMain graft.StageProfile <name>[,name...] [reps]`
  * runs each query after Bench-style warmup and prints, for the LAST
  * rep, every job/stage with task count and duration — the local
  * stand-in for the Spark UI's stage table (the optimization guide's
  * §1.1 empirical loop; the UI itself is disabled in bench sessions).
  * Diagnostic only; never part of the driver contract. */
object StageProfile {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(',').toSeq
    val reps = if (args.length > 1) args(1).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // the Bench warmup's fixed-cost artifacts
    try graft.operators.Similarity.ivfIndexPath(spark, sfDir) catch { case _: Throwable => }
    try graft.operators.Similarity.warmCodebooks(spark, sfDir) catch { case _: Throwable => }
    try graft.operators.Multimodal.mediaFixturePath(spark, sfDir) catch { case _: Throwable => }
    try graft.operators.Html.htmlFixturePath(spark, sfDir) catch { case _: Throwable => }
    try graft.operators.Dedup.dedupClusters(spark, sfDir).count() catch { case _: Throwable => }
    try graft.operators.Dedup.dedupIndexPath(spark, sfDir) catch { case _: Throwable => }
    try graft.operators.TextAnalysis.bpeMergeList(spark, sfDir) catch { case _: Throwable => }

    case class StageRec(jobId: Int, stageId: Int, nTasks: Int,
      durMs: Long, name: String)
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[StageRec]()
    val jobOfStage = new java.util.concurrent.ConcurrentHashMap[Int, Int]()
    @volatile var record = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        js.stageIds.foreach(s => jobOfStage.put(s, js.jobId))
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        if (record) {
          val si = sc.stageInfo
          val dur = (for {s <- si.submissionTime; c <- si.completionTime}
            yield c - s).getOrElse(-1L)
          stages.add(StageRec(jobOfStage.getOrDefault(si.stageId, -1),
            si.stageId, si.numTasks, dur, si.name.take(60)))
        }
      }
    })

    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      (0 until reps - 1).foreach { _ => try fn(spark, sfDir).count() catch { case _: Throwable => } }
      stages.clear()
      record = true
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val cnt = df.count()
      val wall = (System.nanoTime() - t0) / 1e9
      record = false
      Thread.sleep(200) // let listener drain
      val phases = df.queryExecution.tracker.phases
        .map { case (p, s) => s"$p=${s.endTimeMs - s.startTimeMs}ms" }
        .mkString(" ")
      println(f"[prof] $name wall=$wall%.3f s rows=$cnt  [$phases]")
      import scala.jdk.CollectionConverters._
      val recs = stages.asScala.toSeq.sortBy(r => (r.jobId, r.stageId))
      val totalStage = recs.map(_.durMs).sum
      recs.foreach { r =>
        println(f"[prof]   job=${r.jobId}%3d stage=${r.stageId}%4d tasks=${r.nTasks}%4d ${r.durMs}%6d ms  ${r.name}")
      }
      println(f"[prof]   stage-time sum=${totalStage} ms jobs=${recs.map(_.jobId).distinct.size} stages=${recs.size}")
    }
    spark.stop()
  }
}
