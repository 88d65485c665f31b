package graft

import org.apache.spark.sql.SparkSession

/** Decoder inner-loop profiler: `runMain graft.DecodeProfile [reps]`
  * collects the media fixture's jpeg/color-jpeg/gzip slices and times
  * the STATIC decode entry points (JpegPixels.parse, GzipMeta.parse)
  * in a driver-side loop — the per-byte CPU floor of the mm_ decode
  * family, isolated from Spark scheduling (optimization guide §1.2
  * step 2: measure the per-task work before touching it). Diagnostic
  * only; never part of the driver contract. */
object DecodeProfile {
  def main(args: Array[String]): Unit = {
    val reps = if (args.length > 0) args(0).toInt else 20
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fix = graft.operators.Multimodal.mediaFixturePath(spark, sfDir)

    def bytesOf(kind: String): Array[Array[Byte]] =
      spark.read.parquet(s"$fix/$kind").collect()
        .map(r => r.getAs[Array[Byte]](1)).filter(_ != null)

    def time(label: String, payloads: Array[Array[Byte]])(f: Array[Byte] => AnyRef): Unit = {
      val total = payloads.map(_.length.toLong).sum
      var best = Double.MaxValue
      var decoded = 0
      (0 until reps).foreach { _ =>
        val t0 = System.nanoTime()
        var i = 0
        var ok = 0
        while (i < payloads.length) {
          if (f(payloads(i)) != null) ok += 1
          i += 1
        }
        decoded = ok
        val dt = (System.nanoTime() - t0) / 1e9
        if (dt < best) best = dt
      }
      println(f"[decprof] $label%-14s n=${payloads.length}%5d ok=$decoded%5d " +
        f"bytes=$total%9d best=${best * 1000}%8.1f ms  ${total / best / 1e6}%7.1f MB/s  " +
        f"${best * 1e9 / math.max(1, total)}%6.2f ns/B")
    }

    Seq("jpgpx", "jpgcol", "jpgprog").foreach { k =>
      try time(k, bytesOf(k))(graft.plans.JpegPixels.parse)
      catch { case e: Throwable => println(s"[decprof] $k skipped: ${e.getMessage}") }
    }
    try time("gzip", bytesOf("gzip"))(graft.plans.GzipMeta.parse)
    catch { case e: Throwable => println(s"[decprof] gzip skipped: ${e.getMessage}") }
    spark.stop()
  }
}
