package graft.pipeline

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path

/** Acquisition metadata sidecar — the parquet-archive equivalent of the
  * reference's HDF5 root attributes (aristoteles/aristoteles.py:393-402)
  * and per-station group attributes (:443-458), written as one
  * `_acquisition.json` in each monthly acquisition partition
  * (`archive/month=YYYYMM/`). The acquisition name keeps the
  * reference's `<monthstart>Z_<instrument>_weather` convention
  * (:373-375), so a consumer of the old layout can map acq -> month
  * partition one-to-one.
  *
  * Divergences, by necessity of the medium: JSON has no NaN, so absent
  * longitude/latitude are `null` (HDF5 stored NaN); per-column units
  * metadata additionally lives on the parquet schema itself
  * (WviewSchema field metadata), the sidecar copy is for humans and
  * non-Spark readers. Dot-underscore naming keeps Spark's parquet
  * reader from treating the sidecar as data.
  */
object AcqMetadata {

  val GitVersionTag = "graft-0.2.0"
  val ArchiveVersion = "4.0.0" // reference aristoteles.py:17

  private def esc(s: String): String =
    s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"
      case '\n' => "\\n"; case '\r' => "\\r"; case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
  private def jStr(s: String): String = "\"" + esc(s) + "\""
  private def jNum(d: Option[Double]): String =
    d.filterNot(x => x.isNaN || x.isInfinite).map(_.toString).getOrElse("null")

  /** The reference's acq naming (:373-375): month start as
    * YYYYMMDDTHHmmss + "Z_<instrument>_weather". */
  def acqName(month: String, instrument: String): String =
    s"${month}01T000000Z_${instrument}_weather"

  def render(cfg: ArchiveJob.JobConfig, month: String): String = {
    val stations = cfg.stations.map { st =>
      s"""    ${jStr(st.name)}: {
         |      "wview_database": ${jStr(st.path)},
         |      "longitude": ${jNum(st.longitude)},
         |      "latitude": ${jNum(st.latitude)},
         |      "description": ${jStr(st.description.getOrElse(""))}
         |    }""".stripMargin
    }.mkString(",\n")
    val columns = WviewSchema.sensors.map { case (name, phys) =>
      s"""    ${jStr(name)}: { "units": ${jStr(graft.functions.UnitConversions.units(phys))}, "physical_type": ${jStr(phys)} }"""
    }.mkString(",\n")
    s"""{
       |  "git_version_tag": ${jStr(GitVersionTag)},
       |  "system_user": ${jStr(sys.props.getOrElse("user.name", ""))},
       |  "collection_server": ${jStr(java.net.InetAddress.getLocalHost.getHostName)},
       |  "instrument_name": ${jStr(cfg.instrument)},
       |  "archive_version": ${jStr(ArchiveVersion)},
       |  "acquisition_name": ${jStr(acqName(month, cfg.instrument))},
       |  "acquisition_type": "weather",
       |  "stations": {
       |$stations
       |  },
       |  "columns": {
       |$columns
       |  }
       |}
       |""".stripMargin
  }

  /** Idempotently (over)write the sidecar for each month partition.
    * Hadoop FS with the caller's SESSION configuration — a bare
    * Configuration would drop spark.hadoop.* settings (s3a
    * credentials, defaultFS) and fail exactly on the remote
    * filesystems this supports; an explicit parameter rather than
    * SparkSession.active so a scheduler thread without a thread-local
    * session can still call it. Tiny driver-side writes, one per month
    * touched. */
  def write(cfg: ArchiveJob.JobConfig, months: Iterable[String],
      conf: org.apache.hadoop.conf.Configuration): Unit = {
    months.foreach { m =>
      val dir = new Path(s"${cfg.archivePath}/month=$m")
      val fs = dir.getFileSystem(conf)
      fs.mkdirs(dir)
      val out = fs.create(new Path(dir, "_acquisition.json"), true)
      try out.write(render(cfg, m).getBytes(StandardCharsets.UTF_8))
      finally out.close()
    }
  }
}
