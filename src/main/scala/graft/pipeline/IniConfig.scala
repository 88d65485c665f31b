package graft.pipeline

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** S19 — configobj-style INI parsing (aristoteles.py:191-227) with the
  * same validation contract: required top-level `state_path`,
  * `instrument`, `archive`; one section per station with required
  * `db_path` and optional longitude/latitude/description. No external
  * dependency (offline resolver), just the subset of INI the reference
  * uses. */
object IniConfig {

  case class ParseError(msg: String) extends Exception(msg)

  def parse(lines: Seq[String]): (Map[String, String], Map[String, Map[String, String]]) = {
    var section: Option[String] = None
    val top = scala.collection.mutable.LinkedHashMap[String, String]()
    val sections = scala.collection.mutable.LinkedHashMap[String, scala.collection.mutable.LinkedHashMap[String, String]]()
    lines.map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#") && !l.startsWith(";")).foreach {
      case l if l.startsWith("[") && l.endsWith("]") =>
        val name = l.substring(1, l.length - 1).trim
        section = Some(name)
        sections.getOrElseUpdate(name, scala.collection.mutable.LinkedHashMap())
      case l if l.contains("=") =>
        val Array(k, v) = l.split("=", 2)
        val key = k.trim
        val value = v.trim.stripPrefix("\"").stripSuffix("\"")
        section match {
          case Some(s) => sections(s)(key) = value
          case None => top(key) = value
        }
      case l => throw ParseError(s"unparsable config line: $l")
    }
    (top.toMap, sections.map { case (k, v) => k -> v.toMap }.toMap)
  }

  /** Load + validate into a JobConfig (validation mirrors :196-227). */
  def load(path: String): ArchiveJob.JobConfig = {
    val (top, sections) = parse(Files.readAllLines(Paths.get(path)).asScala.toSeq)
    def req(k: String): String =
      top.getOrElse(k, throw ParseError(s"missing required config key: $k"))
    def dbl(name: String, k: String, v: String): Double =
      v.toDoubleOption.getOrElse(throw ParseError(
        s"station $name: $k must be a number, got: $v"))
    val stations = sections.map { case (name, kv) =>
      ArchiveJob.StationSource(
        name = name,
        path = kv.getOrElse("db_path", throw ParseError(s"station $name missing db_path")),
        longitude = kv.get("longitude").map(dbl(name, "longitude", _)),
        latitude = kv.get("latitude").map(dbl(name, "latitude", _)),
        description = kv.get("description"))
    }.toSeq
    if (stations.isEmpty) throw ParseError("config has no station sections")
    stations.foreach { st =>
      if (!Files.exists(Paths.get(st.path)))
        throw ParseError(s"station ${st.name}: unreadable db_path ${st.path}")
    }
    val fmt = top.getOrElse("sink_format", "parquet")
    if (!Seq("parquet", "orc", "commitlog").contains(fmt))
      throw ParseError(s"sink_format must be parquet, orc, or commitlog, got: $fmt")
    ArchiveJob.JobConfig(
      statePath = req("state_path"),
      archivePath = req("archive"),
      instrument = req("instrument"),
      stations = stations,
      metricsPath = top.get("netfc_path").map(_ + "/aristoteles.prom"),
      sinkFormat = fmt)
  }
}
