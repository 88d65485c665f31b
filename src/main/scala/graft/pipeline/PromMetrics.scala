package graft.pipeline

import java.nio.file.{Files, Paths, StandardCopyOption}

/** S18 — operational metrics in Prometheus textfile-collector format
  * (aristoteles.py:20-27, :95-145): six gauges with HELP/TYPE headers,
  * the per-station label on samples_yesterday, and the atomic
  * write-tmp-then-rename protocol of :141-142.
  */
object PromMetrics {

  private val help = Map(
    "status" -> "Run status: 0=ok nothing to do, 1=ok days written, 2=blocked by completeness gate, 3=error",
    "report_time" -> "Unix time of the report",
    "days_written" -> "Days written by the last run",
    "yesterday" -> "Yesterday as YYYYMMDD",
    "first_day" -> "First day pending as YYYYMMDD",
    "samples_yesterday" -> "Sample count for yesterday, per station")

  case class Snapshot(
      status: Long,
      reportTime: Long,
      daysWritten: Long,
      yesterday: Long,
      firstDay: Long,
      samplesYesterday: Map[String, Long])

  def render(s: Snapshot): String = {
    val sb = new StringBuilder
    def gauge(name: String, value: Long, labels: String = ""): Unit = {
      sb.append(s"# HELP aristoteles_$name ${help(name)}\n")
      sb.append(s"# TYPE aristoteles_$name gauge\n")
      sb.append(s"aristoteles_$name$labels $value\n")
    }
    gauge("status", s.status)
    gauge("report_time", s.reportTime)
    gauge("days_written", s.daysWritten)
    gauge("yesterday", s.yesterday)
    gauge("first_day", s.firstDay)
    sb.append(s"# HELP aristoteles_samples_yesterday ${help("samples_yesterday")}\n")
    sb.append(s"# TYPE aristoteles_samples_yesterday gauge\n")
    s.samplesYesterday.toSeq.sortBy(_._1).foreach { case (station, n) =>
      // escaped like the streaming listener's labels: a quote or
      // backslash in a station name must not produce an unparseable
      // exposition line (which would blind the collector to ALL gauges)
      val lbl = escapeLabel(station)
      sb.append(s"""aristoteles_samples_yesterday{station="$lbl"} $n\n""")
    }
    sb.toString
  }

  /** Atomic publish: write `<path>.new`, rename over `<path>`
    * (aristoteles.py:141-142). */
  def write(path: String, s: Snapshot): Unit =
    publishAtomic(path, render(s))

  /** The shared atomicity-critical publish protocol (also used by the
    * streaming listener): parent mkdir, write tmp, atomic rename. The
    * tmp name is fixed per target path, so concurrent publishers of
    * the SAME path must serialize externally. */
  def publishAtomic(path: String, text: String): Unit = {
    val p = Paths.get(path)
    Option(p.getParent).foreach(Files.createDirectories(_))
    val tmp = Paths.get(path + ".new")
    Files.writeString(tmp, text)
    Files.move(tmp, p, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Prometheus label-value escaping: backslash, quote, newline. */
  def escapeLabel(v: String): String =
    v.flatMap {
      case '\\' => "\\\\"
      case '"' => "\\\""
      case '\n' => "\\n"
      case c => c.toString
    }
}
