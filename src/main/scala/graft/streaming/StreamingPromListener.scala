package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.streaming.StreamingQueryListener

/** S18 extended to streaming: a StreamingQueryListener publishing
  * per-query progress gauges in the same Prometheus textfile-collector
  * format (and atomic write-tmp-then-rename protocol,
  * aristoteles.py:111-142) as the batch job's PromMetrics — so the
  * operator watching `aristoteles_status` watches the stream with the
  * same scrape config:
  *
  *   graft_stream_batch_id / input_rows / processed_rows_per_second /
  *   batch_duration_ms{query="<name>"} and graft_stream_active.
  *
  * The textfile collector scrapes a whole-file snapshot, so the
  * listener keeps the LAST progress per query and re-renders
  * everything on each event — a publish that only carried the
  * triggering event would erase every other query's gauges (and the
  * terminate event would erase its own query's final numbers).
  *
  * Listener callbacks run on the streaming listener bus thread — the
  * write must never throw (a listener exception kills metric delivery
  * for every later event), so failures are swallowed after a stderr
  * note. */
class StreamingPromListener(promPath: String) extends StreamingQueryListener {

  private case class Last(batchId: Long, inputRows: Long,
      rowsPerSec: Double, durationMs: Long)

  private val last = new java.util.concurrent.ConcurrentHashMap[String, Last]()
  @volatile private var active: Int = 0

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = {
    active += 1
    publish()
  }

  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = e.progress
    val q = Option(p.name).getOrElse(p.id.toString)
    last.put(q, Last(p.batchId, p.numInputRows, p.processedRowsPerSecond, p.batchDuration))
    publish()
  }

  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = {
    active = math.max(0, active - 1)
    publish()
  }

  private def publish(): Unit =
    try {
      val sb = new StringBuilder
      sb.append("# TYPE graft_stream_active gauge\n")
      sb.append(s"graft_stream_active $active\n")
      def gauge(name: String): Unit = sb.append(s"# TYPE graft_stream_$name gauge\n")
      gauge("batch_id"); gauge("input_rows")
      gauge("processed_rows_per_second"); gauge("batch_duration_ms")
      last.forEach { (q, l) =>
        sb.append(s"""graft_stream_batch_id{query="$q"} ${l.batchId}""").append('\n')
        sb.append(s"""graft_stream_input_rows{query="$q"} ${l.inputRows}""").append('\n')
        sb.append(s"""graft_stream_processed_rows_per_second{query="$q"} ${l.rowsPerSec}""").append('\n')
        sb.append(s"""graft_stream_batch_duration_ms{query="$q"} ${l.durationMs}""").append('\n')
      }
      val p = Paths.get(promPath)
      Option(p.getParent).foreach(Files.createDirectories(_))
      val tmp = Paths.get(promPath + ".new")
      Files.write(tmp, sb.toString.getBytes(StandardCharsets.UTF_8))
      Files.move(tmp, p, StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
    } catch {
      case t: Throwable =>
        System.err.println(s"[graft] stream metrics publish failed: ${t.getMessage}")
    }
}
