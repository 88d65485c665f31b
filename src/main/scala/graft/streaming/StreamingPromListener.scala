package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.streaming.StreamingQueryListener

import graft.pipeline.PromMetrics

/** S18 extended to streaming: a StreamingQueryListener publishing
  * per-query progress gauges in the same Prometheus textfile-collector
  * format (and atomic write-tmp-then-rename protocol,
  * aristoteles.py:111-142 — shared via PromMetrics.publishAtomic) as
  * the batch job, so one scrape config watches both modes:
  *
  *   graft_stream_batch_id / input_rows / processed_rows_per_second /
  *   batch_duration_ms{query="<name>"} and graft_stream_active.
  *
  * Concurrency: started events fire synchronously on the caller's
  * thread while progress/termination arrive on the async listener
  * bus, so the active counter is atomic and publish() is synchronized
  * (the shared tmp file is per-target-path). The textfile collector
  * scrapes a whole-file snapshot, so the listener keeps the LAST
  * progress per query and re-renders everything on each event;
  * retained queries are capped (oldest evicted) so ad-hoc unnamed
  * queries can't grow the file without bound. Query names are
  * user-controlled and get label-escaped — one exotic name must not
  * make the exposition file unparseable. Callbacks must never throw
  * (an exception kills delivery for every later event), so failures
  * are swallowed after a stderr note. */
class StreamingPromListener(promPath: String, maxQueries: Int = 64)
    extends StreamingQueryListener {

  private case class Last(batchId: Long, inputRows: Long,
      rowsPerSec: Double, durationMs: Long)

  // access-ordered LRU with eviction at maxQueries, guarded by `this`
  private val last = new java.util.LinkedHashMap[String, Last](16, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[String, Last]): Boolean =
      size() > maxQueries
  }
  private val active = new AtomicInteger(0)

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = {
    active.incrementAndGet()
    publish()
  }

  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = e.progress
    val q = Option(p.name).getOrElse(p.id.toString)
    synchronized {
      last.put(q, Last(p.batchId, p.numInputRows, p.processedRowsPerSecond, p.batchDuration))
    }
    publish()
  }

  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = {
    active.updateAndGet(n => math.max(0, n - 1))
    publish()
  }

  private def publish(): Unit = synchronized {
    try {
      val sb = new StringBuilder
      sb.append("# TYPE graft_stream_active gauge\n")
      sb.append(s"graft_stream_active ${active.get()}\n")
      // Prometheus text format requires all lines of one metric family
      // to form a single group after its TYPE line — emit family by
      // family (strict parsers like promtool reject interleaving)
      def family(name: String)(value: Last => String): Unit = {
        sb.append(s"# TYPE graft_stream_$name gauge\n")
        last.forEach { (q, l) =>
          val lbl = PromMetrics.escapeLabel(q)
          sb.append(s"""graft_stream_$name{query="$lbl"} ${value(l)}""").append('\n')
        }
      }
      family("batch_id")(_.batchId.toString)
      family("input_rows")(_.inputRows.toString)
      family("processed_rows_per_second")(_.rowsPerSec.toString)
      family("batch_duration_ms")(_.durationMs.toString)
      PromMetrics.publishAtomic(promPath, sb.toString)
    } catch {
      case t: Throwable =>
        System.err.println(s"[graft] stream metrics publish failed: ${t.getMessage}")
    }
  }
}
