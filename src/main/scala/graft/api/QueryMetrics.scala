package graft.api

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.LongAdder

/** Query-level latency metrics — the engine-side analog of the reference
  * API's Prometheus instrumentation (services/api/app/main.py:47-67, which
  * exposes per-endpoint p50/p95/p99 request histograms).
  *
  * Two capture paths:
  *  - [[QueryMetrics.time]] instruments a named query (the "endpoint"
  *    label) around any action;
  *  - the [[QueryExecutionListener]] registered by [[QueryMetrics.attach]]
  *    records every action on the session under its action name, so
  *    un-instrumented queries still surface.
  *
  * Implementation: a bounded ring of recent durations per label (latest
  * [[QueryMetrics.Window]] observations), O(1) memory per label, driver-
  * side only — the executors never see this. Quantiles are computed over
  * the ring at read time (`snapshot`), the same sliding-window semantics a
  * scrape of the reference's histogram gives.
  */
final class QueryMetrics private () extends QueryExecutionListener {

  import QueryMetrics.Window

  private final class Ring {
    val count   = new LongAdder
    val errors  = new LongAdder
    val totalNs = new LongAdder // lifetime sum, for the Prometheus _sum series
    private val buf = new Array[Long](Window)
    private var n   = 0L
    def record(durationNs: Long): Unit = synchronized {
      buf((n % Window).toInt) = durationNs
      n += 1
      count.increment()
      totalNs.add(durationNs)
    }
    def recent: Array[Long] = synchronized {
      val m = math.min(n, Window.toLong).toInt
      buf.take(m).sorted
    }
  }

  private val rings = new ConcurrentHashMap[String, Ring]()

  private def ring(label: String): Ring =
    rings.computeIfAbsent(label, _ => new Ring)

  /** Record one observation under a label (public for callers that time
    * work themselves; [[QueryMetrics.time]] wraps this).
    */
  def record(label: String, durationNs: Long): Unit =
    ring(label).record(durationNs)

  def recordError(label: String): Unit =
    ring(label).errors.increment()

  override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
    record(s"action:$funcName", durationNs)

  override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit =
    recordError(s"action:$funcName")

  /** (label, count, errors, p50 ms, p95 ms, max ms) over the recent
    * window, sorted by label.
    */
  def snapshot(): Seq[(String, Long, Long, Double, Double, Double)] = {
    import scala.jdk.CollectionConverters._
    rings.asScala.toSeq.sortBy(_._1).map { case (label, r) =>
      val recent = r.recent
      def q(p: Double): Double =
        if (recent.isEmpty) 0.0
        else recent(math.min(recent.length - 1, (p * recent.length).toInt)) / 1e6
      (label, r.count.sum(), r.errors.sum(), q(0.50), q(0.95),
        if (recent.isEmpty) 0.0 else recent.last / 1e6)
    }
  }

  /** Prometheus text exposition (format 0.0.4) of the current metrics —
    * the `/metrics` endpoint body, mirroring the reference's
    * instrumentator exposition (services/api/app/main.py:67): one summary
    * family with per-label quantile series plus `_count`/`_sum`, a max
    * gauge, and an error counter. Durations are exposed in seconds per
    * Prometheus base-unit convention.
    */
  def prometheusText(): String = {
    import scala.jdk.CollectionConverters._
    def esc(s: String): String =
      s.flatMap {
        case '\\' => "\\\\"
        case '"'  => "\\\""
        case '\n' => "\\n"
        case c    => c.toString
      }
    val sb = new StringBuilder
    sb.append("# HELP graft_query_duration_seconds Query latency over the recent window\n")
    sb.append("# TYPE graft_query_duration_seconds summary\n")
    val rows = rings.asScala.toSeq.sortBy(_._1)
    rows.foreach { case (label, r) =>
      val recent = r.recent
      def q(p: Double): Double =
        if (recent.isEmpty) 0.0
        else recent(math.min(recent.length - 1, (p * recent.length).toInt)) / 1e9
      val l = esc(label)
      sb.append(s"""graft_query_duration_seconds{query="$l",quantile="0.5"} ${q(0.50)}""" + "\n")
      sb.append(s"""graft_query_duration_seconds{query="$l",quantile="0.95"} ${q(0.95)}""" + "\n")
      sb.append(s"""graft_query_duration_seconds_count{query="$l"} ${r.count.sum()}""" + "\n")
      sb.append(s"""graft_query_duration_seconds_sum{query="$l"} ${r.totalNs.sum() / 1e9}""" + "\n")
    }
    sb.append("# HELP graft_query_duration_seconds_max Max latency in the recent window\n")
    sb.append("# TYPE graft_query_duration_seconds_max gauge\n")
    rows.foreach { case (label, r) =>
      val recent = r.recent
      val mx = if (recent.isEmpty) 0.0 else recent.last / 1e9
      sb.append(s"""graft_query_duration_seconds_max{query="${esc(label)}"} $mx""" + "\n")
    }
    sb.append("# HELP graft_query_errors_total Failed query executions\n")
    sb.append("# TYPE graft_query_errors_total counter\n")
    rows.foreach { case (label, r) =>
      sb.append(s"""graft_query_errors_total{query="${esc(label)}"} ${r.errors.sum()}""" + "\n")
    }
    sb.toString
  }
}

object QueryMetrics {

  /** Ring size per label: quantiles reflect the latest 1024 observations. */
  val Window = 1024

  /** Register a listener on the session and return the handle. */
  def attach(spark: SparkSession): QueryMetrics = {
    val m = new QueryMetrics
    spark.listenerManager.register(m)
    m
  }

  /** Instrument one named query around any driver-side action; failures
    * count toward the label's error counter and rethrow.
    */
  def time[T](metrics: QueryMetrics, label: String)(action: => T): T = {
    val t0 = System.nanoTime()
    try {
      val out = action
      metrics.record(label, System.nanoTime() - t0)
      out
    } catch {
      case e: Throwable =>
        metrics.recordError(label)
        throw e
    }
  }
}
