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
    val count  = new LongAdder
    val errors = new LongAdder
    private val buf = new Array[Long](Window)
    private var n   = 0L
    def record(durationNs: Long): Unit = synchronized {
      buf((n % Window).toInt) = durationNs
      n += 1
      count.increment()
    }
    def recent: Array[Long] = synchronized {
      val m = math.min(n, Window.toLong).toInt
      buf.take(m).sorted
    }
  }

  private val rings = new ConcurrentHashMap[String, Ring]()

  private def ring(label: String): Ring =
    rings.computeIfAbsent(label, _ => new Ring)

  private[api] def record(label: String, durationNs: Long): Unit =
    ring(label).record(durationNs)

  private[api] def recordError(label: String): Unit =
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
