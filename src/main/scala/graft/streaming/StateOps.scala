package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._

/** Symbol-silence alert emitted when a symbol's tick stream goes quiet
  * for longer than the configured gap (event time).
  */
case class QuiescenceAlert(symbol: String, last_event_time: java.sql.Timestamp,
    silent_ms: Long)

/** Per-symbol quiescence detector on the `transformWithState` API (the
  * arbitrary-stateful-processing successor to mapGroupsWithState, Spark
  * 4): every tick advances a per-key `lastSeen` ValueState and re-arms an
  * EVENT-TIME timer at `lastSeen + gapMs`; if no newer tick arrives
  * before the watermark passes that deadline, [[handleExpiredTimer]]
  * fires exactly once with the silence span. This is the alert the
  * reference's health endpoint approximates by polling freshness
  * (`services/api/app/routers/health.py`) — here it is push-based,
  * exactly-once, and driven by the stream itself.
  *
  * Why transformWithState rather than flatMapGroupsWithState (which
  * [[StreamingBars.sessionize]] demonstrates): named state variables
  * with independent lifetimes, first-class timer registration/deletion
  * (the re-arm below is an explicit deleteTimer+registerTimer), and
  * native TTL support — the API surface a production state machine
  * needs. Requires the RocksDB state store provider
  * ([[StateOps.quiescenceAlerts]] documents the session conf).
  *
  * Scale: state is one long per live symbol plus one pending timer —
  * O(distinct keys); timers are watermark-driven so a dead symbol emits
  * one alert and holds no further timers until it speaks again.
  */
class SymbolQuiescence(gapMs: Long)
    extends StatefulProcessor[String, (String, java.sql.Timestamp), QuiescenceAlert] {

  @transient private var lastSeen: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    lastSeen = getHandle.getValueState[Long]("lastSeen", Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(key: String,
      rows: Iterator[(String, java.sql.Timestamp)],
      tv: TimerValues): Iterator[QuiescenceAlert] = {
    val maxTs = rows.map(_._2.getTime).max
    val prev  = if (lastSeen.exists()) lastSeen.get() else Long.MinValue
    if (maxTs > prev) {
      if (prev != Long.MinValue) getHandle.deleteTimer(prev + gapMs)
      lastSeen.update(maxTs)
      getHandle.registerTimer(maxTs + gapMs)
    }
    Iterator.empty
  }

  override def handleExpiredTimer(key: String, tv: TimerValues,
      info: ExpiredTimerInfo): Iterator[QuiescenceAlert] = {
    val last = lastSeen.get()
    // a timer re-armed in the same batch as its own expiry can still fire
    // stale; emit only for the CURRENT deadline
    if (info.getExpiryTimeInMs == last + gapMs)
      Iterator.single(QuiescenceAlert(key, new java.sql.Timestamp(last),
        info.getExpiryTimeInMs - last))
    else Iterator.empty
  }
}

object StateOps {

  /** Wire the quiescence detector over a (symbol, event_time, …) tick
    * stream. The session MUST run the RocksDB state store —
    * `spark.sql.streaming.stateStore.providerClass =
    * org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider`
    * — transformWithState does not support the default HDFS-backed store.
    * `lateness` bounds how out-of-order a tick may arrive and still count
    * as activity; the watermark it produces is what fires the timers.
    */
  def quiescenceAlerts(ticks: DataFrame, gapMs: Long = 60000L,
      lateness: String = "1 minute"): Dataset[QuiescenceAlert] = {
    val spark = ticks.sparkSession
    import spark.implicits._
    ticks
      .withWatermark("event_time", lateness)
      .select(col("symbol"), col("event_time"))
      .as[(String, java.sql.Timestamp)]
      .groupByKey(_._1)
      .transformWithState(new SymbolQuiescence(gapMs),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
