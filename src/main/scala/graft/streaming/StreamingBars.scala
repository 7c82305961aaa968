package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import java.sql.Timestamp

/** Latest known tick per symbol (the mapGroupsWithState output shape). */
final case class LatestTick(symbol: String, price: java.math.BigDecimal,
    volume: java.lang.Long, event_time: Timestamp)

/** Always-on streaming variants of the bar/tick derivations — native
  * Structured Streaming with watermarks and keyed state (SURVEY.md §2.7
  * ST2-ST4 as Spark primitives instead of hand-rolled loops).
  *
  * Scale notes: the windowed aggregation shuffles once on
  * (symbol, window) with partial aggregation before the exchange and keyed
  * state in the state store — the same physical shape as the batch bar
  * build, plus incremental state; per-symbol state for [[latestPerSymbol]]
  * is O(distinct symbols).
  */
object StreamingBars {

  /** Streaming 1-minute OHLCV bars: event-time tumbling window + watermark.
    * Emit-on-close (append mode downstream) reproduces the reference's
    * "only completed minutes" rule (aggregator.py:123-127); the watermark
    * delay is the late-data tolerance the reference gets from re-scanning
    * `[wm, now-1m)` every cycle (ST4).
    */
  def bars1m(ticks: DataFrame, lateness: String = "2 minutes"): DataFrame =
    ticks
      .withWatermark("event_time", lateness)
      .groupBy(col("symbol"), window(col("event_time"), "1 minute"))
      .agg(
        min_by(col("price"), col("event_time")).as("open"),
        max(col("price")).as("high"),
        min(col("price")).as("low"),
        max_by(col("price"), col("event_time")).as("close"),
        sum(coalesce(col("volume"), lit(0L))).as("volume_sum"),
        count(lit(1)).as("tick_count"))
      .select(
        col("symbol"), col("window.start").as("bucket_start"),
        col("open"), col("high"), col("low"), col("close"),
        col("volume_sum"), col("tick_count"))

  /** Keyed custom state: the latest tick per symbol, kept current across
    * micro-batches with mapGroupsWithState — the streaming twin of the A8
    * latest-per-key query and of the yfinance producer's cache-fallback
    * (producer_yfinance.py:80-120).
    */
  def latestPerSymbol(ticks: DataFrame): Dataset[LatestTick] = {
    import ticks.sparkSession.implicits._
    ticks
      .select(col("symbol"), col("price").cast("decimal(12,4)").as("price"),
        col("volume"), col("event_time"))
      .as[(String, java.math.BigDecimal, java.lang.Long, Timestamp)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(
        (symbol: String,
         rows: Iterator[(String, java.math.BigDecimal, java.lang.Long, Timestamp)],
         state: GroupState[LatestTick]) => {
          val newest = rows.maxBy(_._4.getTime)
          val best = state.getOption match {
            case Some(prev) if prev.event_time.after(newest._4) => prev
            case _ => LatestTick(symbol, newest._2, newest._3, newest._4)
          }
          state.update(best)
          best
        })
  }

  /** Stream-stream time-interval join: each live tick enriched with the
    * 1-minute bars of its symbol that became AVAILABLE (bucket_start +
    * 1 min, the completed-minute rule) within the last `horizonMinutes`
    * — the streaming twin of the batch as-of context join, as Structured
    * Streaming's canonical two-stream stateful join. Left outer: ticks
    * with no recent completed bar still flow (null bar columns), but —
    * stream-stream outer semantics — only once the watermark proves no
    * matching bar can still arrive.
    *
    * Scale: both sides shuffle once on symbol; the time constraint bounds
    * join state to `horizon + lateness` per side (watermark eviction) —
    * without the interval predicate the bar side would buffer forever.
    */
  def ticksWithRecentBars(ticks: DataFrame, bars: DataFrame,
      horizonMinutes: Int = 5, lateness: String = "1 minute"): DataFrame = {
    val t = ticks.select(col("symbol"), col("event_time"),
        col("price").cast("decimal(12,4)").as("price"))
      .withWatermark("event_time", lateness)
    val b = bars.select(col("symbol").as("bar_symbol"),
        (col("bucket_start") + expr("INTERVAL 1 MINUTE")).as("bar_avail"),
        col("close").as("bar_close"))
      .withWatermark("bar_avail", lateness)
    t.join(b,
      col("symbol") === col("bar_symbol")
        && col("bar_avail") <= col("event_time")
        && col("bar_avail") > col("event_time") - expr(s"INTERVAL $horizonMinutes MINUTES"),
      "leftOuter")
      .select(col("symbol"), col("event_time"), col("price"),
        col("bar_avail"), col("bar_close"))
  }

  /** Streaming funnel progression: a per-user state machine over the
    * live event stream — the streaming twin of the batch `events_funnel`
    * query. State is (stage reached, time of the stage-completing event);
    * each micro-batch's events fold in event-time order, advancing the
    * stage when the NEXT stage's event type arrives strictly after the
    * previous stage's completion (the batch query's min-ts chain computed
    * greedily, which is equivalent when each user's events arrive in
    * event-time order across batches — the kafka-keyed-partition
    * delivery contract; an out-of-order refinement would need the batch
    * replay, which stays the exact form).
    *
    * Scale: keyed state is two fields per user — O(distinct users), the
    * same budget as latestPerSymbol; emission is Update-mode (state
    * refines as users progress).
    */
  def funnelProgress(events: DataFrame,
      stages: Seq[String] = Seq("view", "click", "purchase")): Dataset[FunnelProgress] = {
    import events.sparkSession.implicits._
    val stageArr = stages.toArray
    events
      .select(col("user_id").cast("long"), col("event_type"), col("ts"))
      .as[(Long, String, Timestamp)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(
        (userId: Long, rows: Iterator[(Long, String, Timestamp)],
         state: GroupState[FunnelProgress]) => {
          val init = state.getOption.getOrElse(FunnelProgress(userId, 0, None))
          val next = rows.toSeq.sortBy(_._3.getTime).foldLeft(init) { (st, ev) =>
            if (st.stage < stageArr.length && ev._2 == stageArr(st.stage)
              && st.stage_ts.forall(t => ev._3.after(t)))
              FunnelProgress(userId, st.stage + 1, Some(ev._3))
            else st
          }
          state.update(next)
          next
        })
  }

  /** Convenience sink for tests: run a streaming bars query into an
    * in-memory table. Update mode surfaces bars as they refine (the
    * reference's upsert-visible behavior, S9).
    */
  def startMemorySink(bars: DataFrame, tableName: String) =
    bars.writeStream
      .format("memory")
      .queryName(tableName)
      .outputMode(OutputMode.Update())
      .start()

  /** Streaming gap sessionization with flatMapGroupsWithState + event-time
    * timeout — the streaming twin of the batch `tick_sessions` query.
    *
    * Correctness under allowed lateness: state holds ALL open sessions of
    * the symbol (sorted by start, pairwise ≥ gap apart), and a session is
    * emitted ONLY once the watermark passes `session_end + gap` — at that
    * point no admissible event can extend or re-open it, so emission is
    * final (append-mode safe for any `lateness`, not just 0s). A late
    * event folds into whichever session(s) it touches: it can lower
    * `session_start`, extend `session_end`, or bridge two sessions into
    * one (the merge below collapses the touched run). State is O(open
    * sessions per symbol), bounded by lateness/gap.
    */
  def sessionize(ticks: DataFrame, gapMinutes: Int = 30,
      lateness: String = "0 seconds"): Dataset[TickSession] = {
    import ticks.sparkSession.implicits._
    val gapMs = gapMinutes * 60000L
    ticks
      .withWatermark("event_time", lateness)
      .select(col("symbol"), col("event_time"))
      .as[(String, Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Vector[TickSession], TickSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        (symbol: String, rows: Iterator[(String, Timestamp)],
         state: GroupState[Vector[TickSession]]) => {
          // Fold one event into the sorted session list: sessions within
          // gap of t (strictly — an exact-gap distance starts a new
          // session, matching session_window) collapse with t into one.
          def insert(ss: Vector[TickSession], t: Long): Vector[TickSession] = {
            val before = ss.filter(s => t - s.session_end.getTime >= gapMs)
            val after  = ss.filter(s => s.session_start.getTime - t >= gapMs)
            val touched = ss.filterNot(s =>
              t - s.session_end.getTime >= gapMs || s.session_start.getTime - t >= gapMs)
            val start = (t +: touched.map(_.session_start.getTime)).min
            val end   = (t +: touched.map(_.session_end.getTime)).max
            val n     = touched.map(_.n_ticks).sum + 1
            (before :+ TickSession(symbol, new Timestamp(start), new Timestamp(end), n)) ++ after
          }
          val wm = state.getCurrentWatermarkMs()
          val merged = rows.map(_._2.getTime).toSeq.sorted
            .foldLeft(state.getOption.getOrElse(Vector.empty))(insert)
          // closed = unreachable by any future (≥ watermark) event
          val (closed, open) = merged.partition(_.session_end.getTime + gapMs <= wm)
          if (open.isEmpty) state.remove()
          else {
            state.update(open)
            state.setTimeoutTimestamp(open.map(_.session_end.getTime).min + gapMs)
          }
          closed.iterator
        })
  }
}

/** A per-symbol activity session (see [[StreamingBars.sessionize]]). */
final case class TickSession(symbol: String, session_start: Timestamp,
    session_end: Timestamp, n_ticks: Long)

/** Per-user funnel state (see [[StreamingBars.funnelProgress]]): how many
  * ordered stages the user has completed and when the last one closed.
  */
final case class FunnelProgress(user_id: Long, stage: Int,
    stage_ts: Option[Timestamp])
