package graft.streaming

import graft.operators.Debounce
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A kept (debounced) event — [[DebounceStream.debounced]]'s output row. */
case class DebouncedEvent(user_id: Long, event_id: Long, tsu: Long,
    event_type: String)

/** Streaming twin of the batch [[graft.operators.Debounce]] throttle: one
  * `flatMapGroupsWithState` state machine per user carrying the LAST KEPT
  * timestamp (one long) across micro-batches. Within each batch a user's
  * events are processed in (ts, event_id) order — the batch operator's
  * ordering law — so under in-order per-key delivery (the reference's
  * per-partition ordering contract, SURVEY §2 ST6) the streamed kept set
  * equals the batch operator on the concatenated stream EXACTLY, for any
  * batch boundaries (spec law).
  *
  * Out-of-order and duplicate delivery get ALERTING semantics, the
  * honest behavior for a throttle: anything not at least one full gap
  * NEWER than the newest kept timestamp is suppressed — every in-gap
  * event and every late arrival older than the last kept event alike —
  * erring on the quiet side,
  * and a REPLAYED kept event is suppressed too (its ts sits inside the
  * gap from itself), so at-least-once upstream delivery cannot
  * double-fire an alert downstream. Both behaviors are spec-pinned.
  *
  * Scale: state is ONE long per active user regardless of activity;
  * each micro-batch shuffles once on user_id. The sort is per (user,
  * batch) — bounded by per-user batch volume, never corpus-global.
  */
object DebounceStream {

  def debounced(events: DataFrame,
      gapSec: Long = Debounce.GapSec): Dataset[DebouncedEvent] = {
    import events.sparkSession.implicits._
    val gapMicros = gapSec * 1000000L
    events
      .select(col("user_id").cast("long"), col("event_id").cast("long"),
        unix_micros(col("ts").cast("timestamp")).as("tsu"), col("event_type"))
      .as[(Long, Long, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Long, DebouncedEvent](
        OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (user: Long, rows: Iterator[(Long, Long, Long, String)],
         state: GroupState[Long]) => {
          var lastKept = state.getOption.getOrElse(Long.MinValue)
          val kept = rows.toSeq.sortBy(e => (e._3, e._2)).flatMap { e =>
            if (lastKept == Long.MinValue || e._3 >= lastKept + gapMicros) {
              lastKept = e._3
              Some(DebouncedEvent(user, e._2, e._3, e._4))
            } else None
          }
          if (lastKept != Long.MinValue) state.update(lastKept)
          kept.iterator
        })
  }
}
