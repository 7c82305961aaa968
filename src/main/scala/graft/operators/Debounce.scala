package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-key event debouncing (rate limiting): keep an event only if at
  * least [[GapSec]] seconds have passed since the PREVIOUSLY KEPT event
  * of the same user — "at most one alert per user per window", the
  * throttle every notification/alerting pipeline runs.
  *
  * Why this is not a window function: the keep decision depends on the
  * last KEPT timestamp, not the last event — a non-associative prefix
  * scan (session windows split on raw inter-event gaps and give a
  * DIFFERENT answer: events at t=0, 30, 61 s with a 60 s gap debounce to
  * {0, 61} but sessionize to one session starting at 0). No composition
  * of lag/sum/min windows expresses it, which makes this the one batch
  * operator in the repo on the SURVEY §7.3 tier-(d) path: repartition by
  * user_id + sortWithinPartitions(user, ts, event_id) + ONE
  * `mapPartitions` streaming pass holding O(1) state (current user, last
  * kept ts) — exactly [[graft.plans.AsofJoin]]'s execution shape without
  * the custom plan node, because here a single ordered input stream
  * suffices. The streaming twin is a `mapGroupsWithState` keyed state
  * machine ([[graft.streaming.StreamingBars.funnelProgress]] pattern).
  *
  * Scale (100 TB): one hash exchange on user_id + per-partition sort;
  * state is two longs regardless of user activity; output order is the
  * one presentation sort every entry pays. Determinism: the (ts,
  * event_id) ordering rule (the SCD2 ordering law) makes the kept chain
  * unique under same-timestamp ties; comparisons run on exact
  * microsecond integers in both engines.
  */
object Debounce {

  private[graft] val GapSec = 21600L // 6 hours

  /** public: Spark's encoder codegen must construct it */
  case class Ev(user_id: Long, event_id: Long, tsu: Long, event_type: String)

  def eventsDebounce(spark: SparkSession, dir: String): DataFrame =
    eventsDebounceOn(Tables.events(spark, dir), GapSec)

  private[graft] def eventsDebounceOn(events: DataFrame, gapSec: Long): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMicros = gapSec * 1000000L
    val kept = events
      .select(col("user_id").cast("long").as("user_id"),
        col("event_id").cast("long").as("event_id"),
        // events.ts is TIMESTAMP_NTZ; the session runs UTC, so the
        // NTZ -> TZ cast here (and the inverse at the output edge) is a
        // lossless microsecond round-trip
        unix_micros(col("ts").cast("timestamp")).as("tsu"), col("event_type"))
      .as[Ev]
      .repartition(col("user_id"))
      .sortWithinPartitions(col("user_id"), col("tsu"), col("event_id"))
      .mapPartitions { it =>
        var curUser  = 0L
        var lastKept = 0L
        var started  = false
        it.flatMap { e =>
          if (!started || e.user_id != curUser) {
            started = true; curUser = e.user_id; lastKept = e.tsu
            Iterator.single(e)
          } else if (e.tsu >= lastKept + gapMicros) {
            lastKept = e.tsu
            Iterator.single(e)
          } else Iterator.empty
        }
      }
    kept.toDF()
      .select(col("user_id"), col("event_id"),
        timestamp_micros(col("tsu")).cast("timestamp_ntz").as("ts"), col("event_type"))
      .orderBy("user_id", "ts", "event_id")
  }

  /** DuckDB twin: the sequential kept-chain as a recursive CTE stepping
    * one event per user per iteration (depth = max events/user).
    */
  val eventsDebounceSql: String =
    """WITH RECURSIVE ev AS (
      |  SELECT user_id, event_id, ts, event_type,
      |         row_number() OVER (PARTITION BY user_id
      |                            ORDER BY ts, event_id) AS rn
      |  FROM events),
      |walk AS (
      |  SELECT user_id, rn, event_id, ts, event_type,
      |         TRUE AS kept, ts AS last_kept
      |  FROM ev WHERE rn = 1
      |  UNION ALL
      |  SELECT e.user_id, e.rn, e.event_id, e.ts, e.event_type,
      |         e.ts >= w.last_kept + INTERVAL 6 HOUR,
      |         CASE WHEN e.ts >= w.last_kept + INTERVAL 6 HOUR
      |              THEN e.ts ELSE w.last_kept END
      |  FROM walk w JOIN ev e ON e.user_id = w.user_id AND e.rn = w.rn + 1)
      |SELECT user_id, event_id, ts, event_type FROM walk WHERE kept
      |ORDER BY user_id, ts, event_id""".stripMargin

  val registry: Map[String, ((SparkSession, String) => DataFrame, String)] = Map(
    "events_debounce" -> (eventsDebounce _, eventsDebounceSql))
}
