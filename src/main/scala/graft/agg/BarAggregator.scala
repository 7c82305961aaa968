package graft.agg

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The core OHLCV bar build — the reference's AGGREGATE_SQL
  * (services/aggregator/aggregator.py:26-39) as a pure DataFrame
  * transform.
  *
  * Spark-first shape: one hash aggregate with map-side partial
  * aggregation; `min_by`/`max_by` replace the reference's
  * `(array_agg(price ORDER BY event_time))[1]` idiom (aggregator.py:30,33)
  * without any sort or UDAF. At 100 TB this is a single shuffle keyed on
  * (symbol, minute) — the natural partitioning for every downstream bar
  * query — and every aggregate here is a partial-aggregable builtin, so
  * the shuffle carries one row per (symbol, minute) per map task, not raw
  * ticks.
  */
object BarAggregator {

  /** Tie-break note: ticks carry globally unique event_time in the harness
    * data; for real data an explicit struct(event_time, tick_id) key makes
    * open/close deterministic under equal timestamps (SURVEY.md §7.4).
    */
  def bars1m(ticks: DataFrame): DataFrame =
    barsOf(ticks, "1 minute")

  /** Generalized tumbling-bucket OHLCV roll-up (minute/hour/day). */
  def barsOf(ticks: DataFrame, bucket: String): DataFrame = {
    val truncUnit = bucket match {
      case "1 minute" => "minute"
      case "1 hour"   => "hour"
      case "1 day"    => "day"
      case other      => throw new IllegalArgumentException(s"unsupported bucket: $other")
    }
    ticks
      .groupBy(col("symbol"), date_trunc(truncUnit, col("event_time")).as("bucket_start"))
      .agg(
        min_by(col("price"), col("event_time")).as("open"),
        max(col("price")).as("high"),
        min(col("price")).as("low"),
        max_by(col("price"), col("event_time")).as("close"),
        sum(coalesce(col("volume"), lit(0L))).as("volume_sum"),
        count(lit(1)).as("tick_count"))
  }

  /** Half-open incremental window [from, to) — the aggregator's watermark
    * scan bound (services/aggregator/aggregator.py:37,123-127).
    */
  def bars1mBetween(ticks: DataFrame, from: Column, to: Column): DataFrame =
    bars1m(ticks.filter(col("event_time") >= from && col("event_time") < to))
}
