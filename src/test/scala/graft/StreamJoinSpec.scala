package graft

import graft.streaming.StreamingBars
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import java.sql.Timestamp

/** Stream-stream time-interval join: tick enrichment with recently
  * completed bars, including the left-outer watermark contract (null
  * rows emit only once no matching bar can still arrive) and state
  * eviction via the interval predicate.
  */
class StreamJoinSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("interval join matches visible bars; outer nulls wait for the watermark") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val tickIn = MemoryStream[(String, Double, Timestamp)]
    val barIn  = MemoryStream[(String, Timestamp, Double)]
    val ticks = tickIn.toDF().toDF("symbol", "p", "event_time")
      .selectExpr("symbol", "cast(p as decimal(12,4)) as price", "event_time")
    val bars = barIn.toDF().toDF("symbol", "bucket_start", "c")
      .selectExpr("symbol", "bucket_start", "cast(c as decimal(12,4)) as close")

    val joined = StreamingBars.ticksWithRecentBars(ticks, bars)
    val query = joined.writeStream.format("memory")
      .queryName("stream_join").outputMode(OutputMode.Append()).start()
    try {
      // AAPL bar for bucket 10:00 becomes available at 10:01, close 11
      barIn.addData(("AAPL", ts("2024-01-01 10:00:00"), 11.0))
      tickIn.addData(
        ("AAPL", 10.0, ts("2024-01-01 10:02:00")),  // avail 10:01 <= 10:02 -> match
        ("AAPL", 9.0, ts("2024-01-01 10:00:30")),   // before avail -> no bar
        ("MSFT", 5.0, ts("2024-01-01 10:02:00")))   // no bars at all
      query.processAllAvailable()

      // inner matches emit immediately
      val matched = spark.table("stream_join").collect()
        .filter(!_.isNullAt(4)).map(r => (r.getString(0), r.getTimestamp(1)))
      assert(matched.toSet == Set("AAPL" -> ts("2024-01-01 10:02:00")))

      // outer (null-bar) rows are held back until the watermark proves no
      // bar can still match: advance BOTH streams well past the horizon
      tickIn.addData(("AAPL", 1.0, ts("2024-01-01 10:30:00")))
      barIn.addData(("AAPL", ts("2024-01-01 10:30:00"), 1.0))
      query.processAllAvailable()
      tickIn.addData(("AAPL", 1.0, ts("2024-01-01 10:40:00")))
      barIn.addData(("AAPL", ts("2024-01-01 10:40:00"), 1.0))
      query.processAllAvailable()

      val rows = spark.table("stream_join").collect()
      val nulls = rows.filter(_.isNullAt(4))
        .map(r => (r.getString(0), r.getTimestamp(1))).toSet
      assert(nulls.contains("AAPL" -> ts("2024-01-01 10:00:30")))
      assert(nulls.contains("MSFT" -> ts("2024-01-01 10:02:00")))
      // the matched tick appears exactly once (no duplicate outer row)
      assert(rows.count(r => r.getString(0) == "AAPL"
        && r.getTimestamp(1) == ts("2024-01-01 10:02:00")) == 1)
    } finally query.stop()
  }

  test("interval predicate excludes bars older than the horizon") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val tickIn = MemoryStream[(String, Double, Timestamp)]
    val barIn  = MemoryStream[(String, Timestamp, Double)]
    val ticks = tickIn.toDF().toDF("symbol", "p", "event_time")
      .selectExpr("symbol", "cast(p as decimal(12,4)) as price", "event_time")
    val bars = barIn.toDF().toDF("symbol", "bucket_start", "c")
      .selectExpr("symbol", "bucket_start", "cast(c as decimal(12,4)) as close")
    val query = StreamingBars.ticksWithRecentBars(ticks, bars)
      .writeStream.format("memory")
      .queryName("stream_join_horizon").outputMode(OutputMode.Append()).start()
    try {
      // bar available 10:01; tick at 10:07 is 6 min later -> outside the
      // 5-minute horizon, must NOT match
      barIn.addData(("AAPL", ts("2024-01-01 10:00:00"), 11.0))
      tickIn.addData(("AAPL", 10.0, ts("2024-01-01 10:07:00")))
      query.processAllAvailable()
      val matches = spark.table("stream_join_horizon").collect().filter(!_.isNullAt(4))
      assert(matches.isEmpty)
    } finally query.stop()
  }

  test("streaming funnel state machine advances in order across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, String, Timestamp)]
    val events = in.toDF().toDF("user_id", "event_type", "ts")
    val query = StreamingBars.funnelProgress(events)
      .writeStream.format("memory").queryName("funnel_state")
      .outputMode(OutputMode.Update()).start()
    def stages(): Map[Long, Int] = spark.table("funnel_state").collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getInt(1)).max).toMap
    try {
      // batch 1: u1 views+clicks (order scrambled within the batch);
      // u2 purchases first (wrong order — must stay at 0)
      in.addData(
        (1L, "click", ts("2024-01-01 10:01:00")),
        (1L, "view", ts("2024-01-01 10:00:00")),
        (2L, "purchase", ts("2024-01-01 10:00:00")))
      query.processAllAvailable()
      assert(stages() == Map(1L -> 2, 2L -> 0))
      // batch 2: u1 purchases (advances to 3); u2 views (starts at 1)
      in.addData(
        (1L, "purchase", ts("2024-01-01 10:02:00")),
        (2L, "view", ts("2024-01-01 10:03:00")))
      query.processAllAvailable()
      assert(stages() == Map(1L -> 3, 2L -> 1))
      // equal-timestamp event must NOT advance (strictly-after rule)
      in.addData((2L, "click", ts("2024-01-01 10:03:00")))
      query.processAllAvailable()
      assert(stages()(2L) == 1)
    } finally query.stop()
  }
}
