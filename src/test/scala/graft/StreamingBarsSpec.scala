package graft

import graft.streaming.StreamingBars
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import java.sql.Timestamp

/** Native Structured-Streaming bar derivation: windowed OHLCV over a
  * MemoryStream and keyed latest-per-symbol state.
  */
class StreamingBarsSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("windowed streaming aggregation produces the batch OHLCV bars") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(String, Double, java.lang.Long, Timestamp)]
    val ticks = input.toDF()
      .toDF("symbol", "p", "volume", "event_time")
      .selectExpr("symbol", "cast(p as decimal(12,4)) as price", "volume", "event_time")

    val query = StreamingBars.startMemorySink(StreamingBars.bars1m(ticks), "stream_bars")
    try {
      input.addData(
        ("AAPL", 10.0, Long.box(100L), ts("2024-01-01 10:00:01")),
        ("AAPL", 12.0, Long.box(50L), ts("2024-01-01 10:00:30")),
        ("AAPL", 11.0, null, ts("2024-01-01 10:00:59")),
        ("MSFT", 5.0, Long.box(10L), ts("2024-01-01 10:00:10")))
      query.processAllAvailable()

      val bars = spark.table("stream_bars").collect()
        .map(r => r.getString(0) -> r).toMap
      assert(bars.size == 2)
      val aapl = bars("AAPL")
      assert(aapl.getTimestamp(1) == ts("2024-01-01 10:00:00"))
      assert(aapl.getDecimal(2) == new java.math.BigDecimal("10.0000")) // open
      assert(aapl.getDecimal(3) == new java.math.BigDecimal("12.0000")) // high
      assert(aapl.getDecimal(4) == new java.math.BigDecimal("10.0000")) // low
      assert(aapl.getDecimal(5) == new java.math.BigDecimal("11.0000")) // close
      assert(aapl.getLong(6) == 150L)                                   // null → 0
      assert(aapl.getLong(7) == 3L)

      // a second batch refines the open bar (update mode = upsert-visible)
      input.addData(("AAPL", 20.0, Long.box(1L), ts("2024-01-01 10:00:45")))
      query.processAllAvailable()
      val refined = spark.table("stream_bars").collect()
        .filter(r => r.getString(0) == "AAPL").maxBy(_.getLong(7))
      assert(refined.getDecimal(3) == new java.math.BigDecimal("20.0000"))
      assert(refined.getLong(7) == 4L)
    } finally query.stop()
  }

  test("append mode emits a bar only after the watermark closes its minute") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(String, Double, java.lang.Long, Timestamp)]
    val ticks = input.toDF()
      .toDF("symbol", "p", "volume", "event_time")
      .selectExpr("symbol", "cast(p as decimal(12,4)) as price", "volume", "event_time")

    val query = StreamingBars.bars1m(ticks, lateness = "0 seconds").writeStream
      .format("memory").queryName("append_bars").outputMode("append").start()
    try {
      input.addData(("AAPL", 10.0, Long.box(1L), ts("2024-01-01 10:00:10")))
      query.processAllAvailable()
      // watermark still inside the 10:00 minute → nothing final yet
      assert(spark.table("append_bars").count() == 0)

      // an event past the minute boundary advances the watermark → the
      // completed 10:00 bar is emitted exactly once (reference's
      // "only completed minutes", aggregator.py:123-127)
      input.addData(("AAPL", 11.0, Long.box(2L), ts("2024-01-01 10:01:30")))
      query.processAllAvailable()
      val emitted = spark.table("append_bars").collect()
      assert(emitted.length == 1)
      assert(emitted(0).getTimestamp(1) == ts("2024-01-01 10:00:00"))
      assert(emitted(0).getLong(7) == 1L)
    } finally query.stop()
  }

  test("mapGroupsWithState keeps the latest tick per symbol across batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(String, Double, java.lang.Long, Timestamp)]
    val ticks = input.toDF()
      .toDF("symbol", "p", "volume", "event_time")
      .selectExpr("symbol", "cast(p as decimal(12,4)) as price", "volume", "event_time")

    val query = StreamingBars.latestPerSymbol(ticks).writeStream
      .format("memory").queryName("latest_state").outputMode("update").start()
    try {
      input.addData(
        ("AAPL", 10.0, Long.box(1L), ts("2024-01-01 10:00:01")),
        ("AAPL", 11.0, Long.box(2L), ts("2024-01-01 10:00:05")))
      query.processAllAvailable()
      // an older, out-of-order tick must NOT displace the newer state
      input.addData(("AAPL", 9.0, Long.box(3L), ts("2024-01-01 09:59:00")))
      query.processAllAvailable()

      val rows = spark.table("latest_state").collect()
      val last = rows.filter(_.getString(0) == "AAPL").last
      assert(last.getTimestamp(3) == ts("2024-01-01 10:00:05"))
      // state-store round-trip widens the decimal scale; compare numerically
      assert(last.getDecimal(1).compareTo(new java.math.BigDecimal("11")) == 0)
    } finally query.stop()
  }
}
