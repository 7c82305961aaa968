package graft

import graft.sources.{TickGenerator, TickStore}
import graft.streaming.StreamingBars
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.nio.file.Files
import java.sql.Timestamp

/** Physical layout (partition pruning) and streaming sessionization. */
class TickStoreSpec extends SparkSpec {

  test("tick store: date-partitioned layout prunes scans") {
    val tmp = Files.createTempDirectory("tickstore").toString
    // 2 days of ticks (43200 ticks x 2s interval = 86400s = 1 day each)
    val ticks = TickGenerator.batch(spark, 86400)
    TickStore.write(ticks, tmp)

    val back = TickStore.read(spark, tmp)
    assert(back.count() == 86400)
    val dates = back.select("tick_date").distinct().count()
    assert(dates >= 2)
    // partition pruning: the date predicate lands in PartitionFilters and
    // the pruned scan reads a strict subset of rows
    val firstDate = back.agg(min("tick_date")).collect()(0).getDate(0)
    val oneDay    = back.filter(col("tick_date") === firstDate)
    val plan      = oneDay.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("tick_date"))
    assert(oneDay.count() > 0 && oneDay.count() < back.count())
    // layout preserves content
    assert(back.agg(sum("volume")).collect()(0).getLong(0)
      == ticks.agg(sum("volume")).collect()(0).getLong(0))
  }

  test("bucketed table: symbol-keyed aggregation plans without an exchange") {
    TickStore.writeBucketed(TickGenerator.batch(spark, 5000), "ticks_bucketed", 4)
    try {
      val agg = spark.table("ticks_bucketed")
        .groupBy("symbol").agg(sum("volume").as("v"))
      val plan = agg.queryExecution.executedPlan.toString
      // bucket pruning satisfies the hash-clustered requirement: the
      // aggregate must run with NO shuffle exchange
      assert(!plan.contains("Exchange hashpartitioning"), plan.take(2000))
      assert(agg.count() == TickGenerator.Symbols.length)
      // self-join on the bucket key is exchange-free too
      val t = spark.table("ticks_bucketed")
      val joined = t.as("a").join(t.as("b"), "symbol")
      val jplan = joined.queryExecution.executedPlan.toString
      assert(!jplan.contains("Exchange hashpartitioning"), jplan.take(2000))
    } finally spark.sql("DROP TABLE IF EXISTS ticks_bucketed")
  }

  test("streaming sessionize emits closed sessions on watermark timeout") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(String, Timestamp)]
    val ticks = input.toDF().toDF("symbol", "event_time")

    val query = StreamingBars.sessionize(ticks, gapMinutes = 30)
      .writeStream.format("memory").queryName("sessions_out")
      .outputMode("append").start()
    try {
      val t0 = Timestamp.valueOf("2024-01-01 10:00:00")
      input.addData(("AAPL", t0),
        ("AAPL", Timestamp.valueOf("2024-01-01 10:10:00")))
      query.processAllAvailable()
      // nothing closed yet — the session is still open
      assert(spark.table("sessions_out").count() == 0)

      // 2 hours later: watermark passes start-session end + gap
      input.addData(("AAPL", Timestamp.valueOf("2024-01-01 12:00:00")))
      query.processAllAvailable()
      input.addData(("AAPL", Timestamp.valueOf("2024-01-01 13:00:00")))
      query.processAllAvailable()

      val closed = spark.table("sessions_out").collect()
      assert(closed.nonEmpty)
      val first = closed.minBy(_.getTimestamp(1).getTime)
      assert(first.getString(0) == "AAPL")
      assert(first.getTimestamp(1) == t0)
      assert(first.getTimestamp(2) == Timestamp.valueOf("2024-01-01 10:10:00"))
      assert(first.getLong(3) == 2L)
    } finally query.stop()
  }

  test("sessionize with lateness: a late event bridges two open sessions") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(String, Timestamp)]
    val ticks = input.toDF().toDF("symbol", "event_time")

    val query = StreamingBars.sessionize(ticks, gapMinutes = 30, lateness = "2 hours")
      .writeStream.format("memory").queryName("sessions_late")
      .outputMode("append").start()
    try {
      // two sessions 50 min apart — both stay open (watermark lags 2 h)
      input.addData(("AAPL", Timestamp.valueOf("2024-01-01 10:00:00")),
        ("AAPL", Timestamp.valueOf("2024-01-01 10:50:00")))
      query.processAllAvailable()
      assert(spark.table("sessions_late").count() == 0)

      // a permitted late event at 10:25 is within gap of BOTH: they merge
      input.addData(("AAPL", Timestamp.valueOf("2024-01-01 10:25:00")))
      query.processAllAvailable()
      // advance the watermark past merged end + gap (11:20): wm = 14:00-2h
      input.addData(("AAPL", Timestamp.valueOf("2024-01-01 14:00:00")))
      query.processAllAvailable()
      input.addData(("AAPL", Timestamp.valueOf("2024-01-01 18:00:00")))
      query.processAllAvailable()

      val closed = spark.table("sessions_late").collect()
        .filter(_.getTimestamp(1) == Timestamp.valueOf("2024-01-01 10:00:00"))
      assert(closed.length == 1) // ONE bridged session, not two overlapping
      assert(closed(0).getTimestamp(2) == Timestamp.valueOf("2024-01-01 10:50:00"))
      assert(closed(0).getLong(3) == 3L)
    } finally query.stop()
  }
}
