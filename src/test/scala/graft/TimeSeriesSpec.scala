package graft

import graft.analytics.TimeSeriesAnalytics
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** As-of join and sessionization laws on the sf0.001 testdata plus
  * hand-built edges.
  */
class TimeSeriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Epoch millis of a timestamp column value regardless of whether the
    * scan produced LTZ (`java.sql.Timestamp`) or NTZ
    * (`java.time.LocalDateTime` — what the isAdjustedToUTC=false testdata
    * reads as); NTZ wall time IS the UTC instant under the test session.
    */
  private def epochMs(v: Any): Long = v match {
    case t: java.sql.Timestamp      => t.getTime
    case d: java.time.LocalDateTime => d.toInstant(java.time.ZoneOffset.UTC).toEpochMilli
    case other => fail(s"not a timestamp value: $other (${other.getClass})")
  }

  test("as-of join: prev_close is the close of the latest completed bar") {
    val out = TimeSeriesAnalytics.ticksAsofBars(spark, dir)
    val rows = out.filter(col("symbol") === "CLICK")
      .orderBy("event_time").collect()
    assert(rows.nonEmpty)
    // the first tick of a symbol has no completed bar before it
    assert(rows.head.isNullAt(4))
    // every non-null prev_close equals the close of the latest bar whose
    // availability (bucket_start + 1min) is <= the tick time
    val bars = graft.agg.BarAggregator.bars1m(Tables.ticks(spark, dir))
      .filter(col("symbol") === "CLICK")
      .select(col("bucket_start"), col("close").cast("double")).collect()
      .map(r => (r.getTimestamp(0).getTime + 60000L, r.getDouble(1))).sortBy(_._1)
    rows.filter(!_.isNullAt(4)).take(50).foreach { r =>
      val t = r.getTimestamp(2).getTime
      val expected = bars.takeWhile(_._1 <= t).lastOption.map(_._2)
      assert(expected.contains(r.getDouble(4)))
    }
  }

  test("sessionization: gaps > 30 min split; session stats are consistent") {
    val out = TimeSeriesAnalytics.tickSessions(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val start = epochMs(r.get(2)); val end = epochMs(r.get(3))
      assert(start <= end)
      // epoch ms is ms-truncated; duration_us keeps µs precision
      assert(math.abs(r.getLong(5) - (end - start) * 1000) < 2000)
      assert(r.getLong(4) >= 1)
    }
    // per symbol: session count == number of >30min gaps + 1
    val ticks = Tables.ticks(spark, dir)
      .select("symbol", "event_time").collect()
      .map(r => r.getString(0) -> epochMs(r.get(1))).groupBy(_._1)
    val sessionsPerSymbol = out.groupBy(_.getString(0)).view.mapValues(_.length).toMap
    ticks.foreach { case (sym, rows) =>
      val ts = rows.map(_._2).sorted
      val gaps = ts.zip(ts.drop(1)).count { case (a, b) => b - a > 1800000L }
      assert(sessionsPerSymbol(sym) == gaps + 1, s"symbol $sym")
    }
  }

  test("as-of edge: bar at exactly tick time is visible (bars sort first)") {
    import spark.implicits._
    // symbol X: ticks at 10:00:30 and 10:01:00; the 10:00 bar becomes
    // available at exactly 10:01:00 and must be visible to that tick
    val ticks = Seq(
      (1L, "X", BigDecimal(10), Long.box(1L), Timestamp.valueOf("2024-01-01 10:00:30")),
      (2L, "X", BigDecimal(11), Long.box(1L), Timestamp.valueOf("2024-01-01 10:01:00")))
      .toDF("tick_id", "symbol", "price", "volume", "event_time")
      .selectExpr("tick_id", "symbol", "cast(price as decimal(12,4)) as price",
        "volume", "event_time")
    // reuse the production shape by calling through a temp view-free path:
    // build the same union plan on this frame
    val out = {
      val bars = graft.agg.BarAggregator.bars1m(ticks)
      val nullDec = lit(null).cast("decimal(12,4)")
      val tickEvts = ticks.select(col("symbol"), col("event_time").as("t"),
        lit(1).as("is_tick"), col("tick_id"), col("price"), nullDec.as("close"))
      val barEvts = bars.select(col("symbol"),
        (col("bucket_start") + expr("INTERVAL 1 MINUTE")).as("t"),
        lit(0).as("is_tick"), lit(null).cast("long").as("tick_id"),
        nullDec.as("price"), col("close"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("symbol").orderBy(col("t").asc, col("is_tick").asc)
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      tickEvts.unionByName(barEvts)
        .withColumn("prev_close", last(col("close"), ignoreNulls = true).over(w))
        .filter(col("is_tick") === 1)
    }.orderBy("t").collect()
    assert(out(0).isNullAt(6))                                      // 10:00:30: nothing yet
    assert(out(1).getDecimal(6).compareTo(new java.math.BigDecimal("10")) == 0) // 10:01:00 sees 10:00 bar
  }
}
