package graft

import graft.analytics.{StockAnalytics, TimeSeriesAnalytics}
import org.apache.spark.sql.functions._

/** Cross-formulation laws on real testdata: independent implementations of
  * the same semantics must agree exactly.
  */
class QueryLawsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("movers: single-aggregation shape equals the literal CTE+join shape") {
    val a = StockAnalytics.movers(spark, dir).collect().map(_.toString).sorted
    val b = StockAnalytics.moversJoin(spark, dir).collect().map(_.toString).sorted
    assert(a.toSeq == b.toSeq)
  }

  test("sessionization: window-function and session_window forms agree") {
    val manual = TimeSeriesAnalytics.tickSessions(spark, dir)
      .select(col("symbol"), col("session_start"), col("n_ticks"))
      .collect().map(_.toString).sorted
    val native = TimeSeriesAnalytics.tickSessionsNative(spark, dir)
      .select(col("symbol"), col("session_start"), col("n_ticks"))
      .collect().map(_.toString).sorted
    assert(manual.toSeq == native.toSeq)
  }

  test("bar conservation: every tick lands in exactly one bar at each granularity") {
    val nTicks = Tables.ticks(spark, dir).count()
    Seq(StockAnalytics.bars1m _, StockAnalytics.barsHourly _, StockAnalytics.barsDaily _)
      .foreach { q =>
        val total = q(spark, dir).agg(sum("tick_count")).collect()(0).getLong(0)
        assert(total == nTicks)
      }
  }

  test("asof: prev_close is always a real bar close for the same symbol") {
    val closes = graft.agg.BarAggregator.bars1m(Tables.ticks(spark, dir))
      .select(col("symbol"), col("close").cast("double")).collect()
      .groupBy(_.getString(0)).view
      .mapValues(_.map(_.getDouble(1)).toSet).toMap
    TimeSeriesAnalytics.ticksAsofBars(spark, dir).collect()
      .filterNot(_.isNullAt(4))
      .foreach { r => assert(closes(r.getString(1)).contains(r.getDouble(4))) }
  }
}
