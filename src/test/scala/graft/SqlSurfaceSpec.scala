package graft

/** The spark.sql(...) path over registered views answers the reference's
  * queries identically to the DataFrame builders (both compile to the
  * same logical plans).
  */
class SqlSurfaceSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("SQL text over registered views matches the DataFrame builders") {
    Tables.registerViews(spark, dir)
    // /symbols (A9+W4)
    val sqlSymbols = spark.sql("SELECT DISTINCT symbol FROM ticks ORDER BY symbol")
      .collect().map(_.getString(0)).toSeq
    val dfSymbols = graft.analytics.StockAnalytics.symbols(spark, dir)
      .collect().map(_.getString(0)).toSeq
    assert(sqlSymbols == dfSymbols && sqlSymbols.nonEmpty)

    // the aggregator's bar build (A1-A6) as SQL text over the ticks view
    val sqlBars = spark.sql(
      """SELECT symbol, date_trunc('minute', event_time) AS bucket_start,
        |       min_by(price, event_time) AS open, max(price) AS high,
        |       min(price) AS low, max_by(price, event_time) AS close,
        |       sum(coalesce(volume, 0)) AS volume_sum, count(*) AS tick_count
        |FROM ticks GROUP BY 1, 2 ORDER BY symbol, bucket_start""".stripMargin)
      .collect().map(_.toString).toSeq
    val dfBars = graft.agg.BarAggregator.bars1m(Tables.ticks(spark, dir))
      .orderBy("symbol", "bucket_start").collect().map(_.toString).toSeq
    assert(sqlBars == dfBars && sqlBars.nonEmpty)
  }
}
