package graft

import graft.streaming.IncrementalBars
import org.apache.spark.sql.DataFrame

import java.nio.file.Files
import java.sql.Timestamp

/** Aggregator-service semantics (ST1-ST4): watermark advance, in-progress
  * minute exclusion, idempotent re-runs, late-data folding.
  */
class IncrementalBarsSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def ticksDf(rows: (String, BigDecimal, java.lang.Long, Timestamp)*): DataFrame = {
    import spark.implicits._
    rows.toDF("symbol", "price", "volume", "event_time")
      .selectExpr("symbol", "cast(price as decimal(12,4)) as price", "volume", "event_time")
  }

  private val t0 = ("AAPL", BigDecimal(10), Long.box(100L), ts("2024-01-01 10:00:10"))
  private val t1 = ("AAPL", BigDecimal(11), Long.box(200L), ts("2024-01-01 10:01:20"))
  private val inProgress = ("AAPL", BigDecimal(99), Long.box(1L), ts("2024-01-01 10:02:05"))

  test("first run bootstraps from min(event_time) and skips the open minute") {
    val tmp = Files.createTempDirectory("incbars").toString
    val res = IncrementalBars.runOnce(spark, ticksDf(t0, t1, inProgress),
      s"$tmp/bars", s"$tmp/etl", ts("2024-01-01 10:02:30"))
    assert(res.watermarkTo.contains(ts("2024-01-01 10:02:00")))
    val bars = spark.read.parquet(s"$tmp/bars")
    assert(bars.count() == 2) // 10:00 and 10:01 bars; 10:02 in progress
    assert(IncrementalBars.readWatermark(spark, s"$tmp/etl").contains(ts("2024-01-01 10:02:00")))
  }

  test("re-running the same window is idempotent (aggregator.py:86-101)") {
    val tmp   = Files.createTempDirectory("incbars").toString
    val ticks = ticksDf(t0, t1)
    val now   = ts("2024-01-01 10:02:30")
    IncrementalBars.runOnce(spark, ticks, s"$tmp/bars", s"$tmp/etl", now)
    val first = spark.read.parquet(s"$tmp/bars").collect().map(_.toString).sorted
    // second run: watermark == floor(now) → no-op, bars unchanged
    val res2 = IncrementalBars.runOnce(spark, ticks, s"$tmp/bars", s"$tmp/etl", now)
    assert(res2.watermarkTo.isEmpty)
    // force a recompute over the same data with a later clock: still same bars
    IncrementalBars.runOnce(spark, ticks, s"$tmp/bars", s"$tmp/etl", ts("2024-01-01 10:03:30"))
    val second = spark.read.parquet(s"$tmp/bars").collect().map(_.toString).sorted
    assert(second.toSeq == first.toSeq)
  }

  test("late tick for an already-emitted bar folds in on the next run (ST4)") {
    val tmp = Files.createTempDirectory("incbars").toString
    IncrementalBars.runOnce(spark, ticksDf(t0, t1), s"$tmp/bars", s"$tmp/etl",
      ts("2024-01-01 10:02:30"))
    val before = spark.read.parquet(s"$tmp/bars")
      .filter("bucket_start = timestamp'2024-01-01 10:00:00'").collect()(0)
    assert(before.getAs[Long]("volume_sum") == 100L)

    // a late tick lands in the 10:00 minute; new data also arrives at 10:02
    val late    = ("AAPL", BigDecimal(12), Long.box(50L), ts("2024-01-01 10:00:40"))
    val fresh   = ("AAPL", BigDecimal(13), Long.box(10L), ts("2024-01-01 10:02:10"))
    IncrementalBars.runOnce(spark, ticksDf(t0, t1, late, fresh), s"$tmp/bars", s"$tmp/etl",
      ts("2024-01-01 10:03:10"))
    val bars  = spark.read.parquet(s"$tmp/bars")
    val b1000 = bars.filter("bucket_start = timestamp'2024-01-01 10:00:00'").collect()(0)
    assert(b1000.getAs[Long]("volume_sum") == 150L) // late tick folded in
    assert(b1000.getAs[Long]("tick_count") == 2L)
    assert(bars.count() == 3)
  }

  test("legacy etl_runs store (no status column) still yields its watermark") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("incbars").toString
    // a store written by the pre-status schema: successful runs only
    Seq((ts("2024-01-01 10:05:00"), 7L, ts("2024-01-01 10:05:01")))
      .toDF("completed_to", "rows_upserted", "completed_at")
      .write.parquet(s"$tmp/etl")
    assert(IncrementalBars.readWatermark(spark, s"$tmp/etl")
      .contains(ts("2024-01-01 10:05:00")))
  }

  test("failed write records a status='error' run and advances nothing (ST8)") {
    val tmp = Files.createTempDirectory("incbars").toString
    // establish a watermark with a good run first
    IncrementalBars.runOnce(spark, ticksDf(t0), s"$tmp/bars", s"$tmp/etl",
      ts("2024-01-01 10:01:30"))
    val wmBefore = IncrementalBars.readWatermark(spark, s"$tmp/etl")
    assert(wmBefore.contains(ts("2024-01-01 10:01:00")))

    // a tick whose evaluation throws mid-aggregation → the bar write fails
    val poisoned = ticksDf(t0, t1).selectExpr(
      "symbol",
      "CASE WHEN volume = 200 THEN CAST(raise_error('boom') AS DECIMAL(12,4)) " +
        "ELSE price END AS price",
      "volume", "event_time")
    val ex = intercept[Exception] {
      IncrementalBars.runOnce(spark, poisoned, s"$tmp/bars", s"$tmp/etl",
        ts("2024-01-01 10:02:30"))
    }
    info(s"intercepted: ${ex.getClass.getName}: ${String.valueOf(ex.getMessage).take(300)}")

    // watermark untouched; audit trail has exactly one error row with the
    // attempted window bound and no completed_to
    assert(IncrementalBars.readWatermark(spark, s"$tmp/etl") == wmBefore)
    val runs = spark.read.parquet(s"$tmp/etl")
    val errs = runs.filter("status = 'error'").collect()
    assert(errs.length == 1)
    assert(errs(0).getAs[Timestamp]("completed_to") == null)
    assert(errs(0).getAs[Timestamp]("window_to") == ts("2024-01-01 10:02:00"))
    assert(runs.filter("status = 'complete'").count() == 1)

    // the next good cycle recovers and re-covers the failed window
    val res = IncrementalBars.runOnce(spark, ticksDf(t0, t1), s"$tmp/bars", s"$tmp/etl",
      ts("2024-01-01 10:02:30"))
    assert(res.watermarkTo.contains(ts("2024-01-01 10:02:00")))
    assert(spark.read.parquet(s"$tmp/bars").count() == 2)
  }
}
