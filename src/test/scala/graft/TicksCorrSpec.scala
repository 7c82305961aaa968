package graft

import graft.analytics.TimeSeriesAnalytics
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Laws for the cross-series co-moment matrix (`ticks_corr`). */
class TicksCorrSpec extends SparkSpec {
  import spark.implicits._

  private def ticks(rows: Seq[(String, Double, String)]): DataFrame =
    rows.toDF("symbol", "p", "tss")
      .select(col("symbol"), col("p").cast("decimal(12,4)").as("price"),
        to_timestamp(col("tss")).cast("timestamp_ntz").as("event_time"))

  private type MRow = (String, String, Long, Long, Long, Long, Long, Long)

  private def rows(df: DataFrame): Seq[MRow] =
    df.as[MRow].collect().toSeq

  private def corr(r: MRow): Double = {
    val (_, _, n, sx, sy, sxy, sxx, syy) = r
    (n.toDouble * sxy - sx.toDouble * sy) /
      math.sqrt((n.toDouble * sxx - sx.toDouble * sx) *
        (n.toDouble * syy - sy.toDouble * sy))
  }

  test("planted series: perfect correlation and anti-correlation recovered") {
    // A and B move together; C moves exactly opposite to A over the
    // same three minutes (linear maps of each other per-minute)
    val t = ticks(Seq(
      ("A", 10.0, "2024-01-01 10:00:00"), ("B", 20.0, "2024-01-01 10:00:30"),
      ("C", 30.0, "2024-01-01 10:00:10"),
      ("A", 20.0, "2024-01-01 10:01:00"), ("B", 40.0, "2024-01-01 10:01:30"),
      ("C", 20.0, "2024-01-01 10:01:10"),
      ("A", 30.0, "2024-01-01 10:02:00"), ("B", 60.0, "2024-01-01 10:02:30"),
      ("C", 10.0, "2024-01-01 10:02:10")))
    val got = rows(TimeSeriesAnalytics.ticksCorrOn(t))
    val byPair = got.map(r => (r._1, r._2) -> r).toMap
    assert(math.abs(corr(byPair(("A", "B"))) - 1.0) < 1e-12)
    assert(math.abs(corr(byPair(("A", "C"))) + 1.0) < 1e-12)
    assert(byPair(("A", "B"))._3 == 3L)
  }

  test("pairwise-complete alignment: only common minutes count") {
    val t = ticks(Seq(
      ("A", 10.0, "2024-01-01 10:00:00"), ("A", 20.0, "2024-01-01 10:01:00"),
      ("A", 30.0, "2024-01-01 10:02:00"),
      ("B", 10.0, "2024-01-01 10:01:10"), ("B", 20.0, "2024-01-01 10:02:10"),
      ("B", 99.0, "2024-01-01 10:07:00")))
    val got = rows(TimeSeriesAnalytics.ticksCorrOn(t))
    assert(got.size == 1)
    assert(got.head._3 == 2L, "A and B share exactly minutes 10:01 and 10:02")
  }

  test("corpus: moments equal a driver-side recompute and |corr| <= 1") {
    val sf = "/root/testdata/sf0.001"
    val got = rows(TimeSeriesAnalytics.ticksCorr(spark, sf))
    assert(got.nonEmpty)
    // independent recompute of the minute series
    val minutes = Tables.ticks(spark, sf)
      .groupBy(col("symbol"), date_trunc("minute", col("event_time")).as("minute"))
      .agg(expr("CAST(sum(price) * 10000 AS BIGINT) div count(1)").as("p"))
      .as[(String, java.sql.Timestamp, Long)].collect()
      .groupBy(_._1).map { case (s, xs) => s -> xs.map(e => e._2 -> e._3).toMap }
    got.foreach { case r @ (a, b, n, sx, sy, sxy, sxx, syy) =>
      assert(a < b)
      val common = minutes(a).keySet.intersect(minutes(b).keySet)
      val xs = common.toSeq.map(minutes(a))
      val ys = common.toSeq.map(minutes(b))
      val pairs = common.toSeq.map(m => (minutes(a)(m), minutes(b)(m)))
      assert(n == common.size.toLong)
      assert(sx == xs.sum && sy == ys.sum)
      assert(sxy == pairs.map { case (x, y) => x * y }.sum)
      assert(sxx == xs.map(x => x * x).sum && syy == ys.map(y => y * y).sum)
      if (n > 1) assert(math.abs(corr(r)) <= 1.0 + 1e-12)
    }
  }
}
