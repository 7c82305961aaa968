package graft

import graft.agg.BarAggregator
import org.apache.spark.sql.Row
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import java.sql.Timestamp

/** OHLCV bar laws — the reference's aggregator test suite
  * (tests/test_aggregator.py) as executable properties.
  */
class BarAggregatorSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def ticksDf(rows: (String, BigDecimal, java.lang.Long, Timestamp)*) = {
    import spark.implicits._
    rows.toDF("symbol", "price", "volume", "event_time")
      .selectExpr("symbol", "cast(price as decimal(12,4)) as price", "volume", "event_time")
  }

  test("bucket boundary math: 10:30:45 lands in 10:30:00; minutes separate") {
    // tests/test_aggregator.py:14-38
    val bars = BarAggregator.bars1m(ticksDf(
      ("AAPL", BigDecimal(10), 1L, ts("2024-01-01 10:30:45")),
      ("AAPL", BigDecimal(11), 1L, ts("2024-01-01 10:30:59")),
      ("AAPL", BigDecimal(12), 1L, ts("2024-01-01 10:31:00")))).collect()
    assert(bars.length == 2)
    val byBucket = bars.map(r => r.getTimestamp(1) -> r).toMap
    assert(byBucket(ts("2024-01-01 10:30:00")).getLong(6) == 2) // tick_count
    assert(byBucket(ts("2024-01-01 10:31:00")).getLong(6) == 1)
  }

  test("OHLCV laws: open=first, close=last, high=max, low=min, volume=sum") {
    // tests/test_aggregator.py:44-80
    val r = BarAggregator.bars1m(ticksDf(
      ("MSFT", BigDecimal("101.5"), 100L, ts("2024-01-01 09:00:01")),
      ("MSFT", BigDecimal("99.25"), 200L, ts("2024-01-01 09:00:20")),
      ("MSFT", BigDecimal("105.0"), 300L, ts("2024-01-01 09:00:40")),
      ("MSFT", BigDecimal("103.0"), 400L, ts("2024-01-01 09:00:59")))).collect()(0)
    assert(r.getDecimal(2) == new java.math.BigDecimal("101.5000")) // open
    assert(r.getDecimal(3) == new java.math.BigDecimal("105.0000")) // high
    assert(r.getDecimal(4) == new java.math.BigDecimal("99.2500"))  // low
    assert(r.getDecimal(5) == new java.math.BigDecimal("103.0000")) // close
    assert(r.getLong(6) == 1000L)                                   // volume_sum
    assert(r.getLong(7) == 4L)                                      // tick_count
  }

  test("null volume coalesces to 0 (init.sql volume NULL + aggregator.py:34)") {
    val r = BarAggregator.bars1m(ticksDf(
      ("AMZN", BigDecimal(10), null, ts("2024-01-01 09:00:01")),
      ("AMZN", BigDecimal(11), 7L, ts("2024-01-01 09:00:02")))).collect()(0)
    assert(r.getLong(6) == 7L)
  }

  test("single-tick bar has O=H=L=C (tests/test_aggregator.py:137-145)") {
    val r = BarAggregator.bars1m(ticksDf(
      ("NVDA", BigDecimal("42.42"), 1L, ts("2024-01-01 12:00:30")))).collect()(0)
    assert(r.getDecimal(2) == r.getDecimal(3) && r.getDecimal(3) == r.getDecimal(4)
      && r.getDecimal(4) == r.getDecimal(5))
  }

  test("multi-symbol isolation (tests/test_aggregator.py:195-213)") {
    val bars = BarAggregator.bars1m(ticksDf(
      ("A", BigDecimal(1), 1L, ts("2024-01-01 09:00:01")),
      ("B", BigDecimal(2), 1L, ts("2024-01-01 09:00:02")))).collect()
    assert(bars.map(_.getString(0)).toSet == Set("A", "B"))
  }

  test("property: bar laws hold for random tick batches") {
    val tickGen = for {
      sym <- Gen.oneOf("X", "Y")
      price <- Gen.choose(1, 100000).map(c => BigDecimal(c) / 100)
      vol <- Gen.option(Gen.choose(0L, 10000L))
      sec <- Gen.choose(0, 179)
    } yield (sym, price, vol.map(Long.box).orNull,
      new Timestamp(ts("2024-01-01 09:00:00").getTime + sec * 1000L))

    val batchGen = Gen.nonEmptyListOf(tickGen)
    (1 to 10).foreach { i =>
      val ticks = batchGen.apply(Gen.Parameters.default.withSize(40), Seed(i.toLong)).get
      val bars  = BarAggregator.bars1m(ticksDf(ticks: _*)).collect()
      val byKey = ticks.groupBy { case (s, _, _, t) =>
        (s, new Timestamp(t.getTime / 60000 * 60000))
      }
      assert(bars.length == byKey.size)
      bars.foreach { (r: Row) =>
        val group = byKey((r.getString(0), r.getTimestamp(1)))
        val prices = group.map(_._2)
        assert(BigDecimal(r.getDecimal(3)) == prices.max)       // high
        assert(BigDecimal(r.getDecimal(4)) == prices.min)       // low
        val expVol = group.map(g => Option(g._3).map(_.toLong).getOrElse(0L)).sum
        assert(r.getLong(6) == expVol)                          // volume_sum
        assert(r.getLong(7) == group.size)                      // tick_count
        val first = group.minBy(_._4.getTime)
        val last  = group.maxBy(_._4.getTime)
        // open/close tie-break only guaranteed when timestamps are unique
        if (group.map(_._4.getTime).distinct.size == group.size) {
          assert(BigDecimal(r.getDecimal(2)) == first._2)
          assert(BigDecimal(r.getDecimal(5)) == last._2)
        }
      }
    }
  }
}
