package graft

import graft.model.Tick
import graft.sources.TickGenerator
import graft.typed.TypedOps

/** Typed pipeline: encoder-checked Dataset[Tick] → Dataset[Bar1m]. */
class TypedOpsSpec extends SparkSpec {

  test("typed bars equal the untyped aggregation and expose case classes") {
    val df    = TickGenerator.batch(spark, 1000)
    val ticks = TypedOps.asTicks(df)
    val first: Tick = ticks.head()
    assert(TickGenerator.Symbols.contains(first.symbol))

    val typedBars = TypedOps.bars1m(ticks)
    val bar       = typedBars.head()
    assert(bar.high.compareTo(bar.low) >= 0)
    assert(bar.tick_count >= 1)

    val untyped = graft.agg.BarAggregator
      .bars1m(ticks.toDF()).collect().map(_.toString).sorted
    assert(typedBars.toDF().collect().map(_.toString).sorted.toSeq == untyped.toSeq)
  }

  test("asTicks rejects frames that break the contract") {
    import spark.implicits._
    val bad = Seq((1, "x")).toDF("a", "b")
    intercept[Exception](TypedOps.asTicks(bad))
  }
}
