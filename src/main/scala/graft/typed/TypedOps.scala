package graft.typed

import graft.agg.BarAggregator
import graft.model.{Bar1m, Tick}
import org.apache.spark.sql.{DataFrame, Dataset}

/** Typed (case-class Encoder) entry points over the core derivations —
  * `Dataset[T]` where compile-time row types help (SURVEY.md §1.3), while
  * the transforms themselves stay Catalyst-declarative (no opaque lambda
  * aggregation in the hot path).
  */
object TypedOps {

  /** Bind a tick-shaped frame to the Tick contract (fails at analysis if
    * names/types drift).
    */
  def asTicks(df: DataFrame): Dataset[Tick] = {
    import df.sparkSession.implicits._
    df.selectExpr("symbol", "cast(price as decimal(12,4)) as price",
      "volume", "event_time").as[Tick]
  }

  /** Typed 1-minute bar derivation: same Catalyst plan as the untyped
    * [[BarAggregator.bars1m]], surfaced as Dataset[Bar1m].
    */
  def bars1m(ticks: Dataset[Tick]): Dataset[Bar1m] = {
    import ticks.sparkSession.implicits._
    BarAggregator.bars1m(ticks.toDF()).as[Bar1m]
  }
}
