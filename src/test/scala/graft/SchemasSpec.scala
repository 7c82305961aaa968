package graft

import graft.model.Schemas
import graft.streaming.IngestPipeline

/** The engine's produced frames must conform to the declared model
  * schemas (names, types, order).
  */
class SchemasSpec extends SparkSpec {

  private def shape(df: org.apache.spark.sql.DataFrame) =
    df.schema.fields.map(f => (f.name, f.dataType)).toSeq

  test("ingest output conforms to the tick schema") {
    import spark.implicits._
    val parsed = IngestPipeline.parse(Seq(
      """{"symbol":"AAPL","price":1.0,"volume":2,"event_time":"2024-01-01T00:00:00+00:00"}""")
      .toDF("value"))
    assert(shape(IngestPipeline.validTicks(parsed))
      == Schemas.tick.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(shape(IngestPipeline.failedEvents(parsed))
      == Schemas.failedEvent.fields.map(f => (f.name, f.dataType)).toSeq)
  }

  test("bar aggregation output conforms to the bar schema") {
    import spark.implicits._
    val ticks = Seq(("A", BigDecimal(1), Long.box(1L),
      java.sql.Timestamp.valueOf("2024-01-01 00:00:01")))
      .toDF("symbol", "price", "volume", "event_time")
      .selectExpr("symbol", "cast(price as decimal(12,4)) as price", "volume", "event_time")
    assert(shape(graft.agg.BarAggregator.bars1m(ticks))
      == Schemas.bar1m.fields.map(f => (f.name, f.dataType)).toSeq)
  }

  test("barsOf rejects unsupported buckets") {
    import spark.implicits._
    val ticks = Seq(("A", BigDecimal(1), Long.box(1L),
      java.sql.Timestamp.valueOf("2024-01-01 00:00:01")))
      .toDF("symbol", "price", "volume", "event_time")
    intercept[IllegalArgumentException](
      graft.agg.BarAggregator.barsOf(ticks, "7 minutes"))
  }
}
