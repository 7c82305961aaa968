package graft

import graft.sources.TickGenerator
import graft.streaming.{IngestPipeline, KafkaIO}

/** Seeded tick source laws (producer.py semantics) and the Kafka wire
  * round-trip through the ingest parser.
  */
class TickGeneratorSpec extends SparkSpec {

  test("generator is deterministic and respects producer value ranges") {
    val a = TickGenerator.batch(spark, 500).collect()
    val b = TickGenerator.batch(spark, 500).collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq) // same seed → same ticks
    val c = TickGenerator.batch(spark, 500, seed = 7L).collect()
    assert(a.map(_.toString).toSeq != c.map(_.toString).toSeq) // seed matters
    a.foreach { r =>
      val sym   = r.getString(1)
      val price = BigDecimal(r.getDecimal(2))
      val vol   = r.getLong(3)
      assert(TickGenerator.Symbols.contains(sym))
      val base = BigDecimal(TickGenerator.BasePrices(TickGenerator.Symbols.indexOf(sym)))
      assert((price - base).abs <= BigDecimal("0.5"))
      assert(price.scale <= 4 && (price * 100).isWhole) // 2dp rounding
      assert(vol >= 500L && vol <= 15000L)
    }
    // symbols actually vary (random choice of 6)
    assert(a.map(_.getString(1)).distinct.length == 6)
  }

  test("kafka wire round-trip: encodeTicks → parse → validTicks") {
    val ticks   = TickGenerator.batch(spark, 100)
    val wire    = KafkaIO.encodeTicks(ticks)
    assert(wire.columns.toSeq == Seq("key", "value"))
    val parsed  = IngestPipeline.parse(wire.select("value"))
    val landed  = IngestPipeline.validTicks(parsed)
    assert(landed.count() == 100)
    assert(IngestPipeline.failedEvents(parsed).count() == 0)
    // keyed partitioning: key is always the symbol
    assert(wire.collect().forall(r =>
      TickGenerator.Symbols.contains(r.getString(0))))
  }
}
