package graft

import graft.agg.BarAggregator
import graft.sources.TickGenerator
import graft.streaming.{IncrementalBars, IngestPipeline, KafkaIO}
import org.apache.spark.sql.functions._

import java.nio.file.Files
import java.sql.Timestamp

/** Full-pipeline integration: generator → wire encode → ingest parse →
  * durable ticks → incremental bars → analytics roll-up, plus the salted
  * aggregation equivalence law.
  */
class PipelineIntegrationSpec extends SparkSpec {

  test("end-to-end: generated ticks flow to bars and movers-style rollup") {
    val tmp = Files.createTempDirectory("pipeline").toString

    // producer → wire → consumer parse (the reference's ingest path)
    val wire   = KafkaIO.encodeTicks(TickGenerator.batch(spark, 3000))
    val parsed = IngestPipeline.parse(wire.select("value"))
    assert(IngestPipeline.failedEvents(parsed).isEmpty)
    IngestPipeline.validTicks(parsed).write.parquet(s"$tmp/ticks")

    // aggregator: incremental bars over the durable ticks
    val ticks = spark.read.parquet(s"$tmp/ticks")
    val maxT  = ticks.agg(max("event_time")).collect()(0).getTimestamp(0)
    val res = IncrementalBars.runOnce(spark, ticks, s"$tmp/bars", s"$tmp/etl",
      new Timestamp(maxT.getTime + 120000))
    assert(res.barsWritten > 0)

    // analytics over the derived bars: per-symbol first-open/last-close
    val bars = spark.read.parquet(s"$tmp/bars")
    val movers = bars.groupBy("symbol").agg(
      min_by(col("open"), col("bucket_start")).as("open"),
      max_by(col("close"), col("bucket_start")).as("close"))
    assert(movers.count() == TickGenerator.Symbols.length)

    // conservation: every generated tick landed in exactly one bar
    val total = bars.agg(sum("tick_count")).collect()(0).getLong(0)
    assert(total == 3000)
  }

  test("salted two-stage bars equal the single-shuffle bars exactly") {
    val ticks = TickGenerator.batch(spark, 5000)
    val plain  = BarAggregator.bars1m(ticks).collect().map(_.toString).sorted
    Seq(1, 3, 16).foreach { buckets =>
      val salted = BarAggregator.bars1mSalted(ticks, buckets)
        .collect().map(_.toString).sorted
      assert(salted.toSeq == plain.toSeq, s"saltBuckets=$buckets")
    }
  }
}
