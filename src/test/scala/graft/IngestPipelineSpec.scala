package graft

import graft.streaming.IngestPipeline
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import java.nio.file.Files

/** Consumer-service semantics (S5-S8): parse, validate, DLQ split —
  * batch-level laws plus the full streaming path over a MemoryStream.
  */
class IngestPipelineSpec extends SparkSpec {

  private val good =
    """{"symbol":"AAPL","price":123.45,"volume":1000,"event_time":"2024-01-01T10:00:00+00:00"}"""
  private val yfinance =
    """{"symbol":"MSFT","price":9.99,"open":9.0,"high":10.0,"low":8.5,"close":9.99,
      |"volume":5,"event_time":"2024-01-01T10:00:05+00:00","source":"yfinance"}""".stripMargin.replace("\n", "")
  private val missingPrice =
    """{"symbol":"TSLA","volume":10,"event_time":"2024-01-01T10:00:01+00:00"}"""
  private val malformed = """{"symbol": BROKEN"""

  private def rawDf(values: String*) = {
    import spark.implicits._
    values.toDF("value")
  }

  test("valid shapes parse; both wire formats land as ticks") {
    val ticks = IngestPipeline.validTicks(IngestPipeline.parse(rawDf(good, yfinance))).collect()
    assert(ticks.length == 2)
    val aapl = ticks.find(_.getString(0) == "AAPL").get
    assert(aapl.getDecimal(1) == new java.math.BigDecimal("123.4500"))
    assert(aapl.getLong(2) == 1000L)
  }

  test("malformed JSON and missing required fields divert to the DLQ") {
    val parsed = IngestPipeline.parse(rawDf(good, missingPrice, malformed))
    assert(IngestPipeline.validTicks(parsed).count() == 1)
    val dlq = IngestPipeline.failedEvents(parsed).collect()
    assert(dlq.length == 2)
    val reasons = dlq.map(r => r.getString(4) -> r.getString(5)).toMap
    assert(reasons(missingPrice).contains("missing required field: price"))
    assert(reasons(malformed).contains("malformed JSON"))
  }

  test("streaming dedup drops at-least-once replays within the watermark") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[String]
    val ticks = IngestPipeline.validTicks(IngestPipeline.parse(input.toDF()))
    val query = IngestPipeline.dedupTicks(ticks).writeStream
      .format("memory").queryName("dedup_out").outputMode("append").start()
    try {
      input.addData(good, good) // same-batch replay
      query.processAllAvailable()
      input.addData(good)       // cross-batch replay within the horizon
      query.processAllAvailable()
      assert(spark.table("dedup_out").count() == 1)
    } finally query.stop()
  }

  test("streaming end-to-end: MemoryStream → foreachBatch → parquet sinks") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input  = MemoryStream[String]
    val tmp    = Files.createTempDirectory("ingest").toString
    val query = IngestPipeline.run(
      input.toDF().withColumnRenamed("value", "value"),
      s"$tmp/ticks", s"$tmp/dlq", s"$tmp/chk", Trigger.AvailableNow())

    input.addData(good, yfinance, missingPrice, malformed)
    query.processAllAvailable()
    query.stop()

    assert(spark.read.parquet(s"$tmp/ticks").count() == 2)
    val dlq = spark.read.parquet(s"$tmp/dlq")
    assert(dlq.count() == 2)
    assert(dlq.columns.toSeq ==
      Seq("source", "topic", "partition", "offset", "raw_value", "error_message"))
  }
}
