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
      Seq("source", "topic", "partition", "offset", "raw_value", "error_message", "batch_id"))
  }

  test("kill-and-restart: checkpoint recovery is exactly-once (ST5)") {
    import java.nio.file.{Files => JFiles, Paths}
    val tmp = Files.createTempDirectory("ingest_recover").toString
    val srcDir = s"$tmp/src"
    new java.io.File(srcDir).mkdirs()
    def writeFile(name: String, lines: String*): Unit =
      JFiles.writeString(Paths.get(s"$srcDir/$name"), lines.mkString("\n"))
    def fileSource = spark.readStream.format("text")
      .load(srcDir).withColumnRenamed("value", "value")
    def runOnce(): Unit = {
      val q = IngestPipeline.run(fileSource, s"$tmp/ticks", s"$tmp/dlq",
        s"$tmp/chk", Trigger.AvailableNow())
      q.awaitTermination()
    }

    // run 1: two valid ticks
    writeFile("a.json", good, yfinance)
    runOnce()
    assert(spark.read.parquet(s"$tmp/ticks").count() == 2)

    // simulate a crash INSIDE the at-least-once window: the sink write
    // landed but the checkpoint commit didn't — delete the commit marker,
    // so the restart MUST replay the batch with the same batch id
    val commits = new java.io.File(s"$tmp/chk/commits").listFiles()
      .map(_.getName).filterNot(_.startsWith("."))
    JFiles.delete(Paths.get(s"$tmp/chk/commits/${commits.max}"))
    // also drop the local-FS checksum sidecar, or the re-written commit
    // fails its rename against the stale crc
    JFiles.deleteIfExists(Paths.get(s"$tmp/chk/commits/.${commits.max}.crc"))
    runOnce()
    // replayed batch overwrote its own partition: still 2, not 4
    assert(spark.read.parquet(s"$tmp/ticks").count() == 2)

    // run 3: new data after recovery processes exactly once; old batches
    // are not re-read (offsets committed)
    writeFile("b.json", missingPrice, malformed,
      """{"symbol":"NVDA","price":1.23,"volume":7,"event_time":"2024-01-01T10:00:09+00:00"}""")
    runOnce()
    val ticks = spark.read.parquet(s"$tmp/ticks")
    assert(ticks.count() == 3)
    assert(ticks.filter("symbol = 'NVDA'").count() == 1)
    assert(spark.read.parquet(s"$tmp/dlq").count() == 2)

    // run 4: nothing new — counts unchanged
    runOnce()
    assert(spark.read.parquet(s"$tmp/ticks").count() == 3)
    assert(spark.read.parquet(s"$tmp/dlq").count() == 2)
  }
}
