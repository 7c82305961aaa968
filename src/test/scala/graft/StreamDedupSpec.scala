package graft

import graft.streaming.IngestPipeline
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import java.sql.Timestamp

/** Bounded-state laws for [[IngestPipeline.dedupTicks]]
  * (`dropDuplicatesWithinWatermark`) beyond IngestPipelineSpec's basic
  * replay-drop test: state is EVICTED once the watermark passes
  * (asserted via the state-operator metrics), and a post-eviction replay
  * of an old key is watermark-late by construction, so the lateness
  * filter drops it — output stays exactly-once per key even after its
  * dedup state is gone, while memory stays O(keys per watermark window)
  * for the lifetime of the query.
  */
class StreamDedupSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("duplicates drop across batches; state evicts at the watermark; late replay re-admits") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(String, Double, Timestamp)]
    val ticks = in.toDF().toDF("symbol", "price", "event_time")

    val query = IngestPipeline.dedupTicks(ticks, replayHorizon = "2 minutes")
      .writeStream.format("memory").queryName("stream_dedup")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(("AAPL", 10.0, ts("2024-01-01 10:00:00")),
                 ("AAPL", 10.0, ts("2024-01-01 10:00:00")))   // in-batch dup
      query.processAllAvailable()
      in.addData(("AAPL", 10.5, ts("2024-01-01 10:00:00")),   // cross-batch dup (same key)
                 ("MSFT", 20.0, ts("2024-01-01 10:00:30")))
      query.processAllAvailable()
      val afterDups = spark.table("stream_dedup").collect()
        .map(r => (r.getString(0), r.getTimestamp(2))).toSeq
      assert(afterDups.sorted == Seq(
        ("AAPL", ts("2024-01-01 10:00:00")), ("MSFT", ts("2024-01-01 10:00:30"))))

      // advance event time far beyond the 2-minute lateness: watermark
      // passes the old keys and their state is evicted
      in.addData(("GOOG", 1.0, ts("2024-01-01 10:30:00")))
      query.processAllAvailable()
      in.addData(("GOOG", 1.0, ts("2024-01-01 10:31:00")))
      query.processAllAvailable()
      val stateRows = query.lastProgress.stateOperators(0).numRowsTotal
      assert(stateRows < 4, s"state not evicted: $stateRows rows")  // old keys gone

      // a post-eviction replay of the old key carries a watermark-late
      // event_time (eviction happens exactly when the watermark passes
      // it), so the lateness filter discards it — the key's output stays
      // exactly-once even though its dedup state is gone
      in.addData(("AAPL", 11.0, ts("2024-01-01 10:00:00")))
      query.processAllAvailable()
      val replays = spark.table("stream_dedup").collect()
        .count(r => r.getString(0) == "AAPL" && r.getTimestamp(2) == ts("2024-01-01 10:00:00"))
      assert(replays == 1, s"late replay must be dropped, got $replays rows")
    } finally query.stop()
  }
}
