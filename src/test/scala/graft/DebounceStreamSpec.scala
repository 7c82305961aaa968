package graft

import graft.operators.Debounce
import graft.streaming.DebounceStream
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Laws for the streaming debounce state machine. */
class DebounceStreamSpec extends SparkSpec {
  import spark.implicits._

  // (user_id, event_id, sec) — event_type fixed, gap = 60 s in the fixtures
  private type Row = (Long, Long, Long, String)

  private def toEvents(rows: Seq[(Long, Long, Long)]): Seq[Row] =
    rows.map { case (u, e, s) => (u, e, s * 1000000L, "click") }

  private def run(batches: Seq[Seq[Row]], gapSec: Long): Seq[Long] = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Row]
    val events = input.toDF()
      .toDF("user_id", "event_id", "tsu0", "event_type")
      .select(col("user_id"), col("event_id"),
        timestamp_micros(col("tsu0")).cast("timestamp_ntz").as("ts"),
        col("event_type"))
    val name = s"debounce_sink_${System.nanoTime()}"
    val query = DebounceStream.debounced(events, gapSec).writeStream
      .format("memory").queryName(name).outputMode("append").start()
    try {
      batches.foreach { b =>
        if (b.nonEmpty) input.addData(b: _*)
        query.processAllAvailable()
      }
      spark.table(name).select("event_id").as[Long].collect().toSeq.sorted
    } finally query.stop()
  }

  private def batchKept(rows: Seq[Row], gapSec: Long): Seq[Long] = {
    val events: DataFrame = rows
      .toDF("user_id", "event_id", "tsu0", "event_type")
      .select(col("user_id"), col("event_id"),
        timestamp_micros(col("tsu0")).cast("timestamp_ntz").as("ts"),
        col("event_type"))
    Debounce.eventsDebounceOn(events, gapSec)
      .select("event_id").as[Long].collect().toSeq.sorted
  }

  test("in-order delivery: streamed kept set equals the batch operator for any batch split") {
    // two users, 60 s gap; events span several keep/drop transitions
    val all = toEvents(Seq(
      (1L, 1L, 0L), (1L, 2L, 30L), (1L, 3L, 61L), (1L, 4L, 90L), (1L, 5L, 200L),
      (2L, 6L, 10L), (2L, 7L, 69L), (2L, 8L, 70L), (2L, 9L, 131L)))
    val expected = batchKept(all, 60L)
    // three different micro-batch splits of the SAME in-order stream
    Seq(
      Seq(all),
      Seq(all.take(3), all.slice(3, 6), all.drop(6)),
      all.grouped(1).toSeq
    ).foreach { split =>
      assert(run(split, 60L) == expected, s"split sizes ${split.map(_.size)}")
    }
  }

  test("corpus: streamed over three time-banded batches equals the batch entry") {
    val raw = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts").cast("timestamp")).as("tsu"), col("event_type"))
      .as[Row].collect().toSeq.sortBy(e => (e._3, e._2))
    val expected = Debounce
      .eventsDebounce(spark, "/root/testdata/sf0.001")
      .select("event_id").as[Long].collect().toSeq.sorted
    val third = raw.size / 3
    val got = run(Seq(raw.take(third), raw.slice(third, 2 * third),
      raw.drop(2 * third)), Debounce.GapSec)
    assert(got == expected)
  }

  test("replayed kept events are suppressed (at-least-once upstream cannot double-fire)") {
    val b0 = toEvents(Seq((1L, 1L, 0L), (1L, 2L, 61L)))
    val got = run(Seq(b0, b0), 60L) // full replay of the same batch
    assert(got == Seq(1L, 2L))
  }

  test("late arrival older than the last kept event is suppressed") {
    val got = run(Seq(
      toEvents(Seq((1L, 1L, 100L))),
      toEvents(Seq((1L, 2L, 30L)))), 60L) // late: 30 s < last kept 100 s
    assert(got == Seq(1L))
  }
}
