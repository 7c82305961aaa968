package graft

import graft.analytics.StarAnalytics
import graft.streaming.Scd2Ingest
import graft.streaming.Scd2Ingest.Scd2Store
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact laws of the streamed SCD Type-2 tier: after any prefix of
  * batches the merged store equals the batch rebuild bit-for-bit,
  * replay is a no-op, and compaction preserves the view.
  */
class Scd2IngestSpec extends SparkSpec {
  import spark.implicits._

  private def mkEvents(rows: Seq[(Long, Long, Long, String)]): DataFrame =
    rows.toDF("user_id", "event_id", "sec", "event_type")
      .select(col("user_id"), col("event_id"),
        timestamp_seconds(col("sec")).as("ts"), col("event_type"))

  private def norm(df: DataFrame): Seq[String] =
    df.select("user_id", "version", "state", "valid_from", "valid_to",
        "n_events", "is_current")
      .collect().map(_.toString).sorted.toSeq

  private def freshStore(): Scd2Store =
    Scd2Store(java.nio.file.Files.createTempDirectory("scd2_store").toString + "/intervals")

  // batch boundaries exercise: run extension (A: b→b), state change at
  // the boundary (A: b→c), plain extension (B: x→x), a user appearing
  // only later (C), and a user never touched again (D).
  private val b0 = Seq((1L, 1L, 10L, "a"), (1L, 2L, 20L, "a"), (1L, 3L, 30L, "b"),
    (2L, 4L, 10L, "x"), (4L, 5L, 15L, "z"))
  private val b1 = Seq((1L, 6L, 40L, "b"), (1L, 7L, 50L, "c"), (2L, 8L, 25L, "x"))
  private val b2 = Seq((3L, 9L, 100L, "q"), (1L, 10L, 60L, "c"))

  test("after every batch prefix, the merged store equals the batch rebuild") {
    val store = freshStore()
    val batches = Seq(b0, b1, b2)
    batches.zipWithIndex.foreach { case (b, i) =>
      Scd2Ingest.processBatch(mkEvents(b), i.toLong, store)
      val expected = StarAnalytics.scd2IntervalsOn(
        mkEvents(batches.take(i + 1).flatten))
      assert(norm(Scd2Ingest.current(spark, store)) == norm(expected),
        s"prefix through batch $i")
    }
  }

  test("replaying a batch is a no-op") {
    val store = freshStore()
    Scd2Ingest.processBatch(mkEvents(b0), 0L, store)
    Scd2Ingest.processBatch(mkEvents(b1), 1L, store)
    val before = norm(Scd2Ingest.current(spark, store))
    Scd2Ingest.processBatch(mkEvents(b1), 1L, store) // replay
    assert(norm(Scd2Ingest.current(spark, store)) == before)
  }

  test("compaction preserves the view and later batches still merge exactly") {
    val store = freshStore()
    Scd2Ingest.processBatch(mkEvents(b0), 0L, store)
    Scd2Ingest.processBatch(mkEvents(b1), 1L, store)
    val before = norm(Scd2Ingest.current(spark, store))
    Scd2Ingest.compact(spark, store)
    assert(norm(Scd2Ingest.current(spark, store)) == before, "compaction changed the view")
    Scd2Ingest.processBatch(mkEvents(b2), 2L, store)
    val expected = StarAnalytics.scd2IntervalsOn(mkEvents(b0 ++ b1 ++ b2))
    assert(norm(Scd2Ingest.current(spark, store)) == norm(expected))
  }

  test("real corpus: three time-banded batches reproduce the oracle entry") {
    val sf = "/root/testdata/sf0.001"
    val store = freshStore()
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .localCheckpoint()
    // band on ts via a per-user-safe GLOBAL time split: quantiles of ts
    // (cast through LTZ: the session tz is UTC, so the mapping is exact)
    val us = expr("unix_micros(cast(ts as timestamp))")
    val cuts = ev.select(us.as("us")).stat.approxQuantile("us", Array(0.33, 0.66), 0.0)
    val bands = Seq(
      ev.filter(us <= cuts(0)),
      ev.filter(us > cuts(0) && us <= cuts(1)),
      ev.filter(us > cuts(1)))
    bands.zipWithIndex.foreach { case (b, i) =>
      Scd2Ingest.processBatch(b, i.toLong, store)
    }
    assert(norm(Scd2Ingest.current(spark, store)) ==
      norm(StarAnalytics.scd2Intervals(spark, sf)))
  }
}
