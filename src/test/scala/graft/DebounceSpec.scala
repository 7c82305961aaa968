package graft

import graft.operators.Debounce
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Laws for per-user event debouncing (`events_debounce`). */
class DebounceSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def ev(rows: Seq[(Long, Long, String)]): DataFrame =
    rows.toDF("event_id", "user_id", "tss")
      .select(col("event_id"), col("user_id"),
        to_timestamp(col("tss")).cast("timestamp_ntz").as("ts"),
        lit("click").as("event_type"))

  test("debounce is NOT sessionization: the separating example") {
    // events at t = 0, 30, 61 s with a 60 s gap: debounce keeps {0, 61}
    // (61 >= 0 + 60); a gap-based session split would keep only {0}
    val events = ev(Seq(
      (1L, 1L, "2024-01-01 00:00:00"),
      (2L, 1L, "2024-01-01 00:00:30"),
      (3L, 1L, "2024-01-01 00:01:01")))
    val kept = Debounce.eventsDebounceOn(events, gapSec = 60L)
      .select("event_id").as[Long].collect().toSeq
    assert(kept == Seq(1L, 3L))
  }

  test("ties and multi-user isolation") {
    val events = ev(Seq(
      // user 1: two events at the SAME ts — event_id breaks the tie,
      // first kept, second dropped; a third exactly at the gap boundary
      (1L, 1L, "2024-01-01 00:00:00"),
      (2L, 1L, "2024-01-01 00:00:00"),
      (3L, 1L, "2024-01-01 00:01:00"),
      // user 2's chain is independent of user 1's
      (4L, 2L, "2024-01-01 00:00:59")))
    val kept = Debounce.eventsDebounceOn(events, gapSec = 60L)
      .select("event_id").as[Long].collect().toSeq
    assert(kept == Seq(1L, 3L, 4L))
  }

  test("corpus: kept chain equals a sequential driver-side recompute") {
    val events = Tables.events(spark, sf)
    val all = events
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts").cast("timestamp")).as("tsu"))
      .as[(Long, Long, Long)].collect().toSeq
    val gap = Debounce.GapSec * 1000000L
    val expected = all.groupBy(_._1).flatMap { case (_, xs) =>
      val sorted = xs.sortBy(e => (e._3, e._2))
      var lastKept = Long.MinValue
      sorted.flatMap { e =>
        if (lastKept == Long.MinValue || e._3 >= lastKept + gap) {
          lastKept = e._3; Some(e._2)
        } else None
      }
    }.toSet
    val got = Debounce.eventsDebounce(spark, sf)
      .select("event_id").as[Long].collect().toSet
    assert(got.nonEmpty && got.size < all.size, "fixture must actually drop events")
    assert(got == expected)
  }

  test("soundness + completeness directly against the input stream") {
    val events = Tables.events(spark, sf)
    val keptIds = Debounce.eventsDebounce(spark, sf)
      .select("event_id").as[Long].collect().toSet
    val gap = Debounce.GapSec * 1000000L
    val byUser = events
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts").cast("timestamp")).as("tsu"))
      .as[(Long, Long, Long)].collect().toSeq
      .groupBy(_._1).values
    byUser.foreach { xs =>
      val sorted = xs.sortBy(e => (e._3, e._2))
      // first event per user always kept
      assert(keptIds(sorted.head._2))
      // consecutive KEPT events are >= gap apart (soundness)
      val kept = sorted.filter(e => keptIds(e._2))
      kept.sliding(2).foreach {
        case Seq(a, b) => assert(b._3 >= a._3 + gap)
        case _         =>
      }
      // every dropped event is < gap after its preceding kept event
      // (completeness: nothing was over-dropped)
      var lastKept = Long.MinValue
      sorted.foreach { e =>
        if (keptIds(e._2)) lastKept = e._3
        else assert(e._3 < lastKept + gap, s"event ${e._2} over-dropped")
      }
    }
  }
}
