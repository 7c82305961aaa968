package graft

import graft.analytics.StarAnalytics
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Laws for the point-in-time SCD2 enrichment (`scd2_lookup`): the as-of
  * formulation must equal the brute range-predicate join over the interval
  * table, including the zero-width-interval and pre-history edges.
  */
class Scd2LookupSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def ev(rows: Seq[(Long, String, Long, String, Double)]): DataFrame =
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("ts", to_timestamp(col("ts")))

  /** Brute reference: range-predicate LEFT join against the (non-empty)
    * interval table — the quadratic shape the as-of merge replaces.
    */
  private def brute(events: DataFrame): DataFrame = {
    val iv = StarAnalytics
      .scd2IntervalsOn(events.filter(col("event_type") =!= "purchase"))
      .filter(col("valid_to").isNull || col("valid_from") < col("valid_to"))
    val facts = events.filter(col("event_type") === "purchase")
      .select("user_id", "event_id", "ts", "value")
    facts.as("f").join(iv.as("i"),
        col("f.user_id") === col("i.user_id") &&
          col("i.valid_from") <= col("f.ts") &&
          (col("i.valid_to").isNull || col("f.ts") < col("i.valid_to")),
        "left")
      .select(col("f.user_id"), col("f.event_id"), col("f.ts"), col("f.value"),
        col("i.version"), col("i.state"))
      .orderBy("user_id", "ts", "event_id")
  }

  private def rows(df: DataFrame): Seq[(Long, Long, Option[Long], Option[String])] =
    df.select(col("user_id"), col("event_id"), col("version"), col("state"))
      .as[(Long, Long, Option[Long], Option[String])].collect().toSeq

  test("as-of lookup equals the brute range join on the corpus") {
    val events = Tables.events(spark, sf)
    val got = rows(StarAnalytics.scd2LookupOn(events))
    val exp = rows(brute(events))
    assert(got.nonEmpty)
    assert(got == exp)
  }

  test("every purchase appears exactly once (intervals tile, never overlap)") {
    val events = Tables.events(spark, sf)
    val nPurch = events.filter(col("event_type") === "purchase").count()
    val out = StarAnalytics.scd2LookupOn(events)
    assert(out.count() == nPurch)
    assert(out.select("event_id").distinct().count() == nPurch)
  }

  test("looked-up state is the event_type of the latest dimension event <= ts") {
    // direct one-window alternative, no interval table at all
    val events = Tables.events(spark, sf)
    val dim = events.filter(col("event_type") =!= "purchase")
      .select(col("user_id"), col("ts").as("dts"), col("event_type"))
    val exp = graft.plans.AsofJoin.asofJoin(
        events.filter(col("event_type") === "purchase")
          .select("user_id", "event_id", "ts"),
        dim, "user_id", "ts", "dts")
      .select(col("event_id"), col("event_type").as("state"))
      .as[(Long, Option[String])].collect().toMap
    val got = StarAnalytics.scd2LookupOn(events)
      .select(col("event_id"), col("state"))
      .as[(Long, Option[String])].collect().toMap
    assert(got == exp)
  }

  test("edges: zero-width interval, pre-history fact, boundary timestamps") {
    val events = ev(Seq(
      // user 1: signup and error at the SAME ts — the signup island is
      // the zero-width [t, t) interval; a purchase at t belongs to the
      // error state (version 2)
      (1L, "2024-01-01 10:00:00", 1L, "signup", 0.0),
      (2L, "2024-01-01 10:00:00", 1L, "error", 0.0),
      (3L, "2024-01-01 10:00:00", 1L, "purchase", 5.0),
      // user 2: purchase BEFORE any dimension event -> NULL state;
      // purchase exactly at valid_from -> matched (inclusive start)
      (4L, "2024-01-01 09:00:00", 2L, "purchase", 1.0),
      (5L, "2024-01-01 09:30:00", 2L, "click", 0.0),
      (6L, "2024-01-01 09:30:00", 2L, "purchase", 2.0),
      (7L, "2024-01-01 11:00:00", 2L, "purchase", 3.0),
      // user 3: state change; purchase at the change ts goes to the NEW
      // state (exclusive end of the previous interval)
      (8L, "2024-01-01 08:00:00", 3L, "view", 0.0),
      (9L, "2024-01-01 09:00:00", 3L, "error", 0.0),
      (10L, "2024-01-01 08:30:00", 3L, "purchase", 1.0),
      (11L, "2024-01-01 09:00:00", 3L, "purchase", 2.0),
      (12L, "2024-01-01 10:00:00", 3L, "purchase", 3.0)))
    val got = rows(StarAnalytics.scd2LookupOn(events))
    val exp = rows(brute(events))
    assert(got == exp)
    val byId = got.map(r => r._2 -> (r._3, r._4)).toMap
    assert(byId(3L) == (Some(2L), Some("error")))
    assert(byId(4L) == (None, None))
    assert(byId(6L) == (Some(1L), Some("click")))
    assert(byId(7L) == (Some(1L), Some("click")))
    assert(byId(10L) == (Some(1L), Some("view")))
    assert(byId(11L) == (Some(2L), Some("error")))
    assert(byId(12L) == (Some(2L), Some("error")))
  }
}
