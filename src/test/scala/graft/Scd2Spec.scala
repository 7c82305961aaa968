package graft

import graft.analytics.StarAnalytics
import org.apache.spark.sql.functions._

/** Laws for the SCD Type-2 interval build (`scd2_intervals`). */
class Scd2Spec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def out = StarAnalytics.scd2Intervals(spark, sf).collect()
    .map(r => (r.getLong(r.fieldIndex("user_id")),
      r.getLong(r.fieldIndex("version")),
      r.getString(r.fieldIndex("state")),
      Option(r.get(r.fieldIndex("valid_from"))),
      Option(r.get(r.fieldIndex("valid_to"))),
      r.getLong(r.fieldIndex("n_events"))))

  test("intervals tile the per-user timeline: each valid_to is the next valid_from") {
    val byUser = out.groupBy(_._1)
    assert(byUser.nonEmpty)
    byUser.foreach { case (u, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1L to sorted.length).toSeq, s"user $u versions")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._5.contains(b._4.get), s"user $u: interval gap at version ${a._2}")
        case _ => ()
      }
      assert(sorted.last._5.isEmpty, s"user $u: last interval must be open")
      assert(sorted.init.forall(_._5.nonEmpty), s"user $u: only the last is open")
    }
  }

  test("change suppression: adjacent intervals always differ in state") {
    out.groupBy(_._1).foreach { case (u, rows) =>
      rows.sortBy(_._2).sliding(2).foreach {
        case Array(a, b) => assert(a._3 != b._3, s"user $u: uncollapsed run at ${a._2}")
        case _ => ()
      }
    }
  }

  test("n_events conserves the event count per user") {
    val expected = Tables.events(spark, sf)
      .groupBy("user_id").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = out.groupBy(_._1).map { case (u, rows) => u -> rows.map(_._6).sum }
    assert(got == expected)
  }

  test("one hash exchange on user_id feeds windows, aggregate and lead") {
    val p = StarAnalytics.scd2Intervals(spark, sf)
      .queryExecution.explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val hashes = "Arguments: hashpartitioning\\(([^,]+)," .r.findAllMatchIn(p).toSeq
    assert(hashes.length == 1, s"expected exactly one hash exchange:\n$p")
    assert(hashes.head.group(1).startsWith("user_id"), hashes.head.group(1))
    // the only range exchange is the presentation ORDER BY
    assert("Arguments: rangepartitioning".r.findAllMatchIn(p).length == 1)
    assert(!p.contains("SinglePartition"), "corpus must never cross a single partition")
  }
}
