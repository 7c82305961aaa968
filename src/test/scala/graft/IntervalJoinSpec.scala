package graft

import graft.operators.IntervalJoin
import org.apache.spark.sql.functions._

/** Bucketized interval-join laws: row-for-row equality with the naive
  * range join (inner semantics, no duplication) across bucket widths
  * that divide, exceed, and straddle the interval lengths; and the
  * column-collision guard. Inputs derive from col("id") so constant
  * folding can't pre-solve the plans.
  */
class IntervalJoinSpec extends SparkSpec {

  // 500 points, one per second from epoch; 40 intervals of varying
  // length (7..97 s) every 13 s
  private def points = spark.range(500)
    .select(col("id").as("pid"), timestamp_micros(col("id") * 1000000L).as("pt"))

  private def intervals = spark.range(40)
    .select(col("id").as("iid"),
      timestamp_micros(col("id") * 13000000L).as("s"),
      timestamp_micros(col("id") * 13000000L + (col("id") % 4 + 1) * 24000000L).as("e"))

  test("equals the naive range join for widths below, at, and above interval length") {
    val naive = points.join(intervals,
        col("pt") >= col("s") && col("pt") <= col("e"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(naive.nonEmpty)
    Seq(1L, 10L, 60L, 3600L).foreach { width =>
      val got = IntervalJoin.pointInInterval(points, "pt", intervals, "s", "e", width)
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      assert(got.toSeq == naive.toSeq, s"width=$width diverged from naive range join")
    }
  }

  test("rejects colliding column names instead of silently joining on them") {
    val bad = intervals.withColumnRenamed("iid", "pid")
    intercept[IllegalArgumentException] {
      IntervalJoin.pointInInterval(points, "pt", bad, "s", "e", 60L)
    }
  }
}
