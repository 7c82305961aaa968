package graft

import graft.analytics.TextAnalytics
import org.apache.spark.sql.functions._

/** Laws for keep-first duplicate-passage removal (the C4-style keep-one
  * complement of span_removal): exact keep/drop decisions on a crafted
  * corpus, pass-through of unique text, and the conservation law —
  * the corpus-wide kept-segment count equals the number of DISTINCT
  * passages (exactly one survivor per passage value).
  */
class PassageDedupSpec extends SparkSpec {

  private val Sf = "/root/testdata/sf0.001"

  private def mk(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  // Passages are non-overlapping 10-token windows. Doc 1's single passage
  // reappears as doc 2's FIRST window and doc 3's whole text; doc 4 is
  // unique; doc 5 repeats doc 1's passage in its SECOND window.
  private val shared = "s1 s2 s3 s4 s5 s6 s7 s8 s9 s10"
  private lazy val crafted = mk(Seq(
    1L -> shared,
    2L -> (shared + " b1 b2 b3 b4 b5 b6 b7 b8 b9 b10"),
    3L -> shared,
    4L -> "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10 u11 u12",
    5L -> ("e1 e2 e3 e4 e5 e6 e7 e8 e9 e10 " + shared)))

  test("crafted corpus: first occurrence survives, later copies drop") {
    val got = TextAnalytics.passageDedupOn(crafted)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3)))
    assert(got.toSeq == Seq(
      (1L, shared, 1, 1),                                     // first owner keeps it
      (2L, "b1 b2 b3 b4 b5 b6 b7 b8 b9 b10", 1, 2),           // window 0 dropped
      (3L, "", 0, 1),                                         // whole doc was a dup
      (4L, "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10 u11 u12", 2, 2),   // untouched
      (5L, "e1 e2 e3 e4 e5 e6 e7 e8 e9 e10", 1, 2)))          // trailing dup dropped
  }

  test("conservation: corpus-wide kept count equals distinct passage count") {
    val docs = Tables.documents(spark, Sf)
    val out = TextAnalytics.passageDedupOn(docs)
    val kept = out.agg(sum("kept_segs")).collect()(0).getLong(0)
    val P = 10
    val distinctPassages = docs
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .select(explode(expr(
        s"transform(sequence(0, (size(t) + ${P - 1}) div $P - 1), i -> concat_ws(' ', slice(t, i * $P + 1, $P)))")).as("g"))
      .select(countDistinct("g")).collect()(0).getLong(0)
    assert(kept == distinctPassages)
  }

  test("unique-text doc round-trips unchanged; kept never exceeds total") {
    val out = TextAnalytics.passageDedupOn(crafted).collect()
    assert(out.forall(r => r.getInt(2) <= r.getInt(3)))
    val doc4 = out.find(_.getLong(0) == 4L).get
    assert(doc4.getString(1) == "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10 u11 u12")
  }
}
