package graft

import graft.analytics.TextAnalytics

/** Laws for CCNet-style boilerplate-line removal: a 5-token segment whose
  * distinct-doc frequency reaches 3 is removed from EVERY document (no
  * occurrence is canonical), while df ≤ 2 segments all survive — the
  * frequency-threshold complement of passage_dedup's keep-first and
  * span_removal's excise-all-duplicated-runs.
  */
class LineDedupSpec extends SparkSpec {

  private def mk(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  // Lines are non-overlapping 5-token segments. `boiler` appears in docs
  // 1, 2 and 3 (df=3 → dropped everywhere, including from its "first"
  // owner); `pair` appears in docs 4 and 5 (df=2 → kept in both); doc 6
  // is unique; doc 7 is boilerplate-only.
  private val boiler = "c1 c2 c3 c4 c5"
  private val pair   = "p1 p2 p3 p4 p5"
  private lazy val crafted = mk(Seq(
    1L -> (boiler + " a1 a2 a3 a4 a5"),
    2L -> ("b1 b2 b3 b4 b5 " + boiler),
    3L -> (boiler + " " + pair.replace("p", "x")),
    4L -> pair,
    5L -> (pair + " d1 d2 d3 d4 d5"),
    6L -> "u1 u2 u3 u4 u5 u6 u7",
    7L -> boiler))

  test("crafted corpus: df>=3 segments drop everywhere, df<=2 survive intact") {
    val got = TextAnalytics.lineDedupOn(crafted)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3)))
    assert(got.toSeq == Seq(
      (1L, "a1 a2 a3 a4 a5", 1, 2),               // boilerplate gone, rest kept
      (2L, "b1 b2 b3 b4 b5", 1, 2),
      (3L, "x1 x2 x3 x4 x5", 1, 2),
      (4L, pair, 1, 1),                            // df=2: both copies kept
      (5L, pair + " d1 d2 d3 d4 d5", 2, 2),
      (6L, "u1 u2 u3 u4 u5 u6 u7", 2, 2),          // unique text untouched
      (7L, "", 0, 1)))                             // boilerplate-only doc empties
  }

  test("no segment reaches the df threshold => identity on every doc") {
    val docs = mk(Seq(
      1L -> "a1 a2 a3 a4 a5 a6",
      2L -> "b1 b2 b3 b4 b5",
      3L -> "a1 a2 a3 a4 a5"))                     // df=2 with doc 1's first segment
    val got = TextAnalytics.lineDedupOn(docs)
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got == Map(
      1L -> "a1 a2 a3 a4 a5 a6",
      2L -> "b1 b2 b3 b4 b5",
      3L -> "a1 a2 a3 a4 a5"))
  }

  test("sf0.001 corpus: removal is exactly the df>=3 segment set, conservation holds") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val out  = TextAnalytics.lineDedupOn(docs)
    // conservation: kept_segs <= total_segs everywhere, and the corpus-wide
    // dropped count equals the total occurrences of df>=3 segments
    val segs = docs
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .select(col("doc_id"), posexplode(expr(
        "transform(sequence(0, (size(t) + 4) div 5 - 1), i -> concat_ws(' ', slice(t, i * 5 + 1, 5)))")))
    val df3occ = segs.groupBy(col("col"))
      .agg(countDistinct(col("doc_id")).as("df"), count(lit(1)).as("occ"))
      .filter(col("df") >= 3)
      .agg(coalesce(sum(col("occ")), lit(0L))).collect()(0).getLong(0)
    val (kept, total) = {
      val r = out.agg(sum(col("kept_segs")), sum(col("total_segs"))).collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    assert(total - kept == df3occ)
    assert(out.filter(col("kept_segs") > col("total_segs")).count() == 0)
    assert(out.count() == docs.count())            // every doc is represented
  }

  test("repetition_trim: later intra-doc copies drop, first kept in place; other docs untouched") {
    // doc 10 repeats segment r* three times around a unique middle; the
    // SAME segment also appears in doc 11 — cross-doc copies must
    // survive (within-doc semantics only). doc 12 has no repeats.
    val rep = "r1 r2 r3 r4 r5"
    val docs = mk(Seq(
      10L -> (rep + " m1 m2 m3 m4 m5 " + rep + " " + rep),
      11L -> (rep + " k1 k2 k3 k4 k5"),
      12L -> "n1 n2 n3 n4 n5 n6 n7"))
    val got = TextAnalytics.repetitionTrimOn(docs)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3), r.getInt(4)))
    assert(got.toSeq == Seq(
      (10L, rep + " m1 m2 m3 m4 m5", 2, 4, 2),  // first copy kept IN ORDER, 2 later copies dropped
      (11L, rep + " k1 k2 k3 k4 k5", 2, 2, 0),  // cross-doc copy untouched
      (12L, "n1 n2 n3 n4 n5 n6 n7", 2, 2, 0)))  // trailing short segment survives
  }
}
