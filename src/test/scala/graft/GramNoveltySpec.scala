package graft

import graft.analytics.TextAnalytics

/** Planted laws for the per-doc corpus-unique-gram novelty signal. */
class GramNoveltySpec extends SparkSpec {

  import spark.implicits._

  test("planted corpus: unique, shared, partially-shared and sub-gram docs score as computed") {
    val a = (1 to 15).map(i => s"a$i").mkString(" ")          // 15 toks → 8 windows
    val b = (1 to 10).map(i => s"b$i").mkString(" ")          // 10 toks → 3 windows
    // first 8-gram identical to doc 1's first window, unique tail
    val partial = (1 to 8).map(i => s"a$i").mkString(" ") + " " +
      (1 to 7).map(i => s"u$i").mkString(" ")
    val short = (1 to 5).map(i => s"s$i").mkString(" ")       // < 8 toks → no grams
    val docs = Seq(1L -> a, 2L -> b, 3L -> b, 4L -> short, 5L -> partial)
      .toDF("doc_id", "text")
    val got = TextAnalytics.gramNoveltyOn(docs)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))
    assert(got.toSeq == Seq(
      (1L, 8L, 7L, 875L),   // window 1 shared with doc 5: 7/8 unique, 7000 div 8
      (2L, 3L, 0L, 0L),     // exact copy of doc 3: nothing unique
      (3L, 3L, 0L, 0L),
      (4L, 0L, 0L, -1L),    // sub-8-token doc: no grams, NULL permille
      (5L, 8L, 7L, 875L)))
  }
}
