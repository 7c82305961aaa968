package graft

import graft.analytics.TextAnalytics
import graft.similarity.Similarity

/** Planted laws for the round-9d operators: vocab_coverage and
  * decontam_semantic.
  */
class Round9dOpsSpec extends SparkSpec {

  import spark.implicits._

  test("vocab_coverage: the top-20 cut defines OOV; permille is exact integer") {
    // 20 common tokens t01..t20 at count ≥ 5 (five filler docs) and rare
    // tokens x1/x2/x3 at count 1 — the top-20 vocabulary is exactly
    // t01..t20, every x token is OOV.
    val common  = (1 to 20).map(i => f"t$i%02d")
    val fillers = (0 until 5).map(k => (100L + k, common.mkString(" ")))
    val probe   = (1L, "t01 t02 x1 x2")
    val rares   = (2L, "x3 t03")
    val docs = (fillers :+ probe :+ rares).toDF("doc_id", "text")
    val got = TextAnalytics.vocabCoverageOn(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byId = got.map(t => t._1 -> t).toMap
    assert(byId(1L) == ((1L, 4L, 2L, 500L)))     // x1 + x2 OOV → 2/4 = 500 pm
    assert(byId(2L) == ((2L, 2L, 1L, 500L)))     // x3 OOV
    assert(byId(100L) == ((100L, 20L, 0L, 0L)))  // filler: fully covered
  }

  test("quality_gate: exact disc-percentile cutoff per source; strictly-below docs dropped") {
    // All-distinct no-stopword docs make qi hand-computable:
    // qi = round((min(n/100,1)·0.4 + 0.4 + 0.2)·10000) → n=10: 6400,
    // n=20: 6800, n≥100: 10000.
    def doc(id: Long, src: String, n: Int) =
      (id, src, (1 to n).map(i => s"w${id}_$i").mkString(" "))
    val s = doc(1L, "s", 10) +: (2L to 10L).map(doc(_, "s", 100))
    // source t: one doc at 6400, one at 6800, 18 at 10000 → n=20,
    // ceil(20/10)=2 ⇒ cum reaches 2 at qi=6800 ⇒ cut 6800, drop the 6400 doc
    val t = Seq(doc(100L, "t", 10), doc(101L, "t", 20)) ++ (102L to 119L).map(doc(_, "t", 100))
    val docs = (s ++ t).toDF("doc_id", "source", "text")
    val got = TextAnalytics.qualityGateOn(docs)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // source s: n=10, ceil(10/10)=1 ⇒ cut = lowest qi cell (6400), nothing
    // strictly below it ⇒ dropped 0 — the cut doc itself is KEPT
    assert(got.toSeq == Seq(("s", 10L, 6400L, 0L), ("t", 20L, 6800L, 1L)))
  }

  test("source_rebalance: sqrt temperature flattens the head and lifts the tail") {
    // sources with 16 / 4 / 1 tokens → weights 4 / 2 / 1, tw = 7
    val docs = Seq(
      (1L, "a", (1 to 16).map(i => s"x$i").mkString(" ")),
      (2L, "b", (1 to 4).map(i => s"y$i").mkString(" ")),
      (3L, "c", "z1"))
      .toDF("doc_id", "source", "text")
    val got = TextAnalytics.sourceRebalanceOn(docs)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      ("a", 16L, 4L, 571L), ("b", 4L, 2L, 285L), ("c", 1L, 1L, 142L)))
    // temperature law: head share below natural proportion, tail above
    assert(571 < 16 * 1000 / 21 && 142 > 1 * 1000 / 21)
  }

  test("decontam_semantic: identical train vec flags, orthogonal does not, hits count eval vecs") {
    // 64-dim basis vectors; eval ids are % 10 == 0.
    def basis(i: Int): Array[Float] = Array.tabulate(64)(d => if (d == i) 1f else 0f)
    def mix(i: Int, j: Int): Array[Float] =
      Array.tabulate(64)(d => if (d == i || d == j) 1f else 0f) // cos 1/sqrt(2) to both
    val rows = Seq(
      (10L, basis(0)), (20L, basis(1)),     // eval
      (1L, basis(0)),                       // identical to eval 10 → 1 hit, cos 1.0
      (2L, basis(5)),                       // orthogonal → unflagged
      (3L, mix(0, 1)))                      // cos ≈ .707 to BOTH evals → 2 hits
      .toDF("vec_id", "embedding")
    val got = Similarity.decontamSemanticOn(Similarity.withNorms(rows))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.map(_._1).toSeq == Seq(1L, 3L))
    val m = got.map(t => t._1 -> t).toMap
    assert(m(1L)._2 == 1L && math.abs(m(1L)._3 - 1.0) < 1e-12)
    assert(m(3L)._2 == 2L && math.abs(m(3L)._3 - math.sqrt(0.5)) < 1e-12)
  }
}
