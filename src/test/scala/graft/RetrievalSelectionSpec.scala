package graft

import graft.analytics.{RetrievalAnalytics, SelectionAnalytics}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Semantic laws for the retrieval/selection family: BM25 ranks rarity
  * above ubiquity, the blocked inverted index reconstructs exactly,
  * the bigram LM scores a fully-predictable corpus at exactly 0, and
  * DSIR weights order target-vocabulary docs above raw-vocabulary docs.
  * Texts are derived from col("id") so constant folding can't pre-solve
  * the plans.
  */
class RetrievalSelectionSpec extends SparkSpec {

  /** n docs, ids spread across posting blocks (×40), 4-token filler from
    * a 4-word rotating vocab plus the ubiquitous "the the" prefix; doc 0
    * carries one extra corpus-unique term.
    */
  private def mkDocs(n: Int): DataFrame =
    spark.range(n)
      .select((col("id") * 40).as("doc_id"),
        concat(
          lit("the the "),
          concat(lit("w"), col("id") % 4), lit(" "),
          concat(lit("w"), col("id") % 4),
          when(col("id") === 0, lit(" rareterm")).otherwise(lit(""))).as("text"))

  test("bm25_topk: a corpus-unique term outranks frequent fillers for its doc") {
    val out = RetrievalAnalytics.bm25TopkOn(mkDocs(20)).collect()
    val doc0 = out.filter(_.getLong(0) == 0L).sortBy(_.getInt(1))
    assert(doc0.head.getString(2) == "rareterm", s"rank-1 was ${doc0.head.getString(2)}")
    // ranks are 1..k with no gaps, scores weakly decreasing within a doc
    out.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq == (1 to sorted.length))
      assert(sorted.sliding(2).forall {
        case Array(a, b) => a.getDouble(3) >= b.getDouble(3)
        case _           => true
      })
    }
  }

  test("inverted_index: blocks partition postings and reconstruct df exactly") {
    val docs = mkDocs(20)
    val idx = RetrievalAnalytics.invertedIndexOn(docs).collect()
    idx.foreach { r =>
      val (term, block, dfB, postings) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getString(4))
      val entries = postings.split(",")
      assert(entries.length == dfB, s"$term/$block df_block mismatch")
      assert(entries.toSeq == entries.sorted.toSeq, s"$term/$block postings unsorted")
      entries.foreach { e =>
        val docId = e.split(":")(0).toLong
        assert(docId / 64 == block, s"doc $docId filed under block $block")
      }
    }
    // per-term df over blocks == independent document frequency
    val dfFromIdx = idx.groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(2)).sum)
    val dfTrue = docs
      .select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("t"))
      .groupBy("t").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(dfFromIdx.toMap == dfTrue)
  }

  test("lm_bigram: a fully-predictable corpus scores exactly 0; surprise goes negative") {
    import spark.implicits._
    // periodic docs: every history determines its continuation → MLE 1
    val periodic = Seq((1L, "a b a b a"), (2L, "a b a b a")).toDF("doc_id", "text")
    val p = SelectionAnalytics.lmBigramOn(periodic).collect()
    assert(p.length == 2 && p.forall(_.getAs[Double]("avg_logprob") == 0.0))
    // history x continues two ways → both docs carry ln(1/2) on that position
    val forked = Seq((1L, "x y"), (2L, "x z")).toDF("doc_id", "text")
    val f = forked.transform(SelectionAnalytics.lmBigramOn).collect()
    assert(f.forall(_.getAs[Double]("avg_logprob") < 0.0))
  }

  test("dsir_weights: target-vocabulary docs outweigh raw-vocabulary docs") {
    import spark.implicits._
    val docs = (0 until 30).map { i =>
      val id = i.toLong
      if (id % 10 == 0) (id, "alpha beta alpha beta")
      else (id, "gamma delta gamma delta")
    }.toDF("doc_id", "text")
    val w = SelectionAnalytics.dsirWeightsOn(docs).collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("log_weight")).toMap
    val (tgt, raw) = w.partition(_._1 % 10 == 0)
    assert(tgt.values.min > raw.values.max,
      s"target min ${tgt.values.min} not above raw max ${raw.values.max}")
  }
}
