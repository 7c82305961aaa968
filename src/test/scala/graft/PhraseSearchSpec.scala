package graft

import graft.analytics.RetrievalAnalytics
import org.apache.spark.sql.functions._

/** Laws for exact-phrase search (`phrase_search`). */
class PhraseSearchSpec extends SparkSpec {
  import spark.implicits._

  test("hand fixture: phrase tf, top-phrase cut, rank order") {
    val docs = Seq(
      (1L, "a b a b c"),   // "a b" ×2, "b a" ×1, "b c" ×1
      (2L, "a b x y"),     // "a b" ×1
      (3L, "x y x y x y"), // "x y" ×3, "y x" ×2
      (4L, "z"))           // single token: zero bigrams — the sequence(1,0)
                           // count-down guard (ADVICE r13); must not crash
      .toDF("doc_id", "text")
    val got = RetrievalAnalytics.phraseSearchOn(docs)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(!got.exists(_._3 == 4L), "a single-token doc has no phrases")
    // corpus totals: "a b"=3, "x y"=4, "y x"=2, "b a"=1, "b c"=1 — top-5
    // keeps all; ranking within phrase is tf desc, doc_id asc
    val byPhrase = got.groupBy(_._1)
    assert(byPhrase("x y").toSeq.sortBy(_._2) ==
      Seq(("x y", 1, 3L, 3L), ("x y", 2, 2L, 1L)))
    assert(byPhrase("a b").toSeq.sortBy(_._2) ==
      Seq(("a b", 1, 1L, 2L), ("a b", 2, 2L, 1L)))
    assert(byPhrase("y x").toSeq == Seq(("y x", 1, 3L, 2L)))
  }

  test("served ≡ in-plan bit-for-bit; store side never hash-exchanges") {
    val dir = "/root/testdata/sf0.001"
    val served = RetrievalAnalytics.phraseSearchServed(spark, dir)
    // plan law BEFORE collect (AQE prints initial+final after execution):
    // the bucketed postings scan feeds the probe join with no
    // hashpartitioning exchange on the store side — the 5-phrase query
    // set broadcasts, so the only exchanges are the final agg/sort's
    val plan = served.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning(phrase"),
      "postings must not reshuffle on the probe join:\n" + plan.take(2000))
    val s = served.collect().map(_.toString).toSeq
    val p = RetrievalAnalytics.phraseSearch(spark, dir).collect().map(_.toString).toSeq
    assert(s.nonEmpty && s == p)
  }

  test("k-window transform ≡ position-chaining join, k ∈ {2, 3, 4}") {
    // the generalized law (r13 ask #3): the in-plan k-wide window stream
    // and the positional-index chain (terms at start, start+1, …,
    // start+k−1) produce the SAME (phrase, doc, tf) frame — including
    // overlapping matches and repeated-term phrases ("a a a" in doc 5)
    val docs = Seq(
      (1L, "a b c a b c a b"),
      (2L, "a b c"),
      (3L, "c b a c b a"),
      (4L, "x"),            // shorter than every k: zero phrases, no crash
      (5L, "a a a a"))      // repeated-term phrases, overlapping starts
      .toDF("doc_id", "text")
    val postings = RetrievalAnalytics.positionalPostings(docs)
    for (k <- Seq(2, 3, 4)) {
      val viaWindow = RetrievalAnalytics.phraseTfK(docs, k)
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
      // chain EVERY distinct phrase of that length (not just a query cut)
      val allPhrases = RetrievalAnalytics.phraseTfK(docs, k)
        .select("phrase").distinct()
      val viaChain = RetrievalAnalytics.phraseChainTf(postings, allPhrases)
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(viaWindow.nonEmpty && viaChain == viaWindow, s"k=$k")
    }
    // spot-check the overlap arithmetic: "a a a" in "a a a a" = 2 starts
    val t3 = RetrievalAnalytics.phraseTfK(docs, 3)
      .filter(col("phrase") === "a a a").collect()
    assert(t3.map(r => (r.getLong(1), r.getLong(2))).toSeq == Seq((5L, 2L)))
  }

  test("phrase_search_k served ≡ in-plan; postings probe never reshuffles on term") {
    val dir = "/root/testdata/sf0.001"
    val served = RetrievalAnalytics.phraseSearchKServed(spark, dir)
    val plan = served.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning(term"),
      "postings must not reshuffle on the probe join:\n" + plan.take(2000))
    val s = served.collect().map(_.toString).toSeq
    val p = RetrievalAnalytics.phraseSearchK(spark, dir).collect().map(_.toString).toSeq
    assert(s.nonEmpty && s == p)
  }

  test("phrase_search_mixed: k=2 and k=4 answered by ONE probe of the same store") {
    val dir = "/root/testdata/sf0.001"
    val got = RetrievalAnalytics.phraseSearchMixed(spark, dir).collect()
    assert(got.nonEmpty)
    // both lengths actually present in the answered query set
    val lens = got.map(_.getString(0).split(" ").length).toSet
    assert(lens == Set(2, 4), s"answered phrase lengths: $lens")
    // per-k, the mixed entry's rows equal the in-plan window derivation
    // ranked under the same rules — the any-k law applied twice
    val docs = Tables.documents(spark, dir)
    for (k <- RetrievalAnalytics.PhraseMixedKs) {
      val tf = RetrievalAnalytics.phraseTfK(docs, k)
      val queries = tf.groupBy(col("phrase"))
        .agg(sum(col("tf")).as("cnt"))
        .orderBy(col("cnt").desc, col("phrase").asc)
        .limit(5).select(col("phrase"))
      val want = RetrievalAnalytics.phraseRank(tf, queries)
        .collect().map(_.toString).toSet
      val have = got.filter(_.getString(0).split(" ").length == k)
        .map(_.toString).toSet
      assert(have == want, s"k=$k slice differs")
    }
  }

  test("bigram stream ≡ positional-postings adjacency join (the index spelling)") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    // the literal positional-index formulation: (doc, term, pos) self-join
    // on pos_b = pos_a + 1 — the plan the entry's one-pass transform
    // replaces; their per-(phrase, doc) counts must agree exactly
    val pos = docs.select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("pos", "term")))
    val viaIndex = pos.as("a")
      .join(pos.as("b"),
        col("a.doc_id") === col("b.doc_id") && col("b.pos") === col("a.pos") + 1)
      .groupBy(concat(col("a.term"), lit(" "), col("b.term")).as("phrase"),
        col("a.doc_id").as("doc_id"))
      .agg(count(lit(1)).as("tf"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val viaStream = docs
      .select(col("doc_id"),
        graft.functions.TextFeatures.tokens(col("text")).as("toks"))
      .select(col("doc_id"), explode(expr(
        """transform(sequence(1, size(toks) - 1),
          |  i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))"""
          .stripMargin)).as("phrase"))
      .groupBy("phrase", "doc_id").agg(count(lit(1)).as("tf"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(viaStream.nonEmpty && viaStream == viaIndex)
  }
}
