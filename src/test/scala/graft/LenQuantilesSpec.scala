package graft

import graft.analytics.TextAnalytics
import org.apache.spark.sql.functions._

/** Laws for the quantile member of the sketch quartet (`len_quantiles`). */
class LenQuantilesSpec extends SparkSpec {
  import spark.implicits._

  test("rank statistic is exact on a hand fixture") {
    // 5 docs, one language, lengths 10..50: p25→rank 2, p50→rank 3,
    // p90→rank 4, p99→rank 4 ((n−1)·p/100 + 1 with integer division)
    val docs = Seq((1L, "en", 10L), (2L, "en", 20L), (3L, "en", 30L),
        (4L, "en", 40L), (5L, "en", 50L))
      .toDF("doc_id", "lang", "n_chars")
    val got = TextAnalytics.lenQuantilesOn(docs)
      .collect().map(r => r.getInt(1) -> (r.getLong(2), r.getLong(3))).toMap
    assert(got == Map(25 -> (20L, 20L), 50 -> (30L, 30L),
      90 -> (40L, 40L), 99 -> (40L, 40L)))
  }

  test("saturated sample (n ≤ k) makes the estimate EXACT; real sample bounds rank error") {
    // a language with n ≤ k=64 docs: the bottom-k sample IS the
    // population, so est ≡ exact bit-for-bit whatever the hash order
    val small = TextAnalytics.lenQuantilesOn(
      (1L to 40L).map(i => (i, "xx", i * 7 % 400)).toDF("doc_id", "lang", "n_chars"))
      .collect()
    assert(small.length == 4 && small.forall(r => r.getLong(2) == r.getLong(3)))
    // sf0.01: ~100 docs/language vs k=64 — genuine sampling; the
    // estimate's RANK error (fraction of the language at or below the
    // estimate vs the target percentile) stays within the O(1/√k) band
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
      .select(col("lang"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val byLang = docs.groupBy(_._1).map { case (l, xs) => l -> xs.map(_._2).sorted }
    val est = TextAnalytics.lenQuantiles(spark, "/root/testdata/sf0.01").collect()
    est.foreach { r =>
      val (lang, pct, e) = (r.getString(0), r.getInt(1), r.getLong(3))
      val vs = byLang(lang)
      val rankOfEst = vs.count(_ <= e).toDouble / vs.length
      assert(math.abs(rankOfEst - pct / 100.0) <= 0.15,
        s"$lang p$pct: est $e sits at rank $rankOfEst")
    }
  }
}
