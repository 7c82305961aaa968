package graft

import graft.analytics.TextAnalytics
import graft.functions.MisraGries
import org.apache.spark.sql.functions._

/** Misra-Gries laws: candidate completeness (every item with freq > N/k
  * survives the sketch) on a skewed stream, output invariance under
  * partitioning (the mergeable-summaries property), and the end-to-end
  * two-pass query matching a brute-force group-by exactly.
  */
class MisraGriesSpec extends SparkSpec {

  // skewed stream derived from col("id"): item "h" on ~half the rows,
  // "m" on ~an eighth, the rest spread over a 200-value tail
  private def stream(n: Int) =
    spark.range(n).select(
      when(col("id") % 2 === 0, lit("h"))
        .when(col("id") % 8 === 1, lit("m"))
        .otherwise(concat(lit("t"), col("id") % 200)).as("token"))

  test("sketch contains every true heavy hitter, under any partitioning") {
    val n = 20000
    val k = 10
    val truth = stream(n).groupBy("token").count()
      .filter(col("count") * k > n).collect().map(_.getString(0)).toSet
    assert(truth.contains("h") && truth.contains("m"))
    Seq(1, 7, 32).foreach { parts =>
      val cands = stream(n).repartition(parts)
        .agg(MisraGries.mg(k)(col("token")))
        .head.getSeq[String](0).toSet
      assert(truth.subsetOf(cands), s"parts=$parts lost ${truth -- cands}")
      assert(cands.size <= k, s"parts=$parts sketch overflowed: ${cands.size}")
    }
  }

  test("heavy_hitters two-pass equals brute-force exact counts") {
    import spark.implicits._
    val docs = spark.range(300).select(col("id").as("doc_id"),
      concat(lit("the the quick w"), col("id") % 7, lit(" zz"), col("id") % 97).as("text"))
    val got = TextAnalytics.heavyHittersOn(docs).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val toks = docs.select(explode(split(col("text"), " ")).as("token"))
    val n = toks.count()
    val want = toks.groupBy("token").count()
      .filter(col("count") * 200 > n)
      .orderBy(col("count").desc, col("token").asc).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    assert(got.toSeq == want.toSeq)
    assert(got.nonEmpty)
  }
}
