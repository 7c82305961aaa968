package graft

import graft.analytics.SelectionAnalytics
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Laws for the quality-vs-cost skyline (`pareto_frontier`). */
class ParetoFrontierSpec extends SparkSpec {
  import spark.implicits._

  private def rows(df: DataFrame): Seq[(Long, Long, Long)] =
    df.select(col("doc_id"), col("n_chars").cast("long"), col("q"))
      .as[(Long, Long, Long)].collect().toSeq

  test("grouped-prefix-max composition equals brute-force dominance on the corpus") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val got = rows(SelectionAnalytics.paretoFrontierOn(docs))
    val exp = rows(SelectionAnalytics.bruteFrontierOn(docs))
    assert(got.nonEmpty)
    assert(got == exp)
  }

  test("dominance edge cases: ties coexist, equal-axis dominance removes") {
    // q is driven by the text's stopword ratio; cost is the explicit
    // n_chars column. Points (cost, q·10⁻⁶):
    //   A(100, .50) B(100, .50)  — exact tie: both kept
    //   C(100, .25)              — dominated by A (same cost, lower q)
    //   D(50,  .25)              — frontier (strictly cheaper than A)
    //   E(200, .75)              — frontier (strictly higher q)
    //   F(200, .50)              — dominated by A (equal q, higher cost)
    //   G(40,  0)                — frontier (global cheapest)
    val docs = Seq(
      (1L, "the b", 100L), (2L, "the b", 100L),
      (3L, "the b c d", 100L),
      (4L, "the b c d", 50L),
      (5L, "the the a b", 200L),
      (6L, "the b", 200L),
      (7L, "b c", 40L)
    ).toDF("doc_id", "text", "n_chars")
    val got = rows(SelectionAnalytics.paretoFrontierOn(docs))
    assert(got == Seq(
      (7L, 40L, 0L),
      (4L, 50L, 250000L),
      (1L, 100L, 500000L), (2L, 100L, 500000L),
      (5L, 200L, 750000L)))
    assert(got == rows(SelectionAnalytics.bruteFrontierOn(docs)))
  }

  test("frontier members are mutually non-dominating") {
    val got = rows(SelectionAnalytics.paretoFrontierOn(
      Tables.documents(spark, "/root/testdata/sf0.01")))
    for (a <- got; b <- got if a != b)
      assert(!(b._2 <= a._2 && b._3 >= a._3 && (b._2 < a._2 || b._3 > a._3)),
        s"$b dominates $a")
  }
}
