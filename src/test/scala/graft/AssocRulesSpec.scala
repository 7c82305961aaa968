package graft

import graft.analytics.TextAnalytics
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Laws for the a-priori association miner (`assoc_rules`). */
class AssocRulesSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: Seq[(Long, String)]): DataFrame =
    rows.toDF("doc_id", "text")

  private def rules(df: DataFrame): Seq[(String, String, Long, Long, Long, Long, Long, Long)] =
    df.select("token_a", "token_b", "support", "df_a", "df_b",
        "conf_ab_ppm", "conf_ba_ppm", "lift_ppm")
      .as[(String, String, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq

  test("hand-computed fixture: support, confidence and lift are exact") {
    // baskets: {a,b,c} {a,b} {a,c} {b,d}; repeated token counts once
    val got = rules(TextAnalytics.assocRulesOn(docs(Seq(
      1L -> "a b c", 2L -> "a a b", 3L -> "a c", 4L -> "b d"))))
    val byPair = got.map(r => (r._1, r._2) -> r).toMap
    // n=4, df: a=3 b=3 c=2 d=1
    assert(byPair(("a", "b")) == ("a", "b", 2L, 3L, 3L, 666666L, 666666L, 888888L))
    assert(byPair(("a", "c")) == ("a", "c", 2L, 3L, 2L, 666666L, 1000000L, 1333333L))
    assert(byPair(("b", "c")) == ("b", "c", 1L, 3L, 2L, 333333L, 500000L, 666666L))
    assert(byPair(("b", "d")) == ("b", "d", 1L, 3L, 1L, 333333L, 1000000L, 1333333L))
    assert(got.size == 4)
  }

  test("corpus invariants: pair order, support bound, vocabulary bound") {
    val d = Tables.documents(spark, "/root/testdata/sf0.001")
    val got = rules(TextAnalytics.assocRulesOn(d))
    assert(got.nonEmpty)
    assert(got.forall(r => r._1 < r._2), "token_a < token_b must hold")
    assert(got.forall(r => r._3 >= 1 && r._3 <= math.min(r._4, r._5)),
      "support must be within [1, min(df_a, df_b)]")
    assert(got.forall(r => r._6 <= 1000000L && r._7 <= 1000000L),
      "confidence cannot exceed 1")
    // vocabulary bound: every output token is one of the top-30 by df
    val pres = d.select(col("doc_id"),
      explode(array_distinct(split(col("text"), " "))).as("token"))
    val top = pres.groupBy("token").agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("token").asc).limit(30)
      .select("token").as[String].collect().toSet
    assert(got.flatMap(r => Seq(r._1, r._2)).toSet.subsetOf(top))
  }

  test("measures recompute from the presence stream (independent brute check)") {
    val d = Tables.documents(spark, "/root/testdata/sf0.001")
    val got = rules(TextAnalytics.assocRulesOn(d))
    val pres = d.select(col("doc_id"),
      explode(array_distinct(split(col("text"), " "))).as("token"))
      .as[(Long, String)].collect()
    val df = pres.groupBy(_._2).map { case (t, xs) => t -> xs.size.toLong }
    val byDoc = pres.groupBy(_._1).map { case (_, xs) => xs.map(_._2).toSet }
    val n = d.count()
    got.foreach { case (a, b, sup, dfa, dfb, cab, cba, lift) =>
      val trueSup = byDoc.count(s => s(a) && s(b)).toLong
      assert(sup == trueSup, s"support($a,$b)")
      assert(dfa == df(a) && dfb == df(b), s"df($a,$b)")
      assert(cab == sup * 1000000L / dfa)
      assert(cba == sup * 1000000L / dfb)
      assert(lift == sup * n * 1000000L / (dfa * dfb))
    }
  }

  test("lift is exact beyond the old Long ceiling (decimal spelling)") {
    // synthetic counts where support·n·10⁶ overflows Long (n = 10¹⁰):
    // the decimal38 floor-division must match BigInt math exactly
    val cases = Seq(
      // (support, df_a, df_b, n_docs)
      (4999999999L, 5000000000L, 6000000000L, 10000000000L),
      (1L, 1L, 1L, 10000000000L),
      (2500000000L, 2500000001L, 9999999999L, 10000000000L),
      (7L, 9999999999L, 3L, 10000000000L))
    val pc = cases.zipWithIndex.map { case ((s, _, _, _), i) =>
      (s"a$i", s"b$i", s) }.toDF("token_a", "token_b", "support")
    val df = cases.zipWithIndex.flatMap { case ((_, da, db, _), i) =>
      Seq((s"a$i", da), (s"b$i", db)) }.toDF("token", "df")
    val n = Seq(cases.head._4).toDF("n_docs")
    val got = rules(TextAnalytics.assocMeasures(pc, df, n))
    got.foreach { case (a, _, sup, dfa, dfb, _, _, lift) =>
      val expected = (BigInt(sup) * BigInt(cases.head._4) * 1000000 /
        (BigInt(dfa) * BigInt(dfb))).toLong
      assert(lift == expected, s"lift($a): got $lift want $expected")
      assert(BigInt(sup) * cases.head._4 * 1000000 > BigInt(Long.MaxValue)
        || sup <= 7L, "the large-support cases must exercise the overflow regime")
    }
    assert(got.size == cases.size)
  }
}
