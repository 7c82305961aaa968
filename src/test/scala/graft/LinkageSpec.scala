package graft

import graft.dedup.Linkage
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.joins.CartesianProductExec
import org.apache.spark.sql.functions._

/** Laws for the deletion-neighborhood fuzzy join (`fuzzy_join`). */
class LinkageSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def rows(df: DataFrame): Seq[(Long, Long, Long)] =
    df.select("a_id", "b_id", "dist").as[(Long, Long, Long)].collect().toSeq

  test("blocked fuzzy join equals brute force on the supplier table") {
    val sup = Tables.supplier(spark, sf)
    val blocked = rows(Linkage.fuzzyJoinOn(sup, "s_suppkey", "s_name"))
    val brute   = rows(Linkage.bruteFuzzyOn(sup, "s_suppkey", "s_name"))
    assert(blocked.nonEmpty, "fixture should contain near-identical names")
    assert(blocked == brute)
  }

  test("candidate generation is complete for every edit type") {
    // substitution, insertion, deletion, identity-at-distance-0 excluded
    // by id ordering, plus a distance-2 pair the verify step must reject
    // even though it shares deletion keys ("ab"/"ba" share "a" and "b").
    val df = Seq(
      1L -> "market", 2L -> "marked",  // substitution
      3L -> "stream", 4L -> "streams", // insertion at the end
      5L -> "stream1",                 // insertion elsewhere vs 3
      6L -> "tream",                   // deletion vs 3
      7L -> "ab", 8L -> "ba",          // distance 2, shared keys
      9L -> "x", 10L -> "y"            // length-1 substitution
    ).toDF("id", "name")
    val got = rows(Linkage.fuzzyJoinOn(df, "id", "name"))
    val exp = rows(Linkage.bruteFuzzyOn(df, "id", "name"))
    assert(got == exp)
    assert(got.contains((1L, 2L, 1L)))
    assert(got.contains((3L, 4L, 1L)))
    assert(got.contains((3L, 5L, 1L)))
    assert(got.contains((3L, 6L, 1L)))
    assert(got.contains((9L, 10L, 1L)))
    assert(!got.exists(r => r._1 == 7L && r._2 == 8L), "ab/ba is distance 2")
  }

  private def rows2(df: DataFrame): Seq[(Long, Long, Long)] =
    df.select("a_id", "b_id", "dist").as[(Long, Long, Long)].collect().toSeq
      .sortBy(r => (r._1, r._2))

  private def brute2(df: DataFrame, idCol: String, nameCol: String): Seq[(Long, Long, Long)] = {
    val base = df.filter(col(nameCol).isNotNull)
      .select(col(idCol).cast("long").as("k_id"), col(nameCol).as("k_name"))
    base.as("a").join(base.as("b"), col("a.k_id") < col("b.k_id"))
      .select(col("a.k_id").as("a_id"), col("b.k_id").as("b_id"),
        levenshtein(col("a.k_name"), col("b.k_name")).cast("long").as("dist"))
      .filter(col("dist") <= 2)
      .as[(Long, Long, Long)].collect().toSeq.sortBy(r => (r._1, r._2))
  }

  test("depth-2 blocking equals brute force on the supplier table") {
    // sf0.01: the 10-supplier sf0.001 table only varies its LAST name
    // digit, so every pair there is distance 1 — the 100-supplier table
    // is the smallest with true distance-2 structure
    val sup = Tables.supplier(spark, "/root/testdata/sf0.01")
    val blocked = rows2(Linkage.fuzzyJoin2On(sup, "s_suppkey", "s_name"))
    val brute = brute2(sup, "s_suppkey", "s_name")
    assert(blocked.nonEmpty && blocked.exists(_._3 == 2L),
      "fixture must contain true distance-2 pairs")
    assert(blocked == brute)
  }

  test("depth-2 candidate generation is complete for every 2-edit type") {
    val df = Seq(
      1L -> "market", 2L -> "morket",   // 1 substitution
      3L -> "mxrkyt",                   // 2 substitutions vs 1
      4L -> "markets", 5L -> "marketss",// 1 and 2 insertions vs 1
      6L -> "arket",  7L -> "rket",     // 1 and 2 deletions vs 1
      8L -> "ab", 9L -> "ba",           // transposition = distance 2
      10L -> "xarketz",                 // substitution + insertion vs 1
      11L -> "zzzzzz"                   // distance > 2 from everything
    ).toDF("id", "name")
    val got = rows2(Linkage.fuzzyJoin2On(df, "id", "name"))
    val exp = brute2(df, "id", "name")
    assert(got == exp)
    assert(got.contains((1L, 3L, 2L)))
    assert(got.contains((1L, 5L, 2L)))
    assert(got.contains((1L, 7L, 2L)))
    assert(got.contains((8L, 9L, 2L)))
    assert(got.contains((1L, 10L, 2L)))
    assert(!got.exists(r => r._1 == 11L || r._2 == 11L))
  }

  test("depth-2 keys: short strings degrade to the depth-1 set") {
    val keys = Seq("a", "").toDF("s")
      .select(Linkage.deletionKeys2("s").as("k")).as[Seq[String]].collect()
    assert(keys(0).toSet == Set("a", ""))
    assert(keys(1).toSet == Set(""))
  }

  test("deletion keys: self + distinct single-deletions, empty-safe") {
    val keys = Seq("aab", "").toDF("s")
      .select(Linkage.deletionKeys("s").as("k")).as[Seq[String]].collect()
    assert(keys(0).toSet == Set("aab", "ab", "aa"))
    assert(keys(0).length == 3, "duplicate deletion variants are collapsed")
    assert(keys(1) == Seq(""))
  }

  test("entity_groups labels equal a union-find closure of the brute pair graph") {
    val pairs = rows(Linkage.bruteFuzzyOn(Tables.supplier(spark, sf), "s_suppkey", "s_name"))
      .map(p => (p._1, p._2))
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = pairs.flatMap(p => Seq(p._1, p._2)).distinct
      .map(v => v -> find(v)).toMap
    val got = Linkage.entityGroups(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(got.map(g => g._1 -> g._2).toMap == expected)
    got.foreach { case (k, e, canon) => assert(canon == (k == e)) }
    // exactly one canonical per entity
    assert(got.filter(_._3).map(_._2).toSeq.sorted ==
      got.map(_._2).distinct.toSeq.sorted)
  }

  test("blocked plan joins on keys — no cartesian product") {
    val plan = Linkage.fuzzyJoinOn(Tables.supplier(spark, sf), "s_suppkey", "s_name")
      .queryExecution.executedPlan
    assert(plan.collect { case c: CartesianProductExec => c }.isEmpty)
  }
}
