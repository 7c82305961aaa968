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
