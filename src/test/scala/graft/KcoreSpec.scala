package graft

import graft.dedup.Linkage
import org.apache.spark.sql.functions._

/** Laws for the k-core peel (`graph_kcore`). */
class KcoreSpec extends SparkSpec {
  import spark.implicits._

  private def cores(pairs: Seq[(Long, Long)],
      rounds: Int = Linkage.KCoreRounds): Map[Long, (Boolean, Boolean)] =
    Linkage.graphKcoreOn(pairs.toDF("a_id", "b_id"), rounds)
      .collect().map(r => r.getLong(0) -> (r.getBoolean(1), r.getBoolean(2))).toMap

  test("fixtures: triangle+tail, K4, chain") {
    // triangle {1,2,3} with tail 4: the triangle is the 2-core, no 3-core
    assert(cores(Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))) == Map(
      1L -> (true, false), 2L -> (true, false), 3L -> (true, false),
      4L -> (false, false)))
    // K4: everything is a 3-core
    assert(cores(Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L)))
      .values.toSet == Set((true, true)))
    // chain 1-2-3-4: peels away entirely
    assert(cores(Seq((1L, 2L), (2L, 3L), (3L, 4L)))
      .values.toSet == Set((false, false)))
    // two triangles sharing node 5: 2-core keeps both, still no 3-core
    val bowtie = cores(Seq((1L, 2L), (1L, 5L), (2L, 5L), (5L, 6L), (5L, 7L), (6L, 7L)))
    assert(bowtie.values.forall(_ == (true, false)))
  }

  test("graph_kcore_served ≡ graph_kcore bit-for-bit") {
    val dir = "/root/testdata/sf0.001"
    val s = Linkage.graphKcoreServed(spark, dir).collect().map(_.toString).toSeq
    val p = Linkage.graphKcore(spark, dir).collect().map(_.toString).toSeq
    assert(s.nonEmpty && s == p)
  }

  test("fixpoint by KCoreRounds−1 on the real graph; peel ≡ brute fixpoint") {
    val pairs = Linkage.fuzzyJoin(spark, "/root/testdata/sf0.001")
      .select(col("a_id"), col("b_id"))
      .as[(Long, Long)].collect().toSeq
    val atR  = cores(pairs)
    val atR1 = cores(pairs, Linkage.KCoreRounds - 1)
    assert(atR == atR1, "peel must reach fixpoint before the last round")
    // engine-independent brute fixpoint
    def brute(k: Int): Set[Long] = {
      var edges = pairs.toSet
      var done = false
      while (!done) {
        val deg = edges.toSeq.flatMap(e => Seq(e._1, e._2))
          .groupBy(identity).map { case (n, xs) => n -> xs.size }
        val keep = deg.filter(_._2 >= k).keySet
        val next = edges.filter(e => keep(e._1) && keep(e._2))
        done = next == edges
        edges = next
      }
      edges.flatMap(e => Seq(e._1, e._2))
    }
    val (c2, c3) = (brute(2), brute(3))
    assert(c2.nonEmpty, "fixture graph must have a 2-core")
    assert(atR == atR.keySet.map(n => n -> (c2(n), c3(n))).toMap)
  }
}
