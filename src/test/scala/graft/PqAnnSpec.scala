package graft

import graft.similarity.PqAnn
import org.apache.spark.sql.functions._

/** Structural laws for the PQ tiers beyond the oracle's value equality. */
class PqAnnSpec extends SparkSpec {

  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("pure ADC: full rank lists per query, distinct neighbors, monotone distances") {
    val rows = PqAnn.knnPqOn(Tables.embeddings(spark, dir))
      .select("query_id", "rank", "vec_id", "d2").as[(Long, Int, Long, Long)].collect()
    val byQ = rows.groupBy(_._1)
    assert(byQ.nonEmpty)
    byQ.foreach { case (q, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1 to 10), s"query $q rank gaps")
      assert(sorted.map(_._3).distinct.length == 10, s"query $q duplicate neighbors")
      assert(!sorted.map(_._3).contains(q), s"query $q returned itself")
      // ADC distances non-decreasing in rank; ties ordered by id
      sorted.sliding(2).foreach { case Array((_, _, id1, d1), (_, _, id2, d2)) =>
        assert(d1 < d2 || (d1 == d2 && id1 < id2), s"query $q rank order broken")
      }
    }
  }

  test("rerank: neighbors are a subset of the ADC shortlist's id space; exact d2 >= 0") {
    val adc = PqAnn.knnPqOn(Tables.embeddings(spark, dir))
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val rr = PqAnn.knnPqRerankOn(Tables.embeddings(spark, dir))
      .select("query_id", "rank", "vec_id", "d2").as[(Long, Int, Long, Long)].collect()
    assert(rr.nonEmpty)
    rr.foreach { case (_, _, _, d2) => assert(d2 >= 0) }
    // every ADC top-10 member survives into the 40-deep shortlist, so the
    // rerank can only drop it if 10 exact-closer candidates exist in the
    // shortlist — but the top-1 ADC hit per query must at least appear
    // somewhere in the rerank candidates' id space when it is also the
    // exact nearest of the shortlist; assert the weaker structural law:
    // rerank emits exactly 10 distinct non-self rows per query
    rr.groupBy(_._1).foreach { case (q, rs) =>
      assert(rs.map(_._2).sorted.toSeq == (1 to 10), s"query $q rank gaps")
      assert(rs.map(_._3).distinct.length == 10 && !rs.map(_._3).contains(q))
    }
    assert(adc.nonEmpty)
  }

  test("IVF-ADC composition: every neighbor lies in a probed bucket; scores agree with the unrestricted ADC scan") {
    val emb = Tables.embeddings(spark, dir)
    val members = graft.similarity.Similarity.ivfMembersOn(emb)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val rows = PqAnn.knnIvfPqOn(emb)
      .select("query_id", "rank", "vec_id", "d2").as[(Long, Int, Long, Long)].collect()
    assert(rows.nonEmpty)
    // routing law: the ADC scan never leaves the probed buckets
    rows.foreach { case (q, r, id, _) =>
      assert(members.contains((q, id)), s"query $q rank $r scored $id outside its probed buckets")
    }
    // score law: on routed pairs the composed d2 IS the tier's ADC d2 —
    // routing restricts, never rescores
    val adc = PqAnn.knnPqOn(emb, tier = PqAnn.K256)
      .select("query_id", "vec_id", "d2").as[(Long, Long, Long)].collect()
      .map { case (q, id, d) => (q, id) -> d }.toMap
    rows.foreach { case (q, _, id, d2) =>
      adc.get((q, id)).foreach(d => assert(d == d2, s"($q,$id) rescored: $d vs $d2"))
    }
  }

  test("sqrt-rule IVF-ADC: neighbors only from the sqrt routing's probed buckets") {
    val emb = Tables.embeddings(spark, dir)
    val members = graft.similarity.Similarity.ivfMembersSqrtOn(emb)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val rows = PqAnn.knnIvfPqSqrt(spark, dir)
      .select("query_id", "rank", "vec_id", "d2").as[(Long, Int, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (q, r, id, _) =>
      assert(members.contains((q, id)), s"query $q rank $r scored $id outside its sqrt-probed buckets")
    }
    rows.groupBy(_._1).foreach { case (q, rs) =>
      assert(rs.map(_._2).sorted.toSeq == (1 to rs.length) && rs.length <= 10, s"query $q ranks")
    }
  }

  test("bucket-width fetch rule: floor at the oracle default, one slot per 256 routed members past it, monotone") {
    // calibration points from the measured 100x sweep (PLANS.md): the
    // 128 floor holds through the 1x/10x regimes (zero shortlist loss
    // measured <= 32k members), and 80k members/query must clear the
    // sufficient fetch-256 crossing
    assert(PqAnn.fetchForMembers(0L) == 128)
    assert(PqAnn.fetchForMembers(800L) == 128)     // registry scale: 8*2000/20
    assert(PqAnn.fetchForMembers(8000L) == 128)    // 10x probe
    assert(PqAnn.fetchForMembers(32768L) == 128)   // last floor point
    assert(PqAnn.fetchForMembers(80000L) >= 256)   // measured 100x crossing
    val pts = Seq(0L, 1000L, 32768L, 80000L, 1000000L).map(PqAnn.fetchForMembers)
    assert(pts == pts.sorted, "fetch rule must be monotone in bucket width")
  }
}
