package graft

import graft.similarity.{IvfTrained, KMeansExact, PqAnn}
import org.apache.spark.sql.functions._

/** Structural laws for the trained-centroid IVF tier — the value-level
  * gate is the DuckDB oracle (`knn_ivf_trained`, `knn_ivf_pq_rerank`);
  * these pin the properties the oracle cannot see per-stage.
  */
class IvfTrainedSpec extends SparkSpec {

  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private def emb = Tables.embeddings(spark, dir)

  test("trained routing: each vector is assigned to its true argmin trained centroid") {
    // reference assignment recomputed driver-side from the oracle-checked
    // kmeans_fit centroids (N=500 at this SF)
    val cents = KMeansExact.kmeansFitOn(emb, 3)
      .select("centroid_id", "dim", "c").as[(Long, Int, Long)].collect()
      .groupBy(_._1).map { case (id, rs) => id -> rs.sortBy(_._2).map(_._3) }
    val qvs = KMeansExact.quantized(emb)
      .select("vec_id", "qv").as[(Long, Seq[Long])].collect()
      .map { case (id, q) => id -> q.map(_ * 64L).toArray }.toMap
    def d2(a: Array[Long], b: Seq[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val expected = qvs.map { case (id, sq) =>
      id -> cents.toSeq.map { case (cid, cv) => (d2(sq, cv.toSeq), cid) }.min._2
    }
    // members of a 1-probe routing for EVERY vector == its own bucket:
    // reconstruct via the member stream of each query's top-1 probe and
    // check the assignment side instead — project the (query, vec) pairs
    // at nprobe = K (all buckets probed) and group by probed centroid is
    // overkill; assert directly on the assignment the members embed:
    // every member pair (q, v) must satisfy "v's expected centroid is
    // one of q's nprobe closest centroids"
    val members = IvfTrained.trainedMembersOn(emb)
      .select("query_id", "vec_id").as[(Long, Long)].collect()
    assert(members.nonEmpty)
    val queryProbes = qvs.keys.filter(_ % 100 == 0).map { q =>
      q -> cents.toSeq.map { case (cid, cv) => (d2(qvs(q), cv.toSeq), cid) }
        .sortBy(identity).take(IvfTrained.NProbe).map(_._2).toSet
    }.toMap
    members.foreach { case (q, v) =>
      assert(queryProbes(q).contains(expected(v)),
        s"member ($q,$v): vector assigned to ${expected(v)} outside $q's probes ${queryProbes(q)}")
    }
    // completeness: every non-query vector whose centroid IS probed appears
    val memberSet = members.toSet
    for (q <- queryProbes.keys; (v, c) <- expected if v != q && queryProbes(q).contains(c))
      assert(memberSet.contains((q, v)), s"probed member ($q,$v) missing")
  }

  test("knn_ivf_trained: neighbors stay inside the routed members; ranks dense") {
    val members = IvfTrained.trainedMembersOn(emb)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val rows = IvfTrained.knnIvfTrained(spark, dir)
      .select("query_id", "neighbor_id", "rank").as[(Long, Long, Int)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (q, n, r) =>
      assert(members.contains((q, n)), s"query $q rank $r neighbor $n outside routed members")
    }
    rows.groupBy(_._1).foreach { case (q, rs) =>
      assert(rs.map(_._3).sorted.toSeq == (1 to rs.length), s"query $q rank gaps")
      assert(rs.map(_._2).distinct.length == rs.length && !rs.map(_._2).contains(q))
    }
  }

  test("knn_ivf_pq_rerank: routed, exact-reranked — output d2 is the true integer L2") {
    val members = IvfTrained.trainedMembersOn(emb)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val qvs = KMeansExact.quantized(emb)
      .select("vec_id", "qv").as[(Long, Seq[Long])].collect().toMap
    val rows = PqAnn.knnIvfPqRerank(spark, dir)
      .select("query_id", "rank", "vec_id", "d2").as[(Long, Int, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (q, r, id, d2) =>
      assert(members.contains((q, id)), s"query $q rank $r neighbor $id outside routed members")
      val want = qvs(q).zip(qvs(id)).map { case (x, y) => (x - y) * (x - y) }.sum
      assert(d2 == want, s"($q,$id) d2 $d2 != exact $want — rerank not exact")
    }
    rows.groupBy(_._1).foreach { case (q, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1 to sorted.length), s"query $q rank gaps")
      sorted.sliding(2).foreach {
        case Array((_, _, id1, d1), (_, _, id2, d2)) =>
          assert(d1 < d2 || (d1 == d2 && id1 < id2), s"query $q rank order broken")
        case _ => ()
      }
    }
  }

  test("sqrt-trained tier: neighbors stay inside the sqrt-routed members; cell count follows the seed rule") {
    val members = IvfTrained.trainedMembersSqrtOn(emb)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val rows = IvfTrained.knnIvfTrainedSqrt(spark, dir)
      .select("query_id", "neighbor_id", "rank").as[(Long, Long, Int)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (q, n, r) =>
      assert(members.contains((q, n)), s"query $q rank $r neighbor $n outside sqrt-routed members")
    }
    // seed rule at N=500: m = 32 (smallest power of two with m² >= N) ⇒
    // seeds = ids % 32 == 0 below 500 = 16 cells; Lloyd can only empty
    // cells, never add them
    val cells = KMeansExact.centroidsPackedSqrt(emb)
      .select("centroid_id").as[Long].collect()
    assert(cells.length <= 16 && cells.length > 1, s"C=${cells.length}")
    assert(cells.forall(_ % 32 == 0), "sqrt seeds not on the modulus grid")
    // composed sqrt rerank routes inside the same members
    val rr = graft.similarity.PqAnn.knnIvfPqRerankSqrt(spark, dir)
      .select("query_id", "vec_id").as[(Long, Long)].collect()
    assert(rr.nonEmpty)
    rr.foreach { case (q, id) =>
      assert(members.contains((q, id)), s"composed sqrt pair ($q,$id) outside routed members")
    }
  }

  test("nprobe monotonicity: wider probing only adds members") {
    val m3 = IvfTrained.trainedMembersOn(emb, nprobe = 3)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val m5 = IvfTrained.trainedMembersOn(emb, nprobe = 5)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    assert(m3.subsetOf(m5), "nprobe=3 members not a subset of nprobe=5")
    assert(m5.size > m3.size, "wider probing added nothing — degenerate routing")
  }
}
