package graft

import graft.dedup.Dedup

/** Equivalence and convergence laws for the alternating large-star/
  * small-star connected-components variant vs the default min-label
  * propagation: identical labels on random graphs, and O(log n) rounds
  * on the long chain where min-label's O(diameter) would not converge
  * inside its round cap at all.
  */
class ComponentsVariantSpec extends SparkSpec {

  private def pairsDf(edges: Seq[(Long, Long)]) = {
    import spark.implicits._
    edges.toDF("doc_id_1", "doc_id_2")
  }

  private def labels(df: org.apache.spark.sql.DataFrame): Map[Long, (Long, Boolean)] =
    df.collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap

  test("random graphs: alt-star labels equal min-label labels") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val n = 60 + trial * 40
      val edges = Seq.fill(n)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val pairs = pairsDf(edges)
      val expected = labels(Dedup.componentsOn(pairs))
      val got = labels(Dedup.componentsAltStarOn(pairs))
      assert(got == expected, s"trial $trial diverged")
    }
  }

  test("512-node chain: converges in O(log n) rounds, one component") {
    val chain = pairsDf((0L until 511L).map(i => (i, i + 1)))
    val (out, rounds) = Dedup.componentsAltStarCounted(chain)
    val lab = labels(out)
    assert(lab.size == 512)
    assert(lab.values.forall(_._1 == 0L), "all vertices must label to the chain min")
    assert(lab(0L)._2 && lab.count(_._2._2) == 1, "exactly one canonical vertex")
    // min-label needs diameter=511 rounds (beyond its 50-round cap);
    // the star alternation contracts geometrically: log2(512)=9, allow
    // the constant-factor slack the SoCC'14 bound carries.
    assert(rounds <= 25, s"expected O(log n) rounds, took $rounds")
  }

  test("two components and a 2-cycle edge list keep separate labels") {
    val pairs = pairsDf(Seq((10L, 11L), (11L, 12L), (20L, 21L), (21L, 20L)))
    val lab = labels(Dedup.componentsAltStarOn(pairs))
    assert(lab == Map(
      10L -> ((10L, true)), 11L -> ((10L, false)), 12L -> ((10L, false)),
      20L -> ((20L, true)), 21L -> ((20L, false))))
  }
}
