package graft

import graft.dedup.Linkage
import org.apache.spark.sql.functions._

/** Laws for the full core decomposition (`graph_coreness`). */
class CorenessSpec extends SparkSpec {
  import spark.implicits._

  private def coreness(pairs: Seq[(Long, Long)],
      kMax: Int = Linkage.CorenessMaxK,
      rounds: Int = Linkage.KCoreRounds): Map[Long, Int] =
    Linkage.graphCorenessOn(pairs.toDF("a_id", "b_id"), kMax, rounds)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

  /** Engine-independent brute decomposition: peel to CONVERGENCE at each
    * threshold, coreness = max k whose core retains the node.
    */
  private def brute(pairs: Seq[(Long, Long)], kMax: Int): Map[Long, Int] = {
    def core(k: Int): Set[Long] = {
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
    val all = pairs.flatMap(e => Seq(e._1, e._2)).toSet
    all.map(n => n -> (1 to kMax).filter(k => core(k)(n)).max).toMap
  }

  test("fixtures: K4 with tail, nested cliques") {
    // K4 {1,2,3,4} + tail 5: clique coreness 3, tail 1
    val k4 = coreness(Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L)))
    assert(k4 == Map(1L -> 3, 2L -> 3, 3L -> 3, 4L -> 3, 5L -> 1))
    // K5 bridged to a triangle: the decomposition separates 4 / 2 / 1
    val k5 = (1L to 5L).flatMap(a => (a + 1 to 5L).map(b => (a, b)))
    val tri = Seq((6L, 7L), (6L, 8L), (7L, 8L))
    val got = coreness(k5 ++ tri ++ Seq((5L, 6L)))
    assert(got == Map(1L -> 4, 2L -> 4, 3L -> 4, 4L -> 4, 5L -> 4,
      6L -> 2, 7L -> 2, 8L -> 2))
  }

  test("fixed-round decomposition ≡ brute fixpoint on the real graph") {
    val pairs = Linkage.fuzzyJoin(spark, "/root/testdata/sf0.001")
      .select(col("a_id"), col("b_id"))
      .as[(Long, Long)].collect().toSeq
    val got = coreness(pairs)
    val want = brute(pairs, Linkage.CorenessMaxK)
    assert(got.nonEmpty && got == want)
    assert(got.values.max >= 2, "fixture graph must have nontrivial cores")
  }

  private def hindex(pairs: Seq[(Long, Long)],
      rounds: Int = Linkage.HIndexRounds): Map[Long, Int] =
    Linkage.graphCorenessHindexOn(pairs.toDF("a_id", "b_id"), rounds)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

  test("h-index propagation: fixtures, ≡ peel ≡ brute on the real graph") {
    // K4 + tail, K5 bridged to a triangle — the peel fixtures verbatim
    assert(hindex(Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L))) == Map(1L -> 3, 2L -> 3, 3L -> 3, 4L -> 3, 5L -> 1))
    val k5 = (1L to 5L).flatMap(a => (a + 1 to 5L).map(b => (a, b)))
    val tri = Seq((6L, 7L), (6L, 8L), (7L, 8L))
    assert(hindex(k5 ++ tri ++ Seq((5L, 6L))) ==
      Map(1L -> 4, 2L -> 4, 3L -> 4, 4L -> 4, 5L -> 4,
        6L -> 2, 7L -> 2, 8L -> 2))
    // a path graph: coreness 1 everywhere, but degree-2 interiors force
    // the propagation to actually iterate (h⁰ = 2 in the middle)
    val path = (1L to 9L).map(i => (i, i + 1))
    assert(hindex(path) == (1L to 10L).map(_ -> 1).toMap)
    // the real fuzzy graph: h-index fixpoint ≡ the threshold peel ≡ the
    // engine-independent brute decomposition, AND the fixpoint is
    // reached strictly inside the fixed round budget (rounds − 1 ≡
    // rounds, so the oracle's unrolled chain is already converged)
    val pairs = Linkage.fuzzyJoin(spark, "/root/testdata/sf0.001")
      .select(col("a_id"), col("b_id"))
      .as[(Long, Long)].collect().toSeq
    val got = hindex(pairs)
    assert(got.nonEmpty && got == brute(pairs, Linkage.CorenessMaxK))
    assert(got == hindex(pairs, Linkage.HIndexRounds - 1),
      "fixpoint not reached inside the fixed round budget")
  }

  test("h-index is TRUE coreness; min(·, kMax) is the peel's capped contract") {
    // K13: true coreness 12 exceeds CorenessMaxK = 10 — the case that
    // failed the uncapped map at sf0.01 (measured coreness 18 there).
    // h-index reports 12; the capped peel reports 10; the map-build law
    // is least(hindex, kMax) ≡ peel.
    val k13 = (1L to 13L).flatMap(a => (a + 1 to 13L).map(b => (a, b)))
    val h = hindex(k13)
    assert(h.values.toSet == Set(12))
    val peel = coreness(k13)
    assert(peel.values.toSet == Set(Linkage.CorenessMaxK))
    assert(h.map { case (n, c) => n -> math.min(c, Linkage.CorenessMaxK) } == peel)
  }

  private def counting(pairs: Seq[(Long, Long)],
      kMax: Int = Linkage.CorenessMaxK): Map[Long, Int] =
    Linkage.graphCorenessCappedCountingOn(pairs.toDF("a_id", "b_id"), kMax)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

  test("counting-form capped h-index ≡ capped brute: fixtures, hub, random, real") {
    // the peel fixtures
    assert(counting(Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L))) == Map(1L -> 3, 2L -> 3, 3L -> 3, 4L -> 3, 5L -> 1))
    // K13: TRUE coreness 12 — the counting form must stop at the cap
    val k13 = (1L to 13L).flatMap(a => (a + 1 to 13L).map(b => (a, b)))
    assert(counting(k13) ==
      (1L to 13L).map(_ -> Linkage.CorenessMaxK).toMap)
    // a path: interior degree-2 nodes force real iteration down to 1
    val path = (1L to 9L).map(i => (i, i + 1))
    assert(counting(path) == (1L to 10L).map(_ -> 1).toMap)
    // a planted hub (star of degree 200, spokes 1-3 also a triangle, so
    // {hub, 1, 2, 3} is K4): the skew shape the form exists for — the
    // hub peels WITH its clique (coreness 3), pure spokes stay 1
    val star = (1L to 200L).map(i => (1000L, i))
    val tri = Seq((1L, 2L), (1L, 3L), (2L, 3L))
    assert(counting(star ++ tri) ==
      ((4L to 200L).map(_ -> 1) ++ Seq(1000L -> 3, 1L -> 3, 2L -> 3, 3L -> 3)).toMap)
    // random graphs vs engine-independent brute
    val rnd = new scala.util.Random(16L)
    for (_ <- 1 to 5) {
      val n = 20 + rnd.nextInt(15)
      val pairs = (for {
        a <- 1L to n.toLong; b <- (a + 1) to n.toLong
        if rnd.nextDouble() < 0.2
      } yield (a, b)).toSeq
      if (pairs.nonEmpty)
        assert(counting(pairs) == brute(pairs, Linkage.CorenessMaxK))
    }
    // the real fuzzy graph
    val pairs = Linkage.fuzzyJoin(spark, "/root/testdata/sf0.001")
      .select(col("a_id"), col("b_id"))
      .as[(Long, Long)].collect().toSeq
    assert(counting(pairs) == brute(pairs, Linkage.CorenessMaxK))
  }

  // ---- traversal-based local maintenance under deletion (r16) ----------

  /** The production repair path: stored capped map + stored edges +
    * tombstones → [[Linkage.repairCorenessUnderDeletion]]'s frontier
    * traversal.
    */
  private def localRepair(pairs: Seq[(Long, Long)],
      dead: Set[Long]): Map[Long, Int] = {
    val edges = pairs.toDF("a_id", "b_id")
    val base = Linkage.capCoreness(Linkage.graphCorenessHindexChecked(edges))
    val deadDf = dead.toSeq.toDF("dead_id")
    Linkage.repairCorenessUnderDeletion(base, edges, deadDf)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
  }

  /** From-scratch capped truth over the survivor graph. */
  private def survivorTruth(pairs: Seq[(Long, Long)],
      dead: Set[Long]): Map[Long, Int] = {
    val surv = pairs.filter(e => !dead(e._1) && !dead(e._2))
    if (surv.isEmpty) Map.empty else brute(surv, Linkage.CorenessMaxK)
  }

  test("local deletion repair: fixtures (split, cascade, orphan, cap, no-op)") {
    // K4 + tail: delete the articulation node 4 — survivors {1,2,3} form
    // a triangle (coreness 2), tail node 5 is edge-orphaned and drops out
    val k4tail = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L))
    assert(localRepair(k4tail, Set(4L)) == Map(1L -> 2, 2L -> 2, 3L -> 2))
    // C8 cycle: delete one node — the cycle becomes a path and EVERY
    // survivor must drop 2 → 1; the cascade has to travel hop by hop
    // around the ring (the multi-round frontier case)
    val c8 = (1L to 7L).map(i => (i, i + 1)) :+ ((8L, 1L))
    assert(localRepair(c8, Set(5L)) ==
      Seq(1L, 2L, 3L, 4L, 6L, 7L, 8L).map(_ -> 1).toMap)
    // K13 (true coreness 12, stored labels CAPPED at 10): deleting two
    // members leaves K11 — true coreness 10 = the cap, so labels must
    // NOT move; then deleting four leaves K9 — the repair must cross
    // below the cap to 8 exactly
    val k13 = (1L to 13L).flatMap(a => (a + 1 to 13L).map(b => (a, b)))
    assert(localRepair(k13, Set(12L, 13L)) ==
      (1L to 11L).map(_ -> 10).toMap)
    assert(localRepair(k13, Set(10L, 11L, 12L, 13L)) ==
      (1L to 9L).map(_ -> 8).toMap)
    // planted hub: star of degree 200 whose spokes 1-3 also form a
    // triangle (so {hub, 1, 2, 3} is K4, coreness 3). Deleting spoke 2
    // drops the clique to a triangle {hub, 1, 3} — coreness 2 — while
    // pure spokes stay 1: the repair's counting-form h must handle the
    // hub IN the frontier without a degree-sized array
    val star = (1L to 200L).map(i => (1000L, i)) ++
      Seq((1L, 2L), (1L, 3L), (2L, 3L))
    assert(localRepair(star, Set(2L)) ==
      ((4L to 200L).map(_ -> 1) ++ Seq(1000L -> 2, 1L -> 2, 3L -> 2)).toMap)
    // deleting the HUB orphans every pure spoke; the triangle survives
    assert(localRepair(star, Set(1000L)) ==
      Map(1L -> 2, 2L -> 2, 3L -> 2))
    // empty tombstone batch: the repair is the identity on the map
    assert(localRepair(k4tail, Set.empty) ==
      Map(1L -> 3, 2L -> 3, 3L -> 3, 4L -> 3, 5L -> 1))
    // total deletion of a component: nothing survives from it
    assert(localRepair(Seq((1L, 2L)), Set(1L, 2L)) == Map.empty)
  }

  test("local deletion repair ≡ from-scratch survivor truth on random graphs") {
    val rnd = new scala.util.Random(20260816L)
    for (_ <- 1 to 6) {
      val n = 24 + rnd.nextInt(16)
      val pairs = (for {
        a <- 1L to n.toLong; b <- (a + 1) to n.toLong
        if rnd.nextDouble() < 0.18
      } yield (a, b)).toSeq
      val nodes = pairs.flatMap(e => Seq(e._1, e._2)).distinct
      val dead = nodes.filter(_ => rnd.nextDouble() < 0.2).toSet
      if (pairs.nonEmpty)
        assert(localRepair(pairs, dead) == survivorTruth(pairs, dead),
          s"n=$n dead=$dead")
    }
  }

  test("local deletion repair ≡ survivor peel on the real graph (%7 rule)") {
    val pairs = Linkage.fuzzyJoin(spark, "/root/testdata/sf0.001")
      .select(col("a_id"), col("b_id"))
      .as[(Long, Long)].collect().toSeq
    val dead = pairs.flatMap(e => Seq(e._1, e._2)).distinct
      .filter(_ % 7 == 3).toSet
    assert(dead.nonEmpty)
    val got = localRepair(pairs, dead)
    assert(got.nonEmpty && got == survivorTruth(pairs, dead))
  }

  // ---- traversal-based local maintenance under insertion (r17) ---------

  /** The production fold path: previous capped map + entity snapshot
    * over the OLD edges, then [[Linkage.maintainCorenessLocalIns]] over
    * old ∪ batch.
    */
  private def localInsert(oldPairs: Seq[(Long, Long)],
      batch: Seq[(Long, Long)]): Map[Long, Int] = {
    val prev = Linkage.graphCorenessCappedCountingOn(
      oldPairs.toDF("a_id", "b_id"))
    val prevEnt = graft.dedup.Dedup.componentsOn(
        oldPairs.toDF("doc_id_1", "doc_id_2"))
      .select("doc_id", "component_id")
    Linkage.maintainCorenessLocalIns(prev, prevEnt,
        (oldPairs ++ batch).toDF("a_id", "b_id"),
        batch.toDF("a_id", "b_id"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
  }

  test("local insertion fold: fixtures (stall trap, jump, new nodes, cap, no-op)") {
    // the upward-iteration STALL TRAP the scaladoc names: path 1-2-3
    // plus new edge (1,3) — H(all-1) = 1 everywhere, so a naive upward
    // h-iteration never reaches the triangle's coreness 2; the inflated
    // downward repair must
    assert(localInsert(Seq((1L, 2L), (2L, 3L)), Seq((1L, 3L))) ==
      Map(1L -> 2, 2L -> 2, 3L -> 2))
    // two disjoint edges closed into a 4-cycle: every label 1 → 2, and
    // every node is a batch endpoint
    assert(localInsert(Seq((1L, 2L), (3L, 4L)), Seq((2L, 3L), (4L, 1L))) ==
      Map(1L -> 2, 2L -> 2, 3L -> 2, 4L -> 2))
    // batch completing K4 from two disjoint edges: coreness JUMPS BY 2
    // in one fold (1 → 3) — the multi-edge case single-insertion
    // maintenance theory doesn't cover directly
    assert(localInsert(Seq((1L, 2L), (3L, 4L)),
      Seq((1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L))) ==
      Map(1L -> 3, 2L -> 3, 3L -> 3, 4L -> 3))
    // brand-new nodes, disconnected from the stored graph: a new
    // triangle lands whole; the old edge must pass through untouched
    assert(localInsert(Seq((1L, 2L)), Seq((5L, 6L), (6L, 7L), (5L, 7L))) ==
      Map(1L -> 1, 2L -> 1, 5L -> 2, 6L -> 2, 7L -> 2))
    // saturated pass-through: K4 sits at its own degree (dcap = c), so
    // it is ineligible and a batch elsewhere must not move it
    val k4plus = (1L to 4L).flatMap(a => (a + 1 to 4L).map(b => (a, b))) ++
      Seq((8L, 9L))
    assert(localInsert(k4plus, Seq((8L, 10L))) ==
      Map(1L -> 3, 2L -> 3, 3L -> 3, 4L -> 3, 8L -> 1, 9L -> 1, 10L -> 1))
    // cap crossing: K11 (capped coreness 10) grown to K13 (TRUE 12) —
    // stored labels must stay at the cap, new members must land there
    val k11 = (1L to 11L).flatMap(a => (a + 1 to 11L).map(b => (a, b)))
    val grow = (1L to 11L).map(a => (a, 12L)) ++
      (1L to 11L).map(a => (a, 13L)) :+ ((12L, 13L))
    assert(localInsert(k11, grow) == (1L to 13L).map(_ -> 10).toMap)
    // empty batch: the fold is the identity on the map
    assert(localInsert(Seq((1L, 2L), (2L, 3L)), Seq.empty) ==
      Map(1L -> 1, 2L -> 1, 3L -> 1))
  }

  test("local insertion fold ≡ from-scratch capped truth on random graphs") {
    val rnd = new scala.util.Random(20260817L)
    for (_ <- 1 to 6) {
      val n = 24 + rnd.nextInt(16)
      // old graph over nodes 1..n; the batch adds fresh edges over
      // 1..n+4 (so some endpoints are brand-new nodes)
      val all = (for {
        a <- 1L to (n + 4).toLong; b <- (a + 1) to (n + 4).toLong
        if rnd.nextDouble() < 0.18
      } yield (a, b)).toSeq
      val (batch, old) = all.partition(_ => rnd.nextDouble() < 0.25)
      if (old.nonEmpty && batch.nonEmpty)
        assert(localInsert(old, batch) == brute(old ++ batch, Linkage.CorenessMaxK),
          s"n=$n old=${old.size} batch=${batch.size}")
    }
  }

  test("local insertion fold ≡ one-shot capped truth on the real graph") {
    val pairs = Linkage.fuzzyJoin(spark, "/root/testdata/sf0.001")
      .select(col("a_id"), col("b_id"))
      .as[(Long, Long)].collect().toSeq
    val (batch, old) = pairs.partition(e => (e._1 * 31 + e._2) % 3 == 0)
    assert(old.nonEmpty && batch.nonEmpty)
    assert(localInsert(old, batch) == brute(pairs, Linkage.CorenessMaxK))
  }

  test("coreness is consistent with graph_kcore membership") {
    val dir = "/root/testdata/sf0.001"
    val kc = Linkage.graphKcore(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getBoolean(1), r.getBoolean(2))).toMap
    val cn = Linkage.graphCoreness(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(cn.keySet == kc.keySet)
    cn.foreach { case (n, c) =>
      assert(kc(n)._1 == (c >= 2) && kc(n)._2 == (c >= 3), s"node $n")
    }
  }
}
