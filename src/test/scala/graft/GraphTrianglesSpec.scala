package graft

import graft.dedup.Linkage
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Laws for degree-oriented triangle counting (`graph_triangles`). */
class GraphTrianglesSpec extends SparkSpec {
  import spark.implicits._

  private def pairs(es: Seq[(Long, Long)]): DataFrame =
    es.toDF("a_id", "b_id")

  /** Brute closure: e1=(x,y), e2=(y,z), e3=(x,z) — each triangle once
    * with x < y < z by the a_id < b_id edge invariant.
    */
  private def brute(p: DataFrame): Seq[(Long, Long)] = {
    val e = p.select(col("a_id").as("a"), col("b_id").as("b"))
    e.as("e1").join(e.as("e2"), col("e2.a") === col("e1.b"))
      .join(e.as("e3"),
        col("e3.a") === col("e1.a") && col("e3.b") === col("e2.b"))
      .select(col("e1.a").as("x"), col("e1.b").as("y"), col("e2.b").as("z"))
      .select(explode(array(col("x"), col("y"), col("z"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("id").asc)
      .as[(Long, Long)].collect().toSeq
  }

  private def oriented(p: DataFrame): Seq[(Long, Long)] =
    Linkage.graphTrianglesOn(p)
      .as[(Long, Long)].collect().toSeq

  test("clique, chain, star, shared-edge cliques") {
    // K4 on 1..4 (4 triangles, 3 per node); 5-6-7 chain (none);
    // star hub 20 with leaves 21..25 (none — the skew case);
    // K3 {8,9,10} and K3 {9,10,11} sharing edge 9-10
    val p = pairs(Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (5L, 6L), (6L, 7L),
      (20L, 21L), (20L, 22L), (20L, 23L), (20L, 24L), (20L, 25L),
      (8L, 9L), (8L, 10L), (9L, 10L), (9L, 11L), (10L, 11L)))
    val got = oriented(p)
    assert(got == brute(p).take(20))
    val m = got.toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(m(_) == 3L))
    assert(m(9L) == 2L && m(10L) == 2L && m(8L) == 1L && m(11L) == 1L)
    assert(!m.contains(5L) && !m.contains(20L) && !m.contains(21L))
  }

  test("oriented enumeration equals brute closure on the fuzzy supplier graph") {
    val fp = Linkage.fuzzyJoin(spark, "/root/testdata/sf0.001")
      .select("a_id", "b_id")
    val got = oriented(fp)
    assert(got.nonEmpty, "digit-variant supplier names must form triangles")
    assert(got == brute(fp).take(20))
  }

  private def coeffs(p: DataFrame): Map[Long, (Long, Long, Double)] =
    Linkage.graphClusteringCoeffOn(p)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("local clustering coefficient: fixtures, full-node brute equality") {
    // K4 + tail: clique members deg 3 / tri 3 / coeff 1.0 except the
    // articulation (deg 4, tri 3, 6/12 = 0.5); the tail leaf deg 1 → 0
    val k4tail = pairs(Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L),
      (2L, 4L), (3L, 4L), (4L, 5L)))
    assert(coeffs(k4tail) == Map(
      1L -> ((3L, 3L, 1.0)), 2L -> ((3L, 3L, 1.0)), 3L -> ((3L, 3L, 1.0)),
      4L -> ((4L, 3L, 0.5)), 5L -> ((1L, 0L, 0.0))))
    // a path: interior nodes have a wedge but no closure → 0.0
    val path = pairs((1L to 4L).map(i => (i, i + 1)))
    assert(coeffs(path).values.forall(v => v._3 == 0.0))
    // full-node equality vs the brute closure on the real graph —
    // STRONGER than the ranking entry's top-20 law: every node's
    // (degree, triangles, coefficient) triple must match
    val fp = Linkage.fuzzyJoin(spark, "/root/testdata/sf0.001")
      .select("a_id", "b_id").localCheckpoint()
    val triBrute = brute(fp).toMap
    val degAll = fp.select(col("a_id").as("id"))
      .unionAll(fp.select(col("b_id").as("id")))
      .groupBy("id").agg(count(lit(1)).as("d"))
      .as[(Long, Long)].collect().toMap
    val got = coeffs(fp)
    assert(got.keySet == degAll.keySet)
    got.foreach { case (id, (d, t, c)) =>
      assert(d == degAll(id) && t == triBrute.getOrElse(id, 0L), s"node $id")
      val want = if (d >= 2) (2.0 * t) / (d * (d - 1)).toDouble else 0.0
      assert(c == want, s"node $id coeff")
    }
    assert(got.values.exists(_._3 > 0.0), "fixture graph must close wedges")
  }

  // ---- serving-cell maintenance under deletion (r17) --------------------

  private def mapOf(df: DataFrame): Map[Long, (Long, Long)] =
    df.select("s_suppkey", "degree", "n_triangles")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap

  private def repairDel(es: Seq[(Long, Long)],
      dead: Set[Long]): Map[Long, (Long, Long)] = {
    val p = pairs(es).localCheckpoint()
    mapOf(Linkage.maintainTrianglesUnderDeletion(
      Linkage.degreeTriangleMapOn(p), p, dead.toSeq.toDF("dead_id")))
  }

  /** From-scratch truth over survivors — itself pinned against the
    * brute closure by the coefficient test above.
    */
  private def survivorMap(es: Seq[(Long, Long)],
      dead: Set[Long]): Map[Long, (Long, Long)] = {
    val surv = es.filter(e => !dead(e._1) && !dead(e._2))
    if (surv.isEmpty) Map.empty
    else mapOf(Linkage.degreeTriangleMapOn(pairs(surv)))
  }

  test("triangle deletion repair ≡ survivor map: fixtures, random, real") {
    // K4 + tail: deleting the articulation node 4 leaves triangle
    // {1,2,3} (deg 2, tri 1 each) and edge-orphans the tail node 5
    val k4tail = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L))
    assert(repairDel(k4tail, Set(4L)) ==
      Map(1L -> ((2L, 1L)), 2L -> ((2L, 1L)), 3L -> ((2L, 1L))))
    // shared-edge cliques K3{8,9,10} + K3{9,10,11}: a triangle with TWO
    // dead members {9,10} must subtract exactly once from each survivor
    val shared = Seq((8L, 9L), (8L, 10L), (9L, 10L), (9L, 11L), (10L, 11L))
    assert(repairDel(shared, Set(9L, 10L)) == Map.empty) // 8, 11 orphaned
    assert(repairDel(shared, Set(11L)) ==
      Map(8L -> ((2L, 1L)), 9L -> ((2L, 1L)), 10L -> ((2L, 1L))))
    // empty takedown: identity on the map
    assert(repairDel(k4tail, Set.empty) == survivorMap(k4tail, Set.empty))
    // random graphs
    val rnd = new scala.util.Random(17L)
    for (_ <- 1 to 5) {
      val n = 20 + rnd.nextInt(15)
      val es = (for {
        a <- 1L to n.toLong; b <- (a + 1) to n.toLong
        if rnd.nextDouble() < 0.2
      } yield (a, b)).toSeq
      val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct
      val dead = nodes.filter(_ => rnd.nextDouble() < 0.2).toSet
      if (es.nonEmpty)
        assert(repairDel(es, dead) == survivorMap(es, dead), s"n=$n dead=$dead")
    }
    // the real fuzzy graph under the registry's %7 rule
    val fp = Linkage.fuzzyJoin(spark, "/root/testdata/sf0.001")
      .select("a_id", "b_id")
      .as[(Long, Long)].collect().toSeq
    val dead = fp.flatMap(e => Seq(e._1, e._2)).distinct
      .filter(_ % 7 == 3).toSet
    assert(dead.nonEmpty)
    val got = repairDel(fp, dead)
    assert(got.nonEmpty && got == survivorMap(fp, dead))
  }

  test("deletion repair normalizes non-canonical stored edges (r17 ADVICE)") {
    // the same K4+tail fixture with the edge frame handed to the repair
    // in REVERSED orientation: before the least/greatest normalization
    // the closing semi-join silently found no lost triangles and the
    // survivors kept stale counts
    val k4tail = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L))
    val rev = pairs(k4tail.map { case (a, b) => (b, a) })
    val got = mapOf(Linkage.maintainTrianglesUnderDeletion(
      Linkage.degreeTriangleMapOn(pairs(k4tail)), rev,
      Seq(4L).toDF("dead_id")))
    assert(got == survivorMap(k4tail, Set(4L)))
  }

  test("inc + del compose at read: the takedown composes over every insert prefix") {
    // the diagnostics family's _incdel law (r17 verdict #4): the fold
    // chain is insert-only, tombstones compose AT READ — so after ANY
    // prefix of insert folds, snapshot + repair ≡ the survivor map over
    // the edges landed so far, wherever the takedown batch lands
    val base = java.nio.file.Files.createTempDirectory("triincdel").toString
    val store = graft.streaming.LinkIngest.LinkStores(
      base + "/keys", base + "/edges")
    val triP = base + "/triangles"
    val sup = Tables.supplier(spark, "/root/testdata/sf0.001")
      .select(col("s_suppkey"), col("s_name")).localCheckpoint()
    val deadDf = sup.filter(col("s_suppkey") % 7 === 3)
      .select(col("s_suppkey").cast("long").as("dead_id")).localCheckpoint()
    val dead = deadDf.as[Long].collect().toSet
    assert(dead.nonEmpty)
    (0 to 2).foreach { r =>
      graft.streaming.LinkIngest.processBatch(
        sup.filter(col("s_suppkey") % 3 === r), r.toLong, store,
        "s_suppkey", "s_name")
      Linkage.foldTrianglesSnapshot(spark, store, triP, r.toLong)
      val landed = Maintenance.readAsOf(spark, store.edgesPath, r.toLong)
        .select(col("a_id"), col("b_id")).localCheckpoint()
      val composed = mapOf(Linkage.maintainTrianglesUnderDeletion(
        spark.read.parquet(s"$triP/batch_id=$r"), landed, deadDf))
      val truth = survivorMap(
        landed.as[(Long, Long)].collect().toSeq, dead)
      assert(composed == truth, s"prefix through batch $r")
    }
  }

  test("triangle participation is bounded by C(deg, 2)") {
    val fp = Linkage.fuzzyJoin(spark, "/root/testdata/sf0.001")
      .select("a_id", "b_id")
    val deg = fp.select(col("a_id").as("id"))
      .unionAll(fp.select(col("b_id").as("id")))
      .groupBy("id").agg(count(lit(1)).as("d"))
      .as[(Long, Long)].collect().toMap
    oriented(fp).foreach { case (id, n) =>
      val d = deg(id)
      assert(n <= d * (d - 1) / 2, s"node $id: $n triangles exceeds C($d,2)")
    }
  }
}
