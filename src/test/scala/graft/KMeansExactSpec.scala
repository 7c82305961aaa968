package graft

import graft.similarity.KMeansExact

/** Integer-Lloyd k-means laws on planted clusters: the fixed seeds
  * converge to the true cluster means (exact fixed-point integers), and
  * the result is invariant to row order (every step is an order-free
  * integer aggregate with deterministic argmin tie-breaks).
  */
class KMeansExactSpec extends SparkSpec {

  /** Two planted clusters: ids < 25 at +1 on dim 1, ids ≥ 25 at −1 on
    * dim 2, with per-id jitter on dim 3. Seeds under the fixed rule
    * (vec_id % 25 == 0, < 500) are 0 and 25 — one per cluster.
    */
  private def planted(n: Int) = {
    import spark.implicits._
    (0 until n).map { k =>
      val jitter = ((k % 7) - 3) * 0.01f
      val v =
        if (k < 25) Array(1f, 0f, jitter, 0f, 0f, 0f, 0f, 0f)
        else Array(0f, -1f, jitter, 0f, 0f, 0f, 0f, 0f)
      (k.toLong, v)
    }.toDF("vec_id", "embedding")
  }

  test("seeds converge to the exact fixed-point cluster means") {
    val out = KMeansExact.kmeansFitOn(planted(50), rounds = 3).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(out.keys.map(_._1).toSet == Set(0L, 25L))
    assert(out.keys.count(_._1 == 0L) == 8)
    // all 25 members of each cluster sit exactly on the center in the
    // planted dim, so the fixed-point mean is exactly ±64·1000
    assert(out((0L, 1)) == 64000L, s"cluster-0 dim 1: ${out((0L, 1))}")
    assert(out((25L, 2)) == -64000L, s"cluster-25 dim 2: ${out((25L, 2))}")
    // untouched dims are exactly zero
    assert(out((0L, 5)) == 0L && out((25L, 5)) == 0L)
  }

  test("row order does not change the result") {
    import org.apache.spark.sql.functions._
    val base = KMeansExact.kmeansFitOn(planted(50), rounds = 2).collect()
    val shuffled = KMeansExact.kmeansFitOn(
      planted(50).orderBy(pmod(col("vec_id") * 7919, lit(50)).desc),
      rounds = 2).collect()
    assert(base.sameElements(shuffled))
  }
}
