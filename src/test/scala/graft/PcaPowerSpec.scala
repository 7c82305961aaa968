package graft

import graft.similarity.PcaPower

/** Power-iteration PCA laws on a synthetic anisotropic cloud: the
  * dominant-variance axis gets the ±10⁶ weight, orthogonal noise axes
  * stay near zero, and the output is invariant to row order (the
  * aggregates are order-free by construction).
  */
class PcaPowerSpec extends SparkSpec {

  private def cloud(n: Int) = {
    import spark.implicits._
    // variance 1 along dim 3 (index 2), ~0.02 along dim 5 (index 4),
    // zero elsewhere; means are zero so centering is a no-op here
    (0 until n).map { k =>
      val a = if (k % 2 == 0) 1f else -1f
      val b = ((k % 5) - 2) * 0.1f
      (k.toLong, Array(0f, 0f, a, 0f, b, 0f, 0f, 0f))
    }.toDF("vec_id", "embedding")
  }

  test("dominant axis takes the full-scale weight, noise axes stay small") {
    val w = PcaPower.pcaPowerOn(cloud(200), dims = 8, rounds = 5)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(w.size == 8)
    assert(math.abs(w(3)) == 1000000L, s"dim 3 weight ${w(3)}")
    val rest = w.filter(_._1 != 3).values.map(math.abs)
    assert(rest.max < 200000L, s"noise axes too large: $w")
  }

  test("projection histogram accounts for every vector in range") {
    val out = PcaPower.pcaProjectOn(cloud(200)).collect()
      .map(r => r.getInt(0) -> r.getLong(1))
    assert(out.map(_._2).sum == 200L)
    assert(out.forall { case (b, _) => b >= 0 && b < 16 })
    // the ±1 cloud projects to the range edges, not one central bucket
    assert(out.length >= 2)
  }

  test("row order does not change the result") {
    import org.apache.spark.sql.functions._
    val base = PcaPower.pcaPowerOn(cloud(100), dims = 8, rounds = 3).collect()
    val shuffled = PcaPower.pcaPowerOn(
      cloud(100).orderBy(pmod(col("vec_id") * 7919, lit(100)).desc),
      dims = 8, rounds = 3).collect()
    assert(base.sameElements(shuffled))
  }

  test("projection demotion: stored component ≡ in-plan fit (r18)") {
    // the artifact-backed registry form must equal the in-plan spelling
    // bit-for-bit: the persisted (i, w) is exact integers, so the only
    // way they can differ is a real build/serve drift — which this law
    // exists to catch
    val dir = "/root/testdata/sf0.001"
    val stored = PcaPower.embeddingPcaProjectStored(spark, dir)
      .collect().map(_.toString).toSeq
    val inPlan = PcaPower.embeddingPcaProject(spark, dir)
      .collect().map(_.toString).toSeq
    assert(stored.nonEmpty && stored == inPlan)
  }
}
