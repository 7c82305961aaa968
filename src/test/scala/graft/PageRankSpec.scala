package graft

import graft.similarity.Similarity
import org.apache.spark.sql.functions._

/** Laws for PageRank over the near-dup graph: star-graph centrality on a
  * planted corpus (hub outranks leaves; symmetric leaves tie exactly),
  * the isolated-node fixed point (exactly 0.15/N at every iteration),
  * and mass bounds on the real sf0.001 table.
  */
class PageRankSpec extends SparkSpec {

  private val Sf = "/root/testdata/sf0.001"

  // A 4-leaf star plus one isolated node. cos(hub, leaf) = 1/sqrt(4.61)
  // ≈ 0.466 ≥ 0.45; cos(leaf_i, leaf_j) = 1/4.61 ≈ 0.217 < 0.45; the
  // isolated vector is orthogonal to everything.
  private lazy val emb = {
    import spark.implicits._
    Seq(
      (0L, Array(1f, 0f, 0f, 0f, 0f, 0f)),
      (1L, Array(1f, 1.9f, 0f, 0f, 0f, 0f)),
      (2L, Array(1f, 0f, 1.9f, 0f, 0f, 0f)),
      (3L, Array(1f, 0f, 0f, 1.9f, 0f, 0f)),
      (4L, Array(1f, 0f, 0f, 0f, 1.9f, 0f)),
      (5L, Array(0f, 0f, 0f, 0f, 0f, 7f)))
      .toDF("vec_id", "embedding")
  }

  test("star graph: hub outranks leaves; leaves tie bit-exactly; isolated node fixed point") {
    val pr = Similarity.docPagerankOn(Similarity.withNorms(emb))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val leaves = Seq(1L, 2L, 3L, 4L).map(pr)
    assert(leaves.distinct.size == 1)           // symmetric → identical folds
    assert(pr(0L) > leaves.head)                // hub centrality
    assert(pr(5L) == 0.15 / 6)                  // isolated fixed point, exact
    assert(pr.values.forall(_ >= 0.15 / 6))     // damping floor
  }

  test("sf0.001: mass bounded by 1, floor respected, all nodes ranked") {
    val e = Similarity.withNorms(Tables.embeddings(spark, Sf))
    val n = Tables.embeddings(spark, Sf).count()
    val rows = Similarity.docPagerankOn(e).collect()
    assert(rows.length == n)
    val total = rows.map(_.getDouble(1)).sum
    assert(total <= 1.0 + 1e-9)                 // isolated mass leaks, never grows
    assert(rows.forall(_.getDouble(1) >= 0.15 / n - 1e-15))
  }
}
