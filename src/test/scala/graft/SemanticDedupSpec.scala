package graft

import graft.similarity.Similarity
import org.apache.spark.sql.functions._

/** Laws for SemDeDup-style semantic dedup: exact keep/drop verdicts on a
  * planted corpus, the min-id-survivor invariant per cluster, and the
  * consistency law vs the exact cosine pair stream (every dropped vector
  * has a smaller same-cluster partner above the threshold).
  */
class SemanticDedupSpec extends SparkSpec {

  private val Sf = "/root/testdata/sf0.001"

  // Centroids are vec_id % 50 == 0 → ids 0 and 50 seed two clusters along
  // e1 and e2. Vectors 1, 2 are near-copies of the e1 direction (cos = 1
  // with each other and the centroid); 51 sits alone near e2; 3 is at 45°
  // in cluster 0 but below the 0.45 threshold with nothing.
  private lazy val emb = {
    import spark.implicits._
    Seq(
      (0L,  Array(1f, 0f, 0f, 0f)),    // centroid / member, cluster 0
      (1L,  Array(2f, 0f, 0f, 0f)),    // dup of direction e1 → dropped (0 is smaller)
      (2L,  Array(3f, 0f, 0f, 0f)),    // another dup → dropped
      (3L,  Array(1f, -1f, 0f, 0f)),   // cluster 0, cos 0.707 with e1 → above τ, dropped? see law
      (50L, Array(0f, 1f, 0f, 0f)),    // centroid / member, cluster 50
      (51L, Array(0f, 1f, 4f, 0f)))    // cluster 50, cos ≈ 0.24 with 50 → kept
      .toDF("vec_id", "embedding")
  }

  test("planted corpus: exact verdicts") {
    val got = Similarity.dedupSemanticOn(Similarity.withNorms(emb))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val byId = got.map(t => t._1 -> t).toMap
    assert(byId(0L)._3 == 1)             // min id in cluster always survives
    assert(byId(1L)._3 == 0)             // cos(0,1) = 1 ≥ τ, 0 < 1
    assert(byId(2L)._3 == 0)
    // 3 assigns to cluster 0 (cos 0.707 vs ~ -0.577 to e2); cos(3, 0) =
    // 0.707 ≥ 0.45 → dropped by partner 0.
    assert(byId(3L) == ((3L, 0L, 0)))
    assert(byId(50L)._3 == 1)
    assert(byId(51L)._3 == 1)            // cos(50,51) ≈ 0.24 < τ → survives
  }

  test("min-id member of every cluster is always kept (sf0.001)") {
    val out = Similarity.dedupSemantic(spark, Sf)
    val minKept = out
      .withColumn("mn", min("vec_id").over(
        org.apache.spark.sql.expressions.Window.partitionBy("centroid_id")))
      .filter(col("vec_id") === col("mn"))
      .filter(col("keep") === 0)
    assert(minKept.count() == 0)
  }

  test("trained-centroid path: Lloyd-refined clusters drop each planted twin") {
    import spark.implicits._
    // three orthogonal direction clusters, each a base vector plus a
    // scaled twin (cos = 1 within the pair, 0 across clusters); seeds
    // start slightly off-axis and kmeansCentroids pulls them onto the
    // cluster directions before dedupSemanticWith prunes within clusters
    val emb = Seq(
      (1L,  Array(4f, 0f, 0f, 0f, 0f, 0f)), (11L, Array(8f, 0f, 0f, 0f, 0f, 0f)),
      (2L,  Array(0f, 4f, 0f, 0f, 0f, 0f)), (12L, Array(0f, 8f, 0f, 0f, 0f, 0f)),
      (3L,  Array(0f, 0f, 4f, 0f, 0f, 0f)), (13L, Array(0f, 0f, 8f, 0f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val seeds = Seq(
      (0L, Array(1f, 0.1f, 0f, 0f, 0f, 0f)),
      (1L, Array(0f, 1f, 0.1f, 0f, 0f, 0f)),
      (2L, Array(0.1f, 0f, 1f, 0f, 0f, 0f)))
      .toDF("centroid_id", "vb")
    val e = Similarity.withNorms(emb)
    val centroids = Similarity.kmeansCentroids(e, seeds, iters = 2)
    val got = Similarity.dedupSemanticWith(e, centroids)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(Seq(1L, 2L, 3L).forall(got(_) == 1))     // cluster minima survive
    assert(Seq(11L, 12L, 13L).forall(got(_) == 0))  // twins pruned in-cluster
  }

  test("dropped vectors all appear as the greater side of an exact near-dup pair") {
    val e = Similarity.withNorms(Tables.embeddings(spark, Sf))
    val dropped = Similarity.dedupSemanticOn(e)
      .filter(col("keep") === 0).select(col("vec_id")).collect().map(_.getLong(0)).toSet
    val pairGreater = Similarity.dedupEmbeddingOn(e)
      .select(col("vec_id_2")).collect().map(_.getLong(0)).toSet
    assert(dropped.subsetOf(pairGreater))
  }
}
