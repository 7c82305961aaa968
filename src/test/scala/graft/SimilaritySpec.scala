package graft

import graft.similarity.Similarity

/** Cosine kNN laws on hand-built vectors. */
class SimilaritySpec extends SparkSpec {

  // vec 0 (a query: id % 100 == 0) along e1; 1 = same direction (cos 1),
  // 2 = orthogonal (cos 0), 3 = opposite (cos -1), 4 = 45° (cos ≈ 0.707).
  private lazy val emb = {
    import spark.implicits._
    Seq(
      (0L, Array(1f, 0f, 0f, 0f)),
      (1L, Array(2f, 0f, 0f, 0f)),
      (2L, Array(0f, 3f, 0f, 0f)),
      (3L, Array(-1f, 0f, 0f, 0f)),
      (4L, Array(1f, 1f, 0f, 0f)))
      .toDF("vec_id", "embedding")
  }

  test("knn_brute ranks by cosine with deterministic tie-breaks") {
    val rows = Similarity.knnBruteOn(Similarity.withNorms(emb)).collect()
      .sortBy(_.getInt(2))
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    assert(rows.map(_._1).forall(_ == 0L))          // only query id 0
    assert(rows.map(_._2).toSeq == Seq(1L, 4L, 2L, 3L))
    assert(rows(0)._4 == 1.0)                        // parallel
    assert(math.abs(rows(1)._4 - math.sqrt(0.5)) < 1e-12)
    assert(rows(2)._4 == 0.0)                        // orthogonal
    assert(rows(3)._4 == -1.0)                       // opposite
  }

  test("IVF probe returns self-cluster neighbors ranked like brute force") {
    // centroids = ids % 50 == 0 → just vec 0; every vector assigned to it,
    // so IVF degenerates to brute force here — outputs must match exactly.
    val brute = Similarity.knnBruteOn(Similarity.withNorms(emb)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    val ivf = Similarity.knnIvfOn(Similarity.withNorms(emb)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    assert(ivf == brute)
  }

  test("knn_join equals knn_brute's top-5 on the query subset, for every vector") {
    val rnd  = new scala.util.Random(7)
    val rows = (0L until 40L).map(i => (i, Array.fill(16)(rnd.nextFloat() * 2 - 1)))
    import spark.implicits._
    val e = Similarity.withNorms(rows.toDF("vec_id", "embedding"))
    // queries are ids % 100 == 0 → just vec 0 here; its knn_join rows must
    // be exactly knn_brute's first five ranks
    val brute = Similarity.knnBruteOn(e).collect()
      .filter(_.getInt(2) <= 5)
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    val joined = Similarity.knnJoinOn(e).collect()
      .filter(_.getLong(0) == 0L)
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    assert(joined == brute)
    // and every vector got exactly 5 ranked neighbors
    val counts = Similarity.knnJoinOn(e).groupBy("vec_id").count().collect()
    assert(counts.length == 40 && counts.forall(_.getLong(1) == 5))
  }

  test("sqrt centroid rule: modulus is the smallest power of two with m^2 >= N") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    def centroidIds(n: Long): Seq[Long] = {
      val rows = (0L until n).map(i => (i, Array(i.toFloat, 1f, 0f, 0f)))
      Similarity.sqrtCentroids(Similarity.withNorms(rows.toDF("vec_id", "embedding")))
        .select(col("centroid_id")).as[Long].collect().sorted.toSeq
    }
    // N=5 → m=4 (2^2=4 < 5 ≤ 16=4^2); N=40 → m=8 (49 > 36); N=500 → m=32
    assert(centroidIds(5) == Seq(0L, 4L))
    assert(centroidIds(40) == (0L until 40L by 8L))
    assert(centroidIds(500) == (0L until 500L by 32L))
  }

  test("knn_ivf_sqrt == knnIvfWith on the rule's explicit centroid set") {
    val rnd  = new scala.util.Random(19)
    val rows = (0L until 40L).map(i => (i, Array.fill(16)(rnd.nextFloat() * 2 - 1)))
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val e = Similarity.withNorms(rows.toDF("vec_id", "embedding"))
    val explicit = Similarity.knnIvfWith(e,
        e.filter(col("vec_id") % 8 === 0)
          .select(col("vec_id").as("centroid_id"), col("v").as("vb"), col("n2").as("cn2")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    val viaRule = Similarity.knnIvfSqrtOn(e)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    assert(viaRule == explicit && viaRule.nonEmpty)
  }

  test("nprobe axis: probed members are monotone supersets; recall never drops") {
    val e = Similarity.withNorms(
      Tables.embeddings(spark, "/root/testdata/sf0.001"))
    def neighbors(np: Int): Set[(Long, Long)] =
      Similarity.knnIvfSqrtOn(e, np).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = Similarity.knnBruteOn(e).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val rec = Seq(1, 3, 6).map(np => (neighbors(np) & brute).size)
    assert(rec == rec.sorted, s"recall not monotone in nprobe: $rec")
    // widening nprobe can only ADD scanned candidates, so every exact
    // top-10 hit at nprobe=1 must survive at nprobe=6
    assert((neighbors(1) & brute).subsetOf(neighbors(6)))
  }

  test("sim_pairs_topk ranks the parallel pair first") {
    val top = Similarity.simPairsTopkOn(Similarity.withNorms(emb)).collect()
    assert((top(0).getLong(0), top(0).getLong(1)) == (0L, 1L))
    assert(top(0).getDouble(2) == 1.0)
  }

  test("blocked pair scan equals the naive all-pairs set") {
    import org.apache.spark.sql.functions._
    val rnd  = new scala.util.Random(11)
    val rows = (0L until 30L).map(i => (i, Array.fill(64)(rnd.nextFloat() * 2 - 1)))
    import spark.implicits._
    val e = Similarity.withNorms(rows.toDF("vec_id", "embedding"))
    // naive reference: collect vectors, compute all unordered pairs driver-side
    val vecs = e.select(col("vec_id"), col("v")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      def dot(x: Array[Float], y: Array[Float]) =
        x.zip(y).foldLeft(0.0) { case (acc, (p, q)) => acc + p.toDouble * q.toDouble }
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    }
    val expect = (for {
      i <- vecs.keys; j <- vecs.keys if i < j
      c = cos(vecs(i), vecs(j)) if c >= 0.45
    } yield (i, j)).toSet
    val got = Similarity.dedupEmbeddingOn(e).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expect)
  }

  test("dedup_embedding_lsh: subset of exact; parallel pairs always survive banding") {
    val rnd  = new scala.util.Random(7)
    val base = Array.fill(64)(rnd.nextFloat() * 2 - 1)
    val rows = (0L until 40L).map {
      case 3L => (3L, base)
      case 7L => (7L, base.map(_ * 2f)) // cos(3,7)=1 → same bucket in EVERY table
      case i  => (i, Array.fill(64)(rnd.nextFloat() * 2 - 1))
    }
    import spark.implicits._
    val e = Similarity.withNorms(rows.toDF("vec_id", "embedding"))
    val exact = Similarity.dedupEmbeddingOn(e).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.dedupEmbeddingLshOn(e).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact))     // verify step admits no false positives
    assert(lsh.contains((3L, 7L)))  // scale-invariant sketch: recall 1 at cos=1
  }

  test("trained IVF recovers planted clusters: same-cluster members fill ranks 1-9") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 4 tight clusters on orthogonal axes; ids chosen so cluster i's
    // first member (i*100) is both a query (QueryMod 100) and a k-means
    // seed (CentroidMod 50)
    val rnd = new scala.util.Random(13)
    val rows = for {
      cl <- 0 until 4
      j  <- 0 until 10
    } yield {
      val v = Array.tabulate(64)(d =>
        (if (d == cl) 1f else 0f) + (rnd.nextFloat() - 0.5f) * 0.1f)
      (cl * 100L + j, v)
    }
    val e = Similarity.withNorms(rows.toDF("vec_id", "embedding"))
    val seeds = e.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("centroid_id"), col("v").as("vb"))
    val out = Similarity.knnIvfTrainedOn(e, seeds, iters = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(out.map(_._1).distinct.sorted.toSeq == Seq(0L, 100L, 200L, 300L))
    out.filter(_._3 <= 9).foreach { case (q, n, _) =>
      assert(n / 100 == q / 100, s"query $q rank<=9 neighbor $n crosses clusters")
    }
  }

  test("multi-probe LSH dominates single-probe: per-query top-k scores pointwise ≥") {
    val dir = "/root/testdata/sf0.001"
    def scoresByQuery(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Double]] =
      df.collect().map(r => (r.getLong(0), r.getDouble(3)))
        .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).sorted.reverse.toSeq }
    val sp = scoresByQuery(Similarity.knnLsh(spark, dir))
    val mp = scoresByQuery(Similarity.knnLshMp(spark, dir))
    // Hamming-≤1 probing strictly widens the candidate pool (it includes
    // the own bucket), so for every query the k-th best multiprobe score
    // must be at least the k-th best single-probe score
    sp.foreach { case (q, spScores) =>
      val mpScores = mp(q)
      spScores.zipWithIndex.foreach { case (s, i) =>
        assert(mpScores.size > i && mpScores(i) >= s - 1e-12,
          s"query $q rank ${i + 1}: mp ${mpScores.lift(i)} < sp $s")
      }
    }
  }
}
