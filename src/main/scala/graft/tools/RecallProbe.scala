package graft.tools

import graft.{GraftExtensions, ScaleProbe, Tables}
import graft.similarity.PqAnn
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Reproducible recall@10 measurement for the PQ ANN tiers — the number
  * PLANS.md's recall table publishes, as a main instead of an ad-hoc
  * shell session (round-8 lesson: a recall claim needs a rerunnable
  * probe next to it).
  *
  * Ground truth is the unrestricted EXACT integer-L2 top-10 per query
  * over the same `floor(x·1000)` fixed-point vectors the PQ tiers
  * quantize — the identical tie-break (d2 asc, vec_id asc), so recall
  * is a pure shortlist-quality statistic with no float ambiguity.
  *
  * Usage: `runMain graft.tools.RecallProbe [scales] [sfDir] [tmpDir]` —
  * scales a comma list (default `1,10`); scale 1 reads sfDir's
  * embeddings directly, larger scales read/synthesize the ScaleProbe
  * replica corpus (cross-replica structure dissolved, queries PINNED to
  * the base id range — the fixed-eval-suite model).
  */
object RecallProbe {

  private def truthFor(emb: DataFrame, queryPred: Column): DataFrame = {
    GraftExtensions.register(emb.sparkSession)
    val qv = emb.select(col("vec_id"),
      expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT))")
        .as("qv"))
    qv.crossJoin(broadcast(qv.filter(queryPred)
        .select(col("vec_id").as("query_id"), col("qv").as("qq"))))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        expr("sq_dist_i64(qv, qq)").as("d2"))
      .groupBy(col("query_id"))
      .agg(expr("topk_by_score(CAST(-d2 AS DOUBLE), vec_id, 10)").as("top"))
      .select(col("query_id"), explode(expr("transform(top, t -> t.id)")).as("vec_id"))
  }

  def main(args: Array[String]): Unit = {
    val scales = (if (args.length > 0) args(0) else "1,10")
      .split(",").map(_.trim.toInt).toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val tmp   = if (args.length > 2) args(2) else "/tmp/scale_probe"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.constraintPropagation.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    scales.foreach { copies =>
      val (emb, queryPred) =
        if (copies == 1) (Tables.embeddings(spark, sfDir),
          col("vec_id") % 100 === 0)
        else {
          val embPath = s"$tmp/emb_$copies"
          val fs = new org.apache.hadoop.fs.Path(embPath)
            .getFileSystem(spark.sessionState.newHadoopConf())
          if (!fs.exists(new org.apache.hadoop.fs.Path(s"$embPath/_SUCCESS")))
            ScaleProbe.bigEmb(Tables.embeddings(spark, sfDir), copies)
              .repartition(spark.sparkContext.defaultParallelism)
              .write.mode("overwrite").parquet(embPath)
          (spark.read.parquet(embPath),
            col("vec_id") % 100 === 0 && col("vec_id") < 10000000L)
        }
      val truth = truthFor(emb, queryPred).cache()
      val denom = truth.count()
      val variants: Seq[(String, () => DataFrame)] = Seq(
        "knn_pq" -> (() => PqAnn.knnPqOn(emb, queryPred, PqAnn.K16)),
        "knn_pq_rerank" -> (() => PqAnn.knnPqRerankOn(emb, queryPred, PqAnn.K16)),
        "knn_pq256" -> (() => PqAnn.knnPqOn(emb, queryPred, PqAnn.K256)),
        "knn_pq256_rerank" -> (() => PqAnn.knnPqRerankOn(emb, queryPred, PqAnn.K256)),
        "knn_ivf_pq" -> (() => PqAnn.knnIvfPqOn(emb, queryPred, PqAnn.K256)),
        "knn_ivf_pq_sqrt" -> (() => PqAnn.knnIvfPqOn(emb, queryPred, PqAnn.K256,
          membersOf = graft.similarity.Similarity.ivfMembersSqrtOn)))
      variants.foreach { case (name, mk) =>
        val hits = mk().select(col("query_id"), col("vec_id"))
          .join(truth, Seq("query_id", "vec_id"), "left_semi").count()
        println(f"RECALL scale=$copies%d op=$name%s recall=${hits.toDouble / denom}%.3f hits=$hits%d of=$denom%d")
        graft.Maintenance.releaseCachedBlocks(spark, blocking = true)
      }
      truth.unpersist(blocking = true)
    }
    spark.stop()
  }
}
