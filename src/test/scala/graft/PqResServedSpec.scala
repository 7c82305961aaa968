package graft

import graft.analytics.RetrievalAnalytics
import graft.similarity.PqAnn

/** Laws for the residual-PQ serving tier (r13 review's #7 ask):
  *  1. served ≡ `knn_ivf_pq_residual` bit-for-bit (shared residual
  *     training/encode via `pqResidualArtifacts`, shared coarse
  *     assignment, shared per-(query, cell) ADC tables via
  *     `residualDtab`);
  *  2. the residual code store keeps `knn_served_pq`'s payload law —
  *     two packed longs = 16 bytes/vector — and pack/unpack
  *     round-trips every residual code;
  *  3. the serve plan reads the residual code store through a static
  *     partition filter (the `knn_served` pruning law).
  */
class PqResServedSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("knn_served_pq_residual ≡ knn_ivf_pq_residual bit-for-bit; pruned scan") {
    GraftExtensions.register(spark)
    val served = RetrievalAnalytics.knnServedPqResidual(spark, dir)
    val inPlan = PqAnn.knnIvfPqResidual(spark, dir)
    val s = served.collect().map(_.toString).toSeq
    val p = inPlan.collect().map(_.toString).toSeq
    assert(s.nonEmpty && s == p)
    val plan = served.queryExecution.executedPlan.toString
    val codeScan = plan.linesIterator
      .filter(l => l.contains("pqrescodes") && l.contains("FileScan"))
      .mkString("\n")
    assert(codeScan.contains("PartitionFilters: [centroid_id"),
      "residual codes scan must be partition-pruned:\n" + codeScan)
  }

  test("packed residual codes: 2 longs/vector, unpack ≡ enc") {
    GraftExtensions.register(spark)
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, dir)
    val enc = PqAnn.pqResidualArtifacts(emb).enc
    val packed = enc.groupBy(col("vec_id")).agg(
      sum(expr("if(sub < 8,  shiftleft(cast(code as bigint), 8 * sub), 0L)")).as("codes_lo"),
      sum(expr("if(sub >= 8, shiftleft(cast(code as bigint), 8 * (sub - 8)), 0L)")).as("codes_hi"))
    val unpacked = packed
      .select(col("vec_id"), col("codes_lo"), col("codes_hi"),
        explode(expr("sequence(0, 15)")).as("sub"))
      .select(col("vec_id"), col("sub"),
        expr("cast(shiftrightunsigned(if(sub < 8, codes_lo, codes_hi), 8 * (sub % 8)) & 255 as bigint)")
          .as("code"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val expected = enc.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(expected.nonEmpty && unpacked == expected)
  }
}
