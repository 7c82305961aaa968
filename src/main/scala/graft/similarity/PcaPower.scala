package graft.similarity

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Dominant principal direction of the embedding cloud by power
  * iteration — the spectral summary an embedding pipeline wants before
  * choosing index geometry (IVF cell shapes, quantizer rotation, whether
  * the cloud is anisotropic enough for an OPQ-style transform to pay).
  * Computes the top eigenvector of the CENTERED second-moment matrix
  * (i.e. the top PCA component) without ever materializing the d×d
  * covariance: each round is two matrix-vector products expressed as
  * keyed aggregates, `dot(v) = Σᵢ x_vᵢ·wᵢ` then `sᵢ = Σ_v dot(v)·x_vᵢ`
  * — the standard trick that turns (XᵀX)w into Xᵀ(Xw) so the work is
  * O(N·d) per round, never O(N·d²).
  *
  * Cross-engine determinism is the hard part, and the design mirrors
  * doc_pagerank's: ALL linear algebra runs in exact integer arithmetic.
  * Components quantize to `floor(e·1000)` (float→double promotion and
  * the double multiply/floor are IEEE-exact in both engines); centering
  * multiplies through by N (`qc = N·q − Σq`, integers — no fractional
  * mean anywhere); both matrix-vector products are integer/DECIMAL sums,
  * associative and order-free, so partial aggregation cannot perturb
  * them. The one per-round normalization divides by the max-abs entry
  * and re-scales to ±10⁶ through a single decimal→double conversion pair
  * — correctly-rounded in both engines — and immediately re-floors to
  * integers, so no accumulated IEEE state crosses rounds. Sign and
  * scale are pinned by the all-ones start vector and the ±10⁶
  * renormalization; 5 fixed rounds (eigengap convergence is geometric;
  * the output is the DIRECTION estimate, exact to the quantization).
  *
  * Scale (100 TB): the exploded (vec, dim, qc) frame is N·d rows of
  * integers streaming through two partial-aggregable keyed sums per
  * round — d groups and N groups, no window, no self-join; the weight
  * vector is a 64-row broadcast. The per-vector dot accumulates in
  * BIGINT, exact up to ~7·10⁷ rows at this quantization; past that the
  * same plan runs with the DECIMAL(38) accumulator the sᵢ sum already
  * uses (the documented cluster path — swap the one cast). Lazy
  * localCheckpoints pin the exploded frame and each round's weights so
  * the 5 rounds fuse into one job cascade (the doc_pagerank_iter
  * lesson) instead of re-deriving round r−1 inside round r.
  */
object PcaPower {

  /** Embedding dimensionality of the test corpus. */
  private val Dims = 64

  /** Fixed power-iteration rounds. */
  private val Rounds = 5

  /** Component quantization: floor(e · 1000). */
  private val QScale = 1000.0

  /** Weight renormalization target: max-abs weight becomes ±10⁶. */
  private val WScale = 1000000.0

  private def dec20(c: Column): Column = c.cast(DecimalType(20, 0))

  def embeddingPca(spark: SparkSession, dir: String): DataFrame =
    pcaPowerOn(Tables.embeddings(spark, dir), Dims, Rounds)

  private[graft] def pcaPowerOn(emb: DataFrame, dims: Int, rounds: Int): DataFrame = {
    // quantized exploded frame: (vec_id, i, q) with q = floor(e_i·1000)
    val e0 = emb
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("p", "e")))
      .select(col("vec_id"), (col("p") + 1).as("i"),
        floor(col("e").cast("double") * lit(QScale)).cast("long").as("q"))
    val mu = e0.groupBy("i").agg(sum(col("q")).as("s_i"))
    val n = emb.agg(count(lit(1)).as("n"))
    // centered by multiplying through: qc = N·q − Σq (exact integers)
    val e = e0
      .join(broadcast(mu), "i")
      .crossJoin(broadcast(n))
      .select(col("vec_id"), col("i"),
        (col("n") * col("q") - col("s_i")).as("qc"))
      .localCheckpoint(eager = false)
    var w = mu.select(col("i"), lit(1000000L).as("w"))
    for (_ <- 1 to rounds) {
      val dots = e.join(broadcast(w), "i")
        .groupBy("vec_id")
        .agg(sum(col("qc") * col("w")).as("dot"))
      val s = e.join(dots, "vec_id")
        .groupBy("i")
        .agg(sum(dec20(col("dot")) * col("qc")).as("s"))
      val m = s.agg(max(abs(col("s"))).as("m"))
      w = s.crossJoin(broadcast(m))
        .select(col("i"),
          floor(col("s").cast("double") / col("m").cast("double") * lit(WScale))
            .cast("long").as("w"))
        .localCheckpoint(eager = false)
    }
    w.select(col("i").cast("int").as("dim"), col("w")).orderBy("dim")
  }

  /** The same [[Rounds]] rounds mechanically unrolled into DuckDB CTEs
    * (the bpe_merges oracle pattern): `e` is the centered quantized
    * frame, round r derives per-vector dots `d_r`, per-dim sums `s_r`,
    * the max-abs normalizer `m_r`, and the re-scaled weights `w_r`.
    */
  val embeddingPcaSql: String = {
    val rounds = (1 to Rounds).map { r =>
      s"""d$r AS MATERIALIZED (
         |  SELECT vec_id, CAST(sum(qc * w) AS BIGINT) AS dot
         |  FROM e JOIN w${r - 1} USING (i) GROUP BY vec_id),
         |s$r AS MATERIALIZED (
         |  SELECT i, sum(CAST(dot AS DECIMAL(20,0)) * qc) AS s
         |  FROM e JOIN d$r USING (vec_id) GROUP BY i),
         |m$r AS MATERIALIZED (SELECT max(abs(s)) AS m FROM s$r),
         |w$r AS MATERIALIZED (
         |  SELECT i, CAST(floor(CAST(s AS DOUBLE) / CAST((SELECT m FROM m$r) AS DOUBLE)
         |                       * $WScale) AS BIGINT) AS w
         |  FROM s$r)""".stripMargin
    }.mkString(",\n")
    s"""WITH e0 AS MATERIALIZED (
       |  SELECT vec_id, i,
       |         CAST(floor(CAST(embedding[i] AS DOUBLE) * $QScale) AS BIGINT) AS q
       |  FROM embeddings, generate_series(1, $Dims) AS g(i)),
       |mu AS MATERIALIZED (SELECT i, CAST(sum(q) AS BIGINT) AS s_i FROM e0 GROUP BY i),
       |e AS MATERIALIZED (
       |  SELECT vec_id, e0.i,
       |         (SELECT count(*) FROM embeddings) * q - mu.s_i AS qc
       |  FROM e0 JOIN mu ON e0.i = mu.i),
       |w0 AS (SELECT i, 1000000::BIGINT AS w FROM generate_series(1, $Dims) AS g(i)),
       |$rounds
       |SELECT CAST(i AS INTEGER) AS dim, w FROM w$Rounds ORDER BY dim""".stripMargin
  }

  val registry: Map[String, ((SparkSession, String) => DataFrame, String)] = Map(
    "embedding_pca" -> (embeddingPca _, embeddingPcaSql),
  )
}
