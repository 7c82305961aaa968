package graft.similarity

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Embedding quantization — the int8 storage path of a large-scale
  * embedding store (4× smaller than float32 at ~0.4% reconstruction
  * error, the standard trade for billion-vector ANN tiers).
  *
  * Scheme: symmetric per-vector linear quantization. scale = max|v|/127;
  * q_i = floor(v_i/scale + 0.5) ∈ [-127, 127] (the +0.5/floor idiom is
  * exact in IEEE double on BOTH engines, unlike round(), whose half-even
  * vs half-away behavior differs); reconstruction v̂_i = q_i·scale.
  *
  * Determinism contract with the DuckDB oracle: every per-vector reduction
  * is a sequential left fold in element order (max|v|, then max
  * reconstruction error), all arithmetic in double with identical
  * operation order — bit-identical across engines, like the cosine math
  * in [[Similarity]].
  *
  * Scale notes: pure per-row projection (two HOF folds), no shuffle, no
  * UDF — stays in whole-stage codegen; the summary variant is one global
  * partial-aggregable agg. At 100 TB the quantized array<tinyint> column
  * replaces the float column in the store; the error columns exist to
  * audit the quantizer.
  */
object Quantize {

  /** Per-vector quantization audit: scale and max reconstruction error.
    * A zero vector (scale 0) quantizes to all-zero with zero error.
    */
  def embeddingQuantize(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").as("v"))
      .withColumn("max_abs", expr(
        "aggregate(v, cast(0 as double), (a, x) -> greatest(a, abs(cast(x as double))))"))
      .withColumn("qscale", col("max_abs") / 127.0)
      .withColumn("max_err", expr(
        """CASE WHEN max_abs = 0 THEN cast(0 as double) ELSE
          |  aggregate(v, cast(0 as double), (a, x) ->
          |    greatest(a, abs(cast(x as double)
          |      - floor(cast(x as double) / (max_abs / 127.0) + 0.5) * (max_abs / 127.0))))
          |END""".stripMargin))
      .select(col("vec_id"), col("qscale"), col("max_err"))

  /** DuckDB's list_reduce has no initial accumulator, so the oracle folds
    * from the first element — value-identical to Spark's init-0 fold here
    * because max over non-negative doubles is exact (no rounding), making
    * the fold order irrelevant for these two reductions (only these; the
    * additive folds elsewhere DO pin the order).
    */
  val embeddingQuantizeSql: String =
    """WITH e AS (
      |  SELECT vec_id, embedding::DOUBLE[] AS v,
      |         list_reduce(list_transform(embedding::DOUBLE[], x -> abs(x)),
      |                     (a, b) -> greatest(a, b)) AS max_abs
      |  FROM embeddings)
      |SELECT vec_id, max_abs / 127.0 AS qscale,
      |       CASE WHEN max_abs = 0 THEN 0.0::DOUBLE ELSE
      |         list_reduce(list_transform(v, x ->
      |           abs(x - floor(x / (max_abs / 127.0) + 0.5) * (max_abs / 127.0))),
      |           (a, b) -> greatest(a, b))
      |       END AS max_err
      |FROM e""".stripMargin

  // ---- knn_quantized: int8 scan + exact float rerank -------------------

  private val TopK      = 10
  private val OverFetch = 40  // approx candidates per query before rerank
  private val QueryMod  = 100 // queries = vec_id % 100 == 0 (matches knn_brute)

  /** Two-tier ANN over the quantized store — the shape a billion-vector
    * deployment actually runs:
    *
    *  1. APPROX: scan only the int8 tier (`array<tinyint>` q + its integer
    *     squared norm — 4× fewer scan bytes than float32). Approximate
    *     cosine of two symmetric-quantized vectors is
    *     `idot(qa,qb) / sqrt(idot(qa,qa)·idot(qb,qb))` — the per-vector
    *     scales CANCEL, so ranking needs only the exact integer dot
    *     ([[graft.functions.VecDotI8]], codegen'd long fold) and one double
    *     division. Top-[[OverFetch]] per query via the bounded
    *     `topk_by_score` aggregate (≤ OverFetch rows per query per map
    *     task cross the shuffle).
    *  2. RERANK: the OverFetch·Q surviving ids — and ONLY those — fetch
    *     their float vectors by id-join against the full-precision tier
    *     and rerank by exact cosine (same fold contract as `knn_brute`),
    *     emitting top-[[TopK]].
    *
    * The two `Tables.embeddings` reads model the two storage tiers; at
    * 100 TB the approx scan is the only full pass and it touches 1/4 the
    * bytes. Output can differ from exact `knn_brute` only when a true
    * top-k member falls outside the approx top-OverFetch — the oracle
    * reproduces the SAME two-stage semantics (both stages deterministic:
    * integer math + IEEE division, ties broken on id), so the correctness
    * gate is exact, not probabilistic.
    */
  def knnQuantized(spark: SparkSession, dir: String): DataFrame =
    knnQuantizedOn(Tables.embeddings(spark, dir))

  /** The int8 tier: vec_id, q (array<tinyint>), integer squared norm.
    * The transform(array(fold), m -> …)[0] idiom binds max|v| ONCE per
    * row — naming it via withColumn would let CollapseProject re-inline
    * the whole fold into the per-element lambda (64× re-evaluation).
    */
  private[graft] def int8On(raw: DataFrame): DataFrame = {
    val spark = raw.sparkSession
    graft.GraftExtensions.register(spark)
    raw
      .repartition(spark.sparkContext.defaultParallelism)
      .select(col("vec_id"), col("embedding").as("v"))
      .withColumn("q", expr(
        """transform(array(aggregate(v, cast(0 as double),
          |                (a, x) -> greatest(a, abs(cast(x as double))))), m ->
          |  CASE WHEN m = cast(0 as double) THEN transform(v, x -> cast(0 as tinyint))
          |  ELSE transform(v, x ->
          |    cast(floor(cast(x as double) / (m / 127.0D) + 0.5D) as tinyint))
          |  END)[0]""".stripMargin))
      .withColumn("in2", expr("vec_dot_i8(q, q)"))
      .select(col("vec_id"), col("q"), col("in2"))
  }

  /** Stage-1 int8 approx shortlist for ONE query: the top-`fetch`
    * neighbor ids by quantized cosine (score desc, id asc — the
    * `topk_by_score` order). This is the ANN retrieval stage other
    * rerankers compose over — [[MmrSelect]] feeds its diverse-selection
    * greedy from exactly this frame.
    */
  private[graft] def int8ShortlistOn(raw: DataFrame, queryId: Long,
      fetch: Int): DataFrame = {
    val q8 = int8On(raw)
    val qq = q8.filter(col("vec_id") === queryId)
      .select(col("q").as("qa"), col("in2").as("qin2"))
    q8.filter(col("vec_id") =!= queryId)
      .crossJoin(broadcast(qq))
      .withColumn("ascore",
        expr("vec_dot_i8(qa, q)").cast("double")
          / sqrt(col("qin2").cast("double") * col("in2").cast("double")))
      .agg(expr(s"topk_by_score(ascore, vec_id, $fetch)").as("top"))
      .select(explode(expr("transform(top, t -> t.id)")).as("vec_id"))
  }

  def knnQuantizedOn(raw: DataFrame): DataFrame = {
    graft.GraftExtensions.register(raw.sparkSession)
    import org.apache.spark.sql.functions.broadcast

    val q8 = int8On(raw)
    val qq = q8.filter(col("vec_id") % QueryMod === 0)
      .select(col("vec_id").as("query_id"), col("q").as("qa"), col("in2").as("qin2"))
    val cand = q8.withColumnRenamed("q", "qb")
      .join(broadcast(qq), col("query_id") =!= col("vec_id"))
      .withColumn("ascore",
        expr("vec_dot_i8(qa, qb)").cast("double")
          / sqrt(col("qin2").cast("double") * col("in2").cast("double")))
      .groupBy(col("query_id"))
      .agg(expr(s"topk_by_score(ascore, vec_id, $OverFetch)").as("top"))
      .select(col("query_id"), explode(col("top")).as("c"))
      .select(col("query_id"), col("c.id").as("neighbor_id"))

    // float tier, fetched by id for the candidate set only
    val e = Similarity.withNorms(raw)
    val qf = e.filter(col("vec_id") % QueryMod === 0)
      .select(col("vec_id").as("query_id"), col("v").as("va"), col("n2").as("qn2"))
    cand
      .join(e.select(col("vec_id").as("neighbor_id"), col("v").as("vb"), col("n2")),
        "neighbor_id")
      .join(broadcast(qf), "query_id")
      .withColumn("cosine", expr("vec_dot(va, vb)") / (sqrt(col("qn2")) * sqrt(col("n2"))))
      .groupBy(col("query_id"))
      .agg(expr(s"topk_by_score(cosine, neighbor_id, $TopK)").as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(
        col("query_id"),
        col("col.id").as("neighbor_id"),
        (col("pos") + 1).cast("int").as("rank"),
        col("col.score").as("cosine"))
  }

  /** Literal transcription of both stages. Quantized values are carried as
    * BIGINT lists (same integers as Spark's tinyints — exactness is the
    * point of integer scoring); lambda parameter names avoid the outer
    * table aliases.
    */
  val knnQuantizedSql: String =
    s"""WITH e AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS v,
       |         list_reduce(list_transform(embedding::DOUBLE[], x -> x * x), (a, b) -> a + b) AS n2,
       |         list_reduce(list_transform(embedding::DOUBLE[], x -> abs(x)), (a, b) -> greatest(a, b)) AS max_abs
       |  FROM embeddings),
       |qn AS (
       |  SELECT vec_id, q,
       |         list_reduce(list_transform(list_zip(q, q), p -> p[1] * p[2]), (qa, qb) -> qa + qb) AS in2
       |  FROM (
       |    SELECT vec_id,
       |           CASE WHEN max_abs = 0 THEN list_transform(v, x -> 0::BIGINT)
       |                ELSE list_transform(v, x -> CAST(floor(x / (max_abs / 127.0) + 0.5) AS BIGINT)) END AS q
       |    FROM e)),
       |approx AS (
       |  SELECT qa.vec_id AS query_id, qb.vec_id AS neighbor_id,
       |         CAST(list_reduce(list_transform(list_zip(qa.q, qb.q), p -> p[1] * p[2]),
       |                          (acc, x) -> acc + x) AS DOUBLE)
       |           / sqrt(CAST(qa.in2 AS DOUBLE) * CAST(qb.in2 AS DOUBLE)) AS ascore
       |  FROM qn qa JOIN qn qb ON qa.vec_id % $QueryMod = 0 AND qa.vec_id <> qb.vec_id),
       |cand AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY ascore DESC, neighbor_id ASC) AS rn
       |    FROM approx) WHERE rn <= $OverFetch),
       |rerank AS (
       |  SELECT c.query_id, c.neighbor_id,
       |         list_reduce(list_transform(list_zip(qe.v, ne.v), p -> p[1] * p[2]), (a, b) -> a + b)
       |           / (sqrt(qe.n2) * sqrt(ne.n2)) AS cosine
       |  FROM cand c
       |  JOIN e qe ON c.query_id = qe.vec_id
       |  JOIN e ne ON c.neighbor_id = ne.vec_id)
       |SELECT query_id, neighbor_id, rank, cosine FROM (
       |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
       |  FROM rerank) WHERE rank <= $TopK""".stripMargin

  val registry: Map[String, ((SparkSession, String) => DataFrame, String)] = Map(
    "embedding_quantize" -> (embeddingQuantize _, embeddingQuantizeSql),
    "knn_quantized"      -> (knnQuantized _, knnQuantizedSql),
  )
}
