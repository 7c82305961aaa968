package graft.similarity

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Product-quantization ANN (Jégou/Douze/Schmid, PAMI'11) — the
  * compressed-domain search tier between the int8 scan
  * ([[Quantize]], 4× byte cut, full-precision ranking) and IVF routing
  * ([[Similarity]]): vectors compress to M=8 one-byte codes (a 32×
  * cut of the 64-float payload) and queries rank candidates WITHOUT
  * touching any vector — per-subspace distance TABLES are summed by
  * code (asymmetric distance computation), so the scan cost per
  * (query, vector) is M table lookups + adds.
  *
  * Everything is EXACT INTEGER arithmetic, the [[KMeansExact]] recipe
  * per subspace: components quantize to `floor(e·1000)`; each of the M
  * 8-dim subspaces trains its own K=16 codebook with 2 Lloyd rounds
  * (fixed-point centroid means via the pmod floor-division identity,
  * ties to the smaller code id); encode is an integer argmin; ADC
  * distances are integer sums < 2⁵³ (so the one cast to double for the
  * bounded top-k aggregate is exact). The DuckDB oracle unrolls the
  * identical rounds over the exploded (vec, sub, j, q) frame —
  * bit-for-bit reproducible on any engine or partitioning.
  *
  * Seeding: K=16 FIXED vectors (`vec_id % 31 == 0 ∧ vec_id < 496`) at
  * every scale — constant K, same contract as [[KMeansExact]].
  *
  * Scale (100 TB): training is per-subspace k-means against a 1,024-row
  * (M·K·D) broadcast — the N·M·K distance pass is the linear term;
  * encode is one pass; the ADC table is (queries × M × K) rows,
  * broadcast-sized for any bounded query batch; ranking aggregates
  * through the bounded [[graft.functions.TopKByScore]] partial agg, ≤ k
  * candidates per (query, map task) crossing the shuffle. At billions
  * of vectors PQ composes with IVF (IVF-ADC): route to nprobe
  * partitions first, then this exact machinery scans codes within them.
  */
object PqAnn {

  private val QScale  = 1000.0
  private val CScale  = 64L
  private val M       = 8  // subspaces
  private val D       = 8  // dims per subspace
  private val Rounds  = 2
  private val TopK    = 10
  private val SeedMod = 31L
  private val SeedMax = 496L
  private val QueryMod = 100L

  def knnPq(spark: SparkSession, dir: String): DataFrame =
    knnPqOn(Tables.embeddings(spark, dir))

  /** @param queryPred picks the query side. Production contract: a
    *   BOUNDED query batch (the default modulo rule stands in for one) —
    *   the ADC scored stream is |queries| × N, so an unbounded query set
    *   turns the linear scan quadratic (the 100× probe pins queries to
    *   the base id range for exactly this reason).
    */
  private[graft] def knnPqOn(emb: DataFrame,
      queryPred: org.apache.spark.sql.Column = col("vec_id") % QueryMod === 0): DataFrame =
    pqScored(emb, queryPred)
      .groupBy(col("query_id"))
      .agg(expr(s"topk_by_score(CAST(-d2 AS DOUBLE), vec_id, $TopK)").as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), (col("pos") + 1).cast("int").as("rank"),
        col("col.id").as("vec_id"),
        (-col("col.score")).cast("long").as("d2"))
      .orderBy("query_id", "rank")

  /** The ADC-scored (query_id, vec_id, d2) stream — training, encode and
    * table build shared by the pure-ADC ranking and the rerank variant.
    */
  private def pqScored(emb: DataFrame,
      queryPred: org.apache.spark.sql.Column): DataFrame = {
    graft.GraftExtensions.register(emb.sparkSession)
    // exploded integer frame: (vec_id, sub, j, q)
    val sub = emb.select(col("vec_id"),
        posexplode(expr(
          s"transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * $QScale) AS BIGINT))"))
          .as(Seq("p", "q")))
      .select(col("vec_id"), expr(s"p div $D").as("sub"), (col("p") % D).as("j"),
        col("q"))
      .localCheckpoint(eager = false)
    // codebook init: seed sub-vectors at the fixed-point scale
    var c = sub.filter(col("vec_id") % SeedMod === 0 && col("vec_id") < SeedMax)
      .select(col("sub"), col("vec_id").as("code"), col("j"),
        (lit(CScale) * col("q")).as("ci"))
    def assign(cb: DataFrame): DataFrame =
      sub.join(broadcast(cb), Seq("sub", "j"))
        .withColumn("t", (lit(CScale) * col("q") - col("ci")))
        .groupBy(col("vec_id"), col("sub"), col("code"))
        .agg(sum(col("t") * col("t")).as("d2"))
        .groupBy(col("vec_id"), col("sub"))
        .agg(min_by(struct(col("code"), col("d2")), struct(col("d2"), col("code"))).as("m"))
        .select(col("vec_id"), col("sub"), col("m.code").as("code"),
          col("m.d2").as("d2"))
    for (_ <- 1 to Rounds) {
      val a = assign(c)
      c = a.join(sub, Seq("vec_id", "sub"))
        .groupBy(col("sub"), col("code"), col("j"))
        .agg(sum(col("q")).as("s"), count(lit(1)).as("n"))
        .select(col("sub"), col("code"), col("j"),
          expr(s"($CScale * s - pmod($CScale * s, n)) div n").as("ci"))
        .localCheckpoint(eager = false)
    }
    val enc = assign(c).select(col("vec_id"), col("sub"), col("code"))
      .localCheckpoint(eager = false)
    // ADC distance tables for the query subset, then ranked code sums
    val dtab = sub.filter(queryPred)
      .join(broadcast(c), Seq("sub", "j"))
      .withColumn("t", (lit(CScale) * col("q") - col("ci")))
      .groupBy(col("vec_id").as("query_id"), col("sub"), col("code"))
      .agg(sum(col("t") * col("t")).as("dt"))
    // integer d2 < 2^53 casts to double exactly; (-d2 desc, id asc)
    // through the bounded top-k agg == (d2 asc, id asc)
    enc.join(broadcast(dtab), Seq("sub", "code"))
      .filter(col("vec_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(sum(col("dt")).as("d2"))
  }

  /** PQ shortlist size for the rerank variant. */
  private val Fetch = 40

  // ---- knn_pq_rerank: the production pairing ---------------------------
  /** PQ shortlist → EXACT rerank: the compressed scan over-fetches
    * [[Fetch]] candidates per query by ADC distance, then only those
    * [[Fetch]] rows are re-scored with the exact integer L2 on the full
    * quantized vectors and cut to the final top-k — the
    * [[Quantize.knnQuantized]] two-stage shape with PQ codes as the
    * cheap tier. The oracle checks the two-stage SEMANTICS bit-for-bit;
    * recall vs the unrestricted exact scan is the measured property
    * (PLANS.md recall table: 0.16 pure-ADC → with the 4× over-fetch the
    * exact tier repairs whatever the shortlist captured).
    *
    * Scale: stage 1 is [[knnPqOn]]'s linear compressed scan; stage 2
    * touches Fetch·|queries| full vectors — per-query constant work, the
    * whole point of shortlist-then-rerank.
    */
  def knnPqRerank(spark: SparkSession, dir: String): DataFrame =
    knnPqRerankOn(Tables.embeddings(spark, dir))

  private[graft] def knnPqRerankOn(emb: DataFrame,
      queryPred: org.apache.spark.sql.Column = col("vec_id") % QueryMod === 0): DataFrame = {
    val qv = emb.select(col("vec_id"),
      expr(s"transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * $QScale) AS BIGINT))")
        .as("qv"))
      .localCheckpoint(eager = false)
    val shortlist = pqScored(emb, queryPred)
      .groupBy(col("query_id"))
      .agg(expr(s"topk_by_score(CAST(-d2 AS DOUBLE), vec_id, $Fetch)").as("top"))
      .select(col("query_id"), explode(expr("transform(top, t -> t.id)")).as("vec_id"))
    shortlist
      .join(qv, "vec_id")
      .join(broadcast(qv.filter(queryPred)
        .select(col("vec_id").as("query_id"), col("qv").as("qq"))), "query_id")
      .withColumn("d2", expr(
        "aggregate(zip_with(qv, qq, (a, b) -> (a - b) * (a - b)), 0L, (s, x) -> s + x)"))
      .groupBy(col("query_id"))
      .agg(expr(s"topk_by_score(CAST(-d2 AS DOUBLE), vec_id, $TopK)").as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), (col("pos") + 1).cast("int").as("rank"),
        col("col.id").as("vec_id"),
        (-col("col.score")).cast("long").as("d2"))
      .orderBy("query_id", "rank")
  }

  /** The per-subspace Lloyd rounds + encode + ADC ranking unrolled into
    * DuckDB CTEs — [[KMeansExact.kmeansFitSql]] with a subspace key.
    * [[pqPrefixSql]] is everything through the `scored` CTE, shared by
    * the pure-ADC and rerank oracles.
    */
  private val pqPrefixSql: String = {
    val rounds = (1 to Rounds).map { r =>
      s"""d$r AS MATERIALIZED (
         |  SELECT e0.vec_id, e0.sub, c.code,
         |         CAST(sum(($CScale * e0.q - c.ci) * ($CScale * e0.q - c.ci)) AS BIGINT) AS d2
         |  FROM e0 JOIN c${r - 1} c ON e0.sub = c.sub AND e0.j = c.j
         |  GROUP BY 1, 2, 3),
         |a$r AS MATERIALIZED (
         |  SELECT vec_id, sub, code FROM (
         |    SELECT vec_id, sub, code,
         |           row_number() OVER (PARTITION BY vec_id, sub ORDER BY d2, code) AS rn
         |    FROM d$r) WHERE rn = 1),
         |c$r AS MATERIALIZED (
         |  SELECT sub, code, j,
         |         ($CScale * s - (($CScale * s % n + n) % n)) // n AS ci
         |  FROM (SELECT a.sub, a.code, e0.j, CAST(sum(e0.q) AS BIGINT) AS s,
         |               CAST(count(*) AS BIGINT) AS n
         |        FROM a$r a JOIN e0 ON a.vec_id = e0.vec_id AND a.sub = e0.sub
         |        GROUP BY 1, 2, 3))""".stripMargin
    }.mkString(",\n")
    s"""WITH e0 AS MATERIALIZED (
       |  SELECT vec_id, (i - 1) // $D AS sub, (i - 1) % $D AS j,
       |         CAST(floor(CAST(embedding[i] AS DOUBLE) * $QScale) AS BIGINT) AS q
       |  FROM embeddings, generate_series(1, ${M * D}) AS g(i)),
       |c0 AS MATERIALIZED (
       |  SELECT sub, vec_id AS code, j, $CScale * q AS ci FROM e0
       |  WHERE vec_id % $SeedMod = 0 AND vec_id < $SeedMax),
       |$rounds,
       |denc AS MATERIALIZED (
       |  SELECT e0.vec_id, e0.sub, c.code,
       |         CAST(sum(($CScale * e0.q - c.ci) * ($CScale * e0.q - c.ci)) AS BIGINT) AS d2
       |  FROM e0 JOIN c$Rounds c ON e0.sub = c.sub AND e0.j = c.j
       |  GROUP BY 1, 2, 3),
       |aenc AS MATERIALIZED (
       |  SELECT vec_id, sub, code FROM (
       |    SELECT vec_id, sub, code,
       |           row_number() OVER (PARTITION BY vec_id, sub ORDER BY d2, code) AS rn
       |    FROM denc) WHERE rn = 1),
       |dtab AS MATERIALIZED (
       |  SELECT e0.vec_id AS query_id, c.sub, c.code,
       |         CAST(sum(($CScale * e0.q - c.ci) * ($CScale * e0.q - c.ci)) AS BIGINT) AS dt
       |  FROM e0 JOIN c$Rounds c ON e0.sub = c.sub AND e0.j = c.j
       |  WHERE e0.vec_id % $QueryMod = 0
       |  GROUP BY 1, 2, 3),
       |scored AS MATERIALIZED (
       |  SELECT t.query_id, a.vec_id, CAST(sum(t.dt) AS BIGINT) AS d2
       |  FROM aenc a JOIN dtab t ON a.sub = t.sub AND a.code = t.code
       |  WHERE a.vec_id <> t.query_id
       |  GROUP BY 1, 2)""".stripMargin
  }

  val knnPqSql: String =
    s"""$pqPrefixSql
       |SELECT query_id, CAST(rn AS INTEGER) AS rank, vec_id, d2 FROM (
       |  SELECT query_id, vec_id, d2,
       |         row_number() OVER (PARTITION BY query_id ORDER BY d2, vec_id) AS rn
       |  FROM scored) WHERE rn <= $TopK
       |ORDER BY query_id, rank""".stripMargin

  /** Shortlist + exact integer-L2 rerank on the same CTE chain. */
  val knnPqRerankSql: String =
    s"""$pqPrefixSql,
       |short AS MATERIALIZED (
       |  SELECT query_id, vec_id FROM (
       |    SELECT query_id, vec_id,
       |           row_number() OVER (PARTITION BY query_id ORDER BY d2, vec_id) AS rn
       |    FROM scored) WHERE rn <= $Fetch),
       |exact AS MATERIALIZED (
       |  SELECT s.query_id, s.vec_id,
       |         CAST(sum((a.q - b.q) * (a.q - b.q)) AS BIGINT) AS d2
       |  FROM short s
       |  JOIN e0 a ON a.vec_id = s.vec_id
       |  JOIN e0 b ON b.vec_id = s.query_id AND b.sub = a.sub AND b.j = a.j
       |  GROUP BY 1, 2)
       |SELECT query_id, CAST(rn AS INTEGER) AS rank, vec_id, d2 FROM (
       |  SELECT query_id, vec_id, d2,
       |         row_number() OVER (PARTITION BY query_id ORDER BY d2, vec_id) AS rn
       |  FROM exact) WHERE rn <= $TopK
       |ORDER BY query_id, rank""".stripMargin

  val registry: Map[String, ((SparkSession, String) => DataFrame, String)] = Map(
    "knn_pq" -> (knnPq _, knnPqSql),
    "knn_pq_rerank" -> (knnPqRerank _, knnPqRerankSql))
}
