package graft.similarity

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle-checked distributed k-means: Lloyd iterations in EXACT integer
  * arithmetic, the clustering counterpart of [[PcaPower]]'s spectral
  * summary. [[Similarity.kmeansCentroids]] is the float production
  * refinement (fold-order-sensitive means, deliberately spec-only); this
  * operator is the cross-engine-verifiable fit: components quantize to
  * `floor(e·1000)`, every distance is an integer sum, and each round's
  * centroid means are FIXED-POINT integers `c_i = ⌊S·Σq / n⌋` (S = 64,
  * six fraction bits) computed with the pmod floor-division identity
  * `(x − pmod(x, n)) div n` — identical on Spark and DuckDB, no IEEE
  * division anywhere, so three rounds of assignment are reproducible
  * bit-for-bit on any engine and any partitioning.
  *
  * Seeding is K = 20 FIXED vectors (`vec_id % 25 == 0 ∧ vec_id < 500`)
  * at every scale — K does not grow with N (the
  * [[graft.dedup.Dedup.dedupSemantic]] modulo seeding ties K to N; this
  * fit is the constant-K path that operator's scaladoc calls for).
  *
  * Scale (100 TB): per round, assignment is one pass of the quantized
  * frame against a K-row broadcast (N·K integer 64-dots, no shuffle —
  * the argmin is a partial-aggregable min_by keyed by vec_id, carrying
  * the 64-long payload once per vector across the one shuffle); the
  * update re-aggregates (centroid, dim) keyed integer sums — K·64
  * groups. Distances fit BIGINT up to |q| ≈ 2·10⁷ per component, far
  * past the ±1500 quantized range; member sums fit up to ~10¹⁴ rows per
  * cluster. Lazy localCheckpoints fuse the fixed rounds into one job
  * cascade (the doc_pagerank lesson). The DuckDB oracle unrolls the
  * same three rounds as CTEs over the exploded (vec, dim, q) frame.
  */
object KMeansExact {

  /** Embedding dimensionality of the test corpus. */
  private val Dims = 64

  /** Component quantization: floor(e · 1000). */
  private[graft] val QScale = 1000.0

  /** Centroid fixed-point scale (six fraction bits). */
  private[graft] val CScale = 64L

  /** Fixed Lloyd rounds. */
  private val Rounds = 3

  /** Fixed-K seed rule: vec_id % SeedMod == 0 below SeedMax → K = 20. */
  private val SeedMod = 25L
  private val SeedMax = 500L

  def kmeansFit(spark: SparkSession, dir: String): DataFrame =
    kmeansFitOn(Tables.embeddings(spark, dir), Rounds)

  /** Quantized integer frame (vec_id, qv) with qv[i] = floor(eᵢ·QScale)
    * — the shared input of the fit and of [[IvfTrained]]'s routing.
    */
  private[graft] def quantized(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"),
      expr(s"transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * $QScale) AS BIGINT))")
        .as("qv"))

  /** The trained centroid table in PACKED form (centroid_id,
    * cv: array<bigint> at the CScale fixed point) — what
    * [[IvfTrained]] routes against; [[kmeansFitOn]] explodes it into
    * the oracle-checked (centroid_id, dim, c) rows.
    */
  private[graft] def centroidsPacked(emb: DataFrame, rounds: Int = Rounds): DataFrame =
    centroidsPackedWith(emb, rounds,
      e => e.filter(col("vec_id") % SeedMod === 0 && col("vec_id") < SeedMax))

  /** [[centroidsPacked]] with the √N seed rule of
    * [[Similarity.sqrtCentroids]] (modulus m = smallest power of two
    * with m² ≥ N, derived IN-PLAN): C ≈ √N Lloyd-refined exact-integer
    * centroids — the seeding that keeps the trained tier's bucket size
    * AND assignment cost balanced at any corpus size, with the same
    * bit-exact oracle contract as the fixed-K fit (the modulus is pure
    * integer arithmetic the oracle re-derives from its own count).
    */
  private[graft] def centroidsPackedSqrt(emb: DataFrame, rounds: Int = Rounds): DataFrame =
    centroidsPackedWith(emb, rounds, { e =>
      val md = e.agg(count(lit(1)).as("n"))
        .select(expr(
          "filter(transform(sequence(0, 31), i -> shiftleft(CAST(1 AS BIGINT), i)), m -> m * m >= n)[0]")
          .as("m"))
      e.crossJoin(broadcast(md)).filter(col("vec_id") % col("m") === 0)
    })

  private def centroidsPackedWith(emb: DataFrame, rounds: Int,
      seedRule: DataFrame => DataFrame): DataFrame = {
    graft.GraftExtensions.register(emb.sparkSession)
    // the pre-scaled copy rides along so every round's assignment scores
    // with the codegen'd SqDistI64 native loop (Σ(CScale·q − c)² ==
    // sq_dist_i64(CScale·qv, cv)) instead of an interpreted
    // zip_with/aggregate lambda pair per (vector, centroid) — same exact
    // integers, measured 2.2 → 1.2 s on kmeans_fit at sf0.1
    val e = quantized(emb)
      .withColumn("sqv", expr(s"transform(qv, x -> $CScale * x)"))
      .localCheckpoint(eager = false)
    // seeds: n = 1 members ⇒ the fixed-point mean is exactly CScale·q
    var c = seedRule(e)
      .select(col("vec_id").as("centroid_id"), col("sqv").as("cv"))
    for (_ <- 1 to rounds) {
      // assignment: exact squared distance at the common CScale scale;
      // ties break to the smaller centroid id in both engines
      val assign = e.crossJoin(broadcast(c))
        .select(col("vec_id"), col("qv"), col("centroid_id"),
          expr("sq_dist_i64(sqv, cv)").as("d2"))
        .groupBy(col("vec_id"))
        .agg(min_by(struct(col("centroid_id"), col("qv")),
          struct(col("d2"), col("centroid_id"))).as("m"))
        .select(col("m.centroid_id").as("centroid_id"), col("m.qv").as("qv"))
      // update: integer member sums per (centroid, dim), then the exact
      // fixed-point mean via the pmod floor-division identity
      c = assign
        .select(col("centroid_id"), posexplode(col("qv")).as(Seq("p", "q")))
        .groupBy(col("centroid_id"), col("p"))
        .agg(sum(col("q")).as("s"), count(lit(1)).as("n"))
        .select(col("centroid_id"), col("p"),
          expr(s"($CScale * s - pmod($CScale * s, n)) div n").as("ci"))
        .groupBy(col("centroid_id"))
        .agg(expr("transform(sort_array(collect_list(struct(p, ci))), s -> s.ci)").as("cv"))
        .localCheckpoint(eager = false)
    }
    c
  }

  private[graft] def kmeansFitOn(emb: DataFrame, rounds: Int): DataFrame =
    centroidsPacked(emb, rounds)
      .select(col("centroid_id"), posexplode(col("cv")).as(Seq("p", "ci")))
      .select(col("centroid_id"), (col("p") + 1).cast("int").as("dim"), col("ci").as("c"))
      .orderBy("centroid_id", "dim")

  /** The same [[Rounds]] Lloyd rounds unrolled into DuckDB CTEs over the
    * exploded integer frame: round r derives pair distances `kd_r`, the
    * row-number argmin `ka_r`, and the fixed-point centroid table `kc_r`.
    * All CTE names carry a `k` prefix so the chain composes side-by-side
    * with the PQ chain ([[PqAnn]]'s `e0`/`c0`/… names) in the
    * trained-routing oracles ([[IvfTrained]]).
    */
  private def kmeansChainSqlWith(seedCte: String): String = {
    val rounds = (1 to Rounds).map { r =>
      s"""kd$r AS MATERIALIZED (
         |  SELECT ke0.vec_id, c.centroid_id,
         |         CAST(sum(($CScale * ke0.q - c.ci) * ($CScale * ke0.q - c.ci)) AS BIGINT) AS d2
         |  FROM ke0 JOIN kc${r - 1} c USING (i) GROUP BY 1, 2),
         |ka$r AS MATERIALIZED (
         |  SELECT vec_id, centroid_id FROM (
         |    SELECT vec_id, centroid_id,
         |           row_number() OVER (PARTITION BY vec_id ORDER BY d2, centroid_id) AS rn
         |    FROM kd$r) WHERE rn = 1),
         |kc$r AS MATERIALIZED (
         |  SELECT centroid_id, i,
         |         ($CScale * s - (($CScale * s % n + n) % n)) // n AS ci
         |  FROM (SELECT a.centroid_id, ke0.i, CAST(sum(ke0.q) AS BIGINT) AS s,
         |               CAST(count(*) AS BIGINT) AS n
         |        FROM ka$r a JOIN ke0 USING (vec_id) GROUP BY 1, 2))""".stripMargin
    }.mkString(",\n")
    s"""ke0 AS MATERIALIZED (
       |  SELECT vec_id, i,
       |         CAST(floor(CAST(embedding[i] AS DOUBLE) * $QScale) AS BIGINT) AS q
       |  FROM embeddings, generate_series(1, $Dims) AS g(i)),
       |$seedCte,
       |$rounds""".stripMargin
  }

  private[graft] val kmeansChainSql: String = kmeansChainSqlWith(
    s"""kc0 AS MATERIALIZED (
       |  SELECT vec_id AS centroid_id, i, $CScale * q AS ci FROM ke0
       |  WHERE vec_id % $SeedMod = 0 AND vec_id < $SeedMax)""".stripMargin)

  /** The chain over the in-plan √N seed rule: the modulus CTE mirrors
    * [[Similarity.ivfMembersSqrtSqlPrefix]]'s integer spelling against
    * the embeddings count, so Spark and DuckDB derive the same m from
    * their own count(*).
    */
  private[graft] val kmeansChainSqrtSql: String = kmeansChainSqlWith(
    s"""knv AS (SELECT count(*) AS n FROM embeddings),
       |kmd AS (SELECT min(CAST(1 AS BIGINT) << i) AS m
       |        FROM generate_series(0, 31) AS t(i), knv
       |        WHERE (CAST(1 AS BIGINT) << i) * (CAST(1 AS BIGINT) << i) >= knv.n),
       |kc0 AS MATERIALIZED (
       |  SELECT vec_id AS centroid_id, i, $CScale * q AS ci FROM ke0, kmd
       |  WHERE vec_id % kmd.m = 0)""".stripMargin)

  /** Name of the chain's final centroid CTE (centroid_id, i, ci). */
  private[graft] val finalCentroidCte: String = s"kc$Rounds"

  val kmeansFitSql: String =
    s"""WITH $kmeansChainSql
       |SELECT centroid_id, CAST(i AS INTEGER) AS dim, ci AS c
       |FROM $finalCentroidCte ORDER BY centroid_id, dim""".stripMargin

  val registry: Map[String, ((SparkSession, String) => DataFrame, String)] = Map(
    "kmeans_fit" -> (kmeansFit _, kmeansFitSql),
  )
}
