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

  val registry: Map[String, ((SparkSession, String) => DataFrame, String)] = Map(
    "embedding_quantize" -> (embeddingQuantize _, embeddingQuantizeSql),
  )
}
