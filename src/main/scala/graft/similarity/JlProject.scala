package graft.similarity

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sign random projection (Achlioptas '03 — the database-friendly
  * Johnson-Lindenstrauss transform): project the int8-quantized embedding
  * tier from [[Dims]] to [[ProjDims]] dimensions through a FIXED ±1 sign
  * matrix, and audit what the projection does to the geometry every ANN
  * tier depends on — pairwise dots and norms, in exact integers.
  *
  * The sign matrix is md5-derived (`sign(i, j) = +1` iff the 60-bit
  * prefix of `md5("i:j")` is even — the house [[graft.functions
  * .TextFeatures.hash60]] spelling), so both engines can derive the SAME
  * matrix independently: the Scala side bakes it in as a 64×16 integer
  * literal (computed once at class load, zero hashing in the hot path),
  * the DuckDB oracle re-derives it inline from md5. A drifted literal
  * cannot pass the oracle gate.
  *
  * Entry (`jl_distortion`): for the deterministic pair sample
  * (vec_id, vec_id+1) with vec_id % [[PairMod]] = 0, the exact integer
  * dot and squared norms in BOTH spaces — original int8 (scales cancel
  * in cosine, the [[Quantize]] contract) and projected. Downstream:
  * cos_q vs cos_p per pair IS the measured JL distortion at this
  * (D=64 → P=16) budget; the spec pins the realized distortion band.
  *
  * Scale (100 TB): the projection is one per-row codegen'd pass —
  * D·P = 1024 integer multiply-adds per vector against a literal matrix,
  * no shuffle, no UDF, no md5 at runtime — and shrinks the scan tier 4×
  * (16 ints vs 64 floats) before any pair work. Integer bounds: |p_j| <=
  * 127·D = 8128, so dot_p <= P·8128² ≈ 1.06e9 — Long-safe at any corpus
  * size (per-vector arithmetic only). The pair audit joins on
  * consecutive ids — an equi-join whose left side is a 1/[[PairMod]]
  * sample, linear in the corpus.
  */
object JlProject {

  private val Dims     = 64
  private val ProjDims = 16
  private val PairMod  = 50

  /** +1/-1 by parity of the 60-bit md5 prefix of "i:j" (1-based dims). */
  private[graft] def sign(i: Int, j: Int): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$i:$j".getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    if (BigInt(hex.substring(0, 15), 16) % 2 == 0) 1 else -1
  }

  /** The 64×16 sign matrix as a SQL array-of-arrays literal. */
  private[graft] lazy val signMatrixSql: String =
    (1 to Dims).map { i =>
      (1 to ProjDims).map(j => s"${sign(i, j)}L").mkString("array(", ",", ")")
    }.mkString("array(", ",", ")")

  /** vec_id, q (int8 codes as longs), p (projected ints). The projection
    * binds `q` ONCE via the single-element-array idiom — referencing the
    * q column directly inside the (i, j) fold would re-inline the whole
    * quantization per multiply (the HOF project-collapse gotcha).
    */
  private[graft] def projectedOn(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), col("embedding").as("v"))
      .withColumn("max_abs", expr(
        "aggregate(v, cast(0 as double), (a, x) -> greatest(a, abs(cast(x as double))))"))
      .withColumn("q", expr(
        """CASE WHEN max_abs = 0 THEN transform(v, x -> 0L)
          |ELSE transform(v, x ->
          |  CAST(floor(cast(x as double) / (max_abs / 127.0) + 0.5) AS BIGINT))
          |END""".stripMargin))
      .withColumn("p", expr(
        s"""transform(array(q), qq ->
           |  transform(sequence(1, $ProjDims), j ->
           |    aggregate(sequence(1, $Dims), 0L, (a, i) ->
           |      a + element_at(qq, i)
           |        * element_at(element_at($signMatrixSql, i), j))))[0]"""
          .stripMargin))
      .select(col("vec_id"), col("q"), col("p"))

  def jlDistortion(spark: SparkSession, dir: String): DataFrame =
    jlDistortionOn(Tables.embeddings(spark, dir))

  private[graft] def jlDistortionOn(emb: DataFrame): DataFrame = {
    val proj = projectedOn(emb)
    def dot(a: String, b: String, n: Int) =
      expr(s"aggregate(sequence(1, $n), 0L, (s, i) -> s + element_at($a, i) * element_at($b, i))")
    proj.as("a").filter(col("vec_id") % PairMod === 0)
      .join(proj.as("b"), col("b.vec_id") === col("a.vec_id") + 1)
      .select(
        col("a.vec_id").as("vec_id_1"), col("b.vec_id").as("vec_id_2"),
        dot("a.q", "b.q", Dims).as("dot_q"),
        dot("a.q", "a.q", Dims).as("nsq1_q"),
        dot("b.q", "b.q", Dims).as("nsq2_q"),
        dot("a.p", "b.p", ProjDims).as("dot_p"),
        dot("a.p", "a.p", ProjDims).as("nsq1_p"),
        dot("b.p", "b.p", ProjDims).as("nsq2_p"))
      .orderBy("vec_id_1")
  }

  private def signCaseSql: String =
    "(CASE WHEN ('0x' || substr(md5(i::VARCHAR || ':' || j::VARCHAR), 1, 15))::BIGINT % 2 = 0 THEN 1 ELSE -1 END)"

  val jlDistortionSql: String =
    s"""WITH e AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS v,
       |         list_reduce(list_transform(embedding::DOUBLE[], x -> abs(x)),
       |                     (a, b) -> greatest(a, b)) AS max_abs
       |  FROM embeddings),
       |q AS (
       |  SELECT vec_id,
       |         CASE WHEN max_abs = 0
       |              THEN list_transform(v, x -> 0::BIGINT)
       |              ELSE list_transform(v, x ->
       |                CAST(floor(x / (max_abs / 127.0) + 0.5) AS BIGINT))
       |         END AS q
       |  FROM e),
       |p AS (
       |  SELECT vec_id, q,
       |         list_transform(generate_series(1, $ProjDims), j ->
       |           list_reduce(list_transform(generate_series(1, $Dims), i ->
       |             q[i] * $signCaseSql), (a, b) -> a + b)) AS p
       |  FROM q),
       |pairs AS (
       |  SELECT a.vec_id AS vec_id_1, b.vec_id AS vec_id_2,
       |         a.q AS qa, b.q AS qb, a.p AS pa, b.p AS pb
       |  FROM p a JOIN p b ON b.vec_id = a.vec_id + 1
       |  WHERE a.vec_id % $PairMod = 0)
       |SELECT vec_id_1, vec_id_2,
       |  CAST(list_reduce(list_transform(generate_series(1, $Dims),
       |    i -> qa[i] * qb[i]), (a, b) -> a + b) AS BIGINT) AS dot_q,
       |  CAST(list_reduce(list_transform(generate_series(1, $Dims),
       |    i -> qa[i] * qa[i]), (a, b) -> a + b) AS BIGINT) AS nsq1_q,
       |  CAST(list_reduce(list_transform(generate_series(1, $Dims),
       |    i -> qb[i] * qb[i]), (a, b) -> a + b) AS BIGINT) AS nsq2_q,
       |  CAST(list_reduce(list_transform(generate_series(1, $ProjDims),
       |    i -> pa[i] * pb[i]), (a, b) -> a + b) AS BIGINT) AS dot_p,
       |  CAST(list_reduce(list_transform(generate_series(1, $ProjDims),
       |    i -> pa[i] * pa[i]), (a, b) -> a + b) AS BIGINT) AS nsq1_p,
       |  CAST(list_reduce(list_transform(generate_series(1, $ProjDims),
       |    i -> pb[i] * pb[i]), (a, b) -> a + b) AS BIGINT) AS nsq2_p
       |FROM pairs ORDER BY vec_id_1""".stripMargin

  val registry: Map[String, ((SparkSession, String) => DataFrame, String)] = Map(
    "jl_distortion" -> (jlDistortion _, jlDistortionSql))
}
