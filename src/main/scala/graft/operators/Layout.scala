package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Space-filling-curve data layout — the storage-side lever for 100 TB
  * scan cost. A table laid out in curve order gives every parquet file
  * (and row group) a bounded min/max envelope in BOTH layout dimensions,
  * so the engine's ordinary stats-based pruning skips most of the corpus
  * for multi-dimensional predicates (`part = X AND ship_date BETWEEN …`)
  * — where a single-column sort bounds one dimension and leaves the
  * other full-width in every file.
  *
  * Two curves, both as pure integer HOF expressions (whole-stage
  * codegen, no UDF, exactly reproducible cross-engine):
  *
  *  - [[zorderKey]] — Morton order: interleave the low `bits` bits of
  *    (x, y). One fold, trivially invertible; the classic seam artifact
  *    (adjacent cells across a high-bit boundary are far apart on the
  *    curve) is the price.
  *  - [[hilbertKey]] — Hilbert order: the quadrant-rotation recurrence,
  *    folded over bit planes with the (d, x, y) state packed into one
  *    64-bit accumulator. Strictly better locality (every curve step is
  *    a unit grid step — `LayoutSpec` proves bijectivity + unit-step
  *    adjacency, the defining property), at the cost of a ~4× heavier
  *    per-row expression. Preference: Hilbert for write-once read-many
  *    tables, Morton when the key must also be computed at query time.
  *
  * Both engines evaluate the SAME expression tree (built from one
  * template with engine-specific shift spellings), and every operation
  * is integer arithmetic — the oracle match is exact by construction,
  * not by tolerance.
  *
  * Scale (100 TB): [[zorderWrite]] is one range exchange on the curve
  * key (sampled boundaries — the same mechanism as any global sort,
  * ~1 row in 10⁵ sampled) + an in-partition sort, so the layout pass
  * costs one shuffle of the data once, amortized over every subsequent
  * scan. File count is the caller's bytes/target knob, exactly like
  * `Maintenance.compactBatchStore`; the curve key is dropped before
  * write so storage pays zero bytes for it. Row-group pruning then
  * happens in any parquet reader — Spark's `PushedFilters` min/max
  * stats, DuckDB zone maps — with no engine cooperation needed beyond
  * writing sorted files. [[layoutAudit]] is the governance view: per
  * file, row count and both dims' envelopes, the direct input to a
  * skip-fraction estimate for a predicate workload.
  */
object Layout {

  /** Engine-specific spellings of left/right shift; everything else in
    * the curve expressions is common SQL (CASE, `&`, `|`, `*`, `+`).
    */
  private type Shift = (String, String) => String
  private val sparkShl: Shift = (a, b) => s"shiftleft($a, $b)"
  private val sparkShr: Shift = (a, b) => s"shiftright($a, $b)"
  private val duckShl: Shift  = (a, b) => s"(($a) << ($b))"
  private val duckShr: Shift  = (a, b) => s"(($a) >> ($b))"
  private val BigOne = "cast(1 as bigint)"

  /** Morton interleave term for bit plane `i` (x bit at 2i, y at 2i+1). */
  private def mortonTerm(x: String, y: String, shl: Shift, shr: Shift): String =
    s"(${shl(s"(${shr(x, "i")} & 1)", "(2*i)")} | ${shl(s"(${shr(y, "i")} & 1)", "((2*i)+1)")})"

  /** Morton (z-order) key via the native codegen'd
    * [[graft.functions.MortonKey]] (needs `GraftExtensions`) — see
    * [[hilbertKeyNative]] for the fold-vs-native trade.
    */
  def zorderKeyNative(xName: String, yName: String, bits: Int): Column =
    expr(s"morton_key(cast($xName as bigint), cast($yName as bigint), $bits)")

  /** Morton (z-order) key of two non-negative integer columns, low
    * `bits` bits each — the engine-portable HOF-fold spelling (one
    * `aggregate` fold; its DuckDB twin is [[zorderKeySql]]).
    */
  def zorderKey(xName: String, yName: String, bits: Int): Column =
    zorderKeyOf(s"cast($xName as bigint)", s"cast($yName as bigint)", bits)

  /** Same, over arbitrary integer SQL expressions (the writer feeds the
    * grid-normalized dims through here).
    */
  private def zorderKeyOf(xExpr: String, yExpr: String, bits: Int): Column = {
    require(bits >= 1 && bits <= 21, s"bits must be in [1, 21], got $bits")
    val t = mortonTerm(xExpr, yExpr, sparkShl, sparkShr)
    expr(s"aggregate(sequence(0, ${bits - 1}), cast(0 as bigint), (acc, i) -> (acc | $t))")
  }

  /** DuckDB spelling of [[zorderKey]] (same fold as a list_reduce). */
  def zorderKeySql(x: String, y: String, bits: Int): String = {
    val t = mortonTerm(s"CAST($x AS BIGINT)", s"CAST($y AS BIGINT)", duckShl, duckShr)
    s"list_reduce([$t FOR i IN range($bits)], (a, b) -> (a | b))"
  }

  /** One Hilbert fold step: state `acc` packs (d, x, y) as
    * `((d << bits) | x) << bits | y`; `i` is the bit plane (descending).
    * Quadrant index from the plane bits (rx, ry); the standard rotation
    * keeps only the low `i` bits of (x, y) — all values stay
    * non-negative, which is what makes the packed form safe.
    * `(3·rx) xor ry` is spelled arithmetically (`3·rx + ry·(1 − 2·rx)`)
    * so no engine-specific xor operator appears.
    */
  private def hilbertStep(bits: Int, shl: Shift, shr: Shift): String = {
    val mask = (1L << bits) - 1
    val x    = s"(${shr("acc", bits.toString)} & $mask)"
    val y    = s"(acc & $mask)"
    val d    = s"(${shr("acc", (2 * bits).toString)})"
    val rx   = s"(${shr(x, "i")} & 1)"
    val ry   = s"(${shr(y, "i")} & 1)"
    val sm   = s"(${shl(BigOne, "i")} - 1)" // s - 1
    val xl   = s"($x & $sm)"
    val yl   = s"($y & $sm)"
    val dfac = s"((3 * $rx) + ($ry * (1 - (2 * $rx))))"
    val dNew = s"($d + (${shl(BigOne, "(2*i)")} * $dfac))"
    val xNew = s"(CASE WHEN $ry = 0 THEN (CASE WHEN $rx = 1 THEN ($sm - $yl) ELSE $yl END) ELSE $xl END)"
    val yNew = s"(CASE WHEN $ry = 0 THEN (CASE WHEN $rx = 1 THEN ($sm - $xl) ELSE $xl END) ELSE $yl END)"
    s"(${shl(s"(${shl(dNew, bits.toString)} | $xNew)", bits.toString)} | $yNew)"
  }

  /** Hilbert curve index on the 2^bits × 2^bits grid via the native
    * codegen'd [[graft.functions.HilbertKey]] expression — the production
    * spelling (needs `GraftExtensions`; a dozen long ops per bit plane
    * inside whole-stage codegen, measured ~5× faster than the fold at
    * sf0.1 because HOF lambdas evaluate interpreted with every shared
    * subterm re-inlined). `LayoutSpec` law-checks native == fold.
    */
  def hilbertKeyNative(xName: String, yName: String, bits: Int): Column =
    expr(s"hilbert_key(cast($xName as bigint), cast($yName as bigint), $bits)")

  /** Hilbert curve index of two non-negative integer columns on the
    * 2^bits × 2^bits grid — the pure-HOF spelling, engine-portable (the
    * identical expression template evaluates in DuckDB, making the
    * oracle exact by construction); prefer [[hilbertKeyNative]] where
    * the extension is installed.
    */
  def hilbertKey(xName: String, yName: String, bits: Int): Column = {
    require(bits >= 1 && bits <= 20, s"bits must be in [1, 20], got $bits")
    val init = s"cast((cast($xName as bigint) * ${1L << bits}) + cast($yName as bigint) as bigint)"
    expr(s"shiftright(aggregate(sequence(${bits - 1}, 0, -1), $init, " +
      s"(acc, i) -> ${hilbertStep(bits, sparkShl, sparkShr)}), ${2 * bits})")
  }

  /** DuckDB spelling of [[hilbertKey]] — identical fold; the initial
    * accumulator rides as a prepended list element (list_reduce in this
    * engine takes no seed).
    */
  def hilbertKeySql(x: String, y: String, bits: Int): String = {
    val init = s"(CAST($x AS BIGINT) * ${1L << bits}) + CAST($y AS BIGINT)"
    s"((list_reduce(list_prepend($init, range(${bits - 1}, -1, -1)), " +
      s"(acc, i) -> ${hilbertStep(bits, duckShl, duckShr)})) >> ${2 * bits})"
  }

  // ---- the layout writer + audit ---------------------------------------

  /** Write `df` curve-ordered: one range exchange on the Morton key into
    * `nFiles` output files, sorted within each, key dropped before the
    * sink. Parquet then carries tight per-file/row-group min/max on BOTH
    * dims — the stats every reader's pruning consumes.
    *
    * Each dim is first NORMALIZED affinely onto the full [0, 2^bits)
    * grid from its observed min/max (one tiny pre-aggregate; the 1-row
    * collect is control plane, same class as the watermark reads). This
    * matters: interleaving raw values whose ranges span unequal bit
    * widths leaves the narrow dim's high bit planes constant, and the
    * curve degrades toward a single-dim sort — measured on lineitem
    * (partkey 11 bits vs ship-day 12), raw interleave gave 0.56 average
    * x-envelope per file where the normalized curve gives ~quarter-range
    * on both dims. Integer floor arithmetic throughout, so the layout is
    * deterministic and retry-stable.
    */
  def zorderWrite(df: DataFrame, xName: String, yName: String, bits: Int,
                  nFiles: Int, path: String): Unit = {
    require(!df.columns.contains("_graft_zkey"),
      "input already has a _graft_zkey column")
    val r = df.agg(min(col(xName).cast("long")), max(col(xName).cast("long")),
      min(col(yName).cast("long")), max(col(yName).cast("long"))).head()
    val m = (1L << bits) - 1
    def norm(name: String, lo: Long, hi: Long): String =
      if (hi > lo) s"(((cast($name as bigint) - ${lo}L) * ${m}L) div ${hi - lo}L)"
      else "cast(0 as bigint)"
    val nx = norm(xName, r.getLong(0), r.getLong(1))
    val ny = norm(yName, r.getLong(2), r.getLong(3))
    df.withColumn("_graft_zkey", zorderKeyOf(nx, ny, bits))
      .repartitionByRange(nFiles, col("_graft_zkey"))
      .sortWithinPartitions("_graft_zkey")
      .drop("_graft_zkey")
      .write.mode("overwrite").parquet(path)
  }

  /** Per-file layout audit of a written table: row count and both dims'
    * min/max envelopes — the direct input to a skip-fraction estimate
    * (a predicate prunes every file whose envelope excludes it).
    */
  def layoutAudit(spark: SparkSession, path: String,
                  xName: String, yName: String): DataFrame =
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("n_rows"),
        min(xName).as("min_x"), max(xName).as("max_x"),
        min(yName).as("min_y"), max(yName).as("max_y"))
      .orderBy("file")

  // ---- oracle-checked curve queries ------------------------------------

  /** Layout dims for lineitem: (l_partkey, ship-day ordinal) — the
    * classic two-predicate scan pair. 15 bits covers partkey ≤ 19,999
    * (it scales with SF: 199 / 1,999 / 19,999 at the generated scales)
    * and day ≤ 3,595. 12 bits looked sufficient from the small SFs but
    * silently truncated sf0.1's partkey — the fold SPILLS out-of-range
    * high bits into the packed accumulator while the native expression
    * MASKS them, so the two spellings only agree on in-grid input; size
    * `bits` to the data, and the `LayoutSpec` law now pins the
    * production width on real dims.
    */
  private val Bits = 15

  private def liDims(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir).select(
      col("l_partkey").cast("long").as("x"),
      datediff(col("l_shipdate"), lit("1992-01-01").cast("date")).cast("long").as("y"))

  private val liDimsSql =
    """SELECT CAST(l_partkey AS BIGINT) AS x,
      |       datediff('day', DATE '1992-01-01', CAST(l_shipdate AS DATE)) AS y
      |FROM lineitem""".stripMargin

  /** Per-curve-bucket envelope stats: bucket = top 6 curve-key bits
    * (64 buckets). The output IS the locality demonstration — each
    * bucket's envelope is bounded in both dims, which is exactly the
    * property a file inherits from curve-ordered writes.
    */
  private def bucketStats(dims: DataFrame, key: Column): DataFrame =
    dims.withColumn("k", key)
      .groupBy(shiftright(col("k"), 2 * Bits - 6).as("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        min("x").as("min_x"), max("x").as("max_x"),
        min("y").as("min_y"), max("y").as("max_y"))
      .orderBy("bucket")

  private def bucketStatsSql(keySql: String): String =
    s"""WITH dims AS (
       |  ${liDimsSql.replace("\n", "\n  ")}),
       |keyed AS (
       |  SELECT x, y, $keySql AS k FROM dims)
       |SELECT (k >> ${2 * Bits - 6}) AS bucket, CAST(count(*) AS BIGINT) AS n_rows,
       |       min(x) AS min_x, max(x) AS max_x,
       |       min(y) AS min_y, max(y) AS max_y
       |FROM keyed GROUP BY bucket ORDER BY bucket""".stripMargin

  def zorderLineitem(spark: SparkSession, dir: String): DataFrame = {
    graft.GraftExtensions.register(spark)
    bucketStats(liDims(spark, dir), zorderKeyNative("x", "y", Bits))
  }

  val zorderLineitemSql: String = bucketStatsSql(zorderKeySql("x", "y", Bits))

  def hilbertLineitem(spark: SparkSession, dir: String): DataFrame = {
    graft.GraftExtensions.register(spark)
    bucketStats(liDims(spark, dir), hilbertKeyNative("x", "y", Bits))
  }

  val hilbertLineitemSql: String = bucketStatsSql(hilbertKeySql("x", "y", Bits))

  val registry: Map[String, ((SparkSession, String) => DataFrame, String)] = Map(
    "zorder_lineitem"  -> (zorderLineitem _, zorderLineitemSql),
    "hilbert_lineitem" -> (hilbertLineitem _, hilbertLineitemSql))
}
