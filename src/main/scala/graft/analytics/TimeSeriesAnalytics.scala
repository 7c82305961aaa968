package graft.analytics

import graft.Tables
import graft.agg.BarAggregator
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Time-series operators beyond the reference's surface that a market-data
  * engine is expected to own: as-of joins and gap sessionization. Both are
  * composed from built-ins per the custom-operator preference order
  * (SURVEY.md §7.3) — no custom plan nodes needed.
  *
  * Scale notes (100 TB): both operators are one shuffle on symbol with
  * in-partition ordered scans — the union/as-of trick never materializes a
  * quadratic join, and sessionization is two window passes + one hash
  * aggregate. Skewed symbols would salt the window key (symbol, month).
  */
object TimeSeriesAnalytics {

  private val SessionGapUs = 1800L * 1000000 // 30 min, in exact microseconds

  /** Epoch microseconds that tolerates TIMESTAMP_NTZ input: the testdata
    * parquet stores `ts` with isAdjustedToUTC=false, which Spark reads as
    * TIMESTAMP_NTZ — a type `unix_micros` rejects outright. The cast to
    * TIMESTAMP is exact under the fixed UTC session timezone (wall time IS
    * the instant) and a no-op when the column is already LTZ.
    */
  private def epochUs(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    unix_micros(c.cast("timestamp"))

  // ---- ticks_asof_bars: each tick joined to the latest COMPLETED bar ---
  /** As-of join via the union + ordered carry-forward shape: a 1-minute
    * bar becomes visible at `bucket_start + 1 minute`; bar-availability
    * events and ticks merge into one per-symbol timeline, bars sort before
    * ticks at equal timestamps, and `last(close, ignoreNulls)` carries the
    * most recent visible close onto every tick. Equivalent to DuckDB's
    * `ASOF LEFT JOIN` on `event_time >= avail` (the oracle).
    */
  def ticksAsofBars(spark: SparkSession, dir: String): DataFrame = {
    val ticks = Tables.ticks(spark, dir)
    val nullDec  = lit(null).cast(DecimalType(12, 4))
    val tickEvts = ticks.select(
      col("symbol"), col("event_time").as("t"), lit(1).as("is_tick"),
      col("tick_id"), col("price"), nullDec.as("close"))
    val barEvts = BarAggregator.bars1m(ticks).select(
      col("symbol"), (col("bucket_start") + expr("INTERVAL 1 MINUTE")).as("t"),
      lit(0).as("is_tick"), lit(null).cast("long").as("tick_id"),
      nullDec.as("price"), col("close"))
    val w = Window.partitionBy("symbol").orderBy(col("t").asc, col("is_tick").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tickEvts.unionByName(barEvts)
      .withColumn("prev_close", last(col("close"), ignoreNulls = true).over(w))
      .filter(col("is_tick") === 1)
      .select(
        col("tick_id"), col("symbol"), col("t").as("event_time"),
        col("price").cast("double").as("price"),
        col("prev_close").cast("double").as("prev_close"))
  }

  val ticksAsofBarsSql: String =
    s"""${Tables.BARS_CTE}
       |SELECT t.tick_id, t.symbol, t.event_time,
       |       CAST(t.price AS DOUBLE) AS price,
       |       CAST(b."close" AS DOUBLE) AS prev_close
       |FROM ticks t ASOF LEFT JOIN (
       |  SELECT symbol, bucket_start + INTERVAL '1 minute' AS avail, "close" FROM bars) b
       |  ON t.symbol = b.symbol AND t.event_time >= b.avail""".stripMargin

  // ---- ticks_asof_bars_native: the custom AsofJoin plan node -----------
  /** Same semantics through [[graft.plans.AsofJoin]] — a native
    * LogicalPlan/Strategy/SparkPlan operator doing one co-partitioned
    * sorted merge with O(1) state per partition, instead of re-sorting a
    * unioned table. Same oracle as the composition-based variant.
    */
  def ticksAsofBarsNative(spark: SparkSession, dir: String): DataFrame = {
    val ticks = Tables.ticks(spark, dir)
      .select(col("tick_id"), col("symbol"), col("event_time"), col("price"))
    val bars = BarAggregator.bars1m(Tables.ticks(spark, dir)).select(
      col("symbol"),
      (col("bucket_start") + expr("INTERVAL 1 MINUTE")).as("avail"),
      col("close"))
    graft.plans.AsofJoin.asofJoin(ticks, bars, "symbol", "event_time", "avail")
      .select(
        col("tick_id"), col("symbol"), col("event_time"),
        col("price").cast("double").as("price"),
        col("close").cast("double").as("prev_close"))
  }

  // ---- tick_sessions: 30-minute-gap sessionization ---------------------
  /** Classic gap sessionization: a new session starts where the gap to the
    * previous tick exceeds the threshold; session id is the running count
    * of session starts. Gap math is exact integer microseconds on both
    * engines (fractional-second timestamps make epoch-seconds comparisons
    * engine-dependent).
    */
  def tickSessions(spark: SparkSession, dir: String): DataFrame = {
    val w  = Window.partitionBy("symbol").orderBy("event_time")
    val wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.ticks(spark, dir)
      .withColumn("prev", lag(col("event_time"), 1).over(w))
      .withColumn("new_sess",
        when(col("prev").isNull
          || epochUs(col("event_time")) - epochUs(col("prev")) > SessionGapUs, 1)
          .otherwise(0))
      .withColumn("session_id", sum(col("new_sess")).over(wc))
      .groupBy(col("symbol"), col("session_id"))
      .agg(
        min(col("event_time")).as("session_start"),
        max(col("event_time")).as("session_end"),
        count(lit(1)).as("n_ticks"))
      .withColumn("duration_us",
        epochUs(col("session_end")) - epochUs(col("session_start")))
  }

  val tickSessionsSql: String =
    s"""${Tables.TICKS_CTE},
       |lagged AS (
       |  SELECT symbol, event_time,
       |         lag(event_time) OVER (PARTITION BY symbol ORDER BY event_time) AS prev
       |  FROM ticks),
       |flagged AS (
       |  SELECT symbol, event_time,
       |         CASE WHEN prev IS NULL
       |                OR epoch_us(event_time) - epoch_us(prev) > $SessionGapUs
       |              THEN 1 ELSE 0 END AS new_sess
       |  FROM lagged),
       |numbered AS (
       |  SELECT symbol, event_time,
       |         CAST(sum(new_sess) OVER (PARTITION BY symbol ORDER BY event_time
       |                                  ROWS UNBOUNDED PRECEDING) AS BIGINT)
       |           AS session_id
       |  FROM flagged)
       |SELECT symbol, session_id,
       |       min(event_time) AS session_start,
       |       max(event_time) AS session_end,
       |       count(*) AS n_ticks,
       |       epoch_us(max(event_time)) - epoch_us(min(event_time)) AS duration_us
       |FROM numbered
       |GROUP BY symbol, session_id""".stripMargin

  // ---- tick_sessions_native: Spark's built-in session_window -----------
  /** The same sessionization through `session_window` (one aggregate, no
    * window-function passes — Spark merges gap-adjacent events natively;
    * this is also the construct the streaming variant would use). Session
    * semantics: a new session starts when the gap is ≥ the 30-minute
    * timeout; `session_close` is last event + gap (the window end), which
    * the oracle reproduces as `max(event_time) + INTERVAL 30 minutes`.
    */
  def tickSessionsNative(spark: SparkSession, dir: String): DataFrame =
    Tables.ticks(spark, dir)
      .groupBy(col("symbol"), session_window(col("event_time"), "30 minutes"))
      .agg(count(lit(1)).as("n_ticks"))
      .select(
        col("symbol"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_close"),
        col("n_ticks"))

  val tickSessionsNativeSql: String =
    s"""${Tables.TICKS_CTE},
       |lagged AS (
       |  SELECT symbol, event_time,
       |         lag(event_time) OVER (PARTITION BY symbol ORDER BY event_time) AS prev
       |  FROM ticks),
       |numbered AS (
       |  SELECT symbol, event_time,
       |         sum(CASE WHEN prev IS NULL
       |                    OR epoch_us(event_time) - epoch_us(prev) >= $SessionGapUs
       |                  THEN 1 ELSE 0 END)
       |           OVER (PARTITION BY symbol ORDER BY event_time
       |                 ROWS UNBOUNDED PRECEDING) AS sid
       |  FROM lagged)
       |SELECT symbol,
       |       min(event_time) AS session_start,
       |       max(event_time) + INTERVAL '30 minutes' AS session_close,
       |       count(*) AS n_ticks
       |FROM numbered
       |GROUP BY symbol, sid""".stripMargin

  // ---- ticks_sma: rolling-frame moving average + running volume --------
  /** Window frames over the per-symbol timeline: 5-tick simple moving
    * average and cumulative volume. Frame sums stay exact DECIMAL until
    * one double division + round, so sliding-frame evaluation order can't
    * produce engine-dependent bits.
    */
  def ticksSma(spark: SparkSession, dir: String): DataFrame = {
    val w5 = Window.partitionBy("symbol").orderBy("event_time").rowsBetween(-4, 0)
    val wc = Window.partitionBy("symbol").orderBy("event_time")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.ticks(spark, dir).select(
      col("tick_id"), col("symbol"), col("event_time"),
      col("price").cast("double").as("price"),
      round(sum(col("price")).over(w5).cast("double")
        / count(lit(1)).over(w5), 4).as("sma5"),
      sum(coalesce(col("volume"), lit(0L))).over(wc).as("cum_volume"))
  }

  val ticksSmaSql: String =
    s"""${Tables.TICKS_CTE}
       |SELECT tick_id, symbol, event_time,
       |       CAST(price AS DOUBLE) AS price,
       |       round(CAST(sum(price) OVER w5 AS DOUBLE)
       |             / count(*) OVER w5, 4) AS sma5,
       |       CAST(sum(coalesce(volume, 0)) OVER wc AS BIGINT) AS cum_volume
       |FROM ticks
       |WINDOW w5 AS (PARTITION BY symbol ORDER BY event_time
       |              ROWS BETWEEN 4 PRECEDING AND CURRENT ROW),
       |       wc AS (PARTITION BY symbol ORDER BY event_time
       |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin

  // ---- price_histogram: fixed-width binning ----------------------------
  def priceHistogram(spark: SparkSession, dir: String): DataFrame =
    Tables.ticks(spark, dir)
      .groupBy(col("symbol"),
        floor(col("price").cast("double") / 50.0).cast("long").as("bin"))
      .agg(count(lit(1)).as("n"))
      .orderBy("symbol", "bin")

  val priceHistogramSql: String =
    s"""${Tables.TICKS_CTE}
       |SELECT symbol, CAST(floor(CAST(price AS DOUBLE) / 50.0) AS BIGINT) AS bin,
       |       count(*) AS n
       |FROM ticks GROUP BY symbol, bin ORDER BY symbol, bin""".stripMargin

  // ---- ticks_anomaly: rolling z-score outlier detection ----------------
  /** Flags ticks whose price is > 3 sample standard deviations from the
    * mean of the PRECEDING 20 ticks of the same symbol (frame excludes
    * the current row — the tick is scored against history it didn't
    * contribute to). The moment sums n/Σp/Σp² stay exact DECIMAL through
    * the window frame; mean/variance/z are then ONE double expression in
    * the identical operation order in both engines, so sliding-frame
    * accumulation order can't produce engine-dependent bits (house
    * determinism rule, see ticksSma).
    *
    * Scale: one shuffle on symbol, one ordered in-partition window pass —
    * the same O(rows) shape as ticks_sma; 21-row frames mean constant
    * per-row state. Skewed symbols would salt to (symbol, day) with a
    * 20-row warmup overlap per slice.
    */
  def ticksAnomaly(spark: SparkSession, dir: String): DataFrame = {
    // tick_id tiebreak: with same-timestamp ticks per symbol, an
    // event_time-only ROWS frame has engine/plan-dependent membership
    // (same reason ticksDrawdown and event_transitions order by both).
    val fr = Window.partitionBy("symbol").orderBy(col("event_time"), col("tick_id"))
      .rowsBetween(-20, -1)
    val p  = col("price").cast("double")
    val n  = col("n").cast("double")
    val s1 = col("s1").cast("double")
    val s2 = col("s2").cast("double")
    val z  = (p - s1 / n) / sqrt((s2 - s1 * s1 / n) / (n - lit(1.0)))
    Tables.ticks(spark, dir)
      .select(col("tick_id"), col("symbol"), col("event_time"), col("price"),
        count(col("price")).over(fr).as("n"),
        sum(col("price")).over(fr).as("s1"),
        sum(col("price") * col("price")).over(fr).as("s2"))
      .filter(col("n") >= 10)
      .select(col("tick_id"), col("symbol"), col("event_time"),
        p.as("price"), round(z, 4).as("zscore"))
      .filter(abs(col("zscore")) > 3.0)
      .orderBy("symbol", "event_time")
  }

  val ticksAnomalySql: String =
    s"""${Tables.TICKS_CTE},
       |w AS (
       |  SELECT tick_id, symbol, event_time, price,
       |         count(price) OVER fr AS n,
       |         sum(price)   OVER fr AS s1,
       |         sum(price * price) OVER fr AS s2
       |  FROM ticks
       |  WINDOW fr AS (PARTITION BY symbol ORDER BY event_time, tick_id
       |                ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)),
       |scored AS (
       |  SELECT tick_id, symbol, event_time, CAST(price AS DOUBLE) AS price,
       |         round((CAST(price AS DOUBLE) - CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
       |               / sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
       |                      / (CAST(n AS DOUBLE) - 1.0)), 4) AS zscore
       |  FROM w WHERE n >= 10)
       |SELECT tick_id, symbol, event_time, price, zscore
       |FROM scored WHERE abs(zscore) > 3.0
       |ORDER BY symbol, event_time""".stripMargin

  // ---- ticks_range_vwap: time-RANGE window frame -----------------------
  /** Rolling 5-minute VWAP per tick using a RANGE frame over event time —
    * the frame type the ROWS-based queries (ticks_sma, ticks_anomaly)
    * can't express: the window covers whatever number of ticks landed in
    * the last 300 seconds, including all peers at the boundary instant.
    * Ordering key is epoch MICROseconds on both engines (µs-exact; a
    * seconds-truncated key would put a tick 300.4 s back inside the
    * frame). Price·volume products and both frame sums stay exact
    * DECIMAL/long; the output is the UNROUNDED double quotient: both
    * sums cast to double exactly (< 2⁵³ scaled units by orders of
    * magnitude at any tested SF), so the one IEEE division is
    * bit-identical across engines. round(…, 4) would BREAK parity here,
    * not help it — ratios of 4-decimal prices to integer volumes land on
    * exact 5-decimal halves, where Spark (HALF_UP on the exact binary
    * expansion) and DuckDB (scaled-double rounding) disagree by one ulp
    * (observed at sf0.01 row 958: 30.03225 → 30.0322 vs 30.0323).
    *
    * Scale: identical single-exchange shape as ticks_sma — shuffle on
    * symbol, ordered in-partition pass; RANGE frames evaluate with a
    * sliding two-pointer over the sorted run, so cost stays O(rows) with
    * state bounded by the densest 5-minute burst.
    */
  def ticksRangeVwap(spark: SparkSession, dir: String): DataFrame = {
    val fr = Window.partitionBy("symbol").orderBy(col("t_us"))
      .rangeBetween(-300000000L, 0L)
    Tables.ticks(spark, dir)
      .withColumn("t_us", epochUs(col("event_time")))
      .withColumn("_pv",
        (col("price") * col("volume").cast(DecimalType(12, 0))).as("_pv"))
      .select(col("tick_id"), col("symbol"), col("event_time"),
        sum(col("_pv")).over(fr).as("_spv"),
        sum(coalesce(col("volume"), lit(0L))).over(fr).as("_sv"))
      .select(col("tick_id"), col("symbol"), col("event_time"),
        (col("_spv").cast("double")
          / nullif(col("_sv"), lit(0L)).cast("double")).as("vwap_5m"))
      .orderBy("symbol", "event_time")
  }

  val ticksRangeVwapSql: String =
    s"""${Tables.TICKS_CTE}
       |SELECT tick_id, symbol, event_time,
       |       CAST(sum(price * CAST(volume AS DECIMAL(12,0))) OVER fr AS DOUBLE)
       |       / CAST(nullif(sum(coalesce(volume, 0)) OVER fr, 0) AS DOUBLE) AS vwap_5m
       |FROM ticks
       |WINDOW fr AS (PARTITION BY symbol ORDER BY epoch_us(event_time)
       |              RANGE BETWEEN 300000000 PRECEDING AND CURRENT ROW)
       |ORDER BY symbol, event_time""".stripMargin

  // ---- ticks_beta: bivariate statistics from exact moment sums ---------
  /** Per-symbol price↔volume Pearson correlation and OLS slope
    * (price ~ volume) — the statistical-aggregate tier (corr/covar/
    * regr_slope) done the cross-engine-deterministic way: the built-in
    * `corr` accumulates doubles in partition order (engine- and
    * plan-dependent bits), so instead the five moment sums n/Σx/Σy/Σxy/Σx²/Σy²
    * are aggregated EXACTLY (decimal/long — associative, order-free) and
    * the statistics are one double expression in identical operation
    * order, rounded at the edge. Same partial-aggregate shape as any
    * hash agg — one shuffle keyed on symbol, constant per-group state;
    * this is also how the moments would be maintained incrementally in a
    * streaming state store.
    */
  def ticksBeta(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables.ticks(spark, dir).filter(col("volume").isNotNull)
    val vDec = col("volume").cast(DecimalType(12, 0))
    val agg = t.groupBy("symbol").agg(
      count(lit(1)).as("n"),
      sum(col("price")).as("sx"),
      sum(col("volume")).as("sy"),
      sum(col("price") * vDec).as("sxy"),
      sum(col("price") * col("price")).as("sx2"),
      // vDec² not long² — long wraps silently ~1e21 scaled units (1e13
      // rows × 1e8 per-row square) while the oracle promotes to HUGEINT;
      // DECIMAL keeps the moment sum exact and order-free in both engines.
      sum(vDec * vDec).as("sy2"))
    val n   = col("n").cast("double")
    val sx  = col("sx").cast("double");  val sy  = col("sy").cast("double")
    val sxy = col("sxy").cast("double"); val sx2 = col("sx2").cast("double")
    val sy2 = col("sy2").cast("double")
    val num = n * sxy - sx * sy
    agg.select(col("symbol"), col("n"),
        round(num / (sqrt(n * sx2 - sx * sx) * sqrt(n * sy2 - sy * sy)), 4)
          .as("price_volume_corr"),
        round(num / (n * sy2 - sy * sy), 6).as("beta"))
      .orderBy("symbol")
  }

  val ticksBetaSql: String =
    s"""${Tables.TICKS_CTE},
       |m AS (
       |  SELECT symbol, count(*) AS n,
       |         sum(price) AS sx,
       |         sum(volume) AS sy,
       |         sum(price * CAST(volume AS DECIMAL(12,0))) AS sxy,
       |         sum(price * price) AS sx2,
       |         sum(CAST(volume AS DECIMAL(12,0)) * CAST(volume AS DECIMAL(12,0))) AS sy2
       |  FROM ticks WHERE volume IS NOT NULL GROUP BY symbol)
       |SELECT symbol, n,
       |       round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
       |             / (sqrt(CAST(n AS DOUBLE) * CAST(sx2 AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
       |                * sqrt(CAST(n AS DOUBLE) * CAST(sy2 AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 4)
       |         AS price_volume_corr,
       |       round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
       |             / (CAST(n AS DOUBLE) * CAST(sy2 AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)), 6)
       |         AS beta
       |FROM m ORDER BY symbol""".stripMargin

  // ---- ticks_drawdown: running-max drawdown per symbol -----------------
  /** Maximum drawdown — the peak-to-trough loss fraction against the
    * running high-water mark, the canonical path-dependent risk metric.
    * The running max stays exact DECIMAL through the cumulative frame;
    * each row's drawdown is one double division, and the final `max` is
    * order-free, so the result is bit-deterministic cross-engine before
    * the edge rounding.
    *
    * Scale: the ticks_sma shape — one shuffle on symbol, one ordered
    * in-partition window pass (cumulative max is O(1) per row), one
    * 5-row final aggregate.
    */
  def ticksDrawdown(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("symbol").orderBy(col("event_time"), col("tick_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.ticks(spark, dir)
      .select(col("symbol"), col("price"),
        max(col("price")).over(w).as("run_max"))
      .select(col("symbol"),
        ((col("run_max") - col("price")).cast("double")
          / col("run_max").cast("double")).as("dd"))
      .groupBy("symbol")
      .agg(round(max(col("dd")), 6).as("max_drawdown"))
      .orderBy("symbol")
  }

  val ticksDrawdownSql: String =
    s"""${Tables.TICKS_CTE},
       |dd AS (
       |  SELECT symbol,
       |         CAST(max(price) OVER w - price AS DOUBLE)
       |         / CAST(max(price) OVER w AS DOUBLE) AS dd
       |  FROM ticks
       |  WINDOW w AS (PARTITION BY symbol ORDER BY event_time, tick_id
       |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
       |SELECT symbol, round(max(dd), 6) AS max_drawdown
       |FROM dd GROUP BY symbol ORDER BY symbol""".stripMargin

  // ---- ticks_ewma: exponential smoothing via ordered fold --------------
  /** Per-symbol exponentially-weighted moving average of price,
    * `ewma' = α·x + (1−α)·ewma` with α = 0.5 seeded at the first tick —
    * the genuinely ORDER-DEPENDENT recursion no window frame expresses
    * (each output depends on every prior input, not a bounded frame).
    * Cross-engine exactness comes from the house sorted-fold idiom
    * (`sort_array` + `aggregate` ↔ `list_sort` + `list_reduce`): both
    * engines run the identical IEEE op sequence over the identically
    * ordered (event_time, tick_id) price list, and α = 0.5 keeps the
    * scale factors power-of-two exact. Emitted unrounded (house rule:
    * no round() on results that are already bit-deterministic).
    *
    * Scale (100 TB): the fold carries one symbol's full history through
    * a single `collect_list`, which is the correct call HERE (5 symbols ×
    * bounded history) but not the general 100 TB plan. The scalable
    * formulation — documented, not oracle-matched, because it reorders
    * the float ops — is the two-level segment composition the engine
    * already uses for prefix sums in `corpus_pack`: EWMA over a
    * concatenation composes linearly (each segment reduces to the pair
    * `(α_seg, b_seg)` with `ewma = α_seg·carry + b_seg`, segments then
    * fold in order over the tiny per-segment table), so per-partition
    * state is O(1) and no executor ever holds a full key's history.
    */
  def ticksEwma(spark: SparkSession, dir: String): DataFrame =
    Tables.ticks(spark, dir)
      .select(col("symbol"),
        struct(col("event_time"), col("tick_id"),
          col("price").cast("double").as("price")).as("s"))
      .groupBy("symbol")
      .agg(collect_list(col("s")).as("ss"))
      .select(col("symbol"),
        expr("transform(array_sort(ss), v -> v.price)").as("ps"))
      .select(col("symbol"),
        size(col("ps")).as("n_ticks"),
        expr("aggregate(slice(ps, 2, size(ps) - 1), ps[0]," +
          " (acc, x) -> 0.5D * x + 0.5D * acc)").as("ewma"))
      .orderBy("symbol")

  val ticksEwmaSql: String =
    s"""${Tables.TICKS_CTE},
       |g AS (
       |  SELECT symbol,
       |         list({'event_time': event_time, 'tick_id': tick_id,
       |               'price': CAST(price AS DOUBLE)}) AS ss
       |  FROM ticks GROUP BY symbol),
       |p AS (
       |  SELECT symbol, [v.price FOR v IN list_sort(ss)] AS ps FROM g)
       |SELECT symbol, CAST(len(ps) AS INT) AS n_ticks,
       |       list_reduce(ps, (acc, x) -> 0.5::DOUBLE * x + 0.5::DOUBLE * acc) AS ewma
       |FROM p ORDER BY symbol""".stripMargin

  // ---- spike_ticks: volume-spike windows via bucketized interval join --
  /** Market-wide activity-spike report: minutes whose tick count exceeds
    * [[SpikeFactor]]× the per-minute mean are merged into maximal spike
    * WINDOWS (gaps-and-islands), and every tick falling inside a window
    * is attributed to it via [[graft.operators.IntervalJoin]] — the
    * bucketized equi-join rewrite of the point-in-interval range join
    * that Spark would otherwise plan as a BroadcastNestedLoopJoin.
    * Output: one row per spike window with its tick/symbol/volume mass.
    *
    * Determinism: integer-only — the spike test is `n·n_min >
    * SpikeFactor·total` (no division), counts and coalesced volume sums
    * are exact.
    *
    * Scale: the minute aggregate is one keyed shuffle; the spike set is
    * small BY CONSTRUCTION (above-[[SpikeFactor]]×-mean minutes), so the
    * global islands window and the interval build side are tiny while
    * the tick side stays fully distributed through the bucket equi-join
    * (minute buckets = interval granularity, so each point joins its own
    * bucket only). The plan-law spec asserts no BNLJ/cartesian appears.
    */
  def spikeTicks(spark: SparkSession, dir: String): DataFrame = {
    val pts = Tables.ticks(spark, dir)
      .select(col("symbol"), col("event_time"),
        coalesce(col("volume"), lit(0L)).as("v"),
        date_trunc("minute", col("event_time")).as("pm"))
    val byMin = pts.groupBy(col("pm").as("m")).agg(count(lit(1)).as("n"))
    val stats = byMin.agg(count(lit(1)).as("n_min"), sum(col("n")).as("total"))
    val w  = Window.orderBy("m")
    val wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val intervals = byMin.crossJoin(broadcast(stats))
      .filter(col("n") * col("n_min") > lit(SpikeFactor) * col("total"))
      .select("m")
      .withColumn("prev", lag(col("m"), 1).over(w))
      .withColumn("new_iv",
        when(col("prev").isNull
          || epochUs(col("m")) - epochUs(col("prev")) > 60000000L, 1)
          .otherwise(0))
      .withColumn("iv", sum(col("new_iv")).over(wc))
      .groupBy("iv")
      .agg(min(col("m")).as("spike_start"), max(col("m")).as("spike_end"))
      .select("spike_start", "spike_end")
    graft.operators.IntervalJoin
      .pointInInterval(pts, "pm", intervals, "spike_start", "spike_end", 60L)
      .groupBy("spike_start", "spike_end")
      .agg(count(lit(1)).as("n_ticks"),
        countDistinct(col("symbol")).as("n_symbols"),
        sum(col("v")).as("spike_volume"))
      .withColumn("n_minutes",
        expr("(unix_micros(cast(spike_end as timestamp))" +
          " - unix_micros(cast(spike_start as timestamp))) div 60000000 + 1"))
      .select(col("spike_start"), col("spike_end"), col("n_minutes"),
        col("n_ticks"), col("n_symbols"), col("spike_volume"))
      .orderBy("spike_start")
  }

  private val SpikeFactor = 2L

  val spikeTicksSql: String =
    s"""${Tables.TICKS_CTE},
       |pts AS (
       |  SELECT symbol, event_time, coalesce(volume, 0) AS v,
       |         date_trunc('minute', event_time) AS pm
       |  FROM ticks),
       |bymin AS (SELECT pm AS m, count(*) AS n FROM pts GROUP BY 1),
       |st AS (SELECT count(*) AS n_min, CAST(sum(n) AS BIGINT) AS total FROM bymin),
       |spike AS (
       |  SELECT m FROM bymin, st WHERE n * n_min > $SpikeFactor * total),
       |flagged AS (
       |  SELECT m,
       |         CASE WHEN lag(m) OVER (ORDER BY m) IS NULL
       |                OR epoch_us(m) - epoch_us(lag(m) OVER (ORDER BY m)) > 60000000
       |              THEN 1 ELSE 0 END AS new_iv
       |  FROM spike),
       |iv AS (
       |  SELECT m, CAST(sum(new_iv) OVER (ORDER BY m ROWS UNBOUNDED PRECEDING)
       |             AS BIGINT) AS iv
       |  FROM flagged),
       |intervals AS (
       |  SELECT min(m) AS spike_start, max(m) AS spike_end FROM iv GROUP BY iv)
       |SELECT i.spike_start, i.spike_end,
       |       (epoch_us(i.spike_end) - epoch_us(i.spike_start)) // 60000000 + 1
       |         AS n_minutes,
       |       count(*) AS n_ticks,
       |       CAST(count(DISTINCT p.symbol) AS BIGINT) AS n_symbols,
       |       CAST(sum(p.v) AS BIGINT) AS spike_volume
       |FROM pts p JOIN intervals i
       |  ON p.pm >= i.spike_start AND p.pm <= i.spike_end
       |GROUP BY i.spike_start, i.spike_end
       |ORDER BY i.spike_start""".stripMargin

  // ---- ticks_corr: cross-series co-moment matrix ------------------------
  /** Pairwise CROSS-series statistics — the correlation-heatmap input a
    * multi-asset dashboard reads, and the one time-series family the
    * board lacked (every other entry is within-series). For each symbol
    * pair, the exact integer co-moments (n, Σx, Σy, Σxy, Σx², Σy²) of
    * the two series' minute-bucketed mean prices over their COMMON
    * minutes; Pearson/covariance/OLS are one double expression
    * downstream (the [[ticksBeta]] determinism rule: exact associative
    * moments cross engines, float math only at the edge — here the edge
    * is the consumer).
    *
    * Alignment: per (symbol, minute) mean price in integer
    * ten-thousandths — `floor(10⁴·Σprice / n)`, exact in both engines
    * because the DECIMAL(12,4) sum times 10⁴ is an exact integer — then
    * an equi-join on the minute key. Inner join = pairwise-complete
    * observations, the standard correlation-matrix convention.
    *
    * Scale (100 TB): the minute roll-up is one partial-aggregable
    * shuffle; the pair join is minute-keyed with per-minute fan-out
    * bounded by the SYMBOL DOMAIN (≤ S²/2 pair rows per minute — S is a
    * value domain, not a corpus axis), and the output is ≤ S(S-1)/2
    * cells. Long bounds: p ≤ 10⁴·max_price and Σxy ≤ minutes·p² — at
    * max_price 560 and a month of minutes that is ~1.2×10¹⁸, 7× inside
    * Long; longer windows shard by calendar period and merge moments
    * (they are associative).
    */
  def ticksCorr(spark: SparkSession, dir: String): DataFrame =
    ticksCorrOn(Tables.ticks(spark, dir))

  private[graft] def ticksCorrOn(ticks: DataFrame): DataFrame = {
    val m = ticks
      .groupBy(col("symbol"),
        date_trunc("minute", col("event_time")).as("minute"))
      .agg(expr("CAST(sum(price) * 10000 AS BIGINT)").as("sp"),
        count(lit(1)).as("cnt"))
      .select(col("symbol"), col("minute"), expr("sp div cnt").as("p"))
    m.as("a")
      .join(m.as("b"),
        col("a.minute") === col("b.minute") && col("a.symbol") < col("b.symbol"))
      .groupBy(col("a.symbol").as("symbol_a"), col("b.symbol").as("symbol_b"))
      .agg(count(lit(1)).as("n"),
        sum(col("a.p")).as("sx"), sum(col("b.p")).as("sy"),
        sum(col("a.p") * col("b.p")).as("sxy"),
        sum(col("a.p") * col("a.p")).as("sxx"),
        sum(col("b.p") * col("b.p")).as("syy"))
      .orderBy("symbol_a", "symbol_b")
  }

  val ticksCorrSql: String =
    s"""${Tables.TICKS_CTE},
       |m AS (
       |  SELECT symbol, date_trunc('minute', event_time) AS minute,
       |         CAST(sum(price) * 10000 AS BIGINT)
       |           // CAST(count(*) AS BIGINT) AS p
       |  FROM ticks GROUP BY 1, 2)
       |SELECT a.symbol AS symbol_a, b.symbol AS symbol_b,
       |       CAST(count(*) AS BIGINT) AS n,
       |       CAST(sum(a.p) AS BIGINT) AS sx,
       |       CAST(sum(b.p) AS BIGINT) AS sy,
       |       CAST(sum(a.p * b.p) AS BIGINT) AS sxy,
       |       CAST(sum(a.p * a.p) AS BIGINT) AS sxx,
       |       CAST(sum(b.p * b.p) AS BIGINT) AS syy
       |FROM m a JOIN m b
       |  ON a.minute = b.minute AND a.symbol < b.symbol
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  val registry: Map[String, ((SparkSession, String) => DataFrame, String)] = Map(
    "ticks_corr"             -> (ticksCorr _, ticksCorrSql),
    "ticks_asof_bars"        -> (ticksAsofBars _, ticksAsofBarsSql),
    "spike_ticks"            -> (spikeTicks _, spikeTicksSql),
    "ticks_anomaly"          -> (ticksAnomaly _, ticksAnomalySql),
    "ticks_range_vwap"       -> (ticksRangeVwap _, ticksRangeVwapSql),
    "ticks_beta"             -> (ticksBeta _, ticksBetaSql),
    "ticks_drawdown"         -> (ticksDrawdown _, ticksDrawdownSql),
    "ticks_asof_bars_native" -> (ticksAsofBarsNative _, ticksAsofBarsSql),
    "tick_sessions"          -> (tickSessions _, tickSessionsSql),
    "tick_sessions_native"   -> (tickSessionsNative _, tickSessionsNativeSql),
    "ticks_sma"              -> (ticksSma _, ticksSmaSql),
    "ticks_ewma"             -> (ticksEwma _, ticksEwmaSql),
    "price_histogram"        -> (priceHistogram _, priceHistogramSql),
  )
}
