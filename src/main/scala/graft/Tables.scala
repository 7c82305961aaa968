package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Central loaders for the driver-generated testdata tables (TESTDATA.md)
  * plus the tick view re-expressing the reference's stock data model
  * (reference: infra/postgres/init.sql:1-8) over the synthetic `events`
  * table. Every mapping here has a 1:1 DuckDB CTE twin (TICKS_CTE) so the
  * driver's oracle sees identical inputs.
  */
object Tables {

  private def parquet(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** events.parquet carries TIMESTAMP(NANOS), which Spark only reads under
    * spark.sql.legacy.parquet.nanosAsLong (as raw Long nanos). Normalize to
    * microsecond TimestampType with integer division — identical to DuckDB's
    * native ns→µs truncation, so oracle timestamps match exactly.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    // Runtime SQLConf; set defensively in case the session was built
    // without it (e.g. the driver's own smoke harness).
    try spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    catch { case _: Throwable => () }
    val raw = parquet(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _        => raw
    }
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame = parquet(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame   = parquet(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = parquet(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = parquet(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame     = parquet(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame   = parquet(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame   = parquet(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame  = parquet(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = parquet(spark, dir, "embeddings")

  /** Register every table (plus the derived `ticks` and `bars` views) as
    * temp views, so the whole engine surface is reachable through
    * `spark.sql(...)` exactly like the reference's SQL strings — Catalyst
    * plans SQL text and the DataFrame builders onto the same logical
    * plans, so both paths share pushdown, pruning, and join strategies.
    *
    * Note the derived `bars` view is an UNMATERIALIZED plan: every SQL
    * query over it re-runs the 1-minute aggregation, mirroring the
    * reference's CTE-per-query shape (queries.py builds BARS_CTE into
    * each statement). A deployment serving many bar queries should
    * materialize it instead — `IncrementalBars` is exactly that
    * incremental materialization, and `spark.read.parquet(barsPath)
    * .createOrReplaceTempView("bars")` swaps it in transparently.
    */
  def registerViews(spark: SparkSession, dir: String): Unit = {
    Seq("lineitem", "orders", "customer", "supplier", "part", "nation",
      "region", "documents", "embeddings")
      .foreach(n => parquet(spark, dir, n).createOrReplaceTempView(n))
    events(spark, dir).createOrReplaceTempView("events")
    ticks(spark, dir).createOrReplaceTempView("ticks")
    graft.agg.BarAggregator.bars1m(ticks(spark, dir)).createOrReplaceTempView("bars")
  }

  /** Tick view: the reference's `stock_ticks` table (init.sql:1-8) over
    * `events`. symbol ≙ upper(event_type) (F10 normalization), price ≙
    * value as DECIMAL(12,4) (NUMERIC(12,4), init.sql:4), volume ≙ user_id
    * made nullable on a deterministic rule so the reference's
    * COALESCE(volume,0) null-guard (aggregator.py:34) is actually
    * exercised, event_time ≙ ts.
    */
  def ticks(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir).select(
      col("event_id").as("tick_id"),
      upper(col("event_type")).as("symbol"),
      col("value").cast(DecimalType(12, 4)).as("price"),
      when(col("event_id") % 97 === 0, lit(null).cast(LongType))
        .otherwise(col("user_id")).as("volume"),
      col("ts").as("event_time"))

  /** DuckDB CTE mirroring ticks() exactly — prefix of every stock oracle. */
  val TICKS_CTE: String =
    """WITH ticks AS (
      |  SELECT event_id AS tick_id,
      |         upper(event_type) AS symbol,
      |         CAST(value AS DECIMAL(12,4)) AS price,
      |         CASE WHEN event_id % 97 = 0 THEN NULL ELSE user_id END AS volume,
      |         ts AS event_time
      |  FROM events)""".stripMargin

  /** DuckDB CTE for the derived 1-minute bars (mirrors BarAggregator.bars1m;
    * reference AGGREGATE_SQL services/aggregator/aggregator.py:26-39).
    * Deterministic because (symbol, event_time) is unique in the testdata
    * (verified at every SF).
    */
  val BARS_CTE: String =
    TICKS_CTE + """,
      |bars AS (
      |  SELECT symbol,
      |         date_trunc('minute', event_time) AS bucket_start,
      |         arg_min(price, event_time) AS open,
      |         max(price) AS high,
      |         min(price) AS low,
      |         arg_max(price, event_time) AS close,
      |         sum(coalesce(volume, 0)) AS volume_sum,
      |         count(*) AS tick_count
      |  FROM ticks
      |  GROUP BY 1, 2)""".stripMargin
}
