package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Deterministic tick synthesis — the reference's simulated producer
  * (services/producer/producer.py:66-74: one random symbol of 6 every 2 s,
  * price = base + uniform(−0.5, 0.5) rounded to 2 dp, volume ∈
  * [500, 15000], UTC event time) as a seeded, fully distributed column
  * pipeline: `spark.range` (or the rate source) provides the index space
  * and every "random" draw is an xxhash64-derived uniform, so any slice of
  * the stream is reproducible from (seed, index) alone — no driver-side
  * RNG state, no per-executor divergence.
  */
object TickGenerator {

  val Symbols: Seq[String] = Seq("AAPL", "MSFT", "GOOG", "AMZN", "NVDA", "TSLA")
  val BasePrices: Seq[Double] = Seq(190.0, 420.0, 170.0, 180.0, 120.0, 250.0)

  /** u ∈ [0, 1) derived from (seed, index, salt). */
  private def u01(seed: Long, salt: String): org.apache.spark.sql.Column =
    (pmod(xxhash64(lit(seed), col("id"), lit(salt)), lit(1000000L)).cast("double")
      / 1000000.0)

  private def tickColumns(df: DataFrame, seed: Long, startEpochSec: Long,
      intervalSec: Int): DataFrame = {
    val symIdx = pmod(xxhash64(lit(seed), col("id"), lit("s")), lit(Symbols.length))
      .cast("int")
    val base = element_at(
      array(BasePrices.map(lit): _*), symIdx + 1)
    df.select(
      col("id").as("tick_id"),
      element_at(array(Symbols.map(lit): _*), symIdx + 1).as("symbol"),
      round(base + (u01(seed, "p") - 0.5), 2).cast(DecimalType(12, 4)).as("price"),
      (lit(500L) + pmod(xxhash64(lit(seed), col("id"), lit("v")), lit(14501L)))
        .as("volume"),
      timestamp_seconds(lit(startEpochSec) + col("id") * intervalSec)
        .as("event_time"))
  }

  /** Seeded batch of n ticks (tests, backfills, demos). */
  def batch(spark: SparkSession, n: Long, seed: Long = 42L,
      startEpochSec: Long = 1704103200L, intervalSec: Int = 2): DataFrame =
    tickColumns(spark.range(n).toDF(), seed, startEpochSec, intervalSec)

  /** Always-on streaming variant over the rate source (one tick per rate
    * row; `rowsPerSecond` controls throughput like PRODUCE_INTERVAL).
    */
  def stream(spark: SparkSession, rowsPerSecond: Int = 1, seed: Long = 42L,
      startEpochSec: Long = 1704103200L, intervalSec: Int = 2): DataFrame =
    tickColumns(
      spark.readStream.format("rate")
        .option("rowsPerSecond", rowsPerSecond).load()
        .select(col("value").as("id")),
      seed, startEpochSec, intervalSec)
}
