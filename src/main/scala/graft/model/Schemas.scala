package graft.model

import org.apache.spark.sql.types._

import java.sql.Timestamp

/** The engine's data model (SURVEY.md §1, reference infra/postgres/init.sql)
  * as case classes + explicit StructTypes. Schemas are fixed and declared —
  * never inferred — matching the reference's DDL discipline.
  */

/** stock_ticks row (init.sql:1-8); volume nullable by contract. */
final case class Tick(
    symbol: String,
    price: java.math.BigDecimal,
    volume: java.lang.Long,
    event_time: Timestamp)

/** stock_bars_1m row (init.sql:13-25), unique on (symbol, bucket_start). */
final case class Bar1m(
    symbol: String,
    bucket_start: Timestamp,
    open: java.math.BigDecimal,
    high: java.math.BigDecimal,
    low: java.math.BigDecimal,
    close: java.math.BigDecimal,
    volume_sum: Long,
    tick_count: Long)

/** failed_events DLQ row (init.sql:30-39). */
final case class FailedEvent(
    source: String,
    topic: String,
    partition: java.lang.Integer,
    offset: java.lang.Long,
    raw_value: String,
    error_message: String)

/** etl_runs watermark/audit row (init.sql:41-48). */
final case class EtlRun(
    completed_to: Timestamp,
    rows_upserted: Long,
    completed_at: Timestamp)

object Schemas {

  val tick: StructType = StructType(Seq(
    StructField("symbol", StringType, nullable = false),
    StructField("price", DecimalType(12, 4), nullable = false),
    StructField("volume", LongType, nullable = true),
    StructField("event_time", TimestampType, nullable = false)))

  val bar1m: StructType = StructType(Seq(
    StructField("symbol", StringType, nullable = false),
    StructField("bucket_start", TimestampType, nullable = false),
    StructField("open", DecimalType(12, 4), nullable = false),
    StructField("high", DecimalType(12, 4), nullable = false),
    StructField("low", DecimalType(12, 4), nullable = false),
    StructField("close", DecimalType(12, 4), nullable = false),
    StructField("volume_sum", LongType, nullable = false),
    StructField("tick_count", LongType, nullable = false)))

  val failedEvent: StructType = StructType(Seq(
    StructField("source", StringType, nullable = false),
    StructField("topic", StringType, nullable = true),
    StructField("partition", IntegerType, nullable = true),
    StructField("offset", LongType, nullable = true),
    StructField("raw_value", StringType, nullable = true),
    StructField("error_message", StringType, nullable = false)))

  val etlRun: StructType = StructType(Seq(
    StructField("completed_to", TimestampType, nullable = false),
    StructField("rows_upserted", LongType, nullable = false),
    StructField("completed_at", TimestampType, nullable = false)))
}
