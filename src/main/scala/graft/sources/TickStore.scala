package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Physical layout for the durable tick table — the Spark analog of the
  * reference's covering index `(symbol, event_time DESC)` on stock_ticks
  * (infra/postgres/init.sql:10-11; SURVEY.md §4 "access-path design").
  *
  * Layout choices and why they hold at 100 TB:
  *  - **date partitions** (`tick_date=…`): every reference query is
  *    time-bounded (latest-N, sliding windows, incremental aggregation
  *    `[wm, now)`), so partition pruning drops cold days before any IO;
  *  - **repartition by (date, symbol)** bounds writer fan-out: each task
  *    writes one file per date instead of every task appending to every
  *    partition (the small-files failure mode);
  *  - **sortWithinPartitions(symbol, event_time)** gives parquet row-group
  *    min/max stats the same selectivity the reference's B-tree provides:
  *    a `symbol = X AND event_time >= t` scan skips row groups on both
  *    columns.
  */
object TickStore {

  def write(ticks: DataFrame, path: String): Unit =
    ticks
      .withColumn("tick_date", to_date(col("event_time")))
      .repartition(col("tick_date"), col("symbol"))
      .sortWithinPartitions(col("symbol"), col("event_time"))
      .write
      .mode(SaveMode.Overwrite)
      .partitionBy("tick_date")
      .parquet(path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Bucketed variant: hash-bucket the table by symbol (and sort buckets
    * by (symbol, event_time)) into the session catalog. Joins and
    * aggregations keyed on symbol then read co-located buckets and skip
    * the exchange entirely — the cluster-scale analog of the reference's
    * symbol-leading covering index, and the pre-shuffle investment that
    * pays off when many downstream queries share the key.
    */
  def writeBucketed(ticks: DataFrame, tableName: String, buckets: Int): Unit =
    ticks.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, "symbol")
      .sortBy("symbol", "event_time")
      .format("parquet")
      .saveAsTable(tableName)
}
