package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Kafka wiring for the tick stream — the reference's producer/consumer
  * transport (S4/S5: topic `stock.ticks.v1`, key = symbol for per-symbol
  * ordering, consumer from earliest with offset tracking; SURVEY.md §2.1).
  * Requires the spark-sql-kafka connector on the deployment classpath (not
  * shipped in this container, so these builders are compile-checked here
  * and the pure encode/decode transforms are what the tests cover —
  * [[IngestPipeline.parse]] consumes either this source or any other
  * `value`-bearing frame unchanged).
  */
object KafkaIO {

  /** Ticks → Kafka wire shape: key = symbol (keyed partitioning preserves
    * per-symbol order across 3 partitions, producer.py:86), value = JSON
    * of the row (F15).
    */
  def encodeTicks(ticks: DataFrame): DataFrame =
    ticks.select(
      col("symbol").cast("string").as("key"),
      to_json(struct(col("symbol"), col("price"), col("volume"),
        date_format(col("event_time"), "yyyy-MM-dd'T'HH:mm:ss.SSSXXX")
          .as("event_time"))).as("value"))

  /** Kafka records → the raw frame [[IngestPipeline.parse]] expects
    * (`value` string + source metadata for the DLQ columns).
    */
  def decodeRecords(records: DataFrame): DataFrame =
    records.select(
      col("value").cast("string").as("value"),
      col("topic"), col("partition").cast("int").as("partition"),
      col("offset"))

  /** Streaming source: subscribe from earliest; the checkpoint replaces
    * the consumer group's committed offsets (at-least-once poll loop →
    * exactly-once to idempotent sinks, SURVEY.md ST5).
    */
  def readTickStream(spark: org.apache.spark.sql.SparkSession,
      bootstrapServers: String, topic: String,
      startingOffsets: String = "earliest"): DataFrame =
    decodeRecords(
      spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrapServers)
        .option("subscribe", topic)
        .option("startingOffsets", startingOffsets)
        .load())

  /** Streaming sink: publish the keyed JSON tick stream. */
  def writeTickStream(ticks: DataFrame, bootstrapServers: String,
      topic: String, checkpoint: String): StreamingQuery =
    encodeTicks(ticks).writeStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("topic", topic)
      .option("checkpointLocation", checkpoint)
      .start()
}
