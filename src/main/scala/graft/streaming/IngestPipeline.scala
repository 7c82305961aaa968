package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Streaming tick ingest with dead-letter-queue split — the reference's
  * consumer service re-expressed as one Structured Streaming query
  * (SURVEY.md §2.1 S5–S8, §3.1).
  *
  * Reference behavior reproduced:
  *  - JSON decode of the tick wire format; the two producer shapes
  *    (simulated `{symbol, price, volume, event_time}` —
  *    services/producer/producer.py:66-74 — and yfinance OHLCV —
  *    services/producer/producer_yfinance.py:100-109) parse under one
  *    permissive union schema, missing fields → null;
  *  - malformed JSON or a missing required field diverts the raw message to
  *    `failed_events` instead of crashing (consumer.py:132-139, the
  *    KeyError→DLQ path), with the source metadata and error reason
  *    (init.sql:30-39);
  *  - valid rows land append-only in the ticks table (consumer.py:28-31);
  *    the streaming checkpoint replaces the Kafka consumer-group offsets
  *    (at-least-once per-row insert → effectively-once idempotent batches,
  *    strictly stronger, SURVEY.md §2.7 ST5).
  *
  * Scale notes: the parse/split is stateless and stays in whole-stage
  * codegen; each micro-batch appends columnar parquet partitioned by the
  * Kafka partition key's natural distribution — no shuffle anywhere in the
  * hot path. On a real cluster the same code points at
  * `readStream.format("kafka")` instead of the test MemoryStream.
  */
object IngestPipeline {

  /** Permissive union of the two tick wire shapes (SURVEY.md §1.2). */
  val tickWireSchema: StructType = StructType(Seq(
    StructField("symbol", StringType),
    StructField("price", DecimalType(12, 4)),
    StructField("open", DecimalType(12, 4)),
    StructField("high", DecimalType(12, 4)),
    StructField("low", DecimalType(12, 4)),
    StructField("close", DecimalType(12, 4)),
    StructField("volume", LongType),
    StructField("event_time", TimestampType),
    StructField("source", StringType)))

  /** Parse raw messages (columns: `value` STRING plus optional
    * topic/partition/offset metadata) into one annotated frame; pure
    * transform usable in batch and streaming alike.
    */
  def parse(raw: DataFrame): DataFrame = {
    val withMeta = Seq("topic", "partition", "offset")
      .foldLeft(raw) { (df, c) =>
        if (df.columns.contains(c)) df else df.withColumn(c, lit(null).cast(
          if (c == "offset") LongType else if (c == "partition") IntegerType else StringType))
      }
    // from_json is PERMISSIVE: malformed JSON yields an all-null row (not a
    // null struct), so "every field null" is the malformed marker.
    withMeta
      .withColumn("tick", from_json(col("value"), tickWireSchema))
      .withColumn("error_message",
        when(col("tick").isNull
          || (col("tick.symbol").isNull && col("tick.price").isNull
            && col("tick.event_time").isNull), lit("malformed JSON"))
          .when(col("tick.symbol").isNull, lit("missing required field: symbol"))
          .when(col("tick.price").isNull, lit("missing required field: price"))
          .when(col("tick.event_time").isNull, lit("missing required field: event_time")))
  }

  /** Valid ticks in the `stock_ticks` shape (init.sql:1-8; volume may be
    * null — readers COALESCE, SURVEY.md §1.2).
    */
  def validTicks(parsed: DataFrame): DataFrame =
    parsed.filter(col("error_message").isNull)
      .select(
        col("tick.symbol").as("symbol"),
        col("tick.price").as("price"),
        col("tick.volume").as("volume"),
        col("tick.event_time").as("event_time"))

  /** DLQ rows in the `failed_events` shape (init.sql:30-39). */
  def failedEvents(parsed: DataFrame): DataFrame =
    parsed.filter(col("error_message").isNotNull)
      .select(
        lit("consumer").as("source"),
        col("topic"), col("partition"), col("offset"),
        col("value").as("raw_value"),
        col("error_message"))

  /** Streaming dedup of the valid tick stream: the reference's delivery is
    * at-least-once (auto-commit + per-row insert, consumer.py:114-134), so
    * replays duplicate ticks into stock_ticks. Spark's
    * dropDuplicatesWithinWatermark removes replays of the same
    * (symbol, event_time) tick for as long as the watermark allows state
    * retention — bounded state, exact within the replay horizon.
    */
  def dedupTicks(ticks: DataFrame, replayHorizon: String = "10 minutes"): DataFrame =
    ticks
      .withWatermark("event_time", replayHorizon)
      .dropDuplicatesWithinWatermark("symbol", "event_time")

  /** Wire the split into a running streaming query: one foreachBatch that
    * writes each micro-batch's valid ticks and DLQ rows under a
    * `batch_id=N` partition with overwrite semantics. A REPLAYED batch —
    * crash after the sink write but before the checkpoint commit, the
    * at-least-once window — overwrites its own partition instead of
    * appending duplicates, so the observable output is exactly-once
    * across kill-and-restart (ST5; strictly stronger than the
    * reference's at-least-once per-row insert). Readers of the parent
    * path see `batch_id` as an ordinary partition column.
    *
    * Layout-migration note: sinks written by the pre-`batch_id` layout
    * (part files at the path root) must be moved into a `batch_id=-1/`
    * subdir once before pointing this version at them — parquet partition
    * discovery rejects a mix of root-level files and partition dirs.
    */
  def run(
      raw: DataFrame,
      ticksPath: String,
      dlqPath: String,
      checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime("30 seconds")): StreamingQuery =
    raw.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val parsed = parse(batch).persist()
        try {
          validTicks(parsed).write.mode("overwrite").parquet(s"$ticksPath/batch_id=$id")
          // written unconditionally: an empty-DLQ batch costs one empty
          // parquet file, vs. the isEmpty probe costing a whole extra job
          // per micro-batch on the hot path
          failedEvents(parsed).write.mode("overwrite").parquet(s"$dlqPath/batch_id=$id")
        } finally parsed.unpersist()
        ()
      }
      .start()
}
