package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming distribution-drift gate: every micro-batch's value histogram
  * is compared against a STATIC baseline histogram, and per-bin
  * total-variation deltas (plus a batch-level flag) land in an alert
  * store — the data-quality tripwire a training pipeline runs on its
  * ingest edge, the streaming twin of the batch `drift_report` query.
  *
  * Why TV terms and not PSI: same reasoning as the batch query — per-bin
  * |Δshare| is plain IEEE ratio arithmetic (deterministic, testable),
  * while a summed PSI statistic folds doubles in engine/partition-
  * dependent order and drags ln() into any exactness contract.
  *
  * Scale: the baseline histogram is bins-sized (broadcast); each batch
  * contributes one narrow projection + a bins-keyed aggregate. Alert rows
  * are written under `batch_id=N` with per-batch overwrite — the same
  * idempotent exactly-once-observable sink contract as
  * [[IngestPipeline.run]] (a replayed batch rewrites its own partition).
  */
object DriftMonitor {

  /** Fixed-width histogram (bin, cnt) of `valueCol`, clamped to
    * `bins` buckets. Null values are dropped (they are a schema-quality
    * concern, not a drift concern).
    */
  def hist(df: DataFrame, valueCol: String, width: Double, bins: Int): DataFrame =
    df.filter(col(valueCol).isNotNull)
      .select(least(floor(col(valueCol) / width), lit(bins - 1)).cast("int").as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("cnt"))

  /** Per-bin drift of `batch` against a baseline histogram (bin, cnt):
    * (bin, base_cnt, batch_cnt, base_share, batch_share, tv_term).
    * Bins absent from one side count 0 there (full outer on bin). An
    * EMPTY batch returns the baseline bins with batch_share 0 — every
    * bin "drifted", which is the correct alarm for a silent source.
    */
  def batchDeltas(batch: DataFrame, baseline: DataFrame,
      valueCol: String, width: Double, bins: Int): DataFrame = {
    val b = hist(batch, valueCol, width, bins)
      .select(col("bin"), col("cnt").as("batch_cnt"))
    val merged = baseline.select(col("bin"), col("cnt").as("base_cnt"))
      .join(b, Seq("bin"), "full_outer")
      .select(col("bin"),
        coalesce(col("base_cnt"), lit(0L)).as("base_cnt"),
        coalesce(col("batch_cnt"), lit(0L)).as("batch_cnt"))
    val tot = merged.agg(sum(col("base_cnt")).as("base_tot"),
      sum(col("batch_cnt")).as("batch_tot"))
    val baseShare  = when(col("base_tot") > 0, col("base_cnt") / col("base_tot"))
      .otherwise(lit(0.0))
    val batchShare = when(col("batch_tot") > 0, col("batch_cnt") / col("batch_tot"))
      .otherwise(lit(0.0))
    merged.crossJoin(broadcast(tot))
      .select(col("bin"), col("base_cnt"), col("batch_cnt"),
        baseShare.as("base_share"), batchShare.as("batch_share"),
        abs(batchShare - baseShare).as("tv_term"))
  }

  /** Wire the gate: per micro-batch, compute deltas vs the (small,
    * precomputed) baseline, flag bins whose tv_term exceeds `threshold`,
    * and overwrite the batch's own alert partition. Alert rows carry the
    * full per-bin delta so the flag is auditable after the fact.
    */
  def run(stream: DataFrame, baseline: DataFrame, alertsPath: String,
      checkpoint: String, valueCol: String, width: Double, bins: Int,
      threshold: Double,
      trigger: Trigger = Trigger.ProcessingTime("30 seconds")): StreamingQuery = {
    val base = baseline.persist()
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        batchDeltas(batch, base, valueCol, width, bins)
          .withColumn("flagged", col("tv_term") > threshold)
          .write.mode("overwrite").parquet(s"$alertsPath/batch_id=$id")
        ()
      }
      .start()
  }
}
