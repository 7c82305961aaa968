package graft.streaming

import graft.analytics.TextAnalytics
import graft.functions.TextFeatures.hash60
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming KMV maintenance — the CARDINALITY member of the streaming
  * sketch trio ([[StreamingCms]] answers point counts, [[TrendingTokens]]
  * answers top-k): each micro-batch lands its per-source k-minimum
  * hash values under `batch_id=N` (idempotent overwrite — the
  * CorpusIngest exactly-once contract), and the reader answers "how many
  * distinct shingles has source S produced so far" by re-sketching the
  * union of the per-batch minima — ≤ k rows per source per batch read,
  * NO archive scan, ever.
  *
  * Two laws make this exact, both pinned by `StreamingKmvSpec`:
  *  - MERGE: kmin over a union equals kmin over per-part kmins (each
  *    part keeps every candidate for the global k-minimum), so the
  *    streamed sketch is BIT-IDENTICAL to the batch `kmv_distinct`
  *    sketch over the same corpus — not an approximation of it.
  *  - DUPLICATE-INSENSITIVITY: KMV counts distinct values, so replayed
  *    batches and re-crawled documents cannot inflate the estimate —
  *    the streaming cardinality tier needs NO dedup stage in front of
  *    it, unlike every counting sketch.
  *
  * Scale: per batch the sketch is one partial-aggregable bounded
  * aggregate (≤ k longs of state per source per task — see
  * [[graft.functions.KMinDistinct]]); the store grows ≤ k·|sources|
  * rows per batch and compacts back to ≤ k·|sources| total by the same
  * re-sketch ([[compact]], the [[graft.Maintenance.compactBatchStore]]
  * crash protocol unchanged).
  */
object StreamingKmv {

  final case class KmvStores(minsPath: String)

  /** One micro-batch: shingle, hash, keep the per-source k minima, land
    * them as (source, h) rows under `batch_id=N` (idempotent overwrite).
    * Shingling is [[TextAnalytics.kmvShingles]] — the batch entry's own
    * definition, so streamed ≡ batch is definitional, not coincidental.
    */
  def processBatch(batch: DataFrame, id: Long, stores: KmvStores): Unit = {
    graft.GraftExtensions.register(batch.sparkSession)
    TextAnalytics.kmvShingles(batch)
      .select(col("source"), hash60(col("g")).as("h"))
      .groupBy("source")
      .agg(expr(s"kmin_distinct(h, ${TextAnalytics.KmvK})").as("mins"))
      .select(col("source"), explode(col("mins")).as("h"))
      .write.mode("overwrite").parquet(s"${stores.minsPath}/batch_id=$id")
  }

  /** The streaming wiring: document stream → per-batch minima append. */
  def run(docs: DataFrame, stores: KmvStores, checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime("30 seconds")): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        processBatch(batch, id, stores)
        ()
      }
      .start()

  /** Merged per-source sketch across every ingested batch — the KMV
    * merge law in one aggregate; ≤ k values per source out.
    */
  def mergedSketch(spark: SparkSession, stores: KmvStores): DataFrame = {
    graft.GraftExtensions.register(spark)
    spark.read.parquet(stores.minsPath)
      .groupBy("source")
      .agg(expr(s"kmin_distinct(h, ${TextAnalytics.KmvK})").as("mins"))
  }

  /** Store compaction: collapse every batch generation into ONE
    * `batch_id=-1` generation of ≤ k rows per source — the re-sketch IS
    * the reduction, so estimates after compaction are bit-identical
    * (spec-pinned); crash safety is compactBatchStore's plan/commit
    * protocol, unchanged.
    */
  def compact(spark: SparkSession, stores: KmvStores): Unit = {
    graft.GraftExtensions.register(spark)
    graft.Maintenance.compactBatchStore(spark, stores.minsPath,
      reduce = _.groupBy("source")
        .agg(expr(s"kmin_distinct(h, ${TextAnalytics.KmvK})").as("mins"))
        .select(col("source"), explode(col("mins")).as("h")))
  }

  /** Live cardinality estimates off the store: per source, the distinct
    * shingle count so far — exact (the minima ARE the distinct set) when
    * a source has produced under k distinct shingles, the (k−1)·2⁶⁰/m
    * estimator beyond. Column-compatible with the batch `kmv_distinct`
    * entry's sketch columns (kth_min, kmv_est).
    */
  def estimate(spark: SparkSession, stores: KmvStores): DataFrame = {
    val k = TextAnalytics.KmvK
    val merged = mergedSketch(spark, stores)
    val kth = element_at(col("mins"), size(col("mins")))
    val est = when(size(col("mins")) < k, size(col("mins")).cast("double"))
      .otherwise(lit((k - 1).toDouble) * lit(TextAnalytics.KmvSpace)
        / kth.cast("double"))
    merged.select(col("source"), kth.as("kth_min"),
        round(est, 4).as("kmv_est"))
      .orderBy("source")
  }
}
