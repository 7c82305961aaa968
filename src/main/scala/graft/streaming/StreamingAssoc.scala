package graft.streaming

import graft.analytics.TextAnalytics
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming association-rule maintenance — the co-occurrence member of
  * the streaming sketch family ([[StreamingCms]] point counts,
  * [[TrendingTokens]] top-k, [[StreamingKmv]] cardinality): every
  * measure in the batch `assoc_rules` entry is a SUM over documents
  * (pair supports, in-vocabulary document frequencies, the basket
  * total), so each micro-batch lands three additive partials under
  * `batch_id=N` (idempotent overwrite — the CorpusIngest exactly-once
  * contract) and the reader answers with batch-exact rules by summing
  * the partials into [[TextAnalytics.assocMeasures]] — the SAME final
  * definition the oracle-checked batch entry runs, so streamed ≡ batch
  * is definitional (spec-pinned across batch splits + replay +
  * compaction).
  *
  * The item domain is FROZEN at [[freeze]] time (the top-V vocabulary
  * of the calibration corpus, persisted beside the partials): a-priori
  * needs one global vocabulary, and re-deriving it per batch would make
  * supports non-additive. Production refreshes the vocabulary at
  * calibration cadence and rebuilds the store from the archive — the
  * same retrain trade every frozen-model streaming tier here documents
  * ([[VectorIndexIngest]]'s centroids, [[TrendingTokens]]' thresholds).
  *
  * Contract: documents arrive WHOLE (one batch carries a doc's full
  * text) — per-doc pair sets cannot straddle batches, the same
  * doc-atomic delivery every per-document streaming stage in this repo
  * assumes. Scale: per batch the pair partial is ≤ V(V−1)/2 cells, df ≤
  * V rows, n one row — constant store growth per batch regardless of
  * batch size; [[compact]] collapses history to one generation of the
  * same bounded size.
  */
object StreamingAssoc {

  final case class AssocStores(base: String) {
    def vocabPath: String = s"$base/vocab"
    def pairsPath: String = s"$base/pairs"
    def dfPath: String    = s"$base/df"
    def nPath: String     = s"$base/n"
  }

  /** Freeze the item domain from a calibration corpus (typically the
    * archive at store-build time). Must run once before any batch.
    */
  def freeze(calibrationDocs: DataFrame, stores: AssocStores): Unit =
    TextAnalytics.assocVocab(calibrationDocs)
      .coalesce(1).write.mode("overwrite").parquet(stores.vocabPath)

  private def vocab(spark: SparkSession, stores: AssocStores): DataFrame =
    spark.read.parquet(stores.vocabPath)

  /** One micro-batch: the three additive partials under `batch_id=N`. */
  def processBatch(batch: DataFrame, id: Long, stores: AssocStores): Unit = {
    val spark = batch.sparkSession
    val v = vocab(spark, stores)
    TextAnalytics.assocPairCounts(batch, v)
      .write.mode("overwrite").parquet(s"${stores.pairsPath}/batch_id=$id")
    TextAnalytics.assocDf(batch, v)
      .write.mode("overwrite").parquet(s"${stores.dfPath}/batch_id=$id")
    batch.agg(count(lit(1)).as("n_docs"))
      .write.mode("overwrite").parquet(s"${stores.nPath}/batch_id=$id")
  }

  /** The streaming wiring: document stream → per-batch partials. */
  def run(docs: DataFrame, stores: AssocStores, checkpoint: String,
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

  /** Live rules off the store: sum each additive partial across every
    * ingested batch, then the batch entry's own measure definition.
    */
  def rules(spark: SparkSession, stores: AssocStores): DataFrame = {
    val pairs = spark.read.parquet(stores.pairsPath)
      .groupBy("token_a", "token_b").agg(sum(col("support")).as("support"))
    val df = spark.read.parquet(stores.dfPath)
      .groupBy("token").agg(sum(col("df")).as("df"))
    val n = spark.read.parquet(stores.nPath)
      .agg(sum(col("n_docs")).as("n_docs"))
    TextAnalytics.assocMeasures(pairs, df, n)
  }

  /** Collapse history: each store reduces to ONE summed generation —
    * reads are the same sums, so rules after compaction are
    * bit-identical (spec-pinned).
    */
  def compact(spark: SparkSession, stores: AssocStores): Unit = {
    graft.Maintenance.compactBatchStore(spark, stores.pairsPath,
      reduce = _.groupBy("token_a", "token_b")
        .agg(sum(col("support")).as("support")))
    graft.Maintenance.compactBatchStore(spark, stores.dfPath,
      reduce = _.groupBy("token").agg(sum(col("df")).as("df")))
    graft.Maintenance.compactBatchStore(spark, stores.nPath,
      reduce = _.agg(sum(col("n_docs")).as("n_docs")))
  }
}
