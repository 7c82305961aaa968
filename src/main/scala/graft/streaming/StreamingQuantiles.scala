package graft.streaming

import graft.analytics.TextAnalytics
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming quantile maintenance — the DISTRIBUTION member completing
  * the streaming sketch quartet ([[StreamingCms]] point counts,
  * [[TrendingTokens]] top-k, [[StreamingKmv]] distinct cardinality):
  * each micro-batch lands its per-language bottom-k sample rows under
  * `batch_id=N` (idempotent overwrite — the CorpusIngest exactly-once
  * contract), and the reader answers "what does the length distribution
  * of language L look like so far" from ≤ k rows per language per
  * batch — NO archive scan, ever.
  *
  * Laws (pinned by `StreamingQuantilesSpec`):
  *  - MERGE: the bottom-k of a union is the re-trimmed union of
  *    per-part bottom-ks (each part keeps every candidate for the
  *    global bottom-k), so the streamed sample — and therefore every
  *    rank-statistic estimate read from it — is BIT-IDENTICAL to the
  *    batch `len_quantiles` sample over the same corpus.
  *  - REPLAY is a no-op (idempotent batch overwrite), and a RE-CRAWLED
  *    document contributes identical (lang, doc_id, n_chars) rows that
  *    the reader's distinct() collapses — the content-derived hash
  *    order makes the sample duplicate-insensitive at the row level.
  *    (A re-crawl that CHANGES a document's length is an update, which
  *    belongs to a keyed upsert tier, not a sketch — same contract as
  *    the KMV scaladoc.)
  *
  * Scale: per batch one bounded partial aggregate (≤ k ids/language/task
  * through `topk_by_score`); the store grows ≤ k·|languages| rows per
  * batch and compacts back to ≤ k·|languages| total by the same re-trim.
  */
object StreamingQuantiles {

  final case class QuantStores(samplePath: String)

  /** One micro-batch of documents: keep the per-language bottom-k
    * sample rows, land them under `batch_id=N`. The sample builder is
    * [[TextAnalytics.lenSampleOn]] — the batch entry's own definition,
    * so streamed ≡ batch is definitional.
    */
  def processBatch(batch: DataFrame, id: Long, stores: QuantStores): Unit =
    TextAnalytics.lenSampleOn(
        batch.select(col("lang"), col("doc_id"), col("n_chars")))
      .select(col("lang"), col("doc_id"), col("n_chars"))
      .write.mode("overwrite").parquet(s"${stores.samplePath}/batch_id=$id")

  /** The streaming wiring: document stream → per-batch sample append. */
  def run(docs: DataFrame, stores: QuantStores, checkpoint: String,
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

  /** The merged per-language sample across every ingested batch — the
    * union-retrim in one pass; ≤ k rows per language out.
    */
  def mergedSample(spark: SparkSession, stores: QuantStores): DataFrame =
    TextAnalytics.lenSampleOn(
      spark.read.parquet(stores.samplePath)
        .select("lang", "doc_id", "n_chars").distinct())

  /** Live per-language quantile estimates off the store — column-
    * compatible with the batch `len_quantiles` entry's (lang, pct,
    * est_chars) estimate columns.
    */
  def estimate(spark: SparkSession, stores: QuantStores): DataFrame =
    TextAnalytics.lenRankStat(mergedSample(spark, stores), "est_chars")
      .orderBy("lang", "pct")

  /** Store compaction: collapse every batch generation into ONE
    * `batch_id=-1` generation of ≤ k rows per language — the re-trim IS
    * the reduction, so estimates are bit-identical after (spec-pinned).
    */
  def compact(spark: SparkSession, stores: QuantStores): Unit =
    graft.Maintenance.compactBatchStore(spark, stores.samplePath,
      reduce = df => TextAnalytics.lenSampleOn(
        df.select("lang", "doc_id", "n_chars").distinct()))
}
