package graft.streaming

import graft.analytics.RetrievalAnalytics
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming LEXICAL-index maintenance — the postings twin of
  * [[VectorIndexIngest]], and the piece that keeps the
  * [[graft.sources.HybridStore]] serving tier FRESH between (rare,
  * offline) base-index rebuilds. Production search works exactly this
  * way: a compacted base index rebuilt at refresh cadence + a small
  * delta tier the crawler appends to, with queries probing both.
  *
  * Per batch N of documents:
  *  1. TF: (doc_id, term, tc) via the SAME tokenization as the batch
  *     `bm25_topk`/`inverted_index` entries
  *     ([[RetrievalAnalytics.termFrequencies]] — one definition, so the
  *     merged delta store equals the batch tf frame bit-for-bit).
  *  2. APPEND: postings land under `batch_id=N` with per-batch
  *     OVERWRITE (the [[CorpusIngest]]/[[IngestPipeline]] idempotence
  *     contract: a replayed batch rewrites its own partition),
  *     sub-partitioned by `term_bucket = pmod(xxhash64(term), B)` so a
  *     query-term probe is PARTITION-PRUNED at the file listing — the
  *     delta-tier analog of the base store's term bucketing. (Hash
  *     partitioning, not raw `term`: a partition column of unbounded
  *     cardinality would explode the directory count; B=64 buckets
  *     bound it while still cutting a probe's listing 64×.)
  *  3. HEALTH: one row per batch (docs, postings, distinct terms) — the
  *     freshness/size accounting the refresh scheduler reads; when the
  *     delta tier's size approaches the base's rebuild cost, rebuild
  *     and clear (the same trade [[VectorIndexIngest]]'s out-of-coverage
  *     counter prices for centroids).
  *
  * Read paths:
  *  - [[mergedTf]]: the delta store as one (doc_id, term, tc) frame —
  *    equal to the batch tf of every ingested doc (spec law).
  *  - [[bm25Topk]]: the batch `bm25_topk` CONTRACT served off the live
  *    store ([[RetrievalAnalytics.bm25OverTf]] suffix shared verbatim —
  *    streamed ≡ batch bit-for-bit, the StreamingCms equality pattern).
  *  - [[probeTerms]]: posting lists for a bounded query-term set, the
  *    partition-pruned point read a serving stack issues per query
  *    (bucket ids computed driver-side from the literal terms — the
  *    static-filter control-plane pattern, ≤ |terms| values).
  *
  * Scale (100 TB): per-batch cost is one tokenize + one (doc, term)
  * partial-aggregated count + one narrow write — no old batch is ever
  * rescanned or rewritten; the delta store grows by the batch's own
  * postings only and compacts by [[graft.Maintenance.compactBatchStore]]
  * (docs are immutable under the corpus contract, so file-level
  * consolidation preserves rows; a recrawl-update regime would dedupe
  * by latest crawl BEFORE ingest, which is the upstream contract).
  * Scoring off the delta tier recomputes df/dl/stats per query batch —
  * correct-by-construction freshness; the base tier amortizes them into
  * baked impact scores at rebuild, which is exactly the split
  * `hybrid_rrf_served` serves.
  */
object PostingsIngest {

  /** Term-bucket fan-out of the delta store's sub-partitioning. */
  private[graft] val Buckets = 64

  final case class Stores(postingsPath: String, healthPath: String)

  private def bucketOf = pmod(xxhash64(col("term")), lit(Buckets.toLong))

  /** One micro-batch: tf rows + health row, idempotent per-batch paths. */
  def processBatch(batch: DataFrame, id: Long, stores: Stores): Unit = {
    val tf = RetrievalAnalytics.termFrequencies(batch)
      .withColumn("term_bucket", bucketOf)
      .localCheckpoint(eager = false) // consumers: postings write + health
    tf.write.mode("overwrite").partitionBy("term_bucket")
      .parquet(s"${stores.postingsPath}/batch_id=$id")
    tf.agg(
        countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_postings"),
        countDistinct(col("term")).as("n_terms"))
      .write.mode("overwrite").parquet(s"${stores.healthPath}/batch_id=$id")
  }

  /** The streaming wiring: document stream → per-batch postings. */
  def run(docs: DataFrame, stores: Stores, checkpoint: String,
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

  /** File-level store compaction: every batch generation collapses to
    * one `batch_id=-1` generation under the SAME `term_bucket=` leaf
    * layout (so partition-pruned probes keep working), rows preserved
    * verbatim — docs are immutable under the corpus contract. Crash
    * safety is [[graft.Maintenance.compactBatchStore]]'s plan/commit
    * protocol.
    */
  def compact(spark: SparkSession, stores: Stores): Unit =
    graft.Maintenance.compactBatchStore(spark, stores.postingsPath,
      subPartitions = Seq("term_bucket"))

  /** Every ingested posting as one (doc_id, term, tc) frame. */
  def mergedTf(spark: SparkSession, stores: Stores): DataFrame =
    spark.read.parquet(stores.postingsPath)
      .select("doc_id", "term", "tc")

  /** The batch `bm25_topk` contract served off the live delta store. */
  def bm25Topk(spark: SparkSession, stores: Stores): DataFrame =
    RetrievalAnalytics.bm25OverTf(mergedTf(spark, stores))

  /** Posting lists for a bounded literal query-term set: the bucket ids
    * derive from the terms themselves (driver-side, ≤ |terms| values),
    * so the scan lists only the matching `term_bucket=` directories of
    * each batch — a static partition filter, no full delta scan.
    */
  def probeTerms(spark: SparkSession, stores: Stores,
      terms: Seq[String]): DataFrame = {
    // the bucket list is computed WITH the engine (a |terms|-row local
    // relation, one collect — the bounded control-plane read of the
    // VectorIndexIngest pattern) rather than replicating xxhash64's
    // seed/encoding driver-side; ≤ |terms| values by construction
    import spark.implicits._
    val ids = terms.toDF("term").select(bucketOf.as("b"))
      .distinct().as[Long].collect().toSeq
    spark.read.parquet(stores.postingsPath)
      .filter(col("term_bucket").isin(ids: _*) && col("term").isin(terms: _*))
      .select("doc_id", "term", "tc")
  }
}
