package graft.streaming

import graft.analytics.TextAnalytics
import graft.functions.TextFeatures.{hash60, tokens}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming Count-Min maintenance — the point-query sibling of
  * [[TrendingTokens]]' heavy-hitter path, exploiting the property the
  * batch `cms_sketch` spec pins: CMS counter matrices MERGE cell-wise.
  * Each micro-batch writes its own d·w cell matrix under `batch_id=N`
  * (per-batch overwrite — the CorpusIngest exactly-once contract), and
  * the reader answers "how often has token X occurred across the whole
  * stream so far" from the cell-wise SUM of the per-batch matrices —
  * an O(d·w·batches) read with NO archive scan, ever.
  *
  * Contrast with [[TrendingTokens.mergeDashboard]]: that path answers
  * the top-k question EXACTLY and pays one archive pass per refresh;
  * this path answers arbitrary point queries instantly with the CMS
  * overestimate bound (≤ ε·N, ε = e/w, w.h.p.). Production runs both —
  * the sketch serves dashboards between exact refreshes.
  *
  * Scale: per batch, the cell matrix is the one partial-aggregable
  * d·w-bounded aggregate (constant shuffle regardless of batch size);
  * the store grows d·w rows per batch, compactable by the same
  * cell-wise sum whenever batch count matters
  * ([[graft.Maintenance.compactBatchStore]]'s trade applies).
  */
object StreamingCms {

  final case class CmsStores(cellsPath: String)

  /** One micro-batch: tokenize, build the d·w cell matrix, land it
    * under `batch_id=N` (idempotent overwrite).
    */
  def processBatch(batch: DataFrame, id: Long, stores: CmsStores): Unit =
    // tokenization must match the batch cms_sketch EXACTLY (split on
    // single space, empty tokens counted) — an extra empty-token filter
    // here would diverge from the oracle-checked cells on any corpus
    // with consecutive/leading/trailing spaces
    TextAnalytics.cmsCells(
      batch.select(explode(tokens(col("text"))).as("token")))
      .write.mode("overwrite").parquet(s"${stores.cellsPath}/batch_id=$id")

  /** The streaming wiring: document stream → per-batch cell append. */
  def run(docs: DataFrame, stores: CmsStores, checkpoint: String,
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

  /** Merged cell matrix across every ingested batch — cell-wise sum,
    * ≤ d·w rows out.
    */
  def mergedCells(spark: SparkSession, stores: CmsStores): DataFrame =
    spark.read.parquet(stores.cellsPath)
      .groupBy(col("j"), col("h"))
      .agg(sum(col("c")).as("c"))

  /** Cell-wise store compaction: collapse every batch generation into
    * ONE `batch_id=-1` generation of ≤ d·w summed cells — the row-count
    * answer to the store growing d·w rows per batch forever. Because
    * counters are mergeable partials and every reader goes through the
    * same cell-wise sum ([[mergedCells]]), estimates after compaction
    * are bit-identical to before ([[StreamingCmsSpec]] pins it); new
    * batches keep landing beside the compacted generation and merge the
    * same way. Crash safety is [[graft.Maintenance.compactBatchStore]]'s
    * plan/commit protocol, unchanged — the reduction is deterministic
    * and fully materialized before any delete is planned.
    */
  def compact(spark: SparkSession, stores: CmsStores): Unit =
    graft.Maintenance.compactBatchStore(spark, stores.cellsPath,
      reduce = _.groupBy(col("j"), col("h")).agg(sum(col("c")).as("c")))

  /** Point-query estimates for `queryTokens` against the live store:
    * est(token) = min over hash rows of the merged counter — never an
    * undercount, overestimate bounded by the (d, w) sizing. The query
    * side is a literal local relation; the merged matrix is ≤ d·w rows,
    * so the whole read is dashboard-sized.
    */
  def pointEstimate(spark: SparkSession, stores: CmsStores,
      queryTokens: Seq[String]): DataFrame = {
    import spark.implicits._
    val cells = mergedCells(spark, stores)
    queryTokens.toDF("token")
      .withColumn("j", explode(expr(s"sequence(0, ${TextAnalytics.CmsD - 1})")))
      // pmod ≡ the oracle's `%` ONLY because hash60 is non-negative by
      // construction (a 60-bit value) — the house caveat every
      // hash-keyed op carries; a signed hash here would silently probe
      // different cells than the batch sketch
      .withColumn("h",
        pmod(hash60(concat(col("j").cast("string"), lit(":"), col("token"))), lit(TextAnalytics.CmsW)))
      .join(cells, Seq("j", "h"), "left")
      .groupBy(col("token"))
      // a probed cell absent from the store means NO token hashed there:
      // its counter is 0, so the per-cell coalesce keeps the min sound
      // for never-ingested (all cells missing) AND partially-missing
      // tokens alike
      .agg(min(coalesce(col("c"), lit(0L))).as("cms_est"))
      .orderBy(col("token"))
  }
}
