package graft

import graft.analytics.TextAnalytics
import graft.streaming.StreamingQuantiles
import graft.streaming.StreamingQuantiles.QuantStores
import org.apache.spark.sql.functions._

/** Laws for the streamed quantile sample (the distribution member of
  * the streaming sketch quartet).
  */
class StreamingQuantilesSpec extends SparkSpec {

  private def stores() = QuantStores(
    java.nio.file.Files.createTempDirectory("quant_store").toString + "/sample")

  private def est(df: org.apache.spark.sql.DataFrame): Seq[(String, Int, Long)] =
    df.collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSeq

  test("streamed ≡ batch for any doc-atomic split; replay + re-crawl no-ops; compaction identity") {
    val s = stores()
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
      .select(col("lang"), col("doc_id"), col("n_chars")).localCheckpoint()
    // three arbitrary batches (doc_id mod 3)
    (0 to 2).foreach(r =>
      StreamingQuantiles.processBatch(docs.filter(col("doc_id") % 3 === r), r.toLong, s))
    val batchEst = est(
      TextAnalytics.lenRankStat(TextAnalytics.lenSampleOn(docs), "est_chars")
        .orderBy("lang", "pct"))
    val streamed = est(StreamingQuantiles.estimate(spark, s))
    assert(batchEst.nonEmpty && streamed == batchEst)
    // replay batch 1 — idempotent overwrite, nothing changes
    StreamingQuantiles.processBatch(docs.filter(col("doc_id") % 3 === 1), 1L, s)
    assert(est(StreamingQuantiles.estimate(spark, s)) == batchEst)
    // re-crawl: batch 3 re-delivers batch 0's documents verbatim — the
    // reader's distinct() absorbs them, estimates unchanged
    StreamingQuantiles.processBatch(docs.filter(col("doc_id") % 3 === 0), 3L, s)
    assert(est(StreamingQuantiles.estimate(spark, s)) == batchEst)
    // compaction identity
    StreamingQuantiles.compact(spark, s)
    assert(est(StreamingQuantiles.estimate(spark, s)) == batchEst)
    // the merged sample is genuinely bounded: ≤ k rows per language
    val sizes = StreamingQuantiles.mergedSample(spark, s)
      .groupBy("lang").count().collect().map(_.getLong(1))
    assert(sizes.forall(_ <= 64))
  }
}
