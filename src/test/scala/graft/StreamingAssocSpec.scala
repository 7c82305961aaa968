package graft

import graft.analytics.TextAnalytics
import graft.streaming.StreamingAssoc
import graft.streaming.StreamingAssoc.AssocStores
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact laws of the streamed association-rule tier: after any batch
  * split the summed partials reproduce the batch entry bit-for-bit,
  * replay is a no-op, and compaction preserves the rules.
  */
class StreamingAssocSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def freshStores(): AssocStores =
    AssocStores(java.nio.file.Files.createTempDirectory("assoc_store").toString)

  private def norm(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("streamed over three corpus batches equals the batch entry bit-for-bit") {
    val docs = Tables.documents(spark, sf)
    val stores = freshStores()
    StreamingAssoc.freeze(docs, stores)
    // doc-atomic split into three batches by doc_id band
    val n = docs.agg(max(col("doc_id"))).as[Long].collect()(0)
    val bands = Seq(
      docs.filter(col("doc_id") <= n / 3),
      docs.filter(col("doc_id") > n / 3 && col("doc_id") <= 2 * n / 3),
      docs.filter(col("doc_id") > 2 * n / 3))
    bands.zipWithIndex.foreach { case (b, i) =>
      StreamingAssoc.processBatch(b, i.toLong, stores)
    }
    val expected = norm(TextAnalytics.assocRulesOn(docs))
    assert(norm(StreamingAssoc.rules(spark, stores)) == expected)
  }

  test("replaying a batch is a no-op") {
    val docs = Tables.documents(spark, sf)
    val stores = freshStores()
    StreamingAssoc.freeze(docs, stores)
    StreamingAssoc.processBatch(docs.filter(col("doc_id") % 2 === 0), 0L, stores)
    StreamingAssoc.processBatch(docs.filter(col("doc_id") % 2 =!= 0), 1L, stores)
    val before = norm(StreamingAssoc.rules(spark, stores))
    StreamingAssoc.processBatch(docs.filter(col("doc_id") % 2 =!= 0), 1L, stores)
    assert(norm(StreamingAssoc.rules(spark, stores)) == before)
  }

  test("compaction preserves the rules and later batches still merge exactly") {
    val docs = Tables.documents(spark, sf)
    val stores = freshStores()
    StreamingAssoc.freeze(docs, stores)
    val b0 = docs.filter(col("doc_id") % 3 === 0)
    val b1 = docs.filter(col("doc_id") % 3 === 1)
    val b2 = docs.filter(col("doc_id") % 3 === 2)
    StreamingAssoc.processBatch(b0, 0L, stores)
    StreamingAssoc.processBatch(b1, 1L, stores)
    val before = norm(StreamingAssoc.rules(spark, stores))
    StreamingAssoc.compact(spark, stores)
    assert(norm(StreamingAssoc.rules(spark, stores)) == before)
    StreamingAssoc.processBatch(b2, 2L, stores)
    assert(norm(StreamingAssoc.rules(spark, stores)) ==
      norm(TextAnalytics.assocRulesOn(docs)))
  }
}
