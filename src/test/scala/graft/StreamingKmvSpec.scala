package graft

import graft.streaming.StreamingKmv
import graft.streaming.StreamingKmv.KmvStores
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming KMV laws: per-batch minima re-sketch to BIT-IDENTICALLY the
  * batch `kmv_distinct` sketch (merge law), replayed batches and
  * re-crawled documents cannot inflate the estimate
  * (duplicate-insensitivity), and compaction preserves estimates while
  * collapsing the store.
  */
class StreamingKmvSpec extends SparkSpec {

  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def freshStores(): KmvStores =
    KmvStores(java.nio.file.Files.createTempDirectory("kmv_stream").toString + "/mins")

  private def batchSketch() =
    graft.analytics.TextAnalytics.kmvDistinct(spark, dir)
      .select("source", "kth_min", "kmv_est")
      .as[(String, Long, Double)].collect().sorted.toSeq

  test("streamed sketch equals the batch kmv_distinct bit-for-bit; replay and re-crawl are no-ops") {
    val st = freshStores()
    val docs = Tables.documents(spark, dir).select("doc_id", "text", "source")
    StreamingKmv.processBatch(docs.filter(col("doc_id") % 2 === 0), 0L, st)
    StreamingKmv.processBatch(docs.filter(col("doc_id") % 2 === 1), 1L, st)
    val streamed = StreamingKmv.estimate(spark, st)
      .as[(String, Long, Double)].collect().sorted.toSeq
    assert(streamed == batchSketch(), "streamed sketch diverges from batch")
    // crash-replay of batch 0 overwrites its own partition — idempotent
    StreamingKmv.processBatch(docs.filter(col("doc_id") % 2 === 0), 0L, st)
    // and a RE-CRAWL (same docs under a NEW batch id) cannot inflate a
    // distinct count: KMV is duplicate-insensitive, no dedup stage needed
    StreamingKmv.processBatch(docs.filter(col("doc_id") % 2 === 0), 2L, st)
    val after = StreamingKmv.estimate(spark, st)
      .as[(String, Long, Double)].collect().sorted.toSeq
    assert(after == batchSketch(), "replay/re-crawl changed the sketch")
  }

  test("streaming end-to-end: MemoryStream -> per-batch minima -> live estimates") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val st  = freshStores()
    val tmp = java.nio.file.Files.createTempDirectory("kmv_stream_ck").toString
    val in  = MemoryStream[(Long, String, String)]
    val query = StreamingKmv.run(
      in.toDF().toDF("doc_id", "text", "source"), st, s"$tmp/ck",
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
    try {
      in.addData((1L, "a b c d e", "s1"))
      query.processAllAvailable()
      in.addData((2L, "a b c d e f", "s1")) // adds 3-gram "d e f" + "c d e f"'s new grams
      query.processAllAvailable()
      val est = StreamingKmv.estimate(spark, st)
        .as[(String, Long, Double)].collect()
      // under k distinct => the estimate IS the exact distinct count:
      // doc1 grams {a b c, b c d, c d e}, doc2 adds {b c d, c d e, d e f}
      // (first two duplicate) => 4 distinct grams
      assert(est.length == 1 && est.head._3 == 4.0,
        s"live estimate ${est.toSeq} != exact 4")
    } finally query.stop()
  }

  test("compaction collapses to <= k rows per source, estimates bit-identical, later batches merge") {
    val st = freshStores()
    val docs = Tables.documents(spark, dir).select("doc_id", "text", "source")
    StreamingKmv.processBatch(docs.filter(col("doc_id") % 3 === 0), 0L, st)
    StreamingKmv.processBatch(docs.filter(col("doc_id") % 3 === 1), 1L, st)
    val before = StreamingKmv.estimate(spark, st)
      .as[(String, Long, Double)].collect().sorted.toSeq
    val rowsBefore = spark.read.parquet(st.minsPath).count()
    StreamingKmv.compact(spark, st)
    val mins = spark.read.parquet(st.minsPath)
    assert(mins.select("batch_id").distinct().as[Long].collect().toSeq == Seq(-1L))
    val k = graft.analytics.TextAnalytics.KmvK
    val perSource = mins.groupBy("source").count().agg(max("count")).as[Long].head()
    assert(perSource <= k, s"a source kept $perSource > k=$k minima")
    assert(mins.count() <= rowsBefore)
    val after = StreamingKmv.estimate(spark, st)
      .as[(String, Long, Double)].collect().sorted.toSeq
    assert(after == before, "compaction changed the estimates")
    // a batch arriving AFTER compaction merges with the -1 generation
    StreamingKmv.processBatch(docs.filter(col("doc_id") % 3 === 2), 2L, st)
    val full = StreamingKmv.estimate(spark, st)
      .as[(String, Long, Double)].collect().sorted.toSeq
    assert(full == batchSketch(),
      "post-compaction merge diverges from the batch sketch")
  }
}
