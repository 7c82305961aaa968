package graft

import graft.streaming.StreamingCms
import graft.streaming.StreamingCms.CmsStores
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming CMS laws: the per-batch cell matrices merge to exactly the
  * batch sketch's matrix (so point estimates agree bit-for-bit with the
  * oracle-checked `cms_sketch`), replay is idempotent, and never-seen
  * tokens estimate 0.
  */
class StreamingCmsSpec extends SparkSpec {

  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def freshStores(): CmsStores =
    CmsStores(java.nio.file.Files.createTempDirectory("cms_stream").toString + "/cells")

  test("streamed estimates equal the batch sketch on the same corpus; replay idempotent; unseen token -> 0") {
    val st = freshStores()
    val docs = Tables.documents(spark, dir).select("doc_id", "text")
    StreamingCms.processBatch(docs.filter(col("doc_id") % 2 === 0), 0L, st)
    StreamingCms.processBatch(docs.filter(col("doc_id") % 2 === 1), 1L, st)
    // batch reference: the oracle-checked cms_sketch's (token, est) rows
    val batchEst = graft.analytics.TextAnalytics.cmsSketch(spark, dir)
      .select("token", "cms_est").as[(String, Long)].collect().toMap
    val streamed = StreamingCms.pointEstimate(spark, st, batchEst.keys.toSeq)
      .as[(String, Long)].collect().toMap
    assert(streamed == batchEst,
      s"streamed estimates diverge: ${streamed.toSet -- batchEst.toSet}")
    // crash-replay of batch 0 rewrites its own partition
    StreamingCms.processBatch(docs.filter(col("doc_id") % 2 === 0), 0L, st)
    val replayed = StreamingCms.pointEstimate(spark, st, batchEst.keys.toSeq)
      .as[(String, Long)].collect().toMap
    assert(replayed == batchEst, "replay changed the estimates")
    // a token that never occurred estimates 0 (all its cells may still
    // exist from other tokens — the per-cell coalesce keeps min sound
    // only when a probed cell is truly absent; either way est >= 0 and
    // est >= truth = 0; assert the sound direction plus the bound class)
    val ghost = StreamingCms.pointEstimate(spark, st, Seq("zz_never_seen_zz"))
      .as[(String, Long)].head()._2
    val n = docs.select(explode(split(col("text"), " "))).count()
    assert(ghost >= 0 && ghost <= (2 * math.E / 512 * n).toLong.max(1L),
      s"ghost estimate $ghost outside the (d,w) bound class")
  }

  test("streaming end-to-end: MemoryStream -> per-batch cells -> live point estimates") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val st  = freshStores()
    val tmp = java.nio.file.Files.createTempDirectory("cms_stream_ck").toString
    val in  = MemoryStream[String]
    val query = StreamingCms.run(in.toDF().toDF("text"), st, s"$tmp/ck",
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
    try {
      in.addData(Seq.fill(12)("surge").mkString(" ") + " a b c")
      query.processAllAvailable()
      in.addData(Seq.fill(9)("surge").mkString(" ") + " d e f")
      query.processAllAvailable()
      val est = StreamingCms.pointEstimate(spark, st, Seq("surge"))
        .as[(String, Long)].head()._2
      // 21 true arrivals; CMS never undercounts
      assert(est >= 21L, s"surge estimated $est < 21 — undercount")
    } finally query.stop()
  }

  test("cell-wise compaction: batch generations collapse to <= d*w rows, estimates bit-identical, later batches still merge") {
    val st = freshStores()
    val docs = Tables.documents(spark, dir).select("doc_id", "text")
    StreamingCms.processBatch(docs.filter(col("doc_id") % 3 === 0), 0L, st)
    StreamingCms.processBatch(docs.filter(col("doc_id") % 3 === 1), 1L, st)
    val probe = docs.select(explode(split(col("text"), " ")).as("t"))
      .groupBy("t").count().orderBy(col("count").desc, col("t"))
      .limit(10).as[(String, Long)].collect().map(_._1).toSeq
    val before = StreamingCms.pointEstimate(spark, st, probe)
      .as[(String, Long)].collect().toMap
    val rowsBefore = spark.read.parquet(st.cellsPath).count()
    StreamingCms.compact(spark, st)
    // one consolidated generation, cell-wise summed: <= d*w rows total
    val cells = spark.read.parquet(st.cellsPath)
    assert(cells.select("batch_id").distinct().as[Long].collect().toSeq == Seq(-1L))
    val rowsAfter = cells.count()
    assert(rowsAfter <= 4L * 512L && rowsAfter <= rowsBefore,
      s"compacted store has $rowsAfter rows (before: $rowsBefore)")
    assert(cells.groupBy("j", "h").count().filter(col("count") > 1).count() == 0,
      "compaction left duplicate (j,h) cells")
    val after = StreamingCms.pointEstimate(spark, st, probe)
      .as[(String, Long)].collect().toMap
    assert(after == before, "compaction changed the estimates")
    // re-compaction of a single generation is a no-op
    StreamingCms.compact(spark, st)
    assert(spark.read.parquet(st.cellsPath).count() == rowsAfter)
    // a batch arriving AFTER compaction merges with the -1 generation
    StreamingCms.processBatch(docs.filter(col("doc_id") % 3 === 2), 2L, st)
    val full = StreamingCms.pointEstimate(spark, st, probe)
      .as[(String, Long)].collect().toMap
    val batchAll = graft.analytics.TextAnalytics.cmsSketch(spark, dir)
      .select("token", "cms_est").as[(String, Long)].collect().toMap
    probe.filter(batchAll.contains).foreach { t =>
      assert(full(t) == batchAll(t),
        s"post-compaction merge diverges from the batch sketch at '$t'")
    }
  }
}
