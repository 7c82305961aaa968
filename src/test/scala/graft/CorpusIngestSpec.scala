package graft

import graft.streaming.CorpusIngest
import graft.streaming.CorpusIngest.Stores
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

/** Streaming corpus curation laws: in-batch dedup, cross-batch dedup
  * against the persisted index, replay idempotence, and the full
  * MemoryStream path.
  */
class CorpusIngestSpec extends SparkSpec {

  private val base      = (1 to 36).map(i => s"w$i").mkString(" ")
  private val other     = (1 to 36).map(i => s"z$i").mkString(" ")
  private val third     = (1 to 36).map(i => s"q$i").mkString(" ")
  private def nearOf(t: String, marker: String) = t.replace(s"${marker}18 ", "xx ")

  private def freshStores(): Stores = {
    val tmp = java.nio.file.Files.createTempDirectory("corpus_ingest").toString
    Stores(s"$tmp/corpus", s"$tmp/sets", s"$tmp/index")
  }

  private def corpusIds(s: Stores): Set[Long] =
    spark.read.parquet(s.corpusPath).select("doc_id").collect().map(_.getLong(0)).toSet

  test("in-batch near-dups drop toward the smaller id; distinct docs pass") {
    import spark.implicits._
    val s = freshStores()
    // 11 is a near-dup of 1 (J ≈ 0.84): dropped. 2 is unrelated: kept.
    val b0 = Seq((1L, base), (2L, other), (11L, nearOf(base, "w"))).toDF("doc_id", "text")
    CorpusIngest.processBatch(b0, 0L, s)
    assert(corpusIds(s) == Set(1L, 2L))
  }

  test("cross-batch dups drop against the persisted index; corpus grows by the rest") {
    import spark.implicits._
    val s = freshStores()
    CorpusIngest.processBatch(
      Seq((1L, base), (2L, other)).toDF("doc_id", "text"), 0L, s)
    // 21 near-dups corpus doc 1 → dropped; 22 is new → kept; 23 is an
    // exact copy of 22 in the same batch → dropped (in-batch, 23 > 22)
    CorpusIngest.processBatch(
      Seq((21L, nearOf(base, "w")), (22L, third), (23L, third)).toDF("doc_id", "text"), 1L, s)
    assert(corpusIds(s) == Set(1L, 2L, 22L))
    // the index grew with the accepted docs only
    val indexed = spark.read.parquet(s.indexPath)
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(indexed == Set(1L, 2L, 22L))
  }

  test("replaying a batch is idempotent: same corpus, no self-dedup") {
    import spark.implicits._
    val s = freshStores()
    CorpusIngest.processBatch(Seq((1L, base)).toDF("doc_id", "text"), 0L, s)
    val b1 = Seq((21L, nearOf(base, "w")), (22L, third)).toDF("doc_id", "text")
    CorpusIngest.processBatch(b1, 1L, s)
    assert(corpusIds(s) == Set(1L, 22L))
    // crash-replay of batch 1: its own prior partition must be voided,
    // not treated as corpus (else 22 would dedup against itself)
    CorpusIngest.processBatch(b1, 1L, s)
    assert(corpusIds(s) == Set(1L, 22L))
  }

  test("per-batch checkpoint blocks are released — no growth across batches") {
    import spark.implicits._
    val s = freshStores()
    val before = spark.sparkContext.getPersistentRDDs.keySet
    (0L until 4L).foreach { b =>
      CorpusIngest.processBatch(
        Seq((b * 100L + 1L, base + s" extra$b")).toDF("doc_id", "text"), b, s)
    }
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"leaked persistent RDDs: $leaked")
  }

  test("streaming end-to-end: MemoryStream → curation gate → corpus store") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val s     = freshStores()
    val tmp   = java.nio.file.Files.createTempDirectory("corpus_ck").toString
    val input = MemoryStream[(Long, String)]
    val query = CorpusIngest.run(
      input.toDS().toDF("doc_id", "text"), s, tmp, Trigger.ProcessingTime(0L))
    try {
      input.addData((1L, base), (2L, other), (11L, nearOf(base, "w")))
      query.processAllAvailable()
      input.addData((21L, nearOf(base, "w")), (22L, third))
      query.processAllAvailable()
    } finally query.stop()
    assert(corpusIds(s) == Set(1L, 2L, 22L))
  }
}
