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

  test("decontamination gate: contaminated docs quarantine with counts; clean docs pass") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("corpus_decontam").toString
    val s = Stores(s"$tmp/corpus", s"$tmp/sets", s"$tmp/index",
      benchGramsPath = Some(s"$tmp/bench_grams"),
      quarantinePath = Some(s"$tmp/quarantine"))
    // benchmark = one 10-token doc; store its grams once (static side)
    val benchText = (1 to 10).map(i => s"b$i").mkString(" ")
    graft.analytics.TextAnalytics.docGrams(Seq((9000L, benchText)).toDF("doc_id", "text"))
      .write.parquet(s"$tmp/bench_grams")
    // doc 1 leaks the benchmark's first 8-gram; doc 2 is clean
    val leaky = (1 to 8).map(i => s"b$i").mkString(" ") +
      " " + (1 to 28).map(i => s"w$i").mkString(" ")
    CorpusIngest.processBatch(
      Seq((1L, leaky), (2L, other)).toDF("doc_id", "text"), 0L, s)
    assert(corpusIds(s) == Set(2L))
    // quarantined doc carries its text and leak counts
    val q = spark.read.parquet(s"$tmp/quarantine").collect()
    assert(q.map(_.getAs[Long]("doc_id")).toSet == Set(1L))
    assert(q.head.getAs[Long]("n_shared_grams") == 1L)
    assert(q.head.getAs[String]("text") == leaky)
    // the index holds only admitted docs — the quarantined doc is not indexed
    val indexed = spark.read.parquet(s.indexPath)
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(indexed == Set(2L))
    // replay of the batch converges to the same state (overwrite idempotence)
    CorpusIngest.processBatch(
      Seq((1L, leaky), (2L, other)).toDF("doc_id", "text"), 0L, s)
    assert(corpusIds(s) == Set(2L))
    assert(spark.read.parquet(s"$tmp/quarantine")
      .select("doc_id").collect().map(_.getLong(0)).toSet == Set(1L))
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
