package graft

import graft.streaming.TrendingTokens
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Laws for the streaming Misra-Gries trending-token operator. Counts
  * are order-dependent lower bounds, so assertions pin the sketch's
  * GUARANTEES (presence above N/k, bounded state, lower-bound counts)
  * — never exact counter values.
  */
class TrendingTokensSpec extends SparkSpec {

  private val K = 4

  test("heavy tokens survive across micro-batches; state stays <= k per bucket") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[String]
    // one bucket so the guarantee math is over the whole stream
    val trends = TrendingTokens.trendingTokens(in.toDF().toDF("text"), K, buckets = 1)

    val query = trends.writeStream.format("memory").queryName("trending")
      .outputMode(OutputMode.Update()).start()
    try {
      // batch 1: 'hot' dominates; noise tokens are all distinct
      in.addData(Seq.fill(10)("hot").mkString(" ") + " n1 n2 n3")
      query.processAllAvailable()
      // batch 2: more 'hot' plus a second heavy token and fresh noise
      in.addData(Seq.fill(8)("hot").mkString(" ") + " " +
        Seq.fill(9)("warm").mkString(" ") + " n4 n5 n6")
      query.processAllAvailable()

      val rows = spark.table("trending").collect()
      // Update mode emits one summary row per trigger: take the latest
      val last = rows.maxBy(_.getLong(1))
      val n = last.getLong(1)
      assert(n == 33, s"arrival count drifted: $n") // 13 + 20 tokens
      val tokens = last.getSeq[String](2)
      val counts = last.getSeq[Long](3)
      assert(tokens.length <= K, s"state exceeded k: ${tokens.length} counters")
      // true freq 18 ('hot') clears N/k = 33/4 by a wide margin
      assert(tokens.contains("hot"), s"heavy token evicted: $tokens")
      // counts are lower bounds within N/k of truth
      val hot = counts(tokens.indexOf("hot"))
      assert(hot <= 18 && hot >= 18 - n / K, s"hot count $hot out of MG band")
      // a summary row was emitted for the bucket on each trigger
      assert(rows.length >= 2)
    } finally query.stop()
  }

  test("bucketed: every bucket keeps its own bounded sketch") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[String]
    val trends = TrendingTokens.trendingTokens(in.toDF().toDF("text"), K, buckets = 4)
    val query = trends.writeStream.format("memory").queryName("trending_b")
      .outputMode(OutputMode.Update()).start()
    try {
      in.addData((1 to 60).map(i => s"tok$i").mkString(" ") + " " +
        Seq.fill(20)("viral").mkString(" "))
      query.processAllAvailable()
      val rows = spark.table("trending_b").collect()
      assert(rows.map(_.getInt(0)).distinct.length > 1, "tokens all hashed to one bucket")
      rows.foreach { r =>
        assert(r.getSeq[String](2).length <= K,
          s"bucket ${r.getInt(0)} state exceeded k")
      }
      // 'viral' dominates its bucket (20 of <= 35 arrivals there) and
      // must be present in exactly that bucket's summary
      val withViral = rows.filter(_.getSeq[String](2).contains("viral"))
      assert(withViral.nonEmpty, "dominant token missing from its bucket")
    } finally query.stop()
  }

  // ---- the merge/reader view (round 9) ---------------------------------

  test("trendingMergeOn == the exact per-bucket computation, sketch pruning active") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // vocabulary (200 noise tokens) >> k (5), so the sketch MUST prune;
    // two heavy tokens planted well above every bucket threshold
    val text = ((1 to 200).map(i => s"noise$i") ++
      Seq.fill(120)("alpha") ++ Seq.fill(90)("beta"))
    // arrival order scrambled across 7 partitions — the merged result
    // must not depend on partitioning or order
    val docs = scala.util.Random.shuffle(text).grouped(13).map(_.mkString(" "))
      .toSeq.toDF("text").repartition(7)
    val got = TrendingTokens.trendingMergeOn(docs, k = 5, buckets = 3)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSet
    // exact reference: plain per-bucket group-by + threshold, no sketch
    val toks = docs.select(explode(split(col("text"), " ")).as("token"))
      .filter(length(col("token")) > 0)
      .withColumn("bucket",
        pmod(graft.functions.TextFeatures.hash60(col("token")), lit(3)).cast("int"))
    val nb = toks.groupBy("bucket").agg(count(lit(1)).as("n_bucket"))
    val want = toks.groupBy("bucket", "token").agg(count(lit(1)).as("cnt"))
      .join(nb, "bucket")
      .filter(col("cnt") * 5 > col("n_bucket"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSet
    assert(got === want)
    assert(got.exists(_._2 == "alpha") && got.exists(_._2 == "beta"),
      s"planted heavy hitters missing: $got")
    // noise tokens (count 1 each) never clear a threshold
    assert(got.forall(t => t._2 == "alpha" || t._2 == "beta"), s"false positive: $got")
  }

  test("guaranteedTrending over the STREAMING sink's summaries: sound, and exact-complete after recount") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[String]
    val trends = TrendingTokens.trendingTokens(in.toDF().toDF("text"), K, buckets = 2)
    val query = trends.writeStream.format("memory").queryName("trending_m")
      .outputMode(OutputMode.Update()).start()
    try {
      in.addData(Seq.fill(12)("surge").mkString(" ") + " x1 x2 x3")
      query.processAllAvailable()
      in.addData(Seq.fill(9)("surge").mkString(" ") + " x4 x5 x6")
      query.processAllAvailable()
      // latest summary row per bucket = the materialized sink table a
      // dashboard reads
      val summaries = spark.table("trending_m")
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("bucket")
            .orderBy(col("n_arrivals").desc)))
        .filter(col("rn") === 1).drop("rn")
      val guaranteed = TrendingTokens.guaranteedTrending(summaries, K).collect()
      // soundness: every guaranteed row's true count clears its bucket
      // threshold (lower bound <= truth, so lb*k > N implies true*k > N)
      val trueCounts = Map("surge" -> 21L) ++
        (1 to 6).map(i => s"x$i" -> 1L).toMap
      guaranteed.foreach { r =>
        val (tok, lb, n) = (r.getString(2), r.getLong(3), r.getLong(1))
        assert(lb <= trueCounts(tok), s"lower bound above truth for $tok")
        assert(trueCounts(tok) * K > n, s"false positive $tok")
      }
      // the dominant token IS guaranteed (its lb clears even after MG
      // undercount: 21 arrivals, bucket N <= 27, band N/k)
      assert(guaranteed.exists(_.getString(2) == "surge"),
        "dominant token not in the guaranteed tier")
      // presence guarantee feeding the recount: every true heavy hitter
      // is among the summary candidates (merged-guarantee half the
      // exact recount relies on)
      val candTokens = summaries
        .select(explode(col("tokens")).as("t")).as[String].collect().toSet
      assert(candTokens.contains("surge"))
    } finally query.stop()
  }

  test("streamed dashboard path: per-batch archive+sketch, refresh equals the batch operator exactly; replay idempotent") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir  = "/root/testdata/sf0.001"
    val tmp  = java.nio.file.Files.createTempDirectory("trend_stream").toString
    val st   = TrendingTokens.TrendStores(s"$tmp/tokens", s"$tmp/summaries")
    val docs = Tables.documents(spark, dir).select("doc_id", "text")
    // drive the gate batch-by-batch (the foreachBatch body is a pure
    // function of (batch, id, stores) — same pattern as VectorIndexIngest)
    TrendingTokens.processMergeBatch(docs.filter(col("doc_id") % 2 === 0), 0L, st)
    TrendingTokens.processMergeBatch(docs.filter(col("doc_id") % 2 === 1), 1L, st)
    val streamed = TrendingTokens.mergeDashboard(spark, st)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    val batch = TrendingTokens.trendingMergeOn(Tables.documents(spark, dir))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(streamed.nonEmpty, "empty dashboard")
    assert(streamed == batch,
      s"streamed dashboard diverges from the batch recount: only-streamed=${streamed -- batch} only-batch=${batch -- streamed}")
    // crash-replay of batch 0 rewrites its own partitions — refresh unchanged
    TrendingTokens.processMergeBatch(docs.filter(col("doc_id") % 2 === 0), 0L, st)
    val replayed = TrendingTokens.mergeDashboard(spark, st)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(replayed == streamed, "replay changed the dashboard")
  }

  test("streamed dashboard end-to-end: MemoryStream → foreachBatch gate → stores") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("trend_stream_e2e").toString
    val st  = TrendingTokens.TrendStores(s"$tmp/tokens", s"$tmp/summaries")
    val in  = MemoryStream[String]
    val query = TrendingTokens.run(in.toDF().toDF("text"), st, s"$tmp/ck",
      k = 4, buckets = 2,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
    try {
      in.addData(Seq.fill(12)("surge").mkString(" ") + " y1 y2 y3")
      query.processAllAvailable()
      in.addData(Seq.fill(9)("surge").mkString(" ") + " y4 y5 y6")
      query.processAllAvailable()
      val dash = TrendingTokens.mergeDashboard(spark, st, k = 4).collect()
      assert(dash.exists(_.getString(1) == "surge"), s"dominant token missing: ${dash.mkString(",")}")
      // exact counts from the archive: surge arrived 21 times
      assert(dash.find(_.getString(1) == "surge").get.getLong(2) == 21L)
    } finally query.stop()
  }
}
