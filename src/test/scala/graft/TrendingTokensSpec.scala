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
}
