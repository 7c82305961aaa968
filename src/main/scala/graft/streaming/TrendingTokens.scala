package graft.streaming

import graft.functions.MisraGries
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** One hash bucket's current heavy-hitter summary: the Misra-Gries
  * counter map as sorted (token, lower-bound count) pairs plus the
  * bucket's total arrivals — everything a reader needs to apply the
  * `count > N_bucket/k` presence guarantee.
  */
case class BucketTrend(bucket: Int, n_arrivals: Long,
                       tokens: Array[String], counts: Array[Long])

/** Streaming heavy hitters — "trending tokens" over an unbounded
  * document stream, the always-on twin of the batch two-pass
  * `heavy_hitters` query and the standard first stage of a streaming
  * vocabulary/spam monitor.
  *
  * Design: tokens key by `xxhash64 mod buckets` and each bucket's group
  * keeps ONE bounded Misra-Gries counter map (the same mergeable sketch
  * the batch pass-1 uses — literally the same [[MisraGries]] code,
  * `reduce` per arrival here instead of `merge` per partial) across
  * micro-batches via mapGroupsWithState. State is ≤ k counters per
  * bucket FOREVER, regardless of vocabulary size or stream length —
  * that bound, not the counts, is what makes the operator viable on an
  * unbounded stream (an exact running group-by's state grows with the
  * key domain). Each trigger emits every updated bucket's current
  * summary; a reader joins the B bucket rows (B is a constant) and
  * keeps tokens whose lower-bound count clears its threshold.
  *
  * Guarantees (spec-checked, order-independent): any token whose true
  * arrival count in a bucket exceeds `N_bucket / k` is PRESENT in that
  * bucket's summary (Misra-Gries invariant — survives any arrival
  * order, which matters because the shuffled per-batch iterator order
  * is not deterministic); reported counts are lower bounds, within
  * `N_bucket / k` of truth. Exact counts, when needed, come from the
  * batch pass-2 recount over the candidate set, same as `heavy_hitters`.
  *
  * Scale: buckets = parallelism knob (state k·B counters total); the
  * per-arrival cost is the sketch's amortized O(1). At 100 TB/day the
  * same topology holds — the shuffle is on the bucket key, and no
  * stage's state depends on the vocabulary.
  */
object TrendingTokens {

  /** Tokens (whitespace split of `text`) bucketed and folded into
    * per-bucket Misra-Gries state; emits each touched bucket's summary
    * per trigger (Update mode).
    */
  def trendingTokens(docs: DataFrame, k: Int, buckets: Int): Dataset[BucketTrend] = {
    import docs.sparkSession.implicits._
    require(k >= 1 && buckets >= 1, "trendingTokens needs k >= 1 and buckets >= 1")
    val mg = MisraGries(k)
    docs
      .select(explode(split(col("text"), " ")).as("token"))
      .filter(length(col("token")) > 0)
      .select(pmod(xxhash64(col("token")), lit(buckets)).cast("int").as("bucket"),
        col("token"))
      .as[(Int, String)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(
        (bucket: Int, rows: Iterator[(Int, String)],
         state: GroupState[(Long, Map[String, Long])]) => {
          var (n, counters) = state.getOption.getOrElse((0L, mg.zero))
          rows.foreach { case (_, tok) =>
            n += 1
            counters = mg.reduce(counters, tok)
          }
          state.update((n, counters))
          val sorted = counters.toArray.sortBy { case (t, c) => (-c, t) }
          BucketTrend(bucket, n, sorted.map(_._1), sorted.map(_._2))
        })
  }
}
