package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bucketized point-in-interval join — the equi-join rewrite of the range
  * join `points ⋈ (start ≤ p ≤ end)`.
  *
  * Spark's native plan for a pure range predicate is
  * BroadcastNestedLoopJoin (or a cartesian with filter): every point is
  * tested against every interval, O(N·M) — the classic 100 TB
  * cliff-edge. The rewrite maps each interval to the fixed-width time
  * buckets it covers (one row per covered bucket) and each point to its
  * single bucket, joins on the bucket key (shuffled hash/sort-merge —
  * scalable), and re-applies the exact containment predicate as a
  * residual filter. Cost: |intervals| × (len/width) build rows and one
  * keyed shuffle — linear in data for bounded interval length, the same
  * trick Spark itself ships for stream-stream interval joins and
  * bucketed geospatial joins.
  *
  * Width picks the tradeoff: too small → more interval replicas; too
  * large → more non-matching bucket collisions for the residual filter
  * to discard. A width near the median interval length is the usual
  * sweet spot.
  *
  * No result row is duplicated: a point matches an interval in exactly
  * one bucket (its own), so no post-join distinct is needed — unlike
  * interval-interval bucket joins, which must dedup.
  */
object IntervalJoin {

  /** Join `points` to the `intervals` whose `[startTs, endTs]` (inclusive
    * both ends) contain `pointTs`. Timestamp columns; `bucketSeconds` is
    * the bucket width. Points outside every interval are dropped (inner
    * semantics). Column sets must be disjoint.
    */
  def pointInInterval(points: DataFrame, pointTs: String,
      intervals: DataFrame, startTs: String, endTs: String,
      bucketSeconds: Long): DataFrame = {
    val overlap = points.columns.toSet intersect intervals.columns.toSet
    require(overlap.isEmpty, s"column collision across sides: $overlap")
    val widthUs = bucketSeconds * 1000000L
    // cast("timestamp") first: tolerates TIMESTAMP_NTZ point/bound columns
    // (exact under the fixed UTC session timezone, no-op for LTZ input).
    def bucketOf(c: Column): Column = floor(unix_micros(c.cast("timestamp")) / widthUs)
    val taken = points.columns.toSet ++ intervals.columns.toSet
    val bk = Iterator.iterate("_bucket")(_ + "_").dropWhile(taken.contains).next()
    val iv = intervals.withColumn(bk,
      explode(sequence(bucketOf(col(startTs)), bucketOf(col(endTs)))))
    points.withColumn(bk, bucketOf(col(pointTs)))
      .join(iv, bk)
      .filter(col(pointTs) >= col(startTs) && col(pointTs) <= col(endTs))
      .drop(bk)
  }
}
