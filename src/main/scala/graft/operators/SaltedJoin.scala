package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Manual skew-salted equi-join — the technique for the case AQE's skew
  * handling can't reach: a shuffle join where one key carries a large
  * fraction of the probe side (AQE splits skewed PARTITIONS of sort-merge
  * joins, but a single monster key inside one partition still serializes
  * its sort/merge; salting splits the KEY itself).
  *
  * The skewed side's rows scatter across `k` salt buckets by a
  * deterministic per-row hash (salting with `rand()` would not be
  * replayable across stage retries); the build side replicates `k` ways
  * (one `Generate`, no shuffle of its own when followed by the join
  * exchange), and the join key widens to (key, salt) — the monster key
  * becomes `k` evenly-sized join groups. Result is row-identical to the
  * plain join (law-checked in `SaltedJoinSpec`).
  *
  * Cost model: build-side bytes × k through the exchange vs the skewed
  * key's group no longer serializing one task — worth it when the
  * build side is dimension-sized and the skew factor ≫ k.
  */
object SaltedJoin {

  /** Inner equi-join of `skewed` (probe, skewed on `key`) with `build`
    * (small side, unique-ish on `key`), salted `k` ways. The salt hashes
    * every probe-side column, so only fully duplicate rows share a
    * bucket deterministically — acceptable: identical rows join
    * identically anyway.
    */
  def joinSalted(skewed: DataFrame, build: DataFrame, key: String, k: Int): DataFrame = {
    require(k > 0, s"salt buckets must be positive, got $k")
    val salted = skewed.withColumn("_salt",
      pmod(xxhash64(skewed.columns.map(col): _*), lit(k.toLong)))
    val replicated = build.withColumn("_salt",
      explode(sequence(lit(0L), lit(k.toLong - 1))))
    salted.join(replicated, salted("_salt") === replicated("_salt")
        && salted(key) === replicated(key))
      .drop("_salt").drop(replicated(key))
  }
}
