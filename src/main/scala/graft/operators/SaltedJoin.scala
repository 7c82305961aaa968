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
  * build side is dimension-sized and the skew factor ≫ k. LIMITATION of
  * the default salt: it hashes every probe-side column, so FULLY
  * DUPLICATE rows (a common real-world skew shape — default/null-ish
  * records) all land in one salt bucket and the hot key still
  * serializes; pass `discriminator` (any high-cardinality column — a
  * unique id, a file/offset column) to split those too.
  */
object SaltedJoin {

  /** Inner equi-join of `skewed` (probe, skewed on `key`) with `build`
    * (small side, unique-ish on `key`), salted `k` ways.
    *
    * @param discriminator optional probe-side column whose hash drives
    *   the salt. Without it the salt hashes ALL probe columns, which is
    *   deterministic but cannot split a monster key made of identical
    *   rows (they hash alike); with a unique-ish discriminator even
    *   fully duplicate rows scatter across all `k` buckets.
    */
  def joinSalted(skewed: DataFrame, build: DataFrame, key: String, k: Int,
                 discriminator: Option[String] = None): DataFrame = {
    require(k > 0, s"salt buckets must be positive, got $k")
    discriminator.foreach(d => require(skewed.columns.contains(d),
      s"discriminator column '$d' not found in probe side ${skewed.columns.mkString("[", ",", "]")}"))
    // Collision-proof internal name: withColumn would silently REPLACE a
    // caller's own _salt column (and the final drop would remove it).
    val taken = (skewed.columns ++ build.columns).toSet
    val saltCol = Iterator.iterate("_salt")(_ + "_").dropWhile(taken.contains).next()
    val saltHash = discriminator match {
      case Some(d) => xxhash64(col(d))
      case None    => xxhash64(skewed.columns.map(col): _*)
    }
    val salted = skewed.withColumn(saltCol, pmod(saltHash, lit(k.toLong)))
    val replicated = build.withColumn(saltCol,
      explode(sequence(lit(0L), lit(k.toLong - 1))))
    salted.join(replicated, salted(saltCol) === replicated(saltCol)
        && salted(key) === replicated(key))
      .drop(saltCol).drop(replicated(key))
  }
}
