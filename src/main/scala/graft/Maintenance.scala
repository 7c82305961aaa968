package graft

import org.apache.spark.sql.SparkSession

/** Driver-side block hygiene for long-lived sessions.
  *
  * Several query plans materialize a reused intermediate via
  * `localCheckpoint(eager = false)` (hashed shingle sets in
  * [[graft.dedup.Dedup]], the sketched table in
  * [[graft.similarity.Similarity.dedupEmbeddingLshOn]]): the checkpoint is
  * the right call INSIDE one query — three plan branches share one
  * computation — but its RDD blocks live until the RDD is
  * garbage-collected on the driver, which with a large driver heap can be
  * never. Across many queries in one session the blocks accumulate in the
  * executor block store and squeeze memory for later queries (measured in
  * round 4 as multi-x drift on back-to-back warm runs of the same query).
  *
  * [[releaseCachedBlocks]] is the deterministic fix: call it BETWEEN
  * queries (never while a released plan might still be re-executed — a
  * localCheckpointed RDD cannot recompute after its blocks are dropped)
  * to return the session to a clean block store. Bench and Verify call it
  * after every query; a production session embedding this library should
  * do the same at request boundaries.
  */
object Maintenance {

  /** Unpersist every persistent RDD (cached or localCheckpointed) in the
    * session's context. `blocking = true` waits for the blocks to actually
    * drop — what a benchmark wants so the next query starts from a clean
    * store; pass false for fire-and-forget hygiene in a serving path.
    */
  def releaseCachedBlocks(spark: SparkSession, blocking: Boolean = false): Unit =
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = blocking))
}
