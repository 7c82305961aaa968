package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted MinHash-LSH band index, hash-bucketed on the candidate-join
  * key — the deployment shape `Dedup.dedupIncrementalOn`'s scaladoc
  * promises: the corpus' band index is written ONCE, bucketed by
  * (band, band_hash), and every incremental crawl batch probes it with
  * an equi-join that reads co-located buckets on the corpus side — the
  * 100 TB index never moves through an exchange again; only the new
  * batch (tiny by definition) shuffles, to the bucket count.
  *
  * Same catalog-table mechanics as `TickStore.writeBucketed` (the
  * symbol-keyed covering-index analog); `BandStoreSpec` asserts both the
  * exchange-free plan law and candidate equality with the unbucketed
  * join.
  */
object BandStore {

  /** Write a (doc_id, band, band_hash) band index (see `Dedup.bandIndex`)
    * bucketed and bucket-sorted on the join key into the session catalog.
    */
  def write(bands: DataFrame, tableName: String, buckets: Int): Unit =
    bands.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, "band", "band_hash")
      .sortBy("band", "band_hash")
      .format("parquet")
      .saveAsTable(tableName)

  /** Candidate (new_doc_id, corpus_doc_id) pairs of a new batch's bands
    * against the stored index. The store side plans with NO exchange
    * (bucketing satisfies the join's clustering requirement); the new
    * batch shuffles to the bucket count.
    */
  def candidates(spark: SparkSession, tableName: String, newBands: DataFrame): DataFrame =
    newBands.as("a")
      .join(spark.table(tableName).as("b"),
        col("a.band") === col("b.band") && col("a.band_hash") === col("b.band_hash"))
      .select(col("a.doc_id").as("doc_id_1"), col("b.doc_id").as("doc_id_2"))
      .distinct()
}
