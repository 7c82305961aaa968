package graft.sources

import org.apache.spark.sql.SparkSession

/** The house build-once store protocol, written ONCE (r14 verdict's
  * polish ask): every serving tier persists derived artifacts under
  * `java.io.tmpdir/<group>/<key>` and gates the build on a commit
  * marker — the artifact write's own `_SUCCESS` for single-writer
  * parquet stores, an explicit `_GRAFT_BUILT` root marker for
  * multi-artifact builds (created only after every artifact landed),
  * or catalog registration for managed tables (which commits after the
  * location write). Centralizing the checks also retires the repo's
  * last `java.io.File` existence probes: every check here goes through
  * the Hadoop FS API, because the warehouse/tmp need not be local (the
  * r13 linkStores lesson, now applied uniformly — the served hybrid
  * store's bare directory-exists checks were the remaining instances
  * of the stale-partial-cache class the bigEvents probe cache
  * documents).
  */
object StoreCatalog {

  /** tmpdir root for a store `group/key`. */
  def root(group: String, key: String): String =
    sys.props("java.io.tmpdir").stripSuffix("/") + "/" + group + "/" + key

  private def fs(spark: SparkSession, p: org.apache.hadoop.fs.Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** True iff `dir`'s write COMMITTED — its `_SUCCESS` landed. A bare
    * directory-exists check would serve a partially-written store to
    * every consumer forever after a build killed mid-write.
    */
  def committed(spark: SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir + "/_SUCCESS")
    fs(spark, p).exists(p)
  }

  /** Run `build` unless every member of `dirs` committed. Callers hold
    * their own store lock (single JVM writer); crash-safety comes from
    * the per-directory `_SUCCESS` discipline — `build` must write the
    * dirs in dependency order so a killed build re-runs.
    */
  def ensureCommitted(spark: SparkSession, dirs: Seq[String])(build: => Unit): Unit =
    if (!dirs.forall(committed(spark, _))) build

  /** Run `build` once per store ROOT under an explicit `_GRAFT_BUILT`
    * marker — for multi-artifact builds (batch stores + folded maps)
    * where no single `_SUCCESS` covers the set: a half-built root is
    * wiped first, and the marker is created only after `build` returns,
    * so replay never serves partial artifacts.
    *
    * OWNERSHIP CONTRACT (r15 ADVICE): the root belongs EXCLUSIVELY to
    * this build — every byte under it is written by `build` and may be
    * deleted on recovery. Enforced, not just documented: a
    * `_GRAFT_BUILDING` intent marker is written before `build` starts,
    * and recovery only wipes roots carrying it (i.e. this protocol's
    * own interrupted builds). A content-ful root with NEITHER marker
    * was written by someone else — independently `_SUCCESS`-committed
    * [[ensureCommitted]] artifacts, a mispointed path — and deleting
    * it would be silent data loss, so the call fails loud instead.
    */
  def ensureBuilt(spark: SparkSession, rootDir: String)(build: => Unit): Unit = {
    val marker   = new org.apache.hadoop.fs.Path(rootDir + "/_GRAFT_BUILT")
    val building = new org.apache.hadoop.fs.Path(rootDir + "/_GRAFT_BUILDING")
    val mfs = fs(spark, marker)
    if (mfs.exists(marker)) {
      // crash window between marker creation and intent-marker delete
      // (r16 ADVICE): _GRAFT_BUILT is written only after `build`
      // returned, so a surviving _GRAFT_BUILDING beside it is stale —
      // clean it here rather than leaving state an operator must reason
      // about manually.
      if (mfs.exists(building)) mfs.delete(building, false)
    } else {
      val r = new org.apache.hadoop.fs.Path(rootDir)
      if (mfs.exists(r)) {
        val contents = mfs.listStatus(r)
        require(contents.isEmpty || mfs.exists(building),
          s"ensureBuilt: $rootDir is content-ful but carries neither " +
            "_GRAFT_BUILT nor _GRAFT_BUILDING — it was not written by this " +
            "protocol (exclusive-ownership contract); refusing to delete it. " +
            "If it is an interrupted pre-intent-marker build (or a root this " +
            s"store owned before the marker upgrade), delete $rootDir " +
            "manually and re-run; if it is live data, the store key is " +
            "mispointed")
        if (contents.nonEmpty) mfs.delete(r, true)
      }
      mfs.create(building, true).close() // intent: root is now ours to wipe
      build
      mfs.create(marker, true).close()
      mfs.delete(building, false)
    }
  }

  /** Clear the way for a managed catalog TABLE rebuild: the catalog is
    * per-JVM but the warehouse directory persists, so a prior process
    * may have left the table's LOCATION behind with no catalog entry —
    * which `saveAsTable` refuses — or a build died between location
    * write and registration. Drop the entry and sweep the location.
    */
  def sweepTable(spark: SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val warehouse = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"))
    val staleLoc = new org.apache.hadoop.fs.Path(warehouse, table)
    val wfs = fs(spark, staleLoc)
    if (wfs.exists(staleLoc)) wfs.delete(staleLoc, true)
  }

  /** [[sweepTable]] + `build` (which must end in `saveAsTable(table)`),
    * gated on catalog registration — the single-table store shape.
    */
  def ensureTable(spark: SparkSession, table: String)(build: => Unit): Unit =
    if (!spark.catalog.tableExists(table)) {
      sweepTable(spark, table)
      build
    }
}
