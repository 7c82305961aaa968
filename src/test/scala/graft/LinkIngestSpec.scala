package graft

import graft.dedup.Linkage
import graft.streaming.LinkIngest
import graft.streaming.LinkIngest.LinkStores
import org.apache.spark.sql.functions._

/** Laws for streaming linkage maintenance: after any prefix of batches
  * the stored edge graph equals the one-shot blocked fuzzy join over
  * all records seen (as a set), replay is a no-op, and compaction
  * preserves the graph bit-for-bit.
  */
class LinkIngestSpec extends SparkSpec {

  private def store(tag: String) = {
    val base = java.nio.file.Files.createTempDirectory(s"link_ingest_$tag").toString
    LinkStores(s"$base/keys", s"$base/edges")
  }

  private def edgeSet(df: org.apache.spark.sql.DataFrame): Set[(Long, String, Long, String, Long)] =
    df.select("a_id", "a_name", "b_id", "b_name", "dist").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3), r.getLong(4)))
      .toSet

  test("streamed edges ≡ one-shot fuzzy join after every batch prefix; replay no-op; compaction identity") {
    val s = store("law")
    val sup = Tables.supplier(spark, "/root/testdata/sf0.001")
      .select(col("s_suppkey").as("id"), col("s_name").as("name"))
      .localCheckpoint()
    // three arbitrary doc-atomic batches (id mod 3)
    val batches = (0 to 2).map(r => sup.filter(col("id") % 3 === r))
    var seen = sup.filter(lit(false))
    batches.zipWithIndex.foreach { case (b, i) =>
      LinkIngest.processBatch(b, i.toLong, s)
      seen = seen.unionByName(b)
      val expected = edgeSet(Linkage.fuzzyJoinOn(seen, "id", "name"))
      val got = edgeSet(LinkIngest.edges(spark, s))
      assert(expected.nonEmpty && got == expected, s"prefix through batch $i")
    }
    val before = edgeSet(LinkIngest.edges(spark, s))
    // replay the middle batch: as-of reads reproduce the original state
    LinkIngest.processBatch(batches(1), 1L, s)
    assert(edgeSet(LinkIngest.edges(spark, s)) == before, "replay must be a no-op")
    // compaction: same graph, one generation
    LinkIngest.compact(spark, s)
    assert(edgeSet(LinkIngest.edges(spark, s)) == before, "compaction identity")
    // cross-batch pairs genuinely exercised: the one-shot graph is
    // larger than the union of per-batch in-batch graphs
    val inBatchOnly = batches.map(b =>
      edgeSet(Linkage.fuzzyJoinOn(b, "id", "name"))).reduce(_ ++ _)
    assert(inBatchOnly.size < before.size, "fixture must produce cross-batch edges")
  }

  test("folded entity map ≡ from-scratch over the landed union, every prefix") {
    import graft.dedup.Dedup
    val s = store("entmap")
    val entPath = s.edgesPath.stripSuffix("/edges") + "/entities"
    val sup = Tables.supplier(spark, "/root/testdata/sf0.001")
      .select(col("s_suppkey").as("id"), col("s_name").as("name"))
      .localCheckpoint()
    val batches = (0 to 2).map(r => sup.filter(col("id") % 3 === r))
    def snapshot(id: Long): Set[(Long, Long, Boolean)] =
      spark.read.parquet(s"$entPath/batch_id=$id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    val corPath = s.edgesPath.stripSuffix("/edges") + "/coreness"
    def corSnapshot(id: Long): Set[(Long, Int)] =
      spark.read.parquet(s"$corPath/batch_id=$id")
        .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val triPath = s.edgesPath.stripSuffix("/edges") + "/triangles"
    def triSnapshot(id: Long): Set[(Long, Long, Long)] =
      spark.read.parquet(s"$triPath/batch_id=$id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    batches.zipWithIndex.foreach { case (b, i) =>
      LinkIngest.processBatch(b, i.toLong, s)
      LinkIngest.updateEntities(spark, s, entPath, i.toLong)
      Linkage.foldCorenessSnapshot(spark, s, entPath, corPath, i.toLong)
      Linkage.foldTrianglesSnapshot(spark, s, triPath, i.toLong)
      val landed = LinkIngest.edges(spark, s)
      val expected = Dedup.componentsOn(
          landed.select(col("a_id").as("doc_id_1"), col("b_id").as("doc_id_2")))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
      assert(expected.nonEmpty && snapshot(i.toLong) == expected,
        s"entity map after batch $i")
      // the coreness fold law: snapshot ≡ capped coreness derived
      // from scratch over everything landed so far (the r17 LOCAL fold
      // rides this unchanged law)
      val corExpected = Linkage.graphCorenessOn(
          landed.select(col("a_id"), col("b_id")))
        .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
      assert(corSnapshot(i.toLong) == corExpected,
        s"coreness map after batch $i")
      // the triangles fold law (r17): snapshot ≡ the degree/triangle
      // map derived from scratch over everything landed so far
      val triExpected = Linkage.degreeTriangleMapOn(
          landed.select(col("a_id"), col("b_id")))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(triSnapshot(i.toLong) == triExpected,
        s"triangle map after batch $i")
    }
    assert(snapshot(0L).size < snapshot(2L).size,
      "fixture must grow the map across batches")
    // the retired component-bounded fold spelling (the probe's A/B
    // reference) must agree with the local fold on the same batch
    val lastCor = corSnapshot(2L)
    Linkage.foldCorenessSnapshotComponent(spark, s, entPath, corPath, 2L)
    assert(corSnapshot(2L) == lastCor,
      "component-bounded and local folds must produce one snapshot")
    // chain compaction through the linkage-side pass-through: retained
    // snapshots read identical, generation 0 gone (the MaintenanceSpec
    // law re-checked at this call site)
    val lastEnt = snapshot(2L)
    val lastTri = triSnapshot(2L)
    LinkIngest.compact(spark, s, Seq(entPath, corPath, triPath))
    assert(snapshot(2L) == lastEnt && corSnapshot(2L) == lastCor &&
      triSnapshot(2L) == lastTri)
    val fs = new org.apache.hadoop.fs.Path(entPath)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(!fs.exists(new org.apache.hadoop.fs.Path(entPath, "batch_id=0")) &&
      !fs.exists(new org.apache.hadoop.fs.Path(corPath, "batch_id=0")) &&
      !fs.exists(new org.apache.hadoop.fs.Path(triPath, "batch_id=0")))
  }
}
