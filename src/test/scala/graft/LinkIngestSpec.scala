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
}
