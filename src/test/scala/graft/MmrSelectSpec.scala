package graft

import graft.similarity.MmrSelect
import org.apache.spark.sql.functions._

/** Structural laws for MMR diverse selection beyond the oracle. */
class MmrSelectSpec extends SparkSpec {

  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("greedy invariants: distinct picks, seed is max-relevance, scores consistent") {
    val rows = MmrSelect.mmrSelect(spark, dir)
      .select("sel_rank", "vec_id", "rel", "max_sim", "score")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.length == 10)
    assert(rows.map(_._1).toSeq == (1L to 10L), "rank gaps")
    assert(rows.map(_._2).distinct.length == rows.length, "duplicate picks")
    // seed: max_sim 0 and the highest relevance of all rows ever picked
    val seed = rows.head
    assert(seed._4 == 0L)
    assert(rows.forall(_._3 <= seed._3), "seed is not max-relevance")
    // score identity on every row
    rows.tail.foreach { case (r, _, rel, m, s) =>
      assert(s == rel - m, s"rank $r score identity broken")
    }
  }
}
