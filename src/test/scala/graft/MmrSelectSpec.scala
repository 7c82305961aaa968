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

  test("pool exhaustion: a pool smaller than K yields exactly |pool| rows (the fused greedy's empty-slice law)") {
    val emb = Tables.embeddings(spark, dir)
    // poolMod 150 over 200 vectors -> vec_id in {150} minus the query:
    // one candidate (vec_id 0 is the query and excluded)
    val poolSize = emb.filter(col("vec_id") % 150 === 0 && col("vec_id") =!= 0L).count()
    assert(poolSize > 0 && poolSize < 10, s"fixture drifted: pool=$poolSize")
    val rows = graft.similarity.MmrSelect
      .mmrSelectOn(emb, poolMod = 150)
      .select("sel_rank", "vec_id").as[(Long, Long)].collect().sortBy(_._1)
    assert(rows.length == poolSize, s"expected $poolSize rows, got ${rows.length}")
    assert(rows.map(_._1).toSeq == (1L to poolSize))
    assert(rows.map(_._2).distinct.length == rows.length)
  }

  test("retrieve→diversify composition: the ANN variant picks only shortlist members and keeps the greedy invariants") {
    val emb = Tables.embeddings(spark, dir)
    // the stage-1 int8 shortlist the composed operator promises to use
    val pool = graft.similarity.Quantize
      .int8ShortlistOn(emb, queryId = 0L, fetch = 40)
      .as[Long].collect().toSet
    assert(pool.size == 40, s"shortlist size ${pool.size}")
    val rows = MmrSelect.mmrSelectAnn(spark, dir)
      .select("sel_rank", "vec_id", "rel", "max_sim", "score")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.length == 10)
    assert(rows.map(_._1).toSeq == (1L to 10L))
    assert(rows.map(_._2).distinct.length == 10)
    // every pick is a shortlist member — the pool really is the ANN stage
    rows.foreach { case (r, id, _, _, _) =>
      assert(pool.contains(id), s"rank $r picked $id outside the ANN shortlist")
    }
    // same greedy: seed is the pool's max-relevance row, score identity
    val seed = rows.head
    assert(seed._4 == 0L)
    assert(rows.forall(_._3 <= seed._3))
    rows.tail.foreach { case (r, _, rel, m, s) =>
      assert(s == rel - m, s"rank $r score identity broken")
    }
    // redundancy penalty is ACTIVE: after the seed, max_sim is the
    // similarity to an actual prior pick, so it must be positive
    // somewhere on a shortlist of mutually-near vectors
    assert(rows.tail.exists(_._4 != 0L), "no pick ever paid a redundancy penalty")
  }
}
