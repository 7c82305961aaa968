package graft

import graft.analytics.{RetrievalAnalytics, TextAnalytics}
import org.apache.spark.sql.functions._

/** Structural laws for the round-10 retrieval/sketch additions — value
  * equality is the DuckDB oracle's job (`hybrid_rrf`, `cms_sketch`).
  */
class Round10OpsSpec extends SparkSpec {

  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("hybrid_rrf: dense ranks, no self-hits, rrf recomputable from the leg ranks") {
    val rows = RetrievalAnalytics.hybridRrf(spark, dir)
      .select("query_id", "rank", "doc_id", "rrf", "lex_rank", "vec_rank")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3),
        if (r.isNullAt(4)) None else Some(r.getInt(4)),
        if (r.isNullAt(5)) None else Some(r.getInt(5))))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (q, rs) =>
      assert(rs.map(_._2).sorted.toSeq == (1 to rs.length), s"query $q rank gaps")
      assert(rs.map(_._3).distinct.length == rs.length, s"query $q duplicate docs")
      assert(!rs.map(_._3).contains(q), s"query $q returned itself")
    }
    rows.foreach { case (q, r, d, rrf, lex, vec) =>
      assert(lex.isDefined || vec.isDefined, s"($q,$d) in neither leg")
      val want = lex.map(x => 1.0 / (60.0 + x)).getOrElse(0.0) +
        vec.map(x => 1.0 / (60.0 + x)).getOrElse(0.0)
      assert(math.abs(rrf - want) < 1e-6, s"($q,$d) rrf $rrf != recomputed $want")
      assert(r >= 1 && r <= 10)
    }
    // fusion actually fuses: some doc must carry BOTH leg ranks at this SF
    assert(rows.exists(r => r._5.isDefined && r._6.isDefined),
      "no doc ranked by both legs — fusion degenerate")
  }

  test("cms_sketch: estimates never undercount; the realized error respects the (d,w) bound class") {
    val rows = TextAnalytics.cmsSketch(spark, dir)
      .select("token", "exact_cnt", "cms_est", "overestimate")
      .as[(String, Long, Long, Long)].collect()
    assert(rows.length == 20)
    rows.foreach { case (t, exact, est, over) =>
      assert(est >= exact, s"$t undercounted: $est < $exact — CMS law broken")
      assert(over == est - exact)
    }
    // ε = e/w ≈ 0.0053 at w=512; the REALIZED max overestimate on this
    // fixed corpus must stay far under the ~2εN tail (deterministic
    // input, so this is a regression pin, not a probabilistic claim)
    val n = Tables.documents(spark, dir)
      .select(explode(split(col("text"), " "))).count()
    val bound = (2 * math.E / 512 * n).toLong max 1L
    assert(rows.map(_._4).max <= bound,
      s"max overestimate ${rows.map(_._4).max} above the 2eN/w class $bound (N=$n)")
  }

  test("dedup_ensemble: verdicts reconcile with the component screens; keep is exactly no-family-objected") {
    val rows = graft.dedup.Dedup.dedupEnsemble(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        if (r.isNullAt(3)) None else Some(r.getInt(3)), r.getInt(4)))
    val docs = Tables.documents(spark, dir)
    assert(rows.length == docs.count())
    rows.foreach { case (id, ex, lx, sem, keep) =>
      val want = if (ex == 0 && lx == 0 && sem.getOrElse(0) == 0) 1 else 0
      assert(keep == want, s"doc $id keep $keep != composed $want ($ex,$lx,$sem)")
    }
    // exact flags reconcile with dedup_exact's survivor groups
    val survivors = graft.dedup.Dedup.dedupExact(spark, dir)
      .select("survivor_id").as[Long].collect().toSet
    rows.foreach { case (id, ex, _, _, _) =>
      assert((ex == 0) == survivors.contains(id) ||
        (ex == 0 && survivors.contains(id)),
        s"doc $id exact_dup=$ex vs survivor=${survivors.contains(id)}")
    }
    // at this SF every doc carries an embedding: no semantic abstentions
    rows.foreach { case (id, _, _, sem, _) =>
      assert(sem.isDefined, s"doc $id semantic verdict missing despite full embedding coverage")
    }
  }

  test("dedup_threshold_curve: bands are monotone and the 800-permille band equals dedup_jaccard") {
    val curve = graft.dedup.Dedup.dedupThresholdCurve(spark, dir)
      .select("thresh_pm", "n_pairs", "n_docs_removed")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(curve.nonEmpty)
    // tightening the threshold can only shrink both counts
    curve.sliding(2).foreach {
      case Array((t1, p1, d1), (t2, p2, d2)) =>
        assert(p1 >= p2 && d1 >= d2, s"band $t1->$t2 not monotone: ($p1,$d1)->($p2,$d2)")
      case _ => ()
    }
    // the 800-permille band is exactly the registry dedup_jaccard pair set
    val jac = graft.dedup.Dedup.dedupJaccard(spark, dir).count()
    curve.find(_._1 == 800).foreach { case (_, p, _) =>
      assert(p == jac, s"800pm band $p != dedup_jaccard $jac")
    }
    assert(curve.exists(_._1 == 800), "800pm band missing")
  }

  test("cms cells merge: sketch of the union is the cell-wise sum of the parts") {
    val docs = Tables.documents(spark, dir)
    def toks(d: org.apache.spark.sql.DataFrame) =
      d.select(explode(split(col("text"), " ")).as("token"))
        .filter(length(col("token")) > 0)
    def cellMap(d: org.apache.spark.sql.DataFrame) =
      TextAnalytics.cmsCells(toks(d))
        .select("j", "h", "c").as[(Int, Long, Long)].collect()
        .map { case (j, h, c) => (j, h) -> c }.toMap
    val a = cellMap(docs.filter(col("doc_id") % 2 === 0))
    val b = cellMap(docs.filter(col("doc_id") % 2 === 1))
    val u = cellMap(docs)
    val summed = (a.keySet ++ b.keySet).map { k =>
      k -> (a.getOrElse(k, 0L) + b.getOrElse(k, 0L))
    }.toMap
    assert(u == summed, "CMS counter matrix is not mergeable cell-wise")
  }
}
