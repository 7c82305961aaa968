package graft

import graft.similarity.JlProject
import org.apache.spark.sql.functions._

/** Laws for the sign-random-projection distortion audit (`jl_distortion`). */
class JlProjectSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def brute(v: Seq[Double]): (Array[Long], Array[Long]) = {
    val m = v.map(math.abs).foldLeft(0.0)(math.max)
    val q =
      if (m == 0) Array.fill(v.size)(0L)
      else v.map(x => math.floor(x / (m / 127.0) + 0.5).toLong).toArray
    val p = (1 to 16).map(j =>
      (1 to 64).map(i => q(i - 1) * JlProject.sign(i, j)).sum).toArray
    (q, p)
  }

  private def dot(a: Array[Long], b: Array[Long]): Long =
    a.zip(b).map { case (x, y) => x * y }.sum

  test("entry equals a driver-side brute recompute of q, p and all six measures") {
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Seq[Double])].collect().toMap
    val got = JlProject.jlDistortion(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got.nonEmpty)
    got.foreach { case (id1, id2, dq, n1q, n2q, dp, n1p, n2p) =>
      assert(id1 % 50 == 0 && id2 == id1 + 1)
      val (qa, pa) = brute(vecs(id1))
      val (qb, pb) = brute(vecs(id2))
      assert(dq == dot(qa, qb) && n1q == dot(qa, qa) && n2q == dot(qb, qb),
        s"pair ($id1,$id2): int8-space measures")
      assert(dp == dot(pa, pb) && n1p == dot(pa, pa) && n2p == dot(pb, pb),
        s"pair ($id1,$id2): projected-space measures")
    }
  }

  test("realized cosine distortion stays in the (64 -> 16) budget band") {
    // theory: sign-JL cosine error concentrates at ~1/sqrt(P) = 0.25;
    // measured mean 0.20-0.22 / max <= 0.70 across all three SFs
    val rows = JlProject.jlDistortion(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
      .filter(r => r._4 > 0 && r._5 > 0 && r._7 > 0 && r._8 > 0)
    val errs = rows.map { case (_, _, dq, n1q, n2q, dp, n1p, n2p) =>
      math.abs(dq / math.sqrt(n1q.toDouble * n2q) -
        dp / math.sqrt(n1p.toDouble * n2p))
    }
    val mean = errs.sum / errs.size
    assert(mean > 0.02, "suspiciously perfect: the audit is not measuring")
    assert(mean <= 0.30, f"mean cosine distortion $mean%.3f above the band")
    assert(errs.max <= 0.85, f"max cosine distortion ${errs.max}%.3f above the band")
  }

  test("the baked sign matrix is md5-derived and non-degenerate") {
    val m = Array.tabulate(64, 16)((i, j) => JlProject.sign(i + 1, j + 1))
    assert(m.flatten.forall(s => s == 1 || s == -1))
    // every projected coordinate mixes both signs (no dimension is a
    // plain subset-sum of the input)
    (0 until 16).foreach { j =>
      val colSigns = (0 until 64).map(i => m(i)(j)).toSet
      assert(colSigns == Set(1, -1), s"column $j is degenerate")
    }
    // parity of the 60-bit md5 prefix, spot-checked against the spelling
    // the DuckDB oracle derives inline
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest("1:1".getBytes("UTF-8")).map(b => f"$b%02x").mkString
    val expected = if (BigInt(hex.substring(0, 15), 16) % 2 == 0) 1 else -1
    assert(m(0)(0) == expected)
  }
}
