package graft

import graft.dedup.Dedup
import org.apache.spark.sql.functions._

/** Laws for the weighted-cosine lexical near-dup join (3-gram shingle
  * counts — `dedup_jaccard`'s shingle space WITHOUT the distinct).
  */
class DedupCosineSpec extends SparkSpec {

  import spark.implicits._

  test("weighted semantics: repetition skew separates docs Jaccard calls identical; self-concat stays 1.0") {
    val base = "alpha beta gamma delta epsilon zeta eta theta"
    // base has 6 distinct 3-gram shingles, each count 1
    val docs = Seq(
      1L -> base,
      // doc 1 repeated back-to-back: every base shingle count doubles
      // (plus 2 seam shingles) — cosine to doc 1 stays high; crucially
      // the SUPPORT superset alone doesn't sink it the way tf skew does
      2L -> (base + " " + Array.fill(40)("alpha beta gamma").mkString(" ")))
      .toDF("doc_id", "text")
    // doc 2 = doc 1's support plus massive repetition of one passage:
    // Jaccard on distinct shingles is moderate, but count-weighted
    // cosine collapses — the pair must NOT qualify at 9/10
    val none = Dedup.dedupCosineOn(docs).collect()
    assert(none.isEmpty)

    // exact self-concat is count-scaling modulo the seam: a clean scale
    // test uses a doc whose double shares exactly the same count RATIOS —
    // simplest true case: identical documents
    val same = Seq(3L -> base, 4L -> base).toDF("doc_id", "text")
    val got = Dedup.dedupCosineOn(same)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.map(t => (t._1, t._2)).toSeq == Seq((3L, 4L)))
    assert(math.abs(got.head._3 - 1.0) < 1e-12)
  }

  test("exact recall: prefix-filtered result equals the naive quadratic on a pseudo-random corpus") {
    // 60 deterministic docs assembled from a pool of 8 three-token
    // phrases with hash-derived repetition counts — shared shingles with
    // varying counts, many pairs near the threshold on either side
    val docs = (1L to 60L).map { id =>
      val words = (0 until 8).flatMap { p =>
        val rep = (math.abs((id * 2654435761L + p * 40503L).toInt) % 3) + (if (p < 2) 3 else 0)
        Seq.fill(rep)(s"p${p}a p${p}b p${p}c")
      }
      (id, words.mkString(" "))
    }.toDF("doc_id", "text")
    val got = Dedup.dedupCosineOn(docs)
      .select("doc_id_1", "doc_id_2").as[(Long, Long)].collect().toSet
    // naive reference: every pair, same 3-gram stream, integer predicate
    val tc = docs
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), explode(expr(
        """transform(sequence(1, size(toks) - 2),
          |  i -> concat(element_at(toks, i), ' ',
          |              element_at(toks, i + 1), ' ',
          |              element_at(toks, i + 2)))""".stripMargin)).as("t"))
      .groupBy("doc_id", "t").agg(count(lit(1)).as("c"))
    val a = tc.select(col("doc_id").as("i"), col("t"), col("c").as("ca"))
    val b = tc.select(col("doc_id").as("j"), col("t"), col("c").as("cb"))
    val n2 = tc.groupBy(col("doc_id")).agg(sum(col("c") * col("c")).as("n2"))
    val expect = a.join(b, Seq("t")).filter(col("i") < col("j"))
      .groupBy("i", "j").agg(sum(col("ca") * col("cb")).as("dot"))
      .join(n2.select(col("doc_id").as("i"), col("n2").as("ni")), "i")
      .join(n2.select(col("doc_id").as("j"), col("n2").as("nj")), "j")
      .filter(col("dot") * col("dot") * 100 >= col("ni") * col("nj") * 81)
      .select("i", "j").as[(Long, Long)].collect().toSet
    assert(expect.nonEmpty, "degenerate corpus: no qualifying pairs to check recall on")
    assert(got == expect)
  }
}
