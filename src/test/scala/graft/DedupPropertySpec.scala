package graft

import graft.dedup.Dedup
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property checks for the dedup recall guarantees on random corpora with
  * planted near-duplicates: the LSH/banding and block-join candidate
  * generators must reproduce the exact (brute-force) answers.
  */
class DedupPropertySpec extends SparkSpec {

  /** Random corpus: `n` base docs of 30-60 tokens over a 200-word
    * vocabulary, plus a planted near-dup (1-2 word edits) for some.
    */
  private def corpus(seed: Long, n: Int): Seq[(Long, String)] = {
    val params = Gen.Parameters.default
    val wordGen = Gen.choose(0, 199).map(i => s"w$i")
    val docGen = for {
      len   <- Gen.choose(30, 60)
      words <- Gen.listOfN(len, wordGen)
    } yield words
    val docs = (0 until n).map { i =>
      docGen.apply(params, Seed(seed * 1000 + i)).get
    }
    val base = docs.zipWithIndex.map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
    // plant a near-dup of every 4th doc: change one word
    val dups = docs.zipWithIndex.collect {
      case (ws, i) if i % 4 == 0 =>
        val edited = ws.updated(ws.length / 2, "EDITED")
        ((n + i).toLong, edited.mkString(" "))
    }
    base ++ dups
  }

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("property: minhash-LSH output equals exact Jaccard on random corpora") {
    import spark.implicits._
    (1 to 3).foreach { s =>
      val sets  = Dedup.shingleSets(corpus(s.toLong, 40).toDF("doc_id", "text"))
      val exact = pairs(Dedup.dedupJaccardOn(sets))
      assert(exact.nonEmpty, s"seed $s plants no pairs — generator broken")
      assert(pairs(Dedup.dedupMinhashOn(sets)) == exact, s"seed $s")
    }
  }

  test("property: simhash block-pair join equals brute-force Hamming on random corpora") {
    import spark.implicits._
    (1 to 3).foreach { s =>
      val sets = Dedup.shingleSets(corpus(s.toLong + 100, 40).toDF("doc_id", "text"))
      val sigs = Dedup.simhashesOn(sets).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      val ids  = sigs.keys.toSeq.sorted
      val brute = (for {
        i <- ids; j <- ids if i < j
        if java.lang.Long.bitCount(sigs(i)._1 ^ sigs(j)._1) +
          java.lang.Long.bitCount(sigs(i)._2 ^ sigs(j)._2) <= 10
      } yield (i, j)).toSet
      assert(pairs(Dedup.dedupSimhashOn(sets)) == brute, s"seed $s")
    }
  }

  /** Driver-side union-find — the independent reference implementation
    * for the distributed min-label propagation.
    */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    // min-root invariant holds because unions always point to the smaller
    // root, so find(x) is the component minimum.
    parent.keys.map(v => v -> find(v)).toMap
  }

  test("property: componentsOn equals driver-side union-find on random graphs") {
    import spark.implicits._
    val params = Gen.Parameters.default
    (1 to 4).foreach { s =>
      // sparse random graph on ~60 vertices: mixes isolated pairs, chains
      // and dense blobs depending on the draw
      val edgeGen = for {
        n     <- Gen.choose(20, 60)
        m     <- Gen.choose(5, 50)
        edges <- Gen.listOfN(m, for {
          a <- Gen.choose(0, n - 1); b <- Gen.choose(0, n - 1) if a != b
        } yield (math.min(a, b).toLong, math.max(a, b).toLong))
      } yield edges
      val edges = edgeGen.apply(params, Seed(s.toLong * 77)).get.distinct
      val expected = unionFind(edges)
      val got = Dedup.componentsOn(edges.toDF("doc_id_1", "doc_id_2")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      assert(got.map(t => t._1 -> t._2).toMap == expected, s"seed $s")
      assert(got.forall(t => t._3 == (t._1 == t._2)), s"seed $s canonical flags")
    }
  }
}
