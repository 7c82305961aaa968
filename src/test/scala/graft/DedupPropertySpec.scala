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
}
