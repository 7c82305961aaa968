package graft

import graft.dedup.Dedup

/** Dedup operator laws on a hand-built corpus with known duplicates. */
class DedupSpec extends SparkSpec {

  // doc 1/2: identical; doc 3: near-dup of 1 (one word changed out of 36,
  // so 3 of 34 shingles differ → Jaccard (34-3)/(34+3) ≈ 0.84 ≥ 0.8);
  // doc 4: unrelated.
  private val base = (1 to 36).map(i => s"w$i").mkString(" ")
  private lazy val docs = {
    import spark.implicits._
    Seq(
      (1L, base),
      (2L, base),
      (3L, base.replace("w18 ", "xx ")),
      (4L, (1 to 36).map(i => s"z$i").mkString(" ")))
      .toDF("doc_id", "text")
  }

  private lazy val sets = Dedup.shingleSets(docs)

  test("dedup_exact groups identical texts under one survivor") {
    val rows = Dedup.dedupExactOn(docs).collect()
    assert(rows.length == 3) // {1,2} collapse, 3 and 4 stand alone
    val dupGroup = rows.find(_.getLong(2) == 2L).get
    assert(dupGroup.getLong(1) == 1L) // min doc_id survives
  }

  test("exact Jaccard finds the identical and the near-dup pair") {
    val pairs = Dedup.dedupJaccardOn(sets).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(p => (p._1, p._2))
    assert(pairs.map(p => (p._1, p._2)).toSeq == Seq((1L, 2L), (1L, 3L), (2L, 3L)))
    val identical = pairs.find(p => p._1 == 1L && p._2 == 2L).get
    assert(identical._3 == 1.0)
    val near = pairs.find(p => p._1 == 1L && p._2 == 3L).get
    assert(near._3 > 0.8 && near._3 < 1.0)
  }

  test("MinHash-LSH candidates + exact verify match the exact pairs") {
    val exact   = Dedup.dedupJaccardOn(sets).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val minhash = Dedup.dedupMinhashOn(sets).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(minhash == exact)
  }

  test("simhash: identical docs at Hamming 0; block-pair join ≡ brute force") {
    val sigs = Dedup.simhashesOn(sets).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(sigs(1L) == sigs(2L))
    // the law: the 12×8-bit block-pair join finds EXACTLY the brute-force
    // pairs with Hamming ≤ 10 over the 96-bit signature (pigeonhole
    // guarantees recall)
    val ids = sigs.keys.toSeq.sorted
    def ham(i: Long, j: Long): Int =
      java.lang.Long.bitCount(sigs(i)._1 ^ sigs(j)._1) +
        java.lang.Long.bitCount(sigs(i)._2 ^ sigs(j)._2)
    val expected = (for {
      i <- ids; j <- ids if i < j
      if ham(i, j) <= 10
    } yield (i, j)).toSet
    val pairs = Dedup.dedupSimhashOn(sets).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == expected)
    assert(pairs.contains((1L, 2L))) // identical docs always survive
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("components: transitive closure, min-label canonical, multi-round convergence") {
    import spark.implicits._
    // chained cluster {1,2,3,9} (1-3 and 3-9 pairs; 1-9 never emitted),
    // a plain pair {4,5}, and a 6-node path {10..15} whose diameter
    // forces several propagation rounds.
    val pairs = (Seq((1L, 2L), (2L, 3L), (3L, 9L), (4L, 5L))
      ++ (10L until 15L).map(i => (i, i + 1)))
      .toDF("doc_id_1", "doc_id_2")
    val out = Dedup.componentsOn(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).sortBy(_._1)
    val byDoc = out.map(t => t._1 -> t._2).toMap
    assert(Seq(1L, 2L, 3L, 9L).forall(byDoc(_) == 1L))
    assert(Seq(4L, 5L).forall(byDoc(_) == 4L))
    assert((10L to 15L).forall(byDoc(_) == 10L))
    assert(out.filter(_._3).map(_._1).toSeq == Seq(1L, 4L, 10L)) // canonical = component min
    assert(out.length == 12) // only docs that appear in some pair
  }

  test("components on an empty pair set is empty") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("doc_id_1", "doc_id_2")
    assert(Dedup.componentsOn(empty).collect().isEmpty)
  }

  test("incremental dedup joins only new-batch docs against the corpus index") {
    import spark.implicits._
    // new batch = doc_id % 10 == 3: docs 3 and 23 (near-dups of base) and
    // 13 (identical to the z-text); corpus = 1, 2 (base), 4 (z-text)
    val zText = (1 to 36).map(i => s"z$i").mkString(" ")
    val docs6 = Seq(
      (1L, base), (2L, base),
      (3L, base.replace("w18 ", "xx ")),
      (4L, zText),
      (13L, zText),
      (23L, base.replace("w18 ", "xx ")))
      .toDF("doc_id", "text")
    val pairs = Dedup.dedupIncrementalOn(Dedup.shingleSets(docs6)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // every cross-boundary near-dup, and ONLY those: corpus-corpus (1,2)
    // and new-new (3,23) identical pairs must NOT appear
    assert(pairs.map(p => (p._1, p._2)).toSet
      == Set((3L, 1L), (3L, 2L), (23L, 1L), (23L, 2L), (13L, 4L)))
    assert(pairs.find(p => p._1 == 13L && p._2 == 4L).get._3 == 1.0)
    pairs.foreach(p => assert(p._3 >= 0.8))
  }

  test("incremental ≡ full minhash dedup restricted to cross-boundary pairs (real data)") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val sets = Dedup.shingleSets(docs)
    def isNew(id: Long): Boolean = id % 10 == 3
    val full = Dedup.dedupMinhashOn(sets).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // full dedup emits (a < b); normalize to (new, corpus) orientation
    val expected = full.collect {
      case (a, b) if isNew(a) && !isNew(b) => (a, b)
      case (a, b) if !isNew(a) && isNew(b) => (b, a)
    }
    val incremental = Dedup.dedupIncrementalOn(sets).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(incremental == expected)
    assert(incremental.nonEmpty) // the law is vacuous on a corpus without cross dups
  }

  test("simhash words stay within 48 bits each (block join soundness)") {
    val sigs = Dedup.simhashesOn(sets).collect()
      .flatMap(r => Seq(r.getLong(1), r.getLong(2)))
    assert(sigs.forall(s => s >= 0L && s < (1L << 48)))
  }

  test("split_assign is leakage-free by construction where the doc-keyed split is not") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val assign = Dedup.splitAssignOn(docs)
      .select("doc_id", "group_id", "split").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(assign.size == docs.count())
    // every verified near-dup pair shares a group and therefore a split
    val pairs = Dedup.dedupMinhashOn(Dedup.shingleSets(docs))
      .select("doc_id_1", "doc_id_2").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "fixture lost its near-dup pairs")
    pairs.foreach { case (a, b) =>
      assert(assign(a)._1 == assign(b)._1, s"pair ($a,$b) split across groups")
      assert(assign(a)._2 == assign(b)._2, s"pair ($a,$b) LEAKS across splits")
    }
    // the audit operator agrees: zero straddling pairs under this split,
    // while the doc-keyed identity split leaks on the same corpus
    val docLeaks = Dedup.splitLeakageOn(docs).count()
    assert(docLeaks > 0, "fixture no longer demonstrates doc-keyed leakage")
    // both splits are non-degenerate (train and val both populated)
    assert(assign.values.map(_._2).toSet == Set("train", "val"))
  }
}
