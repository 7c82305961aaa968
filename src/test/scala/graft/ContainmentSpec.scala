package graft

import graft.dedup.Dedup
import org.apache.spark.sql.functions._

/** Laws for the asymmetric containment dedup operator. */
class ContainmentSpec extends SparkSpec {

  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("a short doc quoted inside a long one is found at containment 1.0") {
    // doc 1 = a 6-token quote; doc 2 embeds it verbatim inside unrelated
    // text → every word 3-gram of doc 1 appears in doc 2 (containment 1)
    // while Jaccard is far below the 0.8 threshold
    val quote = "alpha beta gamma delta epsilon zeta"
    val page  = s"intro words before the quote $quote and then many more trailing words here"
    val docs = Seq((1L, quote), (2L, page)).toDF("doc_id", "text")
    val out = Dedup.dedupContainmentOn(
        docs.select(col("doc_id"), split(col("text"), " ").as("toks"))
          .select(col("doc_id"), expr("transform(sequence(1, size(toks) - 2), i -> concat_ws(' ', toks[i-1], toks[i], toks[i+1]))").as("sh")))
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(0) == 1L && r.getLong(1) == 2L)
    assert(r.getDouble(2) == 1.0)
    // …and the symmetric Jaccard machinery does NOT pair them
    val j = Dedup.dedupJaccardOn(Dedup.shingleSets(docs)).collect()
    assert(j.isEmpty, "jaccard should not fire on a short-quote pair")
  }

  test("containment pairs are a superset of Jaccard pairs on the testdata") {
    // J(A,B) >= t implies C(small->large) >= t (the union is at least the
    // larger set), so every Jaccard pair must re-surface in containment
    // with the same smaller-first orientation
    val sets = Dedup.shingleSets(Tables.documents(spark, dir))
    val jac = Dedup.dedupJaccardOn(sets)
      .select("doc_id_1", "doc_id_2").as[(Long, Long)].collect().toSet
    val cont = Dedup.dedupContainmentOn(sets)
      .select("doc_in", "doc_out").as[(Long, Long)].collect()
      .flatMap(p => Seq(p, p.swap)).toSet
    val missing = jac.filterNot(p => cont.contains(p) || cont.contains(p.swap))
    assert(missing.isEmpty, s"jaccard pairs missing from containment: $missing")
  }
}
