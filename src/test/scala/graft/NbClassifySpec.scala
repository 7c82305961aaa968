package graft

import graft.analytics.SelectionAnalytics

/** Naive Bayes classifier laws: cleanly separable classes classify with
  * a purely diagonal confusion matrix, and every val-split document is
  * accounted for exactly once.
  */
class NbClassifySpec extends SparkSpec {

  test("separable vocabularies give a diagonal confusion matrix") {
    import spark.implicits._
    // class A speaks only alpha-words, class B only beta-words; the
    // hash split puts ~10% of each in val — whatever lands there must
    // come back predicted as its own class
    val docs = (0 until 200).map { k =>
      val (src, text) =
        if (k % 2 == 0) ("A", "alpha apple anchor alpha apple")
        else ("B", "beta bridge basket beta bridge")
      (k.toLong, text, src)
    }.toDF("doc_id", "text", "source")
    val out = SelectionAnalytics.nbClassifyOn(docs).collect()
    assert(out.nonEmpty)
    val offDiag = out.filter(r => r.getString(0) != r.getString(1))
    assert(offDiag.isEmpty, s"misclassifications: ${offDiag.mkString(",")}")
    // both classes appear in val at this corpus size and split
    assert(out.map(_.getString(0)).toSet == Set("A", "B"))
  }
}
