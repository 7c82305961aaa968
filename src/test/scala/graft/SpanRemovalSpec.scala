package graft

import graft.analytics.TextAnalytics
import org.apache.spark.sql.functions._

/** Laws for the duplicated-span REMOVAL operator (exact-substring dedup,
  * Lee et al.): exact intervals on a crafted corpus, well-formedness on
  * the sf0.001 documents table, and the stitch law — excising the spans
  * then re-measuring the span_dedup_rate diagnostic drives it to ~0.
  */
class SpanRemovalSpec extends SparkSpec {

  private val Sf = "/root/testdata/sf0.001"

  private def mk(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  // Crafted corpus: A and B share a 10-token run; C is untouched; D and E
  // are exact duplicates; F repeats a run twice WITHIN itself only.
  private lazy val crafted = mk(Seq(
    1L -> ("a1 a2 a3 a4 s1 s2 s3 s4 s5 s6 s7 s8 s9 s10 a5 a6 a7 a8 a9 a10"),
    2L -> ("b1 b2 b3 b4 b5 s1 s2 s3 s4 s5 s6 s7 s8 s9 s10 b6 b7 b8 b9 b10"),
    3L -> "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10 c11 c12",
    4L -> "d1 d2 d3 d4 d5 d6 d7 d8 d9 d10 d11 d12",
    5L -> "d1 d2 d3 d4 d5 d6 d7 d8 d9 d10 d11 d12",
    6L -> ("f1 r1 r2 r3 r4 r5 r6 r7 r8 f2 r1 r2 r3 r4 r5 r6 r7 r8 f3")))

  test("crafted corpus: exact merged intervals, 1-based inclusive") {
    val got = TextAnalytics.spanRemovalOn(crafted)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    // A: dup windows start at 5..7 → span tokens 5..14 (the shared run).
    // B: starts 6..8 → 6..15. D/E: whole doc 1..12. F: within-doc only → none.
    assert(got.toSeq == Seq(
      (1L, 5, 14, 10), (2L, 6, 15, 10),
      (4L, 1, 12, 12), (5L, 1, 12, 12)))
  }

  test("crafted corpus: clean excises exactly the spans and re-stitches") {
    val cleaned = TextAnalytics.spanRemovalCleanOn(crafted)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(cleaned(1L) == "a1 a2 a3 a4 a5 a6 a7 a8 a9 a10")
    assert(cleaned(2L) == "b1 b2 b3 b4 b5 b6 b7 b8 b9 b10")
    assert(cleaned(3L) == "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10 c11 c12") // untouched
    assert(cleaned(4L) == "" && cleaned(5L) == "") // whole-doc dup → empty
    assert(cleaned(6L).startsWith("f1 r1")) // within-doc repeat not excised
  }

  test("sf0.001 well-formedness: in-bounds, >=8 tokens, disjoint with gaps") {
    val docs = Tables.documents(spark, Sf)
    val spans = TextAnalytics.spanRemovalOn(docs)
    val nToks = docs.select(col("doc_id"), size(split(col("text"), " ")).as("n"))
    // Every span: 1 <= start <= end <= n_tokens, span_tokens = end-start+1 >= 8.
    val bad = spans.join(nToks, "doc_id")
      .filter(col("span_start") < 1 || col("span_end") > col("n") ||
        col("span_tokens") =!= col("span_end") - col("span_start") + 1 ||
        col("span_tokens") < 8)
      .count()
    assert(bad == 0L)
    // Per-doc intervals strictly ordered with a gap of at least one kept
    // token between consecutive spans (else the islands would have merged).
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("doc_id").orderBy("span_start")
    val overlaps = spans
      .withColumn("prev_end", lag("span_end", 1).over(w))
      .filter(col("prev_end").isNotNull && col("span_start") <= col("prev_end") + 1)
      .count()
    assert(overlaps == 0L)
    assert(spans.count() > 0L) // the corpus does contain cross-doc spans
  }

  test("stitch law: cleaning drives the dup-span diagnostic to ~0") {
    val docs = Tables.documents(spark, Sf)
    val before = TextAnalytics.spanDedupRateOn(docs)
      .agg(sum("dup_grams")).collect()(0).getLong(0)
    val cleaned = TextAnalytics.spanRemovalCleanOn(docs)
      .select(col("doc_id"), col("clean_text").as("text"))
    val after = TextAnalytics.spanDedupRateOn(cleaned)
      .agg(coalesce(sum("dup_grams"), lit(0L))).collect()(0).getLong(0)
    assert(before > 0L)
    // Excising every cross-doc >=8-token run removes all duplicated grams;
    // only coincidental matches stitched across excision boundaries remain.
    assert(after <= before / 50, s"residual dup grams $after vs $before")
  }

  test("property: planted shared runs are recovered exactly at random positions") {
    // Filler tokens are doc-UNIQUE (d<doc>f<i>) so no 8-gram can be
    // shared accidentally; the planted run (s0..s{L-1}) is the only
    // cross-doc span and must come back as exactly one interval per doc
    // covering exactly the planted positions.
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 5) {
      val runLen = 8 + rnd.nextInt(20)
      val run = (0 until runLen).map(i => s"s$i")
      def doc(id: Long): (Long, String, Int) = {
        val pre  = rnd.nextInt(15)
        val post = rnd.nextInt(15)
        val toks = (0 until pre).map(i => s"d${id}f$i") ++ run ++
          (0 until post).map(i => s"d${id}g$i")
        (id, toks.mkString(" "), pre + 1) // 1-based planted start
      }
      val (idA, textA, startA) = doc(1L)
      val (idB, textB, startB) = doc(2L)
      val got = TextAnalytics.spanRemovalOn(mk(Seq(idA -> textA, idB -> textB)))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSeq
      assert(got == Seq(
        (1L, startA, startA + runLen - 1),
        (2L, startB, startB + runLen - 1)),
        s"runLen=$runLen startA=$startA startB=$startB got=$got")
    }
  }

  test("token accounting: cleaned token count = original - excised") {
    val docs = Tables.documents(spark, Sf)
    val excised = TextAnalytics.spanRemovalOn(docs)
      .groupBy("doc_id").agg(sum("span_tokens").as("cut"))
    val orig = docs.select(col("doc_id"), size(split(col("text"), " ")).as("n0"))
    val clean = TextAnalytics.spanRemovalCleanOn(docs)
      .select(col("doc_id"),
        when(col("clean_text") === "", 0)
          .otherwise(size(split(col("clean_text"), " "))).as("n1"))
    val bad = orig.join(clean, "doc_id").join(excised, Seq("doc_id"), "left")
      .filter(col("n1") =!= col("n0") - coalesce(col("cut"), lit(0L)))
      .count()
    assert(bad == 0L)
  }
}
