package graft.analytics

import graft.Tables
import graft.functions.TextFeatures._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Retrieval-side operators over the `documents` table: BM25 term
  * weighting and a blocked inverted-index build — the indexing layer a
  * corpus pipeline runs after curation so the corpus is searchable (and
  * so retrieval-based decontamination / attribution have something to
  * query). North-star extensions beyond the reference surface, same
  * family as the TF-IDF pair in [[TextAnalytics]].
  *
  * Scale notes (100 TB): both operators are explode → gram-keyed hash
  * aggregates with map-side partials. The index build deliberately keys
  * postings by (term, doc block) rather than bare term: a stop-word's
  * posting list is corpus-sized, and any plan that materializes it in
  * one task (collect_list over a bare-term group, or a window over the
  * term partition) dies at scale on exactly the hottest keys. Block-keyed
  * groups are bounded by the block width regardless of term frequency —
  * the distributed twin of the block/skip-list layout on-disk indexes
  * use anyway.
  */
object RetrievalAnalytics {

  /** Top terms per doc (ties broken by term asc, same as tfidf_topk). */
  private val Bm25K = 3

  /** Okapi defaults. k1+1 is pre-folded so both engines evaluate the
    * same literal (2.2 parses to the identical IEEE double in Scala and
    * DuckDB).
    */
  private val K1 = 1.2
  private val B  = 0.75

  /** Posting-block width in doc_id units. */
  private val BlockW = 64

  // ---- bm25_topk: Okapi BM25 characteristic terms ----------------------
  /** Top-[[Bm25K]] terms per document under Okapi BM25
    * (k1=1.2, b=0.75, idf = ln((N − df + 0.5)/(df + 0.5) + 1)) — the
    * ranking function retrieval stacks actually serve, alongside the
    * TF-IDF pair as the third weighting of the same tf/df/dl frames.
    *
    * Determinism: doubles flow through ln, ·, ÷ in identical operation
    * order in both engines (tfidf_topk_log precedent — a cross-engine
    * rank flip needs two term scores within one ulp; exact ties break on
    * term asc identically). DuckDB literals are written `::DOUBLE`
    * (bare decimals are DECIMAL there).
    *
    * Scale: same shape as tfidf_topk — tf is one (doc, term)-keyed
    * aggregate, df one term-keyed aggregate (broadcast: vocab-sized),
    * the (n_docs, total_dl) anchor is 1 row, and the per-doc top-k
    * window partitions by doc_id (group size = distinct terms of one
    * doc, never corpus-sized).
    */
  def bm25Topk(spark: SparkSession, dir: String): DataFrame =
    bm25TopkOn(Tables.documents(spark, dir))

  private[graft] def bm25TopkOn(docs: DataFrame): DataFrame = {
    val tf = docs.select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tc"))
    val dl = tf.groupBy("doc_id").agg(sum(col("tc")).as("dl"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("total_dl"))
    val idf = log(
      (col("n_docs").cast("double") - col("df") + lit(0.5)) / (col("df") + lit(0.5))
        + lit(1.0))
    val tfn = (col("tc").cast("double") * lit(K1 + 1)) /
      (col("tc") + lit(K1) * (lit(1.0) - lit(B)
        + lit(B) * col("dl").cast("double") / (col("total_dl").cast("double") / col("n_docs"))))
    val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("term").asc)
    tf.join(dl, "doc_id")
      .join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      .withColumn("score", idf * tfn)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= Bm25K)
      .select(col("doc_id"), col("rank"), col("term"),
        round(col("score"), 6).as("bm25"))
  }

  val bm25TopkSql: String =
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
       |tc AS (SELECT doc_id, term, count(*) AS tc FROM tok GROUP BY 1, 2),
       |dl AS (SELECT doc_id, CAST(sum(tc) AS BIGINT) AS dl FROM tc GROUP BY 1),
       |df AS (SELECT term, count(*) AS df FROM tc GROUP BY 1),
       |st AS (SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS total_dl FROM dl),
       |ranked AS (
       |  SELECT tc.doc_id, tc.term,
       |         ln((st.n_docs::DOUBLE - df.df + 0.5::DOUBLE) / (df.df + 0.5::DOUBLE)
       |            + 1.0::DOUBLE)
       |         * ((tc.tc::DOUBLE * ${K1 + 1}::DOUBLE)
       |            / (tc.tc + $K1::DOUBLE * (1.0::DOUBLE - $B::DOUBLE
       |               + $B::DOUBLE * dl.dl::DOUBLE
       |                 / (st.total_dl::DOUBLE / st.n_docs)))) AS score,
       |         row_number() OVER (
       |           PARTITION BY tc.doc_id ORDER BY
       |             ln((st.n_docs::DOUBLE - df.df + 0.5::DOUBLE) / (df.df + 0.5::DOUBLE)
       |                + 1.0::DOUBLE)
       |             * ((tc.tc::DOUBLE * ${K1 + 1}::DOUBLE)
       |                / (tc.tc + $K1::DOUBLE * (1.0::DOUBLE - $B::DOUBLE
       |                   + $B::DOUBLE * dl.dl::DOUBLE
       |                     / (st.total_dl::DOUBLE / st.n_docs)))) DESC,
       |             tc.term ASC) AS rn
       |  FROM tc JOIN dl USING (doc_id) JOIN df USING (term) CROSS JOIN st)
       |SELECT doc_id, CAST(rn AS INT) AS rank, term, round(score, 6) AS bm25
       |FROM ranked WHERE rn <= $Bm25K""".stripMargin

  // ---- inverted_index: blocked posting lists ---------------------------
  /** Inverted index as (term, block) posting rows: per doc-id block of
    * width [[BlockW]], the term's in-block document frequency, collection
    * frequency, and the posting list itself as `doc:tf` pairs sorted by
    * doc_id. Blocking by `doc_id div ${BlockW}` keeps every group — and
    * therefore every collect_list — bounded by the block width even for
    * stop-word terms whose full posting list is corpus-sized; readers
    * scan a term's blocks in order (block is the skip pointer).
    *
    * Determinism: postings are `lpad(doc_id, 8, '0'):tf` strings sorted
    * lexicographically — the zero-pad makes lexicographic = numeric
    * order, and both engines sort strings bytewise. No doubles anywhere.
    */
  def invertedIndex(spark: SparkSession, dir: String): DataFrame =
    invertedIndexOn(Tables.documents(spark, dir))

  private[graft] def invertedIndexOn(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tc"))
      .withColumn("block", expr(s"doc_id div $BlockW"))
      .groupBy("term", "block")
      .agg(
        count(lit(1)).as("df_block"),
        sum(col("tc")).as("cf_block"),
        array_join(
          sort_array(collect_list(
            concat(lpad(col("doc_id").cast("string"), 8, "0"), lit(":"), col("tc")))),
          ",").as("postings"))
      .orderBy("term", "block")

  val invertedIndexSql: String =
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
       |tc AS (SELECT doc_id, term, count(*) AS tc FROM tok GROUP BY 1, 2)
       |SELECT term, doc_id // $BlockW AS block,
       |       count(*) AS df_block,
       |       CAST(sum(tc) AS BIGINT) AS cf_block,
       |       array_to_string(
       |         list_sort(list(lpad(doc_id::VARCHAR, 8, '0') || ':' || tc)),
       |         ',') AS postings
       |FROM tc GROUP BY 1, 2 ORDER BY term, block""".stripMargin

  val registry: Map[String, ((SparkSession, String) => DataFrame, String)] = Map(
    "bm25_topk"      -> (bm25Topk _, bm25TopkSql),
    "inverted_index" -> (invertedIndex _, invertedIndexSql),
  )
}
