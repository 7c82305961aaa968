package graft.analytics

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed BPE tokenizer training over the `documents` table — the
  * merge-rule learning step an LLM pipeline runs before tokenizing its
  * corpus. The algorithm is the standard one (Sennrich et al.; what HF
  * tokenizers implements): ONE corpus pass builds the word-frequency
  * table, then every merge round runs on that vocabulary-sized table —
  * adjacent-symbol pair counts weighted by word frequency, merge the
  * argmax pair, re-segment. The corpus-sized work is a single token
  * count; the k iterative rounds touch only |vocab| rows each.
  *
  * Representation: a word's segmentation is the separator-joined symbol
  * string `⊥s₁⊥s₂⊥…⊥` (boundary separators included), so "merge (a,b)"
  * is the string replace `⊥a⊥b⊥ → ⊥ab⊥` — leftmost non-overlapping,
  * exactly BPE's scan order, with the boundary separators preventing
  * any cross-symbol substring match. Both engines' `replace` share
  * those semantics, which is what makes the op oracle-checkable: the
  * DuckDB oracle is the same k rounds mechanically unrolled into CTEs.
  *
  * Determinism: pair counts are integer word-frequency sums; ties on
  * the argmax break on (count desc, left asc, right asc) — bytewise
  * string order in both engines.
  *
  * Scale (100 TB): the corpus pass is one explode + word-keyed count;
  * each round is a vocab-sized groupBy plus a 1-row argmax read — the
  * per-round driver `head` is k rows of control plane total, the same
  * class as dedup_components' convergence counts. Vocabulary tables are
  * ~10⁶–10⁷ rows at web scale — a few executor partitions; the rounds
  * are seconds each regardless of corpus size, which is exactly why
  * production BPE trainers work off the word-count dict.
  */
object BpeTrainer {

  /** Separator below any corpus byte; words are `[a-z]+` here but the
    * scheme only needs the separator absent from symbols.
    */
  private val Sep = "\u0001"

  /** Number of merge rules learned by the registry query. */
  private val Merges = 8

  /** (rank, left, right, merged, pair_count) for the top-[[Merges]] BPE
    * merges, rank-ordered — the merge table a tokenizer ships.
    */
  def bpeMerges(spark: SparkSession, dir: String): DataFrame =
    bpeMergesOn(Tables.documents(spark, dir), Merges)

  /** Runs the k training rounds; returns the merge table and the final
    * per-word segmentation frame (word, w, cnt) — the trained tokenizer's
    * word table, reused by [[bpeEncode]].
    */
  private def train(docs: DataFrame, k: Int)
      : (Seq[(Int, String, String, String, Long)], DataFrame) = {
    // one corpus pass: word-frequency table, then char-split to the
    // sep-joined symbol representation
    var words = docs
      .select(explode(split(col("text"), " ")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .select(col("word"),
        concat(lit(Sep),
          array_join(expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))"), Sep),
          lit(Sep)).as("w"),
        col("cnt"))
      .localCheckpoint(eager = false)
    val merges = Seq.newBuilder[(Int, String, String, String, Long)]
    for (rank <- 1 to k) {
      val syms = split(col("w"), Sep)
      val best = words
        .select(slice(syms, lit(2), size(syms) - 2).as("s"), col("cnt"))
        // single-symbol words contribute no pairs (Spark's sequence(1, 0)
        // would COUNT DOWN; DuckDB's generate_series(1, 0) is empty)
        .filter(size(col("s")) >= 2)
        .select(explode(expr(
          "transform(sequence(1, size(s) - 1), i -> struct(element_at(s, i) AS a, element_at(s, i + 1) AS b))"))
          .as("p"), col("cnt"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("cnt")).as("n"))
        .orderBy(col("n").desc, col("a").asc, col("b").asc)
        .head()
      val (a, b, n) = (best.getString(0), best.getString(1), best.getLong(2))
      merges += ((rank, a, b, a + b, n))
      words = words
        .select(col("word"),
          call_function("replace", col("w"),
            lit(Sep + a + Sep + b + Sep), lit(Sep + a + b + Sep)).as("w"),
          col("cnt"))
        .localCheckpoint(eager = false)
    }
    (merges.result(), words)
  }

  private[graft] def bpeMergesOn(docs: DataFrame, k: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    train(docs, k)._1
      .toDF("rank", "left", "right", "merged", "pair_count")
      .orderBy("rank")
  }

  // ---- bpe_encode: per-doc token counts under the trained tokenizer ----
  /** Encode the corpus with its own trained tokenizer: per document, the
    * word count and the BPE token count after the k learned merges — the
    * number sequence packing and token budgeting actually consume. The
    * trained word table is vocabulary-sized (one row per distinct word,
    * its final segmentation length = symbols of its `w` string), so the
    * scoring join broadcasts it into the exploded token stream; one
    * doc-keyed aggregate finishes. Integer-only.
    */
  def bpeEncode(spark: SparkSession, dir: String): DataFrame =
    bpeEncodeOn(Tables.documents(spark, dir), Merges)

  private[graft] def bpeEncodeOn(docs: DataFrame, k: Int): DataFrame = {
    val wordToks = train(docs, k)._2
      .select(col("word"),
        (size(split(col("w"), Sep)) - 2).as("n_toks"))
    docs.select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .join(broadcast(wordToks), "word")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum(col("n_toks")).as("n_bpe_tokens"))
      .orderBy("doc_id")
  }

  /** The same k rounds unrolled into DuckDB CTEs: `w0` is the
    * word-frequency table in the sep-joined representation (the source
    * word is carried alongside — it is the join key [[bpeEncodeSql]]
    * needs, and `word → w` is injective so it never changes the rows);
    * round i derives pair counts `p_i` from `w_{i-1}`, the argmax `b_i`,
    * and the re-segmented `w_i`.
    */
  private val roundCtes: String = {
    val sep = "chr(1)"
    val rounds = (1 to Merges).map { i =>
      s"""p$i AS MATERIALIZED (
         |  SELECT s[j] AS a, s[j + 1] AS b, CAST(sum(cnt) AS BIGINT) AS n
         |  FROM (SELECT string_split(trim(w, chr(1)), $sep) AS s, cnt FROM w${i - 1}),
         |       unnest(generate_series(1, len(s) - 1)) AS u(j)
         |  GROUP BY 1, 2),
         |b$i AS MATERIALIZED (SELECT a, b, n FROM p$i ORDER BY n DESC, a ASC, b ASC LIMIT 1),
         |w$i AS MATERIALIZED (
         |  SELECT word,
         |         replace(w,
         |           $sep || (SELECT a FROM b$i) || $sep || (SELECT b FROM b$i) || $sep,
         |           $sep || (SELECT a FROM b$i) || (SELECT b FROM b$i) || $sep) AS w,
         |         cnt
         |  FROM w${i - 1})""".stripMargin
    }.mkString(",\n")
    s"""WITH w0 AS MATERIALIZED (
       |  SELECT word,
       |         $sep || array_to_string(
       |           list_transform(generate_series(1, len(word)), i -> substr(word, i, 1)),
       |           $sep) || $sep AS w,
       |         count(*) AS cnt
       |  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
       |  GROUP BY 1, 2),
       |$rounds""".stripMargin
  }

  val bpeMergesSql: String = {
    val unions = (1 to Merges).map { i =>
      s"SELECT $i AS rank, a AS \"left\", b AS \"right\", a || b AS merged, n AS pair_count FROM b$i"
    }.mkString("\nUNION ALL\n")
    s"""$roundCtes,
       |merges AS ($unions)
       |SELECT * FROM merges ORDER BY rank""".stripMargin
  }

  /** Encode oracle: the trained word table `w$Merges` scored as final
    * symbol count per word, joined back into the exploded corpus. Sums
    * cast to BIGINT (DuckDB promotes to HUGEINT).
    */
  val bpeEncodeSql: String =
    s"""$roundCtes,
       |wt AS (SELECT word, len(string_split(trim(w, chr(1)), chr(1))) AS n_toks
       |       FROM w$Merges)
       |SELECT doc_id,
       |       count(*) AS n_words,
       |       CAST(sum(n_toks) AS BIGINT) AS n_bpe_tokens
       |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents) d
       |JOIN wt USING (word)
       |GROUP BY doc_id
       |ORDER BY doc_id""".stripMargin

  val registry: Map[String, ((SparkSession, String) => DataFrame, String)] = Map(
    "bpe_merges" -> (bpeMerges _, bpeMergesSql),
    "bpe_encode" -> (bpeEncode _, bpeEncodeSql),
  )
}
