package graft.analytics

import graft.Tables
import graft.functions.TextFeatures.{hash60, hash60Sql, tokens}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-run data preparation: the two ordering problems every large
  * pretraining pipeline solves after curation — (a) a DETERMINISTIC
  * global shuffle (the epoch-seeded random order documents are consumed
  * in, reproducible run-to-run so a crashed job resumes mid-epoch on the
  * same permutation), and (b) length-bucketed batch packing (group
  * same-magnitude documents so a padded batch wastes little compute —
  * the classic bucketed-batching trade of sequence models).
  *
  * Both are rank-assignment problems, and both use the engine's standard
  * two-level distributed prefix-sum instead of a single global window:
  * rows get a coarse GROUP from their ordering-key prefix, group counts
  * aggregate to a tiny table whose cumulative offsets broadcast back,
  * and a per-group `row_number` (partition = group, state O(1)) adds the
  * fine rank. No partition ever holds more than one group; the global
  * order is exactly the (ordering key, tiebreak) sort without a global
  * sort ever executing. Same machinery as `TextAnalytics.corpusPack`'s
  * token offsets.
  *
  * Determinism: ordering keys are md5-derived [[hash60]] values or exact
  * integer token counts; ranks are integers; no floating point anywhere,
  * so both engines agree bit-for-bit.
  */
object TrainingPrep {

  /** Documents per shard in the training order (a real run sizes this to
    * the data-loader's file granularity).
    */
  private val ShardDocs = 64L

  /** Epoch seed: folded into the shuffle hash so each epoch is a fresh,
    * reproducible permutation.
    */
  private val Epoch = 1

  /** Rank groups = top [[GrpBits]] bits of the 60-bit shuffle hash — 64
    * groups here; a 100 TB run raises this so each group's window stays
    * executor-sized (hash uniformity keeps groups balanced; the offsets
    * table is 2^GrpBits rows, broadcast either way).
    */
  private val GrpBits = 6

  // ---- training_order: epoch-seeded deterministic global shuffle -------
  /** Each document's position in the epoch's global shuffle order:
    * `global_idx` = rank by (hash60(doc_id ":" epoch), doc_id), plus the
    * derived contiguous shard and within-shard slot the data loader
    * consumes. One keyed shuffle on the hash-prefix group + a 64-row
    * broadcast — the global sort never runs.
    */
  def trainingOrder(spark: SparkSession, dir: String): DataFrame =
    trainingOrderOn(Tables.documents(spark, dir))

  def trainingOrderOn(docs: DataFrame): DataFrame = {
    val keyed = docs.select(
      col("doc_id"),
      hash60(concat(col("doc_id").cast("string"), lit(s":$Epoch"))).as("k"))
      .withColumn("grp", shiftright(col("k"), 60 - GrpBits))
    val offs = keyed.groupBy("grp").agg(count(lit(1)).as("c"))
      .withColumn("goff", coalesce(sum("c").over(
        Window.orderBy("grp").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("grp", "goff")
    keyed
      .withColumn("rn", row_number().over(
        Window.partitionBy("grp").orderBy(col("k"), col("doc_id"))))
      .join(broadcast(offs), "grp")
      .withColumn("global_idx", col("goff") + col("rn") - 1)
      .select(col("doc_id"), col("global_idx"),
        expr(s"global_idx div $ShardDocs").as("shard"),
        (col("global_idx") % ShardDocs).as("pos"))
      .orderBy("global_idx")
  }

  val trainingOrderSql: String =
    s"""WITH k AS (
       |  SELECT doc_id,
       |         ${hash60Sql(s"doc_id::VARCHAR || ':$Epoch'")} AS k
       |  FROM documents),
       |r AS (
       |  SELECT doc_id,
       |         CAST(row_number() OVER (ORDER BY k, doc_id) - 1 AS BIGINT)
       |           AS global_idx
       |  FROM k)
       |SELECT doc_id, global_idx,
       |       global_idx // $ShardDocs AS shard,
       |       global_idx % $ShardDocs AS pos
       |FROM r ORDER BY global_idx""".stripMargin

  // ---- length_batches: length-bucketed batch packing -------------------

  /** Documents per training batch. */
  private val BatchDocs = 16L

  /** doc_id range width of the fine rank groups (see scaladoc above). */
  private val RankGroup = 64L

  /** Assign every document to a (length bucket, batch) and report each
    * batch's fill: bucket = ⌊log₂(token count)⌋ (power-of-two length
    * bands, computed as binary-string length — engine-portable integer
    * math, no transcendental log), documents ranked within their bucket
    * by (tokens DESC, doc_id), batches cut every [[BatchDocs]] ranks.
    * `pad_waste` = n_docs·max_tokens − sum_tokens is the padding the
    * batch pays when padded to its longest member — THE quantity length
    * bucketing exists to minimize (compare against one global bucket to
    * see the win).
    *
    * Rank assignment is the two-level prefix sum with group = (bucket,
    * n, doc_id div [[RankGroup]]): ordering by (n DESC, doc_id) equals
    * ordering by (n DESC, grp, doc_id) because grp is monotone in
    * doc_id — so per-cell `row_number` + cumulative cell counts
    * reconstruct the bucket-wide rank with every window partition
    * bounded by [[RankGroup]] same-length docs.
    */
  def lengthBatches(spark: SparkSession, dir: String): DataFrame =
    lengthBatchesOn(Tables.documents(spark, dir))

  def lengthBatchesOn(docs: DataFrame): DataFrame = {
    val t = docs
      .select(col("doc_id"), size(tokens(col("text"))).cast("long").as("n"))
      .filter(col("n") > 0)
      .withColumn("bucket", (length(bin(col("n"))) - 1).cast("long"))
      .withColumn("grp", expr(s"doc_id div $RankGroup"))
    val cellOffs = t.groupBy("bucket", "n", "grp").agg(count(lit(1)).as("c"))
      .withColumn("off", coalesce(sum("c").over(
        Window.partitionBy("bucket").orderBy(col("n").desc, col("grp"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("bucket", "n", "grp", "off")
    t.withColumn("rn", row_number().over(
        Window.partitionBy("bucket", "n", "grp").orderBy("doc_id")))
      .join(broadcast(cellOffs), Seq("bucket", "n", "grp"))
      .withColumn("batch_id", expr(s"(off + rn - 1) div $BatchDocs"))
      .groupBy("bucket", "batch_id")
      .agg(
        count(lit(1)).as("n_docs"),
        min("n").as("min_tokens"),
        max("n").as("max_tokens"),
        sum("n").as("sum_tokens"))
      .withColumn("pad_waste", col("n_docs") * col("max_tokens") - col("sum_tokens"))
      .orderBy("bucket", "batch_id")
  }

  val lengthBatchesSql: String =
    s"""WITH t AS (
       |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n
       |  FROM documents WHERE len(string_split(text, ' ')) > 0),
       |b AS (
       |  SELECT doc_id, n, CAST(length(bin(n)) - 1 AS BIGINT) AS bucket FROM t),
       |r AS (
       |  SELECT doc_id, n, bucket,
       |         row_number() OVER (PARTITION BY bucket ORDER BY n DESC, doc_id)
       |           AS rk
       |  FROM b)
       |SELECT bucket, (rk - 1) // $BatchDocs AS batch_id,
       |       count(*) AS n_docs,
       |       min(n) AS min_tokens,
       |       max(n) AS max_tokens,
       |       CAST(sum(n) AS BIGINT) AS sum_tokens,
       |       CAST(count(*) * max(n) - sum(n) AS BIGINT) AS pad_waste
       |FROM r GROUP BY bucket, batch_id
       |ORDER BY bucket, batch_id""".stripMargin

  // ---- token_budget_sample: per-source token-budget mixture sampling ---

  /** Per-source token budget: the sampled prefix stops once a source's
    * running token total reaches this. (A real mixture run sets one
    * budget per source from the target mixture weights; a single
    * constant keeps the oracle one query.)
    */
  private val TokenBudget = 400L

  /** TOKEN-level mixture sampling: for each source, documents are
    * ordered by the deterministic shuffle hash (hash60(text), doc_id)
    * and kept while the source's RUNNING TOKEN TOTAL stays within
    * [[TokenBudget]] — the "sample this source down to k tokens"
    * primitive a pretraining mixture actually needs, where
    * `corpus_mix` samples ROWS at a rate and `stratified_sample` takes
    * a fixed DOC count. Because the cumulative sum is strictly
    * increasing (every doc has ≥ 1 token), `filter(cum ≤ B)` IS the
    * greedy take-while prefix; the doc that would overflow the budget
    * and everything after it drop out.
    *
    * Determinism: the hash order is a replayable permutation (same
    * `hash60` rule as [[trainingOrder]]) — any engine, any partitioning,
    * any retry draws the same sample, which is what makes a mixture
    * auditable; a `rand()` sample is none of these.
    *
    * Scale (100 TB): the running total rides the same two-level prefix
    * sum as [[trainingOrder]] — hash-prefix groups cap every window
    * partition at a (source, grp) cell, per-cell token subtotals
    * cumulate in a S·2^[[GrpBits]]-row broadcast offsets table, and no
    * per-source global window ever executes. One keyed shuffle, one
    * tiny broadcast.
    */
  def tokenBudgetSample(spark: SparkSession, dir: String): DataFrame =
    tokenBudgetSampleOn(Tables.documents(spark, dir))

  def tokenBudgetSampleOn(docs: DataFrame): DataFrame = {
    val t = docs.select(col("source"), col("doc_id"),
        size(tokens(col("text"))).cast("long").as("n_tokens"),
        hash60(col("text")).as("k"))
      .withColumn("grp", shiftright(col("k"), 60 - GrpBits))
    val offs = t.groupBy("source", "grp").agg(sum("n_tokens").as("c"))
      .withColumn("goff", coalesce(sum("c").over(
        Window.partitionBy("source").orderBy("grp")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("source", "grp", "goff")
    t.withColumn("run", sum("n_tokens").over(
        Window.partitionBy("source", "grp").orderBy(col("k"), col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .join(broadcast(offs), Seq("source", "grp"))
      .withColumn("cum_tokens", col("goff") + col("run"))
      .filter(col("cum_tokens") <= TokenBudget)
      .select("source", "doc_id", "n_tokens", "cum_tokens")
      .orderBy("source", "cum_tokens")
  }

  val tokenBudgetSampleSql: String =
    s"""WITH t AS (
       |  SELECT source, doc_id,
       |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       |         ${hash60Sql("text")} AS k
       |  FROM documents),
       |c AS (
       |  SELECT source, doc_id, n_tokens,
       |         CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY k, doc_id
       |                                  ROWS UNBOUNDED PRECEDING) AS BIGINT)
       |           AS cum_tokens
       |  FROM t)
       |SELECT source, doc_id, n_tokens, cum_tokens FROM c
       |WHERE cum_tokens <= $TokenBudget
       |ORDER BY source, cum_tokens""".stripMargin

  val registry: Map[String, ((SparkSession, String) => DataFrame, String)] = Map(
    "training_order" -> (trainingOrder _, trainingOrderSql),
    "length_batches" -> (lengthBatches _, lengthBatchesSql),
    "token_budget_sample" -> (tokenBudgetSample _, tokenBudgetSampleSql))
}
