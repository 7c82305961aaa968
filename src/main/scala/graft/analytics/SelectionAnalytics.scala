package graft.analytics

import graft.Tables
import graft.functions.TextFeatures._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-selection operators over the `documents` table: a bigram LM
  * quality score (one model order up from [[TextAnalytics.lmQuality]],
  * the same train-cheap-LM-on-the-corpus-then-score-every-doc pipeline
  * CCNet runs with KenLM) and DSIR-style importance weights (Xie et al.,
  * "Data Selection for Language Models via Importance Resampling":
  * hashed n-gram bag-of-features, per-feature log-likelihood ratio
  * between a target-domain distribution and the raw corpus, per-doc sum
  * = the resampling log-weight).
  *
  * Scale notes (100 TB): everything is explode → keyed hash aggregate.
  * The bigram vocabulary can outgrow a broadcast at full scale — the
  * score join is written as a plain keyed join so Spark picks broadcast
  * at test SFs and shuffle-hash beyond (the probe side is the token
  * stream either way, never a pairwise frame). The DSIR feature space is
  * hashed into a FIXED [[SelectionAnalytics.DsirBuckets]]-bucket table,
  * so the λ (log-ratio) table is constant-size and broadcast at any
  * corpus size — that bounded-model property is the reason DSIR hashes
  * features in the first place.
  *
  * Determinism (shared with every scored family here): per-doc sums of
  * IEEE doubles are folded in SORTED order (`sort_array` + `aggregate` ↔
  * DuckDB `list_sort` + `list_reduce`); ln is applied to integer counts
  * in identical operation order in both engines.
  */
object SelectionAnalytics {

  /** Hashed feature-space size (DSIR uses 10⁴; power of two here). */
  private val DsirBuckets = 8192L

  /** Target-domain stand-in: same `doc_id % 10 == 0` subset the
    * decontamination family treats as the held-out benchmark — "select
    * raw docs that look like the target" is exactly DSIR's setting.
    */
  private val TargetMod = 10

  // ---- lm_bigram: corpus bigram conditional log-probability ------------
  /** Each document's mean conditional token log-probability under the
    * corpus' own MLE bigram model: for every adjacent pair (w₁ w₂),
    * ln c(w₁w₂) − ln c(w₁·) where c(w₁·) counts w₁'s occurrences as a
    * bigram history. Scoring the training corpus with its own model
    * makes every doc bigram present (count ≥ 1), so the MLE is total —
    * no smoothing term to reconcile cross-engine.
    */
  def lmBigram(spark: SparkSession, dir: String): DataFrame =
    lmBigramOn(Tables.documents(spark, dir))

  private[graft] def lmBigramOn(docs: DataFrame): DataFrame = {
    // Materialized once (lazily): the bigram stream feeds the two count
    // tables AND the score probe (house pattern, see Dedup.hashedSets).
    val bg = docs
      .select(col("doc_id"), tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(t) - 1), i -> struct(element_at(t, i) AS w1, concat(element_at(t, i), ' ', element_at(t, i + 1)) AS g))"))
        .as("p"))
      .select(col("doc_id"), col("p.w1").as("w1"), col("p.g").as("g"))
      .localCheckpoint(eager = false)
    val bc = bg.groupBy("g").agg(count(lit(1)).as("bcnt"))
    val hc = bg.groupBy("w1").agg(count(lit(1)).as("hcnt"))
    bg.join(bc, "g")
      .join(hc, "w1")
      .select(col("doc_id"),
        (log(col("bcnt").cast("double")) - log(col("hcnt").cast("double"))).as("lp"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        aggregate(sort_array(collect_list(col("lp"))), lit(0.0), _ + _).as("_s"))
      .select(col("doc_id"), col("n_bigrams"),
        round(col("_s") / col("n_bigrams"), 4).as("avg_logprob"))
      .orderBy("doc_id")
  }

  val lmBigramSql: String =
    """WITH t AS (
      |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
      |  WHERE len(string_split(text, ' ')) >= 2),
      |bg AS (
      |  SELECT doc_id,
      |         unnest(list_transform(generate_series(1, len(toks) - 1),
      |                i -> {w1: toks[i], g: toks[i] || ' ' || toks[i+1]}),
      |                recursive := true)
      |  FROM t),
      |bc AS (SELECT g, count(*) AS bcnt FROM bg GROUP BY g),
      |hc AS (SELECT w1, count(*) AS hcnt FROM bg GROUP BY w1),
      |lp AS (
      |  SELECT bg.doc_id,
      |         ln(CAST(bcnt AS DOUBLE)) - ln(CAST(hcnt AS DOUBLE)) AS lp
      |  FROM bg JOIN bc USING (g) JOIN hc USING (w1))
      |SELECT doc_id, count(*) AS n_bigrams,
      |       round(list_reduce(list_sort(list(lp)), (a, b) -> a + b)
      |             / count(*), 4) AS avg_logprob
      |FROM lp GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---- dsir_weights: hashed-ngram importance-resampling log-weights ----
  /** Per-document DSIR log importance weight: features are unigrams and
    * bigrams hashed into [[DsirBuckets]] buckets (cross-engine
    * [[graft.functions.TextFeatures.hash60]] mod buckets); the per-bucket
    * log-likelihood ratio λ(f) = ln p̂_target(f) − ln p̂_raw(f) uses
    * add-one smoothing over the bucket space; a doc's log-weight is the
    * sorted-fold sum of λ over its feature OCCURRENCES (bag semantics,
    * as in the paper). Positive weights mark docs that look more like
    * the target domain than the raw corpus — resampling by these weights
    * is the selection step.
    */
  def dsirWeights(spark: SparkSession, dir: String): DataFrame =
    dsirWeightsOn(Tables.documents(spark, dir))

  private[graft] def dsirWeightsOn(docs: DataFrame): DataFrame = {
    // Unigram + bigram occurrence stream, hashed to buckets.
    // Materialized once (lazily): it feeds raw counts, target counts,
    // and the score probe.
    val feats = docs
      .select(col("doc_id"), tokens(col("text")).as("t"))
      .select(col("doc_id"), explode(concat(col("t"), expr(
        "transform(sequence(1, size(t) - 1), i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))")))
        .as("gram"))
      .select(col("doc_id"), (hash60(col("gram")) % DsirBuckets).as("f"))
      .localCheckpoint(eager = false)
    val raw = feats.groupBy("f").agg(count(lit(1)).as("cr"))
    val tgt = feats.filter(col("doc_id") % TargetMod === 0)
      .groupBy("f").agg(count(lit(1)).as("ct"))
    val totals = raw.agg(sum(col("cr")).as("tr"))
      .crossJoin(tgt.agg(sum(col("ct")).as("tt")))
    // λ per bucket — constant-size table (≤ DsirBuckets rows), broadcast.
    val lam = raw.join(tgt, Seq("f"), "left")
      .select(col("f"), col("cr"), coalesce(col("ct"), lit(0L)).as("ct"))
      .crossJoin(broadcast(totals))
      .select(col("f"),
        ((log(col("ct").cast("double") + lit(1.0))
          - log(col("tt").cast("double") + lit(DsirBuckets.toDouble)))
          - (log(col("cr").cast("double") + lit(1.0))
            - log(col("tr").cast("double") + lit(DsirBuckets.toDouble)))).as("lam"))
    feats.join(broadcast(lam), "f")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_feats"),
        aggregate(sort_array(collect_list(col("lam"))), lit(0.0), _ + _).as("_s"))
      .select(col("doc_id"), col("n_feats"), round(col("_s"), 4).as("log_weight"))
      .orderBy("doc_id")
  }

  val dsirWeightsSql: String =
    s"""WITH t AS (
       |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |feats AS (
       |  SELECT doc_id,
       |         ${hash60Sql("gram")} % $DsirBuckets AS f
       |  FROM (SELECT doc_id, unnest(toks ||
       |          list_transform(generate_series(1, len(toks) - 1),
       |            i -> toks[i] || ' ' || toks[i+1])) AS gram FROM t)),
       |raw AS (SELECT f, count(*) AS cr FROM feats GROUP BY f),
       |tgt AS (SELECT f, count(*) AS ct FROM feats
       |        WHERE doc_id % $TargetMod = 0 GROUP BY f),
       |tot AS (SELECT (SELECT CAST(sum(cr) AS BIGINT) FROM raw) AS tr,
       |               (SELECT CAST(sum(ct) AS BIGINT) FROM tgt) AS tt),
       |lam AS (
       |  SELECT raw.f,
       |         (ln(coalesce(ct, 0)::DOUBLE + 1.0::DOUBLE)
       |            - ln(tt::DOUBLE + $DsirBuckets.0::DOUBLE))
       |         - (ln(cr::DOUBLE + 1.0::DOUBLE)
       |            - ln(tr::DOUBLE + $DsirBuckets.0::DOUBLE)) AS lam
       |  FROM raw LEFT JOIN tgt USING (f) CROSS JOIN tot)
       |SELECT doc_id, count(*) AS n_feats,
       |       round(list_reduce(list_sort(list(lam)), (a, b) -> a + b), 4)
       |         AS log_weight
       |FROM feats JOIN lam USING (f)
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---- nb_classify: Naive Bayes source classifier, confusion matrix ----

  /** Train share of the hash split, in percent (the split_leakage split). */
  private val NbTrainPct = 90

  /** Multinomial Naive Bayes with add-one smoothing, trained on the
    * deterministic hash60(doc_id) train split and evaluated on the val
    * split — the model-based domain/quality classification step of a
    * curation pipeline (the fastText-classifier role in CCNet/LLaMA-style
    * filtering), self-contained on the corpus' own `source` labels.
    * Output is the confusion matrix (true_source, pred_source, n_docs):
    * the artifact that says whether source is predictable from text at
    * all, and which sources alias.
    *
    * Per-class token log-likelihoods are `ln((c(class,tok)+1)/(c(class)+V))`
    * — ln over ratios of exact integer counts, identical operation order
    * in both engines; per-(doc, class) sums fold in SORTED order (the
    * lm_quality contract); the argmax breaks ties (score desc, class asc).
    *
    * Scale: training is two keyed counts over the exploded train stream.
    * Scoring fans the val token stream out by the C candidate classes —
    * C is the MODEL size (constant, 20 here), not a data term — and
    * probes the (class, token) count table with a plain keyed join
    * (broadcast at test SF, shuffle-hash when class×vocab outgrows it —
    * the lm_bigram fallback path). The argmax window partitions by doc
    * over exactly C rows; the confusion aggregate is C² cells.
    */
  def nbClassify(spark: SparkSession, dir: String): DataFrame =
    nbClassifyOn(Tables.documents(spark, dir))

  private[graft] def nbClassifyOn(docs: DataFrame): DataFrame = {
    val tagged = docs
      .select(col("doc_id"), col("source"), col("text"),
        (pmod(hash60(col("doc_id").cast("string")), lit(100)) < NbTrainPct)
          .as("is_train"))
      .localCheckpoint(eager = false)
    val trToks = tagged.filter(col("is_train"))
      .select(col("source"), explode(tokens(col("text"))).as("tok"))
      .localCheckpoint(eager = false)
    val ct = trToks.groupBy("source", "tok").agg(count(lit(1)).as("tn"))
    val cc = trToks.groupBy("source").agg(count(lit(1)).as("cn"))
    val v  = trToks.agg(countDistinct(col("tok")).as("v"))
    val pr = tagged.filter(col("is_train")).groupBy("source")
      .agg(count(lit(1)).as("pd"))
    val tt = tagged.filter(col("is_train")).agg(count(lit(1)).as("td"))
    val ll = tagged.filter(!col("is_train"))
      .select(col("doc_id"), col("source").as("true_source"),
        explode(tokens(col("text"))).as("tok"))
      .crossJoin(broadcast(cc.select(col("source").as("cand"), col("cn"))))
      .join(ct.select(col("source").as("cand"), col("tok"), col("tn")),
        Seq("cand", "tok"), "left")
      .crossJoin(broadcast(v))
      .select(col("doc_id"), col("true_source"), col("cand"),
        log((coalesce(col("tn"), lit(0L)) + lit(1L)).cast("double")
          / (col("cn") + col("v")).cast("double")).as("ll"))
    val scored = ll
      .groupBy("doc_id", "true_source", "cand")
      .agg(aggregate(sort_array(collect_list(col("ll"))), lit(0.0), _ + _).as("s"))
      .join(broadcast(pr.select(col("source").as("cand"), col("pd"))), "cand")
      .crossJoin(broadcast(tt))
      .select(col("doc_id"), col("true_source"), col("cand"),
        (col("s") + log(col("pd").cast("double") / col("td").cast("double")))
          .as("score"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("cand").asc)
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .groupBy(col("true_source"), col("cand"))
      .agg(count(lit(1)).as("n_docs"))
      .select(col("true_source"), col("cand").as("pred_source"), col("n_docs"))
      .orderBy("true_source", "pred_source")
  }

  val nbClassifySql: String =
    s"""WITH tagged AS (
       |  SELECT doc_id, source, text,
       |         ${hash60Sql("doc_id::VARCHAR")} % 100 < $NbTrainPct AS is_train
       |  FROM documents),
       |tr AS (
       |  SELECT source, unnest(string_split(text, ' ')) AS tok
       |  FROM tagged WHERE is_train),
       |ct AS (SELECT source, tok, count(*) AS tn FROM tr GROUP BY 1, 2),
       |cc AS (SELECT source, count(*) AS cn FROM tr GROUP BY 1),
       |v  AS (SELECT count(DISTINCT tok) AS v FROM tr),
       |pr AS (SELECT source, count(*) AS pd FROM tagged WHERE is_train GROUP BY 1),
       |tt AS (SELECT count(*) AS td FROM tagged WHERE is_train),
       |vt AS (
       |  SELECT doc_id, source AS true_source, unnest(string_split(text, ' ')) AS tok
       |  FROM tagged WHERE NOT is_train),
       |ll AS (
       |  SELECT vt.doc_id, vt.true_source, cc.source AS cand,
       |         ln((coalesce(ct.tn, 0) + 1)::DOUBLE
       |            / ((cc.cn + (SELECT v FROM v))::DOUBLE)) AS ll
       |  FROM vt CROSS JOIN cc
       |  LEFT JOIN ct ON ct.source = cc.source AND ct.tok = vt.tok),
       |sc AS (
       |  SELECT doc_id, true_source, cand,
       |         list_reduce(list_sort(list(ll)), (a, b) -> a + b)
       |           + ln(pr.pd::DOUBLE / ((SELECT td FROM tt))::DOUBLE) AS score
       |  FROM ll JOIN pr ON pr.source = ll.cand
       |  GROUP BY doc_id, true_source, cand, pr.pd),
       |pred AS (
       |  SELECT doc_id, true_source, cand,
       |         row_number() OVER (
       |           PARTITION BY doc_id ORDER BY score DESC, cand ASC) AS rn
       |  FROM sc)
       |SELECT true_source, cand AS pred_source, count(*) AS n_docs
       |FROM pred WHERE rn = 1
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---- pareto_frontier: quality-vs-cost skyline over documents ---------
  /** The documents on the Pareto frontier of (quality ↑, cost ↓) — the
    * skyline operator (Börzsönyi, Kossmann, Stocker, ICDE '01) on the
    * curation plane a budgeted selection run optimizes over: quality =
    * integer-scaled stopword ratio (⌊10⁶·stop/tok⌋, the same function-word
    * signal the text-stats family uses, exact integer math so both engines
    * agree bit-for-bit), cost = `n_chars`. A doc survives iff no other doc
    * is no-worse on both axes and strictly better on one; equal-(cost,
    * quality) docs coexist (neither dominates).
    *
    * Scale (100 TB): NOT the quadratic NOT-EXISTS shape. Three steps, all
    * bounded: (1) per-cost max quality — a map-side partial aggregate
    * keyed on `n_chars`; (2) a strict-prefix running max over the GROUPED
    * frame, whose row count is bounded by the VALUE DOMAIN |distinct
    * n_chars| (≲ max doc length), not the corpus — the one unpartitioned
    * window in the plan runs over that bounded frame only; (3) a
    * broadcast join of the per-cost thresholds back onto the corpus
    * stream: doc on frontier ⟺ q = gq(cost) ∧ gq(cost) > prefix-max of
    * strictly cheaper costs. The spec pins step-composition ≡ brute-force
    * dominance on a fixture with ties on both axes.
    */
  private[graft] val ParetoScale = 1000000L

  def paretoFrontier(spark: SparkSession, dir: String): DataFrame =
    paretoFrontierOn(Tables.documents(spark, dir))

  /** (doc_id, n_chars, q) scored stream shared by entry + brute twin. */
  private[graft] def paretoScored(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("n_chars"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("n_chars"),
        expr(s"CAST($ParetoScale * size(filter(toks, t -> t = 'the' OR t = 'a')) AS BIGINT)"
          + " div size(toks)").as("q"))

  private[graft] def paretoFrontierOn(docs: DataFrame): DataFrame = {
    val f = paretoScored(docs)
    val grp = f.groupBy("n_chars").agg(max("q").as("gq"))
    val w = Window.orderBy("n_chars").rowsBetween(Window.unboundedPreceding, -1)
    val pref = grp.withColumn("pm", max("gq").over(w))
    f.join(broadcast(pref), "n_chars")
      .filter(col("q") === col("gq") && (col("pm").isNull || col("q") > col("pm")))
      .select(col("doc_id"), col("n_chars"), col("q"))
      .orderBy("n_chars", "doc_id")
  }

  /** Quadratic dominance twin for the spec law. Test-scale only. */
  private[graft] def bruteFrontierOn(docs: DataFrame): DataFrame = {
    val f = paretoScored(docs).localCheckpoint(eager = false)
    f.as("x").join(f.as("y"),
        col("y.n_chars") <= col("x.n_chars") && col("y.q") >= col("x.q")
          && (col("y.n_chars") < col("x.n_chars") || col("y.q") > col("x.q")),
        "left_anti")
      .select(col("doc_id"), col("n_chars"), col("q"))
      .orderBy("n_chars", "doc_id")
  }

  val paretoFrontierSql: String =
    s"""WITH f AS (
       |  SELECT doc_id, n_chars,
       |         CAST($ParetoScale * len(list_filter(string_split(text, ' '),
       |                                 t -> t = 'the' OR t = 'a')) AS BIGINT)
       |         // len(string_split(text, ' ')) AS q
       |  FROM documents),
       |g AS (SELECT n_chars, max(q) AS gq FROM f GROUP BY 1),
       |p AS (
       |  SELECT n_chars, gq,
       |         max(gq) OVER (ORDER BY n_chars
       |                       ROWS BETWEEN UNBOUNDED PRECEDING
       |                                AND 1 PRECEDING) AS pm
       |  FROM g)
       |SELECT f.doc_id, f.n_chars, f.q
       |FROM f JOIN p USING (n_chars)
       |WHERE f.q = p.gq AND (p.pm IS NULL OR f.q > p.pm)
       |ORDER BY f.n_chars, f.doc_id""".stripMargin

  val registry: Map[String, ((SparkSession, String) => DataFrame, String)] = Map(
    "lm_bigram"       -> (lmBigram _, lmBigramSql),
    "dsir_weights"    -> (dsirWeights _, dsirWeightsSql),
    "nb_classify"     -> (nbClassify _, nbClassifySql),
    "pareto_frontier" -> (paretoFrontier _, paretoFrontierSql),
  )
}
