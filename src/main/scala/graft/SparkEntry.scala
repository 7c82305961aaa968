package graft

import graft.analytics.{BpeTrainer, RetrievalAnalytics, SelectionAnalytics, StarAnalytics, StockAnalytics, TextAnalytics, TimeSeriesAnalytics, TrainingPrep}
import graft.dedup.{Dedup, Linkage}
import graft.multimodal.Multimodal
import graft.operators.{Debounce, Layout}
import graft.similarity.{IvfTrained, JlProject, KMeansExact, LabelEval, MmrSelect, PcaPower, PqAnn, Quantize, Similarity}
import graft.streaming.TrendingTokens
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in [[queries]] is a pure (SparkSession, sfDir) => DataFrame;
  * [[oracleSql]] carries the DuckDB-equivalent SQL the driver uses as the
  * correctness oracle at sf0.01. Column names and value math are kept
  * bit-identical between the two (see StockAnalytics/StarAnalytics
  * scaladoc for the determinism rules).
  */
object SparkEntry {

  private val registries: Seq[Map[String, ((SparkSession, String) => DataFrame, String)]] =
    Seq(StockAnalytics.registry, StarAnalytics.registry, TextAnalytics.registry,
      RetrievalAnalytics.registry, SelectionAnalytics.registry, BpeTrainer.registry,
      TimeSeriesAnalytics.registry, Dedup.registry, Linkage.registry, Similarity.registry,
      Quantize.registry, PcaPower.registry, KMeansExact.registry, IvfTrained.registry,
      JlProject.registry,
      Multimodal.registry,
      Layout.registry, Debounce.registry, TrainingPrep.registry, MmrSelect.registry, PqAnn.registry,
      TrendingTokens.registry, LabelEval.registry)

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. The movers
    * pipeline exercises the whole stack: tick view → bar aggregation →
    * windowed roll-up → pct-change → top-k.
    */
  def entry(spark: SparkSession): DataFrame =
    StockAnalytics.movers(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registries.flatMap(_.map { case (k, (fn, _)) => k -> fn }).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    registries.flatMap(_.map { case (k, (_, sql)) => k -> sql }).toMap
}
