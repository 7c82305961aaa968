package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.functions._

/** Probe-methodology audit (round 11): for every registry query, compare
  * the join count of the op's own optimized plan against the plan of its
  * `count()` shape (`df.select(lit(1))`). Where they differ, Catalyst is
  * ELIMINATING distinct-keyed left-join legs whose outputs a bare
  * count() never references — correct optimizer behavior, but any
  * TIMING probe that counts such a frame without a materialization
  * guard measures a smaller plan than it claims to. This tool found 15
  * affected shapes in round 11 (dedup_ensemble's lexical screen never
  * ran in its first probe row); `ScaleProbe.guard` is the fix — a
  * hash-inequality over every output column that no rule can fold
  * (`keep >= 0`-style guards constant-fold when the column's range is
  * provable, and the elimination still fires).
  *
  * Usage: `runMain graft.tools.PlanAudit [sfDir]` — plan compilation
  * only, nothing executes.
  */
object PlanAudit {

  private def joins(p: LogicalPlan): Int = p.collect { case j: Join => j }.length

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.constraintPropagation.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, dir)
        val full = joins(df.queryExecution.optimizedPlan)
        val counted = joins(df.select(lit(1)).queryExecution.optimizedPlan)
        if (counted < full)
          println(s"[audit] $name: joins full=$full counted=$counted eliminated=${full - counted}")
      } catch {
        case e: Throwable =>
          println(s"[audit] $name FAILED: ${String.valueOf(e.getMessage).take(120)}")
      }
    }
    spark.stop()
  }
}
