package graft

import org.apache.spark.sql.SparkSession

/** Physical-plan dump for any registered query — the `.explain("formatted")`
  * iteration loop the build rules demand, as a one-liner:
  *
  *   sbt "runMain graft.PlanAudit [nameSubstring] [sfDir]"
  *
  * Prints the formatted plan of every SparkEntry query whose name contains
  * the substring (default: all), using the same session config as
  * Verify/Bench so what you audit is what the driver runs.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sel   = args.headOption.getOrElse("")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.constraintPropagation.enabled", "false")
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(_._1.contains(sel))
      .foreach { case (name, fn) =>
        println(s"\n========== $name ==========")
        try fn(spark, sfDir).explain("formatted")
        catch { case e: Throwable => println(s"[plan-audit] $name failed: $e") }
      }
    spark.stop()
  }
}
