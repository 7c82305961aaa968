package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc probe main: run a comma-separated list of registry queries
  * (args(0)) against a given SF dir (args(1), default sf0.1) and report
  * wall time or the thrown exception per query. Mirrors Bench's session
  * config so failures reproduce identically.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.map(_.split(",").toSeq).getOrElse(Seq.empty)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.constraintPropagation.enabled", "false")
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        println(f"[probe] $name OK ${(System.nanoTime() - t0) / 1e9}%.2f s")
      } catch {
        case e: Throwable =>
          println(s"[probe] $name FAILED: $e")
          e.printStackTrace()
      } finally graft.Maintenance.releaseCachedBlocks(spark, blocking = true)
    }
    spark.stop()
  }
}
