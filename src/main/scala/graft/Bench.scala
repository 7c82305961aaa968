package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line (also written to SPARK_GRAFT_BENCH_OUT, default
  * `bench_out.json`, so harnesses never have to scrape it out of sbt log
  * noise). Results are fully materialized via a noop write (count() alone
  * would let Catalyst prune most of the work).
  *
  * Timing protocol — two round-4 lessons baked in:
  *  - every query runs `Runs` times and reports the MEDIAN (single-run
  *    local-mode timings at sf0.1 drift by multiples run-to-run);
  *  - cached/localCheckpointed blocks are released between runs
  *    ([[Maintenance.releaseCachedBlocks]]) — without this, checkpointed
  *    shingle/sketch intermediates accumulate across the 50+ query sweep
  *    and squeeze executor memory for later queries (the mechanism behind
  *    round 4's phantom 21.6 s brand_profit vs its real ~2 s).
  *
  * Failure handling: a query that throws is recorded in the `failed` list
  * of the JSON line (and its stack printed to stderr) — never silently
  * timed as "fast". A transient `attempted to access non-existent
  * accumulator` trace in the DAGScheduler event loop can still appear in
  * local-mode back-to-back runs: per-query SQLMetrics are weakly
  * referenced on the driver, and a late task-end event (e.g. from a
  * broadcast-exchange job thread) that drains after its query's action
  * returned and its metrics were GC'd fails the accumulator lookup. The
  * scheduler logs and drops it; timings and results are unaffected (no
  * repo code creates accumulators — see AsofJoinExec's declared metrics).
  */
object Bench {

  private val Runs = 3

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Constraint inference wraps heavy HOF join keys (minhash/simhash
      // folds) in inferred isnotnull filters that get pushed into the
      // scan — recomputing the fold 2-3x per row. The inferred filters
      // save nothing on this workload.
      .config("spark.sql.constraintPropagation.enabled", "false")
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // JVM + codegen + parquet-footer warmup: run EVERY query once on the
    // tiniest SF so per-query timings measure the query, not first-use
    // class loading or C2 compilation of its codegen'd stages (cold first
    // runs are 4-10x the steady state).
    SparkEntry.queries.values.foreach { fn =>
      try fn(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
      Maintenance.releaseCachedBlocks(spark, blocking = true)
    }

    val failed = scala.collection.mutable.LinkedHashSet.empty[String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to Runs).map { _ =>
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          if (failed.add(name)) {
            System.err.println(s"[bench] $name FAILED: $e")
            e.printStackTrace()
          }
        }
        finally Maintenance.releaseCachedBlocks(spark, blocking = true)
        (System.nanoTime() - t0) / 1e9
      }
      name -> times.sorted.apply(Runs / 2)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val fs = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).sum
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$fs,"runs":$Runs,"sf":"$sfDir"}"""
    println(line)
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), line + "\n")
    catch { case e: Throwable => System.err.println(s"[bench] could not write $outPath: $e") }
    spark.stop()
  }
}
