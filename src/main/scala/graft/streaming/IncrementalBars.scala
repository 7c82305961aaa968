package graft.streaming

import graft.agg.BarAggregator
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** Incremental-batch bar derivation with a persisted watermark — the
  * reference aggregator service (services/aggregator/aggregator.py,
  * SURVEY.md §2.7 ST1–ST4, §3.2) re-expressed as a set-oriented Spark job.
  *
  * Semantics reproduced:
  *  - each run processes `[watermark, floor(now, minute))` — the
  *    in-progress minute is never emitted (aggregator.py:123-127);
  *  - the watermark bootstraps from `min(event_time)` when absent
  *    (aggregator.py:104-106) and advances only after a successful write
  *    (aggregator.py:135-136);
  *  - re-runs and late ticks fold in idempotently: the reference upserts on
  *    (symbol, bucket_start) (aggregator.py:41-51); with a parquet sink we
  *    get the same observable idempotence by recomputing every *touched
  *    date* in full and dynamically overwriting exactly those date
  *    partitions (SURVEY.md §2.1 S9 — Delta MERGE would be the managed
  *    alternative). One date partition = one atomic replace, so a crash
  *    between write and watermark save just re-runs the same window.
  *
  * Scale notes: the recompute is bounded by the watermark window's touched
  * dates, not table size; the bar write shuffles one row per
  * (symbol, minute) after map-side partial aggregation; partition pruning
  * on `bucket_date` keeps downstream readers off cold dates.
  */
object IncrementalBars {

  /** Result of one run: rows written and the new watermark (None = no-op). */
  final case class RunResult(barsWritten: Long, watermarkTo: Option[Timestamp])

  /** Read the persisted watermark: `completed_to` of the latest successful
    * run (the reference reads completed_at of the last 'complete' etl_runs
    * row, aggregator.py:94-103). Rows with status != 'complete' (the
    * error-audit rows below) never advance the watermark.
    *
    * The existence probe goes through the Hadoop FileSystem of the path
    * (not java.io.File), so the store works on HDFS/S3/ABFS deployments,
    * where a local-file probe would always report absent and silently
    * rebootstrap every run from min(event_time).
    */
  def readWatermark(spark: SparkSession, etlRunsPath: String): Option[Timestamp] = {
    val path = new org.apache.hadoop.fs.Path(etlRunsPath)
    val fs   = path.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(path) || fs.listStatus(path).isEmpty) None
    else {
      val runs = spark.read.parquet(etlRunsPath)
      // legacy stores (pre-status schema) recorded only successful runs —
      // treat every row as complete rather than failing the read or
      // silently regressing the watermark
      val complete =
        if (runs.columns.contains("status")) runs.filter(col("status") === "complete")
        else runs
      complete
        .agg(max(col("completed_to")).as("wm"))
        .collect()(0).getAs[Timestamp]("wm") match {
          case null => None
          case t    => Some(t)
        }
    }
  }

  /** One aggregation cycle. `now` is a parameter (not the wall clock) for
    * deterministic tests, mirroring the reference's `to_time` truncation
    * (aggregator.py:124, F17).
    */
  def runOnce(
      spark: SparkSession,
      rawTicks: DataFrame,
      barsPath: String,
      etlRunsPath: String,
      now: Timestamp): RunResult = {

    // Normalize TIMESTAMP_NTZ tick frames (what the testdata parquet
    // reads as) to LTZ ONCE at entry — exact under the pinned UTC
    // session, no-op for LTZ input. Everything downstream (driver-side
    // Timestamp gets, comparisons against Timestamp literals, to_date
    // partition values) assumes one timestamp type.
    val ticks = rawTicks.withColumn("event_time", col("event_time").cast("timestamp"))
    val toTime = Timestamp.from(now.toInstant.truncatedTo(java.time.temporal.ChronoUnit.MINUTES))
    val fromTime = readWatermark(spark, etlRunsPath).orElse {
      ticks.agg(min(col("event_time"))).collect()(0).getTimestamp(0) match {
        case null => None
        case t    => Some(t)
      }
    }
    if (fromTime.isEmpty || !fromTime.get.before(toTime)) return RunResult(0, None)

    // Recompute every date the incremental window touches IN FULL, so the
    // dynamic partition overwrite is a faithful upsert (late ticks for an
    // already-written minute of a touched date fold in; untouched dates
    // are never rewritten).
    val windowTicks = ticks.filter(
      col("event_time") >= lit(fromTime.get) && col("event_time") < lit(toTime))
    val touched = windowTicks.select(to_date(col("event_time")).as("d")).distinct()
    val dayTicks = ticks
      .join(broadcast(touched), to_date(col("event_time")) === col("d"))
      .filter(col("event_time") < lit(toTime))
      .drop("d")

    val prevOverwriteMode = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    val n =
      try {
        // persist: the frame is consumed twice (row count for the audit
        // row + the partition write) and must not recompute the
        // aggregation. Built INSIDE the audited region — persist()
        // plans (and with a local source, optimize-time-evaluates) the
        // derivation eagerly, so even a planning failure must produce an
        // error-audit row.
        val bars = BarAggregator.bars1m(dayTicks)
          .withColumn("bucket_date", to_date(col("bucket_start")))
          .persist()
        try {
          val c = bars.count()
          bars.write
            .mode(SaveMode.Overwrite)
            .partitionBy("bucket_date")
            .parquet(barsPath)
          c
        } finally bars.unpersist()
      } catch {
        case e: Throwable =>
          // Failed-run audit (aggregator.py:148-153 records status='error'
          // and rolls back; etl_runs DDL init.sql:41-48): append an error
          // row — with a NULL completed_to, so it can never advance the
          // watermark — and rethrow. The next cycle re-runs the same
          // window; the partition overwrite makes the retry idempotent.
          appendRun(spark, etlRunsPath, completedTo = None, windowTo = toTime,
            rows = 0, status = "error", error = Some(String.valueOf(e.getMessage)))
          throw e
      } finally {
        prevOverwriteMode match {
          case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
          case None    => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
        }
      }

    // Advance the watermark only after the bar write succeeded
    // (aggregator.py:135-136: bars + watermark in one transaction).
    appendRun(spark, etlRunsPath, completedTo = Some(toTime), windowTo = toTime,
      rows = n, status = "complete", error = None)

    RunResult(n, Some(toTime))
  }

  /** One etl_runs audit row. `completed_to` is the watermark column (NULL
    * on error rows); `window_to` records the attempted window bound either
    * way, mirroring the reference's run log (init.sql:41-48).
    */
  private def appendRun(
      spark: SparkSession,
      etlRunsPath: String,
      completedTo: Option[Timestamp],
      windowTo: Timestamp,
      rows: Long,
      status: String,
      error: Option[String]): Unit = {
    import spark.implicits._
    Seq((completedTo, windowTo, rows, new Timestamp(System.currentTimeMillis()), status, error))
      .toDF("completed_to", "window_to", "rows_upserted", "completed_at", "status",
        "error_message")
      .write.mode(SaveMode.Append).parquet(etlRunsPath)
  }
}
