package graft

import graft.streaming.DriftMonitor
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import java.nio.file.Files

/** Streaming drift-gate laws: an in-distribution batch produces near-zero
  * TV terms, a shifted batch flags the bins that moved, an empty batch
  * alarms every baseline bin, and a replayed batch overwrites its own
  * alert partition (idempotent sink).
  */
class DriftMonitorSpec extends SparkSpec {

  private def mkBaseline(values: Seq[Double]) = {
    import spark.implicits._
    DriftMonitor.hist(values.toDF("v"), "v", width = 10.0, bins = 5)
  }

  test("in-distribution batch is quiet; shifted batch flags moved bins; empty batch alarms") {
    import spark.implicits._
    // baseline: uniform over bins 0..4
    val base = mkBaseline((0 until 50).map(i => (i % 5) * 10.0 + 5))
    // identical distribution → every tv_term is exactly 0
    val quiet = DriftMonitor.batchDeltas(
      (0 until 25).map(i => (i % 5) * 10.0 + 5).toDF("v"), base, "v", 10.0, 5)
      .collect()
    assert(quiet.length == 5 && quiet.forall(_.getAs[Double]("tv_term") == 0.0))

    // all mass in bin 0 → bin 0 gains 0.8, bins 1-4 lose 0.2 each
    val shifted = DriftMonitor.batchDeltas(
      Seq.fill(10)(5.0).toDF("v"), base, "v", 10.0, 5)
      .collect().map(r => r.getInt(0) -> r.getAs[Double]("tv_term")).toMap
    assert(shifted(0) == 0.8 && (1 to 4).forall(b => shifted(b) == 0.2))

    // empty batch → batch_share 0 everywhere, tv_term = base_share
    val empty = DriftMonitor.batchDeltas(
      Seq.empty[Double].toDF("v"), base, "v", 10.0, 5).collect()
    assert(empty.length == 5 && empty.forall(r =>
      r.getAs[Double]("tv_term") == r.getAs[Double]("base_share")))
  }

  test("streaming gate writes flagged per-batch alert partitions, idempotently") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val tmp = Files.createTempDirectory("drift").toString
    val base = mkBaseline((0 until 50).map(i => (i % 5) * 10.0 + 5))
    val in = MemoryStream[Double]
    val query = DriftMonitor.run(in.toDF().toDF("v"), base,
      s"$tmp/alerts", s"$tmp/chk", "v", 10.0, 5,
      threshold = 0.5, trigger = Trigger.AvailableNow())
    in.addData(Seq.fill(8)(5.0): _*)   // batch 0: all mass in bin 0
    query.processAllAvailable(); query.stop()

    val alerts = spark.read.parquet(s"$tmp/alerts")
    val flagged = alerts.filter(col("flagged")).select("bin").collect().map(_.getInt(0))
    assert(flagged.toSeq == Seq(0))    // only bin 0 moved by > 0.5
    assert(alerts.select(col("batch_id").cast("long")).distinct()
      .collect().map(_.getLong(0)).toSeq == Seq(0L))

    // replay the same batch id: partition is overwritten, not duplicated
    val n0 = alerts.count()
    val query2 = DriftMonitor.run(in.toDF().toDF("v"), base,
      s"$tmp/alerts", s"$tmp/chk2", "v", 10.0, 5,
      threshold = 0.5, trigger = Trigger.AvailableNow())
    query2.processAllAvailable(); query2.stop()
    assert(spark.read.parquet(s"$tmp/alerts").count() == n0)
  }
}
