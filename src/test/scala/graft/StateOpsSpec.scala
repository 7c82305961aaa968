package graft

import graft.streaming.StateOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import java.sql.Timestamp

/** transformWithState quiescence laws: a symbol that keeps ticking never
  * alerts (the timer re-arms ahead of the watermark), a symbol that goes
  * silent alerts exactly once with the correct last-seen time and span,
  * and a symbol that resumes after alerting re-arms for the next gap.
  */
class StateOpsSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("silent symbol alerts exactly once; active symbol stays quiet; resume re-arms") {
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProvider = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(String, Timestamp)]
    val ticks = in.toDF().toDF("symbol", "event_time")

    val query = StateOps.quiescenceAlerts(ticks, gapMs = 60000L, lateness = "10 seconds")
      .writeStream.format("memory").queryName("quiescence").start()
    try {
      // AAPL ticks at 10:00:00 then goes silent; MSFT keeps ticking
      in.addData(("AAPL", ts("2024-01-01 10:00:00")), ("MSFT", ts("2024-01-01 10:00:00")))
      query.processAllAvailable()
      in.addData(("MSFT", ts("2024-01-01 10:00:40")))
      query.processAllAvailable()
      // advance the watermark past AAPL's 10:01:00 deadline (wm = max - 10 s)
      in.addData(("MSFT", ts("2024-01-01 10:01:40")))
      query.processAllAvailable()
      in.addData(("MSFT", ts("2024-01-01 10:02:00")))
      query.processAllAvailable()

      val alerts = spark.table("quiescence").collect()
        .map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2)))
      assert(alerts.count(_._1 == "AAPL") == 1, s"got: ${alerts.mkString(",")}")
      val a = alerts.find(_._1 == "AAPL").get
      assert(a._2 == ts("2024-01-01 10:00:00") && a._3 == 60000L)
      // MSFT's latest deadline (10:02:40 > wm 10:01:50) has not passed
      assert(!alerts.exists(_._1 == "MSFT"))

      // AAPL resumes, then goes silent again past a new deadline → second alert
      in.addData(("AAPL", ts("2024-01-01 10:02:10")))
      query.processAllAvailable()
      in.addData(("MSFT", ts("2024-01-01 10:03:30")))
      query.processAllAvailable()
      in.addData(("MSFT", ts("2024-01-01 10:03:40")))
      query.processAllAvailable()
      val alerts2 = spark.table("quiescence").collect()
        .map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2)))
        .filter(_._1 == "AAPL")
      assert(alerts2.length == 2, s"got: ${alerts2.mkString(",")}")
      assert(alerts2.map(_._2).contains(ts("2024-01-01 10:02:10")))
    } finally {
      query.stop()
      prevProvider match {
        case Some(p) => spark.conf.set(providerKey, p)
        case None    => spark.conf.unset(providerKey)
      }
    }
  }
}
