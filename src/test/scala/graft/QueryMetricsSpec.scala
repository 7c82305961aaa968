package graft

import graft.api.QueryMetrics

/** Query-level latency metrics (the Prometheus-histogram analog). */
class QueryMetricsSpec extends SparkSpec {

  test("instrumented queries surface count/quantiles; failures count as errors") {
    import spark.implicits._
    val m = QueryMetrics.attach(spark)
    try {
      (1 to 3).foreach { _ =>
        QueryMetrics.time(m, "endpoint:symbols") {
          Seq("A", "B", "A").toDF("s").distinct().collect()
        }
      }
      intercept[RuntimeException] {
        QueryMetrics.time(m, "endpoint:boom") {
          throw new RuntimeException("boom")
        }
      }
      val snap = m.snapshot().map(s => s._1 -> s).toMap
      val ok = snap("endpoint:symbols")
      assert(ok._2 == 3)            // count
      assert(ok._3 == 0)            // errors
      assert(ok._4 > 0.0)           // p50 ms
      assert(ok._5 >= ok._4)        // p95 >= p50
      assert(ok._6 >= ok._5)        // max >= p95
      val bad = snap("endpoint:boom")
      assert(bad._2 == 0 && bad._3 == 1)
      // the listener path records un-instrumented actions by action name
      // (delivery is async — poll briefly)
      Seq(1, 2).toDF("x").count()
      val deadline = System.nanoTime() + 10e9.toLong
      while (!m.snapshot().exists(_._1.startsWith("action:"))
          && System.nanoTime() < deadline) Thread.sleep(50)
      assert(m.snapshot().exists(_._1.startsWith("action:")))
    } finally spark.listenerManager.unregister(m)
  }
}
