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

  test("prometheusText renders the 0.0.4 exposition: summary + max gauge + error counter") {
    val m = QueryMetrics.attach(spark)
    try {
      m.record("endpoint:movers", 2000000L)  // 2 ms
      m.record("endpoint:movers", 4000000L)  // 4 ms
      m.recordError("endpoint:movers")
      m.record("""weird"label\n""", 1000000L)
      val text = m.prometheusText()
      assert(text.contains("# TYPE graft_query_duration_seconds summary"))
      assert(text.contains("""graft_query_duration_seconds{query="endpoint:movers",quantile="0.5"}"""))
      assert(text.contains("""graft_query_duration_seconds{query="endpoint:movers",quantile="0.95"}"""))
      assert(text.contains("""graft_query_duration_seconds_count{query="endpoint:movers"} 2"""))
      assert(text.contains("""graft_query_duration_seconds_sum{query="endpoint:movers"} 0.006"""))
      assert(text.contains("""graft_query_errors_total{query="endpoint:movers"} 1"""))
      assert(text.contains("# TYPE graft_query_duration_seconds_max gauge"))
      assert(text.contains("""graft_query_duration_seconds_max{query="endpoint:movers"} 0.004"""))
      // label values escape quotes and backslashes per the exposition format
      assert(text.contains("""query="weird\"label\\n""""))
      // every non-comment line is `name{labels} value` with a parseable value
      text.linesIterator.filterNot(l => l.startsWith("#") || l.isEmpty).foreach { l =>
        val v = l.substring(l.lastIndexOf(' ') + 1)
        assert(v.toDouble >= 0.0, s"unparseable sample line: $l")
      }
    } finally spark.listenerManager.unregister(m)
  }
}
