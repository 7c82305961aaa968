package graft

import graft.analytics.{StarAnalytics, TextAnalytics, TimeSeriesAnalytics}
import org.apache.spark.sql.functions._

/** Laws for the round-6 operators: funnel ordering, retention cohort
  * accounting, rolling z-score anomalies, unigram LM quality, span-level
  * duplication — each checked on hand-built edges plus the sf0.001
  * testdata (the cross-engine hash gate runs via the driver's oracle).
  */
class Round6OpsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  // ---- events_funnel ----------------------------------------------------

  test("funnel: stage counts are monotonically non-increasing") {
    val rows = StarAnalytics.eventsFunnel(spark, dir).collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(1, 2, 3))
    val users = rows.map(_.getLong(2))
    assert(users(0) >= users(1) && users(1) >= users(2))
    assert(users(0) > 0)
  }

  test("funnel: stages must fire strictly in order") {
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(m: Int) = new java.sql.Timestamp(t0.getTime + m * 60000L)
    // u1 completes in order; u2 purchases BEFORE clicking (stage 3 must
    // not count it); u3 clicks before viewing (stages 2-3 must not count)
    val ev = Seq(
      (1L, ts(0), 1L, "view", 1.0, "{}"), (2L, ts(1), 1L, "click", 1.0, "{}"),
      (3L, ts(2), 1L, "purchase", 1.0, "{}"),
      (4L, ts(0), 2L, "view", 1.0, "{}"), (5L, ts(1), 2L, "purchase", 1.0, "{}"),
      (6L, ts(2), 2L, "click", 1.0, "{}"),
      (7L, ts(1), 3L, "click", 1.0, "{}"), (8L, ts(2), 3L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val tmp = java.nio.file.Files.createTempDirectory("funnel").toString
    ev.write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = StarAnalytics.eventsFunnel(spark, tmp).collect()
    assert(out.map(r => r.getString(1) -> r.getLong(2)).toMap ==
      Map("view" -> 3L, "click_after_view" -> 2L, "purchase_after_click" -> 1L))
  }

  // ---- events_retention --------------------------------------------------

  test("retention: offset-0 cell covers every cohort member; offsets >= 0") {
    val ret = StarAnalytics.eventsRetention(spark, dir).collect()
    assert(ret.nonEmpty)
    assert(ret.forall(_.getInt(1) >= 0))
    // sum over offset-0 cells == total distinct users (everyone is active
    // in their own first week by construction)
    val zero = ret.filter(_.getInt(1) == 0).map(_.getLong(2)).sum
    val users = Tables.events(spark, dir).select("user_id").distinct().count()
    assert(zero == users)
    // no (cohort, offset) cell can exceed its cohort's size
    val cohortSize = ret.filter(_.getInt(1) == 0)
      .map(r => r.get(0) -> r.getLong(2)).toMap
    ret.foreach(r => assert(r.getLong(2) <= cohortSize(r.get(0))))
  }

  // ---- ticks_anomaly ----------------------------------------------------

  test("anomaly: flags a planted spike and only scores warmed-up rows") {
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(m: Int) = new java.sql.Timestamp(t0.getTime + m * 60000L)
    // 30 calm ticks around 100 then one 10x spike
    val ev = (0 until 30).map(i =>
      (i.toLong, ts(i), 7L, "view", 100.0 + (i % 5) * 0.5, "{}")) :+
      (30L, ts(30), 7L, "view", 1000.0, "{}")
    val tmp = java.nio.file.Files.createTempDirectory("anom").toString
    ev.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = TimeSeriesAnalytics.ticksAnomaly(spark, tmp).collect()
    assert(out.map(_.getLong(0)).toSet == Set(30L))
    assert(math.abs(out.head.getDouble(4)) > 3.0)
  }

  test("anomaly: sf data rows all satisfy |z| > 3 and frame warmup") {
    val out = TimeSeriesAnalytics.ticksAnomaly(spark, dir).collect()
    out.foreach(r => assert(math.abs(r.getDouble(4)) > 3.0))
  }

  // ---- lm_quality ---------------------------------------------------------

  test("lm_quality: rare-token docs score lower; bounds hold") {
    import spark.implicits._
    val docs = Seq(
      (1L, "common common common common", "en", "web", 27L),
      (2L, "common common common rare", "en", "web", 25L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("lmq").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = TextAnalytics.lmQuality(spark, tmp).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out(1L)._1 == 4 && out(2L)._1 == 4)
    // doc 1 is all max-frequency tokens => strictly higher mean logprob
    assert(out(1L)._2 > out(2L)._2)
    // logprobs are <= 0 (c <= total always)
    assert(out.values.forall(_._2 <= 0.0))
    // hand-check doc 1: every token has c=7, total=8 -> ln(7/8)
    assert(math.abs(out(1L)._2 - math.log(7.0 / 8.0)) < 1e-3)
  }

  // ---- event_pivot --------------------------------------------------------

  test("pivot: cells reconcile with the grouped aggregation") {
    import spark.implicits._
    val piv = StarAnalytics.eventPivot(spark, dir)
    // cross-foot: sum over all pivot cells == total value sum (via the
    // same exact-decimal path)
    val cellTotal = piv.select(
      (coalesce(col("click"), lit(0.0)) + coalesce(col("error"), lit(0.0))
        + coalesce(col("purchase"), lit(0.0)) + coalesce(col("signup"), lit(0.0))
        + coalesce(col("view"), lit(0.0))).as("s"))
      .agg(sum("s")).as[Double].head()
    val total = Tables.events(spark, dir)
      .agg(sum(col("value").cast("decimal(12,4)")).cast("double"))
      .as[Double].head()
    assert(math.abs(cellTotal - total) < 1e-6)
    assert(piv.columns.toSeq ==
      Seq("day", "click", "error", "purchase", "signup", "view"))
  }

  // ---- ticks_range_vwap ----------------------------------------------------

  test("range vwap: 300s boundary is inclusive, 301s is out of frame") {
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 12:00:00")
    def at(s: Int) = new java.sql.Timestamp(t0.getTime + s * 1000L)
    // user_id doubles as volume (no id hits the %97 null rule)
    val ev = Seq(
      (1L, at(0), 10L, "view", 100.0, "{}"),
      (2L, at(300), 30L, "view", 200.0, "{}"),  // frame: ticks 1+2
      (3L, at(601), 10L, "view", 500.0, "{}"))  // tick 1 is 601s old, tick 2 is 301s old -> alone
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val tmp = java.nio.file.Files.createTempDirectory("rvwap").toString
    ev.write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = TimeSeriesAnalytics.ticksRangeVwap(spark, tmp).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(out(1L) == 100.0)
    assert(out(2L) == (100.0 * 10 + 200.0 * 30) / 40) // 175.0
    assert(out(3L) == 500.0)
  }

  // ---- event_props_agg -----------------------------------------------------

  test("props json: missing keys drop out of count and sums") {
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val ev = Seq(
      (1L, t0, 1L, "view", 1.0, """{"k": 10}"""),
      (2L, t0, 1L, "view", 1.0, """{"k": 30}"""),
      (3L, t0, 1L, "view", 1.0, """{"other": 5}"""),
      (4L, t0, 1L, "click", 1.0, """not json"""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val tmp = java.nio.file.Files.createTempDirectory("props").toString
    ev.write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = StarAnalytics.eventPropsAgg(spark, tmp).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("view").getLong(1) == 2 && out("view").getLong(2) == 40)
    assert(out("view").getDouble(5) == 20.0)
    assert(out("click").getLong(1) == 0 && out("click").isNullAt(2))
  }

  // ---- customer_rank / customer_quartiles ---------------------------------

  test("rank and quartiles: dense ranks start at 1; quartile sizes balanced") {
    val rnk = StarAnalytics.customerRank(spark, dir).collect()
    assert(rnk.nonEmpty)
    val byNation = rnk.groupBy(_.getString(0))
    byNation.values.foreach { rows =>
      val ranks = rows.map(_.getInt(3)).sorted
      assert(ranks.head == 1)           // every nation has a rank-1
      assert(ranks.forall(_ <= 3))
      // revenue never increases as rank increases
      val byRank = rows.sortBy(r => (r.getInt(3), -r.getDouble(2)))
      byRank.sliding(2).foreach {
        case Array(a, b) =>
          if (a.getInt(3) < b.getInt(3)) assert(a.getDouble(2) >= b.getDouble(2))
        case _ =>
      }
    }
    val qt = StarAnalytics.customerQuartiles(spark, dir).collect()
    qt.groupBy(_.getString(0)).values.foreach { rows =>
      val sizes = rows.sortBy(_.getInt(1)).map(_.getLong(2))
      // ntile law: bucket sizes differ by at most 1, larger buckets first
      assert(sizes.max - sizes.min <= 1)
      assert(sizes.sorted.reverse.toSeq == sizes.toSeq)
    }
  }

  // ---- ticks_beta ----------------------------------------------------------

  test("beta: perfectly linear price~volume gives corr 1 and exact slope") {
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(m: Int) = new java.sql.Timestamp(t0.getTime + m * 60000L)
    // price = 2*volume + 5, volumes 1..20 (no event_id hits %97 == 0
    // except id 0 — start ids at 1)
    val ev = (1 to 20).map(i => (i.toLong, ts(i), i.toLong, "view", 2.0 * i + 5, "{}"))
    val tmp = java.nio.file.Files.createTempDirectory("beta").toString
    ev.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = TimeSeriesAnalytics.ticksBeta(spark, tmp).collect()
    assert(out.length == 1)
    assert(out.head.getLong(1) == 20)
    assert(out.head.getDouble(2) == 1.0)   // corr
    assert(out.head.getDouble(3) == 2.0)   // slope
  }

  // ---- small_quantity_revenue ----------------------------------------------

  test("Q17 shape: matches the brute-force correlated threshold") {
    import spark.implicits._
    val out = StarAnalytics.smallQuantityRevenue(spark, dir)
      .as[java.lang.Double].head()
    // brute force on the driver: per-part avg over the brand's lines
    val brand = Tables.part(spark, dir)
      .filter(col("p_brand") === "Brand#4").select("p_partkey")
      .as[Long].collect().toSet
    val lines = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
      .filter(t => brand.contains(t._1))
    val byPart = lines.groupBy(_._1)
    val expected = byPart.values.flatMap { ls =>
      val avg = ls.map(_._2).sum / ls.length
      ls.filter(_._2 < 0.2 * avg).map(t => BigDecimal(t._3).setScale(2))
    }.sum / 7.0
    if (expected == 0) assert(out == null)
    else assert(math.abs(out - expected.toDouble) < 1e-6)
  }

  // ---- data_quality_report -------------------------------------------------

  test("data quality: planted violations are detected, clean checks pass") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("dq").toString
    // customer 1 duplicated; order 20 orphaned (custkey 99); line with
    // qty 99 out of range; line 300 orphaned (orderkey 999)
    Seq((1L, "a"), (1L, "a"), (2L, "b"))
      .toDF("c_custkey", "c_name").write.parquet(s"$tmp/customer.parquet")
    Seq((10L, 1L), (20L, 99L))
      .toDF("o_orderkey", "o_custkey").write.parquet(s"$tmp/orders.parquet")
    Seq((100L, 10L, 5.0, 10.0), (200L, 10L, 99.0, 10.0), (300L, 999L, 5.0, 10.0))
      .toDF("l_linenumber", "l_orderkey", "l_quantity", "l_extendedprice")
      .write.parquet(s"$tmp/lineitem.parquet")
    val out = StarAnalytics.dataQualityReport(spark, tmp).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(out("customer_custkey_unique") == ((1L, false)))
    assert(out("orders_custkey_in_customer") == ((1L, false)))
    assert(out("lineitem_quantity_in_1_50") == ((1L, false)))
    assert(out("lineitem_orderkey_in_orders") == ((1L, false)))
    assert(out("lineitem_extendedprice_positive") == ((0L, true)))
  }

  // ---- event_transitions ---------------------------------------------------

  test("transitions: bigrams follow each user's time order") {
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(m: Int) = new java.sql.Timestamp(t0.getTime + m * 60000L)
    // u1: view -> click -> purchase ; u2: view -> view
    val ev = Seq(
      (1L, ts(0), 1L, "view", 1.0, "{}"), (2L, ts(1), 1L, "click", 1.0, "{}"),
      (3L, ts(2), 1L, "purchase", 1.0, "{}"),
      (4L, ts(0), 2L, "view", 1.0, "{}"), (5L, ts(5), 2L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val tmp = java.nio.file.Files.createTempDirectory("trans").toString
    ev.write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = StarAnalytics.eventTransitions(spark, tmp).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out == Map(("view", "click") -> 1L, ("click", "purchase") -> 1L,
      ("view", "view") -> 1L))
  }

  // ---- ticks_drawdown ------------------------------------------------------

  test("drawdown: peak-to-trough fraction against the running high-water mark") {
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(m: Int) = new java.sql.Timestamp(t0.getTime + m * 60000L)
    val ev = Seq(
      (1L, ts(0), 1L, "view", 100.0, "{}"), (2L, ts(1), 1L, "view", 120.0, "{}"),
      (3L, ts(2), 1L, "view", 60.0, "{}"), (4L, ts(3), 1L, "view", 90.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val tmp = java.nio.file.Files.createTempDirectory("ddown").toString
    ev.write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = TimeSeriesAnalytics.ticksDrawdown(spark, tmp).collect()
    assert(out.length == 1)
    assert(out.head.getDouble(1) == 0.5) // (120 - 60) / 120
  }

  // ---- span_dedup_rate -----------------------------------------------------

  test("span dedup rate: copied doc pair at 1.0, unique doc at 0.0") {
    import spark.implicits._
    val shared = (1 to 12).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, shared, "en", "web", 1L),
      (2L, shared, "en", "web", 1L), // exact copy: every 8-gram shared
      (3L, (1 to 12).map(i => s"u$i").mkString(" "), "en", "web", 1L),
      (4L, "a b c", "en", "web", 1L)) // < 8 tokens: no grams, absent
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("span").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = TextAnalytics.spanDedupRate(spark, tmp).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(3))).toMap
    assert(out.keySet == Set(1L, 2L, 3L))
    assert(out(1L) == ((5L, 1.0)) && out(2L) == ((5L, 1.0)))
    assert(out(3L) == ((5L, 0.0)))
  }
}
