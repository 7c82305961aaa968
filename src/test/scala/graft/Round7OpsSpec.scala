package graft

import graft.analytics.{TextAnalytics, TimeSeriesAnalytics}
import graft.dedup.Dedup
import org.apache.spark.sql.functions._

/** Laws for the round-7 additions: PII scrub (planted-class accounting +
  * the nothing-survives-redaction law), exact EWMA (hand-computed fold +
  * bounds), and the cross-source duplication matrix (pair accounting
  * against the minhash pass it piggybacks on). The cross-engine hash gate
  * runs via the driver's oracle.
  */
class Round7OpsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  // Same regex set as TextAnalytics (private there; the law re-scans with
  // the literal patterns, which is the point — nothing may survive).
  private val PiiRes = Seq(
    "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}",
    "\\b\\d{3}-\\d{2,4}-\\d{4}\\b",
    "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b")

  // ---- pii_scrub --------------------------------------------------------

  test("pii_scrub: planted residue classes get exactly their PII type") {
    val out = TextAnalytics.piiScrub(spark, dir)
      .select("doc_id", "n_emails", "n_phones", "n_ips").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (id, e, p, i) = (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3))
      (id % 5) match {
        case 0 => assert((e, p, i) == ((1, 0, 0)), s"doc $id")
        case 1 => assert((e, p, i) == ((0, 1, 0)), s"doc $id")
        case 2 => assert((e, p, i) == ((0, 0, 1)), s"doc $id")
        case 3 => assert((e, p, i) == ((1, 0, 1)), s"doc $id")
        case _ => assert((e, p, i) == ((0, 0, 0)), s"doc $id")
      }
    }
  }

  test("pii_scrub: no PII pattern survives redaction") {
    val clean = TextAnalytics.piiScrub(spark, dir).select(col("clean_text"))
    val survivors = PiiRes.map(re =>
      clean.filter(size(regexp_extract_all(col("clean_text"), lit(re), lit(0))) > 0)
        .count())
    assert(survivors.forall(_ == 0L), s"survivors per pattern: $survivors")
  }

  test("pii_scrub: redaction markers appear iff the count is positive") {
    val out = TextAnalytics.piiScrub(spark, dir).collect()
    out.foreach { r =>
      val clean = r.getString(4)
      assert(clean.contains("<EMAIL>") == (r.getInt(1) > 0))
      assert(clean.contains("<PHONE>") == (r.getInt(2) > 0))
      assert(clean.contains("<IP>") == (r.getInt(3) > 0))
      assert(r.getInt(5) == clean.length)
    }
  }

  // ---- ticks_ewma -------------------------------------------------------

  test("ewma: hand-computed fold on a three-tick series") {
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(m: Int) = new java.sql.Timestamp(t0.getTime + m * 60000L)
    // prices 100, 200, 400 → seed 100; 0.5·200+0.5·100 = 150;
    // 0.5·400+0.5·150 = 275
    val ev = Seq(
      (1L, ts(0), 10L, "view", 100.0, "{}"),
      (2L, ts(1), 10L, "view", 200.0, "{}"),
      (3L, ts(2), 10L, "view", 400.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val tmp = java.nio.file.Files.createTempDirectory("ewma").toString
    ev.write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = TimeSeriesAnalytics.ticksEwma(spark, tmp).collect()
    assert(out.length == 1)
    assert(out.head.getString(0) == "VIEW")
    assert(out.head.getInt(1) == 3)
    assert(out.head.getDouble(2) == 275.0)
  }

  test("ewma: sf data — bounded by per-symbol price range, counts exact") {
    val ewma = TimeSeriesAnalytics.ticksEwma(spark, dir)
    val bounds = Tables.ticks(spark, dir).groupBy("symbol")
      .agg(count(lit(1)).as("n"),
        min(col("price").cast("double")).as("lo"),
        max(col("price").cast("double")).as("hi"))
    val joined = ewma.join(bounds, "symbol").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (n, e) = (r.getInt(1), r.getDouble(2))
      assert(n == r.getLong(3).toInt)
      assert(e >= r.getDouble(4) && e <= r.getDouble(5),
        s"${r.getString(0)}: ewma $e outside [${r.getDouble(4)}, ${r.getDouble(5)}]")
    }
  }

  // ---- source_overlap ---------------------------------------------------

  test("source_overlap: cells account exactly for the verified pair graph") {
    val docs = Tables.documents(spark, dir)
    val out = Dedup.sourceOverlapOn(docs).collect()
    assert(out.nonEmpty)
    // unordered cells, counts positive, jaccard verified ≥ 0.8 threshold
    out.foreach { r =>
      assert(r.getString(0) <= r.getString(1))
      assert(r.getLong(2) > 0)
      val (nPairs, nDocs) = (r.getLong(2), r.getLong(3))
      assert(nDocs >= 2 && nDocs <= 2 * nPairs)
      assert(r.getDouble(4) > 0.0 && r.getDouble(4) <= 1.0)
    }
    // Σ cell pair counts == the minhash pass's verified pair count
    val totalPairs = Dedup.dedupMinhash(spark, dir).count()
    assert(out.map(_.getLong(2)).sum == totalPairs)
  }
}
