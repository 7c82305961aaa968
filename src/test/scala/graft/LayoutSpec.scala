package graft

import graft.operators.Layout
import org.apache.spark.sql.functions._

/** Laws for the space-filling-curve layout operators.
  *
  * The Hilbert law (bijection over the grid + every consecutive curve
  * step is a unit grid step) is the defining property of the curve —
  * any implementation satisfying it has the locality the layout claims.
  * Morton gets the bijection law plus hand-computed interleave cases
  * (it deliberately fails unit-step adjacency at seams — that's the
  * documented trade).
  *
  * The write-path law runs the actual layout: lineitem laid out on the
  * (partkey, ship-day) curve vs the same table sorted by day alone, then
  * per-file envelopes audited — the curve layout must bound BOTH dims
  * per file and a point-partkey predicate must prune most files, while
  * the single-dim sort leaves partkey full-width in every file.
  */
class LayoutSpec extends SparkSpec {

  import spark.implicits._

  private def grid(bits: Int) = {
    val n = 1 << bits
    spark.range(n.toLong * n)
      .select((col("id") % n).as("x"), (col("id") / n).cast("long").as("y"))
  }

  test("zorderKey: hand-computed interleaves") {
    val rows = Seq((5L, 3L), (0L, 0L), (7L, 7L), (4L, 1L))
      .toDF("x", "y")
      .withColumn("z", Layout.zorderKey("x", "y", 3))
      .select("z").as[Long].collect()
    // x bits at even positions, y bits at odd: (101, 011) -> 011011 = 27
    assert(rows.toSeq == Seq(27L, 0L, 63L, 0x12L))
  }

  test("zorderKey: bijective over the 16x16 grid") {
    val z = grid(4).withColumn("z", Layout.zorderKey("x", "y", 4))
      .select("z").as[Long].collect()
    assert(z.sorted.toSeq == (0L until 256L))
  }

  test("hilbertKey: bijective + unit-step adjacent (bits=4 and 6)") {
    for (bits <- Seq(4, 6)) {
      val n = 1 << bits
      val cells = grid(bits)
        .withColumn("d", Layout.hilbertKey("x", "y", bits))
        .select("d", "x", "y").as[(Long, Long, Long)].collect()
      assert(cells.map(_._1).sorted.toSeq == (0L until n.toLong * n),
        s"bits=$bits: not a bijection")
      val byD = cells.sortBy(_._1)
      byD.sliding(2).foreach { case Array((_, x1, y1), (_, x2, y2)) =>
        assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
          s"bits=$bits: non-unit step ($x1,$y1)->($x2,$y2)")
      }
    }
  }

  test("hilbertKeyNative == hilbertKey fold over the full grid + lineitem dims") {
    GraftExtensions.register(spark)
    // exhaustive on a 64x64 grid…
    val g = grid(6)
      .withColumn("native", Layout.hilbertKeyNative("x", "y", 6))
      .withColumn("fold", Layout.hilbertKey("x", "y", 6))
      .filter(col("native") =!= col("fold"))
    assert(g.count() == 0, "native and fold Hilbert keys diverge on the grid")
    val m = grid(6)
      .withColumn("native", Layout.zorderKeyNative("x", "y", 6))
      .withColumn("fold", Layout.zorderKey("x", "y", 6))
      .filter(col("native") =!= col("fold"))
    assert(m.count() == 0, "native and fold Morton keys diverge on the grid")
    // …and on real lineitem dims at the production bit width. NOTE the
    // law only holds for IN-GRID input: out-of-range coordinates spill
    // into the fold's packed accumulator but are masked by the native
    // expression — which is exactly how the 12-bit grid's silent
    // truncation of sf0.1 partkeys was caught.
    val dims = Tables.lineitem(spark, "/root/testdata/sf0.001").select(
      col("l_partkey").cast("long").as("x"),
      datediff(col("l_shipdate"), lit("1992-01-01").cast("date")).cast("long").as("y"))
    val d = dims
      .withColumn("native", Layout.hilbertKeyNative("x", "y", 15))
      .withColumn("fold", Layout.hilbertKey("x", "y", 15))
      .filter(col("native") =!= col("fold"))
    assert(d.count() == 0, "native and fold Hilbert keys diverge on lineitem")
  }

  test("zorderWrite: curve layout bounds both dims per file; day-sort does not") {
    val dir = "/root/testdata/sf0.01"
    val dims = Tables.lineitem(spark, dir).select(
      col("l_partkey").cast("long").as("x"),
      datediff(col("l_shipdate"), lit("1992-01-01").cast("date")).cast("long").as("y"))
    val zPath = "/tmp/graft_layout_z"
    val yPath = "/tmp/graft_layout_y"
    Layout.zorderWrite(dims, "x", "y", 12, 16, zPath)
    dims.repartitionByRange(16, col("y")).sortWithinPartitions("y")
      .write.mode("overwrite").parquet(yPath)

    val zAudit = Layout.layoutAudit(spark, zPath, "x", "y")
      .select("min_x", "max_x", "min_y", "max_y").as[(Long, Long, Long, Long)].collect()
    val yAudit = Layout.layoutAudit(spark, yPath, "x", "y")
      .select("min_x", "max_x", "min_y", "max_y").as[(Long, Long, Long, Long)].collect()
    assert(zAudit.length == 16 && yAudit.length == 16)

    val (xLo, xHi) = (dims.agg(min("x")).as[Long].head(), dims.agg(max("x")).as[Long].head())
    val xRange = (xHi - xLo).toDouble
    def xFrac(a: Array[(Long, Long, Long, Long)]) =
      a.map { case (lo, hi, _, _) => (hi - lo) / xRange }.sum / a.length

    // day-sorted files carry (almost) the full partkey range each; the
    // curve layout must cut the average x-envelope at least in half
    assert(xFrac(yAudit) > 0.9, s"baseline x-envelope ${xFrac(yAudit)}")
    assert(xFrac(zAudit) < xFrac(yAudit) / 2,
      s"curve x-envelope ${xFrac(zAudit)} vs baseline ${xFrac(yAudit)}")

    // point-predicate skipping: files whose x-envelope contains the probe
    def hits(a: Array[(Long, Long, Long, Long)], v: Long) =
      a.count { case (lo, hi, _, _) => lo <= v && v <= hi }
    val probes = Seq(137L, 400L, 800L, 1500L)
    probes.foreach { v =>
      assert(hits(yAudit, v) >= 14, s"baseline should not skip x=$v")
      // 10, not a tighter bound: repartitionByRange SAMPLES its
      // boundaries with a seed derived from the RDD id, so the exact
      // file split shifts with suite order; the law is "prunes well
      // under the 14+ baseline", not a specific split
      assert(hits(zAudit, v) <= 10, s"curve layout skipped too little for x=$v: ${hits(zAudit, v)}/16")
    }
    // ...while y stays bounded too (the curve is a both-dims contract):
    // every z-file's y-envelope must be well under full width
    val (yLo, yHi) = (dims.agg(min("y")).as[Long].head(), dims.agg(max("y")).as[Long].head())
    val yRange = (yHi - yLo).toDouble
    val zYFrac = zAudit.map { case (_, _, lo, hi) => (hi - lo) / yRange }.sum / zAudit.length
    assert(zYFrac < 0.75, s"curve y-envelope $zYFrac")
  }

  test("zorderWrite: refuses a frame that already carries _graft_zkey") {
    val df = Seq((1L, 2L)).toDF("x", "y").withColumn("_graft_zkey", lit(0L))
    intercept[IllegalArgumentException] {
      Layout.zorderWrite(df, "x", "y", 4, 2, "/tmp/graft_layout_refuse")
    }
  }
}
