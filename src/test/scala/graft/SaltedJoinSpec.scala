package graft

import graft.operators.SaltedJoin
import org.apache.spark.sql.functions._

/** Law: the skew-salted join is row-identical to the plain equi-join. */
class SaltedJoinSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("salted join equals the plain join on a skewed tick stream") {
    val ticks = Tables.ticks(spark, dir)
      .select(col("tick_id"), col("symbol"), col("price"))
    val dim = Tables.ticks(spark, dir)
      .groupBy("symbol").agg(avg(col("price").cast("double")).as("sym_avg"))

    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select("tick_id", "symbol", "price", "sym_avg")
      .collect().map(_.toString).sorted.toSeq

    val plain  = canon(ticks.join(dim, "symbol"))
    val salted = canon(SaltedJoin.joinSalted(ticks, dim, "symbol", k = 7))
    assert(plain.nonEmpty)
    assert(salted == plain)
  }

  test("duplicate probe rows survive with their multiplicity") {
    import spark.implicits._
    val probe = Seq(("a", 1), ("a", 1), ("a", 2), ("b", 9))
      .toDF("k", "v")
    val build = Seq(("a", 10.0), ("b", 20.0)).toDF("k", "w")
    val out = SaltedJoin.joinSalted(probe, build, "k", k = 3)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2))).sorted
    assert(out.toSeq == Seq(("a", 1, 10.0), ("a", 1, 10.0), ("a", 2, 10.0), ("b", 9, 20.0)))
  }

  test("discriminator law: salted-with-discriminator equals the plain join") {
    val ticks = Tables.ticks(spark, dir)
      .select(col("tick_id"), col("symbol"), col("price"))
    val dim = Tables.ticks(spark, dir)
      .groupBy("symbol").agg(avg(col("price").cast("double")).as("sym_avg"))
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select("tick_id", "symbol", "price", "sym_avg")
      .collect().map(_.toString).sorted.toSeq
    val plain  = canon(ticks.join(dim, "symbol"))
    val salted = canon(SaltedJoin.joinSalted(ticks, dim, "symbol", k = 7,
      discriminator = Some("tick_id")))
    assert(salted == plain)
  }

  test("monster key of identical rows: discriminator splits it k ways") {
    import spark.implicits._
    // 1M fully duplicate rows on one key — the default all-columns salt
    // hashes them identically (one bucket, one task); a unique id
    // discriminator scatters them. Assert on physical join-output
    // partition row counts with AQE coalescing off so the exchange's
    // partitioning is observable.
    val aqe0 = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val bcast0 = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    // Disable AQE: its skew-join would split the monster PARTITION at
    // runtime (hiding the salt's effect — and on a real cluster it can't
    // split a single sort-merge KEY group the way salting can), and its
    // partition coalescing would merge the small salted ones back.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    // force a SHUFFLE join: a broadcast join never exchanges the probe
    // side, so the salt would be invisible in the output partitioning
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val n = 1000000
      // v is computed from id at runtime (always 1) so Catalyst cannot
      // constant-fold the salt hash away — every row is still identical.
      val probe = spark.range(n.toLong)
        .select(col("id"), lit("hot").as("k"), (pmod(col("id"), lit(1L)) + 1L).as("v"))
      val dup = probe.drop("id") // identical rows, no discriminator available
      val build = Seq(("hot", 10.0)).toDF("k", "w")

      def partSizes(df: org.apache.spark.sql.DataFrame): Seq[Long] =
        df.rdd.mapPartitions(it => Iterator(it.size.toLong))
          .collect().toSeq.filter(_ > 0)

      val without = partSizes(SaltedJoin.joinSalted(dup, build, "k", k = 8))
      val withDisc = partSizes(
        SaltedJoin.joinSalted(probe, build, "k", k = 8, discriminator = Some("id")))
      // identical rows: every row in ONE bucket → one non-empty partition
      assert(without.size == 1 && without.head == n.toLong)
      // discriminator: spread over several buckets, no partition dominates
      assert(withDisc.size >= 3, s"expected >=3 non-empty partitions, got $withDisc")
      assert(withDisc.max <= n * 6L / 10, s"one partition still dominates: $withDisc")
      assert(withDisc.sum == n.toLong)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqe0)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast0)
    }
  }

  test("a caller-owned _salt column survives the join untouched") {
    import spark.implicits._
    val probe = Seq(("a", 1, 77L), ("b", 2, 88L)).toDF("k", "v", "_salt")
    val build = Seq(("a", 10.0), ("b", 20.0)).toDF("k", "w")
    val out = SaltedJoin.joinSalted(probe, build, "k", k = 4)
    assert(out.columns.count(_ == "_salt") == 1)
    val got = out.select("k", "_salt").collect()
      .map(r => (r.getString(0), r.getLong(1))).sorted
    assert(got.toSeq == Seq(("a", 77L), ("b", 88L)))
  }
}
