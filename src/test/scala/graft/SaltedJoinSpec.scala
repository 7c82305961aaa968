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
}
