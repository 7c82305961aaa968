package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Laws of the KMV cardinality sketch: the bounded `kmin_distinct`
  * aggregate must equal the window-rank definition of "k smallest
  * distinct values" under any partitioning (partial-aggregation + merge
  * correctness), return the full distinct set for groups under k, and
  * the (k−1)·2⁶⁰/m estimator must land within its design error on a
  * realistic stream.
  */
class KmvSketchSpec extends SparkSpec {

  private def stream = {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    // duplicates on purpose: ~800 distinct values per group, drawn 3000×
    (1 to 3000).flatMap { _ =>
      val g = rng.nextInt(3).toLong
      Seq((g, (rng.nextInt(800) + g * 10000).toLong))
    }.toDF("g", "v")
  }

  test("kmin_distinct equals window-ranked distinct minima, any partitioning") {
    GraftExtensions.register(spark)
    val df = stream
    val viaAgg = df.repartition(13)
      .groupBy("g").agg(expr("kmin_distinct(v, 50)").as("mins"))
      .select(col("g"), posexplode(col("mins")))
      .collect().map(_.toString).sorted
    val w = Window.partitionBy("g").orderBy(col("v").asc)
    val viaWindow = df.select("g", "v").distinct()
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 50)
      .select(col("g"), (col("rn") - 1).as("pos"), col("v"))
      .collect().map(_.toString).sorted
    assert(viaAgg.toSeq == viaWindow.toSeq)
  }

  test("merge law: per-split sketches re-aggregated equal the one-pass sketch") {
    GraftExtensions.register(spark)
    val df = stream.localCheckpoint()
    val onePass = df.groupBy("g").agg(expr("kmin_distinct(v, 64)").as("mins"))
      .collect().map(_.toString).sorted
    // split → per-split sketch → explode → re-sketch (the KMV
    // mergeability law a streaming tier relies on)
    val merged = df.withColumn("half", col("v") % 2)
      .groupBy("g", "half").agg(expr("kmin_distinct(v, 64)").as("mins"))
      .select(col("g"), explode(col("mins")).as("v"))
      .groupBy("g").agg(expr("kmin_distinct(v, 64)").as("mins"))
      .collect().map(_.toString).sorted
    assert(onePass.toSeq == merged.toSeq)
  }

  test("groups under k return the exact distinct set, ascending") {
    GraftExtensions.register(spark)
    import spark.implicits._
    val out = Seq((1L, 5L), (1L, 3L), (1L, 5L), (1L, 9L))
      .toDF("g", "v")
      .groupBy("g").agg(expr("kmin_distinct(v, 10)").as("mins"))
      .collect()
    assert(out.head.getSeq[Long](1) == Seq(3L, 5L, 9L))
  }

  test("kmv_distinct estimator lands within design error on the sf corpus") {
    val df = graft.analytics.TextAnalytics.kmvDistinct(spark, "/root/testdata/sf0.01")
      .collect()
    assert(df.length == 20)
    // k=256 ⇒ σ ≈ 1/√254 ≈ 6.3%; allow 4σ
    df.foreach { r =>
      val relErr = r.getDouble(r.fieldIndex("rel_err"))
      assert(relErr < 0.25, s"${r.getString(0)}: rel_err $relErr")
    }
  }
}
