package graft

import graft.similarity.Quantize

/** Laws of the symmetric int8 embedding quantizer. */
class QuantizeSpec extends SparkSpec {

  test("reconstruction error is bounded by qscale/2; zero vectors are exact") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val rows = (0L until 20L).map {
      case 7L => (7L, Array.fill(64)(0f)) // zero vector: scale 0, error 0
      case i  => (i, Array.fill(64)(rnd.nextFloat() * 4 - 2))
    }
    val tmp = java.nio.file.Files.createTempDirectory("quant").toString
    rows.toDF("vec_id", "embedding").write.parquet(s"$tmp/embeddings.parquet")
    val out = Quantize.embeddingQuantize(spark, tmp).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(out.size == 20)
    // nearest-level quantization: every element lands within half a step
    out.foreach { case (id, (scale, err)) =>
      assert(err <= scale / 2 + 1e-12, s"vec $id: err $err > scale/2 ${scale / 2}")
    }
    assert(out(7L) == (0.0, 0.0))
    // non-degenerate: random vectors actually incur quantization error
    assert(out.filterNot(_._1 == 7L).values.forall(_._2 > 0.0))
  }
}
