package graft

import graft.multimodal.Multimodal

/** Multimodal plumbing: binary columns through the plan, deterministic
  * decode-stub features, partition-parallel batch shape.
  */
class MultimodalSpec extends SparkSpec {

  private lazy val docs = {
    import spark.implicits._
    Seq(
      (0L, "alpha beta gamma"),
      (1L, "delta epsilon zeta"),
      (2L, "eta theta iota"),
      (3L, "kappa lambda mu"))
      .toDF("doc_id", "text")
  }

  test("media table carries a real BinaryType blob with modality metadata") {
    import org.apache.spark.sql.types.BinaryType
    val m = docsMedia
    assert(m.schema("content").dataType == BinaryType)
    val rows = m.collect()
    assert(rows.map(_.getAs[String]("modality")).toSet == Set("image", "audio", "video"))
    // blob length = 16 bytes per md5 repeat, 1 + doc_id % 8 repeats
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Array[Byte]]("content").length == 16 * (1 + id % 8))
    }
  }

  private lazy val docsMedia = {
    import org.apache.spark.sql.functions._
    docs
      .withColumn("modality",
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")))
      .withColumn("content",
        unhex(expr("repeat(md5(text), cast(1 + pmod(doc_id, 8) as int))")))
  }

  test("frame sampling keeps every stride-th 16-byte block of av blobs") {
    import org.apache.spark.sql.functions._
    val frames = Multimodal.frameSample(docsMedia, stride = 2).collect()
    assert(frames.nonEmpty)
    frames.foreach { r =>
      assert(r.getAs[String]("modality") != "image")
      assert(r.getAs[Int]("frame_idx") % 2 == 0)
      assert(r.getAs[Array[Byte]]("frame").length == 16)
    }
    // doc 1 (audio): 2 blocks of 16 bytes → frame 0 sampled, frame 1 dropped
    val d1 = frames.filter(_.getAs[Long]("doc_id") == 1L)
    assert(d1.map(_.getAs[Int]("frame_idx")).toSet == Set(0))
  }

  test("resize stub pools features to a fixed output width") {
    val feats   = Multimodal.decodeStub(docsMedia)
    val resized = Multimodal.resizeStub(feats, 2).collect()
    assert(resized.length == 4)
    resized.foreach { r =>
      val f = r.getSeq[Double](2)
      assert(f.length == 2)
      assert(f.forall(v => v >= 0.0 && v <= 1.0))
    }
  }

  test("decode stub is deterministic and partition-parallel") {
    val feats = Multimodal.decodeStub(docsMedia).collect().sortBy(_.doc_id)
    assert(feats.length == 4)
    feats.foreach { f =>
      assert(f.feature.length == 4)
      assert(f.feature.forall(v => v >= 0.0 && v <= 1.0))
      assert(f.byte_len == 16 * (1 + f.doc_id % 8))
    }
    // determinism: same input → same checksums, independent of partitioning
    val again = Multimodal.decodeStub(docsMedia.repartition(3)).collect().sortBy(_.doc_id)
    assert(again.map(_.checksum).toSeq == feats.map(_.checksum).toSeq)
  }
}
