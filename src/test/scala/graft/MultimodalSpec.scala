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

  test("PPM decoder parses a real P6 file: comments, non-square raster") {
    import spark.implicits._
    // 2x3 raster with a header comment — netpbm allows # lines anywhere
    // in the header whitespace; pixel bytes chosen for exact channel sums
    val raster = Array[Int](
      10, 20, 30,  40, 50, 60,
      1, 2, 3,     4, 5, 6,
      100, 0, 200, 0, 255, 0).map(_.toByte)
    val blob = "P6\n# a comment\n2 3\n255\n".getBytes("US-ASCII") ++ raster
    val df = Seq((7L, blob)).toDF("doc_id", "content")
    val s = Multimodal.decodePpm(df).collect()(0)
    assert(s.width == 2 && s.height == 3 && s.maxval == 255 && s.n_pixels == 6)
    assert(s.sum_r == 10 + 40 + 1 + 4 + 100 + 0)
    assert(s.sum_g == 20 + 50 + 2 + 5 + 0 + 255)
    assert(s.sum_b == 30 + 60 + 3 + 6 + 200 + 0)
    assert(s.px_sum == raster.map(_ & 0xff).sum.toLong)
  }

  test("WAV decoder handles arbitrary chunk order, unknown chunks, and odd-length padding") {
    import spark.implicits._
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
    val fmt  = "fmt ".getBytes("US-ASCII") ++ le32(16) ++ le16(1) ++ le16(1) ++
      le32(44100) ++ le32(44100) ++ le16(1) ++ le16(8)
    // an unknown 3-byte chunk BEFORE fmt — its declared length is odd, so
    // the walker must skip the RIFF pad byte to stay aligned
    val junk = "LIST".getBytes("US-ASCII") ++ le32(3) ++ Array[Byte](9, 9, 9, 0)
    val data = "data".getBytes("US-ASCII") ++ le32(5) ++ Array[Byte](10, 20, 30, 40, 50) ++ Array[Byte](0)
    val body = junk ++ data ++ fmt   // data BEFORE fmt: order must not matter
    val blob = "RIFF".getBytes("US-ASCII") ++ le32(4 + body.length) ++
      "WAVE".getBytes("US-ASCII") ++ body
    val s = Multimodal.decodeWav(Seq((9L, blob)).toDF("doc_id", "content")).collect()(0)
    assert(s.sample_rate == 44100 && s.channels == 1 && s.bits == 8)
    assert(s.n_samples == 5 && s.amp_sum == 150L && s.peak == 50)
    assert(s.duration_ms == 5L * 1000 / 44100)
  }

  test("WAV decoder rejects non-RIFF blobs and non-PCM formats") {
    import spark.implicits._
    val notWav = Seq((1L, "OggS....".getBytes("US-ASCII"))).toDF("doc_id", "content")
    intercept[org.apache.spark.SparkException] {
      Multimodal.decodeWav(notWav).collect()
    }
  }

  test("PPM decoder rejects non-P6 blobs and truncated rasters") {
    import spark.implicits._
    val notPpm = Seq((1L, "JFIF....".getBytes("US-ASCII"))).toDF("doc_id", "content")
    intercept[org.apache.spark.SparkException] {
      Multimodal.decodePpm(notPpm).collect()
    }
    val truncated = Seq((2L, "P6\n2 2\n255\n".getBytes("US-ASCII") ++ Array[Byte](1, 2, 3)))
      .toDF("doc_id", "content")
    intercept[org.apache.spark.SparkException] {
      Multimodal.decodePpm(truncated).collect()
    }
  }

  test("resize keeps exactly the nearest-neighbor source pixels, any even-sided P6") {
    import spark.implicits._
    // 4x2 raster: pixel (y,x) has R=10y+x so the mapping is readable;
    // G/B mark the lane. The 2x downsample keeps in(0,0) and in(0,2).
    val raster = Array[Int](
      0, 1, 2,  1, 1, 2,  2, 1, 2,  3, 1, 2,
      10, 1, 2, 11, 1, 2, 12, 1, 2, 13, 1, 2).map(_.toByte)
    val blob = "P6\n4 2\n255\n".getBytes("US-ASCII") ++ raster
    val r = Multimodal.resizePpm(Seq((5L, blob)).toDF("doc_id", "content")).collect()(0)
    assert(r.out_w == 2 && r.out_h == 1)
    assert(r.resized_hex == "000102" + "020102")  // pixels (0,0) and (0,2)
    assert(r.sum_r == 0 + 2 && r.sum_g == 2 && r.sum_b == 4)
  }

  test("resize of the ppm table re-encodes exactly the picked source bytes") {
    import org.apache.spark.sql.functions._
    val t = Multimodal.ppmTable(spark, "/root/testdata/sf0.001")
    val out = Multimodal.resizePpm(t).toDF()
    val ref = t.select(col("doc_id"), expr("lower(hex(content))").as("full_hex"))
    val joined = out.join(ref, "doc_id").collect()
    assert(joined.nonEmpty)
    joined.foreach { row =>
      val hx = row.getAs[String]("resized_hex")
      // strip the 11-byte "P6\n4 4\n255\n" header = 22 hex chars
      val raster = row.getAs[String]("full_hex").drop(22)
      val picks = Seq(0, 12, 48, 60).map(o => raster.substring(o, o + 6)).mkString
      assert(hx == picks, s"doc ${row.getAs[Long]("doc_id")}: resize bytes drifted")
    }
  }

  test("wav windows: chunk walk finds data anywhere; windows partition the clip exactly") {
    import spark.implicits._
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
    val fmt  = "fmt ".getBytes("US-ASCII") ++ le32(16) ++ le16(1) ++ le16(1) ++
      le32(8000) ++ le32(8000) ++ le16(1) ++ le16(8)
    val junk = "LIST".getBytes("US-ASCII") ++ le32(3) ++ Array[Byte](9, 9, 9, 0)
    val samples = Array[Byte](1, 2, 3, 4, 10, 20, 30, 40)
    val data = "data".getBytes("US-ASCII") ++ le32(8) ++ samples
    val blob = "RIFF".getBytes("US-ASCII") ++ le32(4 + junk.length + fmt.length + data.length) ++
      "WAVE".getBytes("US-ASCII") ++ junk ++ fmt ++ data
    val w = Multimodal.wavWindows(Seq((3L, blob)).toDF("doc_id", "content"))
      .collect().sortBy(_.win_idx)
    assert(w.length == 2)
    assert(w(0).sum_amp == 10 && w(0).energy == 1 + 4 + 9 + 16 && w(0).peak == 4)
    assert(w(1).sum_amp == 100 && w(1).energy == 100 + 400 + 900 + 1600 && w(1).peak == 40)
    // partition law on the real table: window sums reassemble the clip sum
    import org.apache.spark.sql.functions.{count, lit, sum}
    val tbl = Multimodal.wavTable(spark, "/root/testdata/sf0.001")
    val whole = Multimodal.decodeWav(tbl).toDF().select("doc_id", "amp_sum")
    val parts = Multimodal.wavWindows(tbl).toDF()
      .groupBy("doc_id").agg(sum("sum_amp").as("s"), count(lit(1)).as("nw"))
    val j = whole.join(parts, "doc_id").collect()
    assert(j.nonEmpty)
    j.foreach { r =>
      assert(r.getAs[Long]("amp_sum") == r.getAs[Long]("s"),
        s"doc ${r.getAs[Long]("doc_id")} window sums drift")
      assert(r.getAs[Long]("nw") == 8L)
    }
  }

  test("phash blobs are valid 8x8 P6; the raster decoder round-trips every byte") {
    val dir = "/root/testdata/sf0.001"
    val rast = Multimodal.decodePpmRaster(Multimodal.phashTable(spark, dir)).collect()
    assert(rast.nonEmpty)
    rast.foreach { r =>
      assert(r.width == 8 && r.height == 8 && r.px.length == 192)
      // R = G = base pattern; B = base + noise in [0, 9]
      r.px.grouped(3).foreach { t =>
        assert(t(0) == t(1) && t(2) >= t(0) && t(2) - t(0) <= 9)
        assert(t(0) >= 30 && t(0) <= 150)
      }
    }
  }

  test("phash dedup: banded LSH equals brute-force all-pairs (pigeonhole), pairs are the planted groups") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val got = Multimodal.multimodalPhashDedup(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(got.nonEmpty)
    // every reported near-dup pair is a planted same-group pair
    got.foreach { case (a, b, h) =>
      assert(a / 4 == b / 4, s"cross-group pair ($a, $b) at hamming $h")
      assert(h <= 6)
    }
    // exhaustiveness: brute-force all-pairs over the same hashes finds
    // nothing the block join missed (Hamming <= 6 of 7 blocks pigeonhole)
    val rast = Multimodal.decodePpmRaster(Multimodal.phashTable(spark, dir)).toDF()
    def gray(i: String) =
      s"""(element_at(px, cast(3*($i)+1 as int))
         | + element_at(px, cast(3*($i)+2 as int))
         | + element_at(px, cast(3*($i)+3 as int)))""".stripMargin
    val hashes = rast.select(col("doc_id"), expr(
      s"""aggregate(sequence(0, 55), 0L, (acc, k) ->
         |  acc + IF(${gray("(k div 7)*8 + k % 7 + 1")} > ${gray("(k div 7)*8 + k % 7")},
         |           shiftleft(1L, cast(k as int)), 0L))""".stripMargin).as("ph"))
    val brute = hashes.as("a").join(hashes.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id"),
        bit_count(col("a.ph").bitwiseXOR(col("b.ph"))).cast("int").as("h"))
      .filter(col("h") <= 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(got.toSet == brute.toSet,
      "LSH block join diverged from brute-force all-pairs")
    // the planting is effective: most groups of 4 yield near-dup pairs
    val groups = got.map(_._1 / 4).distinct.length
    assert(groups > 80, s"only $groups of ~125 planted groups detected")
  }
}
