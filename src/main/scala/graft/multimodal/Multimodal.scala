package graft.multimodal

import graft.Tables
import graft.functions.TextFeatures.{hash60, hash60Sql}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** A decoded media frame/window feature row (the decode-stub output). */
case class MediaFeature(
    doc_id: Long,
    modality: String,
    byte_len: Int,
    checksum: Long,
    feature: Array[Double])

/** Multimodal-column plumbing for a training-data pipeline: media content
  * as opaque `binary` columns with typed metadata, plus a decode /
  * feature-extract stage (north-star extensions, SURVEY.md §7.5).
  *
  * The container has no image/audio codec libraries, so the decode step
  * for OPAQUE codecs is a clearly-marked deterministic fake
  * ([[decodeStub]]): it derives bytes and "decoded" metadata from md5 of
  * the document text. One format IS decoded for real: [[decodePpm]]
  * parses binary PPM (P6) — header, comments, 8-bit RGB raster — with no
  * external library, oracle-checked end-to-end (`multimodal_ppm`), and
  * demonstrates the slot a codec stage plugs into. Everything around the
  * stubs — BinaryType column through the plan, schema, partition-parallel
  * `mapPartitions` decode, batch shape — is real Spark and is what the
  * tests cover. Swap [[decodeStub]] for a codec UDF and nothing else
  * changes.
  *
  * Scale notes (100 TB): blobs stay columnar in parquet and are never
  * collected; the decode stage is `mapPartitions` (one iterator pass per
  * parquet row-group worth of rows, no shuffle); metadata extraction is a
  * pure projection that stays in whole-stage codegen.
  */
object Multimodal {

  /** Synthetic media table: doc_id, modality, content (BinaryType blob of
    * 16–128 bytes), derived deterministically from the documents table.
    */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .withColumn("modality",
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")))
      .withColumn("content",
        unhex(expr("repeat(md5(text), cast(1 + pmod(doc_id, 8) as int))")))

  // ---- multimodal_meta: typed metadata off the binary column -----------
  // The "decoded" header fields pass through the real binary path
  // (hex(substring(content, …))), so the plan genuinely carries BinaryType;
  // the oracle reproduces the same values from the md5 hex string.
  def multimodalMeta(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir)
      .select(
        col("doc_id"),
        col("modality"),
        length(col("content")).as("byte_len"),
        conv(hex(expr("substring(content, 1, 4)")), 16, 10).cast("long").as("header_id"),
        (lit(320) + pmod(hash60(concat(col("text"), lit("w"))), lit(1600)))
          .cast("int").as("width"),
        (lit(240) + pmod(hash60(concat(col("text"), lit("h"))), lit(840)))
          .cast("int").as("height"),
        when(col("modality") === "image", lit(null).cast("int"))
          .otherwise((lit(1) + pmod(hash60(concat(col("text"), lit("d"))), lit(600)))
            .cast("int")).as("duration_s"))

  val multimodalMetaSql: String =
    s"""SELECT doc_id,
       |       CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
       |       CAST(16 * (1 + doc_id % 8) AS INT) AS byte_len,
       |       ('0x' || substr(md5(text), 1, 8))::BIGINT AS header_id,
       |       CAST(320 + ${hash60Sql("text || 'w'")} % 1600 AS INT) AS width,
       |       CAST(240 + ${hash60Sql("text || 'h'")} % 840 AS INT) AS height,
       |       CASE WHEN doc_id % 3 = 0 THEN NULL
       |            ELSE CAST(1 + ${hash60Sql("text || 'd'")} % 600 AS INT) END AS duration_s
       |FROM documents""".stripMargin

  /** Decode / feature-extract stage: partition-parallel iterator pass over
    * the blobs. DECODE STUB — a real deployment would decode the codec
    * here (image resize, audio window, video frame-sample); this fake
    * derives a deterministic 4-dim feature from the blob bytes so the
    * pipeline shape (batching, schema, parallelism) is fully testable.
    */
  def decodeStub(media: DataFrame): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.select("doc_id", "modality", "content")
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, modality, bytes) =>
          var checksum = 0L
          var i        = 0
          while (i < bytes.length) { checksum = checksum * 31 + (bytes(i) & 0xff); i += 1 }
          val feature = Array.tabulate(4) { k =>
            var s = 0.0
            var j = k
            while (j < bytes.length) { s += (bytes(j) & 0xff) / 255.0; j += 4 }
            s / math.max(1, (bytes.length + 3 - k) / 4)
          }
          MediaFeature(id, modality, bytes.length, checksum, feature)
        }
      }
  }

  /** Frame sampling: split the blob into fixed 16-byte "frames" and keep
    * every `stride`-th one — the video/audio frame-sample stage as a
    * generator-shaped projection (posexplode; no shuffle, no collect).
    * Output: (doc_id, modality, frame_idx, frame BinaryType).
    */
  def frameSample(media: DataFrame, stride: Int = 2): DataFrame =
    media
      .filter(col("modality") =!= "image")
      .select(col("doc_id"), col("modality"),
        posexplode(expr(
          "transform(sequence(0, cast((length(content) - 1) / 16 as int)), " +
            "i -> substring(content, i * 16 + 1, 16))")))
      .withColumnRenamed("pos", "frame_idx")
      .withColumnRenamed("col", "frame")
      .filter(col("frame_idx") % stride === 0)

  /** Resize stub: average-pool a decoded feature vector down to `outDim`
    * (the image-resize analog on the feature side). DECODE-ADJACENT STUB —
    * a real deployment pools pixels; the batch shape (typed Dataset map,
    * fixed output width) is the real thing.
    */
  def resizeStub(features: Dataset[MediaFeature], outDim: Int): DataFrame = {
    import features.sparkSession.implicits._
    features.map { f =>
      val in   = f.feature
      val bins = math.max(1, outDim)
      val out = Array.tabulate(bins) { b =>
        val lo = b * in.length / bins
        val hi = math.max(lo + 1, (b + 1) * in.length / bins)
        var s  = 0.0
        var i  = lo
        while (i < hi) { s += in(i); i += 1 }
        s / (hi - lo)
      }
      (f.doc_id, f.modality, out)
    }.toDF("doc_id", "modality", "feature")
  }

  // ---- multimodal_frames: the frame-sample stage, oracle-checked -------
  /** [[frameSample]] over the synthetic media table. SQL-expressible
    * because the synthetic blob is m = 1+doc_id%8 repeats of the 16-byte
    * md5 digest, so frame i of a non-image doc is exactly `unhex(md5
    * (text))` and stride-2 keeps indices {0, 2, …} < m — the oracle
    * checks the generator laws (frame count, index arithmetic, 16-byte
    * slicing). The BinaryType slices flow through the whole plan; only
    * the final edge hex-encodes them, because the compare harness (like
    * most exchange edges) can't carry raw bytes.
    */
  def multimodalFrames(spark: SparkSession, dir: String): DataFrame =
    frameSample(mediaTable(spark, dir), stride = 2)
      .select(col("doc_id"), col("modality"), col("frame_idx"),
        lower(hex(col("frame"))).as("frame_hex"))

  val multimodalFramesSql: String =
    """WITH m AS (
      |  SELECT doc_id,
      |         CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
      |         CAST(1 + doc_id % 8 AS INT) AS nframes,
      |         md5(text) AS frame_hex
      |  FROM documents),
      |f AS (
      |  SELECT doc_id, modality, CAST(unnest(range(0, nframes)) AS INT) AS frame_idx, frame_hex
      |  FROM m WHERE modality <> 'image')
      |SELECT doc_id, modality, frame_idx, frame_hex FROM f WHERE frame_idx % 2 = 0""".stripMargin

  // ---- multimodal_ppm: REAL decode of an uncompressed image format -----

  /** Synthetic-but-VALID binary PPM (P6) blobs: `P6\n4 4\n255\n` header
    * followed by exactly 4×4×3 = 48 RGB bytes (three md5 digests of the
    * doc text — deterministic, so the oracle can re-derive every pixel
    * from the hex). These are real PPM files: any external P6 reader
    * decodes them.
    */
  def ppmTable(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .withColumn("content", concat(
        lit("P6\n4 4\n255\n").cast("binary"),
        unhex(concat(
          md5(col("text")),
          md5(concat(col("text"), lit("x"))),
          md5(concat(col("text"), lit("y")))))))
      .select(col("doc_id"), col("content"))

  /** Decoded PPM statistics: header fields + per-channel pixel sums. */
  case class PpmStats(
      doc_id: Long, width: Int, height: Int, maxval: Int,
      n_pixels: Int, sum_r: Long, sum_g: Long, sum_b: Long, px_sum: Long)

  /** REAL P6 decoder — not a stub: parses the ASCII header (magic,
    * whitespace/comment handling per the netpbm spec, maxval ≤ 255) and
    * walks the RGB byte triples. Works on any well-formed 8-bit P6 blob,
    * not just [[ppmTable]]'s. Partition-parallel iterator pass, same
    * no-shuffle shape as [[decodeStub]]; this is the pattern a real codec
    * stage plugs into, demonstrated end-to-end on the one format whose
    * bytes need no external library.
    */
  def decodePpm(media: DataFrame): Dataset[PpmStats] = {
    import media.sparkSession.implicits._
    media.select("doc_id", "content").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          var p = 0
          def skipSpace(): Unit = {
            var go = true
            while (go && p < bytes.length) {
              val c = bytes(p).toChar
              if (c == '#') { while (p < bytes.length && bytes(p).toChar != '\n') p += 1 }
              else if (c.isWhitespace) p += 1
              else go = false
            }
          }
          def readInt(): Int = {
            skipSpace()
            var v = 0
            while (p < bytes.length && bytes(p).toChar.isDigit) {
              v = v * 10 + (bytes(p) - '0'); p += 1
            }
            v
          }
          require(bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == '6',
            s"doc $id: not a P6 PPM")
          p = 2
          val w  = readInt(); val h = readInt(); val mv = readInt()
          p += 1 // exactly one whitespace byte after maxval, then raster
          require(mv > 0 && mv < 256, s"doc $id: only 8-bit maxval supported, got $mv")
          require(bytes.length - p == w * h * 3,
            s"doc $id: raster is ${bytes.length - p} bytes, expected ${w * h * 3}")
          var sr = 0L; var sg = 0L; var sb = 0L
          var i = p
          while (i + 2 < bytes.length) {
            sr += bytes(i) & 0xff; sg += bytes(i + 1) & 0xff; sb += bytes(i + 2) & 0xff
            i += 3
          }
          PpmStats(id, w, h, mv, w * h, sr, sg, sb, sr + sg + sb)
        }
      }
  }

  /** [[decodePpm]] over [[ppmTable]], oracle-checked: DuckDB re-derives
    * each channel sum by byte arithmetic over the same three md5 hex
    * strings (R = hex pairs at stride 3 starting 0, etc.). Means divide
    * by 16 pixels — an exact binary fraction (1/16 = 0.0625), so
    * round(·,4) is exact in both engines and the hash comparison is
    * bit-deterministic.
    */
  def multimodalPpm(spark: SparkSession, dir: String): DataFrame =
    decodePpm(ppmTable(spark, dir)).toDF()
      .select(col("doc_id"), col("width"), col("height"), col("maxval"),
        col("n_pixels"), col("px_sum"),
        round(col("sum_r") / col("n_pixels"), 4).as("mean_r"),
        round(col("sum_g") / col("n_pixels"), 4).as("mean_g"),
        round(col("sum_b") / col("n_pixels"), 4).as("mean_b"))
      .orderBy("doc_id")

  val multimodalPpmSql: String =
    """WITH hx AS (
      |  SELECT doc_id, md5(text) || md5(text || 'x') || md5(text || 'y') AS h
      |  FROM documents),
      |sums AS (
      |  SELECT doc_id,
      |         list_sum([('0x' || h[6*i+1:6*i+2])::INT FOR i IN RANGE(0, 16)]) AS sum_r,
      |         list_sum([('0x' || h[6*i+3:6*i+4])::INT FOR i IN RANGE(0, 16)]) AS sum_g,
      |         list_sum([('0x' || h[6*i+5:6*i+6])::INT FOR i IN RANGE(0, 16)]) AS sum_b
      |  FROM hx)
      |SELECT doc_id, 4 AS width, 4 AS height, 255 AS maxval, 16 AS n_pixels,
      |       CAST(sum_r + sum_g + sum_b AS BIGINT) AS px_sum,
      |       round(CAST(sum_r AS BIGINT) / 16, 4) AS mean_r,
      |       round(CAST(sum_g AS BIGINT) / 16, 4) AS mean_g,
      |       round(CAST(sum_b AS BIGINT) / 16, 4) AS mean_b
      |FROM sums ORDER BY doc_id""".stripMargin

  // ---- multimodal_wav: real RIFF/WAV audio decode ----------------------
  /** Synthetic-but-VALID 8-bit PCM mono WAV blobs: a canonical 44-byte
    * RIFF header (every field constant — 8 kHz, 1 channel, 8-bit, 32
    * data bytes — so the little-endian header is one literal hex string)
    * followed by 32 sample bytes from two md5 digests of the doc text.
    * Real WAV files: any RIFF reader plays them.
    */
  private val WavHeaderHex: String =
    "52494646" + "44000000" + "57415645" +                // RIFF, size 68, WAVE
    "666d7420" + "10000000" + "0100" + "0100" +           // fmt , 16, PCM, mono
    "401f0000" + "401f0000" + "0100" + "0800" +           // 8000 Hz, 8000 B/s, align 1, 8-bit
    "64617461" + "20000000"                               // data, 32 bytes

  def wavTable(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .withColumn("content", concat(
        unhex(lit(WavHeaderHex)),
        unhex(concat(md5(col("text")), md5(concat(col("text"), lit("a")))))))
      .select(col("doc_id"), col("content"))

  /** Decoded WAV statistics: format fields + amplitude aggregates. */
  case class WavStats(
      doc_id: Long, sample_rate: Int, channels: Int, bits: Int,
      n_samples: Int, amp_sum: Long, peak: Int, duration_ms: Long)

  /** REAL RIFF/WAV decoder — not a stub: verifies the RIFF/WAVE
    * container, walks subchunks in ANY order (skipping unknown ones by
    * their declared length, per the RIFF spec), reads the fmt fields
    * little-endian, and aggregates the 8-bit unsigned samples of the
    * data chunk. Works on any well-formed 8-bit PCM mono WAV, not just
    * [[wavTable]]'s. Same partition-parallel no-shuffle shape as
    * [[decodePpm]] — image and audio now both decode for real; only
    * compressed codecs remain behind labeled stubs.
    */
  def decodeWav(media: DataFrame): Dataset[WavStats] = {
    import media.sparkSession.implicits._
    media.select("doc_id", "content").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, b) =>
          def u8(i: Int): Int = b(i) & 0xff
          def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
          def le32(i: Int): Int = u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
          def tag(i: Int): String = new String(b, i, 4, "US-ASCII")
          require(b.length >= 12 && tag(0) == "RIFF" && tag(8) == "WAVE",
            s"doc $id: not a RIFF/WAVE container")
          var rate = -1; var ch = -1; var bits = -1
          var dataOff = -1; var dataLen = -1
          var p = 12
          while (p + 8 <= b.length) {
            val t = tag(p); val len = le32(p + 4)
            if (t == "fmt ") {
              require(le16(p + 8) == 1, s"doc $id: only PCM supported")
              ch = le16(p + 10); rate = le32(p + 12); bits = le16(p + 22)
            } else if (t == "data") { dataOff = p + 8; dataLen = len }
            p += 8 + len + (len & 1)  // RIFF chunks are word-aligned
          }
          require(rate > 0 && dataOff >= 0, s"doc $id: missing fmt or data chunk")
          require(bits == 8 && ch == 1, s"doc $id: only 8-bit mono supported")
          var s = 0L; var peak = 0
          var i = dataOff
          while (i < dataOff + dataLen) {
            val v = u8(i); s += v; if (v > peak) peak = v; i += 1
          }
          WavStats(id, rate, ch, bits, dataLen, s, peak,
            dataLen.toLong * 1000L / rate)
        }
      }
  }

  /** [[decodeWav]] over [[wavTable]], oracle-checked: DuckDB re-derives
    * every sample byte from the same two md5 hex strings. All-integer
    * math except the mean, whose divisor 32 is an exact binary fraction
    * (1/32 = 0.03125), so round(·,4) is exact in both engines.
    */
  def multimodalWav(spark: SparkSession, dir: String): DataFrame =
    decodeWav(wavTable(spark, dir)).toDF()
      .select(col("doc_id"), col("sample_rate"), col("channels"), col("bits"),
        col("n_samples"), col("amp_sum"), col("peak"), col("duration_ms"),
        round(col("amp_sum") / col("n_samples"), 4).as("mean_amp"))
      .orderBy("doc_id")

  val multimodalWavSql: String =
    """WITH hx AS (
      |  SELECT doc_id, md5(text) || md5(text || 'a') AS h
      |  FROM documents),
      |samples AS (
      |  SELECT doc_id,
      |         [('0x' || h[2*i+1:2*i+2])::INT FOR i IN RANGE(0, 32)] AS sm
      |  FROM hx)
      |SELECT doc_id, 8000 AS sample_rate, 1 AS channels, 8 AS bits,
      |       32 AS n_samples,
      |       CAST(list_sum(sm) AS BIGINT) AS amp_sum,
      |       CAST(list_max(sm) AS INTEGER) AS peak,
      |       CAST(4 AS BIGINT) AS duration_ms,
      |       round(CAST(list_sum(sm) AS BIGINT) / 32, 4) AS mean_amp
      |FROM samples ORDER BY doc_id""".stripMargin

  // ---- multimodal_resize: decode → transform → re-encode ----------------

  /** Nearest-neighbor-resized PPM: output dimensions + the RE-ENCODED
    * 2×2 raster bytes (hex) + resized channel means.
    */
  case class PpmResized(
      doc_id: Long, out_w: Int, out_h: Int, resized_hex: String,
      sum_r: Long, sum_g: Long, sum_b: Long)

  /** REAL image resize — the decode → transform → re-encode codec-stage
    * the brief names: parses the P6 header (same netpbm rules as
    * [[decodePpm]]), nearest-neighbor-subsamples the raster by 2× in
    * both axes (`out(y,x) = in(2y, 2x)` — the floor-rule nearest
    * neighbor, exact integer indexing so any engine agrees byte-for-
    * byte), and emits the resized raster as bytes a writer would wrap in
    * a `P6\n2 2\n255\n` header. Works on any even-sided 8-bit P6, not
    * just [[ppmTable]]'s 4×4 blobs. Partition-parallel, no shuffle — the
    * transform stage slots between the decode and the sink exactly like
    * a real thumbnailer; interpolating kernels (bilinear etc.) replace
    * only the pixel-pick line.
    */
  def resizePpm(media: DataFrame): Dataset[PpmResized] = {
    import media.sparkSession.implicits._
    media.select("doc_id", "content").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          var p = 0
          def skipSpace(): Unit = {
            var go = true
            while (go && p < bytes.length) {
              val c = bytes(p).toChar
              if (c == '#') { while (p < bytes.length && bytes(p).toChar != '\n') p += 1 }
              else if (c.isWhitespace) p += 1
              else go = false
            }
          }
          def readInt(): Int = {
            skipSpace()
            var v = 0
            while (p < bytes.length && bytes(p).toChar.isDigit) {
              v = v * 10 + (bytes(p) - '0'); p += 1
            }
            v
          }
          require(bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == '6',
            s"doc $id: not a P6 PPM")
          p = 2
          val w = readInt(); val h = readInt(); val mv = readInt()
          p += 1
          require(mv > 0 && mv < 256, s"doc $id: only 8-bit maxval supported")
          require(bytes.length - p == w * h * 3, s"doc $id: short raster")
          val ow = w / 2; val oh = h / 2
          val out = new Array[Byte](ow * oh * 3)
          var sr = 0L; var sg = 0L; var sb = 0L
          var y = 0
          while (y < oh) {
            var x = 0
            while (x < ow) {
              val src = p + ((y * 2) * w + (x * 2)) * 3
              val dst = (y * ow + x) * 3
              out(dst) = bytes(src); out(dst + 1) = bytes(src + 1); out(dst + 2) = bytes(src + 2)
              sr += bytes(src) & 0xff; sg += bytes(src + 1) & 0xff; sb += bytes(src + 2) & 0xff
              x += 1
            }
            y += 1
          }
          PpmResized(id, ow, oh, out.map(b => f"${b & 0xff}%02x").mkString,
            sr, sg, sb)
        }
      }
  }

  /** [[resizePpm]] over [[ppmTable]], oracle-checked byte-for-byte:
    * DuckDB picks the same source pixels out of the md5 hex (pixel
    * (y,x) lives at hex offset 6·(4y+x); the resize keeps (0,0), (0,2),
    * (2,0), (2,2)) and re-concatenates the hex in raster order. Means
    * divide by 4 — exact binary fraction, round(·,4) exact.
    */
  def multimodalResize(spark: SparkSession, dir: String): DataFrame =
    resizePpm(ppmTable(spark, dir)).toDF()
      .select(col("doc_id"), col("out_w"), col("out_h"), col("resized_hex"),
        round(col("sum_r") / (col("out_w") * col("out_h")), 4).as("mean_r"),
        round(col("sum_g") / (col("out_w") * col("out_h")), 4).as("mean_g"),
        round(col("sum_b") / (col("out_w") * col("out_h")), 4).as("mean_b"))
      .orderBy("doc_id")

  val multimodalResizeSql: String =
    """WITH hx AS (
      |  SELECT doc_id, md5(text) || md5(text || 'x') || md5(text || 'y') AS h
      |  FROM documents),
      |px AS (
      |  -- kept source pixels in raster order: (y,x) ∈ {0,1}² → src index
      |  -- (2y)·4 + 2x ∈ {0, 2, 8, 10} → hex char offset 6·idx
      |  SELECT doc_id, h, [0, 12, 48, 60] AS offs
      |  FROM hx),
      |r AS (
      |  SELECT doc_id,
      |         list_aggregate([h[o+1:o+6] FOR o IN offs], 'string_agg', '') AS resized_hex,
      |         list_sum([('0x' || h[o+1:o+2])::INT FOR o IN offs]) AS sum_r,
      |         list_sum([('0x' || h[o+3:o+4])::INT FOR o IN offs]) AS sum_g,
      |         list_sum([('0x' || h[o+5:o+6])::INT FOR o IN offs]) AS sum_b
      |  FROM px)
      |SELECT doc_id, 2 AS out_w, 2 AS out_h, resized_hex,
      |       round(CAST(sum_r AS BIGINT) / 4, 4) AS mean_r,
      |       round(CAST(sum_g AS BIGINT) / 4, 4) AS mean_g,
      |       round(CAST(sum_b AS BIGINT) / 4, 4) AS mean_b
      |FROM r ORDER BY doc_id""".stripMargin

  // ---- multimodal_wav_windows: frame-level audio features ---------------

  /** Windowed audio features: per 4-sample window, the DC-free energy
    * statistics a VAD / silence-trim / loudness-normalize stage keys on.
    */
  case class WavWindow(
      doc_id: Long, win_idx: Int, sum_amp: Long, energy: Long, peak: Int)

  /** Frame-level FEATURE EXTRACTION over decoded audio — the stage after
    * [[decodeWav]] in a real pipeline (VAD, silence trimming, loudness
    * bucketing all consume windowed energies, not whole-clip sums): the
    * 32 samples split into 8 contiguous 4-sample windows; per window the
    * amplitude sum, energy (sum of squares — all integer, max 4·255² per
    * window, nowhere near overflow) and peak. One row per (doc, window),
    * fan-out 8 — the frame-sample shape of [[multimodalFrames]] with
    * real decoded bytes underneath.
    */
  def wavWindows(media: DataFrame): Dataset[WavWindow] = {
    import media.sparkSession.implicits._
    media.select("doc_id", "content").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, b) =>
          // the same RIFF chunk walk as decodeWav: find the data chunk
          // wherever it sits, skipping unknown chunks by declared length
          def u8(i: Int): Int = b(i) & 0xff
          def le32(i: Int): Int = u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
          def tag(i: Int): String = new String(b, i, 4, "US-ASCII")
          require(b.length >= 12 && tag(0) == "RIFF" && tag(8) == "WAVE",
            s"doc $id: not a RIFF/WAVE container")
          var dataOff = -1; var dataLen = -1
          var p = 12
          while (p + 8 <= b.length) {
            val t = tag(p); val len = le32(p + 4)
            if (t == "data") { dataOff = p + 8; dataLen = len }
            p += 8 + len + (len & 1)
          }
          require(dataOff >= 0, s"doc $id: missing data chunk")
          (0 until dataLen / 4).map { wdx =>
            var s = 0L; var e = 0L; var pk = 0
            var i = dataOff + wdx * 4
            while (i < dataOff + wdx * 4 + 4) {
              val v = b(i) & 0xff
              s += v; e += v.toLong * v; if (v > pk) pk = v
              i += 1
            }
            WavWindow(id, wdx, s, e, pk)
          }
        }
      }
  }

  /** [[wavWindows]] over [[wavTable]], oracle-checked: DuckDB re-derives
    * each window's bytes from the same md5 hex. All integer.
    */
  def multimodalWavWindows(spark: SparkSession, dir: String): DataFrame =
    wavWindows(wavTable(spark, dir)).toDF()
      .orderBy("doc_id", "win_idx")

  val multimodalWavWindowsSql: String =
    """WITH hx AS (
      |  SELECT doc_id, md5(text) || md5(text || 'a') AS h
      |  FROM documents),
      |w AS (
      |  SELECT doc_id, CAST(wdx AS INT) AS win_idx,
      |         [('0x' || h[2*(4*wdx+i)+1:2*(4*wdx+i)+2])::BIGINT FOR i IN RANGE(0, 4)] AS sm
      |  FROM hx, RANGE(0, 8) AS t(wdx))
      |SELECT doc_id, win_idx,
      |       CAST(list_sum(sm) AS BIGINT) AS sum_amp,
      |       CAST(list_sum([v * v FOR v IN sm]) AS BIGINT) AS energy,
      |       CAST(list_max(sm) AS INTEGER) AS peak
      |FROM w ORDER BY doc_id, win_idx""".stripMargin

  // ---- multimodal_phash_dedup: perceptual-hash near-dup image dedup ----

  /** dHash bit width: 8×8 gray raster → 8 rows × 7 horizontal gradient
    * signs = 56 bits, packed positive in a BIGINT.
    */
  private val PhashBits = 56

  /** Hamming blocks for the LSH candidate join: 7 byte-blocks over the
    * 56-bit hash. Hamming ≤ [[PhashHammingMax]] = 6 damages at most six
    * blocks, so at least ONE survives intact — single-block agreement is
    * an EXHAUSTIVE candidate generator by pigeonhole (the dedup_simhash
    * law at image granularity).
    */
  private val PhashBlocks = 7
  private val PhashHammingMax = 6

  /** Near-dup group width: doc_id div 4 picks the base image, so true
    * duplicate GROUPS are corpus-sized in count but constant in width —
    * the near-dup pair graph stays LINEAR in the corpus (≤ C(4,2)·N/4
    * planted pairs), the realistic regime (a re-encoded image has a few
    * variants, not N/K).
    */
  private val PhashGroup = 4

  /** Synthetic-but-VALID 8×8 P6 blobs with PLANTED near-dup structure —
    * the image analogue of the text corpus' seeded duplicates. Each
    * group (doc_id div [[PhashGroup]]) has a deterministic 16-LEVEL base
    * pattern (pixel p's level = hex digit p of md5(group) ‖
    * md5(group‖'x') — an exponential pattern space, so no two groups
    * alias), and each document adds md5-derived noise (0–9) on the blue
    * channel. Decoded gray = 90 + 24·level + noise: where adjacent
    * levels differ the gradient is ≥ 24−9 — noise-immune, the base
    * image's signature (~15/16 of positions; two random groups disagree
    * on ~⅓ of them, Hamming ~18); where adjacent levels are EQUAL
    * (~1/16 of positions, ~3.4 per image) the gradient IS the noise
    * difference — the per-document variation. Same-group images land
    * within a few Hamming bits; different groups diverge.
    */
  def phashTable(spark: SparkSession, dir: String): DataFrame =
    phashTableOn(Tables.documents(spark, dir))

  private[graft] def phashTableOn(docsIn: DataFrame): DataFrame = {
    // bind the md5 chains once (HOF re-inlining idiom): the 64-pixel
    // transform would otherwise recompute the digest concats per pixel
    // per channel
    def base = // the group's 16-level pattern value at pixel p ∈ [30, 150]
      "(30 + 8 * cast(conv(substring(t.pat, p + 1, 1), 16, 10) as int))"
    val pxHex =
      s"""transform(array(named_struct(
         |    'ch', concat(md5(text), md5(concat(text, 'x')),
         |                 md5(concat(text, 'y')), md5(concat(text, 'z'))),
         |    'pat', concat(md5(cast(doc_id div $PhashGroup as string)),
         |                  md5(concat(cast(doc_id div $PhashGroup as string), 'x'))))), t ->
         |  array_join(transform(sequence(0, 63), p ->
         |    concat(
         |      lpad(hex($base), 2, '0'),
         |      lpad(hex($base), 2, '0'),
         |      lpad(hex($base
         |        + cast(conv(substring(t.ch, 2 * p + 1, 2), 16, 10) as int) % 10), 2, '0'))),
         |  ''))[0]""".stripMargin
    docsIn
      .select(col("doc_id"), col("text"))
      .withColumn("content", concat(
        lit("P6\n8 8\n255\n").cast("binary"), unhex(expr(pxHex))))
      .select(col("doc_id"), col("content"))
  }

  /** Decoded raster row: header fields + the full RGB byte sequence. */
  case class PpmRaster(doc_id: Long, width: Int, height: Int, px: Array[Int])

  /** REAL P6 raster decoder — [[decodePpm]]'s parser, returning the
    * pixel bytes instead of channel sums (the slot a feature extractor
    * consumes). Partition-parallel iterator pass, no shuffle.
    */
  def decodePpmRaster(media: DataFrame): Dataset[PpmRaster] = {
    import media.sparkSession.implicits._
    media.select("doc_id", "content").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          var p = 0
          def skipSpace(): Unit = {
            var go = true
            while (go && p < bytes.length) {
              val c = bytes(p).toChar
              if (c == '#') { while (p < bytes.length && bytes(p).toChar != '\n') p += 1 }
              else if (c.isWhitespace) p += 1
              else go = false
            }
          }
          def readInt(): Int = {
            skipSpace()
            var v = 0
            while (p < bytes.length && bytes(p).toChar.isDigit) {
              v = v * 10 + (bytes(p) - '0'); p += 1
            }
            v
          }
          require(bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == '6',
            s"doc $id: not a P6 PPM")
          p = 2
          val w  = readInt(); val h = readInt(); val mv = readInt()
          p += 1
          require(mv > 0 && mv < 256, s"doc $id: only 8-bit maxval supported, got $mv")
          require(bytes.length - p == w * h * 3,
            s"doc $id: raster is ${bytes.length - p} bytes, expected ${w * h * 3}")
          PpmRaster(id, w, h, bytes.drop(p).map(_ & 0xff))
        }
      }
  }

  /** Near-duplicate IMAGE detection end-to-end: binary blob → real P6
    * decode → grayscale → dHash (8×7 horizontal gradient signs, the
    * classic perceptual hash) → banded Hamming-LSH candidate join →
    * exact Hamming ≤ [[PhashHammingMax]] verify. The multimodal twin of
    * `dedup_simhash`: same block-pigeonhole exhaustiveness law, the
    * signature computed from DECODED PIXELS instead of token hashes —
    * what an image-bearing training corpus runs to drop re-encoded /
    * lightly-perturbed duplicate images that byte-level exact dedup
    * can never see.
    *
    * Scale (100 TB): decode + dHash are one partition-parallel pass
    * (56 bits per image cross the shuffle, never pixels); candidates
    * come from the 7-way block equi-join (never all-pairs — the oracle's
    * brute-force all-pairs is oracle-only); with Hamming ≤ 6 over 7
    * blocks the single-block join is EXHAUSTIVE by pigeonhole, so the
    * LSH output equals the brute-force output exactly.
    */
  def multimodalPhashDedup(spark: SparkSession, dir: String): DataFrame =
    multimodalPhashDedupOn(
      decodePpmRaster(phashTable(spark, dir)).toDF())

  private[graft] def multimodalPhashDedupOn(rast: DataFrame): DataFrame = {
    def gray(i: String) =
      s"""(element_at(px, cast(3*($i)+1 as int))
         | + element_at(px, cast(3*($i)+2 as int))
         | + element_at(px, cast(3*($i)+3 as int)))""".stripMargin
    val phashExpr =
      s"""aggregate(sequence(0, ${PhashBits - 1}), 0L, (acc, k) ->
         |  acc + IF(${gray("(k div 7)*8 + k % 7 + 1")} > ${gray("(k div 7)*8 + k % 7")},
         |           shiftleft(1L, cast(k as int)), 0L))""".stripMargin
    // hashes computed ONCE for both self-join sides (the dedup_simhash
    // shape): the repartition alone is defeated by the broadcast build
    // side (r19 plan audit — the full synthesize + decode + fold chain
    // ran twice); the checkpoint pins the (doc_id, long) rows
    val hashes = rast.select(col("doc_id"), expr(phashExpr).as("phash"))
      .repartition(col("doc_id"))
      .localCheckpoint(eager = false)
    val blocks = hashes.select(col("doc_id"), col("phash"),
      explode(expr(
        s"""transform(sequence(0, ${PhashBlocks - 1}), b ->
           |  cast(b as bigint) * 256 + (shiftright(phash, b * 8) & 255))""".stripMargin))
        .as("bkey"))
    blocks.as("a")
      .join(blocks.as("b"),
        col("a.bkey") === col("b.bkey") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_id_1"), col("b.doc_id").as("doc_id_2"),
        col("a.phash").as("pa"), col("b.phash").as("pb"))
      .distinct()
      .withColumn("hamming", bit_count(col("pa").bitwiseXOR(col("pb"))))
      .filter(col("hamming") <= PhashHammingMax)
      .select(col("doc_id_1"), col("doc_id_2"), col("hamming").cast("int").as("hamming"))
      .orderBy("doc_id_1", "doc_id_2")
  }

  /** Oracle: pixels re-derived from first principles (doc_id class
    * pattern + md5-digit noise — never parsing the blob), dHash packed
    * identically, brute-force all-pairs Hamming (the block join above is
    * exhaustive for ≤ [[PhashHammingMax]] by pigeonhole, so outputs are
    * identical).
    */
  val multimodalPhashDedupSql: String =
    s"""WITH d AS (
       |  SELECT doc_id,
       |         md5((doc_id // $PhashGroup)::VARCHAR)
       |           || md5((doc_id // $PhashGroup)::VARCHAR || 'x') AS pat,
       |         md5(text) || md5(text || 'x') || md5(text || 'y') || md5(text || 'z') AS ch
       |  FROM documents),
       |px AS (
       |  SELECT doc_id, p,
       |         3 * (30 + 8 * ('0x' || substr(pat, p + 1, 1))::BIGINT)
       |         + ('0x' || substr(ch, 2 * p + 1, 2))::BIGINT % 10 AS gray
       |  FROM d, RANGE(0, 64) AS t(p)),
       |sig AS (
       |  SELECT a.doc_id,
       |         CAST(sum(CASE WHEN b.gray > a.gray
       |           THEN (1::BIGINT << CAST((a.p // 8) * 7 + a.p % 8 AS INT))
       |           ELSE 0 END) AS BIGINT) AS phash
       |  FROM px a JOIN px b ON b.doc_id = a.doc_id AND b.p = a.p + 1
       |  WHERE a.p % 8 < 7
       |  GROUP BY 1)
       |SELECT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2,
       |       CAST(bit_count(xor(a.phash, b.phash)) AS INT) AS hamming
       |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.phash, b.phash)) <= $PhashHammingMax
       |ORDER BY doc_id_1, doc_id_2""".stripMargin

  val registry: Map[String, ((SparkSession, String) => DataFrame, String)] = Map(
    "multimodal_meta"   -> (multimodalMeta _, multimodalMetaSql),
    "multimodal_frames" -> (multimodalFrames _, multimodalFramesSql),
    "multimodal_ppm"    -> (multimodalPpm _, multimodalPpmSql),
    "multimodal_wav"    -> (multimodalWav _, multimodalWavSql),
    "multimodal_resize" -> (multimodalResize _, multimodalResizeSql),
    "multimodal_wav_windows" -> (multimodalWavWindows _, multimodalWavWindowsSql),
    "multimodal_phash_dedup" -> (multimodalPhashDedup _, multimodalPhashDedupSql),
  )
}
