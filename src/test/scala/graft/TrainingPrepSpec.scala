package graft

import graft.analytics.TrainingPrep
import org.apache.spark.sql.functions._

/** Laws for the training-run preparation operators. The DuckDB oracle
  * checks exact values; these assert the STRUCTURAL contracts that make
  * the outputs usable by a data loader, on both the testdata and
  * synthetic frames the oracle never sees.
  */
class TrainingPrepSpec extends SparkSpec {

  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("training_order: global_idx is a permutation; shards are contiguous and bounded") {
    val rows = TrainingPrep.trainingOrder(spark, dir)
      .select("global_idx", "shard", "pos").as[(Long, Long, Long)].collect()
    val n = rows.length
    assert(n > 0)
    assert(rows.map(_._1).sorted.toSeq == (0L until n), "global_idx is not a permutation")
    rows.foreach { case (g, s, p) =>
      assert(s == g / 64 && p == g % 64, s"shard/pos drifted from global_idx at $g")
    }
    // deterministic: two runs agree exactly
    val again = TrainingPrep.trainingOrder(spark, dir)
      .select("doc_id", "global_idx").as[(Long, Long)].collect().sortBy(_._1)
    val first = TrainingPrep.trainingOrder(spark, dir)
      .select("doc_id", "global_idx").as[(Long, Long)].collect().sortBy(_._1)
    assert(again.toSeq == first.toSeq, "shuffle order is not reproducible")
  }

  test("training_order: the order is a genuine shuffle, not doc_id order") {
    val byDoc = TrainingPrep.trainingOrder(spark, dir)
      .orderBy("doc_id").select("global_idx").as[Long].collect()
    // a sorted-by-doc_id scan of a real shuffle must not be monotone
    assert(byDoc.sliding(2).exists { case Array(a, b) => a > b },
      "global order equals doc_id order — hash did nothing")
  }

  test("length_batches: buckets band lengths by power of two; batches fill to BatchDocs") {
    val b = TrainingPrep.lengthBatches(spark, dir)
      .select("bucket", "batch_id", "n_docs", "min_tokens", "max_tokens", "sum_tokens", "pad_waste")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(b.nonEmpty)
    b.foreach { case (bk, _, nd, mn, mx, sm, pw) =>
      assert(nd >= 1 && nd <= 16, s"batch size $nd out of range")
      assert(mn >= (1L << bk) && mx < (1L << (bk + 1)),
        s"bucket $bk holds lengths [$mn, $mx] outside its band")
      assert(pw == nd * mx - sm, "pad_waste identity broken")
    }
    // within a bucket only the LAST batch may be partial
    b.groupBy(_._1).foreach { case (bk, batches) =>
      val sorted = batches.sortBy(_._2)
      sorted.init.foreach { case (_, id, nd, _, _, _, _) =>
        assert(nd == 16, s"bucket $bk batch $id is partial but not last")
      }
    }
  }

  test("length_batches: bucketing cuts padding waste vs batching the raw stream") {
    // baseline = what an unbucketed loader does: batch the stream in
    // arrival (doc_id) order and pad each batch to its longest member
    val docs = Tables.documents(spark, dir)
      .orderBy("doc_id")
      .select(size(split(col("text"), " ")).cast("long").as("n"))
      .filter(col("n") > 0).as[Long].collect()
    val streamWaste = docs.grouped(16).map(g => g.length * g.max - g.sum).sum
    val bucketedWaste = TrainingPrep.lengthBatches(spark, dir)
      .agg(sum("pad_waste")).as[Long].head()
    assert(bucketedWaste < streamWaste / 2,
      s"bucketed padding $bucketedWaste does not clearly beat stream padding $streamWaste")
  }

  test("token_budget_sample: prefix-sum spelling equals the naive per-source window; prefix law holds") {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.TextFeatures.hash60
    val docs = Tables.documents(spark, dir)
    val got = TrainingPrep.tokenBudgetSampleOn(docs)
      .select("source", "doc_id", "n_tokens", "cum_tokens")
      .as[(String, Long, Long, Long)].collect().toSet
    // naive reference: ONE window per source (the spelling the two-level
    // machinery exists to avoid at scale — must agree bit-for-bit)
    val naive = docs.select(col("source"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        hash60(col("text")).as("k"))
      .withColumn("cum_tokens", sum("n_tokens").over(
        Window.partitionBy("source").orderBy(col("k"), col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("cum_tokens") <= 400)
      .select("source", "doc_id", "n_tokens", "cum_tokens")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got == naive && got.nonEmpty)
    // prefix laws: budget respected, totals strictly increase, and the
    // kept set per source is a PREFIX (max cum + next doc would overflow
    // is implied by equality with the take-while window above)
    got.groupBy(_._1).foreach { case (src, rows) =>
      val cums = rows.toSeq.map(_._4).sorted
      assert(cums.last <= 400, s"$src exceeds the token budget")
      assert(cums.distinct.size == cums.size, s"$src cum totals not strictly increasing")
    }
    // deterministic: a second run draws the identical sample
    val again = TrainingPrep.tokenBudgetSampleOn(docs)
      .select("source", "doc_id", "n_tokens", "cum_tokens")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(again == got)
  }
}
