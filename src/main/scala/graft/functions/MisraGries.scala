package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries heavy-hitter summary as a mergeable Spark [[Aggregator]]:
  * at most `k` counters per buffer, with the classic guarantee that any
  * item whose true frequency exceeds N/k is present in the final summary
  * (counts may undercount; presence is guaranteed). Merging follows
  * Agarwal et al., "Mergeable Summaries": sum counterparts, then subtract
  * the (k+1)-th largest count from everything and drop the non-positive —
  * the result is again a valid k-summary of the union stream.
  *
  * This is the pass-1 CANDIDATE GENERATOR of the exact heavy-hitters
  * query (`heavy_hitters`): the sketch bounds state to k counters per
  * partial regardless of key-domain size (the point, when the domain is
  * grams/URLs and a full group-by is the cost), and a pass-2 exact
  * recount of the ≤ k candidates restores exact counts — output is
  * provably the exact answer even though the sketch itself undercounts.
  */
case class MisraGries(k: Int) extends Aggregator[String, Map[String, Long], Array[String]] {

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], item: String): Map[String, Long] =
    b.get(item) match {
      case Some(c)              => b.updated(item, c + 1)
      case None if b.size < k   => b.updated(item, 1L)
      case None                 =>
        // decrement-all step: amortized O(1) per arrival, O(k) here
        b.view.mapValues(_ - 1).filter(_._2 > 0).toMap
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val summed = b.foldLeft(a) { case (acc, (t, c)) =>
      acc.updated(t, acc.getOrElse(t, 0L) + c)
    }
    if (summed.size <= k) summed
    else {
      val cut = summed.values.toSeq.sorted(Ordering[Long].reverse)(k)
      summed.view.mapValues(_ - cut).filter(_._2 > 0).toMap
    }
  }

  override def finish(b: Map[String, Long]): Array[String] =
    b.keys.toArray.sorted

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()

  override def outputEncoder: Encoder[Array[String]] =
    ExpressionEncoder[Array[String]]()
}

object MisraGries {
  /** Untyped-DataFrame handle: `mg(k)(col)` aggregates a string column
    * into the ≤ k candidate array.
    */
  def mg(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(MisraGries(k), Encoders.STRING)
}
