package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native simhash vote-fold: for each bit i < `bits`, the signature bit is
  * set iff strictly more than half of the (non-null) input hashes have bit
  * i set. Engine-internal twin of the brute-force oracle's per-bit ±1 vote
  * sums — value-identical to the HOF formulation
  * `aggregate(transform(sequence(0, bits-1), i -> IF(2*aggregate(...) >
  * size(v), 1<<i, 0)), 0, +)` on null-free arrays (the only inputs the
  * dedup call sites produce: distinct md5-derived hashes), but one tight
  * primitive double loop per row instead of `bits` interpreted lambda
  * folds with per-element boxing. On arrays with SOME null elements the
  * two diverge by design: this fold votes over the non-null elements
  * (denominator = valid count), where the HOF's null-poisoned inner sum
  * nulls the whole word.
  *
  * Empty (or all-null) inputs return null rather than the 0L signature —
  * a shared zero signature would put every empty doc at Hamming 0 of every
  * other, an O(m²) block-join clique (same guard as [[MinHashSig]]).
  *
  * Per-row work is one `eval` loop, so CodegenFallback costs only a boxed
  * call per row, not per element.
  */
case class SimhashFold(child: Expression, bits: Int)
    extends UnaryExpression with CodegenFallback {

  require(bits > 0 && bits <= 63, "simhash_fold bits must be in [1, 63]")

  override def dataType: DataType = LongType

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash_fold expects array<bigint>, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    val n  = xs.numElements()
    val votes = new Array[Int](bits)
    var valid = 0
    var i = 0
    while (i < n) {
      if (!xs.isNullAt(i)) {
        valid += 1
        val h = xs.getLong(i)
        var b = 0
        while (b < bits) {
          votes(b) += ((h >>> b) & 1L).toInt
          b += 1
        }
      }
      i += 1
    }
    if (valid == 0) return null
    var sig = 0L
    var b   = 0
    while (b < bits) {
      if (2 * votes(b) > valid) sig |= 1L << b
      b += 1
    }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression): SimhashFold =
    copy(child = newChild)

  override def prettyName: String = "simhash_fold"
}
