package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native MinHash signature: k minimums over XXH64-permuted 64-bit shingle
  * hashes. Engine-internal (the LSH output is verified against exact
  * Jaccard, so the permutation family never needs oracle parity) — which
  * frees it to use Spark's internal XXH64.hashLong with the permutation
  * index as seed: one 5 ns mix per (permutation, shingle) in a tight
  * primitive loop, no per-permutation array allocation. The equivalent
  * `transform(sequence(0,k-1), p -> array_min(transform(...)))` fold is
  * interpreted and allocates an intermediate array per permutation per
  * row — ~20× slower.
  *
  * Per-row work is one `eval` loop, so CodegenFallback costs only a boxed
  * call per row, not per element.
  */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // null also for empty (or all-null) input sets — see nullSafeEval
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects array<bigint>, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val xs  = input.asInstanceOf[ArrayData]
    val n   = xs.numElements()
    // An empty (or all-null) set has no signature: return null rather
    // than an all-Long.MaxValue sentinel, which would put every such row
    // into the SAME bucket of every LSH band — an O(m²) candidate clique,
    // AND an output bug: the pair's 0/0 Jaccard is NaN, and NaN >= t is
    // TRUE under Spark's NaN-greatest ordering, so empty-doc pairs would
    // be emitted as duplicates. Callers drop null signatures.
    var hasValue = false
    var j = 0
    while (j < n && !hasValue) { hasValue = !xs.isNullAt(j); j += 1 }
    if (!hasValue) return null
    val out = new Array[Long](numHashes)
    var p   = 0
    while (p < numHashes) {
      var best = Long.MaxValue
      var i    = 0
      while (i < n) {
        if (!xs.isNullAt(i)) {
          val h = XXH64.hashLong(xs.getLong(i), p)
          if (h < best) best = h
        }
        i += 1
      }
      out(p) = best
      p += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)

  override def prettyName: String = "minhash_sig"
}
