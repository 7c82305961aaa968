package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd PQ codebook assignment: given a fixed-point sub-vector
  * `qs: array<bigint>` and a packed per-subspace codebook
  * `cbm: array<struct<code: bigint, cv: array<bigint>>>` (sorted by
  * code), return the code minimizing Σ (qs[j] − cv[j])², ties to the
  * SMALLER code — exactly the oracle's `row_number() OVER (ORDER BY d2,
  * code) = 1`, guaranteed here by iterating in code order with a strict
  * `<` improvement test.
  *
  * Why an expression and not a join: the relational spelling scores
  * N·M·K joined rows through a min_by aggregate — materializing, hashing
  * and re-aggregating rows whose only purpose is one comparison each.
  * Here the K·d loop runs INSIDE the projection over the N·M sub-vector
  * rows (the codebook rides a tiny M-row broadcast), so codebook
  * assignment costs zero extra rows, no aggregate state and no shuffle —
  * the [[graft.similarity.PqAnn]] train/encode hot path at any corpus
  * size.
  *
  * Overflow bound: same as [[SqDistI64]] (elements ≤ ~2.6e5 ⇒ a 64-dim
  * d2 ≤ ~1.7e13 ≪ 2⁶³). Null contract: null qs or cbm → null; an empty
  * codebook → null; null elements contribute 0 (never present in the
  * caller's frames).
  */
case class PqArgminCode(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _),
          ArrayType(StructType(Array(f1, f2)), _))
        if f1.dataType == LongType && f2.dataType.isInstanceOf[ArrayType] &&
          f2.dataType.asInstanceOf[ArrayType].elementType == LongType =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"pq_argmin_code expects (array<bigint>, array<struct<code: bigint, cv: array<bigint>>>), " +
        s"got (${left.dataType.sql}, ${right.dataType.sql})")
  }

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val qs  = a.asInstanceOf[ArrayData]
    val cbm = b.asInstanceOf[ArrayData]
    val k = cbm.numElements()
    if (k == 0) return null
    var bestCode = 0L
    var bestD2   = Long.MaxValue
    var i = 0
    while (i < k) {
      val entry = cbm.getStruct(i, 2)
      val code  = entry.getLong(0)
      val cv    = entry.getArray(1)
      val n = math.min(qs.numElements(), cv.numElements())
      var d2 = 0L
      var j = 0
      while (j < n) {
        val d = qs.getLong(j) - cv.getLong(j)
        d2 += d * d
        j += 1
      }
      if (d2 < bestD2) { bestD2 = d2; bestCode = code }
      i += 1
    }
    bestCode
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (qs, cbm) => {
      val k     = ctx.freshName("k")
      val i     = ctx.freshName("i")
      val j     = ctx.freshName("j")
      val n     = ctx.freshName("n")
      val d     = ctx.freshName("d")
      val d2    = ctx.freshName("d2")
      val entry = ctx.freshName("entry")
      val cv    = ctx.freshName("cv")
      val code  = ctx.freshName("code")
      val bestC = ctx.freshName("bestC")
      val bestD = ctx.freshName("bestD")
      s"""
         |int $k = $cbm.numElements();
         |if ($k == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $bestC = 0L;
         |  long $bestD = Long.MAX_VALUE;
         |  for (int $i = 0; $i < $k; $i++) {
         |    org.apache.spark.sql.catalyst.InternalRow $entry = $cbm.getStruct($i, 2);
         |    long $code = $entry.getLong(0);
         |    org.apache.spark.sql.catalyst.util.ArrayData $cv = $entry.getArray(1);
         |    int $n = java.lang.Math.min($qs.numElements(), $cv.numElements());
         |    long $d2 = 0L;
         |    for (int $j = 0; $j < $n; $j++) {
         |      long $d = $qs.getLong($j) - $cv.getLong($j);
         |      $d2 += $d * $d;
         |    }
         |    if ($d2 < $bestD) { $bestD = $d2; $bestC = $code; }
         |  }
         |  ${ev.value} = $bestC;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqArgminCode =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "pq_argmin_code"
}
