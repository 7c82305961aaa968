package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Codegen'd EXACT integer squared L2 distance of two `array<bigint>`
  * columns: Σ (a[i] − b[i])², accumulated in long. The scoring primitive
  * of the PQ tier ([[graft.similarity.PqAnn]]): codebook assignment and
  * ADC table construction both score a fixed-point sub-vector against
  * every centroid — N·M·K rows — so the per-row distance must stay
  * inside whole-stage codegen (the zip_with/aggregate HOF spelling this
  * replaces is interpreted per row, the same lesson as the r8 native
  * curve keys).
  *
  * Exactness bound: callers hold |element| ≤ CScale·QScale·‖x‖∞ ≈ 2.6e5,
  * so a 64-dim squared distance is ≤ 64·(5.2e5)² ≈ 1.7e13 ≪ 2⁶³ — and
  * < 2⁵³, so the one cast to double for the bounded top-k aggregate is
  * exact (the documented [[graft.functions.TopKByScore]] contract).
  *
  * Null contract mirrors [[VecDotI8]]: null array → null; null elements
  * contribute 0; the shorter length guards the loop.
  */
case class SqDistI64(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"sq_dist_i64 expects (array<bigint>, array<bigint>), got (${left.dataType.sql}, ${right.dataType.sql})")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) {
        val d = x.getLong(i) - y.getLong(i)
        acc += d * d
      }
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n   = ctx.freshName("n")
      val i   = ctx.freshName("i")
      val d   = ctx.freshName("d")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$x.isNullAt($i) && !$y.isNullAt($i)) {
         |    long $d = $x.getLong($i) - $y.getLong($i);
         |    $acc += $d * $d;
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SqDistI64 =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "sq_dist_i64"
}
