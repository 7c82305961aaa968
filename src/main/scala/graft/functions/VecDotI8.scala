package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, LongType}

/** Codegen'd EXACT integer dot product of two `array<tinyint>` columns,
  * accumulated in long — the scoring primitive of the int8-quantized ANN
  * tier ([[graft.similarity.Quantize]] stores symmetric per-vector int8;
  * this expression scores candidates without ever touching the float
  * column).
  *
  * Why integer: with symmetric quantization q = round(v/scale), the
  * approximate cosine of two QUANTIZED vectors is
  * idot(qa,qb) / sqrt(idot(qa,qa) * idot(qb,qb)) — the per-vector scales
  * cancel, so ranking needs only this exact integer fold plus one double
  * division. Every intermediate fits a long by construction: |q| ≤ 127,
  * so a 64-dim dot is ≤ 64·127² ≈ 1.0e6, and even 2³¹ dims cannot
  * overflow. Exactness makes the DuckDB oracle trivially bit-identical
  * (integer math has no fold-order sensitivity).
  *
  * Null contract mirrors [[FloatVecDot]]: null array → null; null
  * elements contribute 0; the shorter length guards the loop.
  */
case class VecDotI8(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(ByteType, _), ArrayType(ByteType, _)) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"vec_dot_i8 expects (array<tinyint>, array<tinyint>), got (${left.dataType.sql}, ${right.dataType.sql})")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i))
        acc += x.getByte(i).toLong * y.getByte(i).toLong
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n   = ctx.freshName("n")
      val i   = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$x.isNullAt($i) && !$y.isNullAt($i)) {
         |    $acc += (long) $x.getByte($i) * (long) $y.getByte($i);
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDotI8 =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "vec_dot_i8"
}
