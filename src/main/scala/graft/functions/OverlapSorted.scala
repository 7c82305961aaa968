package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Codegen'd exact intersection COUNT `|A∩B|` of two SORTED distinct
  * `array<bigint>` sets — [[JaccardSorted]]'s two-pointer merge with the
  * raw count returned instead of the Jaccard ratio, so callers can form
  * ASYMMETRIC measures (containment `|A∩B|/|A|`, overlap coefficient)
  * and apply integer thresholds (`c·den ≥ n·num`) with no floating
  * point in the filter at all.
  *
  * Same preconditions and null contract as [[JaccardSorted]]: sorted
  * ascending, element-distinct, no null elements; null input → null.
  */
case class OverlapSorted(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"overlap_sorted expects (array<bigint>, array<bigint>), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x  = a.asInstanceOf[ArrayData]
    val y  = b.asInstanceOf[ArrayData]
    val n1 = x.numElements()
    val n2 = y.numElements()
    var c  = 0L
    var i  = 0
    var j  = 0
    while (i < n1 && j < n2) {
      val xv = x.getLong(i)
      val yv = y.getLong(j)
      if (xv == yv) { c += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n1 = ctx.freshName("n1")
      val n2 = ctx.freshName("n2")
      val c  = ctx.freshName("c")
      val i  = ctx.freshName("i")
      val j  = ctx.freshName("j")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $n1 = $x.numElements();
         |int $n2 = $y.numElements();
         |long $c = 0L;
         |int $i = 0;
         |int $j = 0;
         |while ($i < $n1 && $j < $n2) {
         |  long $xv = $x.getLong($i);
         |  long $yv = $y.getLong($j);
         |  if ($xv == $yv) { $c++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; }
         |  else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): OverlapSorted =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "overlap_sorted"
}
