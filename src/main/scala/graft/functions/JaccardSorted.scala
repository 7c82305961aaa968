package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Codegen'd exact Jaccard similarity of two SORTED distinct `array<bigint>`
  * shingle-hash sets: `|A∩B| / (|A| + |B| - |A∩B|)` via a two-pointer merge
  * — one primitive loop per candidate pair, no per-element boxing and no
  * intermediate intersection array.
  *
  * This is the hot loop of every dedup verify join (the per-CANDIDATE cost,
  * where the per-document costs are amortized): the HOF form
  * `size(array_intersect(a, b)) / (size(a) + size(b) - c)` builds a hash set
  * and materializes the intersection array per pair, interpreted. The merge
  * needs both inputs sorted — [[graft.dedup.Dedup]] sorts once per DOCUMENT
  * at extraction (O(n log n) amortized over all pairs the doc appears in).
  *
  * Semantics are bit-identical to the HOF form on its preconditions
  * (sorted ascending, element-distinct, no null elements — xxhash64 output
  * sets always qualify): the count and sizes are exact integers and the
  * single double division is the same operation in the same order, so the
  * result — including 0/0 → NaN for two empty sets — matches exactly.
  * Null input array → null (same as the HOF chain through size/intersect).
  */
case class JaccardSorted(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"jaccard_sorted expects (array<bigint>, array<bigint>), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x  = a.asInstanceOf[ArrayData]
    val y  = b.asInstanceOf[ArrayData]
    val n1 = x.numElements()
    val n2 = y.numElements()
    var c  = 0
    var i  = 0
    var j  = 0
    while (i < n1 && j < n2) {
      val xv = x.getLong(i)
      val yv = y.getLong(j)
      if (xv == yv) { c += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    c.toDouble / (n1 + n2 - c)
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
         |int $c = 0;
         |int $i = 0;
         |int $j = 0;
         |while ($i < $n1 && $j < $n2) {
         |  long $xv = $x.getLong($i);
         |  long $yv = $y.getLong($j);
         |  if ($xv == $yv) { $c++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; }
         |  else { $j++; }
         |}
         |${ev.value} = (double) $c / ($n1 + $n2 - $c);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardSorted =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "jaccard_sorted"
}
