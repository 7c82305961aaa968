package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Codegen'd exact integer dot product Σ cₐᵢ·c_bⱼ over matching keys of
  * two documents' SORTED postings, carried as parallel arrays
  * `(keys, counts)` per side — [[JaccardSorted]]'s two-pointer merge
  * with per-match count products accumulated instead of a presence
  * count. The hot loop of `dedup_cosine`'s verify stage: candidates
  * join each side's packed arrays ONCE (doc-keyed, pair-graph-sized)
  * and the dot is a single primitive loop per pair — no posting
  * re-join, no pair-keyed aggregate shuffle.
  *
  * Preconditions (the [[JaccardSorted]] contract, per side): keys sorted
  * ascending and distinct, `counts[i]` belonging to `keys[i]`, equal
  * lengths, no null elements. All-integer output, so threshold filters
  * stay in exact arithmetic. Null in any input → null.
  */
case class DotSorted(first: Expression, second: Expression,
    third: Expression, fourth: Expression) extends QuaternaryExpression {

  override def dataType: DataType = LongType

  override def prettyName: String = "dot_sorted"

  override def checkInputDataTypes(): TypeCheckResult =
    children.map(_.dataType) match {
      case Seq(ArrayType(LongType, _), ArrayType(LongType, _),
               ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"dot_sorted expects 4 × array<bigint> (keysA, countsA, keysB, countsB), " +
          s"got (${other.map(_.sql).mkString(", ")})")
    }

  override def nullSafeEval(ka: Any, ca: Any, kb: Any, cb: Any): Any = {
    val xk = ka.asInstanceOf[ArrayData]
    val xc = ca.asInstanceOf[ArrayData]
    val yk = kb.asInstanceOf[ArrayData]
    val yc = cb.asInstanceOf[ArrayData]
    val n1 = xk.numElements()
    val n2 = yk.numElements()
    var s  = 0L
    var i  = 0
    var j  = 0
    while (i < n1 && j < n2) {
      val xv = xk.getLong(i)
      val yv = yk.getLong(j)
      if (xv == yv) { s += xc.getLong(i) * yc.getLong(j); i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (xk, xc, yk, yc) => {
      val n1 = ctx.freshName("n1")
      val n2 = ctx.freshName("n2")
      val s  = ctx.freshName("s")
      val i  = ctx.freshName("i")
      val j  = ctx.freshName("j")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $n1 = $xk.numElements();
         |int $n2 = $yk.numElements();
         |long $s = 0L;
         |int $i = 0;
         |int $j = 0;
         |while ($i < $n1 && $j < $n2) {
         |  long $xv = $xk.getLong($i);
         |  long $yv = $yk.getLong($j);
         |  if ($xv == $yv) { $s += $xc.getLong($i) * $yc.getLong($j); $i++; $j++; }
         |  else if ($xv < $yv) { $i++; }
         |  else { $j++; }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird, fourth = newFourth)
}
