package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, LongType}

/** Codegen'd Hilbert curve index of a (x, y) grid cell on the
  * 2^bits × 2^bits grid — the native twin of [[graft.operators.Layout]]'s
  * HOF-fold expression. Same recurrence, same integer ops, bit-identical
  * output (`LayoutSpec` law-checks native == fold == oracle); the
  * difference is purely mechanical: the fold evaluates a ~200-node lambda
  * tree interpreted per bit plane per row (HOFs are CodegenFallback and
  * project collapse re-inlines every shared subterm), where this loop is
  * a dozen long ops per plane inside whole-stage codegen.
  *
  * Algorithm: the standard xy2d quadrant-rotation walk, top bit plane
  * down. Per plane i: quadrant (rx, ry) from bit i of (x, y), the
  * quadrant's curve offset `s²·((3·rx) xor ry)` accumulates, and the
  * remaining low-i-bit suffix rotates/reflects into the subquadrant's
  * frame (ry = 0 swaps the axes, rx = 1 also reflects). All values stay
  * non-negative and < 2^(2·bits) ≤ 2⁴⁰, so long math never overflows.
  *
  * Inputs outside [0, 2^bits) are masked to their low `bits` bits — same
  * contract as the fold (callers grid-normalize first; the mask keeps
  * adversarial input from corrupting the walk instead of throwing per
  * row). Null in either coordinate → null.
  */
case class HilbertKey(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {

  require(bits >= 1 && bits <= 20, s"hilbert_key bits must be in [1, 20], got $bits")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"hilbert_key expects (bigint, bigint), got (${left.dataType.sql}, ${right.dataType.sql})")
    }

  private val mask: Long = (1L << bits) - 1

  override def nullSafeEval(a: Any, b: Any): Any = {
    var x = a.asInstanceOf[Long] & mask
    var y = b.asInstanceOf[Long] & mask
    var d = 0L
    var i = bits - 1
    while (i >= 0) {
      val s  = 1L << i
      val rx = if ((x & s) != 0L) 1L else 0L
      val ry = if ((y & s) != 0L) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      val sm = s - 1L
      val xl = x & sm
      val yl = y & sm
      if (ry == 0L) {
        if (rx == 1L) { x = sm - yl; y = sm - xl }
        else { x = yl; y = xl }
      } else { x = xl; y = yl }
      i -= 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (xIn, yIn) => {
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val d = ctx.freshName("d"); val i = ctx.freshName("i")
      val s = ctx.freshName("s"); val rx = ctx.freshName("rx")
      val ry = ctx.freshName("ry"); val sm = ctx.freshName("sm")
      val xl = ctx.freshName("xl"); val yl = ctx.freshName("yl")
      s"""
         |long $x = $xIn & ${mask}L;
         |long $y = $yIn & ${mask}L;
         |long $d = 0L;
         |for (int $i = ${bits - 1}; $i >= 0; $i--) {
         |  long $s = 1L << $i;
         |  long $rx = (($x & $s) != 0L) ? 1L : 0L;
         |  long $ry = (($y & $s) != 0L) ? 1L : 0L;
         |  $d += $s * $s * ((3L * $rx) ^ $ry);
         |  long $sm = $s - 1L;
         |  long $xl = $x & $sm;
         |  long $yl = $y & $sm;
         |  if ($ry == 0L) {
         |    if ($rx == 1L) { $x = $sm - $yl; $y = $sm - $xl; }
         |    else { $x = $yl; $y = $xl; }
         |  } else { $x = $xl; $y = $yl; }
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "hilbert_key"
}
