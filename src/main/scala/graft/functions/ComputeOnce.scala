package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.DataType

/** Evaluation barrier for an EXPENSIVE deterministic expression: a
  * transparent pass-through that reports `deterministic = false`, so the
  * optimizer may not inline it into join conditions, push filters
  * through it, or collapse it into downstream projections — the exact
  * duplication class the optimization guide documents for expensive
  * UDFs (its §"mark expensive UDFs non-deterministic"), here for native
  * expressions.
  *
  * Motivating defect (r19 plan audit): every per-pair verify spelled
  *
  *   .withColumn("score", expr("<native_loop>(a, b)"))
  *   .filter(predicate(score))        // score referenced 1-2x
  *   .select(..., f(score))           // and once more in the output
  *
  * and project-collapse + filter-into-join pushdown re-inlined the
  * native two-pointer loop at EVERY reference — `dot_sorted` ran 3x per
  * candidate pair in dedup_cosine's join condition + projection,
  * `jaccard_sorted`/`overlap_sorted` 2-3x in every verify consumer.
  * Wrapping just the expensive call keeps it evaluated once per row;
  * the value is genuinely deterministic, so blocked re-ordering
  * optimizations lose nothing and task retries stay exact.
  */
case class ComputeOnce(child: Expression) extends UnaryExpression {

  override lazy val deterministic: Boolean = false

  override def dataType: DataType = child.dataType

  override def nullable: Boolean = child.nullable

  override def eval(input: InternalRow): Any = child.eval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }

  override protected def withNewChildInternal(newChild: Expression): ComputeOnce =
    copy(child = newChild)

  override def prettyName: String = "compute_once"
}

object ComputeOnce {
  /** Wrap a Column so its expression evaluates once per row. */
  def once(c: Column): Column =
    org.apache.spark.sql.graftops.PlanUtils.columnOf(
      ComputeOnce(org.apache.spark.sql.graftops.PlanUtils.expressionOf(c)))
}
