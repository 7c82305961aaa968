package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, AttributeReference, BindReferences, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graftops.PlanUtils
import org.apache.spark.sql.internal.SQLConf

/** A native as-of join operator — the one whole-operator semantic Spark's
  * built-ins genuinely lack (SURVEY.md §7.3 tier (c)): for every left row,
  * attach the values of the LATEST right row of the same key with
  * `right.time <= left.time`, null when none exists.
  *
  * Physical shape: both sides hash-clustered on the key and sorted by
  * (key, time) — EnsureRequirements inserts the exchanges/sorts — then a
  * single streaming two-pointer merge per co-partition pair: O(|L| + |R|)
  * per partition, O(1) state (the currently-held right row). That is the
  * same plan a purpose-built time-series engine runs, and it neither
  * materializes a quadratic range join nor re-sorts a unioned table (the
  * composition-based `ticks_asof_bars` keeps the built-in formulation for
  * comparison).
  *
  * The operator registers through [[graft.GraftExtensions]]
  * (`injectPlannerStrategy`) or at runtime via `experimental.extraStrategies`.
  */
object AsofJoin {

  /** DataFrame-facing builder: left as-of right on `key`, with
    * `leftTimeCol >= rightTimeCol`. Output = left columns followed by the
    * right side's value columns (right key/time dropped, made nullable).
    * Right value column names must not collide with left names.
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
      leftTimeCol: String, rightTimeCol: String): DataFrame = {
    val spark = left.sparkSession
    graft.GraftExtensions.register(spark)
    // re-alias the right side so shared lineage (e.g. bars derived from the
    // same tick scan) cannot surface duplicate expression ids in the node
    val r = right.select(right.columns.map(c => col(c).as(c)): _*)
    val lPlan = left.queryExecution.analyzed
    val rPlan = r.queryExecution.analyzed
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"column $name not found in ${plan.output.map(_.name)}"))
    val rk = attr(rPlan, key)
    val rt = attr(rPlan, rightTimeCol)
    val rightValueInputs = rPlan.output
      .filterNot(a => a.exprId == rk.exprId || a.exprId == rt.exprId)
    val rightValueOutput = rightValueInputs
      .map(a => AttributeReference(a.name, a.dataType, nullable = true)())
    PlanUtils.ofRows(spark,
      AsofJoinNode(lPlan, rPlan,
        attr(lPlan, key), attr(lPlan, leftTimeCol), rk, rt,
        rightValueInputs, rightValueOutput))
  }
}

/** Logical as-of join. Output attributes for the right value columns are
  * fresh (new expression ids) and are node PARAMETERS, not derived — they
  * must stay stable across optimizer copies or parent references break.
  * `rightValueInputs` being a constructor expression field makes them part
  * of `references`, so column pruning keeps them alive in the right child.
  */
case class AsofJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Attribute,
    leftTime: Attribute,
    rightKey: Attribute,
    rightTime: Attribute,
    rightValueInputs: Seq[Attribute],
    rightValueOutput: Seq[Attribute])
  extends BinaryNode {

  override def output: Seq[Attribute] = left.output ++ rightValueOutput

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rightValueOutput)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Optimizer rule: push a Filter that references only LEFT-side columns
  * below [[AsofJoinNode]]. Sound because the as-of match of each left row
  * depends only on that row's (key, time) and the right side — never on
  * other left rows — so dropping left rows early cannot change any
  * surviving row's match. Catalyst's own PushDownPredicates cannot see
  * through a foreign node, so without this rule a `symbol = 'X'` filter
  * above an as-of join would scan and merge the whole left table.
  */
object PushFilterThroughAsofJoin
  extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan]
  with org.apache.spark.sql.catalyst.expressions.PredicateHelper {

  import org.apache.spark.sql.catalyst.expressions.{And, AttributeSet}
  import org.apache.spark.sql.catalyst.plans.logical.Filter

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case f @ Filter(cond, j: AsofJoinNode) if cond.deterministic =>
      // push the left-only conjuncts below the join, keep the rest above
      val (push, keep) = splitConjunctivePredicates(cond)
        .partition(_.references.subsetOf(AttributeSet(j.left.output)))
      if (push.isEmpty) f
      else {
        val pushed = j.copy(left = Filter(push.reduce(And), j.left))
        if (keep.isEmpty) pushed else Filter(keep.reduce(And), pushed)
      }
  }
}

/** Plans [[AsofJoinNode]] onto [[AsofJoinExec]]. */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n: AsofJoinNode =>
      AsofJoinExec(planLater(n.left), planLater(n.right),
        n.leftKey, n.leftTime, n.rightKey, n.rightTime,
        n.rightValueInputs, n.output) :: Nil
    case _ => Nil
  }
}

case class AsofJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Attribute,
    leftTime: Attribute,
    rightKey: Attribute,
    rightTime: Attribute,
    rightValueInputs: Seq[Attribute],
    override val output: Seq[Attribute])
  extends BinaryExecNode {

  // Well-formed SQLMetrics (strongly referenced by the plan node, so task
  // updates always resolve on the driver) — numOutputRows is the standard
  // join metric; numMatchedRows counts left rows that found an as-of match.
  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows"  -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numMatchedRows" -> SQLMetrics.createMetric(sparkContext, "number of matched rows"))

  // pin the partition count so AQE cannot coalesce the two shuffles
  // differently (the merge zips co-partitions one-to-one)
  override def requiredChildDistribution: Seq[Distribution] = {
    val n = Some(SQLConf.get.numShufflePartitions)
    Seq(ClusteredDistribution(Seq(leftKey), requiredNumPartitions = n),
      ClusteredDistribution(Seq(rightKey), requiredNumPartitions = n))
  }

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val keyOrdering  = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val timeOrdering = TypeUtils.getInterpretedOrdering(leftTime.dataType)
    val lKeyRef  = BindReferences.bindReference(leftKey: org.apache.spark.sql.catalyst.expressions.Expression, left.output)
    val lTimeRef = BindReferences.bindReference(leftTime: org.apache.spark.sql.catalyst.expressions.Expression, left.output)
    val rKeyRef  = BindReferences.bindReference(rightKey: org.apache.spark.sql.catalyst.expressions.Expression, right.output)
    val rTimeRef = BindReferences.bindReference(rightTime: org.apache.spark.sql.catalyst.expressions.Expression, right.output)
    val rightValueAttrs = rightValueInputs
    val numValues = rightValueAttrs.length
    val numOutputRows  = longMetric("numOutputRows")
    val numMatchedRows = longMetric("numMatchedRows")

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val valueProj = UnsafeProjection.create(rightValueAttrs, right.output)
      // the joined row is already laid out in output order (left columns,
      // then projected right values), so bind the output against itself
      val outProj = UnsafeProjection.create(output, output)
      val nullRow   = new GenericInternalRow(numValues)
      val joined    = new JoinedRow()

      val rBuf = rIter.buffered
      var heldKey: Any                 = null
      var heldValues: InternalRow      = null

      lIter.map { lRow =>
        val lKey  = lKeyRef.eval(lRow)
        val lTime = lTimeRef.eval(lRow)
        // null keys/times match nothing (SQL join semantics); they sort
        // first under Spark's null-first ascending order, so no right
        // rows are consumed on their behalf
        if (lKey == null || lTime == null) {
          numOutputRows += 1
          outProj(joined(lRow, nullRow))
        } else {
          // advance the right side while its (key, time) <= (lKey, lTime)
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val rHead = rBuf.head
            val rKey  = rKeyRef.eval(rHead)
            if (rKey == null) rBuf.next() // skip unmatched null-key rows
            else {
              val kCmp = keyOrdering.asInstanceOf[Ordering[Any]].compare(rKey, lKey)
              val rTime = if (kCmp == 0) rTimeRef.eval(rHead) else null
              if (kCmp < 0 || (kCmp == 0 && rTime != null
                  && timeOrdering.asInstanceOf[Ordering[Any]].compare(rTime, lTime) <= 0)) {
                // copy both: the underlying UnsafeRow buffer is reused on next()
                heldKey = InternalRow.copyValue(rKey)
                heldValues = valueProj(rHead).copy()
                rBuf.next()
              } else if (kCmp == 0 && rTime == null) rBuf.next() // null time: no match
              else advancing = false
            }
          }
          val matched = heldValues != null &&
            keyOrdering.asInstanceOf[Ordering[Any]].compare(heldKey, lKey) == 0
          if (matched) numMatchedRows += 1
          numOutputRows += 1
          outProj(joined(lRow, if (matched) heldValues else nullRow))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)
}
