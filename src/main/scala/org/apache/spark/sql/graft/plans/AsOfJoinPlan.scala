package org.apache.spark.sql.graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/**
 * Whole-operator as-of join as a first-class Catalyst citizen
 * (preference rung (c) of the builder guide: custom LogicalPlan +
 * Strategy + SparkPlan): for each left row, attach the most recent
 * right row with rightTime <= leftTime, per equi-key.
 *
 * The physical operator declares ClusteredDistribution on the keys and
 * a (keys, time, tie) sort for both children, so EnsureRequirements
 * inserts the co-partitioning exchanges and sorts; execution is then a
 * single forward merge per partition — no window state, no row
 * carrying, strictly one pass. This is the plan shape a native engine
 * would pick, and it exists alongside the composed window
 * implementation (graft.operators.AsOfJoin) which remains the default;
 * equivalence is asserted by differential tests.
 */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    rightTie: Expression,
    rightValues: Seq[Attribute]) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ rightValues.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    rightTie: Expression,
    rightValues: Seq[Attribute]) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ rightValues.map(_.withNullability(true))

  override lazy val metrics = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"),
    "numMatched" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "left rows with an as-of match"))

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(leftKeys), ClusteredDistribution(rightKeys))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) ++
      Seq(SortOrder(rightTime, Ascending), SortOrder(rightTie, Ascending)))

  override protected def doExecute(): RDD[InternalRow] = {
    val leftOut = left.output
    val rightOut = right.output
    val lKeys = leftKeys
    val rKeys = rightKeys
    val lTime = leftTime
    val rTime = rightTime
    val rVals = rightValues
    val outSchema = output
    val numOutputRows = longMetric("numOutputRows")
    val numMatched = longMetric("numMatched")

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeys, leftOut)
      val rKeyProj = UnsafeProjection.create(rKeys, rightOut)
      val lTimeEval = UnsafeProjection.create(Seq(lTime), leftOut)
      val rTimeEval = UnsafeProjection.create(Seq(rTime), rightOut)
      val rValProj = UnsafeProjection.create(rVals, rightOut)
      // bind against NULLABLE right-value attrs: the null-filled row for
      // unmatched left rows must surface as null, not as 0-defaults
      val outProj = UnsafeProjection.create(outSchema,
        leftOut ++ rVals.map(_.withNullability(true)))
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rVals.length)

      val keyOrdering = org.apache.spark.sql.catalyst.expressions.RowOrdering
        .createNaturalAscendingOrdering(lKeys.map(_.dataType))
      val rBuf = rIter.buffered
      // per current left key: the latest right row's values (copied)
      var curKey: InternalRow = null
      var lastVals: InternalRow = null
      var lastValid = false

      lIter.map { lRow =>
        val k = lKeyProj(lRow)
        if (curKey == null || keyOrdering.compare(k, curKey) != 0) {
          curKey = k.copy()
          lastVals = null
          lastValid = false
        }
        val t = lTimeEval(lRow).getLong(0)
        var advancing = true
        while (advancing && rBuf.hasNext) {
          val rk = rKeyProj(rBuf.head)
          val cmp = keyOrdering.compare(rk, curKey)
          if (cmp < 0) { rBuf.next() } // right side behind: discard
          else if (cmp > 0) { advancing = false } // right ahead: stop
          else {
            if (rTimeEval(rBuf.head).getLong(0) <= t) {
              lastVals = rValProj(rBuf.next()).copy()
              lastValid = true
            } else advancing = false
          }
        }
        numOutputRows += 1
        if (lastValid) numMatched += 1
        outProj(joined(lRow, if (lastValid) lastVals else nullRight))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  import org.apache.spark.sql.execution.SparkPlan
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, tie, vals) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tie, vals) :: Nil
    case _ => Nil
  }
}
