package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeSet, Expression, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Whole-operator as-of join (SURVEY §2B B8) as a native Catalyst
  * plan: logical node → strategy → merge-scan physical operator.
  *
  * [[graft.operators.AsOfJoin.join]] composes the same semantics from
  * union + carry-forward window — one shuffle on the keys, one
  * partition-local sort, which is already the minimal DATA MOVEMENT.
  * What composition cannot express is the operator's *requirements*:
  * this node declares `requiredChildDistribution` on the join keys and
  * `requiredChildOrdering` on (keys, ts), so inputs that are already
  * co-partitioned (bucketed tables, an upstream aggregate or join on
  * the same keys) plan with NO exchange at all — the union form
  * destroys any such partitioning the moment it concatenates the two
  * sides. At 100 TB against a bucketed reference table, that is the
  * difference between a full shuffle of the fact stream and a
  * zero-exchange merge scan. The merge itself is a single forward pass
  * per partition (no window buffering, no null-padded union rows
  * traveling through the exchange).
  *
  * Semantics (identical to the union+window form, pinned by spec and
  * by q73 vs the q08 oracle): for each left row, append the right
  * row's value columns from the LATEST right row with
  * `right.ts <= left.ts` in the same key group; nulls if none. Rows
  * order per partition: sorted by (keys, ts) — ties between right
  * rows at the same (key, ts) resolve to the sort-last row, exactly
  * like the carry-forward window.
  */
case class AsOfJoinNode(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTs: Expression, rightTs: Expression,
    rightValues: Seq[Attribute]) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ rightValues.map(_.withNullability(true))

  override def references: AttributeSet =
    AttributeSet(leftKeys.flatMap(_.references) ++ rightKeys.flatMap(_.references) ++
      leftTs.references ++ rightTs.references ++ rightValues)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinNode]] into [[AsOfJoinExec]]. Injected via
  * [[graft.sql.GraftExtensions]] (or lazily through
  * `experimentalMethods.extraStrategies` by
  * [[graft.operators.AsOfJoin.joinPlanned]]). */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lts, rts, rv) =>
      AsOfJoinExec(lk, rk, lts, rts, rv, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTs: Expression, rightTs: Expression,
    rightValues: Seq[Attribute],
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ rightValues.map(_.withNullability(true))

  /** Both sides clustered on their keys — EnsureRequirements makes the
    * two hash partitionings compatible (or reuses existing ones: the
    * zero-exchange path this operator exists for). */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  /** (keys…, ts) ascending within every partition — the merge scan's
    * precondition; EnsureRequirements inserts local sorts only where
    * the child isn't already sorted this way. */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTs, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTs, Ascending))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def doExecute(): RDD[InternalRow] = {
    val leftOut = left.output
    val rightOut = right.output
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lTsExpr = leftTs
    val rTsExpr = rightTs
    val rightVals = rightValues
    val keyTypes = leftKeys.map(_.dataType)
    val tsTypes = Seq(leftTs.dataType)

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // (key, ts) projections; orderings are interpreted but run once
      // per row on narrow key rows, not per column of the payload.
      val lKeyProj = UnsafeProjection.create(lKeyExprs, leftOut)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rightOut)
      val lTsProj = UnsafeProjection.create(Seq(lTsExpr), leftOut)
      val rTsProj = UnsafeProjection.create(Seq(rTsExpr), rightOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val tsOrd = RowOrdering.createNaturalAscendingOrdering(tsTypes)
      // bind against a right schema forced nullable: BindReferences takes
      // nullability from the INPUT attribute, and unmatched left rows read
      // from an all-null right row regardless of the source's nullability
      val resultProj = UnsafeProjection.create(
        (leftOut ++ rightVals.map(_.withNullability(true))).map(a => a: Expression),
        leftOut ++ rightOut.map(_.withNullability(true)))
      val nullRight = new GenericInternalRow(rightOut.length)
      val joined = new JoinedRow

      new Iterator[InternalRow] {
        // rHead: next unconsumed right row (safe to hold — the source
        // iterator is only advanced when rHead is consumed or skipped)
        private var rHead: InternalRow = _
        private var rHeadValid = false
        // latest right row whose (key, ts) is <= the current left row,
        // with its key — both defensively copied (iterators reuse rows)
        private var lastMatch: InternalRow = _
        private var lastMatchKey: InternalRow = _

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lKey = lKeyProj(l)
          val lTs = lTsProj(l)
          var done = false
          while (!done) {
            if (!rHeadValid && rIter.hasNext) { rHead = rIter.next(); rHeadValid = true }
            if (!rHeadValid) { done = true }
            else {
              val cmp = keyOrd.compare(rKeyProj(rHead), lKey)
              if (cmp < 0) {
                rHeadValid = false // right key already passed: skip
              } else if (cmp == 0 && tsOrd.compare(rTsProj(rHead), lTs) <= 0) {
                lastMatch = rHead.copy()
                lastMatchKey = rKeyProj(rHead).copy()
                rHeadValid = false
              } else {
                done = true // right side is ahead of this left row
              }
            }
          }
          val matched = lastMatch != null && keyOrd.compare(lastMatchKey, lKey) == 0
          resultProj(joined(l, if (matched) lastMatch else nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
