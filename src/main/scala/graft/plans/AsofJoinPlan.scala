package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** As-of join as a first-class operator: for each left row, the single right
  * row with the greatest `rightTime <= leftTime` among rows sharing the join
  * key (inner semantics — unmatched left rows drop).
  *
  * This is the one operator in the engine whose semantics Spark's built-in
  * operators cannot execute without materializing every (left, right)
  * candidate pair first (join + row_number + filter — see
  * `Analytics.asofJoin`, kept as the oracle-checked reference formulation).
  * The custom plan needs only one pass: both sides hash-cluster on the key
  * and sort by (key, time), then a per-partition merge holds ONE right row —
  * O(|L| + |R|) with no pair blow-up, the shape that survives 100 TB.
  *
  * Wiring: logical node -> [[AsofJoinStrategy]] (injected through
  * `SparkSessionExtensions`, see `graft.functions.GraftExtensions`) ->
  * [[AsofJoinExec]]. Catalyst's EnsureRequirements inserts the exchanges and
  * sorts the exec declares, so AQE still plans the shuffles.
  */
case class AsofJoin(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    rightTiebreaks: Seq[Expression]) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output
  override protected def withNewChildrenInternal(newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoin =
    copy(left = newLeft, right = newRight)
}

class AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoin(l, r, lk, rk, lt, rt, tb) =>
      AsofJoinExec(lk, rk, lt, rt, tb, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Per-partition streaming merge. Ties on `rightTime` resolve to the row
  * latest in `rightTiebreaks` order (the last of the sorted run).
  */
case class AsofJoinExec(
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    rightTiebreaks: Seq[Expression],
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(leftKeys), ClusteredDistribution(rightKeys))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys ++ (rightTime +: rightTiebreaks)).map(SortOrder(_, Ascending)))

  override protected def withNewChildrenInternal(newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(leftKeys, lOut)
      val rKeyProj = UnsafeProjection.create(rightKeys, rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(leftKeys.map(_.dataType))
      val lTimeB = BindReferences.bindReference(leftTime, lOut)
      val rTimeB = BindReferences.bindReference(rightTime, rOut)
      val resultProj = UnsafeProjection.create(output, output)
      val joined = new JoinedRow
      val rBuf = rIter.buffered
      // the single held candidate: the last right row consumed, with its key
      var heldKey: UnsafeRow = null
      var heldRow: InternalRow = null
      lIter.flatMap { lrow =>
        val lk = lKeyProj(lrow)
        val ltAny = lTimeB.eval(lrow)
        // null times never match (SQL comparison semantics, like the window
        // formulation's oms <= tms). Tracked as a flag, not a sentinel: a
        // sentinel like Long.MinValue is also a legal time, and a right row
        // at exactly that value must not match a null-time left row.
        val ltIsNull = ltAny == null
        val lt = if (ltIsNull) 0L else ltAny.asInstanceOf[Long]
        var advancing = !ltIsNull
        while (advancing && rBuf.hasNext) {
          val rk = rKeyProj(rBuf.head)
          val cmp = keyOrd.compare(rk, lk)
          // null right times sort first (asc nulls-first): consume but never
          // hold them, so they can never surface as a match for any key
          val rtAny = if (cmp <= 0) rTimeB.eval(rBuf.head) else null
          if (cmp < 0 || (cmp == 0 &&
              (rtAny == null || rtAny.asInstanceOf[Long] <= lt))) {
            val r = rBuf.next()
            if (rtAny != null) {
              heldKey = rKeyProj(r).copy()
              heldRow = r.copy()
            }
          } else {
            advancing = false
          }
        }
        // NULL keys never match (equi-join semantics, same as the window
        // formulation's user_id === o_custkey) — the natural ordering would
        // otherwise compare nulls as equal and pair null-keyed rows
        if (!ltIsNull && !lk.anyNull && heldRow != null && !heldKey.anyNull &&
            keyOrd.compare(heldKey, lk) == 0 &&
            rTimeB.eval(heldRow).asInstanceOf[Long] <= lt) {
          Iterator.single(resultProj(joined(lrow, heldRow)))
        } else {
          Iterator.empty
        }
      }
    }
  }
}
