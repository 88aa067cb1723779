package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.classic
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Whole-operator as-of join — the tier-(c) extension path: a custom
  * `LogicalPlan` node, a `SparkStrategy` planning it, and a physical
  * `SparkPlan` executing it, registered via `SparkSessionExtensions`
  * (`graft.GraftExtensions`).
  *
  * Semantics: LEFT OUTER as-of — for every left row, the single right
  * row with the same key and the greatest time ≤ the left row's time
  * (nulls on the right when no such row exists). The composition-based
  * twin is `Relational.qAsofJoin`'s union-sort trick; this operator
  * expresses the same merge natively, letting the planner see ONE
  * node with join-shaped requirements instead of a union+window.
  *
  * Physical contract (what makes it scale): both children are
  * hash-clustered on their keys (EnsureRequirements inserts the two
  * exchanges — or reuses existing ones) and sorted (key, time) within
  * partitions; execution is then a single forward merge scan per
  * partition pair — O(|L|+|R|) per partition, no per-key buffering of
  * the left side, and exactly one right row retained at a time, so a
  * key with millions of events costs memory O(1). The same cost shape
  * as a sort-merge join, which is the floor for a co-keyed fact-fact
  * operation at 100 TB.
  */
object AsOfJoin {

  /** Logical node. Children analyzed; key/time expressions must be
    * resolved attributes of the respective child (the public API
    * resolves them via `df.col`).
    */
  case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
                          leftKey: Expression, leftTime: Expression,
                          rightKey: Expression, rightTime: Expression)
    extends BinaryNode {
    override def output: Seq[Attribute] =
      left.output ++ right.output.map(_.withNullability(true))
    override protected def withNewChildrenInternal(
        newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
      copy(left = newLeft, right = newRight)
  }

  /** Planner strategy: one physical candidate, children planned by
    * the framework (`planLater`).
    */
  object Strategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case AsOfJoinPlan(l, r, lk, lt, rk, rt) =>
        AsOfJoinExec(planLater(l), planLater(r), lk, lt, rk, rt) :: Nil
      case _ => Nil
    }
  }

  case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
                          leftKey: Expression, leftTime: Expression,
                          rightKey: Expression, rightTime: Expression)
    extends BinaryExecNode {

    override def output: Seq[Attribute] =
      left.output ++ right.output.map(_.withNullability(true))

    // both sides clustered on the key → co-partitioned exchanges
    override def requiredChildDistribution: Seq[Distribution] =
      ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

    // (key, time) sort within partitions → the merge scan below
    override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
      Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
      Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

    override def outputPartitioning: Partitioning = left.outputPartitioning
    override def outputOrdering: Seq[SortOrder] =
      Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

    override protected def withNewChildrenInternal(
        newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
      copy(left = newLeft, right = newRight)

    override protected def doExecute(): RDD[InternalRow] = {
      val lOut = left.output
      val rOut = right.output
      val lKeyB = BindReferences.bindReference(leftKey, lOut)
      val lTimeB = BindReferences.bindReference(leftTime, lOut)
      val rKeyB = BindReferences.bindReference(rightKey, rOut)
      val rTimeB = BindReferences.bindReference(rightTime, rOut)
      val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
      val timeOrd = TypeUtils.getInterpretedOrdering(leftTime.dataType)
      val rWidth = rOut.size
      val outAttrs = output
      left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
        val rBuf = rIter.buffered
        val nullRight: InternalRow = new GenericInternalRow(rWidth)
        val joined = new JoinedRow
        val proj = UnsafeProjection.create(outAttrs, lOut ++ rOut)
        var haveKey = false
        var curKey: Any = null
        var lastMatch: InternalRow = null
        lIter.map { lRow =>
          val k = lKeyB.eval(lRow)
          val t = lTimeB.eval(lRow)
          if (k == null || t == null) {
            // null key/time never matches (ASOF ON-condition semantics)
            proj(joined(lRow, nullRight))
          } else {
            if (!haveKey || keyOrd.compare(curKey, k) != 0) {
              haveKey = true; curKey = k; lastMatch = null
            }
            var scan = true
            while (scan && rBuf.hasNext) {
              val rk = rKeyB.eval(rBuf.head)
              if (rk == null) { rBuf.next() } // unmatched under ASOF ON
              else {
                val c = keyOrd.compare(rk, k)
                if (c < 0) rBuf.next() // left is past this key for good
                else if (c > 0) scan = false
                else {
                  val rt = rTimeB.eval(rBuf.head)
                  if (rt != null && timeOrd.compare(rt, t) <= 0)
                    lastMatch = rBuf.next().copy() // best so far; may improve
                  else if (rt == null) rBuf.next()
                  else scan = false // future rows for this key: stop, keep best
                }
              }
            }
            proj(joined(lRow, if (lastMatch != null) lastMatch else nullRight))
          }
        }
      }
    }
  }

  /** Public API: as-of join `left` to `right` (LEFT OUTER, most
    * recent right row at or before the left time). Column names are
    * resolved against their own side, so key names may collide
    * across inputs.
    */
  def asof(left: DataFrame, right: DataFrame,
           leftKey: String, leftTime: String,
           rightKey: String, rightTime: String): DataFrame = {
    val session = left.sparkSession.asInstanceOf[classic.SparkSession]
    def attr(df: DataFrame, name: String): Expression =
      Bridge.expression(df.col(name))
    classic.Dataset.ofRows(session, AsOfJoinPlan(
      left.queryExecution.analyzed, right.queryExecution.analyzed,
      attr(left, leftKey), attr(left, leftTime),
      attr(right, rightKey), attr(right, rightTime)))
  }
}
