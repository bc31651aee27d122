package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** As-of join as a FULL custom operator — logical node + planner strategy +
  * physical exec (guide path (c): `LogicalPlan` + `SparkStrategy` +
  * `SparkPlan`). Semantics identical to [[graft.operators.AsOfJoin]] (and to
  * DuckDB's `ASOF LEFT JOIN`, which the oracle checks): for each left row,
  * the LATEST right row with `right.ts <= left.ts` in the same key group;
  * unmatched left rows carry nulls.
  *
  * The physical operator declares `ClusteredDistribution` on the key and a
  * (key, ts) `requiredChildOrdering` — EnsureRequirements injects the
  * exchanges/sorts exactly as for a sort-merge join — then streams both
  * sides through a single forward merge per partition: O(n+m), one buffered
  * right row, no per-key materialization. Compared to the union+window
  * formulation this halves the sorted volume (no tag column, no null-padded
  * union rows) and never buffers a window frame.
  *
  * Restrictions (by construction, asserted in the API): integral/timestamp
  * key and ts columns, non-null keys, distinct column names across sides.
  */
case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Attribute, rightKey: Attribute,
    leftTs: Attribute, rightTs: Attribute) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lts, rts) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lts, rts) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Attribute, rightKey: Attribute,
    leftTs: Attribute, rightTs: Attribute) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    // the right side ALSO sorts on its (orderable) payload columns: the
    // merge overwrites its candidate on every admissible row, so the last
    // row among duplicate (key, ts) — now deterministically the MAX in
    // right.output column order — wins. This makes THIS operator's winner
    // stable across partition layouts (a bare (key, ts) sort is unstable
    // between equal rows — caught by AsOfPropertySpec). Note the composed
    // operator breaks the same tie by the CALLER's payload-struct order
    // over only the selected payload columns, so the two operators agree
    // on the winner only when the payload is the full right output in
    // output order; each is deterministic on its own terms either way.
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)) ++
      right.output
        .filterNot(a => a.exprId == rightKey.exprId || a.exprId == rightTs.exprId)
        .filter(a => org.apache.spark.sql.catalyst.expressions.RowOrdering
          .isOrderable(a.dataType))
        .map(a => SortOrder(a, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val out = output
    val lk = BindReferences.bindReference(leftKey: Expression, lOut)
    val lt = BindReferences.bindReference(leftTs: Expression, lOut)
    val rk = BindReferences.bindReference(rightKey: Expression, rOut)
    val rt = BindReferences.bindReference(rightTs: Expression, rOut)
    val rightWidth = rOut.size
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // bind the right side as NULLABLE regardless of its input schema: an
      // unmatched left row pairs with an all-null right row, and a
      // projection bound against non-nullable right attributes would skip
      // the null checks and read 0/0.0 out of it (caught by
      // AsOfPropertySpec with a non-nullable toDF input)
      val proj = UnsafeProjection.create(out,
        lOut ++ rOut.map(_.withNullability(true)))
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rightWidth)
      var rHead: InternalRow = null
      var lastMatch: InternalRow = null
      var lastMatchKey = 0L

      new Iterator[InternalRow] {
        override def hasNext: Boolean = lIter.hasNext
        override def next(): InternalRow = {
          val lrow = lIter.next()
          val kAny = lk.eval(lrow)
          val tsAny = lt.eval(lrow)
          // null key or ts: never matches (sorted NULLS FIRST, so no right
          // rows are consumed out of order either)
          if (kAny == null || tsAny == null) return proj(joined(lrow, nullRight))
          val k = kAny.asInstanceOf[Long]
          val ts = tsAny.asInstanceOf[Long]
          var done = false
          while (!done) {
            if (rHead == null) {
              if (rIter.hasNext) rHead = rIter.next() else done = true
            }
            if (rHead != null) {
              val rkAny = rk.eval(rHead)
              val rtAny = rt.eval(rHead)
              if (rkAny == null || rtAny == null) {
                rHead = null // null-keyed right rows match nothing; skip
              } else {
                val rkv = rkAny.asInstanceOf[Long]
                if (rkv < k || (rkv == k && rtAny.asInstanceOf[Long] <= ts)) {
                  if (rkv == k) { lastMatch = rHead.copy(); lastMatchKey = rkv }
                  rHead = null // consumed (older key or candidate match)
                } else done = true
              }
            }
          }
          val m = if (lastMatch != null && lastMatchKey == k) lastMatch else nullRight
          proj(joined(lrow, m))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** User-facing API for the native as-of join. */
object AsOfJoinNative {
  def asOf(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String, leftTs: String, rightTs: String): DataFrame = {
    val spark = left.sparkSession
    GraftColumnBridge.addStrategy(spark, AsOfJoinStrategy)
    val lp = left.queryExecution.analyzed
    val rp = right.queryExecution.analyzed
    require(lp.output.map(_.name).intersect(rp.output.map(_.name)).isEmpty,
      "rename columns so the two sides share no names")
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n)
        .getOrElse(throw new IllegalArgumentException(s"column $n not found"))
    val (lk, rk, lts, rts) =
      (attr(lp, leftKey), attr(rp, rightKey), attr(lp, leftTs), attr(rp, rightTs))
    // the merge evaluates keys/timestamps as primitive longs; reject other
    // types up front instead of failing mid-query (null keys/timestamps are
    // handled in the exec: such rows never match)
    import org.apache.spark.sql.types.{LongType, TimestampType}
    Seq(lk, rk, lts, rts).foreach { a =>
      require(a.dataType == LongType || a.dataType == TimestampType,
        s"as-of native requires bigint/timestamp columns; ${a.name} is ${a.dataType}")
    }
    // bigint-vs-timestamp must agree ACROSS sides too: a millisecond bigint
    // merged against a microsecond timestamp would silently mismatch
    require(lts.dataType == rts.dataType,
      s"timestamp types differ: ${lts.name} is ${lts.dataType}, ${rts.name} is ${rts.dataType}")
    require(lk.dataType == rk.dataType,
      s"key types differ: ${lk.name} is ${lk.dataType}, ${rk.name} is ${rk.dataType}")
    GraftColumnBridge.ofRows(spark,
      AsOfJoinPlan(lp, rp, lk, rk, lts, rts))
  }
}
