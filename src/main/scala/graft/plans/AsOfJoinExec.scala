package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** Physical as-of join: one hash shuffle per side on the key, one
  * in-partition sort per side on (key, time), then a single streaming merge
  * pass — the same exchange/sort cost as a sort-merge equi-join, with O(1)
  * state per partition (one buffered right row + one candidate).
  *
  * Contrast with the composed `operators.AsOfJoin.asOf` (union + window
  * `last(_, ignoreNulls)`): same two shuffles, but the window operator
  * buffers whole frames and the union doubles the row width with null
  * padding. Here each side keeps its own schema end-to-end and the merge
  * never materializes a frame. Skew story is unchanged (salt the key).
  *
  * Merge invariant: both inputs sorted by (key ASC, time ASC) — rights also
  * by tiebreak ASC so "last consumed" = largest tiebreak at equal times.
  * For each left row, consume rights while rKey < lKey, or rKey == lKey and
  * rTime <= lTime; the last consumed right with rKey == lKey is the match
  * (inclusive-backward as-of). Null keys and times never match, mirroring
  * SQL join-key semantics and the composed operator.
  */
case class AsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    rightTiebreak: Expression,
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTime, Ascending)
      :+ SortOrder(rightTiebreak, Ascending))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  protected override def doExecute(): RDD[InternalRow] = {
    // local (not a member): the partition closure must capture expressions
    // only, never `this` — serializing the exec would drag the plan tree.
    // Returns the raw eval (null or boxed integral) — the merge loop
    // evaluates once per row into locals instead of allocating Options.
    def timeOf(e: Expression, input: Seq[Attribute]): InternalRow => Any = {
      val bound = BindReferences.bindReference(e, input)
      row => bound.eval(row)
    }
    val lOut = left.output
    val rOut = right.output
    val lKeys = leftKeys
    val rKeys = rightKeys
    val lTime = leftTime
    val rTime = rightTime
    val outAttrs = output
    // bound on the driver; the closures capture only serializable
    // expression trees, not this exec node
    val lTimeOf = timeOf(lTime, lOut)
    val rTimeOf = timeOf(rTime, rOut)

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeys, lOut)
      val rKeyProj = UnsafeProjection.create(rKeys, rOut)
      val keyOrd: Ordering[InternalRow] =
        RowOrdering.createNaturalAscendingOrdering(lKeys.map(_.dataType))
      val joined = new JoinedRow
      // bind against NULLABLE right attributes: an unmatched left row joins
      // the all-null row, and a non-nullable binding would elide the null
      // check and read garbage zeros out of it
      val outProj = UnsafeProjection.create(outAttrs,
        lOut ++ rOut.map(_.withNullability(true)))
      val nullRight = new GenericInternalRow(rOut.size)

      new Iterator[InternalRow] {
        // lookahead right row: references the iterator's current object —
        // valid until the next rIter.next(), which only happens on consume
        private var rRow: InternalRow = _
        private var rHasRow = false
        private def advanceRight(): Unit = {
          rHasRow = rIter.hasNext
          rRow = if (rHasRow) rIter.next() else null
        }
        advanceRight()

        // candidate: last consumed right row for some key (copied — it must
        // outlive the lookahead); candKey is its copied key projection
        private var cand: InternalRow = _
        private var candKey: UnsafeRow = _

        override def hasNext: Boolean = lIter.hasNext

        private def asLong(v: Any): Long = v match {
          case l: Long => l
          case i: Int  => i.toLong
          case other   => throw new IllegalStateException(
            s"as-of time must be timestamp/long, got $other")
        }

        override def next(): InternalRow = {
          val lRow = lIter.next()
          val lKey = lKeyProj(lRow)
          val lTRaw = lTimeOf(lRow)
          val leftJoinable = !lKey.anyNull && lTRaw != null
          val lT = if (leftJoinable) asLong(lTRaw) else 0L
          var done = !rHasRow
          while (!done) {
            val rKey = rKeyProj(rRow)
            val rTRaw = rTimeOf(rRow) // once per row, no Option boxing
            val rJoinable = !rKey.anyNull && rTRaw != null
            val cmp = keyOrd.compare(rKey, lKey)
            // null-key or null-time rights can never match ANY left row:
            // consume them whenever their key group is reached, or they
            // would stall the merge and starve the rest of their group
            val consume =
              if (cmp < 0) true
              else if (cmp > 0) false
              else if (!rJoinable) true
              else leftJoinable && asLong(rTRaw) <= lT
            if (consume) {
              if (rJoinable && cmp == 0) {
                cand = rRow.copy()
                candKey = rKey.copy()
              }
              advanceRight()
              done = !rHasRow
            } else done = true
          }
          val matched = leftJoinable && cand != null && candKey == lKey
          outProj(joined(lRow, if (matched) cand else nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
