package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** Point-in-interval (range) join, scale-safe by bucket decomposition.
  *
  * Spark has no native range-join operator: `points.join(intervals,
  * t >= s && t <= e)` plans as a broadcast-nested-loop (or cartesian)
  * theta-join — quadratic work that dies at scale. The classic fix
  * (interval-bucketing, as in Spark's own stream-stream time-interval
  * join state layout) re-expresses it as an EQUI-join:
  *
  *  - each point maps to the single width-`w` bucket containing `t`;
  *  - each interval explodes to every bucket it overlaps
  *    (`floor(s/w) .. floor(e/w)` — `ceil(span/w)+1` rows, a bounded,
  *    chosen fan-out);
  *  - a hash shuffle (or broadcast) equi-join on the bucket id meets
  *    every (point, interval) pair whose ranges can intersect, and the
  *    exact `BETWEEN` predicate keeps true matches.
  *
  * Each point lives in exactly one bucket, so a matching pair meets
  * exactly once — no dedup pass. Pick `bucketWidth` near the typical
  * interval span: fan-out stays ≈ 2 while each bucket holds only the
  * points that can possibly match. Both shuffles are on a single long
  * key; skew from hot buckets is visible to (and split by) AQE.
  *
  * Inputs must come from distinct plans (self-joins need aliased legs —
  * Spark's ambiguous-attribute rules, same as any equi-join). Time/bound
  * columns must be integral (epoch seconds/days/...); callers convert
  * timestamps first — same fail-fast contract as AsOfJoin.
  */
object RangeJoin {

  private val integral = Set[org.apache.spark.sql.types.DataType](
    ByteType, ShortType, IntegerType, LongType)

  /** All (point, interval) pairs with `start ≤ t ≤ end` (inclusive both
    * ends). Output = point columns ++ interval columns. */
  def pointInInterval(points: DataFrame, tCol: Column,
                      intervals: DataFrame, startCol: Column, endCol: Column,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    def dtype(df: DataFrame, c: Column) = df.select(c).schema.head.dataType
    Seq("t" -> dtype(points, tCol), "start" -> dtype(intervals, startCol),
        "end" -> dtype(intervals, endCol)).foreach { case (role, dt) =>
      require(integral.contains(dt),
        s"range-join $role column must be integral (epoch-converted), got $dt")
    }
    // Integral floor-div, NOT floor(t / w): Spark's `/` on integrals
    // divides in double, so epoch-like values past 2^53 would bucket
    // imprecisely. (t - pmod(t, w)) is an exact multiple of w (pmod is
    // non-negative), so the truncating IntegralDivide is exact floor
    // division over the full long range.
    def floorDiv(c: Column): Column = {
      val exact = c.cast("long") - pmod(c.cast("long"), lit(bucketWidth))
      org.apache.spark.sql.graftbridge.ColumnBridge.column(
        new org.apache.spark.sql.catalyst.expressions.IntegralDivide(
          org.apache.spark.sql.graftbridge.ColumnBridge.expression(exact),
          org.apache.spark.sql.catalyst.expressions.Literal(bucketWidth)))
    }
    val pts = points.withColumn("_rj_bucket", floorDiv(tCol))
    val ivs = intervals.withColumn("_rj_bucket",
      explode(sequence(floorDiv(startCol), floorDiv(endCol))))
    pts.join(ivs, pts("_rj_bucket") === ivs("_rj_bucket") &&
        tCol >= startCol && tCol <= endCol)
      .drop("_rj_bucket")
  }

  /** Interval-OVERLAP join: all (left, right) pairs whose closed
    * intervals intersect (`ls ≤ re && rs ≤ le`) — the temporal-overlap
    * shape (concurrent sessions, co-occurring windows) that a naive
    * theta-join also plans as a nested loop.
    *
    * Same bucket decomposition as `pointInInterval`, except BOTH sides
    * explode to their overlapped buckets, so an intersecting pair can
    * meet in every shared bucket. Exactly-once output without a distinct
    * pass comes from the RESPONSIBILITY-BUCKET rule: a pair is kept only
    * in the first bucket both occupy, which is the bucket of
    * `max(ls, rs)` (the overlap's left edge — always inside both
    * intervals, so always a shared bucket). The predicate is computable
    * from the joined row alone: no second shuffle, no dedup state.
    *
    * Same integral-column and distinct-plan contracts as
    * `pointInInterval`; fan-out per row is ceil(span/w)+1, so pick `w`
    * near the typical interval span. */
  def intervalOverlap(left: DataFrame, lsCol: Column, leCol: Column,
                      right: DataFrame, rsCol: Column, reCol: Column,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    def dtype(df: DataFrame, c: Column) = df.select(c).schema.head.dataType
    Seq("left start" -> dtype(left, lsCol), "left end" -> dtype(left, leCol),
        "right start" -> dtype(right, rsCol), "right end" -> dtype(right, reCol))
      .foreach { case (role, dt) =>
        require(integral.contains(dt),
          s"overlap-join $role column must be integral (epoch-converted), got $dt")
      }
    def floorDiv(c: Column): Column = {
      val exact = c.cast("long") - pmod(c.cast("long"), lit(bucketWidth))
      org.apache.spark.sql.graftbridge.ColumnBridge.column(
        new org.apache.spark.sql.catalyst.expressions.IntegralDivide(
          org.apache.spark.sql.graftbridge.ColumnBridge.expression(exact),
          org.apache.spark.sql.catalyst.expressions.Literal(bucketWidth)))
    }
    val l = left.withColumn("_rj_bucket",
      explode(sequence(floorDiv(lsCol), floorDiv(leCol))))
    val r = right.withColumn("_rj_bucket",
      explode(sequence(floorDiv(rsCol), floorDiv(reCol))))
    l.join(r, l("_rj_bucket") === r("_rj_bucket") &&
        lsCol <= reCol && rsCol <= leCol &&
        l("_rj_bucket") === floorDiv(greatest(lsCol, rsCol)))
      .drop("_rj_bucket")
  }
}
