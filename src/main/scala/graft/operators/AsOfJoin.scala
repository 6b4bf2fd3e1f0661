package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, attach the latest right row with the
  * same key whose time is <= the left row's time — the temporal-join
  * operator Spark lacks natively (preference (a) of the build brief:
  * compose built-ins before reaching for a custom SparkPlan).
  *
  * Composition: union both sides tagged, one window pass per key ordered
  * by (time, side, right-tiebreak) carrying `last(rightStruct,
  * ignoreNulls)` over the unbounded-preceding frame, keep left rows.
  * Right rows sort before left rows at equal times, so an
  * exactly-simultaneous right row IS visible to the left row (standard
  * as-of `<=` semantics); equal right times are resolved by the caller's
  * tiebreak column (latest wins).
  *
  * Scale: ONE shuffle on the key + one in-partition sort — same cost as a
  * sort-merge join, no range explosion, no per-key collect. Skewed keys:
  * salt the key or range-partition time before the window if one key
  * dominates.
  */
object AsOfJoin {

  /** Output: all left columns + `asof_<name>` per carried right value
    * (null when no right row precedes the left row). */
  def asOf(left: DataFrame, right: DataFrame,
           leftKey: Column, rightKey: Column,
           leftTime: Column, rightTime: Column,
           rightVals: Seq[(String, Column)],
           rightTiebreak: Column): DataFrame = {
    val payload = struct(rightVals.map { case (n, c) => c.as(n) }: _*)
    val payloadType = right.select(payload.as("p")).schema.head.dataType

    val lhs = left.select(
      leftKey.as("_k"), leftTime.as("_t"), lit(1).as("_side"),
      lit(Long.MaxValue).as("_tb"),
      lit(null).cast(payloadType).as("_r"),
      struct(left.columns.map(left(_)): _*).as("_l"))
    val rhs = right.select(
      rightKey.as("_k"), rightTime.as("_t"), lit(0).as("_side"),
      rightTiebreak.cast("long").as("_tb"),
      payload.as("_r"),
      lit(null).cast(lhs.select(col("_l")).schema.head.dataType).as("_l"))

    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_t"), col("_side"), col("_tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    lhs.unionByName(rhs)
      .withColumn("_carried", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(left.columns.map(c => col(s"_l.$c").as(c)) ++
        rightVals.map { case (n, _) => col(s"_carried.$n").as(s"asof_$n") }: _*)
  }

  /** Native as-of join — the custom whole-operator path (preference (c)):
    * `plans.AsOfJoinPlan` → `GraftStrategy` → `plans.AsOfJoinExec`, a
    * single streaming merge per co-partitioned sorted partition instead of
    * the union + window composition above (same two shuffles, no window
    * frame buffering, each side keeps its own schema).
    *
    * Columns are resolved BY NAME against each side; disambiguate by
    * renaming before the call (output = left columns ++ right columns, so
    * shared names would be ambiguous downstream). Semantics are identical
    * to `asOf` — AsOfJoinSpec pins the two paths row-for-row equal. */
  def asOfNative(left: DataFrame, right: DataFrame,
                 keyCol: String, timeCol: String,
                 rightKeyCol: String, rightTimeCol: String,
                 rightTiebreakCol: String): DataFrame = {
    val spark = left.sparkSession
    graft.plans.GraftStrategy.install(spark)
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val lPlan = ColumnBridge.analyzed(left)
    val rPlan = ColumnBridge.analyzed(right)
    def attr(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
             name: String) =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column '$name' not found among ${plan.output.map(_.name).mkString(", ")}"))
    val (lt, rt) = (attr(lPlan, timeCol), attr(rPlan, rightTimeCol))
    val (lk, rk) = (attr(lPlan, keyCol), attr(rPlan, rightKeyCol))
    // fail-fast guards: each of these would otherwise produce silently
    // wrong data, not an error —
    // 1. mismatched time types compare raw internal values (micros vs
    //    seconds);
    require(lt.dataType == rt.dataType,
      s"as-of time types differ: ${lt.dataType} vs ${rt.dataType}")
    // 1b. time type must be one the exec's asLong ordering handles —
    //     otherwise (e.g. two StringType time columns) analysis would
    //     pass and every row would throw mid-job in asLong; fail at
    //     call time like the other guards
    require({
      import org.apache.spark.sql.types._
      Seq(TimestampType, TimestampNTZType, DateType, LongType, IntegerType)
        .contains(lt.dataType)
    }, s"as-of time type must be timestamp/date/long/int, not ${lt.dataType}")
    // 2. mismatched key types make the merge ordering read garbage (the
    //    ordering is built from the LEFT key type and applied to both);
    require(lk.dataType == rk.dataType,
      s"as-of key types differ: ${lk.dataType} vs ${rk.dataType}")
    // 3. float keys skip the optimizer's NormalizeFloatingNumbers (it only
    //    rewrites built-in Join/Aggregate/Window), so -0.0/0.0 and NaN
    //    would mis-compare;
    require(lk.dataType != org.apache.spark.sql.types.DoubleType &&
        lk.dataType != org.apache.spark.sql.types.FloatType,
      s"as-of keys must be integral/string/etc, not ${lk.dataType} (float " +
        "normalization is undefined for the custom exec)")
    // 4. shared attribute ids (self-join without re-aliasing) bind right
    //    output columns to LEFT ordinals — right columns silently mirror
    //    left values.
    require(lPlan.outputSet.intersect(rPlan.outputSet).isEmpty,
      "left and right share attribute ids (self-join?); re-alias every " +
        "right column (e.g. df.select(cols renamed)) before asOfNative")
    ColumnBridge.ofRows(spark, graft.plans.AsOfJoinPlan(
      lPlan, rPlan, Seq(lk), Seq(rk), lt, rt, attr(rPlan, rightTiebreakCol)))
  }
}
