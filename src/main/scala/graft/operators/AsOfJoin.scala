package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * As-of join: for each left row, attach the most recent right row (by
 * time) with right.time <= left.time, per join key.
 *
 * Implemented with the union + ordered-window trick rather than a
 * per-left-row range join: tag both sides, union, sort within each key
 * by (time, side) with right rows first at equal timestamps, and carry
 * the latest right values forward with `last(..., ignoreNulls)`. This is
 * ONE shuffle on the join key and scales linearly — the naive
 * inequality-join alternative is a quadratic blowup per key.
 */
object AsOfJoin {

  /**
   * @param left      left (probe) rows
   * @param right     right (reference) rows
   * @param keys      equi-join keys present on both sides
   * @param leftTime  left timestamp column name
   * @param rightTime right timestamp column name
   * @param rightVals right value columns to carry, emitted as `asof_<c>`
   * @param tieBreak  right column ordering rows at identical timestamps
   *                  (latest wins); pass a strictly-increasing unique id
   *                  for determinism
   */
  /**
   * @param toleranceSeconds optional max lookback: a matched right row
   *        older than `leftTime - tolerance` is discarded (nulls out),
   *        the usual bound in market-data as-of joins
   */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String,
      rightVals: Seq[String], tieBreak: String,
      toleranceSeconds: Option[Long] = None): DataFrame = {
    // the tiebreak is cast to long for ordering; a non-numeric column
    // would silently null out and de-determinize equal-timestamp ties
    require(right.schema(tieBreak).dataType.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"tieBreak column $tieBreak must be numeric, got ${right.schema(tieBreak).dataType}")
    val leftCols = left.columns.toSeq

    val lAligned = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .withColumn("__tie", lit(Long.MaxValue))
    // ONE struct per right row carrying match time + all value columns:
    // last(..., ignoreNulls) over the struct picks every field from the
    // SAME matched row, so a NULL value in the most recent right row
    // stays NULL instead of leaking a stale value from an older row
    // (matches asOfNative and DuckDB ASOF JOIN semantics).
    val rAligned = right.select(
      keys.map(col) ++
        Seq(col(rightTime).as("__t"), lit(0).as("__side"),
          col(tieBreak).cast("long").as("__tie"),
          struct(col(rightTime).as("__mt") +: rightVals.map(c => col(c).as(c)): _*).as("__rv")): _*)

    val unioned = lAligned.unionByName(rAligned, allowMissingColumns = true)

    // right rows (side 0) sort before left rows (side 1) at equal time:
    // a right row AT the left timestamp is visible to it (<= semantics)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc, col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = unioned
      .withColumn("__match", last(col("__rv"), ignoreNulls = true).over(w))
      .withColumn("__match_t", col("__match").getField("__mt"))
    val withVals = rightVals.foldLeft(carried)((df, c) =>
      df.withColumn(s"asof_$c", col("__match").getField(c)))

    val inTolerance = toleranceSeconds match {
      case Some(tol) =>
        col("__match_t").isNotNull &&
          unix_timestamp(col("__t")) - unix_timestamp(col("__match_t")) <= tol
      case None => lit(true)
    }
    withVals.filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        rightVals.map(c => when(inTolerance, col(s"asof_$c")).otherwise(lit(null)).as(s"asof_$c")): _*)
  }

  /**
   * The same join as a custom physical operator (AsOfJoinExec): one
   * co-partitioned merge pass per partition instead of the union +
   * window formulation — the plan a native engine would pick. The
   * strategy self-registers via experimental.extraStrategies (also
   * injected by GraftExtensions). Differentially tested against
   * `asOf`; `asOf` remains the default.
   */
  def asOfNative(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String,
      rightVals: Seq[String], tieBreak: String): DataFrame = {
    import org.apache.spark.sql.graft.Bridge
    import org.apache.spark.sql.graft.plans.{AsOfJoinPlan, AsOfJoinStrategy}
    val spark = left.sparkSession
    Bridge.ensureStrategy(spark, AsOfJoinStrategy)
    // re-alias the right side so a self-join carries fresh exprIds
    val rightFresh = right.select(right.columns.toIndexedSeq.map(c => col(c).as(c)): _*)
    val lPlan = Bridge.analyzed(left)
    val rPlan = Bridge.analyzed(rightFresh)
    def attr(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, n: String) =
      plan.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"column $n not found"))
    val plan = AsOfJoinPlan(lPlan, rPlan,
      keys.map(attr(lPlan, _)), keys.map(attr(rPlan, _)),
      attr(lPlan, leftTime), attr(rPlan, rightTime), attr(rPlan, tieBreak),
      rightVals.map(attr(rPlan, _)))
    Bridge.ofRows(spark, plan)
      .toDF(left.columns.toIndexedSeq ++ rightVals.map(c => s"asof_$c"): _*)
  }
}
