package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Range (interval) join: pair each left row with every right row of the
 * same key whose timestamp falls in
 * `[leftTime + lowerSeconds, leftTime + upperSeconds]` (both inclusive).
 *
 * The naive formulation — an equi-join on the key with a range predicate
 * — degenerates to a per-key nested loop (Spark cannot hash on an
 * inequality), quadratic in the hottest key. This implementation bands
 * time into fixed-width buckets: each LEFT row explodes into the few
 * buckets its window can touch, each RIGHT row lands in exactly one, and
 * the join becomes a plain hash equi-join on (key, bucket) + an exact
 * residual filter. Fan-out is bounded by ceil(span/band)+1 per left row,
 * so the shuffle grows linearly with input — the standard interval-join
 * plan streaming engines use.
 */
object RangeJoin {

  /**
   * @param rightVals right columns carried to the output as `r_<name>`
   * @param bandSeconds bucket width; defaults to the window span
   *        (fan-out of 2 buckets per left row). Tune smaller only when
   *        keys are hot AND windows are sparse.
   */
  def rangeJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String,
      lowerSeconds: Long, upperSeconds: Long,
      rightVals: Seq[String],
      bandSeconds: Long = 0L): DataFrame = {
    require(upperSeconds >= lowerSeconds, "upper bound must be >= lower bound")
    val band = if (bandSeconds > 0) bandSeconds
      else math.max(1L, upperSeconds - lowerSeconds)
    val bandUs = band * 1000000L

    val leftCols = left.columns.toSeq
    val lUs = unix_micros(col(leftTime))
    val lo = lUs + lit(lowerSeconds * 1000000L)
    val hi = lUs + lit(upperSeconds * 1000000L)
    val lBanded = left.withColumn("__band",
      explode(sequence(floorDiv(lo, bandUs), floorDiv(hi, bandUs))))

    val rUs = unix_micros(col(rightTime))
    val rBanded = right.select(
      keys.map(col) ++
        Seq(floorDiv(rUs, bandUs).as("__band"), rUs.as("__rt_us")) ++
        rightVals.map(c => col(c).as(s"r_$c")): _*)

    lBanded.join(rBanded, keys :+ "__band")
      .filter(col("__rt_us") >= lo && col("__rt_us") <= hi)
      .select(leftCols.map(col) ++ rightVals.map(c => col(s"r_$c")): _*)
  }

  /** Floor division as a Column (sql `div` truncates toward zero;
    * timestamps here are post-epoch so truncation == floor, but keep
    * the true floor for pre-epoch robustness). */
  private def floorDiv(x: Column, d: Long): Column = {
    val q = x.divide(lit(d))
    floor(q).cast("long")
  }
}
