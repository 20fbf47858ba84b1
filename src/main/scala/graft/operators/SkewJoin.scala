package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Skew-resistant equi-join via key salting: the classic remedy when one
 * join key carries a disproportionate share of rows and a single
 * reducer becomes the straggler (AQE's skew-join handles sort-merge
 * cases adaptively; explicit salting also covers aggregations and
 * plans AQE cannot split).
 *
 * The LEFT (skewed) side gets a deterministic per-row salt in
 * [0, saltFactor); the RIGHT side is replicated once per salt value.
 * Joining on (key, salt) spreads each hot key over `saltFactor`
 * reducers. Replication cost is |right| * saltFactor — use for
 * large-skewed x small-ish joins, which is where skew bites.
 */
object SkewJoin {

  /** Deterministic salt from the row's whole content (no rand(): keeps
    * the plan re-executable/deterministic under retries). */
  private def salt(df: DataFrame, saltFactor: Int): Column =
    pmod(hash(df.columns.toIndexedSeq.map(col): _*), lit(saltFactor))

  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      saltFactor: Int = 16, joinType: String = "inner"): DataFrame = {
    require(saltFactor >= 1)
    val saltedLeft = left.withColumn("__salt", salt(left, saltFactor))
    val replicatedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    saltedLeft.join(replicatedRight, Seq(key, "__salt"), joinType)
      .drop("__salt")
  }

  /**
   * Skew-resistant aggregation: two-phase groupBy with a salted first
   * phase. `aggs` must be algebraic (re-aggregatable): this helper
   * covers the count/sum family; partial counts re-sum.
   */
  def saltedCount(df: DataFrame, key: String, saltFactor: Int = 16): DataFrame =
    df.withColumn("__salt", salt(df, saltFactor))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as("count"))
}
