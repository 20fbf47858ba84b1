package graft.tools_scratch

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Measures the two exact-quantile plans on the data shape that
 * separates them (VERDICT r7 task 6):
 *
 *  - TYPICAL: lineitem l_extendedprice at a given SF — values span
 *    many octaves, so 20-bit order-preserving prefixes give fine
 *    buckets and the histogram form resolves mostly on the driver.
 *  - ADVERSARIAL: n continuous values concentrated inside <0.4%
 *    relative spread (all in ONE 20-bit bucket) — the histogram's
 *    mixed target bucket is the whole group (single-task sort), while
 *    the range-partitioned form's percentile_approx bounds adapt and
 *    keep every pass-B task at ~n/P rows.
 *
 * Usage: tools/run.sh graft.tools_scratch.QuantProbe <sfDir> <nAdversarial>
 */
object QuantProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val n = args(1).toLong
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("quant-probe")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[quantprobe] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val fractions = Seq(0.25, 0.5, 0.9)

    // adversarial: one group, values in [1.0, 1.0 + 1e-7) — inside one
    // 20-bit bucket (resolution ~0.4% relative) and ~25 buckets at 40.
    val adv = spark.range(n)
      .select(lit("g").as("g"),
        (lit(1.0) + pmod(hash(col("id")), lit(1000000)).cast("double") * lit(1e-13)).as("v"))
    // warm the JVM once
    adv.count()

    for (round <- 1 to 2) {
      println(s"== round $round (compare round 2: warm JVM)")
      time("ADV histogram bits=20 (adaptive refine)") {
        graft.operators.Quantiles.exactGroupedQuantilesMulti(
          adv, "g", Seq("v" -> fractions), 20).collect()
      }
      time("ADV histogram bits=20 refine OFF (huge cap)") {
        graft.operators.Quantiles.exactGroupedQuantilesMulti(
          adv, "g", Seq("v" -> fractions), 20, maxBucketRows = Long.MaxValue).collect()
      }
      time("ADV histogram bits=40") {
        graft.operators.Quantiles.exactGroupedQuantilesMulti(
          adv, "g", Seq("v" -> fractions), 40).collect()
      }
      time("ADV range-partitioned P=64") {
        graft.operators.Quantiles.exactGroupedQuantiles(
          adv, "g", "v", fractions, 64).collect()
      }
      val li = graft.queries.Tables.table(spark, sfDir, "lineitem")
      time("TYPICAL lineitem histogram bits=20") {
        graft.operators.Quantiles.exactGroupedQuantilesMulti(
          li, "l_returnflag", Seq("l_extendedprice" -> fractions), 20).collect()
      }
      time("TYPICAL lineitem range-partitioned P=32") {
        graft.operators.Quantiles.exactGroupedQuantiles(
          li, "l_returnflag", "l_extendedprice", fractions, 32,
          boundsSampleFraction = 0.2).collect()
      }
    }
    spark.stop()
  }
}
