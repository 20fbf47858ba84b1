package graft.tools_scratch

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B the money-sum aggregation shapes on lineitem @ sf0.1 (round 16:
  * the exact-only conversion moved ~25 queries from double sums to
  * decimal sums; BENCH shows +0.3-0.5 s on the aggregate-heavy ones).
  *
  *   a) double sum (the pre-r16 shape — fast, order-dependent)
  *   b) decimal(18,2)-cast sum (the r16 shape — exact, slower)
  *   c) e2-long floor sum + final decimal cast (exact below 2^53
  *      cents, codegen long arithmetic)
  */
object DecimalSumProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice")
      .localCheckpoint(true)
    li.count()
    def time(tag: String)(f: => Unit): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        f
        println(f"[dec] $tag%-28s iter$i ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    time("double sum") {
      li.groupBy("l_returnflag", "l_linestatus")
        .agg(sum(col("l_quantity")), sum(col("l_extendedprice")))
        .write.format("noop").mode("overwrite").save()
    }
    time("decimal(18,2)-cast sum") {
      li.groupBy("l_returnflag", "l_linestatus")
        .agg(sum(col("l_quantity").cast("decimal(18,2)")).cast("decimal(38,2)"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("decimal(38,2)"))
        .write.format("noop").mode("overwrite").save()
    }
    time("e2-long floor sum") {
      li.groupBy("l_returnflag", "l_linestatus")
        .agg((sum(floor(col("l_quantity") * 100 + lit(0.5))).cast("double") / 100)
            .cast("decimal(38,2)"),
          (sum(floor(col("l_extendedprice") * 100 + lit(0.5))).cast("double") / 100)
            .cast("decimal(38,2)"))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
