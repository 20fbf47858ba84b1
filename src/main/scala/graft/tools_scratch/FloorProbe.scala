package graft.tools_scratch

import org.apache.spark.sql.SparkSession

/**
 * Quantifies the per-query floor of the sf0.1 bench: how much of a
 * floor-bound query's ~0.1-0.2 s is (a) pure job scheduling (empty
 * plan), (b) a bare parquet scan job, (c) plan analysis/optimization,
 * vs (d) the query's own work. Run: tools/run.sh graft.tools_scratch.FloorProbe
 */
object FloorProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // same warm-up as Bench
    spark.range(1000000L).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    Seq("lineitem", "orders", "documents", "embeddings", "events").foreach { t =>
      graft.queries.Tables.table(spark, sfDir, t).write.format("noop").mode("overwrite").save()
    }
    def bench(name: String)(f: => Unit): Unit = {
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-34s min ${ts.min}%.4f s  median ${ts.sorted.apply(2)}%.4f s")
    }
    bench("empty job (range(1) noop)") {
      spark.range(1).write.format("noop").mode("overwrite").save()
    }
    bench("32-task shuffle job (range sum)") {
      spark.range(1000L).repartition(32).selectExpr("sum(id)")
        .write.format("noop").mode("overwrite").save()
    }
    bench("bare parquet scan (documents)") {
      spark.read.parquet(s"$sfDir/documents.parquet")
        .write.format("noop").mode("overwrite").save()
    }
    bench("bare parquet scan (lineitem)") {
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .write.format("noop").mode("overwrite").save()
    }
    val q63 = SparkEntryAccess.query("q63_sample_10pct")
    bench("q63 plan only (executedPlan)") {
      q63(spark, sfDir).queryExecution.executedPlan
    }
    bench("q63 full (plan + execute)") {
      q63(spark, sfDir).write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}

private object SparkEntryAccess {
  def query(name: String): (SparkSession, String) => org.apache.spark.sql.DataFrame = {
    val q = graft.SparkEntry.allQueries.find(_.name == name).get
    (s, d) => q.run(s, d)
  }
}
