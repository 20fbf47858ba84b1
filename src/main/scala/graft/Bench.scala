package graft

import org.apache.spark.sql.SparkSession

/**
 * Benchmark main: runs every registered query on SPARK_GRAFT_SF_DIR
 * (default sf0.1) and prints ONE JSON line
 * {"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}.
 * Each query is materialized with a noop sink so the full plan
 * (including sorts/limits) executes — `count()` would let Catalyst
 * prune sorts and under-report the work.
 */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the JVM/codegen/parquet-footer paths so the first measured
    // query is not charged ~5s of one-time session cost.
    spark.range(1000000L).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    Seq("lineitem", "orders", "documents", "embeddings", "events").foreach { t =>
      graft.queries.Tables.table(spark, sfDir, t).write.format("noop").mode("overwrite").save()
    }
    // ... and the operator paths the measured queries share: hash agg
    // with partial combine, broadcast + sort-merge join, window, sort —
    // one tiny query each JITs the generated-code shapes once.
    locally {
      import org.apache.spark.sql.functions._
      val li = graft.queries.Tables.table(spark, sfDir, "lineitem").limit(10000)
      val or = graft.queries.Tables.table(spark, sfDir, "orders").limit(1000)
      li.groupBy("l_returnflag").agg(sum("l_quantity"), avg("l_extendedprice"), count(lit(1)))
        .write.format("noop").mode("overwrite").save()
      li.join(broadcast(or), li("l_orderkey") === or("o_orderkey"))
        .groupBy("o_orderpriority").count()
        .write.format("noop").mode("overwrite").save()
      li.withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("l_returnflag").orderBy("l_orderkey")))
        .filter(col("rn") <= 3).orderBy("l_orderkey").limit(10)
        .write.format("noop").mode("overwrite").save()
    }
    // Three timed runs per query; the headline number stays the min
    // (achievable steady latency on a shared VM — single-shot numbers
    // carry 2-3x GC/scheduler swings), but min alone HID a real 4.5x
    // regression story in round 3, so the JSON now also carries the
    // median and n per query ("queries_detail") for stability analysis.
    val runsPerQuery = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val results = SparkEntry.allQueries.map { q =>
      val times = (1 to runsPerQuery).map { _ =>
        val t0 = System.nanoTime()
        try q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          System.err.println(s"[bench] ${q.name} failed: ${e.getMessage}")
        }
        (System.nanoTime() - t0) / 1e9
      }.sorted
      val median = times(times.length / 2)
      (q.name, times.min, median)
    }
    val qs = results.map { case (k, mn, _) => "\"" + k + f"""\":$mn%.3f""" }
      .mkString("{", ",", "}")
    val detail = results.map { case (k, mn, md) =>
      "\"" + k + f"""\":{"min":$mn%.3f,"median":$md%.3f}"""
    }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,""" +
      f""""queries_detail":$detail,"n_runs":$runsPerQuery,"sf":"$sfDir"}""")
    spark.stop()
  }
}
