package graft.tools_scratch

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Shuffle-volume receipt for the Misra-Gries two-pass top-k (q122): the
 * documents fixture has a ≤ 3100-term vocabulary, far below the 4096
 * counters, so it cannot show WHY the summary beats `groupBy(term)` at
 * scale. This probe builds a deterministic Zipf-ish corpus with ~1M
 * distinct terms and measures BOTH wall time and total shuffle bytes
 * for (a) the full groupBy top-40 and (b) MG(m=65536) + exact recount.
 *
 * The honest expectation: locally the codegen'd hash aggregate may well
 * WIN on CPU (string-keyed HashMap updates in an interpreted aggregate
 * vs Tungsten) — the claim the receipt pins is the SHUFFLE RATIO, which
 * is what survives a 1000-executor 100 TB scale-up where the exchange,
 * not the map CPU, is the bottleneck.
 *
 * Usage: tools/run.sh graft.tools_scratch.MgProbe [nRows] [runs]
 */
object MgProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.flatMap(_.toLongOption).getOrElse(20000000L)
    val runs = args.lift(1).flatMap(_.toIntOption).getOrElse(3)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("mg-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    @volatile var shuffleWrite = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        shuffleWrite += sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
      }
    })

    // Zipf-ish deterministic terms: u = splitmix-style hash of i in
    // [0,1); term_id = floor(1e6 * u^3) concentrates mass near 0
    // (P(id < c) = (c/1e6)^(1/3): term 0 carries ~1% of all rows)
    // while spreading ~1M distinct ids over the tail.
    val corpus = spark.range(n)
      .withColumn("h", abs(hash(col("id"))).cast("double") / 2147483647.0)
      .withColumn("term", concat(lit("t"),
        floor(lit(1000000.0) * pow(col("h"), 3.0)).cast("long")))
      .select("term")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    println(s"[mg] corpus: $n rows, ${corpus.select("term").distinct.count} distinct terms (cached)")

    def measure(label: String)(body: => Unit): Unit = {
      var bestT = Double.MaxValue
      var bytes = 0L
      (1 to runs).foreach { _ =>
        shuffleWrite = 0L
        val t0 = System.nanoTime()
        body
        // listener events are async; give the bus a beat to drain
        Thread.sleep(300)
        val dt = (System.nanoTime() - t0) / 1e9 - 0.3
        if (dt < bestT) { bestT = dt; bytes = shuffleWrite }
      }
      println(f"[mg] $label%-28s ${bestT}%8.2f s   shuffle ${bytes / 1024.0 / 1024.0}%10.3f MiB (min of $runs)")
    }

    measure("full groupBy top-40") {
      corpus.groupBy("term").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("term").asc).limit(40).collect()
    }

    for (m <- Seq(4096, 65536)) {
      var verdictLine = ""
      measure(s"MG($m) + exact recount") {
        import org.apache.spark.sql.graft.Bridge
        import org.apache.spark.sql.graft.expressions.MisraGries
        val mg = Bridge.column(MisraGries(
          Bridge.expression(array(col("term"))), m).toAggregateExpression())
        val cand = corpus.agg(mg.as("c")).collect()(0).getSeq[String](0)
        import spark.implicits._
        val top = corpus.join(broadcast(cand.toDF("term")), Seq("term"))
          .groupBy("term").agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("term").asc).limit(40).collect()
        val kth = top.last.getLong(1)
        verdictLine = f"[mg]   m=$m: ${cand.size} candidates, cnt_40=$kth, " +
          f"verdict cnt_40*m/N = ${kth.toDouble * m / n}%.2f " +
          (if (kth * m > n) "(PROVABLY exact)" else "(NOT provable)")
      }
      println(verdictLine)
    }

    spark.stop()
  }
}
