package graft.tools_scratch

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Shuffle-volume receipt for the bounded bigram LM (q127, VERDICT r14
 * item 4): on the shipped fixtures the vocabulary is ≤ 3100 terms, far
 * too small to show WHY `maxModelTerms` matters, so this probe builds a
 * deterministic corpus whose BIGRAM universe is in the tens of millions
 * (20-token docs over a ~1M-term Zipf-ish vocabulary) and measures wall
 * time and total shuffle bytes for scoring with (a) the FULL stupid-
 * backoff model — whose C2 aggregation and scoring joins shuffle the
 * bigram universe — and (b) the exact frequency-cutoff model at
 * m = 65536 — whose model-side exchange is bounded by the MG summary
 * size and the ≤ m candidate recount.
 *
 * Honest caveat (the MgProbe discipline): locally the full model may
 * win on CPU; the claim this receipt pins is the SHUFFLE RATIO — the
 * quantity that survives a 1000-executor 100 TB scale-up where the
 * exchange, not map CPU, is the bottleneck. The (T, V) scalar pass
 * (a countDistinct over the reference tokens) is shared by both paths
 * and included in both measurements.
 *
 * Usage: tools/run.sh graft.tools_scratch.LmProbe [nDocs] [runs]
 */
object LmProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.flatMap(_.toLongOption).getOrElse(2000000L)
    val runs = args.lift(1).flatMap(_.toIntOption).getOrElse(2)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("lm-probe")
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

    // 20-token docs, Zipf-ish ~1M-term vocabulary (the MgProbe draw):
    // the bigram universe is vastly larger than any m
    def term(e: org.apache.spark.sql.Column) = concat(lit("t"),
      floor(lit(1000000.0) *
        pow(abs(hash(e)).cast("double") / 2147483647.0, 3.0)).cast("long"))
    val docs = spark.range(n)
      .withColumn("text", concat_ws(" ",
        (0 until 20).map(j => term(col("id") * 20 + j)): _*))
      .select(col("id").as("doc_id"), col("text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"[lm] corpus: ${docs.count()} docs x 20 tokens (cached)")

    def measure(label: String)(body: => Unit): Unit = {
      var bestT = Double.MaxValue
      var bytes = 0L
      (1 to runs).foreach { _ =>
        shuffleWrite = 0L
        val t0 = System.nanoTime()
        body
        Thread.sleep(300) // listener bus drain
        val dt = (System.nanoTime() - t0) / 1e9 - 0.3
        if (dt < bestT) { bestT = dt; bytes = shuffleWrite }
      }
      println(f"[lm] $label%-28s ${bestT}%8.2f s   shuffle ${bytes / 1024.0 / 1024.0}%10.3f MiB (min of $runs)")
    }

    import graft.operators.TextAnalysis
    def score(maxModelTerms: Option[Int]): Unit = {
      val out = TextAnalysis.lmPerplexity(docs, "doc_id", "text",
        refFilter = lit(true), maxModelTerms = maxModelTerms)
        .agg(count(lit(1)), sum(col("n_bigrams")),
          sum(when(col("keep"), 1L).otherwise(0L))).collect()(0)
      println(s"[lm]   scored=${out.getLong(0)} bigrams=${out.getLong(1)} keep=${out.getLong(2)}")
    }

    measure("full model")(score(None))
    measure("cutoff model m=65536")(score(Some(65536)))

    spark.stop()
  }
}
