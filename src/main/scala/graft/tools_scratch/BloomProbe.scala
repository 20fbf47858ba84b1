package graft.tools_scratch

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Exchange-volume receipt for the Bloom-prefiltered decontamination
 * (q121): same shuffle_hash contamination join over the sfDir
 * documents (corpus = source<>'src1', registry = 'src1'), with and
 * without the map-side Bloom prefilter, measuring wall time and total
 * shuffle bytes. The prefilter never changes the result (no false
 * negatives) — the receipt is how much of the corpus shingle volume
 * stays OUT of the exchange on a mostly-clean corpus.
 *
 * Usage: tools/run.sh graft.tools_scratch.BloomProbe <sfDir> [runs]
 */
object BloomProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/data/sf10")
    val runs = args.lift(1).flatMap(_.toIntOption).getOrElse(3)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("bloom-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    @volatile var shuffleWrite = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        shuffleWrite += sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
      }
    })

    import graft.operators.TextAnalysis
    import org.apache.spark.sql.graft.Bridge
    import org.apache.spark.sql.graft.expressions.StringHash64
    def h(c: org.apache.spark.sql.Column) =
      Bridge.column(StringHash64(Bridge.expression(c)))

    val docs = graft.queries.Tables.table(spark, sfDir, "documents")
    val corpus = docs.filter(col("source") =!= "src1")
    val bench = docs.filter(col("source") === "src1")

    def measure(label: String)(body: => Long): Unit = {
      var bestT = Double.MaxValue
      var bytes = 0L
      var rows = 0L
      (1 to runs).foreach { _ =>
        shuffleWrite = 0L
        val t0 = System.nanoTime()
        rows = body
        Thread.sleep(300)
        val dt = (System.nanoTime() - t0) / 1e9 - 0.3
        if (dt < bestT) { bestT = dt; bytes = shuffleWrite }
      }
      println(f"[bloom] $label%-26s ${bestT}%8.2f s   shuffle ${bytes / 1024.0 / 1024.0}%10.3f MiB   ($rows pairs, min of $runs)")
    }

    measure("shuffle join, NO prefilter") {
      val corpusSh = corpus.select(col("doc_id").as("id"),
          explode(TextAnalysis.shingles(col("text"), 8)).as("__s"))
        .select(col("id"), h(col("__s")).as("shingle"))
      val benchSh = bench.select(col("doc_id").as("bench_id"),
          explode(TextAnalysis.shingles(col("text"), 8)).as("__s"))
        .select(col("bench_id"), h(col("__s")).as("shingle"))
      corpusSh.join(benchSh.hint("shuffle_hash"), Seq("shingle"))
        .groupBy("id", "bench_id").agg(count(lit(1)).as("n_shared"))
        .count()
    }

    measure("bloom-prefiltered join") {
      TextAnalysis.contaminationPairsBloom(corpus, "doc_id", "text",
        bench, "doc_id", "text", n = 8, minOverlap = 1).count()
    }

    spark.stop()
  }
}
