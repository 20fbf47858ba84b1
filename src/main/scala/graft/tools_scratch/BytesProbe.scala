package graft.tools_scratch

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Minimal diagnostic: does stage-level inputMetrics.bytesRead see
  * parquet scan bytes on this build? (MatryoshkaProbe measured 0.4 MiB
  * against a 51 MB file — calibrate before trusting any receipt.) */
object BytesProbe {
  def main(args: Array[String]): Unit = {
    val path = args.headOption.getOrElse("/tmp/matryoshka_probe_corpus.parquet")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    @volatile var in = 0L
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val b = sc.stageInfo.taskMetrics.inputMetrics.bytesRead
          println(f"[bytes] stage ${sc.stageInfo.stageId} read ${b / 1048576.0}%.2f MiB  ${sc.stageInfo.name.take(40)}")
          in += b
        }
      })
    val df = spark.read.parquet(path)
    def leg(label: String)(body: => Long): Unit = {
      org.apache.spark.sql.graft.Bridge.waitListenerBus(spark.sparkContext)
      in = 0L
      val n = body
      org.apache.spark.sql.graft.Bridge.waitListenerBus(spark.sparkContext)
      println(f"[bytes] $label%-24s total ${in / 1048576.0}%8.2f MiB  (n=$n)")
    }
    leg("full embedding agg") {
      df.agg(sum(element_at(col("embedding"), 1))).collect(); df.count()
    }
    leg("prefix16 agg") {
      df.agg(sum(element_at(col("prefix16"), 1))).collect(); 0L
    }
    leg("id only count") { df.select("vec_id").count() }
    spark.stop()
  }
}
