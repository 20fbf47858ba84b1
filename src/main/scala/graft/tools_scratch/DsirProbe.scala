package graft.tools_scratch

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Shuffle-volume receipt for DSIR's hashing trick (q129): on the
 * shipped fixtures the feature universe is tiny, so this probe builds
 * the LmProbe corpus (2M × 20-token docs over a ~1M-term Zipf-ish
 * vocabulary → tens of millions of distinct unigram+bigram features)
 * and measures wall + total shuffle bytes for
 *
 *  (a) the VOCAB-KEYED strawman: models keyed by the raw feature
 *      string — the model build shuffles the feature universe and the
 *      scoring join sort-merges doc features against a
 *      vocabulary-scale model that cannot broadcast; and
 *  (b) the shipped hashed path (DataSelection.dsirWeights, dim=4096):
 *      model exchange bounded by dim, λ table broadcast, the doc
 *      stream's only exchange the per-(doc, bucket) counts.
 *
 * The claim pinned is the SHUFFLE RATIO (the MgProbe/LmProbe
 * discipline) — the quantity that survives a 1000-executor 100 TB
 * scale-up where the exchange, not map CPU, is the bottleneck.
 *
 * Usage: tools/run.sh graft.tools_scratch.DsirProbe [nDocs] [runs]
 * (or `DsirProbe dump <sfDir> <outDir>` — dump the model + weights
 * for DuckDB-side debugging of the q129 oracle.)
 */
object DsirProbe {
  def main(args: Array[String]): Unit =
    if (args.headOption.contains("dump")) dump(args(1), args(2))
    else receipt(
      args.headOption.flatMap(_.toLongOption).getOrElse(2000000L),
      args.lift(1).flatMap(_.toIntOption).getOrElse(2))

  private def session(name: String): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName(name)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def receipt(n: Long, runs: Int): Unit = {
    val spark = session("dsir-probe")
    @volatile var shuffleWrite = 0L
    val perStage = sys.env.get("DSIR_PROBE_STAGES").isDefined
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val w = sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
        shuffleWrite += w
        if (perStage && w > 0)
          println(f"[dsir-stage] ${sc.stageInfo.stageId}%4d write ${w / 1024.0 / 1024.0}%10.3f MiB  ${sc.stageInfo.name.takeWhile(_ != '\n').take(80)}")
      }
    })
    def term(e: org.apache.spark.sql.Column) = concat(lit("t"),
      floor(lit(1000000.0) *
        pow(abs(hash(e)).cast("double") / 2147483647.0, 3.0)).cast("long"))
    val ranged = spark.range(n)
      .withColumn("text", concat_ws(" ",
        (0 until 20).map(j => term(col("id") * 20 + j)): _*))
      .select(col("id").as("doc_id"), col("text"),
        (col("id") % 20 === 0).as("is_t"))
    // DSIR_PROBE_PARQUET=1: round-trip the corpus through parquet so
    // its partitioning is UNKNOWN to Catalyst — measures the extra
    // per-doc exchange an arbitrarily-laid-out corpus pays (the
    // range-derived default models the doc_id-partitioned layout,
    // where the per-doc aggregations need no exchange at all)
    val docs = (if (sys.env.contains("DSIR_PROBE_PARQUET")) {
      val p = "/tmp/dsir_probe_corpus.parquet"
      ranged.write.mode("overwrite").parquet(p)
      spark.read.parquet(p)
    } else ranged)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"[dsir] corpus: ${docs.count()} docs x 20 tokens (cached, " +
      s"${if (sys.env.contains("DSIR_PROBE_PARQUET")) "parquet round-trip" else "range-partitioned"})")

    def measure(label: String)(body: => Unit): Unit = {
      var bestT = Double.MaxValue
      var bytes = 0L
      (1 to runs).foreach { _ =>
        // drain late events from the PRIOR run before resetting
        org.apache.spark.sql.graft.Bridge.waitListenerBus(spark.sparkContext)
        shuffleWrite = 0L
        val t0 = System.nanoTime()
        body
        org.apache.spark.sql.graft.Bridge.waitListenerBus(spark.sparkContext)
        val dt = (System.nanoTime() - t0) / 1e9
        if (dt < bestT) { bestT = dt; bytes = shuffleWrite }
      }
      println(f"[dsir] $label%-28s ${bestT}%8.2f s   shuffle ${bytes / 1024.0 / 1024.0}%10.3f MiB (min of $runs)")
    }

    import graft.operators.DataSelection
    val feats = DataSelection.ngramFeatures(col("text"))

    if (sys.env.contains("DSIR_PROBE_EXPLAIN")) {
      // the docFeat subplan exactly as dsirWeights builds it (pre-
      // checkpoint) — is the (id, is_t, b) aggregation exchanging?
      val docFeat = docs
        .select(col("doc_id").as("id"), col("is_t"),
          explode(feats).as("f"))
        .select(col("id"), col("is_t"),
          DataSelection.featureBucket(col("f"), 4096, 11L).as("b"))
        .groupBy("id", "is_t", "b").agg(count(lit(1)).as("c"))
      docFeat.explain("formatted")
      println(s"[dsir] docFeat rows = ${docFeat.count()}")
    }

    measure("vocab-keyed strawman") {
      val ex = docs.select(col("doc_id").as("id"), col("is_t"),
        explode(feats).as("f"))
      val counts = ex.groupBy("f")
        .agg(sum(when(col("is_t"), 1L).otherwise(0L)).as("c_t"),
          count(lit(1)).as("c_r"))
      val tot = counts.agg(coalesce(sum(col("c_t")), lit(0L)),
        coalesce(sum(col("c_r")), lit(0L))).collect()(0)
      val (tt, tr) = (tot.getLong(0), tot.getLong(1))
      val model = counts.withColumn("lam",
        round(log((col("c_t") + 1).cast("double") / lit(tt + 1.0)) -
              log((col("c_r") + 1).cast("double") / lit(tr + 1.0)), 9)
          .cast("decimal(12,9)"))
      val out = ex.groupBy("id", "f").agg(count(lit(1)).as("c"))
        .join(model.select("f", "lam"), Seq("f"))
        .groupBy("id")
        .agg(sum(col("c")).as("n_feats"),
          sum(col("lam") * col("c")).cast("decimal(20,9)").as("sum_w"))
        .agg(count(lit(1)), sum(col("n_feats"))).collect()(0)
      println(s"[dsir]   scored=${out.getLong(0)} feats=${out.getLong(1)}")
    }

    measure("hashed dim=4096 (shipped)") {
      val out = DataSelection.dsirWeights(docs, "doc_id", "text",
        targetFilter = col("is_t"), dim = 4096)
        .agg(count(lit(1)), sum(col("n_feats"))).collect()(0)
      println(s"[dsir]   scored=${out.getLong(0)} feats=${out.getLong(1)}")
    }

    spark.stop()
  }

  /** Dump the Spark-side DSIR model and per-doc weights at a given sf
    * dir so DuckDB's replay can be diffed per bucket. */
  private def dump(sfDir: String, out: String): Unit = {
    val spark = session("dsir-dump")
    val docs = graft.queries.Tables.table(spark, sfDir, "documents")
    graft.operators.DataSelection.dsirModel(
        docs, "text", col("source") === "src0", dim = 256, seed = 11L)
      .orderBy("b").coalesce(1).write.mode("overwrite").parquet(s"$out/model")
    graft.operators.DataSelection.dsirWeights(
        docs, "doc_id", "text", col("source") === "src0", dim = 256, seed = 11L)
      .orderBy("doc_id").coalesce(1).write.mode("overwrite")
      .parquet(s"$out/weights")
    spark.stop()
  }
}
