package graft.tools_scratch

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.index.{HnswModel, ShardedHnsw}
import graft.operators.Similarity

/**
 * Scale receipt for the sharded HNSW tier (round 16): a corpus of
 * 2 x sf10 embeddings (400k vectors, 2x past the 200k driver cap —
 * the second half is a deterministic element-rotation of the first, so
 * the corpus stays distinct-vector) where the flat HnswModel REFUSES
 * to build. Measures: distributed build wall, routed-walk bulk kNN
 * join wall for 100 queries, and recall@10 vs exact brute force for
 * 20 queries. Round 17 adds the loaded-index shard-pruning exchange
 * receipt (VERDICT r16 item 1).
 *
 * Usage: tools/run.sh graft.tools_scratch.ShardedHnswProbe [sfDir]
 *        tools/run.sh graft.tools_scratch.ShardedHnswProbe receipt [sfDir]
 *          (pruning receipt only — skips the 400k-corpus build)
 */
object ShardedHnswProbe {
  def main(args: Array[String]): Unit = {
    val receiptOnly = args.headOption.contains("receipt")
    val sfDir = args.drop(if (receiptOnly) 1 else 0).headOption
      .getOrElse("/root/repo/data/sf10")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.driver.memory", "48g")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    if (!receiptOnly) fullProbe(spark, base)
    pruningReceipt(spark, base)
    spark.stop()
  }

  private def fullProbe(spark: SparkSession, base: org.apache.spark.sql.DataFrame): Unit = {
    val shifted = base.select((col("vec_id") + 10000000L).as("vec_id"),
      transform(col("embedding"), (x, i) =>
        x + lit(0.05f) * element_at(col("embedding"),
          pmod(i + 7, size(col("embedding"))) + 1)).cast("array<float>")
        .as("embedding"))
    val corpus = base.unionByName(shifted).localCheckpoint(true)
    val n = corpus.count()
    println(s"[sharded] corpus n=$n cap=${HnswModel.maxGraphVectors}")
    require(n > HnswModel.maxGraphVectors, "probe needs a past-cap corpus")

    // flat tier must refuse
    try {
      val rows = corpus.limit(HnswModel.maxGraphVectors + 1).collect()
      HnswModel.fromVectors(rows.map(_.getLong(0)),
        rows.map(_.getSeq[Float](1).toArray))
      println("[sharded] ERROR: flat build did NOT refuse past the cap")
    } catch {
      case e: IllegalArgumentException =>
        println(s"[sharded] flat tier refuses past cap: ${e.getMessage.take(80)}")
    }

    val t0 = System.nanoTime()
    val idx0 = ShardedHnsw.build(corpus, "vec_id", "embedding",
      targetShardRows = 50000, replicas = 2)
    val idx = idx0.copy(nodes = idx0.nodes.localCheckpoint(true))
    val nNodes = idx.nodes.count()
    val buildS = (System.nanoTime() - t0) / 1e9
    println(f"[sharded] build: $buildS%.1f s, shards=${idx.router.nlist}, " +
      s"node rows=$nNodes (replicas=2)")

    val queries = corpus.filter(col("vec_id") < 100)
    val t1 = System.nanoTime()
    val out = idx.knnJoin(queries, "vec_id", "embedding",
      corpus, "vec_id", "embedding", k = 10, ef = 100, probeShards = 4)
    val nOut = out.count()
    val queryS = (System.nanoTime() - t1) / 1e9
    println(f"[sharded] bulk kNN join: 100 queries -> $nOut rows in $queryS%.1f s")

    // recall@10 vs exact for 20 queries
    val hits = out.filter(col("query_id") < 20)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    var recall = 0.0
    (0L until 20L).foreach { qid =>
      val q = corpus.filter(col("vec_id") === qid).select("embedding")
        .collect()(0).getSeq[Float](0).toArray
      val exact = Similarity.knnExact(corpus, "vec_id", "embedding", q, 10)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      recall += hits.getOrElse(qid, Set.empty).intersect(exact).size / 10.0
    }
    println(f"[sharded] recall@10 vs exact (20 queries) = ${recall / 20}%.3f")
  }

  /** Loaded-index shard-pruning receipt (VERDICT r16 item 1): a SPARSE
    * query batch against a MANY-shard index is the shape the prune
    * exists for. Build a ~50-shard index over the base corpus (cheap
    * graph params — the receipt measures exchange, not recall),
    * persist, re-load (parquet lineage, partitioning unknown to
    * Catalyst), then measure total shuffle for 4 queries with and
    * without the isin shard prune. The pruned path's node-side
    * exchange must be ∝ probed-shard rows; the strawman shuffles the
    * whole node table through the cogroup. */
  private def pruningReceipt(spark: SparkSession,
      base: org.apache.spark.sql.DataFrame): Unit = {
    @volatile var shuffleWrite = 0L
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
          shuffleWrite += sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
      })
    val t2 = System.nanoTime()
    val many = ShardedHnsw.build(base, "vec_id", "embedding",
      targetShardRows = 4000, m = 8, efConstruction = 64, replicas = 1)
    val idxPath = "/tmp/sharded_hnsw_probe_idx"
    many.save(idxPath)
    println(f"[sharded] receipt index: ${(System.nanoTime() - t2) / 1e9}%.1f s build+save, shards=${many.router.nlist}")
    val loaded = ShardedHnsw.load(spark, idxPath)
    val sparseQ = base.filter(col("vec_id") < 4).localCheckpoint(true)
    val probedIds = sparseQ.select("embedding").collect()
      .flatMap(r => loaded.router.probe(r.getSeq[Float](0).toArray, 2))
      .distinct.sorted
    println(s"[sharded] 4 queries x probeShards=2 -> ${probedIds.length} probed of ${loaded.router.nlist} shards")
    def measure(label: String, prune: Boolean): Long = {
      org.apache.spark.sql.graft.Bridge.waitListenerBus(spark.sparkContext)
      shuffleWrite = 0L
      val t0 = System.nanoTime()
      val nCand = loaded.knnCandidates(sparseQ, "vec_id", "embedding",
        k = 10, ef = 100, probeShards = 2, pruneShards = prune).count()
      org.apache.spark.sql.graft.Bridge.waitListenerBus(spark.sparkContext)
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[sharded] $label%-34s $dt%6.2f s   shuffle ${shuffleWrite / 1024.0 / 1024.0}%10.3f MiB   ($nCand cands)")
      shuffleWrite
    }
    val unpruned = measure("loaded idx, 4 queries, UNPRUNED", prune = false)
    val pruned = measure("loaded idx, 4 queries, pruned", prune = true)
    println(f"[sharded] exchange ratio unpruned/pruned = ${unpruned.toDouble / math.max(1L, pruned)}%.1f x")
  }
}
