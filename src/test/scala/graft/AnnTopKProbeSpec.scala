package graft

import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions._
import graft.index.{AnnRegistry, IvfModel}

/** The opt-in cosine-topk -> IVF-probe optimizer rewrite
  * (AnnTopKProbe), differentially tested against the explicit probe
  * path it replaces. */
class AnnTopKProbeSpec extends SparkSpec {
  import spark.implicits._

  private lazy val corpus = spark.read.parquet(s"$sfDir/embeddings.parquet")

  private def topk(df: org.apache.spark.sql.DataFrame, q: Array[Float], k: Int) =
    df.withColumn("score", cosine_sim(col("embedding"), typedLit(q)))
      .orderBy(col("score").desc, col("vec_id").asc)
      .limit(k)
      .select("vec_id").as[Long].collect().toSeq

  test("rewrite == explicit probe; inert without conf; survives column pruning") {
    val model = IvfModel.train(corpus, "embedding", nlist = 8)
    val q = corpus.filter($"vec_id" === 3).select("embedding")
      .collect()(0).getSeq[Float](0).toArray

    spark.conf.unset("spark.graft.ann.autoProbe")
    val exact = topk(corpus, q, 10)
    val explicitProbe = topk(
      model.candidates(model.assign(corpus, "embedding"), q, nprobe = 2), q, 10)
    assert(explicitProbe != exact, "nprobe=2/8 should actually prune on this data")

    AnnRegistry.register("spec-idx", model, nprobe = 2)
    spark.conf.set("spark.graft.ann.autoProbe", "spec-idx")
    try {
      // NOTE: topk ends in select("vec_id") — the collected plan is
      // column-pruned, which is exactly the case that must still match
      val auto = topk(corpus, q, 10)
      assert(auto == explicitProbe, "rewritten plan must equal the explicit probe")
    } finally {
      spark.conf.unset("spark.graft.ann.autoProbe")
      AnnRegistry.unregister("spec-idx")
    }

    // and the exact query is restored once the conf is off
    assert(topk(corpus, q, 10) == exact)
  }

  test("rule skips a registered index of a different dimension") {
    val wrongDim = IvfModel(Array(Array(0.1f, 0.2f), Array(-0.3f, 0.4f)))
    val q = corpus.filter($"vec_id" === 3).select("embedding")
      .collect()(0).getSeq[Float](0).toArray
    spark.conf.unset("spark.graft.ann.autoProbe")
    val exact = topk(corpus, q, 10)
    AnnRegistry.register("spec-wrong-dim", wrongDim, nprobe = 1)
    spark.conf.set("spark.graft.ann.autoProbe", "spec-wrong-dim")
    try assert(topk(corpus, q, 10) == exact, "mismatched index must not hijack the plan")
    finally {
      spark.conf.unset("spark.graft.ann.autoProbe")
      AnnRegistry.unregister("spec-wrong-dim")
    }
  }

  test("on a persisted cluster-partitioned table, the probe becomes PARTITION pruning") {
    val model = IvfModel.train(corpus, "embedding", nlist = 8)
    val q = corpus.filter($"vec_id" === 3).select("embedding")
      .collect()(0).getSeq[Float](0).toArray
    val path = java.nio.file.Files.createTempDirectory("annprobe").toString
    graft.index.IndexStore.writeIvfAssigned(model.assign(corpus, "embedding"), path)
    val table = spark.read.parquet(path)

    AnnRegistry.register("spec-part", model, nprobe = 2)
    spark.conf.set("spark.graft.ann.autoProbe", "spec-part")
    try {
      val df = table
        .withColumn("score", cosine_sim(col("embedding"), typedLit(q)))
        .orderBy(col("score").desc, col("vec_id").asc).limit(5)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      // the rule filtered the EXISTING cluster_id column (no
      // nearest_centroid evaluation), and since the table is stored
      // partitionBy("cluster_id"), the IN landed in PartitionFilters —
      // the scan reads only the probed directories
      assert(!plan.contains("nearest_centroid"), s"should reuse cluster_id:\n$plan")
      assert(plan.contains("PartitionFilters: [") &&
        plan.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1")
          .contains("cluster_id"),
        s"probe must prune partitions:\n$plan")
    } finally {
      spark.conf.unset("spark.graft.ann.autoProbe")
      AnnRegistry.unregister("spec-part")
    }
  }

  test("euclidean-ASC top-k rewrites the same way as cosine-DESC") {
    import graft.functions.GraftFunctions.euclidean_dist
    val model = IvfModel.train(corpus, "embedding", nlist = 8)
    val q = corpus.filter($"vec_id" === 5).select("embedding")
      .collect()(0).getSeq[Float](0).toArray
    def nn(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("d", euclidean_dist(col("embedding"), typedLit(q)))
        .orderBy(col("d").asc, col("vec_id").asc).limit(10)
        .select("vec_id").as[Long].collect().toSeq
    spark.conf.unset("spark.graft.ann.autoProbe")
    val exact = nn(corpus)
    val explicitProbe = nn(model.candidates(model.assign(corpus, "embedding"), q, nprobe = 2))
    AnnRegistry.register("spec-l2", model, nprobe = 2)
    spark.conf.set("spark.graft.ann.autoProbe", "spec-l2")
    try assert(nn(corpus) == explicitProbe)
    finally {
      spark.conf.unset("spark.graft.ann.autoProbe")
      AnnRegistry.unregister("spec-l2")
    }
    assert(exact.head == explicitProbe.head) // self row survives the probe
  }

  test("probe filter reaches the plan and prunes scored rows") {
    val model = IvfModel.train(corpus, "embedding", nlist = 8)
    val q = corpus.filter($"vec_id" === 7).select("embedding")
      .collect()(0).getSeq[Float](0).toArray
    AnnRegistry.register("spec-idx3", model, nprobe = 2)
    spark.conf.set("spark.graft.ann.autoProbe", "spec-idx3")
    try {
      val df = corpus.withColumn("score", cosine_sim(col("embedding"), typedLit(q)))
        .orderBy(col("score").desc, col("vec_id").asc).limit(5)
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(optimized.contains("nearest_centroid") && optimized.contains(" IN "),
        s"probe filter missing:\n$optimized")
    } finally {
      spark.conf.unset("spark.graft.ann.autoProbe")
      AnnRegistry.unregister("spec-idx3")
    }
  }
}
