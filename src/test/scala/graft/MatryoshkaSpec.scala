package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Matryoshka prefix-dim two-stage kNN (q131): exact parity when the
  * coarse pass uses all dims, recall vs brute force on the fixture,
  * and determinism under repartitioning. */
class MatryoshkaSpec extends SparkSpec {
  import spark.implicits._

  private def emb = spark.read.parquet(s"$sfDir/embeddings.parquet")

  private def dim: Int =
    emb.select(size(col("embedding"))).first().getInt(0)

  test("coarseDims = dim degenerates to exact kNN (id-for-id)") {
    val q = emb.filter(col("vec_id") < 5)
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
        q, "vec_id", "embedding", 10)
      .select("query_id", "neighbor_id", "rank")
    val mat = Similarity.matryoshkaTopK(emb, "vec_id", "embedding",
        q, "vec_id", "embedding", k = 10, coarseDims = dim, poolSize = 10)
      .select("query_id", "neighbor_id", "rank")
    assert(exact.exceptAll(mat).count() == 0 &&
      mat.exceptAll(exact).count() == 0)
  }

  test("prefix coarse pass: poolSize is a working recall dial") {
    // the fixture embeddings are NOT MRL-trained, so a 16/64 prefix is
    // the pessimistic case for the coarse metric (an isotropic prefix
    // carries ~1/4 of the signal — measured recall@10 ≈ 0.47 at pool
    // 30). The operator's CONTRACT is the dial: recall must rise with
    // poolSize and reach 1.0 as the pool approaches the corpus.
    val q = emb.filter(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
        q, "vec_id", "embedding", 10)
      .select(col("query_id"), col("neighbor_id"))
    val nExact = exact.count()
    def recallAt(pool: Int): Double = {
      val mat = Similarity.matryoshkaTopK(emb, "vec_id", "embedding",
          q, "vec_id", "embedding", k = 10, coarseDims = 16, poolSize = pool)
        .select(col("query_id"), col("neighbor_id"))
      exact.join(mat, Seq("query_id", "neighbor_id")).count().toDouble / nExact
    }
    val r30 = recallAt(30)
    val r120 = recallAt(120)
    assert(r30 >= 0.35, s"recall@10 pool=30 collapsed: $r30")
    assert(r120 >= r30 && r120 >= 0.6,
      s"pool dial broken: pool30=$r30, pool120=$r120")
  }

  test("stored prefix column: identical output, prefix-only coarse scan") {
    // the 100 TB layout move (VERDICT r16 item 3): prefixCol must be
    // value-identical to slice-on-read (it IS the slice, stored), and
    // the coarse pool's plan must read only the prefix column
    val withPre = emb.withColumn("pre16",
      slice(col("embedding"), lit(1), lit(16)).cast("array<float>"))
    val q = emb.filter(col("vec_id") < 5)
    val a = Similarity.matryoshkaTopK(withPre, "vec_id", "embedding",
      q, "vec_id", "embedding", k = 10, coarseDims = 16, poolSize = 30)
    val b = Similarity.matryoshkaTopK(withPre, "vec_id", "embedding",
      q, "vec_id", "embedding", k = 10, coarseDims = 16, poolSize = 30,
      prefixCol = Some("pre16"))
    val diff = a.alias("a").join(b.alias("b"), Seq("query_id", "rank"))
      .filter(col("a.neighbor_id") =!= col("b.neighbor_id") ||
        col("a.score") =!= col("b.score") ||
        col("a.cscore") =!= col("b.cscore"))
    assert(diff.count() == 0 && a.count() == b.count())
    // column pruning: the pool-over-parquet plan must NOT read the
    // full embedding column when the prefix is stored
    val dir = java.nio.file.Files.createTempDirectory("matpre").toString
    withPre.write.mode("overwrite").parquet(dir)
    val stored = spark.read.parquet(dir)
    val plan = Similarity.matryoshkaPool(stored, "vec_id", "embedding",
        q, "vec_id", "embedding", coarseDims = 16, poolSize = 30,
        prefixCol = Some("pre16"))
      .queryExecution.executedPlan.toString
    val scanLine = plan.linesIterator
      .find(l => l.contains("ReadSchema") && l.contains("pre16"))
    assert(scanLine.exists(!_.contains("embedding:")),
      s"prefix coarse scan still reads the embedding column:\n$scanLine")
  }

  test("deterministic under repartitioning") {
    val q = emb.filter(col("vec_id") < 4)
    val a = Similarity.matryoshkaTopK(emb, "vec_id", "embedding",
      q, "vec_id", "embedding", k = 5, coarseDims = 16, poolSize = 15)
    val b = Similarity.matryoshkaTopK(emb.repartition(9), "vec_id", "embedding",
      q, "vec_id", "embedding", k = 5, coarseDims = 16, poolSize = 15)
    val diff = a.alias("a").join(b.alias("b"), Seq("query_id", "rank"))
      .filter(col("a.neighbor_id") =!= col("b.neighbor_id") ||
        col("a.score") =!= col("b.score"))
    assert(diff.count() == 0 && a.count() == b.count())
  }
}
