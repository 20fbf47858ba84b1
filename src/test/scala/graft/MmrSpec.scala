package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** MMR diversified top-k (q130): greedy semantics on a planted
  * two-cluster corpus, rank-1 == relevance argmax, determinism, and
  * the diversification contract vs plain top-k. */
class MmrSpec extends SparkSpec {
  import spark.implicits._

  // two tight clusters at ±~17° off the query axis, A slightly
  // closer: plain top-3 stays inside cluster A (rels .958/.955/.952 >
  // B's .944), but A is internally near-duplicate (sim ≈ .9999, so a
  // second A pick earns ≈ 0 marginal score) while B sits at sim ≈ .81
  // to A — at λ=0.5 its mmr ≈ +.067 beats any remaining A's ≈ −.02.
  //   query      (1, 0, 0)
  //   cluster A: ids 1-3  = (1, +.30/.31/.32, 0)
  //   cluster B: ids 11-13 = (1, −.35/.36/.37, 0)
  private def corpus = Seq(
    (1L, Array(1f, 0.30f, 0f)), (2L, Array(1f, 0.31f, 0f)),
    (3L, Array(1f, 0.32f, 0f)),
    (11L, Array(1f, -0.35f, 0f)), (12L, Array(1f, -0.36f, 0f)),
    (13L, Array(1f, -0.37f, 0f))
  ).toDF("id", "emb")
  private def query = Seq((100L, Array(1f, 0f, 0f))).toDF("id", "emb")

  test("diversification: MMR crosses clusters where plain top-k cannot") {
    val plain = Similarity.bruteForceTopK(corpus, "id", "emb",
        query, "id", "emb", 3)
      .orderBy("rank").collect().map(_.getLong(1)).toSeq
    assert(plain == Seq(1L, 2L, 3L), s"plain top-3 is all cluster A: $plain")

    val mmr = Similarity.mmrTopK(corpus, "id", "emb", query, "id", "emb",
        k = 3, poolSize = 6, lambda = 0.5)
      .orderBy("rank").collect()
    val ids = mmr.map(_.getLong(2)).toSeq
    assert(ids.head == 1L, "rank 1 is the pure relevance argmax")
    assert(ids.exists(id => id >= 11L),
      s"MMR at λ=0.5 must pick a cluster-B member: $ids")
    // mmr score column is the selection-time objective: non-increasing
    // is NOT guaranteed across steps, but rank1's mmr = λ·rel
    assert(math.abs(mmr.head.getDouble(4) - 0.5 * mmr.head.getDouble(3)) < 1e-12)
  }

  test("λ=1 degenerates to plain top-k") {
    val mmr = Similarity.mmrTopK(corpus, "id", "emb", query, "id", "emb",
        k = 3, poolSize = 6, lambda = 1.0)
      .orderBy("rank").collect().map(_.getLong(2)).toSeq
    assert(mmr == Seq(1L, 2L, 3L))
  }

  test("deterministic under repartitioning, multi-query") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val q = e.filter(col("vec_id") < 4)
    val a = Similarity.mmrTopK(e, "vec_id", "embedding",
      q, "vec_id", "embedding", k = 5, poolSize = 20)
    val b = Similarity.mmrTopK(e.repartition(7), "vec_id", "embedding",
      q, "vec_id", "embedding", k = 5, poolSize = 20)
    assert(a.count() == 20 && b.count() == 20, "4 queries × k=5")
    val diff = a.alias("a").join(b.alias("b"), Seq("query_id", "rank"))
      .filter(col("a.neighbor_id") =!= col("b.neighbor_id") ||
        col("a.mmr") =!= col("b.mmr"))
    assert(diff.count() == 0)
  }

  test("mmrRerank over an ANN-tier pool: the at-scale composition") {
    // pool from the Matryoshka tier (any (query_id, neighbor_id,
    // score) source works); with the pool covering the same top set,
    // the diversified selection matches the brute-force-pool result
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val q = e.filter(col("vec_id") < 3)
    val annPool = Similarity.matryoshkaTopK(e, "vec_id", "embedding",
        q, "vec_id", "embedding", k = 20, coarseDims = 64, poolSize = 20)
      .select("query_id", "neighbor_id", "score")
    val viaAnn = Similarity.mmrRerank(annPool, e, "vec_id", "embedding",
      k = 5, lambda = 0.7)
    val viaBrute = Similarity.mmrTopK(e, "vec_id", "embedding",
      q, "vec_id", "embedding", k = 5, poolSize = 20, lambda = 0.7)
    val diff = viaAnn.alias("a").join(viaBrute.alias("b"), Seq("query_id", "rank"))
      .filter(col("a.neighbor_id") =!= col("b.neighbor_id") ||
        col("a.mmr") =!= col("b.mmr"))
    assert(viaAnn.count() == 15 && diff.count() == 0,
      "full-dim matryoshka pool == brute pool => identical MMR selection")
  }

  test("selected set is distinct per query and rank is dense 1..k") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val q = e.filter(col("vec_id") < 3)
    val out = Similarity.mmrTopK(e, "vec_id", "embedding",
      q, "vec_id", "embedding", k = 4, poolSize = 10).collect()
    val byQ = out.groupBy(_.getLong(0))
    byQ.foreach { case (_, rows) =>
      assert(rows.map(_.getLong(2)).distinct.length == 4, "no repeats")
      assert(rows.map(_.getInt(1)).sorted.toSeq == Seq(1, 2, 3, 4))
    }
  }
}
