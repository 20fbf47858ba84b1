package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
import graft.index.IvfModel

/**
 * Semantic deduplication (SemDeDup, Abbas et al. 2023,
 * arXiv:2303.09540): cluster the corpus embeddings with k-means, find
 * near-duplicate pairs WITHIN each cluster by exact cosine, collapse
 * duplicate groups, and keep one representative per group — the member
 * LEAST similar to its cluster centroid (the paper's keep-rule:
 * near-centroid copies are the redundant ones; the outlier carries the
 * most marginal information).
 *
 * This is the embedding-level sibling of the MinHash/SimHash text
 * dedup family: those catch lexical duplicates, this catches semantic
 * ones (paraphrases, translations, re-encodings) that share no
 * shingles. The reference engine has no such operator; it is part of
 * the training-data-pipeline surface this library adds.
 *
 * Scale shape (the reason the paper clusters at all): all-pairs cosine
 * is O(n²); with k clusters of bounded size s the candidate mass is
 * Σ|c|² ≈ n·s — linear in n when k grows with n (`nlist = 0` auto-sizes
 * k to ~n/64 from parquet footer metadata, no count() scan). Each piece
 * is distributed-friendly:
 *  - k-means: seeded [[IvfModel.train]] (sampled + distributed Lloyd
 *    refinement past the driver budget);
 *  - assignment: codegen'd nearest-centroid expression, narrow map;
 *  - centroid similarity: broadcast join on the k-row centroid table;
 *  - pair expansion: ONE cluster-keyed self-join both sides of which
 *    reuse the same exchange — pairs stream through the cosine verify,
 *    embeddings are never collected into per-cluster buffers (the
 *    aggregation-buffer shape that collapses under a hot cluster);
 *  - duplicate groups: [[Dedup.connectedComponents]] (same-cluster
 *    pairs only, so groups never span clusters);
 *  - keep-rule: one `min(struct(centroid_sim, id))` aggregate per
 *    group — no window over a skewed null partition.
 *
 * Returns one row per input row with a non-null embedding:
 * `(idCol, cluster_id, centroid_sim, keep)`. Dropped rows (keep=false)
 * are exactly the non-representative members of duplicate groups.
 * Seeded and deterministic end to end.
 */
object SemDedup {

  /**
   * @param minCosine pair threshold: same-cluster pairs with exact
   *   cosine >= minCosine are duplicates (paper's 1-epsilon)
   * @param nlist k-means cluster count; 0 auto-sizes to ~n/64 clusters
   *   (clamped to [2, 4096]) from metadata so within-cluster pair mass
   *   stays ~64·n regardless of corpus size
   */
  def semDedup(df: DataFrame, idCol: String, embCol: String,
      minCosine: Double = 0.95, nlist: Int = 0,
      seed: Long = 42L, maxIter: Int = 10,
      model: Option[IvfModel] = None): DataFrame = {
    val trained = model.getOrElse(trainModel(df, embCol, nlist, seed, maxIter))
    semDedupWith(df, idCol, embCol, minCosine, trained)
  }

  /** The clustering step alone (train once, dedup many — same
    * philosophy as the served IVF index). Auto-k sizes to ~n/64
    * clusters from parquet footer metadata; trainer choice is a
    * DRIVER-flop budget: local Lloyd costs n·k·dim·iters single-thread
    * multiplies, so past n·k ≈ 3e6 (≈2e9 flops at dim 64) training
    * moves to [[IvfModel.trainDistributed]], whose per-pass cost is
    * executor-side codegen. */
  def trainModel(df: DataFrame, embCol: String, nlist: Int = 0,
      seed: Long = 42L, maxIter: Int = 10): IvfModel = {
    val n = graft.sources.TableStats.rowCountForSizing(df)
    val k =
      if (nlist > 0) nlist
      else math.max(2, math.min(4096, (n / 64L).toInt))
    if (n * k <= 3000000L)
      IvfModel.train(df, embCol, nlist = k, maxIter = maxIter, seed = seed)
    else
      IvfModel.trainDistributed(df, embCol, nlist = k,
        maxIter = math.min(maxIter, 6), seed = seed)
  }

  private def semDedupWith(df: DataFrame, idCol: String, embCol: String,
      minCosine: Double, model: IvfModel): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._

    // assigned + centroid_sim, materialized once: it feeds the pair
    // self-join, the keep-rule aggregate, and the final projection. At
    // cluster scale this is the table you'd persist partitionBy(cluster).
    val centDf = model.centroids.zipWithIndex.toSeq
      .map { case (c, i) => (i, c.toSeq) }.toDF("cluster_id", "centroid")
    val assigned = model.assign(df.select(col(idCol), col(embCol)), embCol)
      .join(broadcast(centDf), Seq("cluster_id"))
      .withColumn("centroid_sim",
        GraftFunctions.cosine_sim(col(embCol), col("centroid")))
      .drop("centroid")
      .localCheckpoint(true)

    // Within-cluster duplicate pairs: bucket self-join on cluster_id
    // (explicit repartition => both sides are one reused exchange).
    val side = assigned.select(col("cluster_id"), col(idCol).as("id"),
        col(embCol).as("emb"))
      .repartition(col("cluster_id"))
    val pairs = side.select(col("cluster_id"), col("id").as("id_a"), col("emb").as("emb_a"))
      .join(side.select(col("cluster_id"), col("id").as("id_b"), col("emb").as("emb_b")),
        Seq("cluster_id"))
      .filter(col("id_a") < col("id_b"))
      .filter(GraftFunctions.cosine_sim(col("emb_a"), col("emb_b")) >= minCosine)
      .select("id_a", "id_b")

    // Duplicate groups -> keeper per group = min (centroid_sim, id):
    // lexicographic struct-min, one hash aggregate, no window.
    val comps = Dedup.connectedComponents(pairs) // (id, label)
    val members = assigned.join(comps, assigned(idCol) === comps("id"))
      .select(col("label"), assigned(idCol).as("__m_id"), col("centroid_sim"))
    val dropIds = members
      .groupBy("label")
      .agg(min(struct(col("centroid_sim"), col("__m_id"))).as("m"))
      .select(col("label"), col("m").getField("__m_id").as("keep_id"))
      .join(members, Seq("label"))
      .filter(col("__m_id") =!= col("keep_id"))
      .select(col("__m_id").as("__drop_id"))

    assigned.join(dropIds, assigned(idCol) === dropIds("__drop_id"), "left")
      .withColumn("keep", col("__drop_id").isNull)
      .select(col(idCol), col("cluster_id"), col("centroid_sim"), col("keep"))
  }
}
