package graft.index

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.graft.expressions.NearestCentroid
import graft.model.GraftConfig

/**
 * IVF (inverted-file) index: k-means cluster centroids + a
 * cluster-assigned chunk table (the Spark-native form of the reference's
 * inverted lists, app/database/indexes.py:181-379). Training is MLlib
 * `KMeans` (replacing the hand-rolled Lloyd loop, indexes.py:228-265);
 * assignment is a codegen'd nearest-centroid expression; search probes
 * the top-`nprobe` centroids on the driver (they are KB-scale) and
 * partition-prunes the assigned table with `isin` — the Spark analog of
 * "only scan 5 of 100 inverted lists" (indexes.py:346-356).
 *
 * Reference parity notes: training triggers once at n >= nlist
 * (indexes.py:280); an untrained index returns empty results
 * (indexes.py:343) — callers enforce both via `IvfModel.trainIfReady`.
 */
final case class IvfModel(centroids: Array[Array[Float]]) {

  def nlist: Int = centroids.length

  /** Cluster id column (codegen'd argmin-L2, ties to lowest id). */
  def assignColumn(emb: Column): Column =
    Bridge.column(NearestCentroid(Bridge.expression(emb), centroids))

  /** Assigned table: chunks + `cluster_id`. Write partitionBy("cluster_id")
    * at scale so probes become partition pruning. */
  def assign(chunks: DataFrame, embCol: String): DataFrame =
    chunks.filter(col(embCol).isNotNull)
      .withColumn("cluster_id", assignColumn(col(embCol)))

  /** Driver-side top-`nprobe` centroid ids by L2 distance (indexes.py:346-349). */
  def probe(query: Array[Float], nprobe: Int = GraftConfig.ivfNprobe): Seq[Int] =
    centroids.zipWithIndex.map { case (c, i) =>
      var d = 0.0
      val n = math.min(c.length, query.length)
      var j = 0
      while (j < n) { val x = c(j) - query(j); d += x * x; j += 1 }
      (d, i)
    }.sortBy(t => (t._1, t._2)).take(math.max(1, nprobe)).map(_._2).toSeq

  /** Probed candidate rows from the assigned table. */
  def candidates(assigned: DataFrame, query: Array[Float],
      nprobe: Int = GraftConfig.ivfNprobe): DataFrame =
    assigned.filter(col("cluster_id").isin(probe(query, nprobe).map(Int.box): _*))
}

object IvfModel {

  /**
   * Train centroids with MLlib KMeans (k = min(nlist, n), <= `maxIter`
   * Lloyd iterations, fixed seed — mirroring indexes.py:244-262 where it
   * matters: iteration cap and convergence tolerance 1e-4).
   */
  def train(chunks: DataFrame, embCol: String,
      nlist: Int = GraftConfig.ivfNlist, maxIter: Int = 10,
      seed: Long = 42L): IvfModel = {
    val vecs = chunks.filter(col(embCol).isNotNull)
      .select(array_to_vector(col(embCol).cast("array<double>")).as("features"))
    val n = vecs.count()
    val k = math.min(nlist.toLong, math.max(1L, n)).toInt
    val model = new KMeans()
      .setK(k).setMaxIter(maxIter).setTol(1e-4).setSeed(seed)
      .fit(vecs)
    IvfModel(model.clusterCenters.map(_.toArray.map(_.toFloat)))
  }

  /** Reference trigger semantics: train only once n >= nlist (indexes.py:280). */
  def trainIfReady(chunks: DataFrame, embCol: String,
      nlist: Int = GraftConfig.ivfNlist, seed: Long = 42L): Option[IvfModel] = {
    val n = chunks.filter(col(embCol).isNotNull).count()
    if (n >= nlist) Some(train(chunks, embCol, nlist, 10, seed)) else None
  }
}
