package graft.index

import scala.collection.concurrent.TrieMap

/**
 * Driver-side registry of trained ANN indexes consulted by the
 * `AnnTopKProbe` optimizer rule: when
 * `spark.graft.ann.autoProbe=<name>` is set, a
 * `ORDER BY cosine_sim(emb, <query>) DESC LIMIT k` plan is rewritten
 * to skip most of the scored+sorted work using whichever index TIER
 * is registered under that name (the Spark analog of the facade-level
 * plan choice in search_service.py:49-57, lifted into the optimizer
 * as an OPT-IN approximate-search rewrite):
 *
 *  - [[AnnRegistry.AnnIndex]] (IVF): filter to the query's top-`nprobe`
 *    cells — an existing `cluster_id` column when present (partition
 *    pruning on a `partitionBy("cluster_id")` layout), else an inline
 *    `nearest_centroid(emb) IN probed`.
 *  - [[AnnRegistry.LshIndex]]: filter to rows sharing at least one
 *    bucket with the query — `arrays_overlap(lsh_buckets(emb),
 *    <query buckets>)`, the filter form of the signature-table
 *    semi-join (same candidate set, no shuffle, survives pruning).
 *  - [[AnnRegistry.HnswIndex]]: the graph (bounded driver state, like
 *    centroids) is navigated AT OPTIMIZATION TIME for
 *    `max(k, fetchK)` candidate ids, injected as `id IN (...)` —
 *    the downstream exact score+sort reranks them.
 */
object AnnRegistry {

  sealed trait AnnIndexEntry

  final case class AnnIndex(model: IvfModel, nprobe: Int) extends AnnIndexEntry

  /** `flips > 0` widens candidates with multi-probe bit flips. */
  final case class LshIndex(model: LshModel, flips: Int = 0) extends AnnIndexEntry

  /** `idCol` names the column carrying the graph's external ids in the
    * target table; `fetchK` floors the candidate count so a small plan
    * LIMIT still reranks a meaningful pool. */
  final case class HnswIndex(model: HnswModel, idCol: String,
      fetchK: Int = 50, ef: Int = 64) extends AnnIndexEntry

  /** Binary sign-quantization tier as a Hamming-RADIUS filter: keep
    * rows whose packed sign signature is within `radius` bit flips of
    * the query's. A radius (not a top-C) because the rewrite injects a
    * per-row predicate — no global ordering is expressible there — so
    * the tuner measures the (recall, fraction) curve per radius and
    * registers the cheapest radius clearing the target. No model state
    * at all: the signature IS the stored float signs. */
  final case class BinaryIndex(dim: Int, radius: Int) extends AnnIndexEntry

  private val indexes = new TrieMap[String, AnnIndexEntry]()

  def register(name: String, model: IvfModel, nprobe: Int): Unit =
    indexes.put(name, AnnIndex(model, nprobe))

  def registerLsh(name: String, model: LshModel, flips: Int = 0): Unit =
    indexes.put(name, LshIndex(model, flips))

  def registerHnsw(name: String, model: HnswModel, idCol: String,
      fetchK: Int = 50, ef: Int = 64): Unit =
    indexes.put(name, HnswIndex(model, idCol, fetchK, ef))

  def registerBinary(name: String, dim: Int, radius: Int): Unit =
    indexes.put(name, BinaryIndex(dim, radius))

  def get(name: String): Option[AnnIndexEntry] = indexes.get(name)

  def unregister(name: String): Unit = indexes.remove(name)
}
