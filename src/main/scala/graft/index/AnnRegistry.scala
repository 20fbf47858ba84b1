package graft.index

import scala.collection.concurrent.TrieMap

/**
 * Driver-side registry of trained ANN indexes consulted by the
 * `AnnTopKProbe` optimizer rule: when
 * `spark.graft.ann.autoProbe=<name>` is set, a
 * `ORDER BY cosine_sim(emb, <query>) DESC LIMIT k` plan over a
 * cluster-assigned table is rewritten to probe only the top-`nprobe`
 * clusters of the registered model (the Spark analog of the
 * facade-level plan choice in search_service.py:49-57, lifted into the
 * optimizer as an OPT-IN approximate-search rewrite).
 */
object AnnRegistry {

  final case class AnnIndex(model: IvfModel, nprobe: Int)

  private val indexes = new TrieMap[String, AnnIndex]()

  def register(name: String, model: IvfModel, nprobe: Int): Unit =
    indexes.put(name, AnnIndex(model, nprobe))

  def get(name: String): Option[AnnIndex] = indexes.get(name)

  def unregister(name: String): Unit = indexes.remove(name)
}
