package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.udf

/**
 * Text -> embedding source. The reference calls the Cohere HTTP API
 * (reference: app/utils/embedding.py:28-63, model embed-v4.0, dim 1024,
 * config.py:16-20). A network embedder is neither hermetic nor
 * reproducible, so the engine's default is a deterministic local
 * hash-projection embedder behind the same `embed(texts)` interface;
 * a remote implementation can be slotted in without touching callers.
 */
trait Embedder extends Serializable {
  def dimension: Int
  /** Embed a batch of texts (reference batches too, embedding.py:28). */
  def embed(texts: Seq[String]): Seq[Array[Float]]
  final def embedOne(text: String): Array[Float] = embed(Seq(text)).head
}

/**
 * Deterministic feature-hashing embedder: each whitespace/punct token is
 * hashed into `dimension` buckets with a signed hash (the standard
 * hashing-trick from Weinberger et al., "Feature Hashing for Large Scale
 * Multitask Learning"), then L2-normalized. Tokens share no state, so
 * the map over a corpus is embarrassingly parallel and the function is
 * pure — safe to run as a distributed expression at any scale.
 */
final case class HashingEmbedder(dimension: Int = 64, seed: Int = 42) extends Embedder {
  private def mix(h0: Long): Long = {
    // splitmix64 finalizer — deterministic, well-distributed
    var z = h0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private def tokenHash(token: String): Long = {
    var h: Long = seed.toLong
    var i = 0
    while (i < token.length) { h = h * 31 + token.charAt(i); i += 1 }
    mix(h)
  }

  def embed(texts: Seq[String]): Seq[Array[Float]] = texts.map { text =>
    val v = new Array[Float](dimension)
    if (text != null) {
      val tokens = text.toLowerCase.split("\\W+")
      var t = 0
      while (t < tokens.length) {
        val tok = tokens(t)
        if (tok.nonEmpty) {
          val h = tokenHash(tok)
          val bucket = java.lang.Math.floorMod(h, dimension.toLong).toInt
          val sign = if ((h >>> 62 & 1L) == 0L) 1.0f else -1.0f
          v(bucket) += sign
        }
        t += 1
      }
    }
    var norm = 0.0
    var i = 0
    while (i < dimension) { norm += v(i).toDouble * v(i); i += 1 }
    if (norm > 0) {
      val inv = (1.0 / math.sqrt(norm)).toFloat
      i = 0; while (i < dimension) { v(i) *= inv; i += 1 }
    }
    v
  }
}

object Embedder {
  /** Engine default: hermetic, seeded, 64-dim. */
  val default: Embedder = HashingEmbedder()

  /** Column form for distributed embedding of a text column. */
  def embedColumn(e: Embedder): Column => Column = {
    val f = udf((text: String) => e.embed(Seq(text)).head)
    (c: Column) => f(c)
  }

  def register(spark: SparkSession, e: Embedder = default): Unit =
    spark.udf.register("embed_text", (text: String) => e.embed(Seq(text)).head)
}
