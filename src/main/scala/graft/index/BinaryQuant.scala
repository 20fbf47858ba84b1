package graft.index

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions.{cosine_sim, hamming_dist, sign_bits}

/**
 * Binary (sign-bit) quantization kNN: 1 bit per dimension, bit-packed
 * into ceil(dim/64) longs, Hamming-distance prefilter, exact cosine
 * rerank on the surviving candidates only.
 *
 * Sign random projections (Charikar, STOC'02) make angle proportional
 * to Hamming distance between sign signatures; with the coordinate
 * axes as the projections the signature needs NO arithmetic at all —
 * bit i is the stored float's sign, exact on every engine, which is
 * what makes this the one ANN tier whose prefilter is replayable in
 * plain SQL with zero margin guards (AnnOracles.q116).
 *
 * The at-scale shape (the reason this tier exists):
 *
 *  - The prefilter scans the 8-byte/64-dims `sig` column — 32× less
 *    I/O than the 256-byte float32 embedding — and is a pure
 *    xor+popcount whole-stage-codegen loop (no interpreted
 *    higher-order functions on the n-row path, the round-10 rule).
 *  - The top-C heap carries only (id, ham): `TakeOrderedAndProject`,
 *    per-partition heaps of C narrow rows, no corpus shuffle.
 *  - Only the C winners touch float vectors again, via a broadcast
 *    semi-join back into the corpus — at 100 TB that is a C-row
 *    broadcast against a column-pruned scan, not a second full read
 *    of the wide column on the driver.
 *
 * In production the signature table is materialized once
 * ([[signatures]]) next to the corpus and maintained by the same
 * append/reconcile contract as the LSH/IVF tiers; the one-shot [[knn]]
 * plan computes it inline, which costs one wide scan at fixture scale
 * but keeps the operator self-contained.
 */
object BinaryQuant {

  /** Driver-side packing, bit-identical to the SignBits expression. */
  def pack(v: Array[Float]): Array[Long] = {
    val words = new Array[Long]((v.length + 63) >>> 6)
    var i = 0
    while (i < v.length) {
      if (v(i) >= 0f) words(i >>> 6) |= (1L << (i & 63))
      i += 1
    }
    words
  }

  /** The narrow signature table: (id, sig) — materialize once, scan
    * many. 8 bytes per 64 dims per row. */
  def signatures(corpus: DataFrame, idCol: String, embCol: String): DataFrame =
    corpus.filter(col(embCol).isNotNull)
      .select(col(idCol), sign_bits(col(embCol)).as("sig"))

  /**
   * Single-query kNN: Hamming top-`candidates` over the signature
   * scan (integer distance, id-ascending tiebreak — deterministic with
   * no float boundary to guard), then exact cosine rerank of the C
   * winners to top-k (score desc, id asc — the shared Q1 tiebreak).
   */
  def knn(corpus: DataFrame, idCol: String, embCol: String,
      query: Array[Float], k: Int, candidates: Int): DataFrame = {
    val qSig = typedLit(pack(query).toSeq)
    val cand = signatures(corpus, idCol, embCol)
      .withColumn("ham", hamming_dist(col("sig"), qSig))
      .orderBy(col("ham").asc, col(idCol).asc)
      .limit(candidates)
      .select(col(idCol), col("ham"))
    corpus.join(broadcast(cand), idCol)
      .withColumn("score", cosine_sim(col(embCol), typedLit(query.toSeq)))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
  }
}
