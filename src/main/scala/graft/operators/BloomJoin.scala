package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.BinaryType

/**
 * Bloom-filter semi-join reduction — the runtime-filter pattern that
 * makes selective fact⋈dim joins viable at 100 TB (Spark's own
 * InjectRuntimeFilter, Trino's dynamic filtering): build a Bloom filter
 * over the dimension side's join keys (KB-to-MB driver state), push it
 * to the fact scan as a codegen'd predicate, and only the ~matching
 * rows pay the shuffle. The Bloom pass has no false negatives, so the
 * EXACT join downstream returns precisely the true result — false
 * positives (rate `fpp`) cost only wasted shuffle rows, never wrong
 * answers. With a 1% fpp and a 0.1%-selective dimension filter, the
 * fact-side shuffle shrinks ~99%.
 *
 * Plumbing: keys are hashed with the codegen'd `XxHash64` and inserted
 * via `DataFrame.stat.bloomFilter` (one aggregation over the dim side);
 * the probe predicate is Spark's own `BloomFilterMightContain` over the
 * serialized filter — both sides put/probe the same 64-bit hash, and
 * the predicate stays inside whole-stage codegen. Spark ships this
 * exact rewrite as an AQE-era optimizer rule
 * (spark.sql.optimizer.runtime.bloomFilter.*) for equi-joins it can
 * see through; this operator is the explicit form, usable when the
 * build side is a pre-computed key set (a curated id list, yesterday's
 * partition, a decontamination registry) rather than a visible join
 * subtree.
 */
object BloomJoin {

  /** Serialized Bloom filter of `xxhash64(keyCol)` over `dim`. */
  def buildBloom(dim: DataFrame, keyCol: String,
      expectedItems: Long = 1000000L, fpp: Double = 0.01): Array[Byte] = {
    val bf = dim.select(xxhash64(col(keyCol)).as("__h"))
      .stat.bloomFilter("__h", expectedItems, fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** Codegen'd membership predicate: `might_contain(bloom, xxhash64(key))`. */
  def mightContain(bloomBytes: Array[Byte], key: Column): Column =
    Bridge.column(BloomFilterMightContain(
      Literal(bloomBytes, BinaryType),
      // seed 42 = the default of the public xxhash64() used on the
      // build side; both sides must hash identically
      XxHash64(Seq(Bridge.expression(key)), 42L)))

  /** Exact left-semi join of `fact` against `dim`'s keys with the Bloom
    * pre-filter on the probe side. Result is identical to the plain
    * semi join (no false negatives); the pre-filter only shrinks what
    * reaches the shuffle. */
  def semiJoinReduced(fact: DataFrame, factKey: String,
      dim: DataFrame, dimKey: String,
      expectedItems: Long = 1000000L, fpp: Double = 0.01): DataFrame = {
    val bloom = buildBloom(dim, dimKey, expectedItems, fpp)
    val keys = dim.select(col(dimKey).as("__bj_key"))
    fact.filter(mightContain(bloom, col(factKey)))
      .join(keys, col(factKey) === col("__bj_key"), "left_semi")
  }
}
