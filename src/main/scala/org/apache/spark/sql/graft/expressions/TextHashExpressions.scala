package org.apache.spark.sql.graft.expressions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Hash-based document fingerprinting expressions for the dedup suite:
 * Karp-Rabin rolling hash, SimHash, and MinHash signatures. All
 * deterministic (fixed seeds), no external hash dependencies — splitmix64
 * over a polynomial string hash.
 */
object TextHash {
  final val Mod61: Long = (1L << 61) - 1 // Mersenne prime 2^61-1

  @inline def splitmix64(h0: Long): Long = {
    var z = h0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Polynomial hash of UTF-8 bytes, then splitmix64 finalized. */
  def stringHash(s: UTF8String, seed: Long): Long = {
    val bytes = s.getBytes
    var h = seed
    var i = 0
    while (i < bytes.length) { h = h * 31 + bytes(i); i += 1 }
    splitmix64(h)
  }

  /** Karp-Rabin rolling polynomial hash mod 2^61-1, base 257. */
  def rollingHash(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      var acc = mulMod(h, 257L) + (bytes(i) & 0xffL)
      if (acc >= Mod61) acc -= Mod61
      h = acc
      i += 1
    }
    h
  }

  /**
   * (a*b) mod 2^61-1 for a,b < 2^61, via the 128-bit product: with
   * p = 2^61-1 we have 2^61 ≡ 1 and 2^64 ≡ 8 (mod p), so
   * hi*2^64 + lo ≡ hi*8 + (lo >>> 61) + (lo & p).
   */
  @inline def mulMod(a: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    modP(modP(hi * 8 + (lo >>> 61)) + (lo & Mod61))
  }

  @inline def modP(x: Long): Long = {
    var r = (x & Mod61) + (x >>> 61)
    if (r >= Mod61) r -= Mod61
    r
  }
}

/** `rolling_hash(text)` — Karp-Rabin fingerprint of the full text. */
case class RollingHash(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def prettyName: String = "rolling_hash"
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any =
    TextHash.rollingHash(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.expressions.TextHash.rollingHash($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/**
 * `hash_bucket(id, n)` — deterministic sampling bucket in [0, n):
 * splitmix64 of the id, reduced with UNSIGNED modulo (so the Spark
 * value matches an engine doing the same arithmetic on UBIGINT — the
 * DuckDB oracle replays splitmix64 with HUGEINT wraparound math).
 * The backbone of reproducible train/val/test splits and p%-samples:
 * membership is a pure function of the id, stable across runs,
 * clusters, and engines — unlike `sample()`, which depends on
 * partitioning.
 */
case class HashBucket(child: Expression, buckets: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(buckets > 0, "buckets must be positive")
  override def prettyName: String = "hash_bucket"
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = IntegerType

  override def nullSafeEval(v: Any): Any =
    java.lang.Long.remainderUnsigned(
      TextHash.splitmix64(v.asInstanceOf[Long]), buckets.toLong).toInt

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"(int) java.lang.Long.remainderUnsigned(" +
        s"org.apache.spark.sql.graft.expressions.TextHash.splitmix64($c), ${buckets}L)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `splitmix64(id)` — the raw splitmix64 mix of a long: the ordering
  * key for deterministic corpus shuffling (a reproducible pseudo-random
  * permutation, pure function of the id — `orderBy(rand())` is neither
  * stable across runs nor replayable by another engine). */
case class SplitMix64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def prettyName: String = "splitmix64"
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any =
    TextHash.splitmix64(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.expressions.TextHash.splitmix64($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `string_hash64(s)` — poly-31-over-bytes + splitmix64 finalizer
  * (the dedup suite's shingle hash) as a standalone scalar: the span
  * fingerprint for repeated-substring detection. */
case class StringHash64(child: Expression, seed: Long = 42L)
    extends UnaryExpression with ExpectsInputTypes {
  override def prettyName: String = "string_hash64"
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any =
    TextHash.stringHash(v.asInstanceOf[UTF8String], seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.expressions.TextHash.stringHash($c, ${seed}L)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/**
 * `simhash64(tokens)` — 64-bit SimHash over an array of token strings
 * (Charikar 2002): each token votes its hash's bits up/down; the sign of
 * each accumulated bit forms the fingerprint. Near-duplicate texts have
 * small Hamming distance between fingerprints.
 */
case class SimHash64(child: Expression, seed: Long = 42L)
    extends UnaryExpression with ExpectsInputTypes {
  override def prettyName: String = "simhash64"
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any =
    SimHashEval.eval(v.asInstanceOf[ArrayData], seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"${ev.value} = org.apache.spark.sql.graft.expressions.SimHashEval.eval($c, ${seed}L);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHashEval {
  def eval(arr: ArrayData, seed: Long): Long = {
    val votes = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = TextHash.stringHash(arr.getUTF8String(i), seed)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }
}

/**
 * `minhash(tokens, k)` — MinHash signature (k independent permutations
 * approximated as splitmix64(base_hash ^ seed_j)). Jaccard(A,B) ≈
 * fraction of agreeing signature positions (Broder 1997).
 */
case class MinHashSignature(child: Expression, numHashes: Int, seed: Long = 42L)
    extends UnaryExpression with ExpectsInputTypes {
  override def prettyName: String = "minhash"
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    MinHashEval.eval(v.asInstanceOf[ArrayData], numHashes, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"${ev.value} = org.apache.spark.sql.graft.expressions.MinHashEval.eval($c, $numHashes, ${seed}L);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashEval {
  def eval(arr: ArrayData, k: Int, seed: Long): ArrayData = {
    val n = arr.numElements()
    val sig = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val base = TextHash.stringHash(arr.getUTF8String(i), seed)
        var j = 0
        while (j < k) {
          val h = TextHash.splitmix64(base ^ (seed + 0x9e3779b9L * (j + 1)))
          if (h < sig(j)) sig(j) = h
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(sig)
  }
}
