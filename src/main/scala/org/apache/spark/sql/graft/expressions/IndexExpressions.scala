package org.apache.spark.sql.graft.expressions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/**
 * Random-hyperplane LSH bucket keys (reference semantics:
 * app/database/indexes.py:86-101 — per table t, per plane p, bit =
 * 1 iff v·p >= 0; the reference joins bits into a string, we bit-pack
 * into a long and prepend the table id: bucket = table << bits | sig).
 *
 * Hyperplanes are derived deterministically from (numTables, bits, dim,
 * seed) via java.util.Random gaussians + row normalization (mirroring
 * indexes.py:64-73 but seeded), so executors regenerate them locally —
 * nothing is shipped with the expression.
 */
object LshPlanes {
  private val cache = new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int, Long), Array[Array[Float]]]()

  /** Flattened planes: (numTables*bits) rows of `dim` floats. */
  def planes(numTables: Int, bits: Int, dim: Int, seed: Long): Array[Array[Float]] =
    cache.computeIfAbsent((numTables, bits, dim, seed), _ => {
      val rnd = new java.util.Random(seed)
      Array.fill(numTables * bits) {
        val p = Array.fill(dim)(rnd.nextGaussian().toFloat)
        val norm = math.sqrt(p.map(x => x.toDouble * x).sum)
        if (norm > 0) p.map(x => (x / norm).toFloat) else p
      }
    })

  def buckets(v: ArrayData, numTables: Int, bits: Int, dim: Int, seed: Long): ArrayData = {
    val ps = planes(numTables, bits, dim, seed)
    val out = new Array[Long](numTables)
    var t = 0
    while (t < numTables) {
      var sig = 0L
      var b = 0
      while (b < bits) {
        val plane = ps(t * bits + b)
        var dot = 0.0
        val n = math.min(plane.length, v.numElements())
        var i = 0
        while (i < n) { dot += plane(i).toDouble * v.getFloat(i); i += 1 }
        if (dot >= 0) sig |= (1L << b)
        b += 1
      }
      out(t) = (t.toLong << bits) | sig
      t += 1
    }
    new GenericArrayData(out)
  }

  /** Columnar form of [[multiProbeBucketsOf]] for the batch bucket
    * join's query side: (1 + flips)·numTables keys per row. */
  def multiProbeBuckets(v: ArrayData, numTables: Int, bits: Int,
      dim: Int, seed: Long, flips: Int): ArrayData = {
    val ps = planes(numTables, bits, dim, seed)
    // clamp to [0, bits]: only `bits` single-bit flips exist per table —
    // sizing the array with an unclamped larger `flips` would leave
    // trailing 0L slots (a VALID key: table 0, sig 0) injecting spurious
    // colliding candidates, and diverge from the driver-side
    // multiProbeBucketsOf's numTables*(1+min(flips,bits)) length.
    val f = math.max(0, math.min(flips, bits))
    val out = new Array[Long](numTables * (1 + f))
    var o = 0
    var t = 0
    while (t < numTables) {
      var sig = 0L
      val absDots = new Array[(Double, Int)](bits)
      var b = 0
      while (b < bits) {
        val plane = ps(t * bits + b)
        var dot = 0.0
        val n = math.min(plane.length, v.numElements())
        var i = 0
        while (i < n) { dot += plane(i).toDouble * v.getFloat(i); i += 1 }
        if (dot >= 0) sig |= (1L << b)
        absDots(b) = (math.abs(dot), b)
        b += 1
      }
      out(o) = (t.toLong << bits) | sig
      o += 1
      val lowConfidence = absDots.sortBy(_._1).take(f)
      lowConfidence.foreach { case (_, bit) =>
        out(o) = (t.toLong << bits) | (sig ^ (1L << bit))
        o += 1
      }
      t += 1
    }
    new GenericArrayData(out)
  }

  /**
   * Driver-side multi-probe buckets (Lv et al. 2007, sign-bit form):
   * per table, the base bucket plus one variant per flipped bit for the
   * `flips` planes with the smallest |dot| — the bits most likely to be
   * on the wrong side for a near neighbor. (1 + flips) probes/table.
   */
  def multiProbeBucketsOf(v: Array[Float], numTables: Int, bits: Int,
      dim: Int, seed: Long, flips: Int): Array[Long] = {
    val ps = planes(numTables, bits, dim, seed)
    val out = Array.newBuilder[Long]
    var t = 0
    while (t < numTables) {
      var sig = 0L
      val absDots = new Array[(Double, Int)](bits)
      var b = 0
      while (b < bits) {
        val plane = ps(t * bits + b)
        var dot = 0.0
        val n = math.min(plane.length, v.length)
        var i = 0
        while (i < n) { dot += plane(i).toDouble * v(i); i += 1 }
        if (dot >= 0) sig |= (1L << b)
        absDots(b) = (math.abs(dot), b)
        b += 1
      }
      val base = (t.toLong << bits) | sig
      out += base
      val lowConfidence = absDots.sortBy(_._1).take(math.max(0, flips))
      lowConfidence.foreach { case (_, bit) =>
        out += (t.toLong << bits) | (sig ^ (1L << bit))
      }
      t += 1
    }
    out.result()
  }

  /** Driver-side buckets for a query vector. */
  def bucketsOf(v: Array[Float], numTables: Int, bits: Int, dim: Int, seed: Long): Array[Long] = {
    val ps = planes(numTables, bits, dim, seed)
    val out = new Array[Long](numTables)
    var t = 0
    while (t < numTables) {
      var sig = 0L
      var b = 0
      while (b < bits) {
        val plane = ps(t * bits + b)
        var dot = 0.0
        val n = math.min(plane.length, v.length)
        var i = 0
        while (i < n) { dot += plane(i).toDouble * v(i); i += 1 }
        if (dot >= 0) sig |= (1L << b)
        b += 1
      }
      out(t) = (t.toLong << bits) | sig
      t += 1
    }
    out
  }
}

/** `lsh_buckets(embedding)` — array of per-table bucket keys. */
case class LshBuckets(child: Expression, numTables: Int, bits: Int, dim: Int, seed: Long)
    extends UnaryExpression with ExpectsInputTypes {
  override def prettyName: String = "lsh_buckets"
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    LshPlanes.buckets(v.asInstanceOf[ArrayData], numTables, bits, dim, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graft.expressions.LshPlanes.buckets(" +
        s"$c, $numTables, $bits, $dim, ${seed}L);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `lsh_multiprobe_buckets(embedding)` — (1 + flips)·numTables bucket
  * keys per row: the base key per table plus the `flips`
  * lowest-confidence sign flips (Lv et al. 2007). The batch sibling of
  * the driver-side multi-probe query path. */
case class LshMultiProbeBuckets(child: Expression, numTables: Int, bits: Int,
    dim: Int, seed: Long, flips: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def prettyName: String = "lsh_multiprobe_buckets"
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    LshPlanes.multiProbeBuckets(v.asInstanceOf[ArrayData], numTables, bits,
      dim, seed, flips)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graft.expressions.LshPlanes.multiProbeBuckets(" +
        s"$c, $numTables, $bits, $dim, ${seed}L, $flips);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/**
 * `hnsw_nearest_cell(embedding)` — nearest-centroid assignment routed
 * through an HNSW graph built OVER the centroids (the coarse-quantizer
 * composition applied to k-means itself): per-row cost is the graph's
 * O(ef·log nlist) beam instead of [[NearestCentroid]]'s nlist·dim
 * linear scan — the difference between 2.6e5 and ~1e4 flops per row at
 * nlist 4096. Approximate by construction (the beam can miss the true
 * argmin); [[graft.index.IvfModel.trainDistributed]] offers it as the
 * opt-in assignment for large-k Lloyd passes, where k-means tolerates
 * approximate assignment (each pass still reduces SSE w.r.t. the
 * assignment it made). Deterministic for a fixed (graph, ef).
 * Eval-based (no codegen): the per-row work is the graph walk itself,
 * not expression glue.
 */
case class HnswNearestCell(child: Expression, graph: graft.index.HnswModel,
    ef: Int)
    extends UnaryExpression with ExpectsInputTypes
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def prettyName: String = "hnsw_nearest_cell"
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = IntegerType

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val arr = new Array[Float](a.numElements())
    var i = 0
    while (i < arr.length) { arr(i) = a.getFloat(i); i += 1 }
    graph.probeCells(arr, 1, ef).head
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/**
 * `nearest_centroid(embedding)` — argmin of L2 distance to the trained
 * centroid set (reference: indexes.py:267-274); ties break to the lowest
 * centroid id. Centroids ride along with the expression (KB-scale).
 */
case class NearestCentroid(child: Expression, centroids: Array[Array[Float]])
    extends UnaryExpression with ExpectsInputTypes {
  override def prettyName: String = "nearest_centroid"
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = IntegerType

  override def nullSafeEval(v: Any): Any =
    NearestCentroidEval.eval(v.asInstanceOf[ArrayData], centroids)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroids", centroids, "float[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graft.expressions.NearestCentroidEval.eval($c, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/**
 * `nearest_centroids(embedding)` — the `nprobe` nearest centroid ids by
 * L2, ascending distance with ties to the lowest id (the multi-probe
 * batch form of [[NearestCentroid]]). A single codegen'd call whose
 * cost is nlist·dim per row regardless of nlist — the expression-tree
 * alternative (one struct per centroid + array_sort) is O(nlist)
 * OPERATORS and collapses codegen at serving-scale nlist (~sqrt(n)).
 */
case class NearestCentroids(child: Expression, centroids: Array[Array[Float]],
    nprobe: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def prettyName: String = "nearest_centroids"
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    NearestCentroidEval.evalTop(v.asInstanceOf[ArrayData], centroids, nprobe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroids", centroids, "float[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graft.expressions.NearestCentroidEval" +
        s".evalTop($c, $ref, $nprobe);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NearestCentroidEval {
  /** Top-`nprobe` centroid ids, ascending (distance, id) — bounded
    * insertion into nprobe-sized arrays, no full sort. */
  def evalTop(v: ArrayData, centroids: Array[Array[Float]], nprobe: Int): ArrayData = {
    val k = math.min(math.max(1, nprobe), centroids.length)
    val bestD = Array.fill(k)(Double.MaxValue)
    val bestI = Array.fill(k)(Int.MaxValue)
    var c = 0
    while (c < centroids.length) {
      val cen = centroids(c)
      var dist = 0.0
      val n = math.min(cen.length, v.numElements())
      var i = 0
      while (i < n) {
        val d = cen(i) - v.getFloat(i)
        dist += d * d
        i += 1
      }
      // insertion position: strictly better distance, or equal distance
      // with lower id (ids arrive ascending, so equal-dist later ids
      // never displace earlier ones)
      if (dist < bestD(k - 1)) {
        var p = k - 1
        while (p > 0 && dist < bestD(p - 1)) {
          bestD(p) = bestD(p - 1); bestI(p) = bestI(p - 1); p -= 1
        }
        bestD(p) = dist; bestI(p) = c
      }
      c += 1
    }
    new GenericArrayData(bestI)
  }

  def eval(v: ArrayData, centroids: Array[Array[Float]]): Int = {
    var best = 0
    var bestDist = Double.MaxValue
    var c = 0
    while (c < centroids.length) {
      val cen = centroids(c)
      var dist = 0.0
      val n = math.min(cen.length, v.numElements())
      var i = 0
      while (i < n) {
        val d = cen(i) - v.getFloat(i)
        dist += d * d
        i += 1
      }
      if (dist < bestDist) { bestDist = dist; best = c }
      c += 1
    }
    best
  }
}

/**
 * Dense matrix-vector product over a broadcast-literal float matrix:
 * `out = mat · v` (array<float> in, array<float> out). The rotation
 * step of OPQ encoding (Ge et al. 2014) — the matrix is KB-scale
 * driver state embedded as a codegen reference object, the per-row
 * cost is one tight d² loop inside whole-stage codegen (no UDF
 * serialization, no interpreted higher-order functions).
 */
case class MatVec(child: Expression, mat: Array[Array[Float]])
    extends UnaryExpression with ExpectsInputTypes {
  override def prettyName: String = "mat_vec"
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    MatVecEval.eval(v.asInstanceOf[ArrayData], mat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("mat", mat, "float[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graft.expressions.MatVecEval.eval($c, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MatVecEval {
  def eval(v: ArrayData, mat: Array[Array[Float]]): GenericArrayData = {
    val rows = mat.length
    val out = new Array[Any](rows)
    var r = 0
    while (r < rows) {
      val row = mat(r)
      var s = 0.0
      val n = math.min(row.length, v.numElements())
      var i = 0
      while (i < n) { s += row(i) * v.getFloat(i); i += 1 }
      out(r) = s.toFloat
      r += 1
    }
    new GenericArrayData(out)
  }
}

/**
 * 2-D Hilbert curve index of two rank-space positions (each in
 * [0, 2^bits)) — the space-filling curve with strictly better locality
 * than the Z-curve: consecutive Hilbert indexes are always adjacent
 * cells (Z jumps across the space at quadrant boundaries), so files cut
 * from a Hilbert-sorted layout cover tighter hyper-rectangles and
 * single-column band predicates touch fewer files (Moon et al. 2001,
 * "Analysis of the Clustering Properties of the Hilbert Space-Filling
 * Curve"). The per-row transform is the classic iterative
 * rotate-and-accumulate over bit planes; codegen emits one static call
 * — no UDF, stays inside whole-stage codegen like the rest of the
 * expression family.
 */
case class HilbertIndex2D(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression with ExpectsInputTypes {
  override def prettyName: String = "hilbert2d"
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, LongType)
  override def dataType: DataType = LongType

  override def nullSafeEval(x: Any, y: Any): Any =
    HilbertEval.xy2d(bits, x.asInstanceOf[Long], y.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = org.apache.spark.sql.graft.expressions.HilbertEval.xy2d($bits, $x, $y);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object HilbertEval {

  /** d-dimensional axes -> Hilbert index: Skilling's in-place
    * inverse-undo + Gray-decode on a copy of the coords (the
    * "transpose" form), then bit-interleave the transposed planes,
    * X[0]'s top bit first. */
  def ndIndex(coordsIn: Array[Long], bits: Int): Long = {
    val n = coordsIn.length
    val x = java.util.Arrays.copyOf(coordsIn, n)
    val m = 1L << (bits - 1)
    // Inverse undo (AxestoTranspose)
    var q = m
    while (q > 1) {
      val p = q - 1
      var i = 0
      while (i < n) {
        if ((x(i) & q) != 0) x(0) ^= p
        else { val t = (x(0) ^ x(i)) & p; x(0) ^= t; x(i) ^= t }
        i += 1
      }
      q >>= 1
    }
    // Gray encode
    var i = 1
    while (i < n) { x(i) ^= x(i - 1); i += 1 }
    var t = 0L
    q = m
    while (q > 1) { if ((x(n - 1) & q) != 0) t ^= q - 1; q >>= 1 }
    i = 0
    while (i < n) { x(i) ^= t; i += 1 }
    // Transpose to a single index: bit b of the index stream is bit
    // plane (bits-1-b/n) of dimension (b mod n)
    var d = 0L
    var plane = bits - 1
    while (plane >= 0) {
      i = 0
      while (i < n) {
        d = (d << 1) | ((x(i) >> plane) & 1L)
        i += 1
      }
      plane -= 1
    }
    d
  }

  /** (x, y) -> distance along the order-`bits` Hilbert curve: per bit
    * plane (high to low), accumulate the quadrant's curve length and
    * rotate/reflect the frame (the standard xy2d iteration). */
  def xy2d(bits: Int, xIn: Long, yIn: Long): Long = {
    var x = xIn
    var y = yIn
    var d = 0L
    var s: Long = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }
}

/**
 * N-dimensional Hilbert curve index (Skilling 2004, "Programming the
 * Hilbert curve" — the transpose-form algorithm): input is an
 * `array<bigint>` of d rank-space positions, each in [0, 2^bits);
 * output is the distance along the d-dimensional order-`bits` curve.
 * Generalizes [[HilbertIndex2D]] to the k-column clustering case
 * (d * bits <= 62 so the index fits a long). Same codegen shape: one
 * static call per row.
 */
case class HilbertIndexND(child: Expression, bits: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def prettyName: String = "hilbert_nd"
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any =
    HilbertEval.ndIndex(v.asInstanceOf[ArrayData].toLongArray(), bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graft.expressions.HilbertEval.ndIndex($c.toLongArray(), $bits);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/**
 * Count of elements of a SORTED double array strictly below `value` —
 * the bucket index for range-partitioned rank selection
 * (operators/Quantiles.scala). Semantically identical to
 * `size(filter(bounds, x -> value > x))`, but the higher-order
 * function evaluates an interpreted lambda per element (measured
 * ~1 s/million rows at 31 bounds on local[32]); this is a codegen'd
 * binary search — one static call per row.
 */
case class SortedLowerBound(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def prettyName: String = "sorted_lower_bound"
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), DoubleType)
  override def dataType: DataType = IntegerType

  override def nullSafeEval(bounds: Any, v: Any): Any =
    SortedLowerBoundEval.count(bounds.asInstanceOf[ArrayData], v.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, v) =>
      s"${ev.value} = org.apache.spark.sql.graft.expressions.SortedLowerBoundEval.count($b, $v);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SortedLowerBoundEval {
  /** First index i with bounds(i) >= v (ascending array, no nulls):
    * == |{x in bounds : x < v}|, matching the filter-count form
    * including NaN (every comparison false => 0) and ties (equal
    * bound not counted). */
  def count(bounds: ArrayData, v: Double): Int = {
    var lo = 0
    var hi = bounds.numElements()
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (bounds.getDouble(mid) < v) lo = mid + 1 else hi = mid
    }
    lo
  }
}

/**
 * Order-preserving bucket id of a double: the top `bits` bits of the
 * IEEE-754 sortable-bits transform (negative values get all non-sign
 * bits complemented, so signed long comparison matches double
 * ordering — the classic trick Lucene's NumericUtils uses for range
 * indexing). v1 < v2 implies bucket(v1) <= bucket(v2) EXACTLY — no
 * floating-point log/divide whose rounding could misorder a boundary
 * value — which is what lets an exact rank-selection plan
 * (operators/Quantiles.scala multi-column form) build its histogram
 * in ONE data-independent pass with no prior bounds sweep. Equal
 * doubles always share a bucket; NaN lands in the top bucket,
 * consistent with Spark's NaN-greatest sort order. Bucket width is
 * 2^(bits-12) ulps of the exponent, i.e. with bits=20 each octave
 * (power-of-two range) splits into 256 equal sub-ranges.
 */
case class OrderedDoubleBucket(child: Expression, bits: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def prettyName: String = "ordered_double_bucket"
  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType)
  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any =
    OrderedDoubleBucketEval.bucket(v.asInstanceOf[Double], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graft.expressions.OrderedDoubleBucketEval.bucket($c, $bits);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object OrderedDoubleBucketEval {
  def bucket(v: Double, bits: Int): Long = {
    val raw = java.lang.Double.doubleToLongBits(v)
    val sortable = raw ^ ((raw >> 63) & 0x7fffffffffffffffL)
    sortable >> (64 - bits)
  }
}

/**
 * Sign-bit binary quantization: bit i of the packed signature is 1 iff
 * `v[i] >= 0` — one bit per dimension, bit-packed into ceil(dim/64)
 * longs. The at-scale prefilter this feeds ([[HammingDist]] top-C →
 * exact rerank) scans 8 bytes/row/64-dims instead of 256 bytes of
 * float32: a 32× reduction of the candidate-scan's I/O and cache
 * footprint, the classic binary-quantization trade (cf. sign random
 * projections, Charikar STOC'02 — here the "planes" are the coordinate
 * axes, so the signature is replayable in plain SQL from the stored
 * floats with NO arithmetic: a float's sign is exact on every engine).
 */
object BinarySig {
  def pack(v: ArrayData): ArrayData = {
    val n = v.numElements()
    val words = new Array[Long]((n + 63) >>> 6)
    var i = 0
    while (i < n) {
      if (v.getFloat(i) >= 0f) words(i >>> 6) |= (1L << (i & 63))
      i += 1
    }
    new GenericArrayData(words)
  }

  /** Popcount-of-xor Hamming distance over packed words; a length
    * mismatch counts the excess words' set bits (xor with implicit 0),
    * so truncated signatures degrade monotonically instead of lying. */
  def hamming(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    val n = math.min(na, nb)
    var h = 0
    var i = 0
    while (i < n) { h += java.lang.Long.bitCount(a.getLong(i) ^ b.getLong(i)); i += 1 }
    while (i < na) { h += java.lang.Long.bitCount(a.getLong(i)); i += 1 }
    while (i < nb) { h += java.lang.Long.bitCount(b.getLong(i)); i += 1 }
    h
  }
}

/** `sign_bits(embedding)` — packed sign-bit signature (see [[BinarySig]]). */
case class SignBits(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def prettyName: String = "sign_bits"
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    BinarySig.pack(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graft.expressions.BinarySig.pack($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `hamming_dist(sig_a, sig_b)` — popcount-of-xor over packed sign
  * signatures. Codegen'd (stays inside whole-stage codegen on the
  * n-row prefilter scan — xor + Long.bitCount per word, no
  * interpreted higher-order functions on the hot path). */
case class HammingDist(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def prettyName: String = "hamming_dist"
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = IntegerType

  override def nullSafeEval(a: Any, b: Any): Any =
    BinarySig.hamming(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = org.apache.spark.sql.graft.expressions.BinarySig.hamming($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
