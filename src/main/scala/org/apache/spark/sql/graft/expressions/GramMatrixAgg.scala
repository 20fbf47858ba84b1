package org.apache.spark.sql.graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/**
 * `gram_matrix(x, y, dim)` — the sufficient statistics of a linear
 * probe over integer feature vectors, in ONE pass and ONE buffer:
 *
 *   [ n, Σy, Σx_0..Σx_{dim-1}, Σ(x_0·y)..Σ(x_{dim-1}·y),
 *     upper-triangular ΣX·Xᵀ row-major: g_{00}, g_{01}, .., g_{dim-1,dim-1} ]
 *
 * as one `array<long>`. Everything is an exact integer sum —
 * order-independent under any partitioning, nothing to round.
 *
 * Why an imperative aggregate and not dim(dim+3)/2+2 `sum(...)`
 * columns: past `spark.sql.codegen.maxFields` the wide-agg form falls
 * out of whole-stage codegen into per-expression interpreted
 * evaluation — measured ~10 s for dim=64 (2146 expressions) on a
 * 5000-doc corpus, ~1 µs per boxed eval. Here the update is a
 * primitive long-array loop: dim(dim+1)/2 multiply-adds per row with
 * zero boxing, and partial aggregation (map-side combine) still
 * applies — the exchange moves one fixed-size array per partition.
 */
case class GramMatrix(
    x: Expression,
    y: Expression,
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with BinaryLike[Expression] {

  require(dim >= 1, s"gram_matrix: dim must be >= 1, got $dim")

  override def left: Expression = x
  override def right: Expression = y
  override def prettyName: String = "gram_matrix"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  private val gramLen = dim * (dim + 1) / 2
  private val bufLen = 2 + 2 * dim + gramLen

  override def createAggregationBuffer(): Array[Long] = new Array[Long](bufLen)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val xv = x.eval(input)
    val yv = y.eval(input)
    if (xv == null || yv == null) return buf
    val arr = xv.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    require(arr.numElements() == dim,
      s"gram_matrix: expected $dim features, got ${arr.numElements()}")
    val xs = new Array[Long](dim)
    var i = 0
    while (i < dim) { xs(i) = arr.getLong(i); i += 1 }
    val yl = yv.asInstanceOf[Long]
    buf(0) += 1L
    buf(1) += yl
    var d = 0
    var g = 2 + 2 * dim
    while (d < dim) {
      val xd = xs(d)
      buf(2 + d) += xd
      buf(2 + dim + d) += xd * yl
      var e = d
      while (e < dim) { buf(g) += xd * xs(e); e += 1; g += 1 }
      d += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < bufLen) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(bufLen * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bufLen)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GramMatrix =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramMatrix =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): GramMatrix =
    copy(x = newLeft, y = newRight)
}
