package org.apache.spark.sql.graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._

/**
 * `bounded_topk(item, k)` — the k SMALLEST DISTINCT values of `item`
 * (any orderable type; for "top-k by score" callers pass a
 * `struct(-score, id)` so ascending order is score-descending with an
 * id tiebreak), returned as an ascending array.
 *
 * Semantically `slice(array_sort(array_distinct(collect_list(item))),
 * 1, k)` — but with a SIZE-CAPPED accumulation buffer: every partial,
 * merge, and final buffer holds at most k values. `collect_list`'s
 * partial buffers accumulate ALL candidates per (group, partition)
 * before the sort+slice, which is exactly the memory-pressure point
 * under a skewed candidate stream (a hot LSH bucket fanning one
 * query_id out to millions of candidate rows lands one unbounded
 * buffer on one task). Here the same stream folds into k-bounded
 * insertion (the aggregate sibling of [[NearestCentroidEval.evalTop]]),
 * so per-buffer memory is k·sizeof(item) REGARDLESS of candidate-mass
 * skew, and partial aggregation (map-side combine) still applies —
 * the exchange moves at most k values per (group, partition).
 *
 * Distinctness matches `array_distinct`'s role in the previous shape:
 * callers may feed the same item twice (the LSH bucket join emits one
 * row per shared table); duplicates are suppressed at insert, which is
 * a no-op for duplicate-free callers. Merge order never changes the
 * result (the k smallest distinct values of a multiset are
 * commutative/associative), so the aggregate is deterministic under
 * any partitioning. Null items are ignored (collect_list semantics).
 */
case class BoundedTopK(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[BoundedTopKBuffer] with UnaryLike[Expression] {

  require(k >= 1, s"bounded_topk: k must be >= 1, got $k")

  override def prettyName: String = "bounded_topk"
  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = false

  @transient private lazy val ordering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(child.dataType)

  override def createAggregationBuffer(): BoundedTopKBuffer =
    new BoundedTopKBuffer(k, ordering)

  override def update(buf: BoundedTopKBuffer, input: InternalRow): BoundedTopKBuffer = {
    val v = child.eval(input)
    // copy: the evaluated value may alias the (reused) input row's buffer
    if (v != null) buf.insert(InternalRow.copyValue(v))
    buf
  }

  override def merge(a: BoundedTopKBuffer, b: BoundedTopKBuffer): BoundedTopKBuffer = {
    b.foreach(a.insert) // b's values are already owned copies
    a
  }

  override def eval(buf: BoundedTopKBuffer): Any = new GenericArrayData(buf.toArray)

  // serialize the buffer as one UnsafeRow holding an array of items —
  // the same shape Spark's Collect aggregates use
  @transient private lazy val projection =
    UnsafeProjection.create(Array[DataType](dataType))

  override def serialize(buf: BoundedTopKBuffer): Array[Byte] =
    projection.apply(InternalRow(new GenericArrayData(buf.toArray))).getBytes

  override def deserialize(bytes: Array[Byte]): BoundedTopKBuffer = {
    val buf = createAggregationBuffer()
    val row = new UnsafeRow(1)
    row.pointTo(bytes, bytes.length)
    val arr = row.getArray(0)
    var i = 0
    while (i < arr.numElements()) {
      // values extracted from the transient row must be copied too
      buf.insert(InternalRow.copyValue(arr.get(i, child.dataType)))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BoundedTopK =
    copy(child = newChild)
}

/** Sorted, de-duplicated, k-bounded insertion buffer: O(log k) search +
  * O(k) shift per insert — k is small (top-k results, ≤ ~100). */
final class BoundedTopKBuffer(k: Int, ordering: Ordering[Any]) {
  private val items = new Array[Any](k)
  private var size = 0

  def insert(v: Any): Unit = {
    // binary search for the insertion point (first index with item >= v)
    var lo = 0
    var hi = size
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (ordering.compare(items(mid), v) < 0) lo = mid + 1 else hi = mid
    }
    // duplicate (compare == 0) => set semantics, skip
    if (lo < size && ordering.compare(items(lo), v) == 0) return
    if (lo >= k) return // beyond the k-th smallest, never part of the result
    val shiftEnd = math.min(size, k - 1)
    var i = shiftEnd
    while (i > lo) { items(i) = items(i - 1); i -= 1 }
    items(lo) = v
    if (size < k) size += 1
  }

  def foreach(f: Any => Unit): Unit = {
    var i = 0
    while (i < size) { f(items(i)); i += 1 }
  }

  def toArray: Array[Any] = java.util.Arrays.copyOfRange(
    items.asInstanceOf[Array[AnyRef]], 0, size).asInstanceOf[Array[Any]]
}
