package org.apache.spark.sql.graft.expressions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * `misra_gries(terms, m)` — the Misra-Gries heavy-hitters summary
 * (Misra & Gries '82; merge rule per Agarwal et al. PODS'12) over an
 * array-of-strings column, as one TypedImperativeAggregate:
 *
 *  - buffer: at most `m` (term -> count) counters, O(m) memory per
 *    task regardless of corpus size;
 *  - update: increment a tracked term; insert while room; otherwise
 *    decrement ALL counters by 1 and drop zeros (each decrement pays
 *    back a prior increment, so total work stays O(tokens + evictions·m)
 *    with the classic amortized bound);
 *  - merge: add counts keyed by term, and if more than `m` survive,
 *    subtract the (m+1)-th largest count from all and drop non-positive
 *    — the summary-mergeability rule that keeps the guarantee additive
 *    across partitions (map-side combine applies as usual).
 *
 * Guarantee (what downstream code relies on): after any sequence of
 * updates and merges over N total tokens, every term with true
 * frequency > N/m is present in the summary. That makes this the
 * CANDIDATE-GENERATION half of exact top-k term extraction at 100 TB:
 * the full `groupBy(term)` shuffles a key per distinct term per
 * partition, while this aggregate's exchange moves one m-entry summary
 * per partition, and a second pass recounts only the ≤ m candidates
 * exactly (see TextAnalysis.heavyHitterTerms, which also derives the
 * per-result "provably complete" verdict cnt_k·m > N from the bound).
 *
 * eval returns the candidate terms sorted lexicographically — a
 * CANONICAL form independent of hash-map iteration order, so the same
 * summary always prints the same. (Counts are deliberately not
 * returned: MG counts are underestimates whose exact values depend on
 * partitioning; callers recount exactly.)
 *
 * Null handling: a null array contributes nothing; null elements are
 * skipped.
 */
case class MisraGries(
    child: Expression,
    m: Int,
    withCounts: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
    with UnaryLike[Expression] {

  require(m >= 1, s"misra_gries: m must be >= 1, got $m")

  override def prettyName: String = "misra_gries"
  // withCounts=true returns the summary WITH its (under-)counts — the
  // mergeable form a streaming fold carries across micro-batches
  // (term-sorted for canonical output); counts are MG lower bounds, so
  // exact-recount callers use the plain term-array form
  override def dataType: DataType =
    if (withCounts) ArrayType(StructType(Seq(
      StructField("term", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false))), containsNull = false)
    else ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty[String, Long]

  override def update(buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        MisraGriesAlgo.add(buf, arr.getUTF8String(i).toString, m)
      }
      i += 1
    }
    buf
  }

  override def merge(a: mutable.HashMap[String, Long],
      b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] =
    MisraGriesAlgo.merge(a, b, m)

  override def eval(buf: mutable.HashMap[String, Long]): Any =
    if (withCounts) {
      val entries = buf.toArray.sortBy(_._1)
      new GenericArrayData(entries.map { case (t, c) =>
        InternalRow(UTF8String.fromString(t), c)
      })
    } else new GenericArrayData(
      buf.keysIterator.toArray.sorted.map(UTF8String.fromString(_)))

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    // canonical (term-sorted) byte form
    val entries = buf.toArray.sortBy(_._1)
    val bytes = entries.map { case (k, _) => k.getBytes("UTF-8") }
    val size = 4 + bytes.map(_.length + 4 + 8).sum
    val bb = java.nio.ByteBuffer.allocate(size)
    bb.putInt(entries.length)
    entries.indices.foreach { i =>
      bb.putInt(bytes(i).length)
      bb.put(bytes(i))
      bb.putLong(entries(i)._2)
    }
    bb.array()
  }

  override def deserialize(b: Array[Byte]): mutable.HashMap[String, Long] = {
    val bb = java.nio.ByteBuffer.wrap(b)
    val n = bb.getInt
    val out = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val kb = new Array[Byte](len)
      bb.get(kb)
      out.update(new String(kb, "UTF-8"), bb.getLong)
      i += 1
    }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGries =
    copy(child = newChild)
}

/**
 * The Misra-Gries update/merge shared by the aggregate above and by
 * driver-side streaming folds (CorpusStream.DurableVocabularySink merges
 * one per-batch summary per trigger — the same mergeability that powers
 * map-side combine powers fold-across-micro-batches, so the guarantee
 * "freq > N/m ⇒ tracked" holds over the whole stream).
 */
object MisraGriesAlgo {
  /** One occurrence of `t` into `buf` (capacity m). */
  def add(buf: mutable.HashMap[String, Long], t: String, m: Int): Unit =
    buf.get(t) match {
      case Some(c) => buf.update(t, c + 1L)
      case None =>
        if (buf.size < m) buf.update(t, 1L)
        else {
          // decrement-all: drains one unit from every tracked term
          // instead of tracking the new one
          val dead = mutable.ArrayBuffer.empty[String]
          buf.mapValuesInPlace((_, c) => c - 1L)
          buf.foreach { case (k, c) => if (c <= 0L) dead += k }
          dead.foreach(buf.remove)
        }
    }

  /** Merge summary `b` into `a` (both capacity m), Agarwal et al. rule. */
  def merge(a: mutable.HashMap[String, Long], b: mutable.HashMap[String, Long],
      m: Int): mutable.HashMap[String, Long] = {
    b.foreach { case (k, c) => a.update(k, a.getOrElse(k, 0L) + c) }
    if (a.size > m) {
      // subtract the (m+1)-th largest count from everything and drop
      // non-positives: exactly m (or fewer, on ties) survive, and the
      // per-term undercount stays bounded by N/m overall
      val cut = a.valuesIterator.toArray.sortBy(-_).apply(m)
      val dead = mutable.ArrayBuffer.empty[String]
      a.mapValuesInPlace((_, c) => c - cut)
      a.foreach { case (k, c) => if (c <= 0L) dead += k }
      dead.foreach(a.remove)
    }
    a
  }
}
