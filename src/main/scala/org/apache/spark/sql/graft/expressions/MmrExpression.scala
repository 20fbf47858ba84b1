package org.apache.spark.sql.graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/**
 * `mmr_chain(pool, k, lambda)` — the full per-query MMR greedy chain
 * as ONE local computation (round 17). Input: the query's candidate
 * pool as `array<struct<neighbor_id:bigint, score:double,
 * emb:array<float|double>>>` (bounded — poolSize rows per query by
 * construction). Output: `array<struct<rank:int, neighbor_id:bigint,
 * rel:double, mmr:double>>`, ranks 1..min(k, |distinct ids|).
 *
 * Bit-identical to the former k-step DataFrame loop (window argmax +
 * localCheckpoint per step), which cost k-1 driver-synchronized jobs
 * per call:
 *  - step 1 picks max by (score desc, neighbor_id asc); mmr = λ·score;
 *  - step s scores each remaining row λ·score − (1−λ)·maxsim where
 *    maxsim = max(−1.0, max over selected of cosine(cand, sel)) — a
 *    max-fold, order-independent, so the incremental update
 *    maxsim' = max(maxsim, cosine(cand, newest)) is exactly the
 *    DataFrame form's full re-fold;
 *  - cosine is the CosineSimilarity eval loop verbatim (same op
 *    order, zero-vector ⇒ 0.0);
 *  - comparisons use java.lang.Double.compare — Spark's own double
 *    ordering, including ±0.0 — with the ascending neighbor_id
 *    tiebreak;
 *  - a selected id removes ALL its pool rows (the left_anti of the
 *    loop form).
 * One eval per QUERY GROUP doing the whole greedy in compiled Scala —
 * interpreted-eval fallback is fine here (not a per-row hot path).
 */
case class MmrChain(child: Expression, k: Int, lambda: Double)
    extends UnaryExpression with CodegenFallback {
  require(k >= 1, s"need k >= 1, got $k")
  override def prettyName: String = "mmr_chain"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    child.dataType match {
      case ArrayType(StructType(Array(f0, f1, f2)), _)
        if f0.dataType == LongType && f1.dataType == DoubleType &&
          (f2.dataType == ArrayType(FloatType, false) ||
           f2.dataType == ArrayType(FloatType, true) ||
           f2.dataType == ArrayType(DoubleType, false) ||
           f2.dataType == ArrayType(DoubleType, true)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"mmr_chain needs array<struct<bigint, double, array<float|double>>>, got $other")
    }
  }

  private lazy val embIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType
      .asInstanceOf[StructType](2).dataType
      .asInstanceOf[ArrayType].elementType == FloatType

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("rank", IntegerType, nullable = false),
    StructField("neighbor_id", LongType, nullable = false),
    StructField("rel", DoubleType, nullable = false),
    StructField("mmr", DoubleType, nullable = false))), containsNull = false)

  /** CosineSimilarity.nullSafeEval's exact loop (op order is the
    * replay contract: dot/na/nb accumulate in index order, zero norm
    * ⇒ 0.0). */
  private def cos(a: Array[Double], b: Array[Double]): Double = {
    val n = a.length
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val x = a(i); val y = b(i)
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val ids = new Array[Long](n)
    val scores = new Array[Double](n)
    val embs = new Array[Array[Double]](n)
    var i = 0
    while (i < n) {
      val row = arr.getStruct(i, 3)
      ids(i) = row.getLong(0)
      scores(i) = row.getDouble(1)
      // null embedding stays null: the DataFrame form's cosine(null,·)
      // is null, which greatest() skips — mirrored below by skipping
      // null sides in the maxsim update
      if (row.isNullAt(2)) embs(i) = null
      else {
        val e = row.getArray(2)
        val m = e.numElements()
        val d = new Array[Double](m)
        var j = 0
        while (j < m) {
          d(j) = if (embIsFloat) e.getFloat(j).toDouble else e.getDouble(j)
          j += 1
        }
        embs(i) = d
      }
      i += 1
    }
    val alive = Array.fill(n)(true)
    // running λ·score − (1−λ)·maxsim state per row; maxsim starts at
    // the fold's −1.0 seed
    val maxsim = Array.fill(n)(-1.0)
    val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    val oneMinus = 1.0 - lambda
    var rank = 0
    while (rank < k) {
      var best = -1
      var bestKey = 0.0
      i = 0
      while (i < n) {
        if (alive(i)) {
          val key = if (rank == 0) scores(i)
            else lambda * scores(i) - oneMinus * maxsim(i)
          val c = if (best < 0) 1 else {
            val d = java.lang.Double.compare(key, bestKey)
            if (d != 0) d else java.lang.Long.compare(ids(best), ids(i))
          }
          if (c > 0) { best = i; bestKey = key }
        }
        i += 1
      }
      if (best < 0) return new GenericArrayData(out.toArray[Any])
      rank += 1
      val mmrVal = if (rank == 1) lambda * scores(best) else bestKey
      out += InternalRow(rank, ids(best), scores(best), mmrVal)
      val winId = ids(best)
      val winEmb = embs(best)
      i = 0
      while (i < n) {
        if (alive(i)) {
          if (ids(i) == winId) alive(i) = false
          else if (winEmb != null && embs(i) != null) {
            val c = cos(embs(i), winEmb)
            if (c > maxsim(i)) maxsim(i) = c
          }
        }
        i += 1
      }
    }
    new GenericArrayData(out.toArray[Any])
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
