package org.apache.spark.sql.graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * `repetition_metrics(text)` — the Gopher repetition-quality battery
 * (Rae et al. '21 §A1.1, the "repetitious documents" rules) in ONE
 * tokenization pass, as a narrow codegen'd map with NO shuffle — the
 * per-document repetition signals are computed WITHIN the row, so the
 * filter costs a corpus scan and nothing else at any scale (the naive
 * formulation — explode n-grams, groupBy (doc, gram) — shuffles every
 * n-gram occurrence in the corpus):
 *
 *   struct(n_tokens,
 *          frac_dup_tokens,   1 - distinct/total tokens
 *          frac_top_2gram,    count(most frequent 2-gram)·2 / n_tokens
 *          frac_top_3gram,    ·3 / n_tokens
 *          frac_top_4gram,    ·4 / n_tokens
 *          frac_dup_5gram,    5-gram occurrences whose gram repeats / all
 *          frac_dup_8gram)    8-gram occurrences whose gram repeats / all
 *
 * Token-based where the paper counts characters (the fixture is
 * word-soup; the signal is the same shape). Every fraction is an
 * integer ratio evaluated as one IEEE division — bit-identical in any
 * engine — so a DuckDB oracle replays the whole battery exactly.
 * Top-gram fractions need only the max COUNT (run-length over the
 * sorted gram array), never the gram itself, so there is no tiebreak
 * to pin. Empty/short texts yield 0 fractions (no grams of that size).
 */
case class RepetitionMetrics(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def prettyName: String = "repetition_metrics"
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = RepetitionMetricsEval.schema

  override def nullSafeEval(v: Any): Any =
    RepetitionMetricsEval.eval(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graft.expressions.RepetitionMetricsEval.eval($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RepetitionMetricsEval {
  /** The double fractions serve users directly; the appended INTEGER
    * fields are the exact sufficient statistics behind them
    * (numerators/denominators), so an oracle-hashed projection can
    * avoid floating-point columns entirely — integer counts and
    * threshold booleans replay bit-identically on any engine, while a
    * rounded double sits one ulp of libm/rounding-algorithm variance
    * away from flipping a hash (the round-14 q125 lesson). */
  val schema: StructType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("frac_dup_tokens", DoubleType, nullable = false),
    StructField("frac_top_2gram", DoubleType, nullable = false),
    StructField("frac_top_3gram", DoubleType, nullable = false),
    StructField("frac_top_4gram", DoubleType, nullable = false),
    StructField("frac_dup_5gram", DoubleType, nullable = false),
    StructField("frac_dup_8gram", DoubleType, nullable = false),
    StructField("distinct_tokens", IntegerType, nullable = false),
    StructField("top2_cnt", IntegerType, nullable = false),
    StructField("top3_cnt", IntegerType, nullable = false),
    StructField("top4_cnt", IntegerType, nullable = false),
    StructField("dup5_num", IntegerType, nullable = false),
    StructField("dup5_den", IntegerType, nullable = false),
    StructField("dup8_num", IntegerType, nullable = false),
    StructField("dup8_den", IntegerType, nullable = false)))

  /** (max run length, occurrences inside runs of length >= 2, total)
    * over the SORTED n-gram array of `tokens`. */
  private def runStats(tokens: Array[String], n: Int): (Int, Int, Int) = {
    val total = tokens.length - n + 1
    if (total <= 0) return (0, 0, 0)
    val grams = new Array[String](total)
    var i = 0
    while (i < total) {
      val sb = new java.lang.StringBuilder(tokens(i))
      var j = 1
      while (j < n) { sb.append(' ').append(tokens(i + j)); j += 1 }
      grams(i) = sb.toString
      i += 1
    }
    java.util.Arrays.sort(grams.asInstanceOf[Array[AnyRef]])
    var maxRun = 1
    var dup = 0
    var run = 1
    i = 1
    while (i <= total) {
      if (i < total && grams(i) == grams(i - 1)) run += 1
      else {
        if (run > maxRun) maxRun = run
        if (run >= 2) dup += run
        run = 1
      }
      i += 1
    }
    (maxRun, dup, total)
  }

  def eval(text: UTF8String): InternalRow = {
    val lowerTrim = text.toString.trim.toLowerCase
    val tokens = if (lowerTrim.isEmpty) Array.empty[String]
      else lowerTrim.split("\\s+").filter(_.nonEmpty)
    val n = tokens.length
    val distinct = tokens.toSet.size
    val fracDupTokens = if (n == 0) 0.0 else 1.0 - distinct.toDouble / n
    // one runStats call per gram size, shared by the fraction and the
    // integer fields (a gram size with no grams contributes 0s)
    val s2 = runStats(tokens, 2); val s3 = runStats(tokens, 3)
    val s4 = runStats(tokens, 4); val s5 = runStats(tokens, 5)
    val s8 = runStats(tokens, 8)
    def topCnt(s: (Int, Int, Int)): Int = if (s._3 <= 0) 0 else s._1
    def topFrac(s: (Int, Int, Int), g: Int): Double =
      if (s._3 <= 0) 0.0 else s._1.toDouble * g / n
    def dupFrac(s: (Int, Int, Int)): Double =
      if (s._3 <= 0) 0.0 else s._2.toDouble / s._3
    InternalRow(n, fracDupTokens, topFrac(s2, 2), topFrac(s3, 3),
      topFrac(s4, 4), dupFrac(s5), dupFrac(s8),
      distinct, topCnt(s2), topCnt(s3), topCnt(s4),
      s5._2, s5._3, s8._2, s8._3)
  }
}
