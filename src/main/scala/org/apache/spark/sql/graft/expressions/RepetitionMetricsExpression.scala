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
  val schema: StructType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("frac_dup_tokens", DoubleType, nullable = false),
    StructField("frac_top_2gram", DoubleType, nullable = false),
    StructField("frac_top_3gram", DoubleType, nullable = false),
    StructField("frac_top_4gram", DoubleType, nullable = false),
    StructField("frac_dup_5gram", DoubleType, nullable = false),
    StructField("frac_dup_8gram", DoubleType, nullable = false)))

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
    val fracDupTokens = if (n == 0) 0.0
      else 1.0 - tokens.toSet.size.toDouble / n
    def topFrac(g: Int): Double = {
      val (maxRun, _, total) = runStats(tokens, g)
      if (total <= 0) 0.0 else maxRun.toDouble * g / n
    }
    def dupFrac(g: Int): Double = {
      val (_, dup, total) = runStats(tokens, g)
      if (total <= 0) 0.0 else dup.toDouble / total
    }
    InternalRow(n, fracDupTokens, topFrac(2), topFrac(3), topFrac(4),
      dupFrac(5), dupFrac(8))
  }
}
