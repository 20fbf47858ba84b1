package org.apache.spark.sql.graft.expressions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * `text_metrics(text)` — all text-quality metrics in ONE tokenization
 * pass: struct(n_tokens, avg_token_len, stopword_ratio, punct_ratio,
 * quality_score, lang_pred).
 *
 * Exists because the Column-composed versions in
 * graft.operators.TextAnalysis each re-tokenize: higher-order array
 * functions are interpreted (no whole-stage codegen), so Spark's
 * subexpression elimination never merges the repeated `split`s, and a
 * 6-metric projection tokenizes 6x. This expression is the fused fast
 * path; semantics are kept in lockstep with TextAnalysis (the DuckDB
 * oracle of q30/q31 validates both formulations against the same SQL).
 *
 * stopword lists / weights / punctuation class are shared constants —
 * see TextMetricsEval.
 */
case class TextMetrics(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def prettyName: String = "text_metrics"
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = TextMetricsEval.schema

  override def nullSafeEval(v: Any): Any =
    TextMetricsEval.eval(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graft.expressions.TextMetricsEval.eval($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextMetricsEval {
  val schema: StructType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("avg_token_len", DoubleType, nullable = false),
    StructField("stopword_ratio", DoubleType, nullable = false),
    StructField("punct_ratio", DoubleType, nullable = false),
    StructField("quality_score", DoubleType, nullable = false),
    StructField("lang_pred", StringType, nullable = false)))

  /** Must mirror graft.operators.TextAnalysis.stopwords (sorted by lang). */
  val stopwords: Seq[(String, Set[String])] = Seq(
    "de" -> Set("der", "die", "und", "das", "von", "zu", "mit", "den", "ist", "im"),
    "en" -> Set("the", "and", "of", "to", "a", "in", "is", "it", "for", "on"),
    "es" -> Set("el", "la", "de", "que", "y", "en", "un", "es", "se", "no"),
    "fr" -> Set("le", "la", "de", "et", "les", "des", "en", "un", "du", "une"),
    "zh" -> Set("de", "le", "shi", "bu", "wo", "you", "zai", "ta", "men", "zhe"))

  private val allStopwords: Set[String] = stopwords.flatMap(_._2).toSet

  private val punctChars: Set[Char] = Set('.', ',', ';', ':', '!', '?', '\'', '"', '-', '(', ')')

  def eval(text: UTF8String): InternalRow = {
    val s = text.toString
    val lowerTrim = s.trim.toLowerCase
    val rawTokens = if (lowerTrim.isEmpty) Array.empty[String]
      else lowerTrim.split("\\s+").filter(_.nonEmpty)
    val n = rawTokens.length

    var lenSum = 0L
    var stopCount = 0
    val distinct = new scala.collection.mutable.HashSet[String]
    var i = 0
    while (i < n) {
      val t = rawTokens(i)
      lenSum += t.length
      if (allStopwords.contains(t)) stopCount += 1
      distinct.add(t)
      i += 1
    }
    val avgLen = if (n == 0) 0.0 else lenSum.toDouble / n
    val stopRatio = if (n == 0) 0.0 else stopCount.toDouble / n

    // punct ratio over the ORIGINAL text (matches TextAnalysis.punctRatio)
    var punct = 0
    var j = 0
    while (j < s.length) { if (punctChars.contains(s.charAt(j))) punct += 1; j += 1 }
    val punctRatio = if (s.isEmpty) 0.0 else punct.toDouble / s.length

    val lengthOk = if (n >= 5 && n <= 5000) 1.0 else 0.0
    val swOk = if (stopRatio >= 0.01 && stopRatio <= 0.7) 1.0 else 0.0
    val punctOk = if (punctRatio < 0.2) 1.0 else 0.0
    val avgOk = if (avgLen >= 2.0 && avgLen <= 12.0) 1.0 else 0.0
    val quality = lengthOk * 0.3 + swOk * 0.3 + punctOk * 0.2 + avgOk * 0.2

    // argmax score; tie -> alphabetically first lang (list is sorted);
    // all-zero -> "und" (TextAnalysis.langId semantics)
    var bestLang = "und"
    var bestScore = 0
    val it = stopwords.iterator
    while (it.hasNext) {
      val (lang, words) = it.next()
      var score = 0
      val dit = distinct.iterator
      while (dit.hasNext) { if (words.contains(dit.next())) score += 1 }
      if (score > bestScore) { bestScore = score; bestLang = lang }
    }

    InternalRow(n, avgLen, stopRatio, punctRatio, quality, UTF8String.fromString(bestLang))
  }
}
