package org.apache.spark.sql.graft.expressions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * `word_shingles(text, n)` — distinct word n-grams (space-joined) of the
 * trimmed lowercased whitespace tokenization, in first-occurrence order.
 *
 * Exists for performance: the Column-composed formulation
 * (`transform(sequence(...), i => concat_ws(" ", slice(tokens, ...)))`)
 * re-evaluates the FULL tokenization for every lambda index — higher-
 * order functions are interpreted and do not cache their target array,
 * so an m-token document tokenizes O(m) times. This expression
 * tokenizes once per row. Semantics identical to
 * graft.operators.TextAnalysis tokens+shingles (the q34 DuckDB oracle
 * validates both).
 */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(n >= 1, "shingle size must be >= 1")
  override def prettyName: String = "word_shingles"
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    WordShinglesEval.eval(v.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graft.expressions.WordShinglesEval.eval($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `word_tokens(text)` — the raw whitespace tokenization (duplicates
  * kept, lowercased/trimmed): the single-pass form of
  * TextAnalysis.tokens for multiset consumers like SimHash. */
case class WordTokens(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def prettyName: String = "word_tokens"
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val tokens = v.asInstanceOf[UTF8String].toString
      .trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
    new GenericArrayData(tokens.map(t => UTF8String.fromString(t): Any))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graft.expressions.WordShinglesEval.tokens($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordShinglesEval {

  def tokens(text: UTF8String): GenericArrayData = {
    val ts = text.toString.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
    new GenericArrayData(ts.map(t => UTF8String.fromString(t): Any))
  }
  def eval(text: UTF8String, n: Int): GenericArrayData = {
    val tokens = text.toString.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
    if (tokens.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]()
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i <= tokens.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(tokens(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }
}
