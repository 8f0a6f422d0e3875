package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native tokenize/shingle expressions for the text hot path.
  *
  * The composable forms — `filter(split(trim(text), "\\s+"), _ =!= "")` and
  * the transform/slice/concat_ws/array_distinct shingle chain — run through
  * Spark's higher-order-function machinery, which evaluates the lambda via
  * the expression INTERPRETER once per element (HOFs are CodegenFallback,
  * never codegen'd): measured ~7–8 µs per shingle row at sf0.1, the
  * dominant map-side cost of the Jaccard/MinHash/SimHash queries. These
  * expressions do the identical string work in one JIT-compiled eval per
  * row.
  *
  * String parity with the composable forms (pinned by TextExpressionsSpec):
  *  - split is the same java.util.regex `\s+` split Spark's `split` uses
  *    (limit -1), and empty tokens are filtered, so trim-width differences
  *    (Spark's trim removes only 0x20; String.trim removes ≤ 0x20) are
  *    immaterial — any leading/trailing whitespace run collapses to one
  *    filtered empty token either way;
  *  - null text → null array; empty/whitespace-only text → empty array;
  *  - shingles: i-th shingle = tokens[i..i+n) joined by single spaces,
  *    deduped preserving FIRST occurrence (array_distinct order).
  */
private[graft] object TextKernel {
  private val ws = java.util.regex.Pattern.compile("\\s+")

  def tokenize(text: UTF8String): Array[String] = {
    // same regex engine and pattern as Spark's split(text, "\\s+", -1);
    // empty tokens (leading-whitespace artifact, or the [""] result of an
    // empty string) are filtered exactly like the composable form
    val parts = ws.split(text.toString, -1)
    var n = 0
    var i = 0
    while (i < parts.length) { if (parts(i).nonEmpty) n += 1; i += 1 }
    if (n == parts.length) parts
    else {
      val out = new Array[String](n)
      var j = 0
      i = 0
      while (i < parts.length) {
        if (parts(i).nonEmpty) { out(j) = parts(i); j += 1 }
        i += 1
      }
      out
    }
  }

  def shingles(toks: Array[String], n: Int): Array[String] = {
    if (toks.length < n) return Array.empty
    // dedupe preserving first occurrence — array_distinct's order
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i + n <= toks.length) {
      val sb = new java.lang.StringBuilder(toks(i))
      var k = 1
      while (k < n) { sb.append(' ').append(toks(i + k)); k += 1 }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[String](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    out
  }

  def toArrayData(xs: Array[String]): GenericArrayData =
    new GenericArrayData(xs.map(s => UTF8String.fromString(s): Any))
}

/** whitespace tokens of a string column — array<string>, null on null */
final case class WordTokens(child: Expression) extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "word_tokens"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string input, got ${child.dataType.simpleString}")
  override def nullSafeEval(v: Any): Any =
    TextKernel.toArrayData(TextKernel.tokenize(v.asInstanceOf[UTF8String]))
  override protected def withNewChildInternal(newChild: Expression): WordTokens = copy(child = newChild)
}

/** distinct word n-gram shingles of a string column — array<string>, null on
  * null, empty when the text has fewer than n tokens
  */
final case class WordShingles(child: Expression, n: Int) extends UnaryExpression with CodegenFallback {
  require(n >= 1, s"shingle width must be >= 1, got $n")
  override def prettyName: String = "word_shingles"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string input, got ${child.dataType.simpleString}")
  override def nullSafeEval(v: Any): Any =
    TextKernel.toArrayData(TextKernel.shingles(TextKernel.tokenize(v.asInstanceOf[UTF8String]), n))
  override protected def withNewChildInternal(newChild: Expression): WordShingles = copy(child = newChild)
}

object TextExpressions {
  def wordTokens(text: Column): Column =
    GraftColumnBridge.column(WordTokens(GraftColumnBridge.expression(text)))
  def wordShingles(text: Column, n: Int): Column =
    GraftColumnBridge.column(WordShingles(GraftColumnBridge.expression(text), n))
}
