package graft.functions

import graft.spark.SparkTestBase
import org.apache.spark.sql.functions._

/** Round-8 optimization replaced the composable tokenize/shingle HOF chains
  * with the native WordTokens/WordShingles expressions (interpreter-per-
  * element motivation in their scaladoc). This spec pins string-exact parity
  * against the ORIGINAL composable forms on hostile inputs, so a future
  * edit to either side trips here instead of skewing every text query.
  */
class TextExpressionsSpec extends SparkTestBase {

  // the pre-round-8 composable forms, verbatim
  private def legacyTokens(text: org.apache.spark.sql.Column) =
    filter(split(trim(text), "\\s+"), t => t =!= "")
  private def legacyShingles(n: Int) =
    array_distinct(
      filter(
        transform(
          col("_toks"),
          (_, i) => when(i + n <= size(col("_toks")), concat_ws(" ", slice(col("_toks"), i + 1, lit(n))))
        ),
        _.isNotNull
      )
    )

  private def corpus = {
    val s = spark
    import s.implicits._
    (Seq(
      "plain three word doc",
      "  leading and trailing  ",
      "tabs\tand\nnewlines mixed\r\nhere",
      "", "   ", "\t\n",
      "one",
      "two tokens",
      "dup dup dup dup",
      "a b c a b c a b c",
      "unicode tökens ünd ŵords",
      "non breaking space inside",
      "x " * 2000 + "tail", // long doc
      null
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }).toDF("doc_id", "text")
  }

  test("WordTokens ≡ composable filter(split(trim…)) on hostile inputs") {
    val a = corpus.select(col("doc_id"), TextExpressions.wordTokens(col("text")).as("t")).collect()
    val b = corpus.select(col("doc_id"), legacyTokens(col("text")).as("t")).collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
  }

  test("WordShingles ≡ composable transform/slice/concat_ws/array_distinct for n = 1, 2, 3, 5") {
    for (n <- Seq(1, 2, 3, 5)) {
      val a = corpus
        .select(col("doc_id"), TextExpressions.wordShingles(col("text"), n).as("s"))
        .collect()
        .map(_.toSeq)
      val b = corpus
        .select(col("doc_id"), legacyTokens(col("text")).as("_toks"))
        .select(col("doc_id"), legacyShingles(n).as("s"))
        .collect()
        .map(_.toSeq)
      assert(a.toSeq == b.toSeq, s"n=$n")
    }
  }
}
