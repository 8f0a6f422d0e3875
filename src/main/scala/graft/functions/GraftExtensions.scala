package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions hook (the brief's extension point for custom
  * operators): registers the native vector expressions as SQL functions, so
  * `spark.sql("SELECT dot_product(a, b) ...")` works in any session built
  * with `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.functions.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(
      (
        new FunctionIdentifier("dot_product"),
        new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
        (children: Seq[Expression]) => {
          require(children.length == 2, "dot_product(a, b) takes two array<double> arguments")
          DotProduct(children.head, children(1))
        }
      )
    )
    ext.injectFunction(
      (
        new FunctionIdentifier("squared_norm"),
        new ExpressionInfo(classOf[SquaredNorm].getName, "squared_norm"),
        (children: Seq[Expression]) => {
          require(children.length == 1, "squared_norm(a) takes one array<double> argument")
          SquaredNorm(children.head)
        }
      )
    )
    // cosine_similarity(a, b) — composed from the native expressions, same
    // semantics as graft.ann.Ann.cosine (ANSI division; zero-norm input is
    // the caller's error, as in the DataFrame API)
    ext.injectFunction(
      (
        new FunctionIdentifier("cosine_similarity"),
        new ExpressionInfo(classOf[DotProduct].getName, "cosine_similarity"),
        (children: Seq[Expression]) => {
          require(children.length == 2, "cosine_similarity(a, b) takes two array<double> arguments")
          import org.apache.spark.sql.catalyst.expressions.{Divide, Multiply, Sqrt}
          val (a, b) = (children.head, children(1))
          Divide(DotProduct(a, b), Multiply(Sqrt(SquaredNorm(a)), Sqrt(SquaredNorm(b))))
        }
      )
    )
  }
}
