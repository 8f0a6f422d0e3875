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
object GraftExtensions {
  // builders shared by the injection below AND the specs (a test registering
  // its own copy would not catch a bug in the injected one)
  private[graft] def buildDotProduct(children: Seq[Expression]): Expression = {
    require(children.length == 2, "dot_product(a, b) takes two array<double> arguments")
    DotProduct(children.head, children(1))
  }
  private[graft] def buildSquaredNorm(children: Seq[Expression]): Expression = {
    require(children.length == 1, "squared_norm(a) takes one array<double> argument")
    SquaredNorm(children.head)
  }
  private[graft] def buildCosine(children: Seq[Expression]): Expression = {
    require(children.length == 2, "cosine_similarity(a, b) takes two array<double> arguments")
    import org.apache.spark.sql.catalyst.expressions.{Divide, Multiply, Sqrt}
    val (a, b) = (children.head, children(1))
    Divide(DotProduct(a, b), Multiply(Sqrt(SquaredNorm(a)), Sqrt(SquaredNorm(b))))
  }
  private[graft] def buildChunkExplode(children: Seq[Expression]): Expression = {
    require(children.length == 1, "chunk_explode(data) takes one BINARY chunk argument")
    ChunkExplode(children.head)
  }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(
      (
        new FunctionIdentifier("dot_product"),
        new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
        GraftExtensions.buildDotProduct _
      )
    )
    ext.injectFunction(
      (
        new FunctionIdentifier("squared_norm"),
        new ExpressionInfo(classOf[SquaredNorm].getName, "squared_norm"),
        GraftExtensions.buildSquaredNorm _
      )
    )
    // cosine_similarity(a, b) — composed from the native expressions, same
    // semantics as graft.ann.Ann.cosine (ANSI division; zero-norm input is
    // the caller's error, as in the DataFrame API)
    ext.injectFunction(
      (
        new FunctionIdentifier("cosine_similarity"),
        new ExpressionInfo(classOf[DotProduct].getName, "cosine_similarity"),
        GraftExtensions.buildCosine _
      )
    )
    // chunk_explode(data) — the native Gorilla/DoD chunk-decode Generator.
    // Being a Generator it works in LATERAL VIEW and the SELECT list exactly
    // like built-in explode; without this registration, SQL sessions could
    // not read chunked history tables at all (the decode was
    // DataFrame-API-only).
    ext.injectFunction(
      (
        new FunctionIdentifier("chunk_explode"),
        new ExpressionInfo(classOf[ChunkExplode].getName, "chunk_explode"),
        GraftExtensions.buildChunkExplode _
      )
    )
  }
}
