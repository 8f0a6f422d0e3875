package graft.functions

import org.apache.spark.sql.Column

import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expressions for the ANN hot path. The composable
  * formulation — `aggregate(zip_with(a, b, _*_), 0.0, _+_)` — runs the
  * lambda interpreter per element per row; on the candidate-scoring inner
  * loop (|candidates| × dims evaluations) that interpreter overhead is the
  * dominant cost. These expressions generate a tight Java loop inside
  * whole-stage codegen instead (preference order per the design brief:
  * compose built-ins where semantics allow, drop to a codegen'd Expression
  * where they don't perform).
  *
  * Accumulation order is left-to-right, identical to the fold in the
  * composable form, so results are bit-identical — INCLUDING the null
  * semantics: a null element or a length mismatch yields NULL exactly like
  * `aggregate(zip_with(...))` (zip_with null-pads the shorter array and a
  * null product poisons the fold). Reading nulls as getDouble's zeroed slot
  * or silently truncating to the shorter length would instead produce a
  * PLAUSIBLE wrong similarity (e.g. a 384-d query against a 768-d corpus).
  */
final case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"
  // null is also produced for mismatched lengths / null elements, not only
  // for null children — without this override a non-nullable schema would
  // let codegen skip the isNull slot entirely
  override def nullable: Boolean = true

  // These are registered as user-facing SQL functions (GraftExtensions), so
  // the type contract must be an analysis error, not runtime garbage:
  // ArrayData.getDouble on a non-double buffer returns junk silently.
  // (ExpectsInputTypes' AbstractDataType is private[sql] in Spark 4;
  // checkInputDataTypes itself is public, so enforce here.)
  override def checkInputDataTypes(): TypeCheckResult =
    VectorExpressions.requireDoubleArrays(prettyName, left.dataType, right.dataType)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = xs.numElements()
    if (n != ys.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (xs.isNullAt(i) || ys.isNullAt(i)) return null
      acc += xs.getDouble(i) * ys.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** squared L2 norm — same codegen shape as DotProduct */
final case class SquaredNorm(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "squared_norm"
  // null elements yield NULL (matching aggregate(transform(...))) — see
  // DotProduct's nullable note
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    VectorExpressions.requireDoubleArrays(prettyName, child.dataType)

  override def nullSafeEval(v: Any): Any = {
    val xs = v.asInstanceOf[ArrayData]
    var acc = 0.0
    var i = 0
    val n = xs.numElements()
    while (i < n) {
      if (xs.isNullAt(i)) return null
      val x = xs.getDouble(i)
      acc += x * x
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val x = ctx.freshName("x")
      s"""
         |int $n = $a.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  double $x = $a.getDouble($i);
         |  $acc += $x * $x;
         |}
         |if (!${ev.isNull}) ${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SquaredNorm =
    copy(child = newChild)
}

object VectorExpressions {
  private[functions] def requireDoubleArrays(fn: String, types: DataType*): TypeCheckResult = {
    val bad = types.zipWithIndex.collect {
      case (t, i) if t != ArrayType(DoubleType, true) && t != ArrayType(DoubleType, false) =>
        s"argument ${i + 1} is ${t.simpleString}"
    }
    if (bad.isEmpty) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$fn requires array<double> inputs; ${bad.mkString(", ")}")
  }

  def dot(a: Column, b: Column): Column =
    GraftColumnBridge.column(DotProduct(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
  def squaredNorm(a: Column): Column =
    GraftColumnBridge.column(SquaredNorm(GraftColumnBridge.expression(a)))

  /** guarded cosine similarity — the ONE tree both API surfaces use
    * (Ann.cosine delegates here; the SQL cosine_similarity builder bridges
    * this Column back to an Expression), so the DataFrame and SQL functions
    * can never diverge. Every degenerate pair — zero norm (0/0 would be NaN,
    * which Spark sorts ABOVE all doubles), NaN/Inf elements, null arrays,
    * null elements, mismatched lengths — lands on -1: never a neighbor,
    * never a top-k winner. try_divide (not `/`) because ANSI mode throws on
    * a zero double divisor; nanvl maps NaN, coalesce maps the NULLs. Each
    * squared_norm is evaluated once — a `when(denom > 0, ...)` guard would
    * evaluate both norms twice (codegen subexpression elimination does not
    * hoist into CASE branches).
    */
  def cosine(a: Column, b: Column): Column =
    GraftColumnBridge.column(cosineExpr(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** the shared Catalyst tree behind both cosine surfaces. Built from
    * resolved expression classes, not `functions.*` Columns: a Column built
    * from functions.* is an UNRESOLVED ColumnNode tree, and bridging one
    * into a SQL FunctionBuilder hands the analyzer an Unevaluable
    * ColumnNodeExpression that dies at codegen.
    */
  private[graft] def cosineExpr(a: Expression, b: Expression): Expression = {
    import org.apache.spark.sql.catalyst.expressions.{Coalesce, Literal, Multiply, NaNvl, Sqrt, TryDivide}
    val quot = new TryDivide(DotProduct(a, b), Multiply(Sqrt(SquaredNorm(a)), Sqrt(SquaredNorm(b))))
    Coalesce(Seq(NaNvl(quot, Literal(-1.0)), Literal(-1.0)))
  }
}
