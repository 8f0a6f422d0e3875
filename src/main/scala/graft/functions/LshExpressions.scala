package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** All nTables LSH (table, bucket) pairs of one embedding in ONE expression.
  *
  * The composable formulation — an `array(struct(t, Σ_p CASE WHEN
  * dot_product(emb, w_tp) >= 0 …))` of nTables·nPlanes separate DotProduct
  * expressions — generates a whole-stage method whose bytecode exceeds the
  * JVM's DontCompileHugeMethods limit (8,000 bytecode) at production table
  * counts (8×6 = 48 inlined 64-element dot loops), so HotSpot never JIT-
  * compiles it and the ENTIRE stage runs in the bytecode interpreter:
  * measured ~150 µs per dot product at sf0.1 — ~1000× the JIT'd cost — and
  * 2× slower than disabling whole-stage codegen outright. This expression
  * computes every (t, b) in one small JIT-friendly triple loop over a
  * precomputed primitive weight matrix; CodegenFallback routes codegen to
  * the (JIT-compiled) `eval`, keeping the surrounding stage compilable.
  *
  * Bit-parity with the composable form (same planeWeight constants, same
  * d-ascending accumulation order per (t, p) dot):
  *  - null embedding, null element, or length ≠ dims → every dot is null →
  *    every CASE falls to 0 → bucket 0 for EVERY table (array still
  *    produced, never null);
  *  - NaN/Inf elements → NaN/±Inf dot; Spark's GreaterThanOrEqual orders
  *    NaN ABOVE every double, so `NaN >= 0` is TRUE in the composable form
  *    — mirrored here with an explicit isNaN branch (a plain Java compare
  *    would silently flip those bits; pinned by LshBucketsSpec).
  */
final case class LshBuckets(child: Expression, nTables: Int, nPlanes: Int, dims: Int)
    extends UnaryExpression
    with CodegenFallback {

  override def prettyName: String = "lsh_buckets"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("t", IntegerType, nullable = false), StructField("b", LongType, nullable = false))),
    containsNull = false
  )

  override def checkInputDataTypes(): TypeCheckResult =
    VectorExpressions.requireDoubleArrays(prettyName, child.dataType)

  // [t][p][d] flattened; deterministic from (nTables, nPlanes, dims) so it
  // stays out of the case-class identity (canonicalization/equality)
  @transient private lazy val weights: Array[Double] = {
    val w = new Array[Double](nTables * nPlanes * dims)
    var t = 0
    while (t < nTables) {
      var p = 0
      while (p < nPlanes) {
        var d = 0
        while (d < dims) {
          w(((t * nPlanes) + p) * dims + d) = graft.ann.Ann.planeWeight(t, p, d)
          d += 1
        }
        p += 1
      }
      t += 1
    }
    w
  }

  override def eval(input: InternalRow): Any = {
    val rows = new Array[Any](nTables)
    val e = child.eval(input)
    var valid = e != null
    var v: Array[Double] = null
    if (valid) {
      val xs = e.asInstanceOf[ArrayData]
      val n = xs.numElements()
      valid = n == dims
      var i = 0
      while (valid && i < n) { if (xs.isNullAt(i)) valid = false; i += 1 }
      if (valid) v = xs.toDoubleArray()
    }
    var t = 0
    while (t < nTables) {
      var b = 0L
      if (valid) {
        var p = 0
        while (p < nPlanes) {
          var acc = 0.0
          val base = ((t * nPlanes) + p) * dims
          var d = 0
          while (d < dims) { acc += v(d) * weights(base + d); d += 1 }
          // Spark's >= sorts NaN above all doubles — NaN dots SET the bit
          if (acc >= 0 || java.lang.Double.isNaN(acc)) b |= 1L << p
          p += 1
        }
      }
      rows(t) = InternalRow(t, b)
      t += 1
    }
    new GenericArrayData(rows)
  }

  override protected def withNewChildInternal(newChild: Expression): LshBuckets =
    copy(child = newChild)
}

object LshExpressions {

  /** Column surface: all (t, b) pairs for `emb` as array<struct<t,b>> —
    * explode it to get the per-table bucket rows.
    */
  def lshBuckets(emb: Column, nTables: Int, nPlanes: Int, dims: Int): Column =
    GraftColumnBridge.column(LshBuckets(GraftColumnBridge.expression(emb), nTables, nPlanes, dims))
}
