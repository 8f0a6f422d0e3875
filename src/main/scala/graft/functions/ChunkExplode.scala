package graft.functions

import graft.codec.ChunkCodec
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType, LongType, StructField, StructType}

/** Native Generator for Gorilla/delta-of-delta chunk decode: one BINARY
  * chunk row → (bucket, value) rows, decoded straight into InternalRows.
  *
  * The composable formulation — `explode(udf(decode))` — materializes the
  * whole chunk as a boxed Seq[(Long, Double)], converts it to Catalyst
  * ArrayData, then explodes it: three full passes and two intermediate
  * copies per chunk. This Generator is the analyzer-extracted form of
  * explode itself (ExtractGenerator turns it into a Generate node), so the
  * decoded points stream out with one allocation per output row and no
  * intermediate collection. (SURVEY §7.3 earmarked exactly this as the
  * custom-Expression fallback if chunk decode mattered; at 100 TB the
  * chunked-history scan is a primary read path.)
  */
final case class ChunkExplode(child: Expression)
    extends UnaryExpression
    with Generator
    with CodegenFallback {

  override def elementSchema: StructType =
    StructType(Seq(StructField("bucket", LongType), StructField("value", DoubleType)))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"chunk_explode requires a BINARY chunk column, got ${child.dataType.simpleString}")

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val bytes = child.eval(input)
    if (bytes == null) Iterator.empty
    else {
      val (ts, vs) = ChunkCodec.decode(bytes.asInstanceOf[Array[Byte]])
      new Iterator[InternalRow] {
        private var i = 0
        override def hasNext: Boolean = i < ts.length
        override def next(): InternalRow = {
          val r = new GenericInternalRow(Array[Any](ts(i), vs(i)))
          i += 1
          r
        }
      }
    }
  }

  override def prettyName: String = "chunk_explode"

  override protected def withNewChildInternal(newChild: Expression): ChunkExplode =
    copy(child = newChild)
}

object ChunkExplode {
  /** `df.select(col("scope"), chunkExplode(col("data")))` — the analyzer's
    * ExtractGenerator rewrites this into a Generate node, exactly like
    * built-in explode.
    */
  def chunkExplode(data: Column): Column = GraftColumnBridge.column(ChunkExplode(GraftColumnBridge.expression(data)))
}
