package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst GENERATOR (table-valued expression — the extension kind
  * alongside the scalar expressions, TypedImperativeAggregates, optimizer
  * rule, and whole-plan operator the library already ships): explodes a
  * token array into consecutive non-overlapping `n`-token spans
  * `(idx, span)`, trailing partial span included.
  *
  * Why a Generator and not `posexplode(transform(sequence(...)))` (the t7
  * chunking shape): the HOF form MATERIALIZES the full chunk array per row
  * before exploding — for a 100k-token document that is the whole document
  * duplicated in one `ArrayData` allocation, resident until the row is
  * consumed. The generator emits one span at a time through `GenerateExec`'s
  * row iterator, so peak memory per row is one span regardless of document
  * length — the difference between "works at 100 TB with long documents"
  * and an executor OOM on the longest docs.
  *
  * Output rows are `(idx INT, span STRING)` with spans space-joined, so
  * `array_to_string(t[(i*n)+1 : (i*n)+n], ' ')` in DuckDB replays them
  * byte-for-byte (d8's oracle does).
  */
case class SpanChunks(child: Expression, n: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  require(n >= 1, s"span size must be >= 1, got $n")

  override def elementSchema: StructType = StructType(
    StructField("idx", IntegerType, nullable = false) ::
      StructField("span", StringType, nullable = false) :: Nil)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_span_chunks expects array<string> tokens, got $other")
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Iterator.empty
    else {
      val arr = v.asInstanceOf[ArrayData]
      val len = arr.numElements()
      if (len == 0) Iterator.empty
      else new Iterator[InternalRow] {
        private val sep = UTF8String.fromString(" ")
        private var start = 0
        private var idx = 0
        override def hasNext: Boolean = start < len
        override def next(): InternalRow = {
          val end = math.min(start + n, len)
          val parts = new Array[UTF8String](end - start)
          var i = start
          while (i < end) { parts(i - start) = arr.getUTF8String(i); i += 1 }
          val row = InternalRow(idx, UTF8String.concatWs(sep, parts: _*))
          start = end
          idx += 1
          row
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): SpanChunks =
    copy(child = newChild)
}

object SpanChunks {
  /** DataFrame surface: `df.select($"doc_id", spanChunks($"toks", 3).as(Seq("idx", "span")))`. */
  def spanChunks(toks: Column, n: Int): Column =
    ColumnBridge.column(SpanChunks(ColumnBridge.expression(toks), n))
}
