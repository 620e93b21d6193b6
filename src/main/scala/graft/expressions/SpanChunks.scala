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
  * token array into `n`-token spans `(idx, span)` taken every `stride`
  * tokens. The default `stride = n` gives d8/d18's non-overlapping chunks
  * (trailing partial span included, idx = chunk ordinal); `stride = 1`
  * with `fullOnly = true` gives d21's SLIDING windows (every offset, full
  * windows only, idx = token position) — the shape any-length ExactSubstr
  * needs, since a repeat at an arbitrary offset only ever aligns with
  * stride-1 windows.
  *
  * Why a Generator and not `posexplode(transform(sequence(...)))` (the t7
  * chunking shape): the HOF form MATERIALIZES the full chunk array per row
  * before exploding — for a 100k-token document that is the whole document
  * duplicated in one `ArrayData` allocation (×n at stride 1), resident
  * until the row is consumed. The generator emits one span at a time
  * through `GenerateExec`'s row iterator, so peak memory per row is one
  * span regardless of document length — the difference between "works at
  * 100 TB with long documents" and an executor OOM on the longest docs.
  *
  * Output rows are `(idx INT, span STRING)` with spans space-joined, so
  * `array_to_string(t[(i*n)+1 : (i*n)+n], ' ')` (chunks) or
  * `array_to_string(t[i+1 : i+n], ' ')` (sliding) in DuckDB replays them
  * byte-for-byte (the d8/d21 oracles do).
  */
case class SpanChunks(child: Expression, n: Int, stride: Int = 0,
    fullOnly: Boolean = false)
    extends UnaryExpression with Generator with CodegenFallback {

  require(n >= 1, s"span size must be >= 1, got $n")
  /** stride = 0 (the default) means "stride by n" — chunk mode. */
  private val step = if (stride == 0) n else stride
  require(step >= 1, s"stride must be >= 1, got $step")

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
        private var ord = 0
        override def hasNext: Boolean =
          if (fullOnly) start + n <= len else start < len
        override def next(): InternalRow = {
          val end = math.min(start + n, len)
          val parts = new Array[UTF8String](end - start)
          var i = start
          while (i < end) { parts(i - start) = arr.getUTF8String(i); i += 1 }
          // chunk mode numbers spans by ordinal (d8's idx); sliding mode
          // numbers them by token position (d21's pos)
          val idx = if (step == n && !fullOnly) ord else start
          val row = InternalRow(idx, UTF8String.concatWs(sep, parts: _*))
          start += step
          ord += 1
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

  /** Sliding full windows at stride 1: one `(pos, span)` row per token
    * offset 0..len-n (none for docs shorter than n). d21's window stream.
    */
  def slidingChunks(toks: Column, n: Int): Column =
    ColumnBridge.column(SpanChunks(ColumnBridge.expression(toks), n,
      stride = 1, fullOnly = true))
}
