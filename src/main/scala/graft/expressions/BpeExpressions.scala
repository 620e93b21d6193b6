package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Apply a learned BPE merge TABLE to a sentinel-padded symbol string in
  * rank order — ONE expression node regardless of merge count.
  *
  * The toy 5-merge encoder (t25) inlines each merge as a literal
  * `replace` in the projection, so its plan — and the generated code —
  * grows linearly with the merge table; a production tokenizer carries
  * 32k+ merges and that shape simply does not extend (the projection
  * would blow past codegen limits around a few hundred). Here the merge
  * table rides into the generated class as a reference object and the
  * rank-ordered loop runs inside one [[KernelCodegen]] kernel call per
  * row: plan size O(1) in merges, stage stays whole-stage compiled.
  *
  * Each step is literal leftmost-non-overlapping replace of `" a b "`
  * with `" ab "` — `java.lang.String.replace`, the same scan rule as
  * Spark's `replace()` and DuckDB's `replace()` (t21's five rounds
  * hash-prove the SQL pair agrees; the JDK spells out the identical
  * contract), so a chain of N expression steps equals N chained SQL
  * replaces bit-for-bit.
  */
// pats/reps are IndexedSeq, NOT Array: case-class equals/hashCode on an
// Array field is reference-based, so two semantically identical nodes
// would never compare equal — defeating Catalyst canonicalization
// (common-subexpression elimination, plan/exchange reuse).
case class BpeApplyMerges(child: Expression,
    pats: IndexedSeq[String], reps: IndexedSeq[String])
    extends UnaryExpression with KernelCodegen {

  require(pats.length == reps.length,
    s"merge table arity mismatch: ${pats.length} pats, ${reps.length} reps")

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"expected a (sentinel-padded) string of symbols, got $other")
  }

  // hot-path copies: flat array indexing inside the per-row loop
  @transient private lazy val patsArr: Array[String] = pats.toArray
  @transient private lazy val repsArr: Array[String] = reps.toArray

  override def nullSafeEval(input: Any): Any = {
    var s = input.asInstanceOf[UTF8String].toString
    val p = patsArr
    val r = repsArr
    var i = 0
    while (i < p.length) {
      s = s.replace(p(i), r(i))
      i += 1
    }
    UTF8String.fromString(s)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeExpressions {
  /** Column form: apply `(a, b, merged)` merges in the given (rank)
    * order to a sentinel-padded symbol string.
    */
  def applyMerges(syms: Column, merges: Seq[(String, String, String)]): Column =
    ColumnBridge.column(BpeApplyMerges(ColumnBridge.expression(syms),
      merges.map { case (a, b, _) => s" $a $b " }.toIndexedSeq,
      merges.map { case (_, _, m) => s" $m " }.toIndexedSeq))
}
