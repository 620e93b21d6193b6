package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Dot product of two numeric arrays (float or double elements), with full
  * whole-stage codegen.
  *
  * This is THE hot scalar of the similarity-search family: every kNN /
  * LSH / IVF / near-dup query evaluates it millions of times per task (once
  * per candidate pair). The HOF formulation
  * (`aggregate(zip_with(a,b,*),0,+)`) is a `CodegenFallback` chain in
  * Spark — interpreted lambda dispatch plus an intermediate 64-element
  * array allocation per pair — and also knocks its whole projection out of
  * whole-stage codegen. This expression generates a tight primitive loop
  * over the `ArrayData` slots (no boxing, no copy) and keeps the stage in
  * codegen.
  *
  * Semantics: elements are widened to double BEFORE multiply/accumulate and
  * folded in ascending index order — bitwise-identical to the sequential
  * HOF fold and to a DuckDB `list_sum(list_transform(...))` oracle. Arrays
  * of unequal length fold over the common prefix (embedding corpora are
  * fixed-dim; the case exists only defensively). Null ELEMENTS contribute
  * nothing (guard emitted only when the input type says nulls can occur).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"expected (array<float|double>, array<float|double>), " +
        s"got (${left.dataType}, ${right.dataType})")
  }

  private def arrTy(e: Expression): ArrayType = e.dataType.asInstanceOf[ArrayType]

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    val aFloat = arrTy(left).elementType == FloatType
    val bFloat = arrTy(right).elementType == FloatType
    val aNulls = arrTy(left).containsNull
    val bNulls = arrTy(right).containsNull
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (!((aNulls && a.isNullAt(i)) || (bNulls && b.isNullAt(i)))) {
        val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
        val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
        acc += x * y
      }
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      def get(arr: String, e: Expression): String =
        if (arrTy(e).elementType == FloatType) s"(double) $arr.getFloat($i)"
        else s"$arr.getDouble($i)"
      val nullGuard =
        (if (arrTy(left).containsNull) Seq(s"$a.isNullAt($i)") else Nil) ++
          (if (arrTy(right).containsNull) Seq(s"$b.isNullAt($i)") else Nil)
      val body = s"$acc += ${get(a, left)} * ${get(b, right)};"
      val guarded =
        if (nullGuard.isEmpty) body
        else s"if (!(${nullGuard.mkString(" || ")})) { $body }"
      s"""
         |double $acc = 0.0;
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |for (int $i = 0; $i < $n; $i++) {
         |  $guarded
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression = copy(newLeft, newRight)
}

object VectorExpressions {
  def dotProduct(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
