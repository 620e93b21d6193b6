package graft.expressions

import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode}

/** Codegen bridge for kernel-style unary expressions (tight compiled loops
  * over one input value).
  *
  * A `CodegenFallback` expression doesn't just evaluate interpreted — it
  * drops its ENTIRE projection stage out of whole-stage codegen, so every
  * co-located expression in the stage interprets too (measured ~4x on
  * chained HOF stages in round 1). Hand-writing Java for hash-set /
  * LinkedHashSet kernels buys nothing — the JVM already compiled them — so
  * instead we emit a call to this very expression instance (shipped into
  * the generated class via `addReferenceObj`) and keep the stage compiled.
  * Cost: one virtual call + one boxing per ROW; the per-element loops stay
  * primitive inside `nullSafeEval`.
  *
  * Requires the concrete `nullSafeEval` override to be public (Scala's
  * default when the override omits `protected`) so generated Java can call
  * it.
  */
trait KernelCodegen extends UnaryExpression {
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("kernel", this, getClass.getName)
    nullSafeCodeGen(ctx, ev, c => {
      val javaType = CodeGenerator.javaType(dataType)
      val boxedType = CodeGenerator.boxedType(dataType)
      s"${ev.value} = ($javaType) (($boxedType) $ref.nullSafeEval($c));"
    })
  }
}
