package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType}

/**
 * Codegen via self-reference: whole-stage codegen emits a direct call to
 * this expression's `nullSafeEval` (through `addReferenceObj`) instead of
 * falling back to the interpreted expression tree. Unlike
 * `CodegenFallback`, the enclosing operator pipeline STAYS inside one
 * whole-stage-codegen span — only this expression's work is a virtual
 * call, and its hot loop is already primitive-typed Scala.
 */
private[functions] object SelfRefCodegen {
  def unbox(dataType: DataType, raw: String): String = dataType match {
    case _: ArrayType => s"(org.apache.spark.sql.catalyst.util.ArrayData) $raw"
    case _: org.apache.spark.sql.types.StructType =>
      s"(org.apache.spark.sql.catalyst.InternalRow) $raw"
    case _: org.apache.spark.sql.types.StringType =>
      s"(org.apache.spark.unsafe.types.UTF8String) $raw"
    case dt =>
      val boxed = CodeGenerator.boxedType(dt)
      val prim = CodeGenerator.javaType(dt)
      s"(($boxed) $raw).${prim}Value()"
  }
}

private[functions] object SelfRefNullBranch {
  /** The generated null-result branch. When the expression is
    * non-nullable, `ev.isNull` is the literal `false` — assigning to it
    * ("false = true;") is a janino compile error that silently drops the
    * WHOLE STAGE to interpreted mode (the exact failure this trait
    * exists to avoid), so the non-nullable branch throws instead (a
    * non-nullable `nullSafeEval` returning null is a bug by contract). */
  def apply(nullable: Boolean, isNull: String): String =
    if (nullable) s"$isNull = true;"
    else "throw new NullPointerException(\"graft: non-nullable expression produced null\");"
}

trait UnarySelfRefCodegen extends UnaryExpression {
  /** public bridge so generated Java can invoke the protected eval */
  final def evalNonNullInput(v: Any): Any = nullSafeEval(v)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftExpr", this, classOf[UnarySelfRefCodegen].getName)
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("graftRes")
      s"""
         |Object $r = $ref.evalNonNullInput($c);
         |if ($r == null) { ${SelfRefNullBranch(nullable, ev.isNull.code)} }
         |else { ${ev.value} = ${SelfRefCodegen.unbox(dataType, r)}; }
       """.stripMargin
    })
  }
}

trait BinarySelfRefCodegen extends BinaryExpression {
  final def evalNonNullInputs(l: Any, r: Any): Any = nullSafeEval(l, r)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftExpr", this, classOf[BinarySelfRefCodegen].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("graftRes")
      s"""
         |Object $r = $ref.evalNonNullInputs($a, $b);
         |if ($r == null) { ${SelfRefNullBranch(nullable, ev.isNull.code)} }
         |else { ${ev.value} = ${SelfRefCodegen.unbox(dataType, r)}; }
       """.stripMargin
    })
  }
}
