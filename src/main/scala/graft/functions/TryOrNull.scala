package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.DataType

/** Error-absorbing evaluation for the jetro `try body else default`
  * form (SURVEY §4.7(a)): the reference evaluates the body and maps BOTH
  * null and evaluation errors to the default (reference parse/ast.rs:
  * 144-150, vm/exec.rs try handling). A bare `coalesce` only covers the
  * null half; under ANSI (Spark 4 default) a division by zero or an
  * invalid cast in the body raises instead of yielding null. This
  * expression catches the evaluation error in both the interpreted and
  * the generated-code path, so `coalesce(TryOrNull(body), default)` is
  * the full try/else semantics inside whole-stage codegen.
  */
case class TryOrNull(child: Expression) extends UnaryExpression {

  override def dataType: DataType = child.dataType

  override def nullable: Boolean = true

  override def prettyName: String = "try_or_null"

  override def eval(input: InternalRow): Any =
    try child.eval(input)
    catch { case _: Exception => null }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    ev.copy(code =
      code"""
        boolean ${ev.isNull} = true;
        ${CodeGenerator.javaType(dataType)} ${ev.value} = ${CodeGenerator.defaultValue(dataType)};
        try {
          ${childGen.code}
          ${ev.isNull} = ${childGen.isNull};
          ${ev.value} = ${childGen.value};
        } catch (Exception e) {
          ${ev.isNull} = true;
        }""")
  }

  override protected def withNewChildInternal(newChild: Expression): TryOrNull =
    copy(child = newChild)
}

object TryOrNull {
  /** Column-API entry point. */
  def apply(c: Column): Column =
    ColumnBridge.column(TryOrNull(ColumnBridge.expression(c)))
}
