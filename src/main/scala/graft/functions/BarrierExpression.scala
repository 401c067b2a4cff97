package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.DataType

/** Identity pass-through that reports `deterministic = false`, making the
  * enclosing Project an optimizer barrier: predicate pushdown will not
  * substitute through it and CollapseProject will not merge across it.
  *
  * Why it exists: filter conditions referencing an expensive aliased
  * expression (here `from_json` over the full wire schema) get the alias
  * *substituted* when pushed past the defining Project — round-1 review
  * found ~12 copies of `from_json` in the q_event_pipeline Filter. Runtime
  * whole-stage-codegen subexpression elimination hides most of the cost,
  * but the interpreted-filter and codegen-fallback paths pay it in full.
  * Wrapping the parse in a barrier pins exactly ONE `from_json` into the
  * physical plan on every execution path.
  *
  * The value, nullability and codegen are the child's own — only the
  * determinism flag lies, and only to Catalyst. Use sparingly: a barrier
  * also stops constant folding and column pruning across itself, so wrap
  * only expressions whose full output is genuinely needed downstream.
  */
case class OptimizerBarrier(child: Expression) extends UnaryExpression {
  override lazy val deterministic: Boolean = false
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "opt_barrier"

  override def eval(input: InternalRow): Any = child.eval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }

  override protected def withNewChildInternal(newChild: Expression): OptimizerBarrier =
    copy(child = newChild)
}

object BarrierFunctions {
  /** Column API for [[OptimizerBarrier]]. */
  def barrier(c: Column): Column =
    Bridge.column(OptimizerBarrier(Bridge.expression(c)))
}
