package graft.expr

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** True iff the double child is an integral value, with the reference's exact
  * float semantics (`internal/validator/validator.go:801-809, 906-907`):
  * Go `math.Trunc(x) == x` — so `Inf` IS integral (Trunc(Inf)==Inf) and `NaN`
  * is NOT (NaN != NaN). `Math.floor(v) == v` reproduces both quirks.
  * Codegen'd so it stays inside whole-stage codegen on the hot path. */
case class IsIntegral(child: Expression) extends UnaryExpression with Predicate {
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any): Any = {
    val d = v.asInstanceOf[Double]
    java.lang.Math.floor(d) == d
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"(java.lang.Math.floor($c) == $c)")
  override protected def withNewChildInternal(c: Expression): IsIntegral = copy(child = c)
}

object NumericExprs {
  /** Column wrapper: is this (double-valued) column an integral number? */
  def isIntegral(c: Column): Column =
    GraftSql.toColumn(IsIntegral(GraftSql.toExpression(c.cast("double"))))
}
