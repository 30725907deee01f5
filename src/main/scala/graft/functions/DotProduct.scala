package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/**
 * Codegen'd dot product of two `array<double>` columns.
 *
 * Spark's higher-order functions (`aggregate`, `zip_with`, `transform`)
 * are CodegenFallback — every row pays interpreted lambda dispatch plus
 * an intermediate product array, and the deep expression trees they
 * build slow Catalyst analysis/optimization down on every plan. A
 * first-class binary expression with `doGenCode` keeps the whole
 * similarity hot path (cosine scoring, sign-LSH projections, IVF
 * assignment) inside whole-stage codegen: one fused loop, no
 * allocation, one plan node.
 *
 * Semantics match the `aggregate(zip_with(a, b, _*_), 0.0, _+_)`
 * formulation it replaces, and DuckDB's `list_dot_product`, operand for
 * operand: products accumulate left-to-right from +0.0, so rounded
 * results agree bit-for-bit across engines. Contract: elements non-null;
 * length mismatch truncates to the shorter side (the lambda form yields
 * null there — this engine never compares unequal dims).
 */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  // No ExpectsInputTypes (AbstractDataType is private[sql]) — non-
  // array<double> inputs leave the expression unresolved, so analysis
  // fails instead of silently mis-reading array bytes. No implicit
  // casts either: callers cast explicitly (they all do).
  override lazy val resolved: Boolean =
    childrenResolved && Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Column-level entry point: `dot(a, b)` over two array<double>s. */
  def apply(a: Column, b: Column): Column =
    GraftBridge.column(
      DotProduct(GraftBridge.expression(a), GraftBridge.expression(b)))
}
