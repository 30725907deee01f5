package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Codegen'd portable polynomial token hash — `h·31 + codepoint mod
 * 2³¹−1` over the string's code points (the q40 fingerprint recurrence;
 * bit-identical to DuckDB's
 * `list_reduce(list_transform(range(...), i -> unicode(substr(s,i,1))), ...)`
 * replay the oracle map uses).
 *
 * Replaces the `aggregate(transform(filter(split(s, "")...)))` Column
 * formulation on the hot paths (hashedLinearScore, dsirWeights — every
 * token of every document): Spark's higher-order functions are
 * CodegenFallback, so the lambda chain pays interpreted dispatch plus a
 * per-character single-char-string array allocation per token, and its
 * deep expression tree taxes Catalyst on every plan. This is one fused
 * per-token loop inside whole-stage codegen.
 *
 * The `toString` is the one remaining allocation (UTF-8 → UTF-16); the
 * loop itself is branch-light and allocation-free. Code-point iteration
 * (not code units) keeps supplementary characters one term, matching
 * DuckDB's `unicode()`; the gated corpus is ASCII where every
 * formulation agrees.
 */
case class TokenHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_token_hash"

  // Resolution-gated input type (the DotProduct pattern): a non-string
  // child leaves the expression unresolved and analysis fails loudly.
  override lazy val resolved: Boolean =
    childrenResolved && child.dataType == StringType

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * 31L + cp) % 2147483647L
      i += Character.charCount(cp)
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      val cp = ctx.freshName("cp")
      s"""
         |java.lang.String $s = $c.toString();
         |long $h = 0L;
         |int $i = 0;
         |while ($i < $s.length()) {
         |  int $cp = $s.codePointAt($i);
         |  $h = ($h * 31L + $cp) % 2147483647L;
         |  $i += java.lang.Character.charCount($cp);
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenHash {
  /** Column-level entry point: the portable token hash of a string column. */
  def apply(s: Column): Column =
    GraftBridge.column(TokenHash(GraftBridge.expression(s)))
}
