package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Codegen'd portable polynomial string hash — `h·mult + codepoint mod
 * modulus` folded over the string's code points from `seed`. The
 * default parameters (0, 31, 2³¹−1) are the q40 fingerprint / q84
 * token-hash recurrence; (5381, 33, 10⁹+7) is the djb2-shaped
 * `Dedup.portableSimhashCodes` basis — both bit-identical to DuckDB's
 * `list_reduce(list_transform(range(...), i -> unicode(substr(s,i,1))), ...)`
 * replays the oracle map uses.
 *
 * Replaces the `aggregate(transform(filter(split(s, "")...)))` Column
 * formulation on the hot paths (hashedLinearScore, dsirWeights, doc
 * fingerprints, simhash token bases — every token of every document):
 * Spark's higher-order functions are CodegenFallback, so the lambda
 * chain pays interpreted dispatch plus a per-character single-char-
 * string array allocation per token, and its deep expression tree
 * taxes Catalyst on every plan. This is one fused per-token loop
 * inside whole-stage codegen.
 *
 * The `toString` is the one remaining allocation (UTF-8 → UTF-16); the
 * loop itself is branch-light and allocation-free. Code-point iteration
 * (not code units) keeps supplementary characters one term, matching
 * DuckDB's `unicode()`; the gated corpus is ASCII where every
 * formulation agrees.
 *
 * Overflow contract: `mult · (modulus − 1) + maxCodepoint` must fit a
 * long — true for both parameterizations by orders of magnitude.
 */
case class TokenHash(child: Expression, seed: Long, mult: Long, modulus: Long)
  extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_token_hash"

  // Resolution-gated input type (the DotProduct pattern): a non-string
  // child leaves the expression unresolved and analysis fails loudly.
  override lazy val resolved: Boolean =
    childrenResolved && child.dataType == StringType

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var h = seed
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * mult + cp) % modulus
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
         |long $h = ${seed}L;
         |int $i = 0;
         |while ($i < $s.length()) {
         |  int $cp = $s.codePointAt($i);
         |  $h = ($h * ${mult}L + $cp) % ${modulus}L;
         |  $i += java.lang.Character.charCount($cp);
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenHash {
  /** Column-level entry point: the default poly-31 mod 2³¹−1 hash
    * (the q40 fingerprint / q84 token recurrence). */
  def apply(s: Column): Column = apply(s, 0L, 31L, 2147483647L)

  /** Parameterized entry point for the other portable bases
    * (e.g. Dedup's djb2-shaped 5381/33/10⁹+7). */
  def apply(s: Column, seed: Long, mult: Long, modulus: Long): Column =
    GraftBridge.column(TokenHash(GraftBridge.expression(s), seed, mult, modulus))
}
