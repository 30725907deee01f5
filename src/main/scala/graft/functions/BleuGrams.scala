package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Fused BLEU gram-row builder (r16): token array → every 1..`maxN`-gram
 * as (n, gramHash) structs, in one eval per row.
 *
 * Replaces the Eval.bleuGramTable column program
 * `explode(flatten(transform(sequence(1,4), n => transform(..., i =>
 * struct(n, stepped(...))))))` over a `transform(toks, TokenHash)`
 * array: four levels of higher-order functions — CodegenFallback,
 * interpreted lambda dispatch per gram position, re-walking the
 * when-chain and `element_at` per step. This expression hashes each
 * token once and folds every gram in tight loops.
 *
 * Bit-exact contract with the program it replaces (spec-pinned):
 *  - token hash = [[TokenHash]]'s poly-31 mod 2³¹−1 code-point fold
 *    (same loop, inlined);
 *  - gram hash = the unrolled fold g_{k+1} = (g_k·31 + h_{k+1}) mod
 *    2³¹−1 (operands non-negative, so `%` ≡ pmod);
 *  - gram order = n ascending, start position ascending (downstream
 *    only aggregates, but the multiset is identical row for row);
 *  - a NULL token yields NULL gram hashes for every window containing
 *    it (the legacy element_at/pmod null propagation); tokenizers
 *    upstream never produce null tokens.
 */
case class BleuGrams(child: Expression, maxN: Int)
  extends UnaryExpression with CodegenFallback {

  private val P = 2147483647L

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("n", IntegerType, nullable = false),
      StructField("gh", LongType, nullable = true))),
    containsNull = false)
  override def prettyName: String = "graft_bleu_grams"

  override lazy val resolved: Boolean =
    childrenResolved && (child.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    })

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val t = toks.numElements()
    val hs = new Array[Long](t)
    val nul = new Array[Boolean](t)
    var d = 0
    while (d < t) {
      if (toks.isNullAt(d)) nul(d) = true
      else {
        val s = toks.getUTF8String(d).toString
        var h = 0L
        var i = 0
        while (i < s.length) {
          val cp = s.codePointAt(i)
          h = (h * 31L + cp) % P
          i += Character.charCount(cp)
        }
        hs(d) = h
      }
      d += 1
    }
    var total = 0
    var n = 1
    while (n <= maxN) { if (t >= n) total += t - n + 1; n += 1 }
    val out = new Array[Any](total)
    var o = 0
    n = 1
    while (n <= maxN) {
      if (t >= n) {
        var i = 0
        while (i <= t - n) {
          var g = hs(i)
          var bad = nul(i)
          var k = 1
          while (k < n) {
            bad ||= nul(i + k)
            g = (g * 31L + hs(i + k)) % P
            k += 1
          }
          out(o) = InternalRow(n, if (bad) null else java.lang.Long.valueOf(g))
          o += 1
          i += 1
        }
      }
      n += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BleuGrams {
  def apply(toks: Column, maxN: Int = 4): Column =
    GraftBridge.column(BleuGrams(GraftBridge.expression(toks), maxN))
}
