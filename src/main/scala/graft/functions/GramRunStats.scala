package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Codegen'd multiset statistics of an `array<string>` of n-grams in one
 * fused loop: `struct(gram_total, top_gram_count, gram_distinct)` —
 * the three operands of the Gopher/MassiveText repetition rules.
 *
 * This is the per-row engine of the STREAMING repetition path
 * (`TextMetrics.repetitionStatsInRow`): stateless, so it must be cheap
 * per document. The higher-order-function formulation (array_sort + an
 * `aggregate` lambda) is CodegenFallback — measured ~16× the explode
 * path at sf0.1 (10.9 s vs 0.7 s) because every gram pays interpreted
 * lambda dispatch and a struct allocation. Here the whole computation
 * is one generated Java loop: copy refs, binary-sort, run-length scan;
 * no per-element allocation, stays inside whole-stage codegen.
 *
 * Sort order is UTF8String binary order — any total order groups equal
 * grams adjacently, which is all run-length counting needs. Contract:
 * array elements non-null (word shingles are concat_ws products, never
 * null); a null ARRAY yields a null struct.
 */
case class GramRunStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = GramRunStats.schema
  override def prettyName: String = "graft_gram_run_stats"

  // Same policy as DotProduct: no implicit casts — a non-array<string>
  // input leaves the expression unresolved and analysis fails loudly.
  override lazy val resolved: Boolean =
    childrenResolved && (child.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    })

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val arr = new Array[AnyRef](n)
    var i = 0
    while (i < n) { arr(i) = a.getUTF8String(i); i += 1 }
    java.util.Arrays.sort(arr.asInstanceOf[Array[AnyRef]])
    var maxrun = 0L
    var run = 0L
    var distinct = 0L
    i = 0
    while (i < n) {
      if (i == 0 || arr(i) != arr(i - 1)) { distinct += 1; run = 1 }
      else run += 1
      if (run > maxrun) maxrun = run
      i += 1
    }
    new GenericInternalRow(Array[Any](n.toLong, maxrun, distinct))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val arr = ctx.freshName("arr")
      val i = ctx.freshName("i")
      val run = ctx.freshName("run")
      val maxrun = ctx.freshName("maxrun")
      val distinct = ctx.freshName("distinct")
      val utf8 = classOf[UTF8String].getName
      s"""
         |int $n = $c.numElements();
         |$utf8[] $arr = new $utf8[$n];
         |for (int $i = 0; $i < $n; $i++) { $arr[$i] = $c.getUTF8String($i); }
         |java.util.Arrays.sort($arr);
         |long $run = 0L; long $maxrun = 0L; long $distinct = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($i == 0 || !$arr[$i].equals($arr[$i - 1])) { $distinct++; $run = 1L; }
         |  else { $run++; }
         |  if ($run > $maxrun) { $maxrun = $run; }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[]{java.lang.Long.valueOf((long) $n),
         |               java.lang.Long.valueOf($maxrun),
         |               java.lang.Long.valueOf($distinct)});
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GramRunStats {
  val schema: StructType = StructType(Seq(
    StructField("gram_total", LongType, nullable = false),
    StructField("top_gram_count", LongType, nullable = false),
    StructField("gram_distinct", LongType, nullable = false)))

  /** Column-level entry point over an array<string> of grams. */
  def apply(grams: Column): Column =
    GraftBridge.column(GramRunStats(GraftBridge.expression(grams)))
}
