package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/**
 * Fused, codegen'd sign-LSH code: packed bucket code of a raw
 * `array<double>` vector against a fixed ±1 hyperplane set — bit p set
 * iff Σ_d round(v_d·1024)·plane_{p,d} ≥ 0.
 *
 * Replaces the `Σ when(dot(quantize(vec), plane_p) ≥ 0, 2^p)` column
 * program (r16 optimization): `quantize`'s `transform(vec, round(x·1024))`
 * is a higher-order function — CodegenFallback, interpreted lambda
 * dispatch per element — sitting under every one of the `planes` dot
 * products, which priced sign-coding at ~60 µs/vector in the sf0.1
 * blocking scans. This expression quantizes each element ONCE and runs
 * all plane accumulators in a single fused loop.
 *
 * Exactness contract (bit-for-bit with the column program it replaces,
 * pinned by DotProductSpec):
 *  - quantization replays Spark's `Round(Multiply(v, 1024), 0)` double
 *    path exactly: `java.math.BigDecimal.valueOf(v·1024).setScale(0,
 *    HALF_UP)` (both Spark's interpreted and generated Round do this);
 *  - per-plane accumulation is left-to-right from +0.0 over the ±1.0
 *    double coefficients — [[DotProduct]]'s operand order, and the
 *    order an external oracle's list_dot_product replays;
 *  - a NULL element quantizes to 0.0 (the null-unboxing value the HOF
 *    pipeline fed the dot) — embeddings never carry null elements;
 *  - a NULL vector is null (callers wrap the legacy 0-degrade).
 *
 * Width is NOT checked here: callers keep the loud `size(vec) === dim`
 * guard. Out-of-range reads cannot happen — the loop runs over
 * min(numElements, dim).
 */
case class SignCode(child: Expression, planes: Array[Array[Int]])
  extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_sign_code"

  override lazy val resolved: Boolean =
    childrenResolved && (child.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })

  private val dim: Int = planes.head.length
  // flattened plane coefficients, plane-major: coef[p*dim + d]
  private val coef: Array[Double] = {
    val out = new Array[Double](planes.length * dim)
    var p = 0
    while (p < planes.length) {
      var d = 0
      while (d < dim) { out(p * dim + d) = planes(p)(d).toDouble; d += 1 }
      p += 1
    }
    out
  }

  private def quantized(v: ArrayData, d: Int): Double =
    if (v.isNullAt(d)) 0.0
    else java.math.BigDecimal.valueOf(v.getDouble(d) * 1024.0)
      .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue()

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(v.numElements(), dim)
    val q = new Array[Double](n)
    var d = 0
    while (d < n) { q(d) = quantized(v, d); d += 1 }
    var code = 0L
    var p = 0
    while (p < planes.length) {
      var s = 0.0
      var i = 0
      while (i < n) { s += q(i) * coef(p * dim + i); i += 1 }
      if (s >= 0.0) code |= (1L << p)
      p += 1
    }
    code
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val coefRef = ctx.addReferenceObj("signCodeCoef", coef, "double[]")
      val n = ctx.freshName("n")
      val q = ctx.freshName("q")
      val d = ctx.freshName("d")
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val code = ctx.freshName("code")
      s"""
         |int $n = java.lang.Math.min($v.numElements(), $dim);
         |double[] $q = new double[$n];
         |for (int $d = 0; $d < $n; $d++) {
         |  $q[$d] = $v.isNullAt($d) ? 0.0 :
         |    java.math.BigDecimal.valueOf($v.getDouble($d) * 1024.0)
         |      .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue();
         |}
         |long $code = 0L;
         |for (int $p = 0; $p < ${planes.length}; $p++) {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += $q[$i] * $coefRef[$p * $dim + $i];
         |  }
         |  if ($s >= 0.0) $code |= (1L << $p);
         |}
         |${ev.value} = $code;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SignCode {
  def apply(vec: Column, planes: Array[Array[Int]]): Column =
    GraftBridge.column(SignCode(GraftBridge.expression(vec), planes))
}
