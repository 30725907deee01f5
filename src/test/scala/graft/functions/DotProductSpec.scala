package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

/** The native codegen'd dot product must be value-identical to the
  * higher-order-function formulation it replaced (same accumulation
  * order — bit-for-bit, not just approximately). */
class DotProductSpec extends SparkTestBase with Matchers {

  private def lambdaDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  test("DotProduct equals the aggregate/zip_with formulation bit-for-bit") {
    val ss = spark
    import ss.implicits._
    val rng = new scala.util.Random(7)
    val rows = Seq.fill(200)(
      (Array.fill(64)(rng.nextDouble() * 2 - 1), Array.fill(64)(rng.nextDouble() * 2 - 1)))
    val df = rows.toDF("a", "b")
    val out = df.select(
      DotProduct(col("a"), col("b")).as("native"),
      lambdaDot(col("a"), col("b")).as("lambda")).collect()
    out.foreach { r =>
      // exact comparison: same summation order must give the same bits
      java.lang.Double.doubleToLongBits(r.getDouble(0)) shouldBe
        java.lang.Double.doubleToLongBits(r.getDouble(1))
    }
  }

  test("DotProduct null inputs yield null; empty arrays yield 0.0") {
    val ss = spark
    import ss.implicits._
    val df = Seq(
      (Some(Array(1.0, 2.0)), Some(Array(3.0, 4.0))),
      (None: Option[Array[Double]], Some(Array(3.0, 4.0))),
      (Some(Array.empty[Double]), Some(Array.empty[Double])))
      .toDF("a", "b")
    val out = df.select(DotProduct(col("a"), col("b"))).collect()
    out(0).getDouble(0) shouldBe 11.0
    out(1).isNullAt(0) shouldBe true
    out(2).getDouble(0) shouldBe 0.0
  }

  test("DotProduct projects inside whole-stage codegen (not a fallback)") {
    val df = spark.range(100)
      .select(
        array(col("id").cast("double"), (col("id") + 1).cast("double")).as("a"),
        array(col("id").cast("double"), (col("id") * 2).cast("double")).as("b"))
      .select(DotProduct(col("a"), col("b")).as("d"))
    val plan = df.queryExecution.executedPlan.toString
    // `*(n)` prefixes mark operators fused into a WholeStageCodegen stage
    plan should include("*(1) Project")
    df.agg(sum(col("d"))).collect().head.getDouble(0) shouldBe
      (0 until 100).map(i => i.toDouble * i + (i + 1.0) * (i * 2.0)).sum
  }

  test("graft_dot resolves in SQL once registered") {
    val ss = spark
    GraftExtensions.register(ss)
    ss.sql("SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .collect().head.getDouble(0) shouldBe 11.0
  }

  // r16: the fused SignCode / QuantizeVec expressions must replay the
  // HOF column programs they replaced BIT-FOR-BIT — the sign-LSH oracle
  // gates inline the same arithmetic, so a single flipped bucket bit is
  // an oracle regression.
  private def legacyQuantize(vec: org.apache.spark.sql.Column) =
    transform(vec, x => round(x * 1024))

  private def legacySignCode(vec: org.apache.spark.sql.Column,
                             planes: Array[Array[Int]]) = {
    val qv = legacyQuantize(vec)
    planes.zipWithIndex.map { case (p, i) =>
      when(DotProduct(qv, typedLit(p.map(_.toDouble).toSeq)) >= 0,
        lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  test("SignCode equals the quantize+dot+when column program bit-for-bit " +
    "on random and adversarial half-boundary vectors") {
    val ss = spark
    import ss.implicits._
    val planes = graft.operators.Similarity.hyperplanes(8, 64, seed = 42L)
    val rng = new scala.util.Random(11)
    // adversarial rows: values whose x*1024 lands exactly on .5 decimal
    // boundaries, where HALF_UP vs any other rounding flips the grid
    val half = Array.tabulate(64)(i => (i - 32).toDouble / 2048.0)
    val rows = Seq.fill(500)(Array.fill(64)(rng.nextDouble() * 2 - 1)) :+
      half :+ Array.fill(64)(0.0) :+ Array.tabulate(64)(_ * 0.0009765625)
    val df = rows.toDF("v")
    val out = df.select(
      SignCode(col("v"), planes).as("fused"),
      legacySignCode(col("v"), planes).as("legacy")).collect()
    out.foreach(r => r.getLong(0) shouldBe r.getLong(1))
  }

  test("SignCode projects inside whole-stage codegen and null semantics " +
    "match the HOF pipeline") {
    val ss = spark
    import ss.implicits._
    val planes4 = graft.operators.Similarity.hyperplanes(4, 2, seed = 1L)
    val df = Seq(Some(Array(1.0, -2.0)), None).toDF("v")
    val out = df.select(SignCode(col("v"), planes4).as("c")).collect()
    out(0).isNullAt(0) shouldBe false
    out(1).isNullAt(0) shouldBe true // callers wrap the 0L degrade
    val plan = spark.range(100)
      .select(array(col("id").cast("double") / 7.0,
        col("id").cast("double") / 11.0).as("v"))
      .select(SignCode(col("v"), planes4).as("c"))
      .queryExecution.executedPlan.toString
    plan should include("*(1) Project")
  }
}
