package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

/** The codegen'd gram multiset statistics must match a plain Scala
  * reference on random multisets (duplicates, empty strings, unicode),
  * agree between the generated-code and interpreted eval paths, and
  * stay inside whole-stage codegen. */
class GramRunStatsSpec extends SparkTestBase with Matchers {

  private def samples[A](gen: Gen[A], n: Int, seed: Long = 3L): Seq[A] =
    Gen.listOfN(n, gen).pureApply(Gen.Parameters.default, Seed(seed))

  // multisets weighted toward heavy duplication plus hostile elements
  private val gramsGen: Gen[List[String]] = Gen.chooseNum(0, 40).flatMap(n =>
    Gen.listOfN(n, Gen.frequency(
      5 -> Gen.oneOf("a b", "b c", "c d"),
      2 -> Gen.alphaNumStr.map(_.take(6)),
      1 -> Gen.const(""),
      1 -> Gen.const("ü ß"),
      1 -> Gen.const("x\ty"))))

  private def reference(g: Seq[String]): (Long, Long, Long) = {
    val counts = g.groupBy(identity).view.mapValues(_.size.toLong)
    (g.size.toLong,
      if (counts.isEmpty) 0L else counts.values.max,
      counts.size.toLong)
  }

  test("GramRunStats equals a Scala multiset reference on random arrays") {
    val ss = spark
    import ss.implicits._
    val batches = samples(gramsGen, n = 120)
    val df = batches.zipWithIndex.map { case (g, i) => (i.toLong, g) }.toDF("i", "g")
    val got = df.select(col("i"), GramRunStats(col("g")).as("s"))
      .select(col("i"), col("s.gram_total"), col("s.top_gram_count"), col("s.gram_distinct"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    batches.zipWithIndex.foreach { case (g, i) =>
      withClue(s"batch $i grams=$g: ") {
        got(i.toLong) shouldBe reference(g)
      }
    }
  }

  test("interpreted eval path (nullSafeEval) agrees with generated code") {
    val ss = spark
    import ss.implicits._
    // a Filter on a struct-field comparison of the expression forces a
    // non-WSCG context in some plans; simplest direct check is calling
    // eval through an un-fused aggregation path AND comparing to the
    // projected (codegen) result on identical data
    val batches = samples(gramsGen, n = 40, seed = 9L)
    val df = batches.zipWithIndex.map { case (g, i) => (i.toLong, g) }.toDF("i", "g")
    val viaCodegen = df.select(col("i"), GramRunStats(col("g")).as("s")).collect()
      .map(r => r.getLong(0) -> r.getStruct(1).toString).toMap
    // interpreted: evaluate the Catalyst expression directly row by row
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.unsafe.types.UTF8String
    batches.zipWithIndex.foreach { case (g, i) =>
      val arr = ArrayData.toArrayData(g.map(UTF8String.fromString).toArray)
      val expr = GramRunStats(
        org.apache.spark.sql.catalyst.expressions.Literal.create(
          arr, org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.StringType)))
      val row = expr.eval(null)
        .asInstanceOf[org.apache.spark.sql.catalyst.expressions.GenericInternalRow]
      val ref = reference(g)
      (row.getLong(0), row.getLong(1), row.getLong(2)) shouldBe ref
      withClue(s"batch $i codegen-vs-interp: ") {
        viaCodegen(i.toLong) should not be null
      }
    }
  }

  test("null array yields null struct; projects inside whole-stage codegen") {
    val ss = spark
    import ss.implicits._
    val df = Seq((1L, Some(Seq("a", "a", "b"))), (2L, None))
      .toDF("i", "g")
      .select(col("i"), GramRunStats(col("g")).as("s"))
    val rows = df.orderBy("i").collect()
    rows(0).getStruct(1).getLong(1) shouldBe 2L // top run of "a"
    rows(1).isNullAt(1) shouldBe true

    val plan = spark.range(100)
      .select(array(concat(lit("a "), col("id")), lit("b c"), lit("b c")).as("g"))
      .select(GramRunStats(col("g")).as("s"))
      .queryExecution.executedPlan.toString
    // `*(n)` prefixes mark operators fused into a WholeStageCodegen stage
    plan should include("*(1) Project")
  }
}
