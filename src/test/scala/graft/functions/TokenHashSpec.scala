package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

/** The native codegen'd token hash must equal the higher-order-function
  * formulation it replaced, term for term — the same recurrence the
  * DuckDB oracle map replays per token. */
class TokenHashSpec extends SparkTestBase with Matchers {

  /** The original Column formulation: split to chars, codepoint each,
    * fold h·31 + cp mod 2³¹−1. Kept as the reference implementation. */
  private def lambdaHash(token: org.apache.spark.sql.Column) =
    aggregate(
      transform(filter(split(token, ""), c => c =!= ""),
        c => ascii(c).cast("long")),
      lit(0L), (a, c) => (a * 31 + c) % 2147483647L)

  test("TokenHash equals the HOF formulation on corpus tokens and BMP unicode") {
    val ss = spark
    import ss.implicits._
    val tokens = (Seq("", "a", "table", "spark", "window", "merge",
      "2147483647", "café", "中文", "a b", "x" * 300) ++
      (1 to 500).map(i => s"tok$i")).toDF("t")
    val out = tokens.select(
      TokenHash(col("t")).as("native"), lambdaHash(col("t")).as("ref")).collect()
    out.foreach { r => r.getLong(0) shouldBe r.getLong(1) }
  }

  test("parameterized basis equals the Dedup HOF formulation (djb2 5381/33/1e9+7)") {
    val ss = spark
    import ss.implicits._
    def lambda33(token: org.apache.spark.sql.Column) =
      aggregate(
        transform(filter(split(token, ""), c => c =!= ""),
          c => ascii(c).cast("long")),
        lit(5381L), (a, c) => (a * 33 + c) % 1000000007L)
    val tokens = (Seq("", "spark", "café", "中文") ++
      (1 to 300).map(i => s"w$i")).toDF("t")
    val out = tokens.select(
      TokenHash(col("t"), 5381L, 33L, 1000000007L).as("native"),
      lambda33(col("t")).as("ref")).collect()
    out.foreach { r => r.getLong(0) shouldBe r.getLong(1) }
  }

  test("TokenHash nulls propagate; hand values pin the recurrence") {
    val ss = spark
    import ss.implicits._
    val df = Seq(Option("ab"), None).toDF("t")
      .select(TokenHash(col("t")).as("h")).collect()
    // "ab": (0·31 + 97)·31 + 98 = 3105
    df(0).getLong(0) shouldBe 3105L
    df(1).isNullAt(0) shouldBe true
  }

  test("TokenHash projects inside whole-stage codegen (not a fallback)") {
    val df = spark.range(100)
      .select(concat(lit("tok"), col("id")).as("t"))
      .select(TokenHash(col("t")).as("h"))
    // `*(n)` prefixes mark operators fused into a WholeStageCodegen stage
    df.queryExecution.executedPlan.toString should include("*(1) Project")
    df.count() shouldBe 100L
  }

  test("graft_token_hash resolves in SQL once registered") {
    GraftExtensions.register(spark)
    spark.sql("SELECT graft_token_hash('ab') AS h").collect()
      .head.getLong(0) shouldBe 3105L
  }
}
