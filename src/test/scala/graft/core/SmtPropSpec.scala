package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

/**
 * Property tests for the SMT catalog's structural laws, over generated
 * row batches (fixed-seed scalacheck samples, the RelationalSpec /
 * JdbcDialectPropSpec pattern — no scalatestplus bridge offline):
 *
 *  - hoist_field then extract_field is the identity (schema AND rows);
 *  - flatten after hoist_field is exactly a prefix-rename — same row
 *    count, same values, delimiter-joined names;
 *  - a 'when'-gated schema-preserving transform equals filter-split
 *    union semantics: gated rows transformed, rest untouched;
 *  - regex_router only ever rewrites whole-value matches (a value
 *    without a full match survives verbatim, whatever the pattern).
 */
class SmtPropSpec extends SparkTestBase with Matchers {
  import spark.implicits._

  private def samples[A](gen: Gen[A], n: Int, seed: Long): Seq[A] =
    Gen.listOfN(n, gen).pureApply(Gen.Parameters.default, Seed(seed))

  private val rowGen: Gen[(Long, String, Double)] = for {
    id <- Gen.chooseNum(-1000L, 1000L)
    s <- Gen.frequency(
      5 -> Gen.alphaNumStr.map(_.take(12)),
      1 -> Gen.const(""),
      1 -> Gen.const("db.users"),
      1 -> Gen.const("a b\tc"),
      1 -> Gen.const("${file:x:y}"))
    d <- Gen.chooseNum(-100.0, 100.0)
  } yield (id, s, d)

  private def df(seed: Long): DataFrame =
    samples(rowGen, 40, seed).toDF("id", "s", "d")

  private def t(ty: String, opts: (String, String)*): StageSpec =
    StageSpec(ty, opts.toMap)

  test("hoist_field ∘ extract_field is the identity on schema and rows") {
    (1L to 5L).foreach { seed =>
      val in = df(seed)
      val back = Pipeline.applyTransform(
        Pipeline.applyTransform(in, t("hoist_field", "field" -> "rec")),
        t("extract_field", "field" -> "rec"))
      back.schema shouldBe in.schema
      back.orderBy("id", "s", "d").collect() shouldBe
        in.orderBy("id", "s", "d").collect()
    }
  }

  test("flatten after hoist_field is a pure prefix-rename") {
    (10L to 13L).foreach { seed =>
      val in = df(seed)
      val flat = Pipeline.applyTransform(
        Pipeline.applyTransform(in, t("hoist_field", "field" -> "rec")),
        t("flatten", "delimiter" -> "_"))
      flat.columns shouldBe in.columns.map("rec_" + _)
      flat.orderBy("rec_id", "rec_s", "rec_d").collect().map(_.toSeq) shouldBe
        in.orderBy("id", "s", "d").collect().map(_.toSeq)
    }
  }

  test("'when'-gated mask equals the filter-split reference semantics") {
    (20L to 24L).foreach { seed =>
      val in = df(seed)
      val pred = "id % 3 = 0"
      val gated = Pipeline.applyTransform(in,
        t("mask", "field" -> "s", "when" -> pred))
      val reference = Pipeline.applyTransform(in.filter(expr(pred)), t("mask", "field" -> "s"))
        .unionByName(in.filter(!(expr(pred) <=> lit(true))))
      gated.orderBy("id", "s", "d").collect() shouldBe
        reference.orderBy("id", "s", "d").collect()
      // cardinality is always preserved by a gated value transform
      gated.count() shouldBe in.count()
    }
  }

  test("regex_router never rewrites a value lacking a whole-value match") {
    val patterns = Seq("db\\.(.*)", "[0-9]+", "(a|b)+")
    patterns.foreach { re =>
      (30L to 32L).foreach { seed =>
        val in = df(seed).select(col("s").as("topic"))
        val routed = Pipeline.applyTransform(in,
          t("regex_router", "regex" -> re, "replacement" -> "X"))
        val survivors = in.filter(!col("topic").rlike("^(?:" + re + ")$"))
        // every non-matching input row survives verbatim, with its
        // multiplicity (multiset containment — generated batches repeat)
        survivors.exceptAll(routed).count() shouldBe 0L
        routed.count() shouldBe in.count()
      }
    }
  }
}
