package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

/** The fused BLEU gram builder must replay the nested
  * transform/flatten/when column program it replaced BIT-FOR-BIT —
  * the BLEU gates aggregate these gram hashes, so one divergent fold
  * is an oracle regression. */
class BleuGramsSpec extends SparkTestBase with Matchers {

  private def toks(textCol: String) =
    filter(split(lower(trim(col(textCol))), " "), t => t =!= "")

  /** The pre-r16 column program, verbatim. */
  private def legacyGrams(textCol: String) = {
    val P = lit(2147483647L)
    val thc = transform(toks(textCol), t =>
      graft.operators.TextMetrics.tokenHash(t))
    def stepped(i: org.apache.spark.sql.Column,
                n: org.apache.spark.sql.Column) = {
      def h(k: Int) = element_at(thc, (i + (k - 1)).cast("int"))
      val g2 = pmod(h(1) * 31L + h(2), P)
      val g3 = pmod(g2 * 31L + h(3), P)
      val g4 = pmod(g3 * 31L + h(4), P)
      when(n === 1, h(1)).when(n === 2, g2).when(n === 3, g3)
        .otherwise(g4)
    }
    flatten(transform(sequence(lit(1), lit(4)), n =>
      transform(
        when(size(thc) >= n, sequence(lit(1), size(thc) - n + 1))
          .otherwise(array().cast("array<int>")),
        i => struct(n.as("n"), stepped(i, n).as("gh")))))
  }

  test("BleuGrams equals the legacy gram program row for row on the " +
    "corpus fixture and edge-shaped docs") {
    val ss = spark
    import ss.implicits._
    val edge = Seq("", " ", "one", "a b", "a b c", "a b c d",
      "x x x x x x", "  padded   spaces  ", "Tab\tinside token")
      .toDF("text")
    val real = graft.core.Tables.documents(spark, sf0001)
      .select(col("text"))
    val df = edge.unionByName(real)
    val out = df.select(
      BleuGrams(toks("text")).as("fused"),
      legacyGrams("text").as("legacy")).collect()
    out.foreach { r =>
      val a = r.getSeq[org.apache.spark.sql.Row](0)
      val b = r.getSeq[org.apache.spark.sql.Row](1)
      a.length shouldBe b.length
      a.zip(b).foreach { case (x, y) =>
        x.getInt(0) shouldBe y.getInt(0)
        x.getLong(1) shouldBe y.getLong(1)
      }
    }
    out.map(_.getSeq[org.apache.spark.sql.Row](0).length).sum should be > 0
  }
}
