package graft
// Scratch profiling harness (not part of the library surface): times the
// stages of whichever query is currently under the microscope.
//
// Resident finding (r9): a higher-order-function lambda re-evaluates any
// NON-ATTRIBUTE operand it references PER ELEMENT — Catalyst's
// subexpression elimination does not cross LambdaFunction scopes, and
// CollapseProject does not substitute aliases into lambda bodies (shape B
// below stays materialized in the optimized plan). So shingling over an
// inline `split(...)` is O(words²) re-splits; over a projected `__ws`
// attribute it is O(words). Measured here: q113 10.5 s → 0.6 s at sf0.1.
// Every shingle/chunk/span/bigram operator now projects its token array
// first — the "wordShinglesOf perf contract".
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.Dedup

object Probe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local(32, "probe")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-52s ${(System.nanoTime() - t0) / 1e9}%8.2fs  rows=$n")
    }
    val d = Tables.documents(spark, dir)
    d.count() // warm

    val n = 3
    def windowsOf(w: org.apache.spark.sql.Column) = transform(
      sequence(lit(0), greatest(size(w) - n, lit(-1))),
      i => concat_ws(" ", (0 until n).map(k => element_at(w, i + k + 1)): _*))

    time("A inline split in lambda") {
      val w = split(Dedup.normText(col("text")), " ")
      d.select(size(windowsOf(w)).as("k")).agg(sum(col("k"))).count()
    }
    time("B select-materialized attribute") {
      d.select(split(Dedup.normText(col("text")), " ").as("__ws"))
        .select(size(windowsOf(col("__ws"))).as("k"))
        .agg(sum(col("k"))).count()
    }
    time("q113 full (materialized + window first-occurrence)") {
      Queries.all("q113_ngram_novelty")(spark, dir).count()
    }
    spark.stop()
  }
}
