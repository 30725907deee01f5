package graft
// Scratch profiling harness (not part of the library surface): times the
// stages of the pair-generation queries to locate bottlenecks.
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.{Dedup, Similarity}

object Probe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local(32, "probe")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-40s ${(System.nanoTime() - t0) / 1e9}%8.2fs  rows=$n")
    }
    val d = Tables.documents(spark, dir)
    d.count() // warm

    time("shingleHashRows") {
      Dedup.shingleHashRows(d, "doc_id", "text", 3).count()
    }
    time("full nearDupPairs") {
      Dedup.nearDupPairs(d, "doc_id", "text", 0.8).count()
    }
    time("simhashCodes") {
      Dedup.simhashCodes(d, "doc_id", "text").count()
    }
    time("full simhashNearDupPairs") {
      Dedup.simhashNearDupPairs(d, "doc_id", "text", 3).count()
    }
    time("portableSimhashCodes") {
      Dedup.portableSimhashCodes(d, "doc_id", "text").count()
    }
    time("full portableSimhashNearDupPairs (q36)") {
      Dedup.portableSimhashNearDupPairs(d, "doc_id", "text", 3).count()
    }
    val emb = Tables.embeddings(spark, dir)
      .withColumn("e", col("embedding").cast("array<double>"))
    val planes = Similarity.hyperplanes(8, 64, 42L)
    time("signCode only") {
      emb.select(Similarity.signCode(col("e"), planes).as("c"))
        .agg(sum(col("c"))).collect().head; emb.count()
    }
    time("full embeddingNearDupPairs") {
      Dedup.embeddingNearDupPairs(emb, "vec_id", "e", planes, 2, 0.3).count()
    }
    time("fingerprint q40") {
      Queries.q40(spark, dir).count()
    }
    time("q31 bounded knn (1st)") {
      Queries.q31(spark, dir).count()
    }
    time("q31 bounded knn (2nd)") {
      Queries.q31(spark, dir).count()
    }
    spark.stop()
  }
}
