package graft.core

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase
import graft.operators.Relational

/** The two shuffle-elimination levers the 100 TB plan depends on:
  * bucketed co-located joins (no exchange at all) and salted joins
  * (hot keys split across reducers, same results). */
class BucketingSpec extends SparkTestBase with Matchers {

  test("joining two same-bucketed tables plans no shuffle exchange") {
    val li = graft.core.Tables.lineitem(spark, sf0001)
      .select("l_orderkey", "l_linenumber", "l_quantity")
    val o = graft.core.Tables.orders(spark, sf0001)
      .select("o_orderkey", "o_totalprice")
    Bucketing.writeBucketed(li, "graft_li_bucketed", Seq("l_orderkey"), 4)
    Bucketing.writeBucketed(o, "graft_o_bucketed", Seq("o_orderkey"), 4)
    try {
      val joined = Bucketing.readTable(spark, "graft_li_bucketed")
        .join(Bucketing.readTable(spark, "graft_o_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      withClue(plan.linesIterator.take(20).mkString("\n")) {
        plan should not include "Exchange hashpartitioning"
      }
      // and it still computes the same result as the plain join
      joined.count() shouldBe li.join(o, col("l_orderkey") === col("o_orderkey")).count()
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_li_bucketed")
      spark.sql("DROP TABLE IF EXISTS graft_o_bucketed"): Unit
    }
  }

  test("IVF cells persisted as a partitioned layout prune to the probed cells only") {
    // The Similarity.ivfTopK scale claim: at 100 TB the cell assignment
    // is computed once and persisted partitioned BY CELL, so a probe
    // reads only its nprobe cells (partition pruning), never the corpus.
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-layout").toString
    val e = graft.core.Tables.embeddings(spark, sf0001)
      .withColumn("e", col("embedding").cast("array<double>"))
    // toy assignment: 8 cells by id hash — the layout mechanics are what
    // this test pins, not the quantizer
    e.withColumn("cell", pmod(xxhash64(col("vec_id")), lit(8L)))
      .write.partitionBy("cell").mode("overwrite").parquet(dir)
    val probed = spark.read.parquet(dir).filter(col("cell").isin(1L, 3L))
    val scan = probed.queryExecution.executedPlan.toString
    // partition filter reaches the scan: only 2 of 8 cell directories read
    withClue(scan) {
      scan should include("PartitionFilters")
      scan should include regex "cell.* IN \\(1,3\\)|cell#\\d+L? IN"
    }
    val expected = e.withColumn("cell", pmod(xxhash64(col("vec_id")), lit(8L)))
      .filter(col("cell").isin(1L, 3L)).count()
    probed.count() shouldBe expected
    expected should be > 0L
  }

  test("saltedJoin equals the plain join on a skewed key distribution") {
    val ss = spark
    import ss.implicits._
    // one hot key (0) carrying most rows + a long tail
    val skewed = ((1 to 500).map(i => (0L, i.toLong)) ++
      (1 to 100).map(i => (i.toLong % 7 + 1, i.toLong)))
      .toDF("k", "v")
    val dim = (0L to 7L).map(k => (k, s"dim$k")).toDF("k", "name")
    val plain = skewed.join(dim, Seq("k"))
      .select("k", "v", "name")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted
    val salted = Relational.saltedJoin(skewed, dim, Seq("k"), saltFactor = 8)
      .select("k", "v", "name")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted
    salted should contain theSameElementsInOrderAs plain
    salted.length shouldBe 600
  }
}
