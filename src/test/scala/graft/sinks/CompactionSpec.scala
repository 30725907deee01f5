package graft.sinks

import java.nio.file.Files

import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

/** Small-files compaction: fewer files, identical rows, atomic pointer
  * swap, stale snapshot reclaimed. */
class CompactionSpec extends SparkTestBase with Matchers {

  test("compact collapses a many-small-files directory; rows and content survive") {
    val ss = spark
    import ss.implicits._
    val src = Files.createTempDirectory("graft-compact-src").toString
    val root = Files.createTempDirectory("graft-compact-root").toString

    // a streaming-sink-shaped mess: 40 tiny files
    (1L to 2000L).map(i => (i, s"row$i")).toDF("id", "payload")
      .repartition(40).write.mode("overwrite").parquet(src)
    spark.read.parquet(src).inputFiles.length shouldBe 40

    // before any compaction, read() falls back to the source
    Compaction.read(spark, src, root).count() shouldBe 2000

    val n1 = Compaction.compact(spark, src, root, targetFileBytes = 1L << 30)
    n1 shouldBe 1
    val v0 = Compaction.currentSnapshot(root).get
    v0 should endWith("v0")
    val compacted = Compaction.read(spark, src, root)
    compacted.inputFiles.length shouldBe 1
    compacted.count() shouldBe 2000
    compacted.agg(org.apache.spark.sql.functions.sum("id")).head.getLong(0) shouldBe
      (2000L * 2001L) / 2

    // recompaction swaps the pointer and reclaims the old snapshot
    val n2 = Compaction.compact(spark, src, root, targetFileBytes = 1L << 30)
    n2 shouldBe 1
    Compaction.currentSnapshot(root).get should endWith("v1")
    Files.exists(java.nio.file.Paths.get(v0)) shouldBe false
    Compaction.read(spark, src, root).count() shouldBe 2000
  }

  test("compact splits output by the byte target") {
    val ss = spark
    import ss.implicits._
    val src = Files.createTempDirectory("graft-compact-src2").toString
    val root = Files.createTempDirectory("graft-compact-root2").toString
    (1L to 50000L).map(i => (i, s"payload-$i")).toDF("id", "payload")
      .repartition(20).write.mode("overwrite").parquet(src)
    val total = spark.read.parquet(src).inputFiles
      .map(u => new java.io.File(new java.net.URI(u)).length()).sum
    // target = ~half the data → expect 2 output files
    val n = Compaction.compact(spark, src, root, targetFileBytes = total / 2 + 1)
    n shouldBe 2
    Compaction.read(spark, src, root).inputFiles.length shouldBe 2
    Compaction.read(spark, src, root).count() shouldBe 50000
  }

  test("clusterBy compaction yields disjoint per-file key ranges") {
    import org.apache.spark.sql.functions._
    val ss = spark
    import ss.implicits._
    val src = Files.createTempDirectory("graft-compact-src3").toString
    val root = Files.createTempDirectory("graft-compact-root3").toString
    // shuffled key order across many small files: every file initially
    // spans nearly the whole key domain
    (1L to 20000L).map(i => ((i * 48271L) % 20011L, s"p-$i")).toDF("k", "payload")
      .repartition(16).write.mode("overwrite").parquet(src)
    val n = Compaction.compact(spark, src, root,
      targetFileBytes = 1L << 14, clusterBy = Seq("k"))
    n should be > 1
    val got = Compaction.read(spark, src, root)
    got.count() shouldBe 20000
    // per-file [min, max] intervals must not interleave — the layout
    // precondition for footer-stats pruning of key-slice predicates
    val ranges = got
      .groupBy(input_file_name().as("f"))
      .agg(min("k").as("lo"), max("k").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    ranges.length shouldBe n
    for (Array((_, hi1), (lo2, _)) <- ranges.sliding(2))
      assert(hi1 <= lo2, s"file ranges interleave: $ranges")
  }
}
