package graft.obs

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

/** The StreamingQueryListener → metrics-table feed (§2.9), queried with
  * the same sum-by/rate shapes the reference's Grafana panels use. */
class MetricsFeedSpec extends SparkTestBase with Matchers {

  test("Relabel maps raw JMX-ish names to renamed series with extracted labels") {
    val ss = spark
    import ss.implicits._
    val raw = Seq(
      "kafka.connect<type=connect-worker-metrics, connector=jdbc-src>",
      "kafka.connect<type=connect-worker-metrics, connector=debezium>",
      "unrelated_metric_name").toDF("raw")
    val out = Relabel.relabel(raw, "raw",
        pattern = "kafka\\.connect<type=connect-worker-metrics, connector=(.+)>",
        nameTemplate = "kafka_connect_worker_connector_metrics",
        labels = Map("connector" -> 1))
      .select("name", "connector")
      .collect().map(r => (r.getString(0), r.getString(1))).sortBy(_.toString)
    out should contain ("kafka_connect_worker_connector_metrics" -> "jdbc-src")
    out should contain ("kafka_connect_worker_connector_metrics" -> "debezium")
    out should contain ("unrelated_metric_name" -> "")
  }

  test("MetricsFeed captures per-batch progress as queryable metric rows") {
    val ss = spark
    import ss.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val feed = new MetricsFeed
    spark.streams.addListener(feed)
    val input = MemoryStream[Long]
    val query = input.toDF().writeStream
      .format("memory").queryName("metrics_probe")
      .option("checkpointLocation", Files.createTempDirectory("graft-obs").toString)
      .outputMode("append")
      .start()
    try {
      input.addData(1L to 100L)
      query.processAllAvailable()
      input.addData(101L to 250L)
      query.processAllAvailable()
      // listener events are delivered asynchronously; wait for both
      // batches' num_input_rows samples to land
      val deadline = System.nanoTime() + 30e9.toLong
      def landed(): Boolean = feed.toDF(spark)
        .filter(col("name") === "num_input_rows")
        .filter(col("query") === "metrics_probe")
        .count() >= 2
      while (!landed() && System.nanoTime() < deadline) Thread.sleep(100)
      landed() shouldBe true
    } finally {
      query.stop()
      spark.streams.removeListener(feed)
    }

    val metrics = feed.toDF(spark)
    // sum-by panel over the feed (connect.json:467 shape)
    val total = metrics
      .filter(col("name") === "num_input_rows" && col("query") === "metrics_probe")
      .agg(sum("value")).head().getDouble(0)
    total shouldBe 250.0
    // every sample row is (name, query, batch_id, value)-shaped
    metrics.columns shouldBe Array("name", "query", "batch_id", "value")
  }
}
