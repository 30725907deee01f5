package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Bucketed-table helpers — the co-located-join layout (SURVEY §4,
 * "co-locate joins via bucketing"): two tables bucketed by the same key
 * into the same bucket count join WITHOUT a shuffle exchange, because
 * each bucket pair is already co-partitioned on disk. At 100 TB this
 * turns the fact⋈fact shuffle (the single most expensive stage of a
 * repeated join workload) into a bucket-local sort-merge.
 *
 * Spark only honors bucketing through the catalog (`saveAsTable`), not
 * path-based writes — hence the table-name API.
 */
object Bucketing {

  /** Persist `df` as a bucketed (and bucket-sorted — enables merge join
    * without an extra sort) catalog table. */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
                    buckets: Int): Unit = {
    require(bucketCols.nonEmpty && buckets > 0, "need bucket columns and a positive count")
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    // A previous JVM's managed-table directory is invisible to this
    // fresh in-memory catalog but still blocks CREATE — clear it.
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write
      .format("parquet")
      .mode("overwrite")
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .saveAsTable(table)
  }

  def readTable(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
