package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Canonical loaders for the driver-generated testdata tables
 * (`/root/testdata/sf*`; schemas in repo:FIXTURES.md §A).
 *
 * All loaders return the table with its documented schema. The only
 * normalization applied is on `events.ts`: the parquet file stores
 * TIMESTAMP(NANOS), which Spark cannot read natively
 * (PARQUET_TYPE_ILLEGAL). We read nanos as a long
 * (`spark.sql.legacy.parquet.nanosAsLong`) and truncate to microseconds
 * with integer division — byte-identical to what DuckDB produces when it
 * reads the same file (its TIMESTAMP is µs and the ns payload is
 * truncated, not rounded), so oracle comparisons stay exact.
 */
object Tables {
  private def path(dir: String, name: String) = s"$dir/$name.parquet"

  private def read(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(path(dir, name))

  /** Fan an under-split input out to the session's parallelism. The
    * driver's fixtures are single-row-group parquet files — Spark's
    * byte-range splitting can never yield more than one non-empty scan
    * task for them, so a pre-shuffle pipeline runs on ONE core. One
    * round-robin pass fixes that — worth it ONLY in front of operators
    * whose per-row work dwarfs an exchange (byte-shingling, regex
    * parsing); a blanket fan-out measurably SLOWS the cheap scan-agg
    * queries (extra exchange ≫ saved compute). At production scale
    * inputs have many splits, `getNumPartitions >= target` holds, and
    * this is a no-op. Catalyst still pushes filters and pruning through
    * the Repartition node into the scan. */
  def fanOut(df: DataFrame): DataFrame = {
    if (df.isStreaming) return df // micro-batch planning owns parallelism
    val target = df.sparkSession.sparkContext.defaultParallelism
    // File count, not df.rdd.getNumPartitions: building the RDD under AQE
    // eagerly materializes upstream shuffle stages for non-leaf inputs.
    // Non-file inputs (local relations, post-shuffle frames) report no
    // files and pass through untouched — they are already parallel.
    val files = df.inputFiles
    if (files.isEmpty || files.length >= target) return df
    // Fanning out is a SMALL-INPUT remedy: a few large files are better
    // served by byte-range splits than by shipping every row through a
    // round-robin exchange. Unknown schemes / unstattable files count as
    // large (conservative pass-through).
    val maxFanOutBytes = 1L << 30
    val totalBytes = files.map { uri =>
      try {
        if (uri.startsWith("file:")) new java.io.File(new java.net.URI(uri)).length()
        else maxFanOutBytes
      } catch { case _: Exception => maxFanOutBytes }
    }.sum
    if (totalBytes < maxFanOutBytes) df.repartition(target) else df
  }

  def region(spark: SparkSession, dir: String): DataFrame   = read(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame   = read(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame     = read(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame   = read(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "lineitem")
  def documents(spark: SparkSession, dir: String): DataFrame  = read(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "embeddings")

  /** `events` with `ts` as a µs-precision TIMESTAMP_NTZ (see class doc).
    *
    * NTZ matters for oracle parity: Spark writes TimestampType parquet with
    * isAdjustedToUTC=true, which DuckDB reads back as TIMESTAMPTZ and renders
    * with a zone suffix; TimestampNTZType round-trips as a naive timestamp,
    * exactly like the source data. The nanosAsLong conf is scoped: saved and
    * restored so other parquet reads in the session keep strict semantics.
    */
  /** Guards the process-global nanosAsLong toggle below: two threads
    * loading tables concurrently must not interleave set/restore. */
  private val nanosConfLock = new Object

  def events(spark: SparkSession, dir: String): DataFrame = nanosConfLock.synchronized {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "true")
    try {
      // The fixture's physical ts type has varied across driver rounds:
      // timestamp[ns] (read as long under nanosAsLong, truncated to µs
      // here) vs native timestamp[us] NTZ (read directly). Branch on the
      // type actually read so both generations load identically.
      val raw = read(spark, dir, "events")
      val tsNorm = raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          // timestampadd over an NTZ literal is pure calendar arithmetic —
          // no session-timezone dependence (timestamp_micros(..).cast(ntz)
          // would silently shift under a non-UTC session zone).
          expr("timestampadd(MICROSECOND, ts div 1000, TIMESTAMP_NTZ '1970-01-01 00:00:00')")
        case org.apache.spark.sql.types.TimestampNTZType => col("ts")
        case other =>
          // A bare NTZ cast of a tz-bearing TimestampType would shift
          // under a non-UTC session zone — fail loudly instead so a new
          // fixture generation gets an explicit branch, not silent skew.
          throw new IllegalStateException(
            s"events.ts has unexpected parquet type $other; " +
              "add an explicit timezone-safe branch in Tables.events")
      }
      raw.withColumn("ts", tsNorm)
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None    => spark.conf.unset(key)
      }
    }
  }
}
