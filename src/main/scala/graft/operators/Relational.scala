package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Record-level and relational operators re-expressing the reference's
 * transform/materialization surface (SURVEY.md §2.2, §2.4, §2.5) as pure
 * Catalyst column programs — no UDFs, so predicate pushdown, column
 * pruning and whole-stage codegen all apply.
 */
object Relational {

  /**
   * PII mask: replace a column with a constant.
   * Reference: `MaskField$Value` SMT replacing `private_info` with
   * "CENSORED" (reference README.md:104-107).
   * A constant projection — Catalyst constant-folds it; at 100 TB this
   * costs nothing beyond the write.
   */
  def maskColumn(df: DataFrame, column: String, replacement: String = "CENSORED"): DataFrame =
    df.withColumn(column, lit(replacement))

  /**
   * Latest-state materialization of a changelog: keep, per key, the row
   * that is last in `ordering`. This is the table-level semantics of the
   * reference's `ExtractNewRecordState` unwrap + compacted topic
   * (postgres/connector.json:11-14): the per-key newest row wins.
   *
   * Implemented as a ranking window (one shuffle on the key). At scale,
   * per-key state is one row — no skew concerns beyond what AQE handles.
   */
  def latestStatePerKey(df: DataFrame, keys: Seq[String], ordering: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ordering.map(_.desc): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Per-group top-k by `ordering` (ascending): ranking window + filter. */
  def topKPerGroup(df: DataFrame, keys: Seq[String], ordering: Seq[Column], k: Int): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ordering: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /**
   * Per-series delta of consecutive samples — the batch form of PromQL
   * `rate(x[1m])` that the reference's Grafana panels compute
   * (grafana/dashboards/connect.json:1722,1825). `delta = v - lag(v)`
   * over (series, order). Divide by the time delta for a true rate.
   */
  def lagDelta(df: DataFrame, series: Seq[String], ordering: Seq[Column],
               valueCol: String, out: String = "delta"): DataFrame = {
    val w = Window.partitionBy(series.map(col): _*).orderBy(ordering: _*)
    df.withColumn(out, col(valueCol) - lag(col(valueCol), 1).over(w))
  }

  /**
   * Scalable interval × point join (range/theta join): joins `points`
   * rows to `intervals` rows where `pointCol ∈ [lo, hi]`, without a
   * cartesian product.
   *
   * Spark plans a raw range predicate as BroadcastNestedLoopJoin —
   * O(|P|·|I|) comparisons, hopeless at 100 TB. Instead we discretize the
   * point domain into fixed-width buckets: each point lands in one
   * bucket, each interval explodes to the (widened by one, to stay safe
   * under the caller's exact floating-point predicate) bucket range it
   * covers, and a shuffled equi-join on the bucket id pairs up only
   * co-located candidates. The caller's exact predicate is re-applied as
   * the residual filter, so bucketing never changes semantics — it only
   * prunes pairs. Cost: O(Σ interval_width / W) exploded rows and a hash
   * join, both linear-ish and shuffle-partitionable.
   *
   * @param residual the exact join predicate evaluated on candidate pairs
   */
  def intervalPointJoin(points: DataFrame, pointCol: Column,
                        intervals: DataFrame, lo: Column, hi: Column,
                        residual: Column, bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val pb = points.withColumn("__bucket", floor(pointCol / bucketWidth).cast("long"))
    val ib = intervals
      .withColumn("__blo", floor(lo / bucketWidth).cast("long") - 1)
      .withColumn("__bhi", floor(hi / bucketWidth).cast("long") + 1)
      .withColumn("__bucket", explode(sequence(col("__blo"), col("__bhi"))))
      .drop("__blo", "__bhi")
    pb.join(ib, Seq("__bucket"))
      .where(residual)
      .drop("__bucket")
  }
}
