package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * One-pass table profiling — the ANALYZE-shaped report every ingest job
 * runs before training-set assembly (and the reference's operators rely
 * on the warehouse for: row counts, null rates, cardinalities feeding
 * connector sizing and partition decisions).
 *
 * `numeric` profiles a set of numeric columns in ONE scan: per column
 * the row count, null count, exact distinct count, min/max, and an
 * order-independent exact sum/mean (decimal accumulation, so the
 * result does not depend on partitioning or merge order — the same
 * decimal-sum determinism trick the aggregate queries use).
 *
 * Scale shape: the melt is a narrow explode in the scan projection —
 * rows × |cols| (name, value) pairs, never whole rows — and the single
 * shuffle is a |cols|-key hash aggregation with map-side partials, so
 * profiling N columns costs one pass over the data regardless of N.
 * Exact ndv keeps the two-phase distinct expansion (value-compressed
 * before the exchange); at 100 TB swap `countDistinct` for
 * `approx_count_distinct` — a one-line trade of exactness for a
 * constant-size HLL sketch per column.
 */
object Profile {

  /** One row per profiled column: `col_name, n_rows, n_null,
    * n_distinct, vmin, vmax, vsum, vmean` (sum/mean decimal-exact,
    * rounded to 4/6 places). */
  def numeric(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "Profile.numeric: need at least one column")
    val melted = df
      .select(explode(array(cols.map(c =>
        struct(lit(c).as("col_name"), col(c).cast("double").as("v"))): _*))
        .as("m"))
      .select(col("m.col_name").as("col_name"), col("m.v").as("v"))
    melted.groupBy("col_name")
      .agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("v").isNull, 1L).otherwise(0L)).as("n_null"),
        countDistinct(col("v")).as("n_distinct"),
        min(col("v")).as("vmin"),
        max(col("v")).as("vmax"),
        round(sum(col("v").cast("decimal(38,6)")).cast("double"), 4)
          .as("vsum"),
        round(sum(col("v").cast("decimal(38,6)")).cast("double") /
          count(col("v")), 6).as("vmean"))
  }
}
