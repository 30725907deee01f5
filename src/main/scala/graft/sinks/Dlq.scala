package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Dead-letter-queue wrapper — the reference's error-tolerance surface
 * (ST3: `errors.tolerance`, `errors.retry.*`, README.md:280-284) as a
 * row-routing operator plus a batch-level guard.
 *
 * Row-level: `route` splits a batch on a badness predicate; bad rows are
 * quarantined to a parquet dir with error metadata (`__error`,
 * `__epoch`) and the clean remainder continues to the real sink. This
 * is `errors.tolerance = all` + DLQ topic. `tolerance = none` (the
 * reference default) is the caller simply not wrapping — fail fast is
 * Structured Streaming's native behavior.
 *
 * The quarantine write happens BEFORE the downstream sink runs, so a
 * downstream failure can only cause duplicate DLQ entries on retry
 * (at-least-once), never lost error rows.
 */
object Dlq {

  /** Split `batch` on `isBad`; quarantine the bad rows (with the epoch
    * and a caller-supplied reason column) and return the good rows. */
  def route(batch: DataFrame, isBad: Column, reason: Column,
            quarantineDir: String, epochId: Long): DataFrame = {
    val bad = batch.filter(isBad)
      .withColumn("__error", reason)
      .withColumn("__epoch", lit(epochId))
    // cheap guard: only write when something is actually bad
    if (!bad.isEmpty) {
      bad.write.mode("append").parquet(quarantineDir)
    }
    batch.filter(!coalesce(isBad, lit(false)))
  }

  /** foreachBatch combinator: route rows failing `isBad` to the DLQ,
    * then hand the clean rows to `sink`. */
  def withDlq(isBad: Column, reason: Column, quarantineDir: String)(
      sink: (DataFrame, Long) => Unit): (DataFrame, Long) => Unit =
    (batch, epochId) =>
      sink(route(batch, isBad, reason, quarantineDir, epochId), epochId)
}
