package graft.sinks

import org.apache.spark.sql.{Column, DataFrame, Observation}
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
 * downstream failure can never lose error rows; and because each epoch
 * overwrites its own `epoch=<id>` subdirectory, a replayed epoch
 * rewrites the same quarantine rows instead of appending duplicates —
 * DLQ delivery is idempotent per epoch.
 */
object Dlq {

  /** Split `batch` on `isBad`; quarantine the bad rows (with the epoch
    * and a caller-supplied reason column) and return the good rows.
    *
    * Single-pass: the bad-row filter is evaluated ONCE, by the write
    * job itself. The row count rides that job as an `Observation`
    * metric (no separate probe scan — the old `isEmpty` guard was a
    * second evaluation of the filter on every batch), and when the
    * batch turns out clean the just-written empty `epoch=` directory is
    * dropped driver-side, so clean epochs leave no empty-file litter
    * behind. Partition-style epoch dirs also bound the cleanup to O(1):
    * no listing of the (possibly huge) quarantine root. */
  def route(batch: DataFrame, isBad: Column, reason: Column,
            quarantineDir: String, epochId: Long): DataFrame = {
    val bad = batch.filter(isBad)
      .withColumn("__error", reason)
      .withColumn("__epoch", lit(epochId))
    val obs = Observation()
    val epochDir = s"$quarantineDir/epoch=$epochId"
    bad.observe(obs, count(lit(1)).as("n"))
      .write.mode("overwrite").parquet(epochDir)
    if (obs.get("n").asInstanceOf[Long] == 0L) {
      val p = new org.apache.hadoop.fs.Path(epochDir)
      val fs = p.getFileSystem(
        batch.sparkSession.sparkContext.hadoopConfiguration)
      fs.delete(p, true): Unit
    }
    batch.filter(!coalesce(isBad, lit(false)))
  }

  /** foreachBatch combinator: route rows failing `isBad` to the DLQ,
    * then hand the clean rows to `sink`. */
  def withDlq(isBad: Column, reason: Column, quarantineDir: String)(
      sink: (DataFrame, Long) => Unit): (DataFrame, Long) => Unit =
    (batch, epochId) =>
      sink(route(batch, isBad, reason, quarantineDir, epochId), epochId)

  /** foreachBatch combinator for TRANSIENT sink failures — the
    * reference's `errors.retry.timeout` / `errors.retry.delay.max.ms`
    * surface: re-run the sink up to `attempts` times with exponential
    * backoff (delay doubles per retry, capped at `maxDelayMs`) before
    * letting the exception fail the stream. Safe exactly when the sink
    * is idempotent per epoch — which every keyed sink here is
    * (`ParquetKeyedTable`/`JdbcUpsert` MERGE replay, `route`'s
    * per-epoch overwrite) — because a retried attempt replays the SAME
    * epochId. Composes with `withDlq` on either side.
    *
    * Only exceptions matching `retryable` are retried; anything else —
    * a deterministic failure like an `AnalysisException`, schema
    * mismatch, or auth error — rethrows immediately instead of burning
    * attempts×delay of driver wall time per micro-batch on an outcome
    * that cannot change. The default predicate covers the transient
    * classes the reference's retry surface targets: I/O and SQL
    * recoverable/transient/timeout failures, wherever they sit in the
    * sink's cause chain (Spark wraps executor faults). */
  def withRetry(attempts: Int, delayMs: Long = 100L, maxDelayMs: Long = 10000L,
                retryable: Throwable => Boolean = defaultRetryable)(
      sink: (DataFrame, Long) => Unit): (DataFrame, Long) => Unit = {
    require(attempts >= 1, "withRetry: need at least one attempt")
    (batch, epochId) => {
      var attempt = 0
      var delay = delayMs
      var done = false
      while (!done) {
        attempt += 1
        try { sink(batch, epochId); done = true }
        catch {
          case e: Exception if attempt < attempts && retryable(e) =>
            // control-plane sleep on the driver between micro-batch
            // retries — the reference's retry delay, not a task sleep
            Thread.sleep(delay)
            delay = math.min(delay * 2, maxDelayMs)
        }
      }
    }
  }

  /** Reprocess quarantined epochs through a sink — the operational
    * second half of error tolerance (the reference's DLQ topic is
    * drained the same way: fix the poison, re-consume, delete).
    *
    * Each quarantined `epoch=N` directory is read, stripped of the DLQ
    * metadata (`__error`, `__epoch` and the partition column), passed
    * through the caller's `fix` (the schema patch / decode correction
    * that makes the poison rows processable), and delivered to `sink`
    * under a FRESH epoch id (`startEpoch`, `startEpoch+1`, … in
    * original-epoch order). Fresh ids matter: keyed sinks skip
    * already-committed epoch ids as replays (`ParquetKeyedTable.merge`),
    * so re-delivering under the original id would be silently dropped —
    * pass a `startEpoch` above the sink's last applied epoch. After an
    * epoch's sink call returns, its quarantine directory is deleted
    * (`drain=true`), so a crashed replay resumes exactly where it
    * stopped: drained epochs are gone, undrained ones re-deliver under
    * later ids — harmless for keyed upserts (same keys, same values).
    *
    * Driver-side work is one directory listing plus one job per epoch;
    * row data moves executor-side only. Returns the number of
    * quarantine epochs replayed.
    */
  def replay(spark: org.apache.spark.sql.SparkSession, quarantineDir: String,
             startEpoch: Long, fix: DataFrame => DataFrame = identity,
             epochs: Seq[Long] = Nil, drain: Boolean = true)(
             sink: (DataFrame, Long) => Unit): Int = {
    val root = new org.apache.hadoop.fs.Path(quarantineDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return 0
    val present = fs.listStatus(root).toSeq
      .filter(_.isDirectory)
      .flatMap(s =>
        "^epoch=(\\d+)$".r.findFirstMatchIn(s.getPath.getName).map(_.group(1).toLong))
      .sorted
    val todo = if (epochs.isEmpty) present else present.filter(epochs.toSet)
    todo.zipWithIndex.foreach { case (e, i) =>
      val dir = s"$quarantineDir/epoch=$e"
      val rows = spark.read.parquet(dir).drop("__error", "__epoch", "epoch")
      sink(fix(rows), startEpoch + i)
      if (drain) fs.delete(new org.apache.hadoop.fs.Path(dir), true): Unit
    }
    todo.size
  }

  /** Default transience test: true if the exception — or any cause in
    * its chain — is an I/O failure or a recoverable/transient/timeout
    * SQL failure. Deterministic plan/schema/syntax/auth errors return
    * false and fail the stream on the first attempt. */
  def defaultRetryable(t: Throwable): Boolean = {
    @annotation.tailrec
    def loop(cur: Throwable, depth: Int): Boolean =
      if (cur == null || depth > 16) false
      else cur match {
        case _: java.io.IOException => true
        case _: java.sql.SQLRecoverableException => true
        case _: java.sql.SQLTransientException => true // includes SQLTimeoutException
        case _: java.util.concurrent.TimeoutException => true
        case _ => loop(cur.getCause, depth + 1)
      }
    loop(t, 0)
  }
}
