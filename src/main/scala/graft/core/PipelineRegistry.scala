package graft.core

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQuery

/**
 * Named-pipeline lifecycle — the engine-side twin of the reference's
 * connector REST surface (SURVEY §3.1; reference README.md:88-133:
 * `POST /connectors` with a JSON config, `GET /connectors/{name}/status`,
 * `DELETE /connectors/{name}`). A real deployment fronts this with any
 * HTTP layer; the lifecycle semantics live here and are testable
 * offline.
 *
 * Semantics mirrored from the reference:
 *  - `submit` upserts by name: re-submitting a name replaces the running
 *    pipeline (the reference's `PUT /connectors/{name}/config` restart
 *    path) — the new spec is validated before the old query is stopped
 *    (a rejected config leaves the healthy pipeline running), and the
 *    new one resumes from the spec's checkpoint (ST1), so a config
 *    update never loses offsets.
 *  - `status` reports RUNNING / FAILED(cause) / STOPPED — the
 *    reference's connector-state vocabulary (README.md:269-276).
 *  - `delete` stops the query and forgets the name.
 *
 * Thread-safe: the registry is a TrieMap and per-name replace is
 * atomic enough for a control plane (Spark serializes query start/stop
 * internally).
 */
final class PipelineRegistry(spark: SparkSession) {

  sealed trait Status
  case object Running extends Status
  final case class Failed(cause: String) extends Status
  case object Stopped extends Status
  case object Unknown extends Status

  private val queries = TrieMap.empty[String, (PipelineSpec, StreamingQuery)]
  private val startFailures = TrieMap.empty[String, String]

  /** Start (or replace) the named streaming pipeline from its spec.
    *
    * Replace is validate-first: the new spec's plan is analyzed BEFORE the
    * running query is touched, so a bad config (unknown source path, bad
    * schema DDL, unknown transform) throws and leaves the healthy pipeline
    * running — the reference's PUT-config behavior, where a rejected config
    * never takes down the old connector. If the final `start()` itself
    * fails (after the old query must be stopped — two queries cannot share
    * a checkpoint), the old spec is restarted from its checkpoint so a bad
    * replacement still cannot take down a healthy pipeline; the failure is
    * recorded for `status` either way. */
  def submit(spec: PipelineSpec): StreamingQuery = {
    // analyze the new plan AND statically validate the sink first;
    // both throw on a bad spec without side effects
    Pipeline.build(spark, spec, streaming = true).schema
    Pipeline.validateStreamSink(spec.sink)
    val previous = queries.remove(spec.name)
    previous.foreach { case (_, q) => if (q.isActive) q.stop() }
    val q =
      try Pipeline.runStream(spark, spec)
      catch {
        case e: Exception =>
          startFailures.put(spec.name, s"${e.getClass.getName}: ${e.getMessage}")
          // best-effort rollback: resume the old spec from its checkpoint
          // (offsets are durable, so this loses nothing). If even the old
          // spec cannot restart, the recorded failure stands alone.
          previous.foreach { case (oldSpec, _) =>
            try queries.put(spec.name, (oldSpec, Pipeline.runStream(spark, oldSpec)))
            catch { case _: Exception => () }
          }
          throw e
      }
    startFailures.remove(spec.name)
    queries.put(spec.name, (spec, q))
    q
  }

  /** One-shot batch execution of a spec (the reference's bulk mode). */
  def runBatch(spec: PipelineSpec): Unit = Pipeline.runBatch(spark, spec)

  def status(name: String): Status = queries.get(name) match {
    case None => startFailures.get(name).map(Failed(_)).getOrElse(Unknown)
    case Some((_, q)) if q.isActive => Running
    case Some((_, q)) => q.exception match {
      case Some(e) => Failed(e.getMessage)
      case None => Stopped
    }
  }

  /** Stop and forget. True if the name existed. */
  def delete(name: String): Boolean = {
    val hadFailure = startFailures.remove(name).isDefined
    queries.remove(name) match {
      case Some((_, q)) => if (q.isActive) q.stop(); true
      case None => hadFailure
    }
  }

  def names: Seq[String] = queries.keys.toSeq.sorted

  /** Block until the named query has processed all currently-available
    * input (test/drain helper; AvailableNow-triggered queries just
    * `awaitTermination`). True if the name exists. */
  def drain(name: String): Boolean =
    queries.get(name).exists { case (_, q) => q.processAllAvailable(); true }
}
