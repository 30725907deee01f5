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
 *  - `status` reports RUNNING / PAUSED / FAILED(cause) / STOPPED — the
 *    reference's connector-state vocabulary (README.md:269-276).
 *  - `pause`/`resume` map `PUT /connectors/{name}/pause|resume`: pause
 *    stops the streaming query but keeps the spec registered; resume
 *    restarts it from the spec's checkpoint, so no offsets are lost —
 *    exactly Connect's "stop processing, stay configured" contract.
 *  - `restart` maps `POST /connectors/{name}/restart` (pause + resume).
 *  - `delete` stops the query and forgets the name.
 *
 * Thread-safe: the registry is a TrieMap and per-name replace is
 * atomic enough for a control plane (Spark serializes query start/stop
 * internally).
 */
final class PipelineRegistry(spark: SparkSession) {

  sealed trait Status
  case object Running extends Status
  case object Paused extends Status
  final case class Failed(cause: String) extends Status
  case object Stopped extends Status
  case object Unknown extends Status

  private val queries = TrieMap.empty[String, (PipelineSpec, StreamingQuery)]
  private val startFailures = TrieMap.empty[String, String]
  private val paused = TrieMap.empty[String, PipelineSpec]

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
    paused.remove(spec.name) // a replaced name is no longer paused
    queries.put(spec.name, (spec, q))
    q
  }

  /** Stop processing but stay configured (`PUT /connectors/{name}/pause`).
    * The checkpoint keeps the offsets; `resume` picks up exactly there.
    * Idempotent: pausing a paused name is true, unknown names false. */
  def pause(name: String): Boolean = queries.remove(name) match {
    case Some((spec, q)) =>
      if (q.isActive) q.stop()
      paused.put(name, spec)
      true
    case None => paused.contains(name)
  }

  /** Restart a paused pipeline from its checkpoint
    * (`PUT /connectors/{name}/resume`). A failed start records FAILED
    * status and leaves the name paused so resume can be retried. */
  def resume(name: String): Boolean = paused.get(name) match {
    case Some(spec) =>
      val q =
        try Pipeline.runStream(spark, spec)
        catch {
          case e: Exception =>
            startFailures.put(name, s"${e.getClass.getName}: ${e.getMessage}")
            throw e
        }
      startFailures.remove(name)
      paused.remove(name)
      queries.put(name, (spec, q))
      true
    case None => false
  }

  /** Bounce a pipeline through its checkpoint
    * (`POST /connectors/{name}/restart`): running → stop + start; a
    * paused name resumes. True if the name was known. */
  def restart(name: String): Boolean = queries.get(name) match {
    case Some(_) => pause(name) && resume(name)
    case None => resume(name)
  }

  /** One-shot batch execution of a spec (the reference's bulk mode). */
  def runBatch(spec: PipelineSpec): Unit = Pipeline.runBatch(spark, spec)

  def status(name: String): Status = queries.get(name) match {
    case None =>
      startFailures.get(name).map(Failed(_))
        .orElse(if (paused.contains(name)) Some(Paused) else None)
        .getOrElse(Unknown)
    case Some((_, q)) if q.isActive => Running
    case Some((_, q)) => q.exception match {
      case Some(e) => Failed(e.getMessage)
      case None => Stopped
    }
  }

  /** Stop and forget. True if the name existed (running or paused). */
  def delete(name: String): Boolean = {
    val hadFailure = startFailures.remove(name).isDefined
    val wasPaused = paused.remove(name).isDefined
    queries.remove(name) match {
      case Some((_, q)) => if (q.isActive) q.stop(); true
      case None => hadFailure || wasPaused
    }
  }

  def names: Seq[String] = (queries.keys ++ paused.keys).toSeq.distinct.sorted

  /** The stored spec of a known (running or paused) pipeline — the
    * reference's `GET /connectors/{name}` config payload. */
  def spec(name: String): Option[PipelineSpec] =
    queries.get(name).map(_._1).orElse(paused.get(name))

  /** Block until the named query has processed all currently-available
    * input (test/drain helper; AvailableNow-triggered queries just
    * `awaitTermination`). True if the name exists. */
  def drain(name: String): Boolean =
    queries.get(name).exists { case (_, q) => q.processAllAvailable(); true }
}
