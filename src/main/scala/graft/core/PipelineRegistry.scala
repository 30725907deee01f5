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
 * Thread-safe: all state lives in ONE map (a name is always Live or
 * Idle, never split across maps), reads are lock-free snapshots, and
 * every state transition serializes on a single registry lock — the
 * same single-threaded-herder model Kafka Connect uses for lifecycle
 * verbs. A name therefore never transiently disappears mid-pause, and
 * a submit interleaving with pause/resume cannot double-start a spec.
 */
final class PipelineRegistry(spark: SparkSession) {

  sealed trait Status
  case object Running extends Status
  case object Paused extends Status
  final case class Failed(cause: String) extends Status
  case object Stopped extends Status
  case object Unknown extends Status

  /** Registry entry: Live = has a StreamingQuery; Idle = paused, spec
    * retained. One map, so status/names/spec always see a whole state. */
  private sealed trait Entry { def spec: PipelineSpec }
  private final case class Live(spec: PipelineSpec, q: StreamingQuery) extends Entry
  private final case class Idle(spec: PipelineSpec) extends Entry

  private val state = TrieMap.empty[String, Entry]
  private val startFailures = TrieMap.empty[String, String]
  // serializes every lifecycle transition (the "herder" lock); reads
  // never take it. Reentrant, so restart can compose pause + resume.
  private val herder = new Object

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
  def submit(spec: PipelineSpec): StreamingQuery = herder.synchronized {
    // analyze the new plan AND statically validate the sink first;
    // both throw on a bad spec without side effects
    Pipeline.build(spark, spec, streaming = true).schema
    Pipeline.validateStreamSink(spec.sink)
    val previous = state.get(spec.name)
    previous.foreach {
      case Live(_, q) => if (q.isActive) q.stop()
      case Idle(_) => ()
    }
    val q =
      try Pipeline.runStream(spark, spec)
      catch {
        case e: Exception =>
          startFailures.put(spec.name, s"${e.getClass.getName}: ${e.getMessage}")
          // best-effort rollback: resume the old spec from its checkpoint
          // (offsets are durable, so this loses nothing). If even the old
          // spec cannot restart, the recorded failure stands alone.
          previous match {
            case Some(Live(oldSpec, _)) =>
              try state.put(spec.name, Live(oldSpec, Pipeline.runStream(spark, oldSpec)))
              catch { case _: Exception => state.remove(spec.name) }
            case Some(idle @ Idle(_)) => state.put(spec.name, idle): Unit
            case None => state.remove(spec.name): Unit
          }
          throw e
      }
    startFailures.remove(spec.name)
    state.put(spec.name, Live(spec, q)) // replaces any Idle: no longer paused
    q
  }

  /** Stop processing but stay configured (`PUT /connectors/{name}/pause`).
    * The checkpoint keeps the offsets; `resume` picks up exactly there.
    * Idempotent: pausing a paused name is true, unknown names false. */
  def pause(name: String): Boolean = herder.synchronized {
    state.get(name) match {
      case Some(Live(spec, q)) =>
        if (q.isActive) q.stop()
        state.put(name, Idle(spec))
        true
      case Some(Idle(_)) => true
      case None => false
    }
  }

  /** Restart a paused pipeline from its checkpoint
    * (`PUT /connectors/{name}/resume`). A failed start records FAILED
    * status and leaves the name paused so resume can be retried. */
  def resume(name: String): Boolean = herder.synchronized {
    state.get(name) match {
      case Some(Idle(spec)) =>
        val q =
          try Pipeline.runStream(spark, spec)
          catch {
            case e: Exception =>
              startFailures.put(name, s"${e.getClass.getName}: ${e.getMessage}")
              throw e
          }
        startFailures.remove(name)
        state.put(name, Live(spec, q))
        true
      case _ => false
    }
  }

  /** Bounce a pipeline through its checkpoint
    * (`POST /connectors/{name}/restart`): running → stop + start; a
    * paused name resumes. True if the name was known. The herder lock is
    * held across both steps, so no other verb can interleave. */
  def restart(name: String): Boolean = herder.synchronized {
    state.get(name) match {
      case Some(Live(_, _)) => pause(name) && resume(name)
      case _ => resume(name)
    }
  }

  /** One-shot batch execution of a spec (the reference's bulk mode). */
  def runBatch(spec: PipelineSpec): Unit = Pipeline.runBatch(spark, spec)

  /** Dry-run validation — `submit`'s gate with zero side effects (the
    * engine-side of Connect's `PUT /connector-plugins/.../config/
    * validate`). Returns every error found, empty = would submit
    * cleanly. Both checks run even if the first fails, so one round
    * trip reports both a bad transform AND a bad sink. */
  def validate(spec: PipelineSpec): Seq[String] = {
    def check(f: => Unit): Option[String] =
      try { f; None }
      catch { case e: Exception =>
        Some(s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage)}") }
    (check { Pipeline.build(spark, spec, streaming = true).schema: Unit } ++
      check { Pipeline.validateStreamSink(spec.sink) }).toSeq
  }

  def status(name: String): Status = state.get(name) match {
    case None => startFailures.get(name).map(Failed(_)).getOrElse(Unknown)
    case Some(Idle(_)) =>
      // a failed resume leaves the name paused AND records the cause;
      // surface the failure (retryable via resume) over plain Paused
      startFailures.get(name).map(Failed(_)).getOrElse(Paused)
    case Some(Live(_, q)) if q.isActive => Running
    case Some(Live(_, q)) => q.exception match {
      case Some(e) => Failed(e.getMessage)
      case None => Stopped
    }
  }

  /** Stop and forget. True if the name existed (running or paused). */
  def delete(name: String): Boolean = herder.synchronized {
    val hadFailure = startFailures.remove(name).isDefined
    state.remove(name) match {
      case Some(Live(_, q)) => if (q.isActive) q.stop(); true
      case Some(Idle(_)) => true
      case None => hadFailure
    }
  }

  def names: Seq[String] = state.keys.toSeq.sorted

  /** The stored spec of a known (running or paused) pipeline — the
    * reference's `GET /connectors/{name}` config payload. */
  def spec(name: String): Option[PipelineSpec] = state.get(name).map(_.spec)

  /** Block until the named query has processed all currently-available
    * input (test/drain helper; AvailableNow-triggered queries just
    * `awaitTermination`). True if the name exists and is running. */
  def drain(name: String): Boolean =
    state.get(name).exists {
      case Live(_, q) => q.processAllAvailable(); true
      case Idle(_) => false
    }

  /** The most recent source positions of a pipeline — Connect's
    * `GET /connectors/{name}/offsets` (KIP-875), read from the spec's
    * checkpoint (where Structured Streaming makes offsets durable:
    * `offsets/<batchId>` is the planned position, `commits/<batchId>`
    * marks it processed). None = unknown name; a pipeline that has not
    * completed a batch yet reports batchId -1 and no sources. */
  def offsets(name: String): Option[PipelineRegistry.Offsets] =
    state.get(name).map { e =>
      val dir = checkpointDir(e.spec)
      val offsetsPath = new org.apache.hadoop.fs.Path(dir, "offsets")
      val fs = offsetsPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val latest =
        if (!fs.exists(offsetsPath)) None
        else fs.listStatus(offsetsPath).toSeq
          .flatMap(st => st.getPath.getName.toLongOption)
          .maxOption
      latest match {
        case None => PipelineRegistry.Offsets(-1L, committed = false, Nil)
        case Some(b) =>
          val in = fs.open(new org.apache.hadoop.fs.Path(offsetsPath, b.toString))
          val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
                     finally in.close()
          // HDFSMetadataLog layout: "v1" header, batch-metadata JSON,
          // then one offset line per source ("-" = source not started)
          val sources = text.linesIterator.drop(2).toSeq
          val committed = fs.exists(
            new org.apache.hadoop.fs.Path(new org.apache.hadoop.fs.Path(dir, "commits"), b.toString))
          PipelineRegistry.Offsets(b, committed, sources)
      }
    }

  /** Reset a pipeline's source positions — Connect's
    * `DELETE /connectors/{name}/offsets` (KIP-875). Exactly Connect's
    * precondition: only a NON-running connector may be reset (Connect
    * answers 400 on a running one; callers map the IllegalStateException
    * the same way). Deletes the whole checkpoint, so the next resume
    * starts from scratch. False = unknown name. */
  def resetOffsets(name: String): Boolean = herder.synchronized {
    state.get(name) match {
      case None => false
      case Some(Live(_, q)) if q.isActive =>
        throw new IllegalStateException(
          s"cannot reset offsets of running pipeline '$name'; pause it first")
      case Some(e) =>
        val p = new org.apache.hadoop.fs.Path(checkpointDir(e.spec))
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (fs.exists(p)) { fs.delete(p, true): Unit }
        true
    }
  }

  private def checkpointDir(spec: PipelineSpec): String =
    ConfigProviders.resolveStage(spec.sink).option("checkpoint")
}

object PipelineRegistry {
  /** One checkpointed position: the latest planned batch, whether its
    * commit marker exists, and the raw per-source offset JSON lines. */
  final case class Offsets(batchId: Long, committed: Boolean, sources: Seq[String])
}
