package graft.codec

import scala.jdk.CollectionConverters._

import org.apache.avro.{Schema, SchemaCompatibility}
import org.apache.avro.SchemaCompatibility.SchemaCompatibilityType

/**
 * Schema-Registry compatibility semantics over Avro's own pairwise
 * checker — the gate the reference's registry applies before accepting
 * a new schema version for a subject (the deployment at
 * `docker-compose.yaml:63-75` enforces this on every
 * `POST /subjects/{s}/versions`; `AvroEnvelope` is the framing side of
 * the same service).
 *
 * Modes follow the registry's contract exactly:
 *  - BACKWARD: consumers on the NEW schema can read data produced with
 *    the latest registered one (reader = candidate, writer = latest).
 *  - FORWARD: consumers on the latest can read data produced with the
 *    new one (reader = latest, writer = candidate).
 *  - FULL: both directions.
 *  - *_TRANSITIVE: the same check against EVERY registered version,
 *    not just the latest — the mode that catches a field re-added with
 *    an incompatible type two versions later.
 *  - NONE: no gate.
 *
 * The pairwise rules themselves (defaults fill missing fields, unknown
 * fields are ignored, numeric promotions are one-directional) are
 * delegated to `org.apache.avro.SchemaCompatibility` — the identical
 * class the registry uses, so verdicts agree with the reference
 * deployment byte-for-byte.
 */
object SchemaCompat {

  sealed abstract class Mode(val transitive: Boolean, val backward: Boolean,
                             val forward: Boolean)
  case object None extends Mode(false, false, false)
  case object Backward extends Mode(false, true, false)
  case object Forward extends Mode(false, false, true)
  case object Full extends Mode(false, true, true)
  case object BackwardTransitive extends Mode(true, true, false)
  case object ForwardTransitive extends Mode(true, false, true)
  case object FullTransitive extends Mode(true, true, true)

  /** Registry-config spelling → mode (`BACKWARD_TRANSITIVE` etc.). */
  def mode(s: String): Mode = s.trim.toUpperCase match {
    case "NONE" => None
    case "BACKWARD" => Backward
    case "FORWARD" => Forward
    case "FULL" => Full
    case "BACKWARD_TRANSITIVE" => BackwardTransitive
    case "FORWARD_TRANSITIVE" => ForwardTransitive
    case "FULL_TRANSITIVE" => FullTransitive
    case other => throw new IllegalArgumentException(
      s"unknown compatibility mode '$other'")
  }

  /** One violated pair: which direction failed, against which registered
    * version (1-based), and Avro's incompatibility details. */
  final case class Incompat(direction: String, againstVersion: Int,
                            details: Seq[String])

  /** Pairwise: can `reader` read data written with `writer`? Empty seq
    * means compatible. */
  def readerCanRead(readerJson: String, writerJson: String): Seq[String] = {
    val r = new Schema.Parser().parse(readerJson)
    val w = new Schema.Parser().parse(writerJson)
    val res = SchemaCompatibility.checkReaderWriterCompatibility(r, w).getResult
    if (res.getCompatibility == SchemaCompatibilityType.COMPATIBLE) Seq.empty
    else res.getIncompatibilities.asScala.toSeq.map(i =>
      s"${i.getType} at ${i.getLocation}: ${i.getMessage}")
  }

  /** Check a candidate schema against the registered history (oldest
    * first) under `mode`. Empty result = accepted. */
  def check(candidateJson: String, history: Seq[String], mode: Mode): Seq[Incompat] = {
    if (history.isEmpty) return Seq.empty
    val against =
      if (mode.transitive) history.zipWithIndex
      else Seq(history.last -> (history.size - 1))
    against.flatMap { case (prev, idx) =>
      val back =
        if (!mode.backward) Seq.empty
        else readerCanRead(candidateJson, prev) match {
          case Seq() => Seq.empty
          case d => Seq(Incompat("backward", idx + 1, d))
        }
      val fwd =
        if (!mode.forward) Seq.empty
        else readerCanRead(prev, candidateJson) match {
          case Seq() => Seq.empty
          case d => Seq(Incompat("forward", idx + 1, d))
        }
      back ++ fwd
    }
  }

  /** Rejected registration. */
  final class IncompatibleSchemaException(val subject: String,
                                          val violations: Seq[Incompat])
    extends IllegalArgumentException(
      s"schema for '$subject' is incompatible: " +
        violations.map(v => s"[${v.direction} vs v${v.againstVersion}] " +
          v.details.mkString("; ")).mkString(" | "))

  /**
   * An in-process subject store enforcing the gate on registration —
   * the `POST /subjects/{s}/versions` behavior, offline. Re-registering
   * a schema identical to an existing version returns that version
   * without a check (the registry's idempotent-register contract).
   * Thread-safe; per-subject compatibility overrides mirror
   * `PUT /config/{subject}`.
   */
  final class SubjectStore(defaultMode: Mode = Backward) {
    // version slots are SPARSE: SR's version numbers are stable, so a
    // deleted version leaves a hole (None) rather than renumbering —
    // compat checks and `history` see only the live schemas
    private val versions =
      new java.util.concurrent.ConcurrentHashMap[String, Vector[Option[String]]]()
    private val modes =
      new java.util.concurrent.ConcurrentHashMap[String, Mode]()
    // the registry's GLOBAL id space: a schema registered under any
    // number of subjects holds ONE immutable id (what the wire format's
    // 4-byte header and `GET /schemas/ids/{id}` refer to)
    private val ids =
      new java.util.concurrent.ConcurrentHashMap[String, Int]()
    private val byId =
      new java.util.concurrent.ConcurrentHashMap[Int, String]()
    @volatile private var globalMode: Mode = defaultMode

    def setMode(subject: String, m: Mode): Unit = { modes.put(subject, m): Unit }
    def modeOf(subject: String): Mode = modes.getOrDefault(subject, globalMode)
    /** The registry-wide default (`PUT /config`); subject overrides win. */
    def setDefaultMode(m: Mode): Unit = { globalMode = m }
    def defaultModeNow: Mode = globalMode
    private def slots(subject: String): Vector[Option[String]] =
      versions.getOrDefault(subject, Vector.empty)
    /** Live schemas in version order (deleted versions excluded). */
    def history(subject: String): Vector[String] =
      slots(subject).flatten
    /** Live 1-based version numbers — sparse after deletions. */
    def versionNumbers(subject: String): Seq[Int] =
      slots(subject).zipWithIndex.collect { case (Some(_), i) => i + 1 }
    def schemaAt(subject: String, version: Int): Option[String] =
      slots(subject).lift(version - 1).flatten
    def latestVersion(subject: String): Option[Int] =
      versionNumbers(subject).lastOption
    def subjects: Seq[String] =
      versions.asScala.collect { case (s, v) if v.exists(_.isDefined) => s }
        .toSeq.sorted
    def schemaById(id: Int): Option[String] = Option(byId.get(id))
    def idOf(schemaJson: String): Option[Int] =
      Option(ids.get(new Schema.Parser().parse(schemaJson).toString))

    /** SR's subject lookup (`POST /subjects/{s}`): is this exact schema
      * registered under the subject? Returns (version, global id). */
    def lookup(subject: String, schemaJson: String): Option[(Int, Int)] = {
      val canonical = new Schema.Parser().parse(schemaJson).toString
      slots(subject).zipWithIndex.collectFirst {
        case (Some(s), i) if s == canonical => (i + 1, ids.get(s))
      }
    }

    /** Delete one version (the slot stays, the number never reuses).
      * Returns false when the subject or version is absent. */
    def deleteVersion(subject: String, version: Int): Boolean = synchronized {
      val v = slots(subject)
      if (v.lift(version - 1).flatten.isEmpty) false
      else { versions.put(subject, v.updated(version - 1, Option.empty[String])); true }
    }

    /** Delete a whole subject; returns the versions that were live. */
    def deleteSubject(subject: String): Seq[Int] = synchronized {
      val live = versionNumbers(subject)
      if (live.nonEmpty) { versions.remove(subject): Unit; modes.remove(subject): Unit }
      live
    }

    /** Register under the gate; returns the 1-based version. */
    def register(subject: String, schemaJson: String): Int = synchronized {
      val canonical = new Schema.Parser().parse(schemaJson).toString
      val v = slots(subject)
      val existing = v.indexOf(Some(canonical))
      if (existing >= 0) return existing + 1
      val violations = check(canonical, history(subject), modeOf(subject))
      if (violations.nonEmpty)
        throw new IncompatibleSchemaException(subject, violations)
      versions.put(subject, v :+ Some(canonical))
      ids.computeIfAbsent(canonical, { _ =>
        val next = byId.size + 1
        byId.put(next, canonical)
        next
      }): Unit
      v.size + 1
    }
  }
}
