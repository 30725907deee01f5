package graft.core

import java.io.FileInputStream
import java.util.Properties

/**
 * Connect-style externalized configuration (the reference worker's
 * `config.providers` seam — `FileConfigProvider`/`EnvVarConfigProvider`
 * ship in the same worker image that resolves the reference's SMT
 * classes; SURVEY §2.10 lists config providers as an extension point).
 *
 * Option VALUES may embed `${file:/path/to/x.properties:key}` and
 * `${env:VAR}` placeholders. Resolution happens at USE time
 * (`Pipeline.build` / sink start / submit-time validation), never at
 * parse time, so a stored spec — and everything the REST facade's
 * `GET /connectors/{name}/config` returns — keeps the raw placeholder:
 * that is the point of externalizing secrets (a JDBC password in a
 * root-only file never appears in a config readback), and it matches
 * the worker, which stores raw configs and resolves per task start.
 *
 * A missing file, key, or env var fails loudly: silently passing the
 * literal `${...}` downstream would turn a secret-wiring typo into a
 * confusing auth error (or worse, a credential written somewhere as
 * data).
 */
object ConfigProviders {

  private val Placeholder = """\$\{(file|env):([^}]*)\}""".r

  /** Resolve every placeholder in one string value. Values without
    * placeholders pass through untouched (the common case — zero cost).
    * `env` is injectable for tests; defaults to the process env. */
  def resolveValue(v: String, env: Map[String, String] = sys.env): String =
    Placeholder.replaceAllIn(v, m => scala.util.matching.Regex.quoteReplacement(
      m.group(1) match {
        case "env" =>
          env.getOrElse(m.group(2), throw new IllegalArgumentException(
            s"config provider: env var '${m.group(2)}' is not set"))
        case "file" =>
          // path:key — the key is the segment after the LAST ':', so
          // absolute paths (and Windows-style drives) stay intact
          val spec = m.group(2)
          val cut = spec.lastIndexOf(':')
          require(cut > 0 && cut < spec.length - 1, s"config provider: bad file spec '$spec' (want path:key)")
          val (path, key) = (spec.substring(0, cut), spec.substring(cut + 1))
          val props = new Properties()
          val in = new FileInputStream(path) // propagates FileNotFoundException loudly
          try props.load(in) finally in.close()
          Option(props.getProperty(key)).getOrElse(throw new IllegalArgumentException(
            s"config provider: no key '$key' in $path"))
      }))

  def resolveStage(s: StageSpec, env: Map[String, String] = sys.env): StageSpec =
    s.copy(options = s.options.map { case (k, v) => k -> resolveValue(v, env) })

  def resolve(spec: PipelineSpec, env: Map[String, String] = sys.env): PipelineSpec =
    spec.copy(
      source = resolveStage(spec.source, env),
      transforms = spec.transforms.map(resolveStage(_, env)),
      sink = resolveStage(spec.sink, env))
}
