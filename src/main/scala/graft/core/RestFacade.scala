package graft.core

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}

/**
 * Connect-REST-shaped HTTP control plane over `PipelineRegistry`
 * (SURVEY §3.1; reference README.md:88-133 drives everything through
 * `POST /connectors`, `GET /connectors/{name}/status`,
 * `PUT /connectors/{name}/pause|resume`, `DELETE /connectors/{name}`).
 * The lifecycle semantics live in the registry and are tested there;
 * this layer is routing + status codes, so a user of the reference can
 * keep their curl workflow verbatim.
 *
 * Routes (name = URL path segment):
 *   GET    /connectors                 → 200 `["a","b"]`;
 *          `?expand=info,status` → 200 map `{name:{"info","status"}}`
 *          (Connect's expanded listing; unknown expand keys ignored)
 *   POST   /connectors        (spec)   → 201 `{"name":...}` | 400 |
 *          409 (name exists — POST is create-only, like Connect; use
 *          PUT /connectors/{name}/config to replace)
 *   GET    /connectors/{n}/status      → 200 `{"name","state"[,"trace"]}` | 404
 *   GET    /connectors/{n}             → 200 `{"name","config"}` | 404
 *   GET    /connectors/{n}/config      → 200 (spec JSON, PUT-able back) | 404
 *   PUT    /connectors/{n}/config (spec) → 200 | 400 (replace; a bad
 *          config leaves the old pipeline running — registry contract)
 *   PUT    /connectors/{n}/pause       → 202 | 404
 *   PUT    /connectors/{n}/resume      → 202 | 404
 *   POST   /connectors/{n}/restart     → 204 | 404
 *   GET    /connectors/{n}/offsets     → 200 (KIP-875: checkpointed
 *          batchId + committed flag + raw per-source offsets) | 404
 *   DELETE /connectors/{n}/offsets     → 200 (reset; paused only) |
 *          400 (running — Connect's precondition) | 404
 *   DELETE /connectors/{n}             → 204 | 404
 *   GET    /                           → 200 `{"version","commit",
 *          "kafka_cluster_id":null}` (Connect's root; no broker here,
 *          so the cluster id is null by construction)
 *   GET    /connectors/{n}/tasks       → 200 (single-task model: one
 *          `{"id":{"connector",task:0},"config"}` entry) | 404
 *   GET    /connectors/{n}/tasks/0/status → 200 `{"id":0,"state",
 *          "worker_id"}` mirroring the connector state | 404
 *   POST   /connectors/{n}/tasks/0/restart → 204 (restarts the one
 *          task = the pipeline's StreamingQuery) | 404
 *   GET    /connectors/{n}/topics      → 200 (KIP-558 shape
 *          `{"<n>":{"topics":[...]}}`: the endpoints the spec reads and
 *          writes — path/table/url/topic options, this engine's topic
 *          equivalents) | 404
 *   PUT    /connectors/{n}/topics/reset → 200 | 404 (documented
 *          divergence: the set is derived from the live spec, not
 *          accumulated history, so reset re-derives rather than clears)
 *   GET    /admin/loggers              → 200 (root + every logger set
 *          through this API, with live log4j2 levels — KIP-495 shape)
 *   GET    /admin/loggers/{name}       → 200 `{"level":...}`
 *   PUT    /admin/loggers/{name} `{"level":"DEBUG"}` → 200 `["name"]`
 *          (applied via log4j2 Configurator) | 400 (bad level)
 *   GET    /connector-plugins          → 200 (stage vocabulary:
 *          `{"class","type":"source|transform|sink"}` entries)
 *   GET    /metrics                    → 200 Prometheus text exposition
 *          of the engine's own gauges (the reference's JMX-exporter
 *          `:9876/metrics` twin) | 404 without a metrics source
 *   PUT    /connector-plugins/pipeline/config/validate (spec) →
 *          200 `{"name","error_count","errors"}` | 400 (unparseable)
 *
 * Config body: the engine's `PipelineSpec` JSON (documented divergence
 * from Connect's flat `{"name","config"}` string map — the spec format
 * IS this engine's config language). For POST/PUT the path/spec name
 * must agree, else 400.
 *
 * Control-plane-only by construction: a single-threaded executor
 * serves requests; all data-plane work stays inside Spark.
 */
final class RestFacade(registry: PipelineRegistry, port: Int = 0,
                       metricsText: Option[() => String] = None)
    extends AutoCloseable {

  private val server =
    HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
  server.setExecutor(null) // serialize control-plane requests
  server.createContext("/connectors", (ex: HttpExchange) => handle(ex))
  server.createContext("/connector-plugins", (ex: HttpExchange) => handlePlugins(ex))
  server.createContext("/admin", (ex: HttpExchange) => handleAdmin(ex))
  server.createContext("/metrics", (ex: HttpExchange) => handleMetrics(ex))
  server.createContext("/", (ex: HttpExchange) => handleRoot(ex))

  /** Bound port (useful with port=0 ephemeral binding). */
  def boundPort: Int = server.getAddress.getPort

  def start(): Unit = server.start()
  override def close(): Unit = server.stop(0)

  private def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private def respond(ex: HttpExchange, code: Int, body: String = ""): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    if (body.nonEmpty)
      ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, if (bytes.isEmpty) -1 else bytes.length)
    if (bytes.nonEmpty) ex.getResponseBody.write(bytes)
    ex.close()
  }

  private def readBody(ex: HttpExchange): String =
    new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)

  private def submit(ex: HttpExchange, pathName: Option[String],
                     okCode: Int): Unit =
    try {
      val spec = PipelineSpec.fromJson(readBody(ex))
      if (pathName.exists(_ != spec.name))
        respond(ex, 400, s"""{"error":${jstr(
          s"path name '${pathName.get}' != spec name '${spec.name}'")}}""")
      else submitParsed(ex, spec, okCode)
    } catch {
      case e: Exception =>
        respond(ex, 400, s"""{"error":${jstr(
          s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage)}")}}""")
    }

  private def submitParsed(ex: HttpExchange, spec: PipelineSpec,
                           okCode: Int): Unit =
    try {
      registry.submit(spec)
      respond(ex, okCode, s"""{"name":${jstr(spec.name)}}""")
    } catch {
      case e: Exception =>
        respond(ex, 400, s"""{"error":${jstr(
          s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage)}")}}""")
    }

  private def statusJson(name: String): Option[String] =
    registry.status(name) match {
      case registry.Unknown => None
      case registry.Failed(cause) => Some(
        s"""{"name":${jstr(name)},"state":"FAILED","trace":${jstr(cause)}}""")
      case s => Some(
        s"""{"name":${jstr(name)},"state":"${s.toString.toUpperCase}"}""")
    }

  private def status(ex: HttpExchange, name: String): Unit =
    statusJson(name) match {
      case Some(j) => respond(ex, 200, j)
      case None    => respond(ex, 404)
    }

  private def lifecycle(ex: HttpExchange, ok: Boolean, code: Int): Unit =
    if (ok) respond(ex, code) else respond(ex, 404)

  // loggers with an explicitly-set level (what GET /admin/loggers
  // lists, like Connect); levels also apply live via log4j2
  private val setLevels =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Connect's `/admin/loggers` surface: read and set log levels at
    * runtime (KIP-495 shape). GET lists the root logger plus every
    * logger whose level was set through this API; PUT applies the
    * level via log4j2's `Configurator` (Spark's logging backend) and
    * answers with the affected logger names. Invalid level → 400. */
  private def handleAdmin(ex: HttpExchange): Unit = {
    val parts = ex.getRequestURI.getPath.stripPrefix("/admin")
      .split("/").filter(_.nonEmpty).toList
    def levelOf(name: String): String =
      org.apache.logging.log4j.LogManager.getLogger(name).getLevel.toString
    try (ex.getRequestMethod, parts) match {
      case ("GET", "loggers" :: Nil) =>
        val names = ("root" +: setLevels.keySet.toArray(Array.empty[String]).toSeq)
          .distinct.sorted
        respond(ex, 200, names.map(n =>
          s"""${jstr(n)}:{"level":${jstr(levelOf(n))}}""").mkString("{", ",", "}"))
      case ("GET", "loggers" :: name :: Nil) =>
        respond(ex, 200, s"""{"level":${jstr(levelOf(name))}}""")
      case ("PUT", "loggers" :: name :: Nil) =>
        val level = try {
          val body = readBody(ex)
          val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(body)
          Option(node.get("level")).filter(_.isTextual).map(_.asText())
        } catch { case _: Exception => None }
        level.flatMap(l =>
          Option(org.apache.logging.log4j.Level.getLevel(l.toUpperCase))) match {
          case Some(lvl) =>
            if (name == "root")
              org.apache.logging.log4j.core.config.Configurator.setRootLevel(lvl)
            else
              org.apache.logging.log4j.core.config.Configurator.setLevel(name, lvl)
            setLevels.put(name, lvl.toString): Unit
            respond(ex, 200, s"[${jstr(name)}]")
          case None => respond(ex, 400,
            s"""{"error":${jstr("invalid or missing level")}}""")
        }
      case _ => respond(ex, 405)
    } catch {
      case e: Exception =>
        try respond(ex, 500, s"""{"error":${jstr(
          s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage)}")}}""")
        catch { case _: Exception => () }
    }
  }

  /** The worker's scrape endpoint — the reference's JMX→Prometheus
    * javaagent serves `:9876/metrics` beside the worker
    * (`docker-compose.yaml:146-148,112`); here the engine's own gauges
    * (rendered by the caller, typically `PromExpose.render(feed.latest)`)
    * serve under the control-plane port. Text exposition content type;
    * 404 when the facade was built without a metrics source. */
  private def handleMetrics(ex: HttpExchange): Unit =
    (ex.getRequestMethod, metricsText) match {
      case ("GET", Some(render)) =>
        try {
          val bytes = render().getBytes(StandardCharsets.UTF_8)
          ex.getResponseHeaders.set("Content-Type",
            "text/plain; version=0.0.4; charset=utf-8")
          ex.sendResponseHeaders(200, if (bytes.isEmpty) -1 else bytes.length)
          if (bytes.nonEmpty) ex.getResponseBody.write(bytes)
          ex.close()
        } catch {
          case e: Exception =>
            try respond(ex, 500, s"""{"error":${jstr(
              s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage)}")}}""")
            catch { case _: Exception => () }
        }
      case ("GET", None) => respond(ex, 404)
      case _             => respond(ex, 405)
    }

  /** Connect's root resource. No broker exists in this deployment, so
    * `kafka_cluster_id` is null by construction (a Connect client that
    * reads it sees the same shape). */
  private def handleRoot(ex: HttpExchange): Unit =
    if (ex.getRequestURI.getPath == "/" && ex.getRequestMethod == "GET")
      respond(ex, 200, s"""{"version":${jstr(org.apache.spark.SPARK_VERSION)},""" +
        s""""commit":"graft","kafka_cluster_id":null}""")
    else respond(ex, 404) // longest-prefix fallthrough: unknown path

  /** KIP-558 twin: the "topics" a pipeline touches are its endpoint
    * options — path/table/url/topic on the source and sink stages (the
    * engine's topic equivalents). Derived from the live spec, not
    * accumulated at runtime — hence topics/reset re-derives. */
  private def topicsOf(spec: PipelineSpec): Seq[String] =
    Seq(spec.source, spec.sink).flatMap(st =>
      Seq("topic", "path", "table", "url").flatMap(st.options.get)).distinct

  private def withSpec(ex: HttpExchange, name: String)(
      f: PipelineSpec => Unit): Unit =
    registry.spec(name) match {
      case Some(spec) => f(spec)
      case None => respond(ex, 404)
    }

  /** Connect's plugin-discovery + config-validation routes:
    *   GET /connector-plugins → the declared stage vocabulary
    *   PUT /connector-plugins/pipeline/config/validate (spec) →
    *     200 `{"name","error_count","errors"}` — submit's gate as a
    *     dry run (Connect-style; the one "plugin" is the pipeline spec
    *     language itself, hence the fixed `pipeline` segment). */
  private def handlePlugins(ex: HttpExchange): Unit = {
    val method = ex.getRequestMethod
    val parts = ex.getRequestURI.getPath.stripPrefix("/connector-plugins")
      .split("/").filter(_.nonEmpty).toList
    try (method, parts) match {
      case ("GET", Nil) =>
        val entries =
          Pipeline.sourceTypes.map(t => s"""{"class":${jstr(t)},"type":"source"}""") ++
          Pipeline.transformTypes.map(t => s"""{"class":${jstr(t)},"type":"transform"}""") ++
          Pipeline.streamSinkTypes.map(t => s"""{"class":${jstr(t)},"type":"sink"}""")
        respond(ex, 200, entries.mkString("[", ",", "]"))
      case ("PUT", "pipeline" :: "config" :: "validate" :: Nil) =>
        try {
          val spec = PipelineSpec.fromJson(readBody(ex))
          val errors = registry.validate(spec)
          respond(ex, 200,
            s"""{"name":${jstr(spec.name)},"error_count":${errors.length},""" +
              s""""errors":${errors.map(jstr).mkString("[", ",", "]")}}""")
        } catch {
          case e: Exception => respond(ex, 400, s"""{"error":${jstr(
            s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage)}")}}""")
        }
      case _ => respond(ex, 405)
    } catch {
      case e: Exception =>
        try respond(ex, 500, s"""{"error":${jstr(
          s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage)}")}}""")
        catch { case _: Exception => () }
    }
  }

  private def handle(ex: HttpExchange): Unit = {
    val method = ex.getRequestMethod
    val parts = ex.getRequestURI.getPath.stripPrefix("/connectors")
      .split("/").filter(_.nonEmpty).toList
    try (method, parts) match {
      case ("GET", Nil) =>
        // Connect's `?expand=info,status`: the listing becomes a map
        // name → {expanded objects}; unsupported expand keys are
        // ignored (Connect's leniency). Plain GET stays a name array.
        val expands = Option(ex.getRequestURI.getQuery).getOrElse("")
          .split("&").filter(_.startsWith("expand="))
          .flatMap(_.stripPrefix("expand=").split(","))
          .map(_.trim).filter(_.nonEmpty).distinct.toSeq
        if (expands.isEmpty)
          respond(ex, 200, registry.names.map(jstr).mkString("[", ",", "]"))
        else {
          val body = registry.names.sorted.map { n =>
            val fields = expands.flatMap {
              case "info" => registry.spec(n).map(sp =>
                s""""info":{"name":${jstr(n)},"config":${sp.toJson}}""")
              case "status" => statusJson(n).map(sj => s""""status":$sj""")
              case _ => None
            }
            s"${jstr(n)}:{${fields.mkString(",")}}"
          }.mkString("{", ",", "}")
          respond(ex, 200, body)
        }
      case ("POST", Nil) =>
        // Connect returns 409 when the name already exists: POST is
        // create-only; replacement is PUT /connectors/{name}/config.
        // Check-then-submit races are benign here — the single-threaded
        // executor serializes requests, and the registry's herder lock
        // serializes any out-of-band submit.
        try {
          val spec = PipelineSpec.fromJson(readBody(ex))
          if (registry.spec(spec.name).isDefined)
            respond(ex, 409, s"""{"error":${jstr(
              s"Connector ${spec.name} already exists")}}""")
          else submitParsed(ex, spec, 201)
        } catch {
          case e: Exception =>
            respond(ex, 400, s"""{"error":${jstr(
              s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage)}")}}""")
        }
      case ("GET", name :: "status" :: Nil) => status(ex, name)
      case ("GET", name :: Nil) => // name + stored config, PUT-able back
        registry.spec(name) match {
          case Some(spec) => respond(ex, 200,
            s"""{"name":${jstr(name)},"config":${spec.toJson}}""")
          case None => respond(ex, 404)
        }
      case ("GET", name :: "config" :: Nil) =>
        registry.spec(name) match {
          case Some(spec) => respond(ex, 200, spec.toJson)
          case None => respond(ex, 404)
        }
      case ("PUT", name :: "config" :: Nil) => submit(ex, Some(name), 200)
      case ("PUT", name :: "pause" :: Nil) =>
        lifecycle(ex, registry.pause(name), 202)
      case ("PUT", name :: "resume" :: Nil) =>
        try lifecycle(ex, registry.resume(name), 202)
        catch { case e: Exception => respond(ex, 500,
          s"""{"error":${jstr(String.valueOf(e.getMessage))}}""") }
      case ("POST", name :: "restart" :: Nil) =>
        try lifecycle(ex, registry.restart(name), 204)
        catch { case e: Exception => respond(ex, 500,
          s"""{"error":${jstr(String.valueOf(e.getMessage))}}""") }
      case ("GET", name :: "offsets" :: Nil) =>
        // KIP-875: the pipeline's durable source positions, read from
        // its checkpoint (raw per-source offset JSON, Connect-style list)
        registry.offsets(name) match {
          case Some(o) =>
            val srcs = o.sources.zipWithIndex.map { case (s, i) =>
              val off = if (s == "-") "null"
                        else if (s.startsWith("{") || s.startsWith("[")) s
                        else jstr(s)
              s"""{"source":$i,"offset":$off}"""
            }
            respond(ex, 200,
              s"""{"name":${jstr(name)},"batchId":${o.batchId},""" +
                s""""committed":${o.committed},"offsets":${srcs.mkString("[", ",", "]")}}""")
          case None => respond(ex, 404)
        }
      case ("DELETE", name :: "offsets" :: Nil) =>
        // KIP-875: reset — Connect answers 400 on a running connector
        try lifecycle(ex, registry.resetOffsets(name), 200)
        catch { case e: IllegalStateException => respond(ex, 400,
          s"""{"error":${jstr(String.valueOf(e.getMessage))}}""") }
      case ("DELETE", name :: Nil) =>
        lifecycle(ex, registry.delete(name), 204)
      case ("GET", name :: "tasks" :: Nil) =>
        // single-task model: Spark runs the whole pipeline as one
        // StreamingQuery, so the task list is exactly one entry whose
        // config is the connector config (Connect's per-task split is
        // its own scheduler's concern — ST10 n/a-by-design)
        withSpec(ex, name) { spec =>
          respond(ex, 200,
            s"""[{"id":{"connector":${jstr(name)},"task":0},""" +
              s""""config":${spec.toJson}}]""")
        }
      case ("GET", name :: "tasks" :: "0" :: "status" :: Nil) =>
        registry.status(name) match {
          case registry.Unknown => respond(ex, 404)
          case registry.Failed(cause) => respond(ex, 200,
            s"""{"id":0,"state":"FAILED","worker_id":"graft-local","trace":${jstr(cause)}}""")
          case s => respond(ex, 200,
            s"""{"id":0,"state":"${s.toString.toUpperCase}","worker_id":"graft-local"}""")
        }
      case ("POST", name :: "tasks" :: "0" :: "restart" :: Nil) =>
        // the one task IS the pipeline's StreamingQuery: task restart
        // and connector restart coincide
        try lifecycle(ex, registry.restart(name), 204)
        catch { case e: Exception => respond(ex, 500,
          s"""{"error":${jstr(String.valueOf(e.getMessage))}}""") }
      case (_, _ :: "tasks" :: id :: _) if id != "0" =>
        respond(ex, 404) // only task 0 exists
      case ("GET", name :: "topics" :: Nil) =>
        withSpec(ex, name) { spec =>
          respond(ex, 200, s"""{${jstr(name)}:{"topics":${
            topicsOf(spec).map(jstr).mkString("[", ",", "]")}}}""")
        }
      case ("PUT", name :: "topics" :: "reset" :: Nil) =>
        // derived set: reset re-derives (documented divergence)
        withSpec(ex, name)(_ => respond(ex, 200))
      case _ => respond(ex, 405)
    } catch {
      case e: Exception => // never leave a connection dangling
        try respond(ex, 500, s"""{"error":${jstr(
          s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage)}")}}""")
        catch { case _: Exception => () }
    }
  }
}
