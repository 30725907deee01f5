package graft.codec

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpServer}

/**
 * Schema-Registry-shaped HTTP facade over [[SchemaCompat.SubjectStore]]
 * — the second service in the reference deployment
 * (`schema-registry:8081`, docker-compose.yaml:63-75), so the full
 * registry loop runs offline: producers register under the
 * compatibility gate, the wire format carries the global id, and
 * [[AvroEnvelope.HttpResolver]] resolves writer schemas from THIS
 * server with its per-JVM cache.
 *
 * Routes (Confluent v1 API shapes):
 *   GET  /schemas/ids/{id}                → 200 `{"schema": "..."}` |
 *        404 `{"error_code":40403,...}` (what HttpResolver consumes)
 *   GET  /subjects                        → 200 `["a","b"]`
 *   GET  /subjects/{s}/versions           → 200 `[1,3]` (live version
 *        numbers — deletions leave holes, numbers never reuse) | 404
 *   GET  /subjects/{s}/versions/{v|latest} → 200
 *        `{"subject","version","id","schema"}` | 404 (40401 unknown
 *        subject, 40402 unknown version)
 *   POST /subjects/{s}  `{"schema":"..."}` → 200 (the serializer's
 *        lookup: the exact schema's registered version+id under this
 *        subject) | 404 (40403 schema not registered here) | 422
 *   DELETE /subjects/{s}                  → 200 `[1,2]` (the versions
 *        that were live) | 404
 *   DELETE /subjects/{s}/versions/{v|latest} → 200 `N` | 404
 *   POST /subjects/{s}/versions  `{"schema":"..."}` → 200 `{"id":N}` |
 *        409 (incompatible — the gate) | 422 (unparseable schema)
 *   POST /compatibility/subjects/{s}/versions/latest `{"schema":"..."}`
 *        → 200 `{"is_compatible":bool}` | 422
 *   GET  /config                          → 200 `{"compatibilityLevel"}`
 *        ; PUT /config `{"compatibility":...}` → 200 (registry-wide
 *        default; subject overrides win) | 422
 *   GET  /config/{s}                      → 200 (subject override or
 *        the default) ; PUT /config/{s} `{"compatibility":"FULL"}` →
 *        200 | 422 (unknown level)
 *
 * Control-plane-only: single-threaded executor, same as the Connect
 * facade — schema traffic is O(distinct schemas), never O(rows).
 */
final class RegistryFacade(store: SchemaCompat.SubjectStore, port: Int = 0)
    extends AutoCloseable {

  private val server =
    HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
  server.setExecutor(null)
  server.createContext("/", (ex: HttpExchange) => handle(ex))

  def boundPort: Int = server.getAddress.getPort
  def start(): Unit = server.start()
  override def close(): Unit = server.stop(0)

  private val mapper = new ObjectMapper()

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

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type",
      "application/vnd.schemaregistry.v1+json")
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  private def err(ex: HttpExchange, http: Int, code: Int, msg: String): Unit =
    respond(ex, http, s"""{"error_code":$code,"message":${jstr(msg)}}""")

  /** The `schema` field of a request body, if parseable. */
  private def schemaOf(ex: HttpExchange): Option[String] =
    try {
      val node = mapper.readTree(
        new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8))
      Option(node.get("schema")).filter(_.isTextual).map(_.asText())
    } catch { case _: Exception => None }

  /** The `compatibility` level of a request body, if valid. */
  private def readLevel(ex: HttpExchange): Option[SchemaCompat.Mode] = {
    val level = try {
      val node = mapper.readTree(new String(
        ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8))
      Option(node.get("compatibility")).filter(_.isTextual).map(_.asText())
    } catch { case _: Exception => scala.None }
    level.flatMap(l =>
      try Some(SchemaCompat.mode(l))
      catch { case _: IllegalArgumentException => scala.None })
  }

  private def versionJson(subject: String, v: Int, schema: String): String =
    s"""{"subject":${jstr(subject)},"version":$v,""" +
      s""""id":${store.idOf(schema).getOrElse(-1)},"schema":${jstr(schema)}}"""

  private def handle(ex: HttpExchange): Unit =
    try route(ex)
    catch {
      case e: Exception => err(ex, 500, 50001, s"${e.getClass.getSimpleName}: ${e.getMessage}")
    }

  private def route(ex: HttpExchange): Unit = {
    val parts = ex.getRequestURI.getPath.split("/").filter(_.nonEmpty).toList
    val verb = ex.getRequestMethod
    (verb, parts) match {
      case ("GET", "schemas" :: "ids" :: id :: Nil) =>
        id.toIntOption.flatMap(store.schemaById) match {
          case Some(s) => respond(ex, 200, s"""{"schema":${jstr(s)}}""")
          case scala.None => err(ex, 404, 40403, s"Schema $id not found")
        }

      case ("GET", "subjects" :: Nil) =>
        respond(ex, 200, store.subjects.map(jstr).mkString("[", ",", "]"))

      case ("GET", "subjects" :: s :: "versions" :: Nil) =>
        val live = store.versionNumbers(s)
        if (live.isEmpty) err(ex, 404, 40401, s"Subject '$s' not found")
        else respond(ex, 200, live.mkString("[", ",", "]"))

      case ("GET", "subjects" :: s :: "versions" :: v :: Nil) =>
        if (store.versionNumbers(s).isEmpty)
          err(ex, 404, 40401, s"Subject '$s' not found")
        else {
          val idx = if (v == "latest") store.latestVersion(s) else v.toIntOption
          idx.flatMap(i => store.schemaAt(s, i).map(i -> _)) match {
            case Some((i, schema)) => respond(ex, 200, versionJson(s, i, schema))
            case scala.None => err(ex, 404, 40402, s"Version $v not found")
          }
        }

      case ("POST", "subjects" :: s :: Nil) =>
        // SR's lookup: is this exact schema registered under the
        // subject? (what serializers call before falling back to POST
        // .../versions)
        schemaOf(ex) match {
          case scala.None => err(ex, 422, 42201, "body has no 'schema' field")
          case Some(schema) =>
            if (store.versionNumbers(s).isEmpty)
              err(ex, 404, 40401, s"Subject '$s' not found")
            else try store.lookup(s, schema) match {
              case Some((v, id)) => respond(ex, 200,
                s"""{"subject":${jstr(s)},"version":$v,"id":$id,"schema":${jstr(schema)}}""")
              case scala.None => err(ex, 404, 40403, "Schema not found")
            } catch {
              case e: org.apache.avro.SchemaParseException =>
                err(ex, 422, 42201, e.getMessage)
            }
        }

      case ("DELETE", "subjects" :: s :: Nil) =>
        val live = store.deleteSubject(s)
        if (live.isEmpty) err(ex, 404, 40401, s"Subject '$s' not found")
        else respond(ex, 200, live.mkString("[", ",", "]"))

      case ("DELETE", "subjects" :: s :: "versions" :: v :: Nil) =>
        val idx = if (v == "latest") store.latestVersion(s) else v.toIntOption
        idx match {
          case Some(i) if store.deleteVersion(s, i) => respond(ex, 200, i.toString)
          case _ =>
            if (store.versionNumbers(s).isEmpty)
              err(ex, 404, 40401, s"Subject '$s' not found")
            else err(ex, 404, 40402, s"Version $v not found")
        }

      case ("POST", "subjects" :: s :: "versions" :: Nil) =>
        schemaOf(ex) match {
          case scala.None => err(ex, 422, 42201, "body has no 'schema' field")
          case Some(schema) =>
            try {
              store.register(s, schema): Unit
              respond(ex, 200, s"""{"id":${store.idOf(schema).get}}""")
            } catch {
              case e: SchemaCompat.IncompatibleSchemaException =>
                err(ex, 409, 40901, e.getMessage)
              case e: org.apache.avro.SchemaParseException =>
                err(ex, 422, 42201, e.getMessage)
            }
        }

      case ("POST", "compatibility" :: "subjects" :: s :: "versions" :: "latest" :: Nil) =>
        schemaOf(ex) match {
          case scala.None => err(ex, 422, 42201, "body has no 'schema' field")
          case Some(schema) =>
            try {
              val ok = SchemaCompat
                .check(schema, store.history(s), store.modeOf(s)).isEmpty
              respond(ex, 200, s"""{"is_compatible":$ok}""")
            } catch {
              case e: org.apache.avro.SchemaParseException =>
                err(ex, 422, 42201, e.getMessage)
            }
        }

      case ("GET", "config" :: Nil) =>
        respond(ex, 200,
          s"""{"compatibilityLevel":${jstr(levelName(store.defaultModeNow))}}""")

      case ("PUT", "config" :: Nil) => // registry-wide default
        readLevel(ex) match {
          case Some(m) =>
            store.setDefaultMode(m)
            respond(ex, 200, s"""{"compatibility":${jstr(levelName(m))}}""")
          case scala.None => err(ex, 422, 42203, "invalid compatibility level")
        }

      case ("GET", "config" :: s :: Nil) =>
        respond(ex, 200,
          s"""{"compatibilityLevel":${jstr(levelName(store.modeOf(s)))}}""")

      case ("PUT", "config" :: s :: Nil) =>
        readLevel(ex) match {
          case Some(m) =>
            store.setMode(s, m)
            respond(ex, 200, s"""{"compatibility":${jstr(levelName(m))}}""")
          case scala.None => err(ex, 422, 42203, "invalid compatibility level")
        }

      case _ => err(ex, 404, 40401, s"no route: $verb /${parts.mkString("/")}")
    }
  }

  private def levelName(m: SchemaCompat.Mode): String = m match {
    case SchemaCompat.None => "NONE"
    case SchemaCompat.Backward => "BACKWARD"
    case SchemaCompat.Forward => "FORWARD"
    case SchemaCompat.Full => "FULL"
    case SchemaCompat.BackwardTransitive => "BACKWARD_TRANSITIVE"
    case SchemaCompat.ForwardTransitive => "FORWARD_TRANSITIVE"
    case SchemaCompat.FullTransitive => "FULL_TRANSITIVE"
  }
}
