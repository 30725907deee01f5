package graft.codec

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The registry's curl workflow against the SR facade, ending in the
  * full wire loop: schemas registered over HTTP resolve back through
  * `AvroEnvelope.HttpResolver` — the offline twin of the reference's
  * `schema-registry:8081` deployment. */
class RegistryFacadeSpec extends AnyFunSuite with Matchers {

  private val http = HttpClient.newHttpClient()

  private def req(method: String, url: String, body: String = ""): HttpResponse[String] = {
    val b = HttpRequest.newBuilder(URI.create(url))
    val withBody =
      if (body.isEmpty) b.method(method, HttpRequest.BodyPublishers.noBody())
      else b.method(method, HttpRequest.BodyPublishers.ofString(body))
    http.send(withBody.build(), HttpResponse.BodyHandlers.ofString())
  }

  private def schemaBody(fields: String*): String = {
    val schema =
      s"""{"type":"record","name":"r","fields":[${fields.mkString(",")}]}"""
    s"""{"schema": ${escape(schema)}}"""
  }
  private def escape(s: String): String = "\"" + s.replace("\"", "\\\"") + "\""

  test("register/evolve/reject/resolve over HTTP, then HttpResolver closes the loop") {
    val store = new SchemaCompat.SubjectStore(SchemaCompat.Backward)
    val facade = new RegistryFacade(store)
    facade.start()
    val base = s"http://127.0.0.1:${facade.boundPort}"
    try {
      // POST v1, then a backward-compatible evolution as v2
      val r1 = req("POST", s"$base/subjects/t-value/versions",
        schemaBody("""{"name":"a","type":"int"}"""))
      r1.statusCode() shouldBe 200
      r1.body() shouldBe """{"id":1}"""
      val r2 = req("POST", s"$base/subjects/t-value/versions",
        schemaBody("""{"name":"a","type":"int"}""",
          """{"name":"b","type":"string","default":"x"}"""))
      r2.statusCode() shouldBe 200
      r2.body() shouldBe """{"id":2}"""

      // the gate: an add-required evolution is 409, history unchanged
      val r3 = req("POST", s"$base/subjects/t-value/versions",
        schemaBody("""{"name":"a","type":"int"}""",
          """{"name":"c","type":"string"}"""))
      r3.statusCode() shouldBe 409
      req("GET", s"$base/subjects/t-value/versions").body() shouldBe "[1,2]"

      // dry-run compatibility check mirrors the verdicts
      req("POST", s"$base/compatibility/subjects/t-value/versions/latest",
        schemaBody("""{"name":"a","type":"int"}""",
          """{"name":"c","type":"string"}""")).body() shouldBe
        """{"is_compatible":false}"""

      // browse: subjects, version detail, global id lookup
      req("GET", s"$base/subjects").body() shouldBe """["t-value"]"""
      val latest = req("GET", s"$base/subjects/t-value/versions/latest").body()
      latest should include(""""version":2""")
      latest should include(""""id":2""")
      req("GET", s"$base/schemas/ids/999").statusCode() shouldBe 404
      req("GET", s"$base/subjects/none/versions").statusCode() shouldBe 404

      // config: default readback, per-subject override, bad level 422
      req("GET", s"$base/config").body() shouldBe
        """{"compatibilityLevel":"BACKWARD"}"""
      req("PUT", s"$base/config/t-value",
        """{"compatibility":"FULL_TRANSITIVE"}""").statusCode() shouldBe 200
      req("GET", s"$base/config/t-value").body() shouldBe
        """{"compatibilityLevel":"FULL_TRANSITIVE"}"""
      req("PUT", s"$base/config/t-value",
        """{"compatibility":"SIDEWAYS"}""").statusCode() shouldBe 422

      // the wire loop: HttpResolver fetches the registered schema by id
      val resolved = AvroEnvelope.HttpResolver(base).schemaJson(1)
      new org.apache.avro.Schema.Parser().parse(resolved)
        .getFields.size() shouldBe 1
    } finally facade.close()
  }

  test("subject lookup, version deletion holes, subject delete, global config") {
    val store = new SchemaCompat.SubjectStore(SchemaCompat.Backward)
    val facade = new RegistryFacade(store)
    facade.start()
    val base = s"http://127.0.0.1:${facade.boundPort}"
    try {
      val v1 = schemaBody("""{"name":"a","type":"int"}""")
      val v2 = schemaBody("""{"name":"a","type":"int"}""",
        """{"name":"b","type":"string","default":"x"}""")
      val v3 = schemaBody("""{"name":"a","type":"int"}""",
        """{"name":"b","type":"string","default":"x"}""",
        """{"name":"c","type":"long","default":0}""")
      req("POST", s"$base/subjects/s-value/versions", v1).statusCode() shouldBe 200
      req("POST", s"$base/subjects/s-value/versions", v2).statusCode() shouldBe 200
      req("POST", s"$base/subjects/s-value/versions", v3).statusCode() shouldBe 200

      // POST /subjects/{s}: the serializer's exact-schema lookup
      val found = req("POST", s"$base/subjects/s-value", v2)
      found.statusCode() shouldBe 200
      found.body() should include(""""version":2""")
      found.body() should include(""""id":2""")
      val notHere = schemaBody("""{"name":"zzz","type":"int"}""")
      req("POST", s"$base/subjects/s-value", notHere).statusCode() shouldBe 404
      req("POST", s"$base/subjects/ghost", v1).statusCode() shouldBe 404

      // deleting v2 leaves a HOLE: numbers are stable, never reused
      req("DELETE", s"$base/subjects/s-value/versions/2").body() shouldBe "2"
      req("GET", s"$base/subjects/s-value/versions").body() shouldBe "[1,3]"
      req("GET", s"$base/subjects/s-value/versions/2").statusCode() shouldBe 404
      req("GET", s"$base/subjects/s-value/versions/latest").body() should
        include(""""version":3""")
      req("DELETE", s"$base/subjects/s-value/versions/2").statusCode() shouldBe 404
      // the deleted version no longer participates in the lookup,
      // but its schema keeps its immutable global id
      req("POST", s"$base/subjects/s-value", v2).statusCode() shouldBe 404
      req("GET", s"$base/schemas/ids/2").statusCode() shouldBe 200
      // a new registration takes the NEXT slot (4), not the hole
      val v4 = schemaBody("""{"name":"a","type":"int"}""",
        """{"name":"b","type":"string","default":"x"}""",
        """{"name":"c","type":"long","default":0}""",
        """{"name":"d","type":"int","default":7}""")
      req("POST", s"$base/subjects/s-value/versions", v4).statusCode() shouldBe 200
      req("GET", s"$base/subjects/s-value/versions").body() shouldBe "[1,3,4]"

      // DELETE /subjects/{s} reports what was live and empties the list
      req("DELETE", s"$base/subjects/s-value").body() shouldBe "[1,3,4]"
      req("GET", s"$base/subjects").body() shouldBe "[]"
      req("DELETE", s"$base/subjects/s-value").statusCode() shouldBe 404

      // PUT /config: the registry-wide default; subject overrides win
      req("PUT", s"$base/config", """{"compatibility":"NONE"}""")
        .statusCode() shouldBe 200
      req("GET", s"$base/config").body() shouldBe
        """{"compatibilityLevel":"NONE"}"""
      // NONE now admits a previously-breaking evolution
      req("POST", s"$base/subjects/n-value/versions", v1).statusCode() shouldBe 200
      req("POST", s"$base/subjects/n-value/versions",
        schemaBody("""{"name":"q","type":"string"}""")).statusCode() shouldBe 200
      req("PUT", s"$base/config", """{"compatibility":"UPWARD"}""")
        .statusCode() shouldBe 422
    } finally facade.close()
  }
}
