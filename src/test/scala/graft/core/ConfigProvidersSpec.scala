package graft.core

import java.nio.file.Files

import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

/** Connect-style externalized config (`config.providers` seam):
  * `${file:path:key}` / `${env:VAR}` placeholders resolve at USE time;
  * stored specs and config readbacks keep the raw placeholder. */
class ConfigProvidersSpec extends SparkTestBase with Matchers {

  private def propsFile(entries: (String, String)*): String = {
    val f = Files.createTempFile("graft-cfg", ".properties")
    Files.writeString(f,
      entries.map { case (k, v) => s"$k=$v" }.mkString("", "\n", "\n"))
    f.toString
  }

  test("file and env placeholders resolve, mixed with literal text") {
    val path = propsFile("db.password" -> "s3cret", "db.user" -> "svc")
    ConfigProviders.resolveValue(s"$${file:$path:db.password}") shouldBe "s3cret"
    ConfigProviders.resolveValue(
      s"jdbc://$${env:GRAFT_DB_HOST}/app?user=$${file:$path:db.user}",
      env = Map("GRAFT_DB_HOST" -> "db1:5432")) shouldBe
      "jdbc://db1:5432/app?user=svc"
    // values without placeholders pass through untouched
    ConfigProviders.resolveValue("plain") shouldBe "plain"
    // resolved values containing $ or \ must not be re-interpreted by
    // the regex replacement ("\\\\" is the .properties escape for one \)
    val dollar = propsFile("k" -> "pa$$word\\\\1")
    ConfigProviders.resolveValue(s"$${file:$dollar:k}") shouldBe "pa$$word\\1"
  }

  test("a missing env var, file, or key fails loudly — never passes the literal through") {
    an[IllegalArgumentException] should be thrownBy
      ConfigProviders.resolveValue("${env:GRAFT_NO_SUCH_VAR}", env = Map.empty)
    an[java.io.FileNotFoundException] should be thrownBy
      ConfigProviders.resolveValue("${file:/no/such/file.properties:k}")
    val path = propsFile("present" -> "x")
    an[IllegalArgumentException] should be thrownBy
      ConfigProviders.resolveValue(s"$${file:$path:absent}")
    an[IllegalArgumentException] should be thrownBy
      ConfigProviders.resolveValue("${file:nokeyhere}")
  }

  test("specs store the raw placeholder; build resolves it; readback stays raw") {
    val path = propsFile("mask.replacement" -> "HIDDEN")
    val json =
      s"""{"name": "ext-cfg",
         |  "source": {"type": "file", "options": {"format": "parquet",
         |    "path": "/root/testdata/sf0.001/customer.parquet",
         |    "schema": "c_custkey BIGINT, c_name STRING"}},
         |  "transforms": [
         |    {"type": "mask", "options": {"field": "c_name",
         |      "replacement": "$${file:$path:mask.replacement}"}}],
         |  "sink": {"type": "noop"}}""".stripMargin
    val spec = PipelineSpec.fromJson(json)
    // parse time: raw placeholder retained (what GET .../config returns)
    spec.transforms.head.option("replacement") should startWith("${file:")
    spec.toJson should include("${file:")
    // use time: the masked value comes from the properties file
    val out = Pipeline.build(spark, spec, streaming = false)
    out.select("c_name").distinct().collect().map(_.getString(0)) shouldBe Array("HIDDEN")
  }

  test("validateStreamSink validates RESOLVED options (placeholder dialect rejects at submit)") {
    val good = propsFile("dialect" -> "postgres")
    Pipeline.validateStreamSink(StageSpec("jdbc_upsert", Map(
      "url" -> "jdbc:x", "table" -> "t", "pk" -> "id",
      "dialect" -> s"$${file:$good:dialect}", "checkpoint" -> "/ckpt")))
    val bad = propsFile("dialect" -> "oracle9i")
    an[IllegalArgumentException] should be thrownBy
      Pipeline.validateStreamSink(StageSpec("jdbc_upsert", Map(
        "url" -> "jdbc:x", "table" -> "t", "pk" -> "id",
        "dialect" -> s"$${file:$bad:dialect}", "checkpoint" -> "/ckpt")))
  }
}
