package graft.core

import java.nio.file.Files

import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

/** The connector-REST lifecycle twin (§3.1): submit → RUNNING,
  * re-submit replaces without losing checkpointed offsets, delete stops
  * and forgets. */
class PipelineRegistrySpec extends SparkTestBase with Matchers {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def specJson(name: String, inDir: String, ckpt: String,
                       outDir: String, masked: Boolean): String = {
    val transforms =
      if (masked) """[{"type": "mask", "options": {"field": "secret"}}]"""
      else "[]"
    s"""{
       |  "name": "$name",
       |  "source": {"type": "file", "options": {
       |    "format": "parquet", "path": "$inDir",
       |    "schema": "id BIGINT, secret STRING"}},
       |  "transforms": $transforms,
       |  "sink": {"type": "file", "options": {
       |    "format": "parquet", "path": "$outDir", "checkpoint": "$ckpt",
       |    "trigger.ms": "50"}}
       |}""".stripMargin
  }

  test("submit/status/replace/delete lifecycle with checkpointed replace") {
    val ss = spark
    import ss.implicits._
    val inDir = tmp("graft-reg-in")
    val ckpt = tmp("graft-reg-ckpt")
    val out = tmp("graft-reg-out")
    val reg = new PipelineRegistry(spark)

    Seq((1L, "s1"), (2L, "s2")).toDF("id", "secret")
      .write.mode("overwrite").parquet(inDir)

    reg.status("p1") shouldBe reg.Unknown
    reg.submit(PipelineSpec.fromJson(specJson("p1", inDir, ckpt, out, masked = false)))
    reg.status("p1") shouldBe reg.Running
    reg.names shouldBe Seq("p1")
    reg.drain("p1") shouldBe true
    spark.read.parquet(out).count() shouldBe 2

    // config update: same name, same checkpoint + sink, new transform
    // chain — the replacement resumes from the stored offsets (the
    // reference's PUT-config restart path), so rows 1–2 are NOT
    // reprocessed and only NEW input flows through the new (masking)
    // config. Replace BEFORE appending: the old unmasked query is
    // still triggering and would race for the new file otherwise.
    reg.submit(PipelineSpec.fromJson(specJson("p1", inDir, ckpt, out, masked = true)))
    Seq((3L, "s3")).toDF("id", "secret").write.mode("append").parquet(inDir)
    reg.drain("p1") shouldBe true
    val rows = spark.read.parquet(out)
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    rows shouldBe Array((1L, "s1"), (2L, "s2"), (3L, "CENSORED"))

    reg.delete("p1") shouldBe true
    reg.status("p1") shouldBe reg.Unknown
    reg.delete("p1") shouldBe false
  }

  test("pause keeps the config and offsets; resume continues without reprocessing") {
    val ss = spark
    import ss.implicits._
    val inDir = tmp("graft-reg-pr-in")
    val ckpt = tmp("graft-reg-pr-ckpt")
    val out = tmp("graft-reg-pr-out")
    val reg = new PipelineRegistry(spark)

    Seq((1L, "s1")).toDF("id", "secret").write.mode("overwrite").parquet(inDir)
    reg.submit(PipelineSpec.fromJson(specJson("pp", inDir, ckpt, out, masked = false)))
    reg.drain("pp") shouldBe true
    spark.read.parquet(out).count() shouldBe 1

    // pause: stops processing, stays configured (Connect PUT .../pause)
    reg.pause("pp") shouldBe true
    reg.status("pp") shouldBe reg.Paused
    reg.names shouldBe Seq("pp") // paused names stay listed
    reg.pause("pp") shouldBe true // idempotent
    Seq((2L, "s2")).toDF("id", "secret").write.mode("append").parquet(inDir)
    Thread.sleep(200) // paused: the new file must NOT be consumed
    spark.read.parquet(out).count() shouldBe 1

    // resume: picks up from the checkpoint — row 1 is not reprocessed,
    // row 2 (arrived while paused) flows through
    reg.resume("pp") shouldBe true
    reg.status("pp") shouldBe reg.Running
    reg.drain("pp") shouldBe true
    spark.read.parquet(out).collect().map(_.getLong(0)).sorted shouldBe Array(1L, 2L)

    // restart: bounce through the checkpoint, no data loss or replay
    reg.restart("pp") shouldBe true
    reg.status("pp") shouldBe reg.Running
    Seq((3L, "s3")).toDF("id", "secret").write.mode("append").parquet(inDir)
    reg.drain("pp") shouldBe true
    spark.read.parquet(out).collect().map(_.getLong(0)).sorted shouldBe Array(1L, 2L, 3L)

    // unknown names: pause/resume/restart are all false
    reg.pause("nope") shouldBe false
    reg.resume("nope") shouldBe false
    reg.restart("nope") shouldBe false

    // delete forgets a paused name too
    reg.pause("pp") shouldBe true
    reg.delete("pp") shouldBe true
    reg.status("pp") shouldBe reg.Unknown
    reg.names shouldBe empty
  }

  test("a bad replacement config leaves the healthy pipeline running") {
    val ss = spark
    import ss.implicits._
    val inDir = tmp("graft-reg-keep-in")
    val ckpt = tmp("graft-reg-keep-ckpt")
    val out = tmp("graft-reg-keep-out")
    val reg = new PipelineRegistry(spark)
    Seq((1L, "s1")).toDF("id", "secret").write.mode("overwrite").parquet(inDir)
    reg.submit(PipelineSpec.fromJson(specJson("pkeep", inDir, ckpt, out, masked = false)))
    reg.status("pkeep") shouldBe reg.Running

    // the reference's PUT-config contract: a rejected config (here an
    // unknown transform type) must NOT take down the running connector
    val bad = s"""{
       |  "name": "pkeep",
       |  "source": {"type": "file", "options": {
       |    "format": "parquet", "path": "$inDir",
       |    "schema": "id BIGINT, secret STRING"}},
       |  "transforms": [{"type": "no_such_transform", "options": {}}],
       |  "sink": {"type": "file", "options": {
       |    "format": "parquet", "path": "$out", "checkpoint": "$ckpt",
       |    "trigger.ms": "50"}}
       |}""".stripMargin
    intercept[IllegalArgumentException](reg.submit(PipelineSpec.fromJson(bad)))
    reg.status("pkeep") shouldBe reg.Running

    // a bad SINK (unknown type / missing required option) must be caught
    // by the static sink validation, also without stopping the old query
    val badSink = s"""{
       |  "name": "pkeep",
       |  "source": {"type": "file", "options": {
       |    "format": "parquet", "path": "$inDir",
       |    "schema": "id BIGINT, secret STRING"}},
       |  "transforms": [],
       |  "sink": {"type": "file", "options": {"format": "parquet", "path": "$out"}}
       |}""".stripMargin // no checkpoint
    intercept[IllegalArgumentException](reg.submit(PipelineSpec.fromJson(badSink)))
    reg.status("pkeep") shouldBe reg.Running
    reg.drain("pkeep") shouldBe true
    spark.read.parquet(out).count() shouldBe 1
    reg.delete("pkeep") shouldBe true
  }

  test("a replacement that fails at start() rolls back to the old pipeline") {
    val ss = spark
    import ss.implicits._
    val inDir = tmp("graft-reg-rb-in")
    val ckpt = tmp("graft-reg-rb-ckpt")
    val out = tmp("graft-reg-rb-out")
    val reg = new PipelineRegistry(spark)
    Seq((1L, "s1")).toDF("id", "secret").write.mode("overwrite").parquet(inDir)
    reg.submit(PipelineSpec.fromJson(specJson("prb", inDir, ckpt, out, masked = false)))
    reg.drain("prb") shouldBe true
    reg.status("prb") shouldBe reg.Running

    // validation passes (known sink type, checkpoint option present) but
    // start() itself fails: the checkpoint location is a regular FILE, so
    // Spark cannot create the checkpoint directory. The registry must
    // restart the old spec from its checkpoint rather than leave the name
    // dead — the reference's PUT-config contract extended to start()-time
    // failures.
    val ckptFile = Files.createTempFile("graft-reg-rb-notadir", ".tmp").toString
    intercept[Exception](
      reg.submit(PipelineSpec.fromJson(specJson("prb", inDir, ckptFile, out, masked = true))))
    reg.status("prb") shouldBe reg.Running

    // the rolled-back pipeline still processes new input with the OLD config
    Seq((2L, "s2")).toDF("id", "secret").write.mode("append").parquet(inDir)
    reg.drain("prb") shouldBe true
    val rows = spark.read.parquet(out)
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    rows shouldBe Array((1L, "s1"), (2L, "s2"))
    reg.delete("prb") shouldBe true
  }

  test("a pipeline that fails at runtime reports FAILED with its cause") {
    val ss = spark
    import ss.implicits._
    val inDir = tmp("graft-reg-fail-in")
    val reg = new PipelineRegistry(spark)
    // non-numeric strings: the ANSI cast inside the filter blows up on
    // the first micro-batch, AFTER the query starts successfully
    Seq((1L, "not-a-number")).toDF("id", "secret")
      .write.mode("overwrite").parquet(inDir)
    val json =
      s"""{
         |  "name": "pfail",
         |  "source": {"type": "file", "options": {
         |    "format": "parquet", "path": "$inDir",
         |    "schema": "id BIGINT, secret STRING"}},
         |  "transforms": [{"type": "filter", "options": {"predicate": "CAST(secret AS INT) > 0"}}],
         |  "sink": {"type": "file", "options": {
         |    "format": "parquet", "path": "${tmp("graft-reg-fail-out")}",
         |    "checkpoint": "${tmp("graft-reg-fail-ckpt")}", "trigger.ms": "50"}}
         |}""".stripMargin
    val q = reg.submit(PipelineSpec.fromJson(json))
    intercept[Exception](q.processAllAvailable())
    reg.status("pfail") shouldBe a[reg.Failed]
    reg.delete("pfail") shouldBe true
  }
}
