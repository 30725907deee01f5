package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase
import graft.operators.{Dedup, Sampling}

/** The LLM corpus-prep stage types (`dedup_exact`, `quality_gate`,
  * `lang_id`, `hash_sample`) — declarative config delegating to the
  * oracle-gated operator library. Each batch stage is pinned EQUAL to
  * the library call it wraps (the q254 correctness query pins the whole
  * chain against q49's oracle); the streaming dedup contract (watermark
  * required, replays dropped) is pinned on a live file-stream. */
class CorpusPrepStagesSpec extends SparkTestBase with Matchers {
  import spark.implicits._

  private def t(ty: String, opts: (String, String)*): StageSpec =
    StageSpec(ty, opts.toMap)
  private def apply1(df: DataFrame, s: StageSpec): DataFrame =
    Pipeline.applyTransform(df, s)

  private lazy val docs = Seq(
    (1L, "the cat sat on the mat today", "en"),
    (2L, "The cat sat on the mat today  ", "en"), // dup after normText
    (3L, "el gato y la casa y los perros", "es"),
    (4L, "the a of and in to is", "en"), // all stopwords: gate drops
    (5L, "short text", "en")) // under min.tokens=3? no — 2 tokens
    .toDF("doc_id", "text", "lang")

  test("dedup_exact batch == exactSurvivors semi-join (min id per " +
    "normalized text survives)") {
    val out = apply1(docs,
      t("dedup_exact", "id.field" -> "doc_id", "text.field" -> "text"))
    out.columns shouldBe docs.columns // schema passes through
    out.select("doc_id").as[Long].collect().sorted shouldBe
      Seq(1L, 3L, 4L, 5L)
    // pinned equal to the library call it delegates to
    val lib = docs.join(
      Dedup.exactSurvivors(docs, "doc_id", "text"), Seq("doc_id"), "left_semi")
    out.collect().toSet shouldBe lib.collect().toSet
  }

  test("quality_gate: integer token/stopword thresholds, custom " +
    "stopwords, permille boundary is strict") {
    val kept = apply1(docs,
      t("quality_gate", "text.field" -> "text", "min.tokens" -> "3"))
      .select("doc_id").as[Long].collect().sorted
    // doc4 is 7 tokens all stopwords (drops); doc5 has 2 tokens (drops);
    // docs 1/2/3 pass (doc3 has zero default-list stopwords)
    kept shouldBe Seq(1L, 2L, 3L)
    // strictly-under contract: "b b a a" with stopword a is exactly
    // 500 permille -> dropped at the default threshold, kept at 501
    val edge = Seq((1L, "b b a a")).toDF("doc_id", "text")
    apply1(edge, t("quality_gate", "text.field" -> "text",
      "min.tokens" -> "1", "stopwords" -> "a")).count() shouldBe 0L
    apply1(edge, t("quality_gate", "text.field" -> "text",
      "min.tokens" -> "1", "stopwords" -> "a",
      "max.stop.permille" -> "501")).count() shouldBe 1L
    intercept[IllegalArgumentException] {
      apply1(edge, t("quality_gate", "text.field" -> "text",
        "max.stop.permille" -> "1001"))
    }
  }

  test("lang_id: marker argmax with ties to the earliest label, " +
    "custom markers, malformed markers reject") {
    val out = apply1(docs, t("lang_id", "text.field" -> "text"))
      .select("doc_id", "predicted_lang").as[(Long, String)]
      .collect().toMap
    out(1L) shouldBe "en"
    out(3L) shouldBe "es"
    // zero marker hits everywhere ties all scores -> earliest label
    val none = Seq((1L, "xyzzy qwerty")).toDF("doc_id", "text")
    apply1(none, t("lang_id", "text.field" -> "text"))
      .select("predicted_lang").as[String].head() shouldBe "de"
    // custom 2-label markers + custom output column
    val custom = apply1(Seq((1L, "foo bar baz")).toDF("doc_id", "text"),
      t("lang_id", "text.field" -> "text",
        "markers" -> "aa:foo|bar,bb:baz", "as" -> "guess"))
    custom.columns should contain("guess")
    custom.select("guess").as[String].head() shouldBe "aa"
    intercept[IllegalArgumentException] {
      apply1(docs, t("lang_id", "text.field" -> "text",
        "markers" -> "only_one:w"))
    }
    intercept[IllegalArgumentException] {
      apply1(docs, t("lang_id", "text.field" -> "text",
        "markers" -> "no-colon-entry"))
    }
  }

  test("hash_sample == Sampling.hashSample; permille 0 and 1000 are " +
    "empty and identity") {
    val ids = spark.range(0, 1000).toDF("doc_id")
    val staged = apply1(ids,
      t("hash_sample", "id.field" -> "doc_id", "permille" -> "250"))
    val lib = Sampling.hashSample(ids, "doc_id", 250)
    staged.as[Long].collect().sorted shouldBe lib.as[Long].collect().sorted
    apply1(ids, t("hash_sample", "id.field" -> "doc_id",
      "permille" -> "0")).count() shouldBe 0L
    apply1(ids, t("hash_sample", "id.field" -> "doc_id",
      "permille" -> "1000")).count() shouldBe 1000L
  }

  test("dedup_neardup == nearDupPairs -> dupClusters -> min-id keeper " +
    "(the q60 composition); unclustered docs survive") {
    // 1/2 are near-dups (one token differs over shared 3-shingles);
    // 3 is unrelated; 4 is too short to shingle (always survives)
    val nd = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota lambda"),
      (3L, "one two three four five six seven eight nine ten"),
      (4L, "hi")).toDF("doc_id", "text")
    val out = apply1(nd, t("dedup_neardup",
      "id.field" -> "doc_id", "text.field" -> "text",
      "threshold" -> "0.5"))
    out.columns shouldBe nd.columns
    out.select("doc_id").as[Long].collect().sorted shouldBe Seq(1L, 3L, 4L)
    // pinned equal to the library composition it delegates to
    val pairs = Dedup.nearDupPairs(nd, "doc_id", "text", threshold = 0.5)
    val clusters = Dedup.dupClusters(pairs, "d1", "d2")
    val drop = clusters.filter(col("id") =!= col("cluster_id"))
      .select(col("id").as("doc_id"))
    val lib = nd.join(drop, Seq("doc_id"), "left_anti")
    out.collect().toSet shouldBe lib.collect().toSet
    // option validation is loud at build time
    intercept[IllegalArgumentException] {
      apply1(nd, t("dedup_neardup", "id.field" -> "doc_id",
        "text.field" -> "text", "threshold" -> "1.5"))
    }
    intercept[IllegalArgumentException] {
      apply1(nd, t("dedup_neardup", "text.field" -> "text"))
    }
  }

  test("quality_keeper keeps each cluster's highest-scored member " +
    "(score desc, id asc), not the min id; batch-only rejects a stream") {
    val nd = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota lambda"),
      (3L, "one two three four five six seven eight nine ten"))
      .toDF("doc_id", "text")
    val out = apply1(nd, t("quality_keeper",
      "id.field" -> "doc_id", "text.field" -> "text",
      "threshold" -> "0.5"))
    // the keeper of cluster {1, 2} is its argmax hashed score
    val pairs = Dedup.nearDupPairs(nd, "doc_id", "text", threshold = 0.5)
    val clusters = Dedup.dupClusters(pairs, "d1", "d2")
    val scored = graft.operators.TextMetrics.hashedLinearScoreInRow(
      nd, "doc_id", "text", dims = 64)
    val keeper = Dedup.qualityCanonical(clusters, "id", "cluster_id",
      scored, "doc_id", "score").select("keeper_id").as[Long].head()
    out.select("doc_id").as[Long].collect().sorted shouldBe
      Seq(keeper, 3L).sorted
    // streaming submit rejects loudly (validate-path contract)
    val rate = spark.readStream.format("rate").load()
      .withColumn("text", concat(lit("t"), col("value")))
    val err = intercept[IllegalArgumentException] {
      apply1(rate, t("quality_keeper",
        "id.field" -> "value", "text.field" -> "text"))
    }
    err.getMessage should include("batch-only")
  }

  test("dedup_neardup_embedding_incremental top.k bounds each arriving " +
    "doc to its k best matches; streaming submit with top.k rejects") {
    import graft.operators.Similarity
    val planes = Similarity.hyperplanes(8, 64, 42L)
    val emb = graft.core.Tables.embeddings(spark, sf0001)
      .withColumn("e", col("embedding").cast("array<double>"))
    val idx = java.nio.file.Files
      .createTempDirectory("graft-cps-embidx").toString
    Dedup.embeddingCodeRows(emb.filter(col("vec_id") % 10 =!= 0),
      "vec_id", "e", planes).write.mode("overwrite").parquet(idx)
    val arriving = emb.filter(col("vec_id") % 10 === 0)
      .select(col("vec_id"), col("embedding"))
    val out = apply1(arriving, t("dedup_neardup_embedding_incremental",
        "id.field" -> "vec_id", "vec.field" -> "embedding",
        "index.path" -> idx, "top.k" -> "3"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    val lib = Dedup.embeddingNearDupAgainstIndexTopK(
        emb.filter(col("vec_id") % 10 === 0), "vec_id", "e",
        spark.read.parquet(idx), planes, codeRadius = 2,
        threshold = 0.3, k = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    out should not be empty
    out.sorted shouldBe lib.sorted
    out.groupBy(_._1).values.foreach(_.length should be <= 3)
    // a streaming submit with top.k must reject loudly — per-doc
    // ranking is an aggregation, not an append-safe map
    val rate = spark.readStream.format("rate").load()
      .withColumn("embedding",
        array_repeat(col("value").cast("double"), 64))
    val err = intercept[IllegalArgumentException] {
      apply1(rate, t("dedup_neardup_embedding_incremental",
        "id.field" -> "value", "vec.field" -> "embedding",
        "index.path" -> idx, "top.k" -> "3"))
    }
    err.getMessage should include("batch-only")
  }

  test("ann_serve stage == the library serve it delegates to (ivf " +
    "gear); unknown model.type rejects loudly") {
    import graft.operators.Similarity
    val emb = graft.core.Tables.embeddings(spark, sf0001)
      .withColumn("e", col("embedding").cast("array<double>"))
    val hist = emb.filter(col("vec_id") % 10 =!= 0)
    val model = java.nio.file.Files
      .createTempDirectory("graft-cps-annmodel").toString
    val cents = Similarity.kmeansCentroids(hist, "vec_id", "e",
        centroidStride = 37, iters = 1, dim = 64)
      .select(col("__cid"), col("__cv"))
    cents.write.mode("overwrite").parquet(s"$model/centroids")
    Similarity.ivfCellIndex(hist, "vec_id", "e", cents)
      .write.mode("overwrite").parquet(s"$model/cells")
    val probes = emb.filter(col("vec_id") % 10 === 0)
      .select(col("vec_id"), col("embedding"))
    val out = apply1(probes, t("ann_serve",
        "model.type" -> "ivf", "model.path" -> model,
        "id.field" -> "vec_id", "vec.field" -> "embedding",
        "k" -> "3", "nprobe" -> "4"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    val lib = Similarity.ivfServe(
        spark.read.parquet(s"$model/cells"),
        spark.read.parquet(s"$model/centroids"),
        emb.filter(col("vec_id") % 10 === 0), "vec_id", "e",
        k = 3, nprobe = 4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    out should not be empty
    out.sorted shouldBe lib.sorted
    val err = intercept[IllegalArgumentException] {
      apply1(probes, t("ann_serve",
        "model.type" -> "hnsw", "model.path" -> model,
        "id.field" -> "vec_id", "vec.field" -> "embedding"))
    }
    err.getMessage should include("unknown model.type")
  }

  test("streaming dedup_exact REQUIRES the watermark options (bounded " +
    "state is not optional) and drops in-stream replays") {
    val rate = spark.readStream.format("rate").load()
      .withColumn("text", concat(lit("t"), col("value")))
    // missing watermark.field rejects at plan time, before start()
    val err = intercept[IllegalArgumentException] {
      apply1(rate, t("dedup_exact",
        "id.field" -> "value", "text.field" -> "text"))
    }
    err.getMessage should include("watermark.field")

    // live replay-drop: the same record delivered twice (at-least-once
    // delivery) reaches the sink once; distinct texts all survive
    val dir = java.nio.file.Files.createTempDirectory("graft-cps-in").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-cps-ck").toString
    Seq(
      (1L, "alpha beta", java.sql.Timestamp.valueOf("2024-01-01 00:00:00")),
      (1L, "alpha beta", java.sql.Timestamp.valueOf("2024-01-01 00:00:01")),
      (2L, "gamma delta", java.sql.Timestamp.valueOf("2024-01-01 00:00:02")))
      .toDF("doc_id", "text", "ts").coalesce(1)
      .write.mode("overwrite").parquet(dir)
    val src = spark.readStream.schema("doc_id BIGINT, text STRING, ts TIMESTAMP")
      .parquet(dir)
    val deduped = apply1(src, t("dedup_exact",
      "id.field" -> "doc_id", "text.field" -> "text",
      "watermark.field" -> "ts", "watermark.delay" -> "10 seconds"))
    val q = deduped.writeStream.format("memory").queryName("cps_dedup")
      .option("checkpointLocation", ckpt).outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("cps_dedup").select("doc_id", "text")
      .as[(Long, String)].collect().sorted
    got shouldBe Seq((1L, "alpha beta"), (2L, "gamma delta"))
  }
}
