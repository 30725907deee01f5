package graft.sinks

import java.sql.DriverManager

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

/** A5's production back-end: dialect MERGE SQL assembly (offline text
  * checks for Postgres/SQLite/MySQL) plus a LIVE end-to-end keyed merge
  * against embedded Derby (the ANSI MERGE dialect) — insert, update,
  * delete, intra-batch dedup, and replay convergence against a real
  * database. */
class JdbcUpsertSpec extends SparkTestBase with Matchers {

  private val cols = Seq("id", "name", "ver")
  private val keys = Seq("id")

  test("Postgres upsert SQL: INSERT .. ON CONFLICT DO UPDATE") {
    PostgresUpsert.upsertSql("public.users", keys, cols) shouldBe
      """INSERT INTO "public"."users" ("id", "name", "ver") VALUES (?, ?, ?) """ +
        """ON CONFLICT ("id") DO UPDATE SET "name" = EXCLUDED."name", "ver" = EXCLUDED."ver""""
    // all-key table degrades to DO NOTHING (nothing to update)
    PostgresUpsert.upsertSql("t", Seq("a", "b"), Seq("a", "b")) shouldBe
      """INSERT INTO "t" ("a", "b") VALUES (?, ?) ON CONFLICT ("a", "b") DO NOTHING"""
    PostgresUpsert.deleteSql("t", Seq("a", "b")) shouldBe
      """DELETE FROM "t" WHERE "a" = ? AND "b" = ?"""
  }

  test("SQLite upsert SQL: INSERT OR REPLACE") {
    SqliteUpsert.upsertSql("users", keys, cols) shouldBe
      """INSERT OR REPLACE INTO "users" ("id", "name", "ver") VALUES (?, ?, ?)"""
  }

  test("MySQL upsert SQL: ON DUPLICATE KEY UPDATE with backtick quoting") {
    MySqlUpsert.upsertSql("users", keys, cols) shouldBe
      "INSERT INTO `users` (`id`, `name`, `ver`) VALUES (?, ?, ?) " +
        "ON DUPLICATE KEY UPDATE `name` = VALUES(`name`), `ver` = VALUES(`ver`)"
    MySqlUpsert.upsertSql("t", Seq("a"), Seq("a")) shouldBe
      "INSERT IGNORE INTO `t` (`a`) VALUES (?)"
  }

  test("ANSI MERGE SQL casts placeholders to the column types") {
    val sql = AnsiMergeUpsert.upsertSql("users", keys, cols,
      Map("id" -> "BIGINT", "name" -> "VARCHAR(64)", "ver" -> "BIGINT"))
    sql should include("MERGE INTO \"users\" AS tgt")
    sql should include("USING (VALUES (CAST(? AS BIGINT), CAST(? AS VARCHAR(64)), CAST(? AS BIGINT)))")
    sql should include("ON tgt.\"id\" = src.\"id\"")
    sql should include("WHEN MATCHED THEN UPDATE SET \"name\" = src.\"name\", \"ver\" = src.\"ver\"")
    sql should include("WHEN NOT MATCHED THEN INSERT")
  }

  test("Derby MERGE SQL drives off SYSDUMMY1 with per-clause typed params") {
    val sql = DerbyUpsert.upsertSql("users", keys, cols,
      Map("id" -> "BIGINT", "name" -> "VARCHAR(64)", "ver" -> "BIGINT"))
    sql should include("USING SYSIBM.SYSDUMMY1")
    sql should include("ON tgt.\"id\" = CAST(? AS BIGINT)")
    sql should include(
      "WHEN MATCHED THEN UPDATE SET \"name\" = CAST(? AS VARCHAR(64)), \"ver\" = CAST(? AS BIGINT)")
    // ON binds keys, UPDATE binds non-keys, INSERT binds the full row
    DerbyUpsert.upsertParams(keys, cols) shouldBe
      Seq("id", "name", "ver", "id", "name", "ver")
  }

  test("dialect lookup is total over the supported family and loud otherwise") {
    UpsertDialect.forName("postgresql") shouldBe PostgresUpsert
    UpsertDialect.forName("derby") shouldBe DerbyUpsert
    UpsertDialect.forName("db2") shouldBe AnsiMergeUpsert
    intercept[IllegalArgumentException](UpsertDialect.forName("oracle"))
  }

  // ---------- live end-to-end against embedded Derby ----------

  private def derbyUrl(db: String) = s"jdbc:derby:memory:$db;create=true"

  private def tableState(url: String, table: String): Map[Long, (String, Long)] = {
    val conn = DriverManager.getConnection(url)
    try {
      val rs = conn.createStatement()
        .executeQuery(s"""SELECT "id", "name", "ver" FROM "$table"""")
      val out = scala.collection.mutable.Map.empty[Long, (String, Long)]
      while (rs.next()) out(rs.getLong(1)) = (rs.getString(2), rs.getLong(3))
      out.toMap
    } finally conn.close()
  }

  test("JdbcKeyedTable merges insert/update/delete/replay into live Derby") {
    val ss = spark
    import ss.implicits._
    val url = derbyUrl("graft_merge")
    val conn = DriverManager.getConnection(url)
    conn.createStatement().execute(
      """CREATE TABLE "events_state" ("id" BIGINT PRIMARY KEY,
        | "name" VARCHAR(64), "ver" BIGINT)""".stripMargin)
    conn.close()

    val t = new JdbcKeyedTable(url, "events_state", Seq("id"), DerbyUpsert)
    def batch(rows: (Long, String, Long, String)*) =
      rows.toDF("id", "name", "ver", "__deleted")
    val order = Seq(col("ver").desc)
    val isDelete = col("__deleted") === "true"

    // epoch 0: inserts incl. intra-batch dedup (id 2 ver 2 wins)
    t.merge(batch((1L, "a", 1L, "false"), (2L, "b", 1L, "false"),
      (2L, "b2", 2L, "false"), (3L, "c", 1L, "false")), 0L, order, isDelete)
    tableState(url, "events_state").view.mapValues(_._1).toMap shouldBe
      Map(1L -> "a", 2L -> "b2", 3L -> "c")

    // epoch 1: update id 1, delete id 3
    t.merge(batch((1L, "a9", 9L, "false"), (3L, "c", 9L, "true")),
      1L, order, isDelete)
    tableState(url, "events_state").view.mapValues(_._1).toMap shouldBe
      Map(1L -> "a9", 2L -> "b2")

    // replaying the same epoch converges to the same state (idempotent
    // MERGE under at-least-once delivery)
    t.merge(batch((1L, "a9", 9L, "false"), (3L, "c", 9L, "true")),
      1L, order, isDelete)
    tableState(url, "events_state").view.mapValues(_._1).toMap shouldBe
      Map(1L -> "a9", 2L -> "b2")

    // delete of an absent key is a no-op, not an error
    t.merge(batch((99L, "x", 1L, "true")), 2L, order, isDelete)
    tableState(url, "events_state").view.mapValues(_._1).toMap shouldBe
      Map(1L -> "a9", 2L -> "b2")
  }

  test("Pipeline jdbc_upsert sink streams a file source into live Derby") {
    val ss = spark
    import ss.implicits._
    val url = derbyUrl("graft_pipe")
    val c = DriverManager.getConnection(url)
    c.createStatement().execute(
      """CREATE TABLE "pipe_state" ("id" BIGINT PRIMARY KEY,
        | "name" VARCHAR(64), "ver" BIGINT)""".stripMargin)
    c.close()

    val inDir = java.nio.file.Files.createTempDirectory("graft-jdbc-in").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-jdbc-ckpt").toString
    Seq((1L, "a", 1L, "false"), (2L, "b", 1L, "false"), (1L, "a2", 2L, "false"))
      .toDF("id", "name", "ver", "__deleted")
      .write.mode("overwrite").parquet(inDir)

    val json =
      s"""{
         |  "name": "jdbc-pipe",
         |  "source": {"type": "file", "options": {
         |    "format": "parquet", "path": "$inDir",
         |    "schema": "id BIGINT, name STRING, ver BIGINT, __deleted STRING"}},
         |  "transforms": [],
         |  "sink": {"type": "jdbc_upsert", "options": {
         |    "url": "$url", "table": "pipe_state", "pk": "id",
         |    "dialect": "derby", "order": "ver",
         |    "checkpoint": "$ckpt", "trigger": "availableNow"}}
         |}""".stripMargin
    val reg = new graft.core.PipelineRegistry(spark)
    val spec = graft.core.PipelineSpec.fromJson(json)
    val q = reg.submit(spec)
    q.awaitTermination()
    tableState(url, "pipe_state").view.mapValues(_._1).toMap shouldBe
      Map(1L -> "a2", 2L -> "b")

    // a bad dialect must be rejected at submit time (static validation)
    val bad = json.replace("\"dialect\": \"derby\"", "\"dialect\": \"oracle\"")
      .replace("jdbc-pipe", "jdbc-pipe-bad")
    intercept[IllegalArgumentException](
      reg.submit(graft.core.PipelineSpec.fromJson(bad)))
  }
}
