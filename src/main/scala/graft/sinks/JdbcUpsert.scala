package graft.sinks

import java.sql.DriverManager

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Relational

/**
 * Dialect-specific SQL for keyed JDBC upserts — the production back-end
 * of `ParquetKeyedTable`'s MERGE semantics (A5). The reference's JDBC
 * sink upserts via per-dialect rewrites of INSERT
 * (confluent-hub-components/confluentinc-kafka-connect-jdbc-10.8.0/
 * manifest.json:5 "idempotent writes with upserts";
 * etc/sink-quickstart-sqlite.properties:19-29 `insert.mode=upsert` +
 * `pk.fields`); these four generators cover the same dialect family.
 *
 * All SQL uses `?` placeholders in the column order handed to
 * `upsertSql`, so one PreparedStatement serves every row of a batch.
 */
sealed trait UpsertDialect extends Serializable {
  def name: String

  /** Standard double-quote identifier quoting; dialects override. */
  def quote(id: String): String = "\"" + id.replace("\"", "\"\"") + "\""

  /** Dotted names quote each part (schema-qualified tables). */
  def quoteTable(table: String): String =
    table.split('.').map(quote).mkString(".")

  /** One-statement insert-or-update with `?` per column, `cols` order.
    * `sqlTypes` (column → SQL type) is used by dialects that must CAST
    * placeholders (ANSI MERGE); others ignore it. */
  def upsertSql(table: String, keyCols: Seq[String], cols: Seq[String],
                sqlTypes: Map[String, String] = Map.empty): String

  /** The column bound to each `?` of `upsertSql`, in placeholder order
    * (names may repeat — dialects whose statement mentions a column in
    * several clauses override this). */
  def upsertParams(keyCols: Seq[String], cols: Seq[String]): Seq[String] = cols

  /** Keyed delete (A2/A3 tombstone application), `?` per key column. */
  def deleteSql(table: String, keyCols: Seq[String]): String =
    s"DELETE FROM ${quoteTable(table)} WHERE " +
      keyCols.map(k => s"${quote(k)} = ?").mkString(" AND ")
}

/** PostgreSQL: `INSERT ... ON CONFLICT (pk) DO UPDATE SET c = EXCLUDED.c`
  * (DO NOTHING when every column is a key). */
case object PostgresUpsert extends UpsertDialect {
  val name = "postgres"
  def upsertSql(table: String, keyCols: Seq[String], cols: Seq[String],
                sqlTypes: Map[String, String]): String = {
    val nonKeys = cols.filterNot(keyCols.contains)
    val action =
      if (nonKeys.isEmpty) "DO NOTHING"
      else "DO UPDATE SET " +
        nonKeys.map(c => s"${quote(c)} = EXCLUDED.${quote(c)}").mkString(", ")
    s"INSERT INTO ${quoteTable(table)} (${cols.map(quote).mkString(", ")}) " +
      s"VALUES (${cols.map(_ => "?").mkString(", ")}) " +
      s"ON CONFLICT (${keyCols.map(quote).mkString(", ")}) $action"
  }
}

/** SQLite: `INSERT OR REPLACE` (the reference's sqlite quickstart target,
  * etc/sink-quickstart-sqlite.properties:19-29). Whole-row replace —
  * exactly the newest-wins contract after batch-local dedup. */
case object SqliteUpsert extends UpsertDialect {
  val name = "sqlite"
  def upsertSql(table: String, keyCols: Seq[String], cols: Seq[String],
                sqlTypes: Map[String, String]): String =
    s"INSERT OR REPLACE INTO ${quoteTable(table)} " +
      s"(${cols.map(quote).mkString(", ")}) " +
      s"VALUES (${cols.map(_ => "?").mkString(", ")})"
}

/** MySQL: backtick quoting, `ON DUPLICATE KEY UPDATE c = VALUES(c)`
  * (`INSERT IGNORE` when every column is a key). */
case object MySqlUpsert extends UpsertDialect {
  val name = "mysql"
  override def quote(id: String): String = "`" + id.replace("`", "``") + "`"
  def upsertSql(table: String, keyCols: Seq[String], cols: Seq[String],
                sqlTypes: Map[String, String]): String = {
    val nonKeys = cols.filterNot(keyCols.contains)
    val head =
      if (nonKeys.isEmpty) s"INSERT IGNORE INTO ${quoteTable(table)}"
      else s"INSERT INTO ${quoteTable(table)}"
    val tail =
      if (nonKeys.isEmpty) ""
      else " ON DUPLICATE KEY UPDATE " +
        nonKeys.map(c => s"${quote(c)} = VALUES(${quote(c)})").mkString(", ")
    s"$head (${cols.map(quote).mkString(", ")}) " +
      s"VALUES (${cols.map(_ => "?").mkString(", ")})$tail"
  }
}

/** ANSI/Derby `MERGE INTO ... USING (VALUES ...)`. Derby rejects untyped
  * `?` inside VALUES, so placeholders are CAST to the column's SQL type —
  * pass `sqlTypes` (see `JdbcKeyedTable.sqlTypesFor`). */
case object AnsiMergeUpsert extends UpsertDialect {
  val name = "ansi"
  def upsertSql(table: String, keyCols: Seq[String], cols: Seq[String],
                sqlTypes: Map[String, String]): String = {
    val nonKeys = cols.filterNot(keyCols.contains)
    def ph(c: String): String =
      sqlTypes.get(c).map(t => s"CAST(? AS $t)").getOrElse("?")
    val matched =
      if (nonKeys.isEmpty) ""
      else " WHEN MATCHED THEN UPDATE SET " +
        nonKeys.map(c => s"${quote(c)} = src.${quote(c)}").mkString(", ")
    s"MERGE INTO ${quoteTable(table)} AS tgt " +
      s"USING (VALUES (${cols.map(ph).mkString(", ")})) " +
      s"AS src (${cols.map(quote).mkString(", ")}) " +
      s"ON ${keyCols.map(k => s"tgt.${quote(k)} = src.${quote(k)}").mkString(" AND ")}" +
      matched +
      s" WHEN NOT MATCHED THEN INSERT (${cols.map(quote).mkString(", ")}) " +
      s"VALUES (${cols.map(c => s"src.${quote(c)}").mkString(", ")})"
  }
}

/** Derby: MERGE whose source must be a base table (Derby rejects
  * `USING (VALUES ...)`), so the one-row catalog table SYSIBM.SYSDUMMY1
  * drives the statement and every value binds where its clause uses it —
  * ON gets the keys, UPDATE the non-keys, INSERT the full row (see
  * `upsertParams`). Placeholders are CAST: Derby requires typed
  * parameters in these positions. */
case object DerbyUpsert extends UpsertDialect {
  val name = "derby"
  def upsertSql(table: String, keyCols: Seq[String], cols: Seq[String],
                sqlTypes: Map[String, String]): String = {
    val nonKeys = cols.filterNot(keyCols.contains)
    def ph(c: String): String =
      sqlTypes.get(c).map(t => s"CAST(? AS $t)").getOrElse("?")
    val matched =
      if (nonKeys.isEmpty) ""
      else " WHEN MATCHED THEN UPDATE SET " +
        nonKeys.map(c => s"${quote(c)} = ${ph(c)}").mkString(", ")
    s"MERGE INTO ${quoteTable(table)} AS tgt USING SYSIBM.SYSDUMMY1 " +
      s"ON ${keyCols.map(k => s"tgt.${quote(k)} = ${ph(k)}").mkString(" AND ")}" +
      matched +
      s" WHEN NOT MATCHED THEN INSERT (${cols.map(quote).mkString(", ")}) " +
      s"VALUES (${cols.map(ph).mkString(", ")})"
  }
  override def upsertParams(keyCols: Seq[String], cols: Seq[String]): Seq[String] =
    keyCols ++ cols.filterNot(keyCols.contains) ++ cols
}

object UpsertDialect {
  def forName(name: String): UpsertDialect = name.toLowerCase match {
    case "postgres" | "postgresql" => PostgresUpsert
    case "sqlite"                  => SqliteUpsert
    case "mysql" | "mariadb"       => MySqlUpsert
    case "derby"                   => DerbyUpsert
    case "ansi" | "db2"            => AnsiMergeUpsert
    case other =>
      throw new IllegalArgumentException(s"unknown upsert dialect '$other'")
  }
}

/**
 * Keyed JDBC table with MERGE semantics — `ParquetKeyedTable`'s contract
 * (batch-local newest-wins dedup, upsert-or-delete per key) executed
 * against a real database through the dialect generators above.
 *
 * Distribution: after the batch collapses to one row per key
 * (`latestStatePerKey` — one shuffle), every partition opens its own
 * connection and writes its rows as one JDBC batch in one transaction —
 * the standard executor-side JDBC write (no driver funnel). Partitions
 * touch disjoint keys (one row per key), and rows are sorted by key
 * within each partition so concurrent transactions acquire row locks in
 * a consistent order (deadlock hygiene on real databases).
 *
 * Delivery: Structured Streaming's foreachBatch is at-least-once; a
 * replayed epoch re-applies the same per-key upserts/deletes, which
 * converge to the same table state — idempotent MERGE, the same
 * guarantee the reference's JDBC sink documents (manifest.json:5).
 */
final class JdbcKeyedTable(url: String, table: String,
                           val keyCols: Seq[String],
                           dialect: UpsertDialect,
                           connProps: Map[String, String] = Map.empty)
    extends Serializable {
  require(keyCols.nonEmpty, "keyCols must be non-empty")

  /** MERGE one micro-batch: collapse to newest-per-key, apply deletes
    * (rows matching `isDelete`) and upserts in per-partition JDBC
    * transactions. `__`-prefixed columns (the engine's A4 metadata
    * convention — `__ts_ms`, `__op`, `__deleted`, ...) steer ordering
    * and the delete predicate but are NEVER written to the target:
    * the JDBC table holds the unwrapped row, exactly as the
    * reference's sink writes the ExtractNewRecordState payload. */
  def merge(batch: DataFrame, epochId: Long, orderCols: Seq[Column],
            isDelete: Column): Unit = {
    require(keyCols.forall(!_.startsWith("__")),
      "key columns must be payload columns (no __ metadata prefix)")
    val delFlag = "__graft_is_delete"
    val latest = Relational.latestStatePerKey(batch, keyCols, orderCols)
      .withColumn(delFlag, coalesce(isDelete, lit(false)))
      .sortWithinPartitions(keyCols.map(col): _*)
    val rowCols = latest.columns.toSeq
    val cols = rowCols.filterNot(_.startsWith("__"))
    val written = StructType(latest.schema.filter(f => !f.name.startsWith("__")))
    val types = JdbcKeyedTable.sqlTypesFor(written)
    val upsert = dialect.upsertSql(table, keyCols, cols, types)
    val delete = dialect.deleteSql(table, keyCols)
    val jdbcTypes = latest.schema.fields.map(f => JdbcKeyedTable.jdbcType(f.dataType))
    val colIdx = dialect.upsertParams(keyCols, cols).map(rowCols.indexOf).toArray
    val keyIdx = keyCols.map(rowCols.indexOf).toArray
    val (u, d, ur, cp) = (upsert, delete, url, connProps)
    latest.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.hasNext) {
        val props = new java.util.Properties()
        cp.foreach { case (k, v) => props.setProperty(k, v) }
        val conn = DriverManager.getConnection(ur, props)
        try {
          conn.setAutoCommit(false)
          val upStmt = conn.prepareStatement(u)
          val delStmt = conn.prepareStatement(d)
          rows.foreach { r =>
            if (r.getBoolean(r.fieldIndex(delFlag))) {
              keyIdx.zipWithIndex.foreach { case (ci, pi) =>
                val v = r.get(ci)
                if (v == null) delStmt.setNull(pi + 1, jdbcTypes(ci))
                else delStmt.setObject(pi + 1, v)
              }
              delStmt.addBatch()
            } else {
              colIdx.zipWithIndex.foreach { case (ci, pi) =>
                val v = r.get(ci)
                if (v == null) upStmt.setNull(pi + 1, jdbcTypes(ci))
                else upStmt.setObject(pi + 1, v)
              }
              upStmt.addBatch()
            }
          }
          delStmt.executeBatch()
          upStmt.executeBatch()
          conn.commit()
        } finally conn.close()
      }
    }
  }

  /** Adapter for `writeStream.foreachBatch(table.foreachBatchMerge(...))`. */
  def foreachBatchMerge(orderCols: Seq[Column], isDelete: Column)
      : (DataFrame, Long) => Unit =
    (batch, epochId) => merge(batch, epochId, orderCols, isDelete)
}

object JdbcKeyedTable {

  /** Spark type → portable SQL type (used for ANSI MERGE casts and
    * setNull type codes). */
  def sqlType(dt: DataType): String = dt match {
    case LongType            => "BIGINT"
    case IntegerType         => "INTEGER"
    case ShortType           => "SMALLINT"
    case DoubleType          => "DOUBLE"
    case FloatType           => "REAL"
    case BooleanType         => "BOOLEAN"
    case DateType            => "DATE"
    case _: TimestampType    => "TIMESTAMP"
    case d: DecimalType      => s"DECIMAL(${d.precision},${d.scale})"
    case StringType          => "VARCHAR(32672)"
    case BinaryType          => "BLOB"
    case other =>
      throw new IllegalArgumentException(
        s"JdbcKeyedTable: no SQL mapping for Spark type $other")
  }

  def sqlTypesFor(schema: StructType): Map[String, String] =
    schema.fields.map(f => f.name -> sqlType(f.dataType)).toMap

  def jdbcType(dt: DataType): Int = dt match {
    case LongType         => java.sql.Types.BIGINT
    case IntegerType      => java.sql.Types.INTEGER
    case ShortType        => java.sql.Types.SMALLINT
    case DoubleType       => java.sql.Types.DOUBLE
    case FloatType        => java.sql.Types.REAL
    case BooleanType      => java.sql.Types.BOOLEAN
    case DateType         => java.sql.Types.DATE
    case _: TimestampType => java.sql.Types.TIMESTAMP
    case _: DecimalType   => java.sql.Types.DECIMAL
    case StringType       => java.sql.Types.VARCHAR
    case BinaryType       => java.sql.Types.BLOB
    case _                => java.sql.Types.OTHER
  }
}
