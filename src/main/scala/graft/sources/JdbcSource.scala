package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * S1–S3: the real JDBC path, config-shaped like the reference's source
 * connector (README.md:88-109). Config-gated — no database exists
 * offline, so tests cover the query/option assembly; `IncrementalPollSource`
 * is the runnable offline twin of the polling loop.
 *
 * Modes (reference `mode`, README.md:96):
 *  - bulk: whole-table snapshot per trigger (`manifest.json:5`)
 *  - timestamp / incrementing: `WHERE hwmCol > $hwm` pushed INTO the
 *    database via a subquery table — the predicate executes DB-side,
 *    exactly like the connector's incremental capture
 *
 * Parallel chunking (`partitionColumn`/`numPartitions`) maps the
 * connector's single-task poll to Spark's partitioned JDBC scan — the
 * scale-out the reference could not express (`tasks.max=1`,
 * README.md:92).
 */
final case class JdbcSource(url: String, table: String,
                            user: String, password: String,
                            hwmCol: Option[String] = None,
                            partitionColumn: Option[String] = None,
                            lowerBound: Option[Long] = None,
                            upperBound: Option[Long] = None,
                            numPartitions: Int = 1) extends Source {

  /** The DB-side relation for a poll past `hwm`: a pushed-down subquery
    * (None ⇒ bulk mode). The hwm literal is escaped: it originates
    * from table data (IncrementalPollSource stores max(hwmCol)), so a
    * string-typed hwm column can legally contain a single quote or a
    * trailing backslash — neither may break the query or inject SQL.
    * Backslashes are doubled first so that on MySQL-style backends
    * (backslash escapes enabled) a stored value ending in `\` cannot
    * turn the doubled quote into an escaped quote. On strict-ANSI
    * backends `\\` reads as two literal characters, shifting the
    * predicate boundary for backslash-bearing hwm values — acceptable
    * because hwm columns are timestamps/ids in every supported mode;
    * injection safety under both dialects wins over that corner. */
  def pollQuery(hwm: Option[String]): String = (hwmCol, hwm) match {
    case (Some(c), Some(v)) =>
      val escaped = v.replace("\\", "\\\\").replace("'", "''")
      s"(SELECT * FROM $table WHERE $c > '$escaped') AS __graft_poll"
    case _ => table
  }

  def connectionProperties: java.util.Properties = {
    val p = new java.util.Properties()
    p.setProperty("user", user)
    p.setProperty("password", password)
    p
  }

  /** Reader for one poll. Partitioned when the chunking bounds are set. */
  def read(spark: SparkSession, hwm: Option[String]): DataFrame =
    (partitionColumn, lowerBound, upperBound) match {
      case (Some(pc), Some(lo), Some(hi)) =>
        spark.read.jdbc(url, pollQuery(hwm), pc, lo, hi, numPartitions,
          connectionProperties)
      case _ =>
        spark.read.jdbc(url, pollQuery(hwm), connectionProperties)
    }

  def batch(spark: SparkSession): DataFrame = read(spark, None)
  def stream(spark: SparkSession): DataFrame =
    throw new UnsupportedOperationException(
      "JdbcSource is trigger-driven; wrap in IncrementalPollSource-style loop " +
        "with the hwm persisted between polls")

  /** The offline-twin wiring: this source's fetch inside an
    * `IncrementalPollSource` state machine. */
  def polling(stateDir: String): IncrementalPollSource = {
    require(hwmCol.isDefined, "polling requires hwmCol (timestamp/incrementing mode)")
    new IncrementalPollSource(
      s => read(s, None), // IncrementalPollSource re-applies the hwm filter
      hwmCol.get, stateDir)
  }
}
