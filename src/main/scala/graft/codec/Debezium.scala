package graft.codec

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Debezium change-event envelope schema + `ExtractNewRecordState`-style
 * unwrap, re-expressed as pure Catalyst column programs.
 *
 * The reference's flagship CDC task configures (postgres/connector.json:11-14,
 * effective config README.md:317-329):
 *   - `transforms.unwrap.type = ExtractNewRecordState` — flatten the
 *     `{before, after, source, op, ts_ms}` envelope to the new row state;
 *   - `delete.handling.mode = rewrite` — deletes become rows (taken from
 *     `before`) flagged `__deleted = "true"` instead of disappearing;
 *   - `drop.tombstones = false` — null-value tombstone records are kept
 *     (the upsert sink treats them as DELETE by key, see sinks);
 *   - `add.fields` with `__` prefix — envelope metadata (`op`, `ts_ms`)
 *     surfaces as `__op`, `__ts_ms` columns (README.md:317-318).
 *
 * Everything here is `from_json` + `when/otherwise` — no UDFs, fully
 * codegen'd, and the parse prunes to only the fields the caller selects.
 */
object Debezium {

  /** `source` block fields exercised by the reference (FIXTURES.md §B3). */
  val sourceSchema: StructType = StructType(Seq(
    StructField("connector", StringType),
    StructField("db", StringType),
    StructField("table", StringType),
    StructField("ts_ms", LongType),
    StructField("lsn", LongType)))

  /** Debezium envelope StructType for a given row schema. */
  def envelopeSchema(row: StructType): StructType = StructType(Seq(
    StructField("before", row, nullable = true),
    StructField("after", row, nullable = true),
    StructField("source", sourceSchema, nullable = true),
    StructField("op", StringType, nullable = true),
    StructField("ts_ms", LongType, nullable = true)))

  /** Parse a raw JSON change-event value column into the typed envelope.
    * A null input (Kafka tombstone) parses to a null struct. */
  def parseEnvelope(value: Column, row: StructType): Column =
    from_json(value, envelopeSchema(row))

  /**
   * Unwrap a parsed (or raw JSON string) changelog DataFrame:
   * flatten to row columns + `__deleted` + optional `__op`/`__ts_ms`.
   *
   * Emitted per input record:
   *  - `op=c|u|r` → `after.*`, `__deleted = "false"`
   *  - `op=d`     → `before.*`, `__deleted = "true"` (rewrite mode)
   *  - tombstone (null value) → all row fields null, `__deleted` null —
   *    kept when `dropTombstones = false` (reference behavior), dropped
   *    otherwise. Callers keep their own key column to act on them.
   *
   * `__deleted` is a STRING "true"/"false" — byte-identical to what the
   * reference's rewrite mode puts on the wire (README.md:321).
   *
   * @param df            input with `valueCol` holding the JSON change event
   * @param valueCol      name of the JSON string column
   * @param row           the table row schema inside before/after
   * @param addMetadata   add `__op` and `__ts_ms` columns (A4)
   * @param dropTombstones drop null-value records (reference: false)
   * @param keep          passthrough columns to retain (e.g. the record key)
   */
  def unwrap(df: DataFrame, valueCol: String, row: StructType,
             addMetadata: Boolean = true,
             dropTombstones: Boolean = false,
             keep: Seq[String] = Seq.empty): DataFrame = {
    // Tombstone filter must run against the raw value column, before the
    // projection narrows the schema.
    val in = if (dropTombstones) df.filter(col(valueCol).isNotNull) else df
    // Materialize the parse in its OWN projection: the envelope fields
    // reference it ~10 times, and inlined from_json would be re-parsed
    // per referencing column (OptimizeJsonExprs narrows each copy, but
    // that still tokenizes the JSON string once per field). CollapseProject
    // keeps the two-step shape because a non-cheap alias with multiple
    // references is never inlined — so this is one parse per row.
    val envName = Iterator.from(0).map(i => s"__env$i")
      .find(n => !df.columns.contains(n) && !keep.contains(n)).get
    val parsed = in.select(keep.map(col) :+
      parseEnvelope(col(valueCol), row).as(envName): _*)
    val env = col(envName)
    val isDelete = env.getField("op") === "d"
    val state = when(isDelete, env.getField("before")).otherwise(env.getField("after"))
    val base = keep.map(col) ++
      row.fields.map(f => state.getField(f.name).as(f.name)) :+
      when(env.isNotNull, when(isDelete, lit("true")).otherwise(lit("false")))
        .as("__deleted")
    val metaCols =
      if (addMetadata) Seq(env.getField("op").as("__op"), env.getField("ts_ms").as("__ts_ms"))
      else Seq.empty
    parsed.select(base ++ metaCols: _*)
  }
}
