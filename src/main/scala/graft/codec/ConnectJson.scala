package graft.codec

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Kafka-Connect JSON envelope codec: every message the reference system
 * produces or consumes is a `{"schema": {...}, "payload": {...}}` JSON
 * document (JsonConverter for key/value/internal converters — reference
 * docker-compose.yaml:138-141; fixture shape in repo FIXTURES.md §B2).
 *
 * Encode/decode are pure Catalyst column programs (`to_json`/`from_json`
 * + constant-folded schema literal) — codegen'd, no UDFs, so the codec
 * adds only serialization cost at 100 TB, never a pushdown barrier.
 *
 * Wire conventions (Connect JsonConverter semantics):
 *  - integral/float/boolean/string/bytes map to the Connect primitive
 *    names (int8..int64, float32/64, boolean, string, bytes);
 *  - timestamps travel as int64 epoch-milliseconds annotated with the
 *    logical name `org.apache.kafka.connect.data.Timestamp`;
 *  - nested STRUCT/ARRAY recurse.
 *
 * UTC session time zone is assumed (GraftSession pins it): NTZ
 * timestamps are reinterpreted as UTC instants on the wire.
 */
object ConnectJson {

  private val TimestampLogicalName = "org.apache.kafka.connect.data.Timestamp"

  /** Connect primitive type name for a Spark DataType (wire types only). */
  private def typeName(dt: DataType): String = dt match {
    case ByteType => "int8"
    case ShortType => "int16"
    case IntegerType => "int32"
    case LongType => "int64"
    case FloatType => "float32"
    case DoubleType => "float64"
    case BooleanType => "boolean"
    case StringType => "string"
    case BinaryType => "bytes"
    case _: TimestampType => "int64"
    case _: TimestampNTZType => "int64"
    case _: StructType => "struct"
    case _: ArrayType => "array"
    case other =>
      throw new IllegalArgumentException(s"ConnectJson: unsupported type $other")
  }

  private def esc(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  /** JSON descriptor for one field's type (without the field name). */
  private def typeJson(dt: DataType, optional: Boolean, name: Option[String]): String = {
    val base = s""""type": "${typeName(dt)}", "optional": $optional"""
    val logical = dt match {
      case _: TimestampType | _: TimestampNTZType =>
        s""", "name": "$TimestampLogicalName""""
      case _ => name.map(n => s""", "name": "${esc(n)}"""").getOrElse("")
    }
    val nested = dt match {
      case st: StructType =>
        ", \"fields\": [" + st.fields.map(fieldJson).mkString(", ") + "]"
      case ArrayType(elem, containsNull) =>
        s""", "items": {${typeJson(elem, containsNull, None)}}"""
      case _ => ""
    }
    base + logical + nested
  }

  private def fieldJson(f: StructField): String =
    s"""{"field": "${esc(f.name)}", ${typeJson(f.dataType, f.nullable, None)}}"""

  /**
   * The constant `"schema"` half of the envelope for a record StructType —
   * matches what JsonConverter emits for the same shape (FIXTURES.md §B2).
   */
  def connectSchemaJson(st: StructType, name: String = "record"): String =
    s"""{"type": "struct", "fields": [${st.fields.map(fieldJson).mkString(", ")}], "optional": false, "name": "${esc(name)}"}"""

  /** Recursively rewrite a column to its wire representation
    * (timestamps → epoch millis). Non-temporal columns pass through. */
  private def toWire(c: Column, dt: DataType): Column = dt match {
    case _: TimestampType => unix_millis(c)
    // UTC session: reinterpreting NTZ as a UTC instant is exact.
    case _: TimestampNTZType => unix_millis(c.cast(TimestampType))
    case st: StructType =>
      val rebuilt = struct(st.fields.map(f => toWire(c.getField(f.name), f.dataType).as(f.name)): _*)
      when(c.isNotNull, rebuilt)
    case ArrayType(elem, _) => transform(c, x => toWire(x, elem))
    case _ => c
  }

  /** Recursively rewrite a parsed wire column back to engine types. */
  private def fromWire(c: Column, dt: DataType): Column = dt match {
    case _: TimestampType => timestamp_millis(c.cast(LongType))
    case _: TimestampNTZType => timestamp_millis(c.cast(LongType)).cast(TimestampNTZType)
    case st: StructType =>
      val rebuilt = struct(st.fields.map(f => fromWire(c.getField(f.name), f.dataType).as(f.name)): _*)
      when(c.isNotNull, rebuilt)
    case ArrayType(elem, _) => transform(c, x => fromWire(x, elem))
    case _ => c
  }

  /** The wire-side schema (timestamps declared int64) used to parse. */
  private def wireSchema(dt: DataType): DataType = dt match {
    case _: TimestampType | _: TimestampNTZType => LongType
    case st: StructType =>
      StructType(st.fields.map(f => f.copy(dataType = wireSchema(f.dataType))))
    case ArrayType(elem, n) => ArrayType(wireSchema(elem), n)
    case other => other
  }

  /**
   * Encode the named columns of a row into a full Connect JSON envelope
   * string column. The schema descriptor is a constant literal — Catalyst
   * constant-folds it, so per-row cost is just `to_json` of the payload.
   */
  def encodeEnvelope(schema: StructType, name: String = "record"): Column = {
    val payload = struct(schema.fields.map(f => toWire(col(f.name), f.dataType).as(f.name)): _*)
    concat(
      lit(s"""{"schema": ${connectSchemaJson(schema, name)}, "payload": """),
      to_json(payload),
      lit("}"))
  }

  /**
   * Decode a Connect JSON envelope string column back to a struct column
   * with the engine-side types of `schema`. The embedded `"schema"` half
   * is not re-validated — the caller's StructType is the contract (pinned
   * explicit schemas per SURVEY §1.2: determinism over inference).
   * Malformed JSON yields null (from_json PERMISSIVE mode).
   */
  def decodeEnvelope(envelope: Column, schema: StructType): Column = {
    val wire = StructType(Seq(StructField("payload", wireSchema(schema), nullable = true)))
    val parsed = from_json(envelope, wire).getField("payload")
    fromWire(parsed, schema).as("payload")
  }
}
