package graft.codec

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._

/**
 * Schema-Registry-framed Avro codec (§1.2): the wire format the
 * reference DEPLOYS Schema Registry for (docker-compose.yaml:63-75)
 * even though its quickstarts configure JsonConverter — one magic byte
 * `0x00`, a big-endian int32 schema id, then the Avro binary body.
 *
 * The registry here is a LOCAL id → schema map (this sandbox has no
 * HTTP registry; the lookup seam is the same either way): decode reads
 * the frame's id, resolves the WRITER schema from the map, and decodes
 * with the reader schema derived from the target Spark schema — Avro's
 * standard schema-resolution path, so old-id frames keep decoding after
 * a compatible evolution.
 *
 * Spark shape: no spark-avro module ships in this environment, so the
 * codec is a typed `mapPartitions` seam (the same pattern as
 * `Multimodal.decodeSeam`): partition-local, encoder/decoder objects
 * and parsed schemas reused across the partition's rows, zero shuffle —
 * at 100 TB the codec cost is the serialization itself, never a plan
 * barrier. Supported field types are the Connect primitive family
 * (long/int/double/float/boolean/string/bytes), nullable via
 * `["null", T]` unions.
 */
object AvroEnvelope {

  val Magic: Byte = 0x00

  /** Avro record schema (JSON) for a Spark struct — nullable fields
    * become `["null", T]` unions, matching Connect's optional fields. */
  def avroSchemaFor(schema: StructType, name: String = "record"): String = {
    def base(dt: DataType): String = dt match {
      case LongType    => "\"long\""
      case IntegerType => "\"int\""
      case DoubleType  => "\"double\""
      case FloatType   => "\"float\""
      case BooleanType => "\"boolean\""
      case StringType  => "\"string\""
      case BinaryType  => "\"bytes\""
      case other =>
        throw new IllegalArgumentException(s"AvroEnvelope: unsupported type $other")
    }
    val fields = schema.fields.map { f =>
      val t = if (f.nullable) s"""["null", ${base(f.dataType)}]""" else base(f.dataType)
      s"""{"name": "${f.name}", "type": $t}"""
    }.mkString(", ")
    s"""{"type": "record", "name": "$name", "fields": [$fields]}"""
  }

  /** Encode each row as one framed message: `value BINARY` output. */
  def encode(df: DataFrame, schemaId: Int): DataFrame = {
    val sparkSchema = df.schema
    val schemaJson = avroSchemaFor(sparkSchema)
    val n = sparkSchema.fields.length
    val out = df.mapPartitions { rows =>
      val schema = new Schema.Parser().parse(schemaJson)
      val writer = new GenericDatumWriter[GenericRecord](schema)
      rows.map { r =>
        val rec = new GenericData.Record(schema)
        var i = 0
        while (i < n) {
          val v = r.get(i)
          rec.put(i, v match {
            case b: Array[Byte] => ByteBuffer.wrap(b)
            case other          => other
          })
          i += 1
        }
        val body = new ByteArrayOutputStream()
        val enc = EncoderFactory.get().binaryEncoder(body, null)
        writer.write(rec, enc)
        enc.flush()
        val payload = body.toByteArray
        ByteBuffer.allocate(5 + payload.length)
          .put(Magic).putInt(schemaId).put(payload).array()
      }
    }(Encoders.BINARY)
    out.toDF("value")
  }

  /**
   * Decode framed messages from `column` into `sparkSchema` columns.
   * `registry` maps schema id → writer schema JSON (the local stand-in
   * for the Schema Registry's `/schemas/ids/{id}`); the reader schema
   * derives from `sparkSchema`. Unknown ids and bad magic fail loudly —
   * silently dropping undecodable records is how corpora rot.
   */
  def decode(df: DataFrame, column: String, registry: Map[Int, String],
             sparkSchema: StructType): DataFrame = {
    val readerJson = avroSchemaFor(sparkSchema)
    val fields = sparkSchema.fields
    val enc = Encoders.row(sparkSchema)
    df.select(column).mapPartitions { rows =>
      val readerSchema = new Schema.Parser().parse(readerJson)
      val readers = registry.map { case (id, json) =>
        id -> new GenericDatumReader[GenericRecord](
          new Schema.Parser().parse(json), readerSchema)
      }
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](0)
        require(bytes.length >= 5 && bytes(0) == Magic,
          s"AvroEnvelope: bad frame (len=${bytes.length}, " +
            s"magic=${if (bytes.isEmpty) "none" else bytes(0).toString})")
        val id = ByteBuffer.wrap(bytes, 1, 4).getInt
        val reader = readers.getOrElse(id,
          throw new IllegalArgumentException(
            s"AvroEnvelope: schema id $id not in the local registry " +
              s"(known: ${registry.keys.toSeq.sorted.mkString(",")})"))
        val dec = DecoderFactory.get().binaryDecoder(bytes, 5, bytes.length - 5, null)
        val rec = reader.read(null, dec)
        Row.fromSeq(fields.indices.map { i =>
          rec.get(fields(i).name) match {
            case u: org.apache.avro.util.Utf8 => u.toString
            case bb: ByteBuffer =>
              val a = new Array[Byte](bb.remaining()); bb.get(a); a
            case other => other
          }
        })
      }
    }(enc)
  }

  /** Java-map convenience for config-driven callers. */
  def decode(df: DataFrame, column: String,
             registry: java.util.Map[Integer, String],
             sparkSchema: StructType): DataFrame =
    decode(df, column, registry.asScala.map { case (k, v) => (k.intValue, v) }.toMap,
      sparkSchema)
}
