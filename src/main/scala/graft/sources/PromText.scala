package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/**
 * S7/S8: Prometheus text-format ingestion. The reference's Task 2 is a
 * FastAPI app rendering gauges/counters in Prometheus exposition format
 * (fastapi/main.py:18-63: `# HELP`/`# TYPE` comments + `name value`
 * sample lines), scraped every 5 s (prometheus/prometheus.yml:2-4,34-37).
 *
 * Our engine ingests the same text: `parse` turns a line column into
 * typed samples — (metric name, label map, double value, optional
 * timestamp) — with pure regex/`str_to_map` column ops (codegen'd, no
 * UDF), and `PromTextSource` wires it behind the `Source` trait over a
 * file/directory of scraped bodies, batch and streaming alike. A real
 * scrape loop lands HTTP bodies into that directory (or a Kafka topic);
 * the parser is identical either way.
 */
object PromText {

  /** Exposition-format sample line:
    * `name{label="x",...} value [timestamp_ms]` (labels/ts optional). */
  private val lineRe =
    "^([a-zA-Z_:][a-zA-Z0-9_:]*)(\\{[^}]*\\})?\\s+([^\\s]+)(?:\\s+(-?\\d+))?\\s*$"

  /** One `name="value"` label pair, escape-aware: the value group admits
    * `\"`, `\\`, `\n` escapes, so quoted commas / equals / escaped quotes
    * inside label values never split a pair. */
  private val pairRe = "([a-zA-Z_][a-zA-Z0-9_]*)\\s*=\\s*\"((?:\\\\.|[^\"\\\\])*)\""

  /** Prometheus label-value unescape (`\\`→`\`, `\"`→`"`, `\n`→LF).
    * Escaped backslashes are swapped to a sentinel first so the
    * remaining backslashes are unambiguous escape leads. Fast path:
    * values without a backslash (the overwhelming majority) skip the
    * four regex passes on a cheap `contains` check. */
  private def unescape(v: Column): Column = {
    val sentinel = "\u0001"
    when(!v.contains("\\"), v).otherwise(
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(v, "\\\\\\\\", sentinel),
            "\\\\\"", "\""),
          "\\\\n", "\n"),
        sentinel, "\\\\"))
  }

  /** Parse exposition-format lines into samples. Comment (`#`), blank,
    * and non-matching lines are dropped. Output columns:
    * (name string, labels map<string,string>, value double, ts_ms long).
    * `+Inf`/`-Inf`/`NaN` sample values map to the IEEE specials the
    * exposition format means by them. */
  def parse(lines: DataFrame, lineCol: String): DataFrame = {
    val l = trim(col(lineCol))
    val name = regexp_extract(l, lineRe, 1)
    val rawLabels = regexp_extract(l, lineRe, 2)
    val value = regexp_extract(l, lineRe, 3)
    val tsMs = regexp_extract(l, lineRe, 4)
    // {a="x, y",b="\"z\""} → map(a -> 'x, y', b -> '"z"') — pair-wise
    // extraction, not a global split, so commas/equals in values survive
    val keys = regexp_extract_all(rawLabels, lit(pairRe), lit(1))
    val vals = transform(regexp_extract_all(rawLabels, lit(pairRe), lit(2)), v => unescape(v))
    val valueNum = when(value.isin("+Inf", "Inf"), lit(Double.PositiveInfinity))
      .when(value === "-Inf", lit(Double.NegativeInfinity))
      .when(value === "NaN", lit(Double.NaN))
      // try_cast: garbage lines must parse to null (and be filtered),
      // not abort the scrape under ANSI mode
      .otherwise(value.try_cast("double"))
    lines
      .filter(l =!= "" && !l.startsWith("#"))
      .select(
        name.as("name"),
        map_from_arrays(keys, vals).as("labels"),
        valueNum.as("value"),
        tsMs.try_cast("long").as("ts_ms"))
      .filter(col("name") =!= "" && col("value").isNotNull)
  }
}

/** File-landed Prometheus scrapes behind the Source trait: each file is
  * one scrape body, each line one sample. */
final case class PromTextSource(path: String,
                                options: Map[String, String] = Map.empty) extends Source {
  private val raw = FileSource("text", path,
    StructType.fromDDL("value STRING"), options)
  def batch(spark: SparkSession): DataFrame =
    PromText.parse(raw.batch(spark), "value")
  def stream(spark: SparkSession): DataFrame =
    PromText.parse(raw.stream(spark), "value")
}
