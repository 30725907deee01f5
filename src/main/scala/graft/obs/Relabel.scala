package graft.obs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * JMX→metrics relabeling (§2.9): the reference's Prometheus JMX-exporter
 * config is a list of regex rules mapping raw MBean names to renamed
 * series with extracted labels (kafka-connect/kafka-connect.yml:6-106,
 * e.g. `kafka.connect<type=connect-worker-metrics, connector=(.+)>` →
 * `kafka_connect_worker_connector_...{connector=$1}`). Re-expressed as a
 * pure column program: ONE `rlike` gate plus ONE `regexp_replace` whose
 * template emits the rename and every capture group in a single pass,
 * split on a control-character delimiter — 2 regex executions per row
 * regardless of label count (the naive rename+extract-per-label chain
 * is 2 + #labels executions; at 100 TB of series that difference is the
 * scan). Codegen'd, applied in the scan projection, no shuffle.
 */
object Relabel {

  /** Field delimiter inside the one-pass rewrite template: U+0001 never
    * occurs in MBean names (the exporter's input is JMX ObjectName
    * strings, which are printable). */
  private val Sep = ""

  /**
   * Apply one relabel rule: rows whose `rawCol` matches `pattern` get
   * `name` rewritten via `nameTemplate` ($1-style group refs) and one
   * column per `labels` entry (label name → capture group index).
   * Non-matching rows keep their raw name and get empty labels —
   * mirroring the JMX exporter's fall-through behavior.
   */
  def relabel(metrics: DataFrame, rawCol: String, pattern: String,
              nameTemplate: String, labels: Map[String, Int]): DataFrame = {
    val matches = col(rawCol).rlike(pattern)
    // One rewrite emits name + all labels: template "name␁$g1␁$g2…",
    // then a plain split. Label order inside the template is fixed
    // (sorted by group index) so each label column picks its slot.
    val ordered = labels.toSeq.sortBy(_._2)
    val template = (nameTemplate +: ordered.map { case (_, g) => s"$$$g" })
      .mkString(Sep)
    val parts = split(regexp_replace(col(rawCol), pattern, template), Sep)
    val renamed = metrics.withColumn("__parts",
        when(matches, parts).otherwise(lit(null).cast("array<string>")))
      .withColumn("name",
        when(col("__parts").isNotNull, element_at(col("__parts"), 1))
          .otherwise(col(rawCol)))
    ordered.zipWithIndex.foldLeft(renamed) {
      case (df, ((label, _), slot)) =>
        df.withColumn(label,
          when(col("__parts").isNotNull,
            element_at(col("__parts"), slot + 2)).otherwise(lit("")))
    }.drop("__parts")
  }
}
