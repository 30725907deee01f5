package graft.obs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * JMX→metrics relabeling (§2.9): the reference's Prometheus JMX-exporter
 * config is a list of regex rules mapping raw MBean names to renamed
 * series with extracted labels (kafka-connect/kafka-connect.yml:6-106,
 * e.g. `kafka.connect<type=connect-worker-metrics, connector=(.+)>` →
 * `kafka_connect_worker_connector_...{connector=$1}`). Re-expressed as a
 * pure column program: `regexp_replace` renames, `regexp_extract` pulls
 * capture groups into label columns — codegen'd, applied in the scan
 * projection, no shuffle.
 */
object Relabel {

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
    val renamed = metrics.withColumn("name",
      when(matches, regexp_replace(col(rawCol), pattern, nameTemplate))
        .otherwise(col(rawCol)))
    labels.foldLeft(renamed) { case (df, (label, group)) =>
      df.withColumn(label,
        when(matches, regexp_extract(col(rawCol), pattern, group)).otherwise(lit("")))
    }
  }
}
