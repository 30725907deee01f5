package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Classifier evaluation metrics for corpus-quality gates: once a
 * quality scorer (`TextMetrics.hashedLinearScore`, a perplexity model,
 * a trained fastText head) gates what enters a training mix, the
 * pipeline needs to measure the gate itself against reference labels —
 * at corpus scale, exactly, not on a sampled slice. Pure column
 * programs; the reference has no model-eval surface (its "quality"
 * plane is Grafana panels over connector metrics), so this extends the
 * engine along the training-data axis the builder's brief adds.
 */
object Eval {

  /**
   * Exact ROC-AUC via the rank-sum (Mann–Whitney U) identity with
   * average-rank tie handling: AUC = U / (n_pos · n_neg) where U sums,
   * over positive examples, the count of negatives scored strictly
   * below plus HALF the negatives tied with it. Integer-exact: the
   * returned `u2` = 2·U is a BIGINT (every tie contributes a whole
   * number to 2U), so engines replay the metric bit-for-bit; `auc`
   * is round(u2 / (2·n_pos·n_neg), 6), NULL for single-class groups.
   *
   * One output row per `by` group: `by` columns, `n_pos`, `n_neg`,
   * `u2`, `auc`.
   *
   * Scale shape: rows collapse to (group, score) → (n_pos, n_neg)
   * counts in ONE map-side-combined aggregation — the only exchange
   * that sees data cardinality, carrying ~24 B per DISTINCT score, not
   * per row. The cumulative-negatives window then runs per group over
   * that score histogram (integer scores ⇒ bounded cardinality; the
   * classic sort-all-predictions AUC shuffles and totally orders the
   * full corpus instead). No collect, no UDF, fully codegen'd.
   */
  /**
   * Calibration (reliability-diagram) table — AUC's companion: AUC
   * says the gate RANKS well, the calibration table says whether a
   * score cut means what its magnitude claims. Scores bucket into
   * fixed-width bins (`bin` = floor(score / binWidth), floored
   * division so negative scores bin consistently); each (group, bin)
   * row reports `n`, `n_pos`, and the observed positive rate as
   * integer ppm (`pos_rate_micro` — the q69 micro convention, never a
   * float).
   *
   * Scale shape: one map-side-combined aggregation; the exchange
   * carries ~24 B per OCCUPIED bin, not per row.
   */
  def calibrationTable(scored: DataFrame, scoreCol: String, labelCol: String,
                       binWidth: Long, by: Seq[String] = Nil): DataFrame = {
    require(binWidth >= 1, "binWidth must be >= 1")
    val bin = floor(col(scoreCol).cast("long").cast("double") / binWidth)
      .cast("long")
    scored
      .groupBy((by.map(col) :+ bin.as("bin")): _*)
      .agg(count(lit(1)).as("n"),
        sum(when(col(labelCol), 1L).otherwise(0L)).as("n_pos"))
      .withColumn("pos_rate_micro", expr("n_pos * 1000000 div n"))
  }

  def rocAuc(scored: DataFrame, scoreCol: String, labelCol: String,
             by: Seq[String] = Nil): DataFrame = {
    val g = scored
      .groupBy((by.map(col) :+ col(scoreCol).as("__s")): _*)
      .agg(sum(when(col(labelCol), 1L).otherwise(0L)).as("__np"),
        sum(when(col(labelCol), 0L).otherwise(1L)).as("__nn"))
    val w = Window.partitionBy(by.map(col): _*).orderBy(col("__s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val u2Term = col("__np") * (coalesce(sum(col("__nn")).over(w), lit(0L)) * 2
      + col("__nn"))
    g.select((by.map(col) :+ col("__np") :+ col("__nn") :+
        u2Term.as("__u2")): _*)
      .groupBy(by.map(col): _*)
      .agg(sum(col("__np")).as("n_pos"), sum(col("__nn")).as("n_neg"),
        sum(col("__u2")).as("u2"))
      .withColumn("auc",
        when(col("n_pos") === 0L || col("n_neg") === 0L,
          lit(null).cast("double"))
          .otherwise(round(col("u2").cast("double") /
            (col("n_pos").cast("double") * col("n_neg").cast("double") * 2d), 6)))
  }
}
