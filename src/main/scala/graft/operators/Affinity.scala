package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Market-basket co-occurrence (association-rule support/confidence/
 * lift over pairs) — the classic retail-analytics report, and in a
 * training-data pipeline the same arithmetic that surfaces correlated
 * source/label pairs in a mixture. No reference counterpart (the
 * reference moves order rows, it never mines them) — builder's-brief
 * analytics axis.
 */
object Affinity {

  /**
   * Pairwise item affinity: for every unordered pair of DISTINCT
   * items co-occurring in at least `minSupport` baskets —
   * `n_pair` (co-occurrence basket count), `n_a`/`n_b` (per-item
   * basket counts), `support`, `confidence` (P(b|a), a = the
   * lexicographically smaller item), and `lift`. All three ratios are
   * derived from exact BIGINT counts with a fixed operand order
   * (round(double(x)/y, 6) and round(double(n_pair)·N/(n_a·n_b), 6)),
   * so both engines replay identical doubles.
   *
   * Input: one row per (basket, item) — duplicates collapse first.
   *
   * Scale shape: the self-join runs on the DEDUPLICATED (basket, item)
   * relation keyed by basket — both sides share one hash partitioning
   * (a single co-located shuffle), and per-basket pair fan-out is
   * bounded by basket width squared, never by corpus size. Item
   * marginals are an item-cardinality frame joined in by item key;
   * the basket total is a 1-row broadcast (the documented no-collect
   * scalar pattern). Nothing driver-side.
   */
  def pairAffinity(baskets: DataFrame, basketCol: String, itemCol: String,
                   minSupport: Long = 1L): DataFrame = {
    require(minSupport >= 1L, "minSupport must be >= 1")
    val bi = baskets
      .select(col(basketCol).as("__b"), col(itemCol).as("__i"))
      .where(col("__b").isNotNull && col("__i").isNotNull)
      .distinct()
    val marg = bi.groupBy(col("__i")).agg(count(lit(1)).as("__n"))
    val total = bi.select(col("__b")).distinct()
      .agg(count(lit(1)).as("__nb"))
    val pairs = bi.join(
        bi.select(col("__b"), col("__i").as("__j")), "__b")
      .where(col("__i") < col("__j"))
      .groupBy(col("__i").as("item_a"), col("__j").as("item_b"))
      .agg(count(lit(1)).as("n_pair"))
      .where(col("n_pair") >= minSupport)
    pairs
      .join(marg.select(col("__i").as("item_a"), col("__n").as("n_a")), "item_a")
      .join(marg.select(col("__i").as("item_b"), col("__n").as("n_b")), "item_b")
      .crossJoin(broadcast(total))
      .select(col("item_a"), col("item_b"), col("n_pair"), col("n_a"),
        col("n_b"),
        round(col("n_pair").cast("double") / col("__nb"), 6).as("support"),
        round(col("n_pair").cast("double") / col("n_a"), 6).as("confidence"),
        round(col("n_pair").cast("double") * col("__nb")
          / (col("n_a") * col("n_b")), 6).as("lift"))
      .orderBy(col("n_pair").desc, col("item_a"), col("item_b"))
  }
}
