package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Similarity search over an embedding column (SURVEY.md §7 step 7):
 * brute-force cosine top-k as the baseline, and a *provably exact*
 * two-phase pruned kNN as the scale path. Pure Catalyst array programs
 * (`zip_with`/`aggregate`/`slice`) — no UDFs.
 *
 * Why not bucketed LSH for the correctness-gated query? Approximate
 * candidate generation (sign-LSH / IVF probing) trades recall for
 * pruning; on unstructured data its output is not guaranteed to equal
 * the brute-force top-k, so it cannot sit behind an exact-match oracle.
 * The two-phase bound below prunes with a Cauchy–Schwarz upper bound
 * and rescreens exactly, so its result equals brute force *by
 * construction* on any dataset — while still touching only the
 * candidate subset `ub ≥ threshold` in the expensive phase.
 */
object Similarity {

  /** Codegen'd dot product of two array<double> columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** Cosine similarity of two raw (unnormalized) vectors. Computed as
    * dot/(|a|·|b|) — operand-for-operand the formulation DuckDB's
    * `list_dot_product`-based oracle uses, so 4-decimal rounding agrees
    * across engines. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** The (single-row, broadcastable) target vector for `targetId`,
    * reduced via MIN so absence/duplication of the id degrades
    * deterministically instead of changing the row multiplicity. */
  private def targetRow(emb: DataFrame, idCol: String, vecCol: String,
                        targetId: Long): DataFrame =
    emb.filter(col(idCol) === targetId)
      .agg(min(col(vecCol)).as("__t"))

  /**
   * Brute-force cosine top-k of `targetId` over all other vectors:
   * the O(N) baseline and the oracle for everything else here.
   * Output: (idCol, score) with score rounded to 4 decimals, ordered
   * (score desc, id asc).
   */
  def cosineTopK(emb: DataFrame, idCol: String, vecCol: String,
                 targetId: Long, k: Int): DataFrame =
    emb.filter(col(idCol) =!= targetId)
      .crossJoin(broadcast(targetRow(emb, idCol, vecCol, targetId)))
      .select(col(idCol),
        round(cosine(col(vecCol), col("__t")), 4).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)

  /**
   * Exact top-k cosine with candidate pruning — the 100 TB shape.
   *
   * Phase 0 (cheap, per vector): normalize, split into head/tail halves,
   * cache the tail norm. For unit vectors u, v:
   *
   *   cos(u,v) = ⟨u_h,v_h⟩ + ⟨u_t,v_t⟩ ≤ ⟨u_h,v_h⟩ + |u_t|·|v_t| =: ub
   *
   * (Cauchy–Schwarz on the tail). `ub` costs a half-length dot product.
   *
   * Phase 1: exact-score the top `candidateCount` vectors by `ub`; the
   * k-th best exact score is the pruning threshold t.
   *
   * Phase 2: exact top-k over {v : ub ≥ t − margin}. Soundness: any v
   * with cos ≥ t has ub ≥ cos ≥ t > t − margin, so no true top-k member
   * is pruned; the margin (2·10⁻⁴ = two rounding quanta) additionally
   * guarantees that a pruned vector's ROUND(cos,4) is strictly below
   * every survivor's, so the rounded, id-tiebroken output equals the
   * brute-force ordering exactly.
   *
   * Pruning efficacy is data-dependent: on clustered real-world
   * embeddings the bound cuts deep (t is high, ub concentrates); on
   * uniform random vectors nothing can prune (no structure to exploit)
   * and phase 2 degrades to the scan the baseline does anyway. Both
   * phases are single shuffle-free scans + a TakeOrdered; the two
   * 1-row thresholds broadcast (no collect).
   */
  def boundedExactKnn(emb: DataFrame, idCol: String, vecCol: String,
                      targetId: Long, k: Int, candidateCount: Int = 64,
                      margin: Double = 2e-4): DataFrame = {
    require(candidateCount >= k, "candidateCount must be >= k")

    val t = targetRow(emb, idCol, vecCol, targetId)
      .withColumn("__tn", sqrt(dot(col("__t"), col("__t"))))
      .withColumn("__tu", transform(col("__t"), x => x / col("__tn")))
      .withColumn("__th", slice(col("__tu"), lit(1), (size(col("__tu")) / 2).cast("int")))
      .withColumn("__tt", slice(col("__tu"), (size(col("__tu")) / 2 + 1).cast("int"),
        size(col("__tu"))))
      .withColumn("__ttn", sqrt(dot(col("__tt"), col("__tt"))))

    val base = emb.filter(col(idCol) =!= targetId)
      .withColumn("__n", sqrt(dot(col(vecCol), col(vecCol))))
      .filter(col("__n") > 0)
      .withColumn("__u", transform(col(vecCol), x => x / col("__n")))
      .withColumn("__h", slice(col("__u"), lit(1), (size(col("__u")) / 2).cast("int")))
      .withColumn("__tl", slice(col("__u"), (size(col("__u")) / 2 + 1).cast("int"),
        size(col("__u"))))
      .withColumn("__tln", sqrt(dot(col("__tl"), col("__tl"))))
      .crossJoin(broadcast(t))
      .withColumn("__ub", dot(col("__h"), col("__th")) + col("__tln") * col("__ttn"))

    // Exact score on the raw vectors — operand-identical to cosineTopK /
    // the DuckDB oracle, so rounding agrees.
    val exact = cosine(col(vecCol), col("__t"))

    val threshold = base
      .orderBy(col("__ub").desc, col(idCol))
      .limit(candidateCount)
      .withColumn("__s", exact)
      .orderBy(col("__s").desc, col(idCol))
      .limit(k)
      .agg(min(col("__s")).as("__thr"))

    base
      .crossJoin(broadcast(threshold))
      // A null threshold (empty/degenerate target → null scores) must
      // degrade to the brute-force behavior, not filter everything out.
      .filter(col("__thr").isNull || col("__ub") >= col("__thr") - margin)
      .select(col(idCol), round(exact, 4).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }
}
