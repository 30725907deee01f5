package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Graph analytics over edge lists — the PageRank-style importance
 * scores a corpus pipeline uses for URL/domain authority weighting
 * (the OPIC/Common-Crawl-rank idea: sample or weight documents by the
 * link importance of their source). Distributed Pregel-shape: every
 * iteration is one edge⋈rank join + one aggregate on the EDGE list —
 * the corpus never enters the loop. No reference counterpart;
 * builder's-brief analytics axis.
 */
object Graph {

  /**
   * Fixed-iteration PageRank with deterministic, engine-replayable
   * arithmetic: per-node share = round(rank/outdeg, 12) (one double
   * division, correctly rounded, then quantized), incoming shares sum
   * EXACTLY in DECIMAL(28,12), and the update
   * rank' = round(teleport/N + damping·double(Σshares), 12) is a
   * fixed-order double program — so an oracle unrolling the same
   * iterations lands on identical bits. `teleport` and `damping` are
   * SEPARATE literals (not 1−damping computed at runtime: 1.0 − 0.85
   * and the literal 0.15 differ by an ulp).
   *
   * Contract: every node must have outdegree ≥ 1 (true for symmetric/
   * undirected edge lists — pass both directions); dangling-mass
   * redistribution is deliberately out of scope. Nodes are the
   * distinct sources; ranks sum to ~1.
   *
   * Output: (`id`, `degree`, `rank`) — rank at 12 dp.
   *
   * Scale shape: edges and degrees materialize once
   * (`localCheckpoint`) and every iteration joins them by source key —
   * rank state is node-cardinality, the join is edge-cardinality, and
   * N arrives as a ONE-ROW broadcast (the documented no-collect scalar
   * pattern). Iterations are a fixed constant; convergence-to-epsilon
   * loops belong to the caller if wanted.
   */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int, damping: Double = 0.85,
               teleport: Double = 0.15): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    require(damping > 0 && teleport > 0, "damping and teleport must be > 0")
    val e = edges
      .select(col(srcCol).as("__src"), col(dstCol).as("__dst"))
      .where(col("__src").isNotNull && col("__dst").isNotNull)
      .distinct()
      .localCheckpoint()
    val deg = e.groupBy("__src").agg(count(lit(1)).as("__d")).localCheckpoint()
    val nn = deg.agg(count(lit(1)).as("__nn"))
    var ranks = deg.select(col("__src").as("__id"))
      .crossJoin(broadcast(nn))
      .select(col("__id"), round(lit(1.0d) / col("__nn"), 12).as("__r"))
      .localCheckpoint()
    for (_ <- 1 to iters) {
      val contrib = e.join(ranks, e("__src") === ranks("__id"))
        .join(deg, "__src")
        .select(e("__dst").as("__id"),
          round(col("__r") / col("__d"), 12).cast("decimal(28,12)").as("__c"))
        .groupBy("__id").agg(sum(col("__c")).as("__s"))
      ranks = deg.select(col("__src").as("__id"))
        .join(contrib, Seq("__id"), "left")
        .crossJoin(broadcast(nn))
        .select(col("__id"),
          round(lit(teleport) / col("__nn") +
            lit(damping) * coalesce(col("__s").cast("double"), lit(0.0d)), 12)
            .as("__r"))
        .localCheckpoint()
    }
    ranks.join(deg, ranks("__id") === deg("__src"))
      .select(col("__id").as("id"), col("__d").as("degree"),
        col("__r").as("rank"))
  }
}
