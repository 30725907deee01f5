package graft
// Scratch plan audit (dev tool): scans every registered query's physical
// plan for scale anti-patterns — unintended BroadcastNestedLoopJoin /
// CartesianProduct, and text/body columns appearing in shuffle exchanges.
object PlanAudit {
  // Cross joins against small broadcast sides are intentional in these
  // queries — 1-row aggregates (hwm, kNN thresholds, LSH targets),
  // q46's centroid table (IVF assignment is O(N·C) by definition, with
  // C bounded ≈ √N), q54's bounded probe batch, and q61's (hours ×
  // types) dimension grid: a broadcast nested loop over a tiny side is
  // a constant factor, not a scale risk. Flag only the rest.
  // Shared with PlanQualitySpec — ONE list, edited in one place.
  val intentionalBnl: Set[String] = Set("q04_incremental_hwm", "q27_cosine_topk",
    // q192: mutualInformation's 1-row total/term-sum broadcasts (the
    // documented no-collect scalar pattern)
    "q192_mutual_info",
    // q194: each chi-square pair's margin-grid crossJoin (vocab×vocab,
    // the q151 shape) + 1-row total broadcast
    "q194_cramers_v",
    // q196: coreset rounds fold a <= k-row selected-set broadcast plus
    // 1-row seed/argmax broadcasts (the q75 centroid pattern)
    "q196_coreset",
    // q199: CUPED's 1-row pooled-moment broadcast
    "q199_cuped",
    // q200: the 1-row corpus-doc-count broadcast feeding idf
    "q200_sparse_cosine",
    // q202: the 1-row replicate-count / global-moment / rank-cut
    // broadcasts (no-collect scalar pattern)
    "q202_bootstrap_ci",
    "q31_knn_pruned", "q35_ann_lsh", "q46_ann_ivf", "q48_incremental_id",
    "q54_knn_join", "q61_gapfill",
    // q75/q76: the per-round centroid set collapses to ONE broadcast row
    // (collect_list) — the crossJoin against it is a C·d-double constant
    "q75_kmeans_refine", "q76_ivf_trained", "q78_ivf_knn_join",
    // q91: the histogram's global (min,max) is ONE broadcast row
    "q91_histogram",
    // q261: Kruskal-Wallis' 1-row tie-total broadcast onto the 1-row
    // moment aggregate (no-collect scalar pattern)
    "q261_kruskal_wallis",
    // q263: the G-test's 1-row grid-total and micro-nat-sum broadcasts
    // (the q192 mutualInformation shape)
    "q263_g_test",
    // q269: t-closeness' class x value grid completion (classes x m,
    // both quasi-bounded) + the 1-row EMD-aggregate broadcast
    "q269_t_closeness",
    // q270: the silhouette's centroid set collapses to ONE broadcast
    // row (the q75 centroid pattern)
    "q270_silhouette",
    // q275: k-core's 1-row core-size broadcast onto the surviving
    // degrees (no-collect scalar pattern)
    "q275_kcore",
    // q274: the layout audit's 1-row stats/quantile-cut broadcasts
    // (the q209 shape)
    "q274_hilbert_audit",
    // q99/q100/q101: the LM vocabulary size / bucket-histogram totals /
    // corpus token total are each ONE broadcast row
    "q99_lm_perplexity", "q100_dsir_weights", "q101_source_divergence",
    "q102_ccnet_buckets",
    // q103: cosineTopK's one-row target-vector broadcast (the q27 shape)
    "q103_profile_similarity",
    // q104: kmeansCentroids' one-row centroid-array broadcast (q75 shape)
    "q104_profile_segments",
    // q105/q106: six 1-row trained-merge broadcasts chain the BPE rounds
    "q105_bpe_train", "q106_bpe_tokenize",
    // q120: youdenThreshold's ONE-row chosen-threshold broadcast (and
    // the 1-row class-totals broadcast feeding its argmax)
    "q120_youden_gate",
    // q123: kmeansCentroids + semanticDedup's one-row centroid-array
    // broadcasts (q75 shape)
    "q123_semdedup",
    // q125/q126: pqTrain/pqEncode's one-row codebook broadcast and
    // pqAdcTopK's one-row LUT broadcast (q75 shape: m·C constants)
    "q125_pq_encode", "q126_pq_adc",
    // q129: tfidfKeywords' ONE-row doc-count broadcast
    "q129_tfidf_keywords",
    // q132: hardNegatives' IVF gear — the one-row centroid-array
    // broadcasts of ivfCandidates (q78 shape) + the tiny probe-set
    // broadcast joined onto cell-pruned candidates (the q54 shape)
    "q132_hard_negatives",
    // q133: temperatureMixture's ONE-row weight-total broadcast
    "q133_temperature_mix",
    // q143: pairAffinity's ONE-row basket-total broadcast
    "q143_basket_affinity",
    // q148: pageRank's ONE-row node-count broadcast per iteration
    "q148_pagerank",
    // q151: the margin grid (q61's dimension-grid shape) + ONE-row
    // total broadcast
    "q151_chi_square",
    // q157: decileLift's ONE-row cuts + ONE-row totals broadcasts
    "q157_decile_lift",
    // q159: weighted pageRank's ONE-row node-count broadcast
    "q159_pagerank_weighted",
    // q162: the graph profile's ONE-row edge/component-stat broadcasts
    "q162_graph_profile",
    // q165: vocabGrowth's ONE-row quantile-cuts broadcast
    "q165_vocab_growth",
    // q166: pairAffinity's ONE-row basket-total broadcast (q143 shape)
    "q166_also_bought",
    // q175: the reference sketch is a ≤ ~70-row bucket table broadcast
    // onto the group list (the PSI grid); data-sized nothing
    "q175_psi_drift",
    // q180: the 9-digit grid's ONE-row total broadcast (q61 shape)
    "q180_benford",
    // q183: the ONE-row quantile-cuts broadcast (q89/q165 shape) and
    // the ONE-row corpus-max-day broadcast onto the per-user frame
    "q183_rfm",
    // q185: the ONE-row Nt / Nb total broadcasts onto the
    // vocab-bounded collocation table (q129 doc-count shape)
    "q185_pmi_collocations",
    // q209: layoutAudit's ONE-row global min/max stats broadcast and
    // the ONE-row quantile-cuts broadcast per layout (q157 shape)
    "q209_zorder_audit",
    // q213: logOddsWords' ONE-row (corpus total, vocab size) broadcast
    // onto the vocab-bounded count table (q129 shape)
    "q213_logodds_words",
    // q214: jsSourceMatrix's sources-sized (~20-row) totals broadcast
    // building the pair grid and joining the shared-token aggregates
    "q214_js_source_matrix",
    // q221: logHistEmd's reference sketch is a ≤ ~70-row bucket table
    // broadcast onto the group list (the q175 PSI-grid shape)
    "q221_sketch_emd",
    // q222: the ONE-row corpus-total broadcast and the value-bounded
    // global-cum inequality lookup (mapping rows × distinct values —
    // both histogram-sized, never row-sized; documented bound in
    // Eval.quantileNormalizeMap)
    "q222_quantile_norm",
    // q223: each check row folds a ONE-row violation count into a
    // ONE-row total (six 1×1 crossJoins)
    "q223_contract_audit",
    // q226: bm25TopK's ONE-row (N, A) corpus-total broadcast onto the
    // query-term-bounded scoring join (q129 doc-count shape)
    "q226_bm25_topk",
    // q230: conformalGate's ONE-row calibration-count broadcast onto
    // the score-cardinality-bounded histogram, and the ONE-row
    // (n_cal, rank, q_hat) broadcast onto the test fold
    "q230_conformal_gate",
    // q241: hllOverlap's inequality join of the register table against
    // the GROUP list (groups × ≤512 rows — group-bounded, the q214
    // pair-grid shape)
    "q241_hll_overlap",
    // q242: neymanAllocation's ONE-row weight-total and ONE-row
    // leftover broadcasts onto the stratum-bounded quota table
    "q242_neyman_allocation",
    // q256: bottomKIntersect's inequality joins of the signature table
    // (≤ 256 rows/group) and HLL register table (≤ 512 rows/group)
    // against the GROUP list — group-bounded, the q241 pair-grid shape
    "q256_bottomk_intersect",
    // q257: unigramTrain's per-round 1-row score-map broadcasts plus
    // the 1-row vocab-total broadcasts (the q75/q105 round pattern)
    "q257_unigram_train",
    // q259: q46's IVF shape (centroid-set broadcast + probe-set
    // broadcast) with the stride derived by sqrtStride — C ≈ √N
    "q259_ivf_sqrt",
    // q280–q284: the √N-stride re-gates of q125/q126/q75/q76/q78 —
    // identical intentional one-row codebook/LUT/centroid-set
    // broadcasts, now C ≈ √N by construction
    "q280_pq_encode_sqrt", "q281_pq_adc_sqrt", "q282_kmeans_sqrt",
    "q283_ivf_trained_sqrt", "q284_ivf_knn_join_sqrt",
    // q244: logHistKs' reference sketch is a ≤ ~70-row bucket table
    // broadcast onto the group list (the q175/q221 PSI-grid shape)
    "q244_sketch_ks",
    // q247: waterFill's ONE-row (n, total) and ONE-row water-level
    // broadcasts onto the stratum-bounded table (q242 shape)
    "q247_water_fill",
    // q248: simpsonDirection's ONE-row pooled-sign broadcast onto the
    // group-bounded moment table
    "q248_simpson_audit",
    // q252: looAblation's ONE-row corpus-total broadcast onto the
    // group-bounded table
    "q252_loo_ablation",
    // q253: corpusBleu's ONE-row clip/total pivot broadcast onto the
    // ONE-row lengths aggregate (1x1 crossJoin)
    "q253_corpus_bleu",
    // q285: corpusBleuMulti's identical 1x1 pivot/lengths crossJoin
    "q285_bleu_multiref",
    // q288: rakeScoreAgainst's two ONE-row model broadcasts (stoplist
    // array + word-score map — the stream-static serving shape)
    "q288_rake_serving",
    // q290: intervalOverlapPartnerTopK's ONE-row hot-bucket guard
    // broadcast (max per-bucket population, raise_error over the cap)
    // gating the join input — the loud-guard shape, data-sized nothing
    "q290_session_overlap_topk",
    // q293: ivfServe's centroid-set broadcast onto the probe split
    // (C ≈ N/37 rows — the q259/q284 intentional IVF shape) feeding
    // the probe-cell ranking; the cell index joins by equi-key
    "q293_ivf_serving",
    // q296: ivfPqServe's coarse-centroid broadcast onto the probe
    // split (the q293 shape) + the ONE-row codebook-array broadcast
    // building each probe's ADC LUT; code cells join by equi-key
    "q296_ivfpq_serving",
    // q298: the ann_serve stage delegates to ivfPqServe — q296's
    // intentional model broadcasts through the config path
    "q298_pipeline_ann_serving")

  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local(8, "plan-audit")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val intentional1Row = intentionalBnl
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val plan = fn(spark, dir).queryExecution.executedPlan.toString
      val flags = Seq(
        "CartesianProduct" -> plan.contains("CartesianProduct"),
        "BNLJoin" -> (plan.contains("BroadcastNestedLoopJoin") &&
          !intentional1Row.contains(name)),
        "text-in-exchange" -> plan.linesIterator.exists(l =>
          l.contains("Exchange hashpartitioning") && l.contains("text#"))
      ).collect { case (f, true) => f }
      if (flags.nonEmpty) println(s"FLAG $name: ${flags.mkString(", ")}")
    }
    println("plan audit done")
    spark.stop()
  }
}
