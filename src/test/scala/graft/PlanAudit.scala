package graft

/** Dev tool: print the AQE-final executed plan of registered queries —
  * the `.explain`-driven iteration loop for plan audits (not a test; run
  * with `sbt "Test/runMain graft.PlanAudit <sfDir> [query ...]"`).
  * With no query args, audits every registered query and prints only the
  * join/exchange/window skeleton lines plus red-flag markers.
  */
object PlanAudit {

  val RedFlags = Seq("BroadcastNestedLoopJoin", "CartesianProduct")
  // declared all-pairs baselines: the nested loop IS the (intentionally
  // quadratic) algorithm; the registered scale paths are the LSH variants
  // ann_recall_ivf embeds the brute baseline as its ground-truth side
  val AllPairsBaselines =
    Set("ann_topk_brute", "dedup_embedding", "emb_knn_classify", "ann_recall_ivf",
      // r14: the L2 serving mode of the same brute broadcast baseline
      "ann_topk_l2",
      // both ranking passes reuse the brute-force broadcast baseline
      "emb_trunc_agreement",
      // fuses two brute-force broadcast rankings (full + truncated prefix)
      "ann_rrf_fusion",
      // scores the ADC index against the brute-force ground-truth side
      "ann_recall_pq",
      // r6: the recall@k curve embeds the same brute ground-truth side
      "ann_recall_curve",
      // r8: int8-code search scans the corpus against the broadcast query
      // subset (the ann_topk_brute shape, on codes)
      "ann_topk_sq",
      // r8: scores that int8 ranking against the brute ground-truth side
      "ann_recall_sq",
      // r8: MaxSim late interaction scans the corpus against the
      // broadcast query subset (the ann_topk_brute shape, on subvectors);
      // at 100 TB it composes as the rerank stage over an ANN shortlist
      "ann_topk_maxsim",
      // all-pairs on the |days|-row calendar series (bounded), not on data
      "ev_theil_sen",
      // r12: all-pairs slopes on the 10-row growth curve (<=45 pairs) +
      // the 1-row beta broadcast — the ev_theil_sen class
      "txt_heaps_fit",
      // r12: censoring range-join of the |cohorts|-row size table with
      // the |offsets|-row grid (both calendar-bounded) + the theil-sen
      // pair join on the |offsets|-row log curve
      "cs_retention_halflife",
      // r9: each nprobe arm scores IVF-PQ against the same brute
      // ground-truth side (the ann_recall_pq shape, |nprobes| arms)
      "ann_recall_nprobe",
      // r9: per-prefix-dims arms each run the brute broadcast ranking
      // (the emb_trunc_agreement shape, |dims| arms + the truth side)
      "emb_mrl_curve",
      // r9: binary-code Hamming scan against the broadcast query subset
      // (the ann_topk_sq shape, on 8-byte sign codes)
      "ann_topk_binary",
      // r9: scores that binary ranking against the brute ground-truth side
      "ann_recall_binary")
  // queries whose only nested loops are 1-row broadcast scalar joins
  // (corpus totals / thresholds / IDF constants computed in-plan — the
  // no-driver-count discipline; build side is a single-row aggregate)
  val ScalarBroadcast = Set(
    "ann_topk_ivf", "ev_bloom_semi_join", "ev_gapfill", "ev_heavy_hitters",
    "ev_histogram", "li_basket_pairs", "li_basket_rules", "li_recommend", "cust_rfm",
    "tbl_fk_integrity", "ord_benford",
    "q11_important_stock", "q22_idle_rich", "txt_collocations",
    "txt_stopword_candidates", "txt_surprisal_deciles", "txt_tfidf_top_terms",
    "txt_tfidf_doc_sim", "txt_unigram_logprob",
    // r5: trend's day rebase, chi2's N, pareto/decile quantile cuts, and
    // pagerank's node count + dangling mass are all 1-row aggregates
    "ev_trend", "ev_chi2_hour", "ord_pareto", "ev_value_deciles", "ev_pagerank",
    "ev_ab_lift", "ord_backlog_aging", "li_abc_class", "cs_churn_risk",
    "ev_dow_hour_heatmap", "tbl_pk_audit",
    "ev_status_time_share", "ev_autocorr", "ev_chi2_value_type",
    "li_graph_stats", "txt_bigram_surprisal",
    // side totals / quota total + deficit are 1-row aggregates
    "tbl_join_card", "txt_quota_alloc",
    // global-max freshness reference is a 1-row aggregate
    "ev_freshness",
    // r9: the calendar midpoint is a 1-row min/max aggregate
    "ev_did",
    // r9: the same 1-row calendar-midpoint broadcast (the did cut)
    "ev_psi", "ev_growth_decomposition",
    // r9: the corpus max doc_id is a 1-row aggregate
    "txt_vocab_growth",
    // r9: the 1-row observed-max-week broadcast bounding churn
    "ev_lifecycle_matrix",
    // r11: frozen |cells|-row centroid broadcast (the ann_topk_ivf probe
    // shape) + the 1-row index/append totals
    "emb_ivf_append",
    // r11: the 1-row (train tokens N, train vocab V) LM scalars
    "txt_lm_perplexity",
    // r11: the same LM scalars + the 1-row tercile-cut percentile
    "txt_ppl_buckets",
    // r11: the 1-row observed-max-month broadcast anchoring retention
    "tbl_vacuum_plan",
    // r11: the 1-row unique-mass/sqrt totals behind the epoch allocation
    "txt_epoch_plan",
    // r11: inherits coOccurrence's 1-row group-total broadcast (the
    // li_local_cc input shape)
    "li_edge_support",
    // r12: the nBatches-row (4) literal probe-id table joined non-equi
    // (batch < id) onto the band table — a bounded ×nBatches unfold,
    // never data×data
    "tbl_ledger_stats",
    // r12: the same 4-row snapshot-id unfold (batch ≤ id) over per-batch
    // partial counts + the 1-row running-total broadcast
    "ev_heavy_incr",
    // r9: per round, the 1-row top-pair and 1-row post-merge-count
    // broadcasts (both TakeOrdered/aggregate outputs)
    "txt_bpe_merges", "txt_bpe_compression",
    // r6: exact-rank p99 joins the 1-row stats/target aggregates back in
    "ev_key_skew",
    // |labels|-row broadcast (bounded by label cardinality, not data size)
    "emb_silhouette",
    // k-row broadcast centroid table (bounded by k, not data size)
    "emb_kmeans_step", "emb_kmeans_step2",
    // k-row broadcast PQ codebook (bounded by k, not data size)
    "emb_pq",
    // r11: same codebook broadcast for the refit assignment scan + the
    // |subspaces·k|-row grid/displacement joins
    "emb_pq_train",
    // r12: two (k+1)-row broadcast codebooks (coarse + residual), both
    // bounded by k, never data size
    "emb_rq_train",
    // r12: the same codebooks + the broadcast |queries|·(k+1)²-row
    // reconstruction-distance table (bounded by the query batch)
    "ann_topk_rq", "ann_recall_rq", "ann_topk_rq_rerank",
    // same k-row codebook broadcast for encode + the per-query ADC table
    "ann_topk_pq",
    // |labels|-row centroid probe + the same codebook/ADC broadcasts
    "ann_topk_ivfpq",
    // ADC shortlist stage reuses the codebook broadcasts; rerank joins by id
    "ann_topk_rerank",
    // r9: same ADC shortlist codebook broadcasts; negatives join by id
    "emb_hard_negatives",
    // r8: same ADC shortlist stage, MaxSim second stage joins by id
    "ann_topk_maxsim_rerank",
    // |thresholds|-row (7) broadcast fan-out over the candidate pairs
    "dedup_threshold_sweep",
    // r11: |thetas|-row (5) broadcast fan-out over the within-cell pair
    // cosines + the 1-row corpus total
    "dedup_semantic_sweep",
    // r9: 1-row broadcast truth count scoring the 5-config band sweep
    "dedup_lsh_band_design",
    // r9: 1-row broadcast of the chosen generalization level
    "cust_anon_plan",
    // r6: |sources| × top-50 grid + 1-row total — same shape as the
    // chi2 queries; both sides bounded by construction
    "txt_source_chi2",
    // r6: inherit coOccurrence's 1-row broadcast group total (and
    // kcore adds its own two 1-row summary aggregates); r7: the fed-back
    // LPA iteration composes the same pair table twice
    "li_label_prop_step", "li_label_prop2", "li_kcore", "cs_dept_pairs",
    // r8: inherits coOccurrence's 1-row broadcast group total on the edge
    // input; the link-prediction stages themselves are all equi-joins
    "li_link_pred",
    // r9: same inherited coOccurrence 1-row total; the orientation,
    // wedge, and closing-edge stages are all equi-joins
    "li_local_cc",
    // r9: inherited coOccurrence total + the 1-row m / node-count
    // broadcasts closing the modularity rollup
    "li_modularity",
    // r6: 1-row broadcast of the base-run conversion probability
    "cs_markov_attribution",
    // r6: 1-row broadcast midpoint-day split + coOccurrence's total
    "li_recommend_eval",
    // r6: the signature pair join is |segments|² over a |days|-row
    // sketch table (k longs per row) — bounded by the calendar, not data
    "ev_segment_minhash",
    // r7: Sharded.rankAndPrefix shard offsets — an nShards²-pair (32×32)
    // broadcast self-join over the nShards-row shard-total table
    "cust_gini",
    // r7: 1-row broadcast calendar-midpoint split (recommendEval shape);
    // ev_cuped adds the 1-row global-moment broadcast on top
    "tbl_stats_drift", "ev_cuped",
    // r7: Sharded offsets (32×32) + the |pcts|-row broadcast target table
    "ev_exact_value_ranks",
    // r7: midpoint cut + two abcClass passes (each with its 1-row total
    // broadcast and Sharded's 32×32 offset self-join)
    "li_abc_migration",
    // r7: 1-row broadcast midpoint probe instant into the SCD2 intervals
    "ev_scd2_asof",
    // r7: 1-row broadcast day bounds + series-moment table
    "ev_xcorr",
    // r8: 1-row broadcast censor day riding the span aggregate
    "ord_hazard",
    // r8: 1-row broadcast cent-grid bounds + global row total
    "cust_t_closeness",
    // r8: 1-row broadcast node count beside the moment aggregate
    "li_assortativity",
    // r8: inherits coOccurrence's 1-row broadcast group total on the
    // basket-pair edge input (the li_graph_stats shape)
    "li_degree_hist",
    // r8: 1-row broadcast discount denominator (total distinct bigram
    // types) riding the bigram/unigram equi-joins
    "txt_kn_bigram",
    // r12: the same 1-row D2 type-count broadcast one order up
    "txt_kn_trigram",
    // r8: 1-row broadcast corpus size N beside the term-moment TakeOrdered
    "txt_burstiness",
    // r8 (allowlisted r9): two 1-row broadcasts — the token/√token totals
    // and the largest-remainder deficit — riding the |langs|-row quota table
    "txt_temperature_mix",
    // r8 (allowlisted r9): 1-row broadcasts of the corpus/target token
    // totals beside the fixed 1024-row hashed-feature table
    "txt_dsir_weights",
    // r9: embeds adcTopK's k-row codebook crossJoins for the post-filter
    // shortlist stage (the ann_topk_pq shape); exact arm is an equi-join
    "ann_topk_filtered",
    // r9: |thresholds|-row (6) broadcast fan-out over the joined pair
    // table — the dedup_threshold_sweep shape with a ground-truth input
    "dedup_lsh_pr_curve",
    // r9: 3-row voting-rule broadcast fan-out over the pair-vote table
    "dedup_ensemble",
    // r9: k-row broadcast seed-centroid table (the emb_kmeans_step class)
    "emb_cluster_purity",
    // r14: the same k-row broadcast seed-centroid table on the unit grid
    "emb_spherical_kmeans",
    // r9: 1-row broadcast min/max bounds for the 16-bit grid normalize
    "tbl_zorder_plan",
    // r12: two 1-row broadcasts per round (hit count, truth count) beside
    // the 1-row graph aggregate — the dedup_recall_harness readout shape
    "emb_nn_descent", "emb_nn_descent2",
    // r13: every power-iteration step crossJoins the previous step's
    // 1-row checkpointed (mu, direction) aggregate back onto the corpus
    "emb_whiten2",
    // r13: the same per-step 1-row crossJoins plus the adjacent-step
    // 1-row readout joins
    "emb_power_curve",
    // r13: the 1-row observation-max-day broadcast (the
    // ev_lifecycle_matrix bound) ahead of the 1-row KM fold
    "cs_survival_km",
    // r12: inherits coOccurrence's 1-row broadcast group total (the
    // li_degree_hist note) — BFS itself is pure equi-joins
    "li_bfs_hops",
    // r13: same inherited coOccurrence 1-row total — both Brandes passes
    // are pure equi-joins over checkpointed levels
    "li_betweenness_sample",
    // r13: same inherited coOccurrence 1-row total — the Bellman-Ford
    // relax rounds are edge-keyed equi-joins
    "li_cheapest_path",
    // r14: same inherited coOccurrence 1-row total — the weighted
    // Brandes phases (relax, DAG, sigma/delta folds) are all equi-joins
    "li_betweenness_weighted",
    // r14: same inherited coOccurrence 1-row total — the closeness
    // readout is one node-keyed aggregate over the bfsHops equi-joins
    "li_closeness",
    // r14: same inherited coOccurrence 1-row total — eccentricity is the
    // per-source readout of the same distance table
    "li_eccentricity",
    // r14: 1-row midpoint-day + 1-row half-total broadcasts riding the
    // supplier aggregate (the tbl_stats_drift split convention)
    "sup_share_shift",
    // r14: midpoint cut + two per-half 1-row quantile-cut broadcasts —
    // the li_abc_migration split shape at customer grain
    "cust_value_migration",
    // r14: 1-row corpus-token-total broadcast beside the 1024-row hashed
    // histogram equi-join (the txt_dsir_weights shape)
    "txt_doc_kl",
    // r14: same inherited coOccurrence 1-row total — the AA wedges are
    // the li_link_pred equi-join stages with a weight column
    "li_adamic_adar",
    // r13: inherits abcClass's 1-row revenue-total broadcast and
    // Sharded's 32×32 offset self-join (the li_abc_class entry)
    "li_abc_xyz")

  // Queries allowed an unpartitioned window (single-partition sort) whose
  // input is bounded BY CONSTRUCTION but not by a Limit the guard can see
  // structurally. Every entry documents its bound; anything else with an
  // empty-partition-spec window over un-limited input fails
  // PlanSpec's registry sweep — the 100 TB scale-killer class VERDICT r6
  // flagged (a billion-term vocabulary through one WindowExec partition).
  val BoundedGlobalWindow: Set[String] = Set(
    // running / rolling windows over the |days|-row daily aggregate —
    // bounded by the calendar, not the data
    "ev_error_budget", "ord_open_orders", "ev_concurrency",
    // r11: the same |days|-row RANGE windows (the error_budget bound)
    "ev_slo_burn",
    // rank windows over the 24-row hour-of-day domain
    "ev_hour_spearman",
    // next-fit packing window over the nBuckets-row (64) file table
    "tbl_compaction_plan",
    // share-of-total windows over |event_type|-row Markov state tables
    "cs_markov_attribution",
    // r12: the same |types|-row state-table bound for the entropy-rate
    // weights (N = Σ n_out over the per-from-type rows)
    "ev_markov_entropy",
    // r12: BH rank/step-up windows over the |types|-row p-value table
    "ev_perm_fdr",
    // share-of-total window over the 5-row lateness-band aggregate
    "ev_lateness_profile",
    // largest-remainder rank over the |groups|-row (language) quota table
    "txt_quota_alloc",
    // r7: ±3-day lag window over the |days|-row dense grid (calendar)
    "ev_xcorr",
    // r8: at-risk suffix sum over the |span-length| histogram — bounded
    // by calendar days (spans live inside the observation window)
    "ord_hazard",
    // r8 (allowlisted r9): largest-remainder rank over the |langs|-row
    // quota table — the txt_quota_alloc bound
    "txt_temperature_mix",
    // r9: cumulative sums over the |buckets|-row (10) growth grid
    "txt_vocab_growth",
    // r12: composes txt_vocab_growth, so it carries the same 10-row
    // cumulative window into its log-log fit input
    "txt_heaps_fit",
    // r11: running reclaim ledger over the |months|-row (~84) partition
    // table — bounded by the order-date calendar
    "tbl_vacuum_plan",
    // r12: ±3-day MA window over the |days|-row daily table (the ev_xcorr
    // calendar bound) + the re-centering window over the 7-row weekday fit
    "ev_decompose_weekly")

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val spark = GraftSession.local("plan-audit", 8)
    try {
      names.foreach { name =>
        val df = SparkEntry.queries(name)(spark, dir)
        df.queryExecution.toRdd.count() // materialize so AQE finalizes
        val plan = df.queryExecution.executedPlan.toString
        val skeleton = plan.linesIterator.filter(l =>
          l.contains("Join") || l.contains("Exchange") || l.contains("Window") ||
            l.contains("Generate") || RedFlags.exists(l.contains))
        println(s"===== $name")
        skeleton.foreach(l => println(l.replaceAll("#\\d+", "")))
        RedFlags.filter(plan.contains).foreach { f =>
          val tag =
            if (AllPairsBaselines(name)) "allowed (declared all-pairs baseline)"
            else if (ScalarBroadcast(name)) "allowed (1-row broadcast scalar)"
            else "RED FLAG"
          println(s"  !! $f — $tag")
        }
      }
    } finally spark.stop()
  }
}
