"""Benchmark harness: runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with the noop sink (count() would let
Catalyst prune the very columns the query computes).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

HEADLINE = [
    "pricing_summary",
    "top_revenue_nations",
    "revenue_forecast",
    "forecast_metrics",
    "shipping_priority",
    "order_priority_returns",
    "customer_returns_topk",
    "hash_split_train_stats",
    "event_props_json",
    "event_value_moving_avg",
    "standard_scaler_transform",
    "gaussian_nb_fit",
    "pca_covariance",
    "classification_metrics",
    "regression_metrics",
    "kmeans_cluster_sizes",
    "logistic_regression_eval",
    "exact_dedup",
    "minhash_lsh_pairs",
    "simhash",
    "token_document_frequency",
    "tfidf",
    "quality_scores",
    "language_id",
    "document_fingerprint",
    "ann_bruteforce_topk",
    "embedding_near_dup",
    "embedding_near_dup_scaled",
    "semantic_dedup",
    "semantic_dedup_linear",
    "cross_corpus_dedup",
    "source_token_quota",
    "sequence_packing",
    "quantized_embeddings",
    "ann_recall_metrics",
    "windowed_event_features",
    "event_type_rollup",
    "event_sessionization",
    "quantile_transformer_fit_approx",
    "one_hot_encoder",
    "count_vectorizer_long",
    "rbf_kernel_to_centers",
    "multimodal_decode",
    "image_dhash_bands",
    "image_near_dup_pairs",
    "image_dedup_keep_one",
    "audio_fingerprint_bands",
    "frame_sample",
    "weighted_metrics",
    "pipeline_poly_scale",
    "column_transformer",
    "quality_filter",
    "simple_imputer_transform",
    "kbins_discretizer_approx",
    "target_encoder",
    "row_normalizer",
    "feature_hasher_long",
    "bpe_pair_counts",
    "bpe_merges",
    "quality_classifier_scores",
    "corpus_manifest",
    "corpus_diff",
    "perplexity_bucket_sample",
    "boilerplate_removal",
    "repeated_span_removal",
    "document_chunks",
    "shuffle_shards",
    "normalized_text_hash",
    "strip_markup",
    "vocab_coverage",
    "cooccurrence_topk",
    "ppmi_topk",
    "outlink_domain_profile",
    "domain_pagerank",
    "score_smoothing",
    "curation_pipeline",
    "training_data_prep",
    "local_supplier_volume",
    "promo_revenue",
    "large_orders",
    "idle_customers",
    "sole_supplier_orders",
    "small_quantity_revenue",
    "bracketed_discount_revenue",
    "important_parts",
    "market_share",
    "product_profit",
    # TPC-H tail shapes (Q2/Q12/Q15/Q16/Q20 analogs) — completes the
    # 22-shape family
    "min_cost_supplier",
    "late_shipment_priority",
    "top_supplier_revenue",
    "part_supplier_variety",
    "dominant_part_suppliers",
    "asof_purchase_attribution",
    "fuzzy_vocab_pairs",
    "url_dedup",
    "kcenter_sample",
    "gopher_quality",
    "knn_classifier_eval",
    "script_profile",
    "dbscan_cluster_sizes",
    "mahalanobis_outliers",
    "interval_session_clicks",
    "view_click_attribution",
    "ols_newton_fit",
    "stratified_sample",
    "table_profile_approx",
    "contamination_scores",
    "bloom_decontam_scores",
    "mixture_sample",
    "temperature_mixture_sample",
    "epoch_plan",
    "weighted_doc_sample",
    "weighted_lang_sample",
    "token_heavy_hitters",
    "variance_threshold",
    "select_kbest",
    "f_regression_scores",
    "time_series_split_stats",
    "winsorized_prices",
    "part_attribute_stats",
    "quality_drift",
    "chi2_scores",
    "group_quality_topk",
    "lsh_ann_topk",
    "knn_graph_topk",
    "pq_ann_topk",
    "ivfpq_ann_topk",
    "repetition_scores",
    "unigram_logprob",
    "bigram_logprob",
    "bm25_scores",
    # model-selection planner coverage (SURVEY §2.6 — the reference's
    # biggest subsystem): cached-fold grid search + executor-trained
    # Hyperband, so a planner regression shows up in the bench
    "group_kfold_assignment",
    "grid_search_best",
    "hyperband_best",
    # distributed prefix-sum machinery (rank-sum AUC over score groups)
    "roc_auc_eval",
    # the 100 TB AUC path: equal-width binning, no score-sorted shuffle
    "roc_auc_binned",
    # r8 audit: every distinct operator family gets at least one bench
    # line (these 14 had no timing record at any SF)
    "truncated_svd_variance",       # Gramian eigensolve
    "incremental_pca_fit",          # streaming PCA merge
    "spectral_clustering_sizes",    # Nystrom landmark embedding
    "parallel_post_fit_eval",       # broadcast-model mapInPandas inference
    "incremental_sgd_eval",         # executor-chained partial_fit wrapper
    "incremental_search_best",      # standalone SuccessiveHalving (oracled r9)
    "poisson_newton_fit",           # IRLS GLM
    "pipeline_grid_search",         # planner prefix sharing (oracled path)
    "pii_redaction",                # regex-heavy curation projection
    "ngram_jaccard_pairs",          # n-gram Jaccard near-dup join
    "salted_join_revenue",          # skew-salting join lever
    "ivf_ann_topk",                 # plain-IVF probe path
    "token_shards",                 # grouped two-phase prefix sum
    "dedup_clusters",               # min-label components over LSH pairs
    # r8 additions — each a new operator family
    "gmm_params",                   # diagonal-EM Gaussian mixture
    "frequent_itemsets_stats",      # apriori levels 1-3 (HOF combos)
    "association_rules_topk",       # confidence/lift rule ranking
    "copurchase_triangles",         # degree-oriented triangle counting
    "time_fill_events",             # grid fill + linear interpolation
    "random_projection_norms",      # JL sparse projection fold
    # r9 additions (semantic_dedup_linear is listed above beside its
    # paper-geometry sibling)
    "ks_price_test",                # two-sample KS (prefix-sum ECDFs)
    "ks_price_test_binned",         # KS 100TB path (equal-width bins)
    "mann_whitney_discount",        # rank-sum U + tie-corrected z/p
    "kaplan_meier_conversion",      # product-limit survival curve
    "chi2_independence_flags",      # contingency chi-square + exact tail
    "welch_ttest_price",            # one-pass unequal-variance t-test
    "mutual_information_events",    # discrete MI + normalized coefficient
    "feature_corr_matrix",          # all-pairs Pearson, one aggregate
    # r10 additions
    "welch_bh_by_month",            # per-stratum Welch sweep + BH FDR
    "bootstrap_price_ci",           # Poisson-bootstrap CI, one pass
    "bootstrap_ci_by_flag",         # per-group bootstrap CI sweep
    "prop_ztest_discount",          # two-proportion z, one aggregate
    "anova_event_value",            # k-group one-way F + chi2-limit p + eta^2
    "pairwise_welch_events",        # post-hoc pairwise Welch + BH
    "spearman_price_quantity",        # headline: bins=K scale path
    "spearman_price_quantity_exact",  # tie-averaged ranks (parity witness)
    "kendall_price_quantity",         # tau-b via K^2-cell 2-D prefix sums
    "kruskal_wallis_quantity",        # k-group rank ANOVA, tie-corrected
    "jonckheere_priority_price",      # ordered-alternative trend test
    "wilcoxon_user_value",            # paired signed-rank, per-user means
    "friedman_user_event_value",      # blocked rank test, in-row ranks
    "collocations_logdice_topk",      # Sketch-Engine collocation strength
    "source_concentration",           # Gini/HHI/entropy corpus audit
    "benford_price",                  # first-digit fabrication screen
    "readability_docs",               # Flesch/FK surface-count scores
    "cohens_kappa_lang",              # chance-corrected label agreement
    "mcnemar_quality_screens",        # paired-binary screen comparison
    "cochrans_q_screens",             # k-screen binary Friedman
    "mcc_return_rule",                # imbalance-honest 2x2 phi
    "ece_event_probability",          # calibration error scalar
    "seasonal_decompose_daily",       # trend + weekly seasonal + residual
    "partial_corr_price_quantity",    # confounder-controlled Pearson
    "hl_shift_price",                 # robust pair-median location shift
    "hoeffding_price_quantity",       # non-monotone dependence screen
    "log_rank_conversion",            # censored two-cohort survival test
    "nelson_aalen_conversion",        # cumulative conversion hazard
    "mood_median_price",              # one-bit robust location screen
    "ansari_bradley_price",           # rank scale test (folded scores)
    "welch_anova_event_value",        # heteroscedastic k-group ANOVA
    "jarque_bera_value",              # four-moment normality screen
    "zipf_token_fit",                 # corpus power-law alpha fit
    "brier_event_probability",        # Murphy calibration decomposition
    "brown_forsythe_price",         # variance homogeneity (robust Levene)
    "changepoint_event_value",      # binned mean-shift drift monitor
    "trend_event_value",            # Mann-Kendall + Sen slope (binned)
    "isotonic_price_curve",         # binned minimax-PAV monotone fit
    "ks_drift_daily",               # windowed KS drift vs reference
    "addrift_daily",                # tail-sensitive AD shape drift
    "psi_drift_daily",              # windowed PSI vs reference
    "catdrift_daily",               # categorical-mix PSI + OTHER bucket
    "zdrift_daily",                 # windowed mean/variance z-drift
    "ewmadrift_daily",              # EWMA small-shift control chart
    "corrdrift_monthly",            # feature-relationship (Fisher) drift
    "covdrift_monthly",             # multivariate covariance-structure drift
    "covdrift_projected",           # the d>30 escape: random-project then monitor
    "quantile_drift_daily",         # windowed p50/p90/p99 + deltas
    "embedding_drift_labels",       # per-dim embedding drift + BH
    "acf_daily_value",              # lag correlation of the daily series
]

# The remaining ~50 catalog queries stay out of the headline
# deliberately: they are cheap siblings of benchmarked entries (scaler
# fit vs transform, *_portable hash variants, saturated/closed-form GLM
# twins, single-metric variants of benchmarked metric bundles,
# relational shapes whose family — rollup/pivot/window/asof — already
# has a line) whose plans are identical to the benchmarked family
# member, plus `blockwise_voting_eval`, whose ORACLE geometry pins a
# single-partition layout (the whole table through one Python task —
# a deliberate correctness rendering, misleading as a timing; its
# production mapInPandas machinery is timed by parallel_post_fit_eval
# and its multi-partition semantics live in tests/test_models.py).


def main() -> None:
    from dask_ml_spark import get_spark
    from dask_ml_spark.plans.queries import build_catalog

    spark = get_spark(app_name="dask_ml_spark-bench",
                      extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    queries, _ = build_catalog()

    # warm the JVM + parquet footers + the Python worker pool outside
    # the timed region (the first Arrow UDF otherwise pays ~32 worker
    # startups inside whichever query reaches Python first)
    from pyspark.sql import functions as F

    spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet")).count()

    @F.pandas_udf("long")
    def _warm(s):
        return s

    spark.range(100_000).repartition(32).select(_warm("id")).write.mode(
        "overwrite").format("noop").save()

    # min over N back-to-back runs per query (default 2): single-shot
    # timings on a shared box are polluted by external load spikes —
    # the min is the engine's actual cost. When the first runs disagree
    # badly (>1.5x spread — a load spike landed inside one of them), one
    # extra run settles the floor.
    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2")))
    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = queries[name]
        runs: list[float] = []
        while True:
            t0 = time.time()
            df = fn(spark, SF_DIR)
            df.write.mode("overwrite").format("noop").save()
            runs.append(time.time() - t0)
            # release per-query persisted intermediates (dedup self-join
            # tables etc.) so storage-memory pressure from one query can't
            # skew the next — each query is measured in a clean session state
            spark.catalog.clearCache()
            # collect the previous queries' garbage OUTSIDE the timed
            # region: iterative fits (30-job LBFGS loops) are otherwise
            # billed for full-GC pauses caused by earlier queries' debris
            # (measured 5.6s -> 3.7s on logistic_regression_eval at sf0.1)
            spark.sparkContext._jvm.System.gc()
            if len(runs) < n_runs:
                continue
            noisy = max(runs) > 1.5 * min(runs) and min(runs) > 0.2
            if noisy and len(runs) < n_runs + 1:
                continue
            break
        timings[name] = round(min(runs), 3)
    total = round(sum(timings.values()), 3)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(json.dumps({
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
