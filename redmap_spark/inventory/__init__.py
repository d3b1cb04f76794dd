"""SURVEY §2 inventory: importing this package registers every query."""

from redmap_spark.inventory.registry import ORACLES, QUERIES

# Registration order matters: the driver's CORRECTNESS run verifies the FIRST
# 50 queries() entries in registration order. The LLM-pipeline operators
# (dedup / similarity / text / multimodal / mapreduce) register first so they
# land inside that window; the relational/analytic queries (driver-green in
# round 1) take the overflow slots.
from redmap_spark.inventory import dedup  # noqa: F401
from redmap_spark.inventory import similarity  # noqa: F401
from redmap_spark.inventory import text  # noqa: F401
from redmap_spark.inventory import multimodal  # noqa: F401
from redmap_spark.inventory import sketches  # noqa: F401
from redmap_spark.inventory import mapreduce  # noqa: F401
from redmap_spark.inventory import cohorts  # noqa: F401
from redmap_spark.inventory import relational  # noqa: F401
from redmap_spark.inventory import relational2  # noqa: F401
from redmap_spark.inventory import analytic  # noqa: F401
from redmap_spark.inventory import relational3  # noqa: F401
from redmap_spark.inventory import relational4  # noqa: F401
from redmap_spark.inventory import changefeed  # noqa: F401
from redmap_spark.inventory import linkage  # noqa: F401
from redmap_spark.inventory import quality  # noqa: F401
from redmap_spark.inventory import advanced  # noqa: F401
from redmap_spark.inventory import text2  # noqa: F401
from redmap_spark.inventory import timeseries  # noqa: F401
from redmap_spark.inventory import mlstats  # noqa: F401
from redmap_spark.inventory import graph  # noqa: F401
from redmap_spark.inventory import stats2  # noqa: F401
from redmap_spark.inventory import stats3  # noqa: F401
from redmap_spark.inventory import econ  # noqa: F401
from redmap_spark.inventory import stats4  # noqa: F401
from redmap_spark.inventory import ml  # noqa: F401
from redmap_spark.inventory import infer  # noqa: F401
from redmap_spark.inventory import text3  # noqa: F401
from redmap_spark.inventory import ml2  # noqa: F401
from redmap_spark.inventory import stats5  # noqa: F401
from redmap_spark.inventory import stats6  # noqa: F401
from redmap_spark.inventory import ops  # noqa: F401
# round 7: the former stats7 grab-bag, split by theme (code unchanged at the
# split; mr_betweenness / q_rolling_beta / q_mincer_zarnowitz /
# q_huber_regression were then optimized in place after the split)
from redmap_spark.inventory import risk  # noqa: F401
from redmap_spark.inventory import forecast  # noqa: F401
from redmap_spark.inventory import causal  # noqa: F401
from redmap_spark.inventory import supply  # noqa: F401
from redmap_spark.inventory import distrib  # noqa: F401
from redmap_spark.inventory import regress  # noqa: F401

# The driver's CORRECTNESS window verifies the FIRST 50 queries() entries
# (rows+schema+value-hash vs DuckDB). Rounds 1–7 drove 238 of the 538
# oracle entries driver-green (union of CORRECTNESS_r01..r07); each round
# the window rotates to the next 50 never-driver-verified entries so the
# backlog drains at 50/round (252 left after round 8, counting the two
# round-8 oracle additions sim_ivf_tuning / sim_graph_expand). The rotation test
# (tests/test_oracle.py::test_window_rotation_covers_all_oracles) enforces
# that no slot is wasted on an already-verified entry.
_WINDOW_FIRST = [
    # Round-8 rotation: the 300 oracle entries that have never carried a
    # driver hash_match (union of CORRECTNESS_r01..r07), in prior
    # registration order. The driver verifies the first 50 per round;
    # the remainder queue as fully-unverified overflow for rounds 9+.
    # All 300 were additionally hash-verified in full local sweeps at
    # sf0.01 AND sf0.1 (tools/driver_gate_sim.py ->
    # CORRECTNESS_full_r07.json / CORRECTNESS_full_r07_sf01.json).
    "q_ljung_box", "q_anova_oneway", "q_tukey_hsd", "q_levene_test",
    "q_mcnemar", "q_cochran_armitage", "q_logrank", "q_markov_entropy",
    "q_group_sequential", "q_srm_check", "q_bimodality", "q_abc_analysis",
    "q_pr_curve", "q_covariate_balance", "q_xmr_chart", "q_interrupted_ts",
    "q_rolling_corr", "q_bcg_matrix", "q_price_volume_mix", "q_rate_depth_decomposition",
    "q_target_encoding", "q_woe_iv", "q_quantile_normalization", "q_retention_decay_fit",
    "q_experiment_runtime", "q_eb_binomial", "q_kruskal_wallis", "q_jarque_bera",
    "q_durbin_watson", "q_cohens_kappa", "q_mutual_info", "q_cramers_v",
    "q_theil_index", "q_grubbs_test", "q_granger_lite", "q_page_hinkley",
    "q_elasticity", "q_shapley_attribution", "q_cronbach_alpha", "txt_code_detect",
    "mr_scc", "q_friedman_test", "q_partial_corr", "q_cooks_distance",
    "q_hurst_exponent", "q_newsvendor", "sim_silhouette", "q_prais_winsten",
    "q_chow_test", "q_rate_ratio", "mr_digraph_stats", "q_spectral_power",
    "q_round_number_bias", "q_structuring_detect", "sim_davies_bouldin", "sim_norm_profile",
    "q_naive_bayes", "q_decision_stump", "q_median_polish", "q_process_capability",
    "txt_kn_perplexity", "q_holm_adjust", "q_gamma_moments", "q_gmm_em",
    "q_cvm_test", "q_permutation_test", "q_jackknife", "q_ratio_metric_ci",
    "q_tost_equivalence", "q_mantel_haenszel", "q_cochran_q", "q_icc_reliability",
    "sim_lsh_recall", "q_raking_weights", "q_little_law_audit", "q_var_cvar",
    "q_backlog_aging", "txt_minhash_recall", "q_brier_decomposition", "q_panel_fe",
    "q_regression_discontinuity", "q_event_study", "q_quantile_treatment_effect", "q_oaxaca",
    "q_poisson_irls", "q_zero_inflation", "q_gravity_trade", "q_mahalanobis",
    "q_hotelling_t2", "txt_burrows_delta", "q_mcc_confusion", "q_ndcg_eval",
    "q_weibull_fit", "mr_modularity", "q_fairness_audit", "q_item_cf",
    "sim_pca_power", "q_bass_diffusion", "q_cointegration", "q_competing_risks",
    "q_cem_att", "q_shift_share", "q_life_table", "q_nbd_fit",
    "q_absorbing_chain", "txt_rake_keywords", "txt_source_overlap", "q_kde_density",
    "q_second_pc", "q_fleiss_kappa", "q_gumbel_fit", "q_vif",
    "q_breusch_pagan", "q_yule_walker", "q_isotonic_pava", "q_hosmer_lemeshow",
    "q_storey_pi0", "q_wilcoxon_signed_rank", "q_atkinson_index", "q_moran_i",
    "q_kpss_lite", "q_market_beta", "txt_segment_ttr", "q_iv_wald",
    "q_lognormal_fit", "txt_boilerplate_affixes", "q_bradley_terry", "q_ucb_policy",
    "sim_centroid_shift", "q_taylor_law", "q_records", "q_hawkes_branching",
    "q_interevent_burstiness", "q_conformal_interval", "txt_chao1_richness", "q_kendall_w",
    "q_ordinal_association", "txt_log_odds", "q_otsu_threshold", "q_logit_irls",
    "q_ipw_ate", "q_design_effect", "q_holt_brown", "q_drawdown",
    "q_erlang_c", "q_anderson_darling", "txt_textrank", "q_getis_ord",
    "q_markov_attribution", "q_croston", "q_session_entry_exit", "q_tail_dependence",
    "q_rsi", "q_cross_elasticity", "sim_hubness", "q_bartlett_test",
    "q_als_rank1", "q_heckman_mills", "q_piecewise_hazard", "mr_ppr",
    "sim_margin_audit", "q_mus_sampling", "q_bid_rigging_screen", "q_optimal_reserve",
    "q_xyz_class", "q_wilson_returns", "mr_matching", "sim_twonn",
    "q_mediation_sobel", "q_dunn_posthoc", "q_eoq_policy", "q_knapsack_budget",
    "q_duplicate_payments", "q_benford_entity", "q_lead_lag_matrix", "q_price_recommendation",
    "q_hazard_ratio", "sim_calinski", "q_survival_rmst", "mr_bipartite_cc",
    "q_hill_diversity", "q_share_of_wallet", "q_assortment_overlap", "q_kfold_cv",
    "q_learning_curve", "q_dr_policy_eval", "q_weighted_median", "q_changepoint_binseg",
    "q_km_greenwood", "q_fisher_exact", "q_haar_energy", "q_session_gap_sweep",
    "q_cox_onestep", "q_circular_stats", "q_transfer_entropy", "q_dissimilarity_index",
    "q_bullwhip", "q_output_file_planner", "mr_betweenness", "q_chain_ladder",
    "q_gpd_tail", "q_lorenz_asymmetry", "q_energy_distance", "q_threshold_opt",
    "q_p_chart", "q_huber_m", "q_location_quotient", "q_slo_burn_rate",
    "q_forecast_combo", "q_meta_analysis", "q_safety_stock", "q_turning_points",
    "q_qini_auuc", "q_msprt", "q_ridge_path", "q_var_backtest",
    "q_adstock_mmm", "q_fh_smallarea", "q_mcf_recurrent", "q_kraljic",
    "q_stl_strength", "q_rolling_beta", "q_cohort_payback", "q_perfect_order",
    "q_es_backtest", "q_apportionment", "q_smr_indirect", "q_enrichment_ora",
    "q_direct_standardization", "q_sharpe_panel", "txt_lmir_dirichlet", "q_bayes_factor_bic",
    "q_evalue_sensitivity", "q_eta_promise", "q_recsys_coverage", "q_hoover_index",
    "sim_knn_classifier", "q_effect_sizes", "q_bland_altman", "q_interval_score",
    "q_crps_empirical", "q_haberman_residuals", "q_pit_calibration", "q_mase",
    "q_diebold_mariano", "txt_self_bleu", "mr_rich_club", "q_lee_bounds",
    "q_mover_stayer", "q_berkson_logit", "q_twfe_did", "q_arch_lm",
    "q_variance_ratio", "q_amihud", "q_price_stickiness", "q_ledoit_wolf",
    "txt_umass_coherence", "q_brand_switching", "q_l_diversity", "q_analogue_forecast",
    "q_lmg_importance", "q_topsis", "q_huber_regression", "q_risk_pooling",
    "q_shorrocks_mobility", "txt_gries_dp", "q_kernel_smoother", "q_eb_poisson",
    "q_weighted_kappa", "q_expectile", "q_crow_amsaa", "q_whipple_index",
    "q_theil_u_decomposition", "q_discovery_curve", "txt_good_turing", "q_zt_poisson",
    "q_clumpiness", "q_ratio_to_ma", "txt_yule_k", "q_ulcer_index",
    "txt_char_entropy", "q_gibrat_law", "q_engel_curve", "q_range_partition_planner",
    "q_selectivity_audit", "q_western_electric", "q_segmented_regression", "txt_fishers_alpha",
    "q_superstar_share", "q_ndr", "q_oos_detector", "q_palma",
    "q_ph_assumption", "q_acceptance_sampling", "q_robust_shape", "q_double_jeopardy",
    "q_mincer_zarnowitz", "q_pesaran_timmermann", "q_christoffersen", "q_fisher_ideal",
]
_rest = [k for k in QUERIES if k not in set(_WINDOW_FIRST)]
_ordered = {k: QUERIES[k] for k in [*(_n for _n in _WINDOW_FIRST if _n in QUERIES), *_rest]}
QUERIES.clear()
QUERIES.update(_ordered)

# Entries without an oracle only get a weak rows-only row in the window.
# Move the no-oracle entries (approximate ANN, sketch-bound, binary-output
# multimodal — each covered by recall/error-bound pytest instead) to the
# END so every window slot is hash-checkable.
for _name in [k for k in list(QUERIES) if k not in ORACLES]:
    QUERIES[_name] = QUERIES.pop(_name)

__all__ = ["QUERIES", "ORACLES"]
