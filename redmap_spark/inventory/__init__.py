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

# The driver's CORRECTNESS window verifies the FIRST 50 queries() entries
# (rows+schema+value-hash vs DuckDB). Rounds 1–4 drove 88 of the oracle
# entries green; this round-5 rotation packs ALL 50 slots with entries
# that have no driver-green row yet (13 missed by the rounds-1-4
# windows + the round-5 additions). Round 5 grew the oracle surface
# past 13+round-5 = 50, so the tail of this list (51+) overflows out of
# the window harmlessly and queues for the round-6 rotation — the
# rotation test asserts no slot is wasted on an already-verified entry
# while any unverified one waits. Already-verified entries (mr_cogroup,
# the r1 relational/analytic breadth, the trivial set ops) stay covered
# by tests/test_oracle.py every session.
_WINDOW_FIRST = [
    # -- never driver-verified (rounds 1-4 windows missed them) --------
    "q_set_ops", "q11_important_stock", "q15_top_supplier",
    "q_scd2_intervals", "q_change_feed", "q_quantile_bins",
    "q_sliding_window", "q_event_transitions", "q_fuzzy_match",
    "q_attribution", "q_audience_overlap", "q_data_quality",
    "txt_temperature_sample",
    # -- new in round 5 ------------------------------------------------
    "dedup_spans", "txt_quality_model", "txt_rank_fusion", "sim_outliers",
    "txt_tokens_bpe", "q_weighted_sample", "mr_pagerank",
    "dedup_incremental", "mr_join", "q_salted_join",
    "q_mode_per_group", "q_decile_lift", "q_interval_sweep", "q_skyline",
    "mr_total_sort", "mr_connected_components",
    "txt_word_entropy", "txt_normalize", "q_cms_sketch",
    "q_rfm_features", "q_stratified_sample", "q_winsorize",
    "q_streaks", "q_event_paths", "q_time_weighted_avg", "q_ab_test",
    "q_market_basket", "q_funnel_latency", "q_entity_survivorship",
    "q_cohort_ltv",
    # -- new in round 5, fourth session (timeseries + mlstats) ---------
    "q_ewma", "q_lag_features", "q_bollinger_flags", "q_changepoint",
    "q_regression", "q_corr_matrix", "q_cumulative_distinct",
    # slot 51+: overflow queue for the round-6 window
    "q_benford", "mr_triangles", "dedup_simhash_portable",
    "dedup_minhash_portable", "q_purchase_intervals", "txt_zipf",
    "txt_source_mix", "q_calendar_heatmap",
    "q_growth_accounting", "q_forecast_linear", "q_seasonality",
    "mr_bfs", "q_gini", "q_autocorrelation",
    "sim_mips_topk", "q_mad_outliers", "q_fd_audit", "txt_blocklist",
    "txt_collocations", "mr_kcore", "q_survival_km", "q_rolling_actives",
    "q_hhi", "txt_js_divergence", "q_kmv_distinct", "txt_corpus_report",
    "q_dau_mau", "q_price_index", "q_runs_test",
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
