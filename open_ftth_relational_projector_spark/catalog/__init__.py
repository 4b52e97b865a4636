"""Query catalog: the driver-contract surface (__spark_entry__.py).

Each entry pairs a Spark implementation with an ANSI-SQL DuckDB oracle that
must hash-match it (column names and value semantics aligned; doubles
rounded to 4 dp on BOTH sides; counts cast to BIGINT on the DuckDB side
because its integer SUM widens to HUGEINT).

The catalog demonstrates every operator family from SURVEY §2 over the
driver tables, plus the LLM-pipeline surface (functions/*), plus two
queries that run the REAL projection engine over domain events synthesized
deterministically from the events table (proj_work_task_sim,
proj_installation_sim) — those oracles re-implement the fold semantics in
pure SQL, so the engine's epoch/guard/null-write behavior is checked against
an independent implementation on driver data.
"""


from __future__ import annotations

from ._registry import ORACLE_SQL, SPARK_QUERIES, QueryFn, _q, _r4  # noqa: F401

# Family modules register into SPARK_QUERIES/ORACLE_SQL on import; this
# order IS the registration order (the pre-window catalog order), so it
# must not be rearranged without re-pinning tests/data/catalog_order.txt.
from . import tpch  # noqa: E402,F401
from . import events_batch  # noqa: E402,F401
from . import projections  # noqa: E402,F401
from . import llm  # noqa: E402,F401
from . import quality  # noqa: E402,F401
from . import clustering  # noqa: E402,F401
from . import curation  # noqa: E402,F401
from . import sketches  # noqa: E402,F401
from . import audio  # noqa: E402,F401
from . import warehouse  # noqa: E402,F401
from . import analytics  # noqa: E402,F401
from . import timeseries  # noqa: E402,F401
from . import streaming_sims  # noqa: E402,F401


# ===========================================================================
# Registration order for the driver window
# ===========================================================================
# ROUND-6 WINDOW PLAN (for the next session): assuming CORRECTNESS_r05
# lands green, only the thirty r5-added queries will lack a driver row
# (187 of 217 will hold one): stream_dedup_sim + stream_lsh_sim +
# stream_hll_sim + stream_hdr_sim + stream_topk_sim + stream_join_sim +
# stream_session_sim + stream_ols_sim (registered last)
# and bpe_learned_merges,
# bpe_token_counts, quality_score_auc, quality_pr_curve,
# lang_guess_kappa, quality_brier_calibration, hll_distinct_rollup,
# hdr_quantile_rollup, dup_substring_spans, ccnet_perplexity_buckets,
# cluster_safe_split_stats, ivfpq_knn_adc, epoch_shuffle_manifest,
# jl_projection_audit, jl_knn_recall, latent_part_affinity,
# latent_rank2_affinity,
# ols_price_model, ols_residual_by_nation, nb_lang_confusion,
# bootstrap_revenue_ci, ab_tests_fdr_nations
# (registered at
# their family modules' tails, i.e. MID-order — identify them by NAME,
# not by position in catalog_order.txt). r6 window: q1 flagship + those
# thirty + 19 regression picks from the queries whose most recent
# driver row is
# OLDEST (r2 first — TPC-H q3..q22, multimodal_*, embedding_*, knn_*,
# cohort/funnel family — then r3's proj_*_sim / windows / text
# basics), so every query's latest green row stays at most ~3 rounds
# old. If any r5 row FAILED, put it at the front of the r6 window
# after the fix. Keep
# every name in _DRIVER_WINDOW_FRONT registered (the assert below
# enforces it) and re-pin tests/data/catalog_order.txt +
# CATALOG.md (scripts/gen_catalog_index.py) after any reorder.
#
# The driver's CORRECTNESS gate records only the FIRST 50 queries()
# entries per round; windows rotate so every query eventually holds a
# recent green row.
_DRIVER_WINDOW_FRONT = [
    # Round 5 (per the round-4 verdict's ask #1): the 39 queries that have
    # never held a driver row, in registration order — closing the last
    # coverage gap — plus q1 flagship and 10 regression spot-checks.
    "q1_pricing_summary",
    # -- the 39 never-driver-checked, registration order --
    "unpivot_lineitem_measures",
    "cube_orders_status_priority",
    "asof_forward_error_recovery",
    "attribution_last_touch",
    "event_deltas_range_frame",
    "doc_length_deciles",
    "repeat_buyer_churn_setops",
    "knn_label_noise",
    "dsir_doc_weights",
    "curation_decisions",
    "embedding_outlier_stats",
    "hybrid_rrf_retrieval",
    "temperature_mixture_sample",
    "length_bucketed_batches",
    "audio_wav_features",
    "audio_wav_resample",
    "expectations_audit",
    "price_histogram",
    "zorder_locality_audit",
    "event_transition_matrix",
    "json_dlq_report",
    "negative_samples_per_customer",  # first row lands on the r5 rewrite
    "pseudonymized_join_integrity",
    "k_anonymity_audit",
    "dow_seasonality_index",
    "attribution_linear_multitouch",
    "acctbal_distribution_ranks",
    "item_item_similarity",
    "part_cooccurrence_top_pairs",
    "calendar_monthly_rollup",
    "kwic_snippets",
    "user_value_trend",
    "top_user_journey_prefixes",
    "fd_violation_profile",
    "fk_fanout_audit",
    "table_content_fingerprints",
    "grouping_sets_revenue",
    "null_safe_segment_join",
    "revenue_share_of_region",
    # -- 10 regression spot-checks: queries rewritten this round or
    #    sitting on primitives changed this round, then the oldest
    #    (r2-only) green rows --
    "q15_top_supplier",  # r5 rewrite: scalar-max broadcast (was OVER ())
    "token_budget_chunks",  # hierarchical_cumsum consumer; last row r2
    "dedup_clusters",  # connected_components consumer; last row r2
    "multimodal_features",  # r4 driver-bench regression watch; last row r2
    "ngram_jaccard_pairs",
    "cross_doc_shingle_dup",
    "pii_scan",
    "weekly_cohort_retention",
    "knn_bruteforce",
    "stratified_doc_sample",
]


def _apply_driver_window_order() -> None:
    assert all(n in SPARK_QUERIES for n in _DRIVER_WINDOW_FRONT), [
        n for n in _DRIVER_WINDOW_FRONT if n not in SPARK_QUERIES
    ]
    rest = [n for n in SPARK_QUERIES if n not in _DRIVER_WINDOW_FRONT]
    order = _DRIVER_WINDOW_FRONT + rest
    for d in (SPARK_QUERIES, ORACLE_SQL):
        reordered = {n: d[n] for n in order if n in d}
        d.clear()
        d.update(reordered)


_apply_driver_window_order()
