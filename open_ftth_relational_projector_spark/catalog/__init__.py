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


# ===========================================================================
# Registration order for the driver window
# ===========================================================================
# ROUND-5 WINDOW PLAN (for the next session): assuming CORRECTNESS_r04
# lands green, exactly 39 catalog queries will still lack a driver row.
# Fill the r5 window with ALL of them (39 + q1 flagship = 40 slots),
# then spend the remaining 10 slots on regression spot-checks of the
# oldest green rows (r1-only families first: proj_*_sim, walk-hop,
# windows, asof, text basics). The 39, in registration order:
#   unpivot_lineitem_measures, cube_orders_status_priority,
#   asof_forward_error_recovery, attribution_last_touch,
#   event_deltas_range_frame, doc_length_deciles,
#   repeat_buyer_churn_setops, knn_label_noise, dsir_doc_weights,
#   curation_decisions, embedding_outlier_stats, hybrid_rrf_retrieval,
#   temperature_mixture_sample, length_bucketed_batches,
#   audio_wav_features, audio_wav_resample, expectations_audit,
#   price_histogram, zorder_locality_audit, event_transition_matrix,
#   json_dlq_report, negative_samples_per_customer,
#   pseudonymized_join_integrity, k_anonymity_audit,
#   dow_seasonality_index, attribution_linear_multitouch,
#   acctbal_distribution_ranks, item_item_similarity,
#   part_cooccurrence_top_pairs, calendar_monthly_rollup, kwic_snippets,
#   user_value_trend, top_user_journey_prefixes, fd_violation_profile,
#   fk_fanout_audit, table_content_fingerprints, grouping_sets_revenue,
#   null_safe_segment_join, revenue_share_of_region
# If any r4 row FAILED, put it at the front of the r5 window after the
# fix. Keep every name in _DRIVER_WINDOW_FRONT registered (the assert
# below enforces it) and re-pin tests/data/catalog_order.txt after any
# reorder.
#
# The driver's CORRECTNESS gate records only the FIRST 50 queries()
# entries per round; windows rotate so every query eventually holds a
# recent green row.
_DRIVER_WINDOW_FRONT = [
    # Round 4: the catalog holds 187 queries but the driver checks only the
    # first 50 per round; r1∪r2∪r3 green rows cover 99, leaving 88 that have
    # never held a driver row (all rest on local check_oracle.py sweeps at
    # sf0.01 + sf0.1). Per the round-3 verdict, this round's window spends
    # every slot except the q1 flagship on never-checked queries, leading
    # with the families carrying the most logic (iterative graph, sketches,
    # time-series, TPC-H joins, slowly-changing dimensions, dedup/ANN, text
    # stats). Round 5 takes the remaining 39 plus regression spot-checks.
    "q1_pricing_summary",
    # -- iterative graph --
    "kcore_purchase_graph",
    "weighted_purchase_paths",
    "pagerank_purchase_graph",
    "dedup_graph_triangles",
    "knn_label_propagation",
    # -- sketches --
    "kmv_segment_overlap",
    "cms_join_size_estimate",
    "cms_heavy_hitters",
    "bloom_decontamination",
    "approx_distinct_users",
    # -- time series --
    "ewma_user_values",
    "cusum_changepoints",
    "linear_interpolated_values",
    "forward_filled_values",
    "conversion_survival_curve",
    "rolling_zscore_anomalies",
    "rolling_7d_active_users",
    "time_weighted_user_value",
    "user_activity_streaks",
    # -- TPC-H joins never driver-checked --
    "q2_min_cost_supplier",
    "q8_market_share",
    "q11_important_part_values",
    "q20_part_promo_suppliers",
    # -- temporal / dimensional modeling --
    "scd2_user_value_history",
    "snapshot_diff_orders",
    "point_in_time_features",
    "merged_order_activity_periods",
    "peak_concurrent_sessions",
    # -- de-globalized this round: first driver rows post-fix --
    "rfm_customer_segments",
    "jaccard_pairs_prefix_filtered",
    # -- dedup / ER / ANN --
    "containment_near_dups",
    "winnow_fingerprints",
    "semantic_dedup_verdicts",
    "customer_er_candidates",
    "pq_codes",
    "pq_knn_adc",
    "incremental_dedup_report",
    "dedup_strategy_matrix",
    # -- clustering --
    "kmeans_cluster_stats",
    "kcenter_coreset",
    # -- text / corpus analysis --
    "tfidf_cosine_pairs",
    "bigram_lm_doc_scores",
    "corpus_zipf_heaps",
    "lang_source_chisq",
    # -- statistical audits --
    "benford_price_audit",
    "psi_value_drift",
    "exact_median_twopass",
    "winsorized_value_stats",
    "ab_test_zscore",
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
