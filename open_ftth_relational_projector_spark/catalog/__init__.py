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
# ROUND-4 WINDOW PLAN (for the next session): lead with q1, then EVERY
# query registered after the r3 window froze — none has held a driver row
# yet. As of end-r3 that is (a) the ~30 entries from kmeans_cluster_stats
# through part_cooccurrence_top_pairs in source order (clustering/DSIR/
# PageRank/bigram-LM/curation, sketches, audio, SCD2/time-weighted,
# snapshot-diff/histogram/zorder, transitions/WAU, expectations, ER,
# PIT-features/negative-samples, winsorize/k-anon/z-score/baskets,
# DLQ/pseudonymization, hybrid RRF, incremental dedup, winnowing,
# label propagation, triangles, mixture/length-bucket sampling), and
# (b) the late-r3 additions that did NOT take a window slot this round:
# cms_join_size_estimate, unpivot_lineitem_measures, kcenter_coreset,
# asof_forward_error_recovery, attribution_last_touch,
# merged_order_activity_periods, linear_interpolated_values,
# knn_label_noise, fd_violation_profile, benford_price_audit,
# kmv_segment_overlap, exact_median_twopass, ewma_user_values,
# cusum_changepoints, conversion_survival_curve, weighted_purchase_paths,
# item_item_similarity, acctbal_distribution_ranks, corpus_zipf_heaps,
# rfm_customer_segments, psi_value_drift, attribution_linear_multitouch,
# kcore_purchase_graph, peak_concurrent_sessions, dow_seasonality_index
# (the five
# late-r3 additions that DID take slots — bfs/kmv/skyline/mad/
# sorted_neighborhood — will hold r3 rows). The window holds 50: fill
# the remainder with the r2-green families whose last green row is
# oldest. Keep every name in _DRIVER_WINDOW_FRONT registered (the
# assert below enforces it).
#
# The driver's CORRECTNESS gate records only the FIRST 50 queries() entries
# per round. The windows rotate so that across rounds every query holds a
# recent green row. Round 3 leads with q1 (the entry() flagship), then the
# six queries NEW this round (the fiber-cable projection sim and the five
# hard-verification twins for the approximate dedup/ANN paths), then the 29
# queries whose green rows are r1-only (regression cover: proj_*_sim,
# walk-hop, windows, asof, text basics), then the five approximate
# rows-only queries (recorded beside their now-oracled twins), with the
# remaining slots spot-checking the biggest r2-green families.
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
