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
# ROUND-9 WINDOW (this session): CORRECTNESS_r08 landed 50/50 — no fixes
# to front-load. Executed exactly per the r8 pinned plan: q1 first, then
# the eight NEVER-driver-checked classifier/rule-induction queries
# (logreg_lang_classifier, logreg_score_histogram, logreg_crossval_kfold,
# logreg_auc_exact, stump_quality_rule, tree2_quality_rules,
# woe_feature_audit, logreg_per_source — re-certified bit-level this
# round at sf0.001/0.01/0.1 AND under local[5] AFTER the r9 shared-text
# literal change: 1e3/1e6 exponent-form doubles replacing the bare
# decimal literals, the r8 advisor item). Then the latest-green ranking
# fills the window: all 34 remaining r4-green rows (kmv_segment_overlap
# onward, registration order) and the 7 oldest r5-green rows. A green
# round makes cumulative driver certification 240/240 (235 direct + the
# 5 ANN production paths certified via their driver-green twin_agreement
# entries) and leaves every catalog query's latest green row <= 5 rounds
# old (the refresh invariant).
#
# ROUND-10 PLAN (for the next session): assuming CORRECTNESS_r09 lands
# green, recompute with the latest-green ranking (rank every query by its
# most recent green CORRECTNESS round, oldest first, registration order
# as tiebreak — the procedure documented here and in
# scripts/gen_catalog_index.py): q1 first, then the FIVE never-green r9
# additions (adaboost_quality_rounds, adaboost_margin_report,
# adaboost_per_source_rounds, adaboost_per_source_margins — the
# boosted-stump family and its per-source model farm — and
# logreg_isotonic_calibration, the PAV calibration step; each bit-level
# certified locally this round at sf0.001/0.01/0.1 and under local[5]),
# then the r5-green remainder (repeat_buyer_churn_setops onward), then
# the oldest r6-green rows to fill 50. Any r9 FAIL goes to the front
# after its fix.
# Keep every name in _DRIVER_WINDOW_FRONT registered (the assert below
# enforces it) and re-pin tests/data/catalog_order.txt + CATALOG.md
# (scripts/gen_catalog_index.py) after any reorder. The production ANN
# rows-only entries (minhash_near_dups, simhash_fingerprints,
# embedding_near_dups_lsh, knn_lsh, knn_ivf) stay OUT of window slots:
# they would record rows-only again, and their guarantees are exactly
# what the *_twin_agreement entries hash-check.
#
# The driver's CORRECTNESS gate records only the FIRST 50 queries()
# entries per round; windows rotate so every query eventually holds a
# recent green row.
_DRIVER_WINDOW_FRONT = [
    "q1_pricing_summary",
    # -- never driver-checked (r8 classifier/rule-induction family) --
    "logreg_lang_classifier",
    "logreg_score_histogram",
    "logreg_crossval_kfold",
    "logreg_auc_exact",
    "stump_quality_rule",
    "tree2_quality_rules",
    "woe_feature_audit",
    "logreg_per_source",
    # -- all remaining r4-green rows (oldest green), registration order --
    "kmv_segment_overlap",
    "cms_join_size_estimate",
    "cms_heavy_hitters",
    "bloom_decontamination",
    "incremental_dedup_report",
    "knn_label_propagation",
    "winnow_fingerprints",
    "scd2_user_value_history",
    "snapshot_diff_orders",
    "dedup_graph_triangles",
    "tfidf_cosine_pairs",
    "time_weighted_user_value",
    "rolling_7d_active_users",
    "customer_er_candidates",
    "point_in_time_features",
    "rolling_zscore_anomalies",
    "peak_concurrent_sessions",
    "psi_value_drift",
    "rfm_customer_segments",
    "corpus_zipf_heaps",
    "user_activity_streaks",
    "lang_source_chisq",
    "ab_test_zscore",
    "dedup_strategy_matrix",
    "jaccard_pairs_prefix_filtered",
    "pq_codes",
    "pq_knn_adc",
    "conversion_survival_curve",
    "cusum_changepoints",
    "ewma_user_values",
    "exact_median_twopass",
    "benford_price_audit",
    "forward_filled_values",
    "linear_interpolated_values",
    # -- oldest r5-green rows, registration order --
    "q15_top_supplier",
    "unpivot_lineitem_measures",
    "cube_orders_status_priority",
    "asof_forward_error_recovery",
    "attribution_last_touch",
    "event_deltas_range_frame",
    "doc_length_deciles",
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
