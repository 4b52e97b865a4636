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
# ROUND-7 WINDOW (this session): CORRECTNESS_r06 landed 50/50 green, so
# the cumulative driver-green union entering r7 is 217/227. This window
# certifies, in order: the q1 flagship; the TEN r6 additions (the only
# pre-r7 queries without any driver row — all oracle-green in the
# builder's and the judge's independent sf0.01 sweeps); the FIVE new
# twin-agreement entries (round-6 verdict #6: driver-visible verdicts
# for the rows-only approximate ANN paths — the production
# minhash_near_dups / simhash_fingerprints / embedding_near_dups_lsh /
# knn_lsh / knn_ivf entries themselves are deliberately NOT given window
# slots: they would record rows-only again, and their guarantees are
# exactly what the agreement entries hash-check); then the 15 r2-only
# regression picks (oldest driver-green rows), then the oldest r3 rows
# in registration order, filling the 50-slot window.
#
# ROUND-8 PLAN (for the next session): assuming CORRECTNESS_r07 lands
# green, the r8 window is q1 + the remaining r3-green rows not covered
# here (sliding/session window family onward per CORRECTNESS_r03) —
# recompute with the latest-green ranking (scripts/gen_catalog_index.py
# documents the procedure; rank every query by its most recent green
# CORRECTNESS round, oldest first, registration order as tiebreak).
# If any r7 row FAILED, put it at the front of the r8 window after the
# fix. Keep every name in _DRIVER_WINDOW_FRONT registered (the assert
# below enforces it) and re-pin tests/data/catalog_order.txt +
# CATALOG.md (scripts/gen_catalog_index.py) after any reorder.
#
# The driver's CORRECTNESS gate records only the FIRST 50 queries()
# entries per round; windows rotate so every query eventually holds a
# recent green row.
_DRIVER_WINDOW_FRONT = [
    "q1_pricing_summary",
    # -- the 10 never-driver-checked r6 additions --
    "domain_mixture_weights",
    "corpus_snapshot_diff",
    "sliding_token_chunks",
    "per_source_quality_cap",
    "winsorized_price_stats",
    "correlation_matrix_lineitem",
    "equidepth_price_bins",
    "ols_crossval_kfold",
    "ols_conformal_intervals",
    "stream_snapshot_sim",
    # -- the 5 new r7 twin-agreement entries (verdict #6) --
    "minhash_twin_agreement",
    "simhash_twin_agreement",
    "emb_lsh_twin_agreement",
    "knn_lsh_twin_agreement",
    "knn_ivf_twin_agreement",
    # -- 15 regression picks: the r2-only rows (oldest green) --
    "dim_join_customer_geo",
    "anti_join_customers_without_orders",
    "semi_join_customers_with_urgent_orders",
    "train_test_split_stats",
    "embedding_norms_by_label",
    "tfidf_top_terms",
    "value_quantiles_by_type",
    "signup_to_purchase_funnel",
    "clicks_within_signup_day",
    "salted_event_counts",
    "lineitem_profile",
    "repetition_stats",
    "token_entropy",
    "benchmark_decontamination",
    "label_centroid_stats",
    # -- 19 oldest r3-green rows, registration order --
    "q21_waiting_suppliers",
    "skyline_parts",
    "dedup_first_occurrence",
    "exists_nested_high_value_first_line",
    "first_last_part_per_order",
    "top3_orders_per_customer",
    "rollup_lineitem_status",
    "pivot_event_counts",
    "lww_latest_event_per_user",
    "asof_purchase_prior_signup",
    "json_props_stats",
    "running_value_per_user",
    "sessionize_30min",
    "tumbling_event_windows",
    "sliding_event_windows",
    "session_event_windows",
    "proj_work_task_sim",
    "proj_installation_sim",
    "stream_incremental_sim",
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
