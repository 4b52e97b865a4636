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
# ROUND-7 WINDOW PLAN (for the next session): assuming CORRECTNESS_r06
# lands green, the cumulative driver-green union is 217/227 and the TEN
# r6 additions lack a driver row (all 3-scale oracle-green locally):
# domain_mixture_weights, corpus_snapshot_diff, winsorized_price_stats,
# correlation_matrix_lineitem, equidepth_price_bins, ols_crossval_kfold,
# sliding_token_chunks, per_source_quality_cap, stream_snapshot_sim,
# ols_conformal_intervals. r7 window: q1 flagship + those ten first +
# the queries whose most recent green row is OLDEST. After r6 the oldest
# are the 15 remaining r2-only rows (anti_join_customers_without_orders,
# benchmark_decontamination, clicks_within_signup_day,
# dim_join_customer_geo, embedding_near_dups (r6 re-covers it),
# embedding_norms_by_label, label_centroid_stats, lineitem_profile,
# repetition_stats, salted_event_counts,
# semi_join_customers_with_urgent_orders, signup_to_purchase_funnel,
# tfidf_top_terms, token_entropy, train_test_split_stats,
# value_quantiles_by_type) then the r3 rows (proj_*_sim, windows, text
# basics — see CORRECTNESS_r03.json) in registration order. If any r6
# row FAILED, put it at the front of the r7 window after the fix. Keep
# every name in _DRIVER_WINDOW_FRONT registered (the assert below
# enforces it) and re-pin tests/data/catalog_order.txt +
# CATALOG.md (scripts/gen_catalog_index.py) after any reorder.
#
# The driver's CORRECTNESS gate records only the FIRST 50 queries()
# entries per round; windows rotate so every query eventually holds a
# recent green row.
_DRIVER_WINDOW_FRONT = [
    # Round 6 (per the round-5 verdict's ask #1): q1 flagship + the 30
    # r5-added queries that have never held a driver row (CORRECTNESS_r05
    # landed 50/50 green, so these are the only members of the catalog
    # without one; closing them makes the cumulative union 217/217) + 19
    # regression picks from the queries whose latest green row is OLDEST
    # (all r2: TPC-H q3..q22, multimodal, embedding/order-seq family).
    "q1_pricing_summary",
    # -- the 30 never-driver-checked r5 additions --
    "ols_price_model",
    "ols_residual_by_nation",  # fixed this round: ADVICE decimal moments
    "ab_tests_fdr_nations",  # fixed this round: exact-decimal z inputs
    "bootstrap_revenue_ci",
    "nb_lang_confusion",
    "bpe_learned_merges",
    "bpe_token_counts",
    "quality_score_auc",
    "quality_pr_curve",
    "quality_brier_calibration",
    "lang_guess_kappa",
    "hll_distinct_rollup",
    "hdr_quantile_rollup",
    "dup_substring_spans",
    "ccnet_perplexity_buckets",
    "cluster_safe_split_stats",
    "ivfpq_knn_adc",
    "epoch_shuffle_manifest",
    "jl_projection_audit",  # fixed this round: ordered-list oracle
    "jl_knn_recall",
    "latent_part_affinity",
    "latent_rank2_affinity",
    "stream_dedup_sim",
    "stream_lsh_sim",
    "stream_hll_sim",
    "stream_hdr_sim",
    "stream_topk_sim",
    "stream_join_sim",
    "stream_session_sim",
    "stream_ols_sim",
    # -- 19 regression picks: the queries whose most recent driver-green
    #    row is oldest (all from CORRECTNESS_r02), registration order --
    "q3_order_revenue",
    "q4_order_priority",
    "q5_region_nation_revenue",
    "q6_forecast_revenue",
    "q7_nation_volume_shipping",
    "q9_product_type_profit",
    "q10_returned_items",
    "q12_shipmode_priority",
    "q13_customer_order_distribution",
    "q14_promo_effect",
    "q16_supplier_part_counts",
    "q17_small_quantity_revenue",
    "q18_large_volume_customers",
    "q19_discounted_revenue",
    "q22_sales_opportunity",
    "multimodal_frames",
    "multimodal_resize",
    "embedding_near_dups",
    "order_item_seq",
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
