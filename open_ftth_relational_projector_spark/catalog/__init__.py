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
# ROUND-8 WINDOW (this session): CORRECTNESS_r07 landed 49/50 — the one
# FAIL was correlation_matrix_lineitem (IEEE signed-zero: DuckDB ROUND
# preserves -0.0, Spark's BigDecimal ROUND returns +0.0 on one sf0.01
# covariance cell). Fixed this round by normalizing the shared formula
# text through "+ 0" on BOTH engines; per the pinned plan the fixed query
# goes to the FRONT of the window. Also re-certified up front: the three
# twin-agreement entries whose oracle text changed this round
# (length-prefixed set fingerprints; emb_lsh's exact baseline bounded to
# vec_id < 4096). Then the latest-green ranking fills the window: all 30
# remaining r3-green rows, the 14 oldest r4-green rows in registration
# order, and winsorized_value_stats (r4-green, pulled one slot forward
# because its plan changed with the exact_quantiles all-null-group
# left-join rewrite). Cumulative driver-green union entering r8: 226/232
# direct + 5 ANN paths certified via their agreement twins; a green
# correlation row makes it 232/232.
#
# ROUND-9 PLAN (for the next session): assuming CORRECTNESS_r08 lands
# green, recompute with the latest-green ranking (rank every query by its
# most recent green CORRECTNESS round, oldest first, registration order
# as tiebreak — the procedure documented here and in
# scripts/gen_catalog_index.py). NEVER-GREEN queries rank FIRST: the
# eight r8 additions (logreg_lang_classifier, logreg_score_histogram,
# logreg_crossval_kfold, logreg_auc_exact, stump_quality_rule,
# tree2_quality_rules, woe_feature_audit, logreg_per_source — each
# locally bit-level green
# at all three scales AND under local[5], no driver row yet) take the
# slots right after q1, then the r4-green remainder (kmv_segment_overlap
# onward) + the oldest r5 rows fill the 50 slots.
# (pagerank_purchase_graph sits at r8 window slot 47, so its r8 row
# already certifies the new integer-state contract — no special r9
# treatment needed unless that row came back red.)
# If any r8 row FAILED, put it at the front of the r9 window after the
# fix. Keep every name in _DRIVER_WINDOW_FRONT registered (the assert
# below enforces it) and re-pin tests/data/catalog_order.txt +
# CATALOG.md (scripts/gen_catalog_index.py) after any reorder. The
# production ANN rows-only entries (minhash_near_dups,
# simhash_fingerprints, embedding_near_dups_lsh, knn_lsh, knn_ivf) stay
# OUT of window slots: they would record rows-only again, and their
# guarantees are exactly what the *_twin_agreement entries hash-check.
#
# The driver's CORRECTNESS gate records only the FIRST 50 queries()
# entries per round; windows rotate so every query eventually holds a
# recent green row.
_DRIVER_WINDOW_FRONT = [
    "q1_pricing_summary",
    # -- the r7 FAIL, fixed this round (signed-zero normalization) --
    "correlation_matrix_lineitem",
    # -- oracle text changed this round (canonical fingerprints / bound) --
    "minhash_twin_agreement",
    "simhash_twin_agreement",
    "emb_lsh_twin_agreement",
    # -- all 30 remaining r3-green rows (oldest green), registration order --
    "proj_node_container_sim",
    "proj_rel_interest_sim",
    "proj_service_termination_sim",
    "proj_span_equipment_sim",
    "proj_conduit_slack_sim",
    "walk_hop_subtract_sim",
    "walk_hop_multi_sim",
    "proj_rel_fiber_cable_sim",
    "text_stats",
    "token_counts_bpe",
    "lang_quality_stats",
    "exact_dedup_groups",
    "doc_fingerprint_groups",
    "corpus_filter_report",
    "dedup_keep_list",
    "weighted_doc_sample",
    "corpus_pipeline_stats",
    "minhash_near_dups_md5",
    "simhash_fingerprints_md5",
    "simhash_near_dups",
    "embedding_near_dups_lsh_fullprobe",
    "embedding_quantize_int8",
    "knn_lsh_fullprobe",
    "knn_ivf_fullprobe",
    "sliding_window_chunks",
    "bm25_top_docs",
    "bfs_purchase_distances",
    "kmv_distinct_rollup",
    "sorted_neighborhood_er",
    "mad_outlier_stats",
    # -- 14 oldest r4-green rows, registration order --
    "q2_min_cost_supplier",
    "q8_market_share",
    "q11_important_part_values",
    "q20_part_promo_suppliers",
    "merged_order_activity_periods",
    "approx_distinct_users",
    "containment_near_dups",
    "kmeans_cluster_stats",
    "semantic_dedup_verdicts",
    "kcenter_coreset",
    "kcore_purchase_graph",
    "weighted_purchase_paths",
    "pagerank_purchase_graph",
    "bigram_lm_doc_scores",
    # -- r4-green, plan changed by the exact_quantiles shape rewrite --
    "winsorized_value_stats",
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
