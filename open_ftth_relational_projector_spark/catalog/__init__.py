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
# ROUND-10 WINDOW (this session): CORRECTNESS_r09 landed 50/50 — no fixes
# to front-load. Executed exactly per the r9 pinned plan with the
# latest-green ranking (rank every query by its most recent green
# CORRECTNESS round, oldest first, registration order as tiebreak): q1
# first, then the FIVE never-driver-checked r9 additions
# (logreg_isotonic_calibration and the adaboost_* boosted-stump family —
# re-certified bit-level this round at sf0.001/0.01/0.1 AND under
# local[5] AFTER the r10 shared-text change: the IS NOT NULL pinned-
# feature filter hoisted into the oracle rows CTEs, the r9 advisor item),
# then the full r5-green remainder (repeat_buyer_churn_setops onward, 42
# entries, registration order), then the 2 oldest r6-green rows
# (q3_order_revenue, q5_region_nation_revenue). A green round makes
# cumulative driver certification 245/245 (240 direct + the 5 ANN
# production paths certified via their driver-green twin_agreement
# entries) and keeps every catalog query's latest green row <= 4 rounds
# old (the refresh invariant).
#
# ROUND-11 PLAN (for the next session): assuming CORRECTNESS_r10 lands
# green, recompute with the same latest-green ranking: q1 first, then
# the TWO never-green r10 additions (naive_bayes_quality,
# naive_bayes_bucket_likelihoods — the bucketed-Naive-Bayes counting
# classifier; certified bit-level this round at sf0.001/0.01/0.1 and
# under local[5]), then the oldest remaining rows — the 47 r6-green
# rows (registration order) fill the 50 exactly. Any r10 FAIL goes to
# the front after its fix. Capacity note: the rotation cycle is
# 247/50 ≈ 5 rounds, so at most ~2 brand-new catalog queries per round
# keep the refresh invariant satisfiable — r10 used exactly that
# budget; r11 has room for 0 new entries beyond the two above unless a
# refresh slot is sacrificed.
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
    # -- never driver-checked (r9 isotonic + AdaBoost family) --
    "logreg_isotonic_calibration",
    "adaboost_quality_rounds",
    "adaboost_margin_report",
    "adaboost_per_source_rounds",
    "adaboost_per_source_margins",
    # -- all remaining r5-green rows (oldest green), registration order --
    "repeat_buyer_churn_setops",
    "ngram_jaccard_pairs",
    "dedup_clusters",
    "knn_bruteforce",
    "knn_label_noise",
    "multimodal_features",
    "weekly_cohort_retention",
    "stratified_doc_sample",
    "token_budget_chunks",
    "pii_scan",
    "cross_doc_shingle_dup",
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
    "negative_samples_per_customer",
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
    # -- oldest r6-green rows, registration order --
    "q3_order_revenue",
    "q5_region_nation_revenue",
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
