"""Sorted-neighborhood entity resolution (Hernández & Stolfo 1995) and
the distributed global-rank primitive it rides on.

Blocking ER (customer_er_candidates) only pairs records that agree on a
block key — a typo IN the block key loses the match. The sorted-
neighborhood method is the complementary pass: sort the whole corpus by
a fuzzy sort key, then compare each record only to its ``w`` successors
in the sort order. Candidates are O(n·w) regardless of block-size skew.

The scale problem is the global sort ORDER: ``row_number() OVER
(ORDER BY key)`` collapses the whole table into one window partition.
``global_rank`` instead range-partitions by the key (a distributed
sort), ranks WITHIN each partition, and shifts each partition by the
cumulative count of the partitions before it — the per-partition counts
(one tiny aggregate, O(#partitions) rows) are the only driver-side data.
The neighbor join is then an equi-join on rank: each record explodes
into its ``w`` successor slots, so no range/theta join appears in the
plan and work is exactly n·w rows.

The rank is total and deterministic: ``order_cols`` is extended by the
caller's unique tiebreaker, and range partitioning on the full ordering
key means equal prefixes landing near a partition boundary still rank
consistently.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def global_rank(
    df: DataFrame,
    order_cols: list[str],
    rank_col: str = "_rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """df + a 1-based dense global row number under ``order_cols``,
    computed without a single-partition window. ``order_cols`` must form
    a total order (include a unique tiebreaker)."""
    # Delegates to the shared range-shard + broadcast-offset primitive
    # (operators/hierarchical.py). Numeric primaries shard via a
    # DETERMINISTIC quantile-bound expression (the offsets job and the
    # final join cannot disagree by construction); non-numeric orders —
    # the common case here, string blocking keys — take the
    # repartitionByRange + localCheckpoint fallback, which pins the
    # sampled boundaries across jobs (RangePartitioner's rddId-seeded
    # sample once produced duplicate ranks without it; caught by the
    # sf0.1 differential sweep).
    from .hierarchical import hierarchical_row_number

    return hierarchical_row_number(
        df, [F.col(c) for c in order_cols], rank_col, n_shards=num_partitions
    )


def sorted_neighborhood_pairs(
    df: DataFrame,
    sort_cols: list[str],
    window: int = 2,
) -> DataFrame:
    """Candidate pairs (left record, right record) whose positions in the
    ``sort_cols`` order are within ``window`` of each other; right side's
    columns are suffixed ``_b``. Scoring/filtering is the caller's —
    this operator only generates the O(n·window) candidate set."""
    ranked = global_rank(df, sort_cols)
    left = ranked.withColumn(
        "_slot",
        F.explode(
            F.sequence(F.col("_rank") + 1, F.col("_rank") + window)
        ),
    )
    right = ranked.select(
        F.col("_rank").alias("_slot"),
        *[F.col(c).alias(f"{c}_b") for c in df.columns],
    )
    return left.join(right, "_slot").drop("_slot", "_rank")
