"""Exact median of a single giant group in two bounded passes.

Per-group exact percentiles (``F.expr("percentile(...)")``) sort each
group — fine when groups are small, impossible when the "group" is the
whole 100 TB column. ``approx_percentile`` (t-digest) is the usual
answer, but reconciliation/audit work sometimes needs the EXACT value.

The classic refinement: pass 1 histograms the column into ``n_buckets``
fixed-width bins (one map-side-combined groupBy onto ≤ n_buckets cells);
the driver cumulative-sums the tiny count vector to locate which bin(s)
hold the two middle order statistics. Pass 2 re-scans with a pushed-down
range filter and ranks ONLY the candidate bins' rows — a subset whose
size is bounded by the fattest bin, shrinking geometrically if applied
recursively (one refinement suffices for any remotely spread
distribution; a pathological single-value column short-circuits because
the bin bounds pin the value exactly).

Driver-side state: n_buckets counts + two scalars — O(n_buckets),
independent of data size. Interpolation matches SQL ``quantile_cont``:
even n averages the two middle values, odd n takes the middle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .hierarchical import hierarchical_row_number


def exact_median_two_pass(
    df: DataFrame,
    value_col: str,
    n_buckets: int = 1024,
) -> tuple[int, float]:
    """Returns (n_rows, exact median) of the non-null values.

    Raises ValueError on an empty column.
    """
    data = df.filter(F.col(value_col).isNotNull())
    lo, hi, n = data.agg(
        F.min(value_col).cast("double"),
        F.max(value_col).cast("double"),
        F.count(F.lit(1)),
    ).first()
    if not n:
        raise ValueError("exact_median_two_pass: no non-null values")
    if lo == hi:
        return n, float(lo)
    # the two order statistics whose mean is quantile_cont(0.5)
    k1, k2 = (n + 1) // 2, (n + 2) // 2
    width = (hi - lo) / n_buckets
    bucket = F.least(
        F.floor((F.col(value_col).cast("double") - F.lit(lo)) / F.lit(width)),
        F.lit(n_buckets - 1),
    ).cast("int")
    counts = dict(
        data.select(bucket.alias("_b")).groupBy("_b").count().collect()
    )
    acc, b1 = 0, None
    for b in range(n_buckets):
        c = counts.get(b, 0)
        if b1 is None and acc + c >= k1:
            b1 = b
        if acc + c >= k2:
            b2 = b
            break
        acc += c
    below = sum(counts.get(b, 0) for b in range(b1))
    # pass 2 reuses the SAME bucket expression as pass 1 — a value-range
    # filter could disagree with floor((v-lo)/width) by one ulp at a bin
    # edge and silently shift every rank
    cand = data.filter((bucket >= b1) & (bucket <= b2))
    # hierarchical rank, not row_number() OVER (ORDER BY _v): the candidate
    # set is ~n/n_buckets rows — data-proportional, so a partition-less
    # window would still funnel it through one task at scale. The
    # quantile-expression sharding routes equal _v to ONE shard, so only
    # the within-shard ordering of tied rows (and thus the rank->row
    # mapping) is nondeterministic; the VALUE at any rank is the order
    # statistic of _v either way, which is all the lookup below reads.
    ranked = hierarchical_row_number(
        cand.select(F.col(value_col).cast("double").alias("_v")),
        [F.col("_v")],
        "_r",
    )
    vals = {
        r["_r"]: r["_v"]
        for r in ranked.filter(
            F.col("_r").isin([k1 - below, k2 - below])
        ).collect()
    }
    return n, (vals[k1 - below] + vals[k2 - below]) / 2.0
