"""Exact interpolated quantiles at scale (hierarchical-rank two-pass).

Spark's exact ``percentile(col, p)`` aggregate buffers EVERY value of its
group inside one aggregation state (an OpenHashMap in a single task) —
fine when groups are small, a single-executor memory bomb when one group
holds a data-proportional share of a 100 TB corpus (the round-6 verdict's
one remaining scale anti-pattern, flagged at five call sites).

``exact_quantiles`` computes the SAME interpolated order statistic with
bounded per-task state:

1. exact global (or per-group) 1-based rank of the value column via
   ``operators/hierarchical.hierarchical_grouped_row_number`` — range
   sharded, parallel within shards, only #shards×#groups count rows ever
   reach the driver;
2. the target positions ``pos = p·(n−1)`` (Spark's Percentile.scala
   definition) are pure expressions over the per-group total that rides
   along with the rank, so a filter keeps exactly the ≤ 2·|quantiles|
   bracketing rows per group;
3. one tiny aggregate picks the bracketing values and interpolates with
   Spark's own formula ``(hi − pos)·v_lo + (pos − lo)·v_hi`` including
   its equal-key short-circuit, so results are BIT-IDENTICAL to
   ``F.expr("percentile(v, p)")`` for double inputs at any sharding.

The value stream is scanned three times (shard-bound sample, per-shard
counts, final rank+filter) — all map-side column scans — instead of
sorted through one task; at 100 TB that trade is the whole point. At
sf0.1 the two extra eager jobs cost ~1-2 s of fixed scheduler latency
per call (measured in BENCH_NOTES r7). A lazy-offsets variant (prefix
sum over the counts frame inside the final action) would fuse one pass
away, but for the ungrouped case it needs an unpartitioned window over
the n_shards-row counts frame — bounded by construction, yet it would
re-introduce the exact window shape the global-window audit exists to
catch, one exemption per caller. The driver-side prefix sum keeps every
caller's plan window-clean; the collect is shards×groups rows
(allowlisted, bounded).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .hierarchical import hierarchical_grouped_row_number


def exact_quantiles(
    df: DataFrame,
    value: Column | str,
    quantiles: dict[str, float],
    group_cols: list[str] | None = None,
    count_col: str | None = None,
    n_shards: int | None = None,
) -> DataFrame:
    """Exact interpolated quantiles of ``value`` per group, bit-identical
    to ``percentile(value, p)`` (Spark's exact aggregate) without ever
    buffering a whole group in one aggregation state.

    ``quantiles`` maps output column name → p in [0, 1]. Returns one row
    per group: ``group_cols`` + a double column per requested quantile
    (+ the non-null value count as ``count_col`` when requested — equal
    to COUNT(*) whenever the value expression is never null, which is
    what the catalog callers feed). NULL values are skipped, matching
    the aggregate; a group whose values are ALL null (and, ungrouped,
    empty input) yields a row with NULL quantiles and count 0 — the
    same shape ``percentile()`` over GROUP BY and DuckDB
    ``quantile_cont`` produce, reattached here by a null-safe left
    join from the distinct group keys (r7 advisor fix; previously such
    groups were silently dropped).

    The input must be value-deterministic across re-evaluation (the
    ``_expr_shard`` contract — persist() anything rand()-derived first).

    NOTE eager construction: building this DataFrame runs cluster jobs
    immediately (hierarchical_grouped_row_number's shard-bound sample +
    per-shard counts collect) — unlike the lazy-plan catalog convention.
    Plan-only callers (audits, speculative construction) pay those two
    bounded jobs, and the collected shard offsets are frozen at
    construction time (fine under the value-determinism contract above).
    """
    group_cols = list(group_cols or [])
    v = F.col(value) if isinstance(value, str) else value
    vals = df.select(
        *group_cols, v.cast("double").alias("_v")
    ).filter(F.col("_v").isNotNull())
    ranked = hierarchical_grouped_row_number(
        vals,
        group_cols,
        [F.col("_v")],
        "_rk",
        total_col="_gn",
        n_shards=n_shards,
    )

    def _pos(p: float) -> Column:
        # Percentile.scala: position = (count - 1) * percentage, doubles
        return (F.col("_gn") - F.lit(1)).cast("double") * F.lit(float(p))

    keep = F.lit(False)
    aggs = []
    for name, p in quantiles.items():
        lo = F.floor(_pos(p)) + F.lit(1)  # 1-based bracketing ranks
        hi = F.ceil(_pos(p)) + F.lit(1)
        keep = keep | (F.col("_rk") == lo) | (F.col("_rk") == hi)
        aggs.append(
            F.max(F.when(F.col("_rk") == lo, F.col("_v"))).alias(f"_lo_{name}")
        )
        aggs.append(
            F.max(F.when(F.col("_rk") == hi, F.col("_v"))).alias(f"_hi_{name}")
        )
    # _gn is constant within a group; grouping on it keeps it in hand for
    # the interpolation select without a second aggregate.
    picked = ranked.filter(keep).groupBy(*group_cols, "_gn").agg(*aggs)

    out_cols: list[Column] = [F.col(c) for c in group_cols]
    for name, p in quantiles.items():
        pos = _pos(p)
        lo_d = F.floor(pos).cast("double")
        hi_d = F.ceil(pos).cast("double")
        v_lo, v_hi = F.col(f"_lo_{name}"), F.col(f"_hi_{name}")
        # Percentile.scala short-circuits BOTH higher==lower and
        # higherKey==lowerKey to lowerKey before interpolating — the
        # first case collapses into the second here (lo==hi ⇒ same row).
        interp = (hi_d - pos) * v_lo + (pos - lo_d) * v_hi
        out_cols.append(
            F.when(v_lo == v_hi, v_lo).otherwise(interp).alias(name)
        )
    if count_col is not None:
        out_cols.append(F.col("_gn").cast("long").alias(count_col))
    res = picked.select(*out_cols)

    # Shape contract: one output row per distinct group key (ungrouped:
    # exactly one row), even when every value in the group is NULL —
    # `vals` dropped those rows, so reattach the missing keys with a
    # null-safe LEFT join (broadcast: the quantile side is one row per
    # non-all-null group, small by construction). count_col coalesces to
    # 0 for reattached groups (COUNT(value) over all-NULLs is 0).
    res_cols = [c for c in res.columns if c not in group_cols]

    def _out(side, name: str) -> Column:
        col = side[name]
        if name == count_col:
            return F.coalesce(col, F.lit(0).cast("long")).alias(name)
        return col

    if group_cols:
        keys = df.select(*group_cols).distinct()
        cond = None
        for c in group_cols:
            eq = keys[c].eqNullSafe(res[c])
            cond = eq if cond is None else (cond & eq)
        joined = keys.join(F.broadcast(res), cond, "left")
        final = [keys[c] for c in group_cols] + [_out(res, c) for c in res_cols]
    else:
        one = df.sparkSession.range(1).select(F.lit(1).alias("_one"))
        res1 = res.withColumn("_one", F.lit(1))
        joined = one.join(F.broadcast(res1), "_one", "left")
        final = [_out(res1, c) for c in res_cols]
    return joined.select(*final)
