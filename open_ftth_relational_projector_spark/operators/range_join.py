"""Interval containment join, bucketized (the range-join operator Spark
lacks natively).

``facts.ts ∈ [interval.start, interval.end)`` expressed directly is a
theta join — Spark plans it as BroadcastNestedLoopJoin (quadratic work,
broadcast-sized build side) which is unusable at scale. The standing
rewrite: quantize time into fixed buckets, explode each interval into the
buckets it covers, equi-join facts on (extra keys…, bucket), then filter
exact containment. Shuffle volume is linear in facts + Σ(interval
length / bucket); the bucket width trades explode fan-out against
candidate-filter selectivity — size it near the typical interval length.
(Same technique Databricks' range-join optimization applies internally;
here it's an explicit operator any plan can use.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def interval_join(
    facts: DataFrame,
    intervals: DataFrame,
    fact_ts: str = "ts",
    start: str = "start",
    end: str = "end",
    bucket_seconds: int = 21_600,
    extra_keys: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Rows of ``facts`` joined to every interval containing them
    (half-open: start ≤ ts < end), equi-matched on ``extra_keys`` first.

    Output columns: facts.* + intervals.* (minus duplicated keys).
    ``how`` supports "inner" and "left_semi" (facts covered by ≥1
    interval — the dedup/filter use)."""
    keys = extra_keys or []
    b = F.lit(bucket_seconds)
    f = facts.withColumn(
        "_bucket", F.floor(F.col(fact_ts).cast("timestamp").cast("long") / b)
    )
    i = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(start).cast("timestamp").cast("long") / b),
                F.floor(F.col(end).cast("timestamp").cast("long") / b),
            )
        ),
    )
    cond = [f["_bucket"] == i["_bucket"]] + [f[k] == i[k] for k in keys]
    contained = (f[fact_ts] >= i[start]) & (f[fact_ts] < i[end])
    if how == "left_semi":
        return (
            f.join(i, [*cond, contained], "left_semi").drop("_bucket")
        )
    if how != "inner":
        raise ValueError(f"unsupported how={how!r}")
    out = f.join(i, [*cond, contained], "inner")
    # drop the helper and the right side's duplicated key columns
    out = out.drop(i["_bucket"]).drop(f["_bucket"])
    for k in keys:
        out = out.drop(i[k])
    return out


def merge_intervals(
    df: DataFrame,
    key_cols: list[str],
    start: str = "start",
    end: str = "end",
) -> DataFrame:
    """Coalesce overlapping/touching half-open intervals per key into
    maximal disjoint spans — interval stitching (coverage periods,
    downtime windows, session spans from heterogeneous sources), the
    interval-set union Spark has no operator for.

    Sweep formulation: within each key, ordered by (start, end), an
    interval OPENS a new span iff its start exceeds the running max of
    all previous ends (touching spans merge); the running count of opens
    is the span id, and min(start)/max(end) per span are its bounds.
    Two window passes + one aggregation, all keyed on ``key_cols`` — a
    single shuffle reused across the three steps, linear at any scale;
    per-key sorts are the usual skew watch-point (cap/sample a hot key).

    Returns key_cols + (start, end) of each merged span.
    """
    w = W.partitionBy(*key_cols).orderBy(start, end)
    prev_max = F.max(end).over(w.rowsBetween(W.unboundedPreceding, -1))
    opens = F.when(
        prev_max.isNull() | (F.col(start) > prev_max), F.lit(1)
    ).otherwise(F.lit(0))
    span = F.sum(opens).over(w.rowsBetween(W.unboundedPreceding, 0))
    return (
        df.withColumn("_span", span)
        .groupBy(*key_cols, "_span")
        .agg(F.min(start).alias(start), F.max(end).alias(end))
        .drop("_span")
    )
