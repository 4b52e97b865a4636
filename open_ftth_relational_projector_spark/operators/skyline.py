"""2-D skyline (Pareto frontier) — the dominance query Spark has no
native operator for.

A row is on the skyline iff no other row is at-least-as-good on both
axes and strictly better on one (here: minimize ``minimize``, maximize
``maximize``) — the classic "cheapest-and-biggest" multi-criteria
shortlist (price/quality curation cuts, best-effort/cost model choices).

Expressed directly it is a quadratic NOT EXISTS self-join; the scalable
formulation is the sorted sweep: a row survives iff its ``maximize``
value strictly exceeds every ``maximize`` value seen at strictly lower
``minimize``. We run the sweep as a hierarchical prefix-max so no global
single-partition window appears in the plan:

  1. reduce to one row per distinct ``minimize`` level (map-side
     combined groupBy: level → max of ``maximize``);
  2. bucket levels into ``n_buckets`` fixed-width ranges; per-bucket
     maxima (n_buckets rows) come to the driver, where the
     strictly-earlier-bucket prefix max is computed and broadcast back —
     the only driver-side data is O(n_buckets) scalars;
  3. inside each bucket a partitionBy(bucket) running max completes the
     sweep — every window partition holds only that bucket's levels, so
     the sort is distributed and skew-bounded by the bucket width;
  4. surviving levels broadcast-join back to the full table, keeping
     rows that attain their level's best ``maximize``.

Equal (minimize, maximize) duplicates are all kept (dominance requires
one STRICT inequality); a row tied on one axis and beaten on the other
is dominated and dropped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def skyline_2d(
    df: DataFrame,
    minimize: str,
    maximize: str,
    n_buckets: int = 64,
) -> DataFrame:
    """Rows of ``df`` on the Pareto frontier of (min ``minimize``,
    max ``maximize``). Null values on either axis are excluded (null is
    incomparable, matching SQL NOT EXISTS semantics where comparisons
    with NULL never dominate)."""
    data = df.filter(F.col(minimize).isNotNull() & F.col(maximize).isNotNull())
    levels = data.groupBy(F.col(minimize).alias("_x")).agg(
        F.max(maximize).alias("_best")
    )

    lo, hi = data.agg(
        F.min(minimize).cast("double"), F.max(minimize).cast("double")
    ).first()
    if lo is None:
        return data.limit(0)
    width = (hi - lo) / n_buckets if hi > lo else 1.0
    bucket = F.least(
        F.floor((F.col("_x").cast("double") - F.lit(lo)) / F.lit(width)),
        F.lit(n_buckets - 1),
    ).cast("int")
    levels = levels.withColumn("_b", bucket)

    per_bucket = {
        r["_b"]: r["_m"]
        for r in levels.groupBy("_b").agg(F.max("_best").alias("_m")).collect()
    }
    prefix: dict[int, float | int] = {}
    running = None
    for b in range(n_buckets):
        prefix[b] = running
        if b in per_bucket:
            running = per_bucket[b] if running is None else max(running, per_bucket[b])
    spark = df.sparkSession
    prefix_df = spark.createDataFrame(
        [(b, prefix[b]) for b in range(n_buckets)],
        schema=levels.select(
            F.col("_b"), F.col("_best").alias("_prefix")
        ).schema,
    )

    w = W.partitionBy("_b").orderBy("_x").rowsBetween(W.unboundedPreceding, -1)
    surviving = (
        levels.join(F.broadcast(prefix_df), "_b")
        .withColumn(
            "_prev", F.greatest(F.max("_best").over(w), F.col("_prefix"))
        )
        .filter(F.col("_prev").isNull() | (F.col("_best") > F.col("_prev")))
        .select("_x", "_best")
    )
    return (
        data.join(
            F.broadcast(surviving),
            (data[minimize] == F.col("_x")) & (data[maximize] == F.col("_best")),
            "inner",
        )
        .drop("_x", "_best")
    )
