"""Scaling sweep for rank-1 alternating power iteration.

Synthesizes hash-derived sparse ratings matrices at growing nnz (rows =
nnz/50, cols = nnz/500 — the interaction-matrix aspect ratio of the
catalog's customer×part use) and times power_iteration_factors(iters=3).
The claim under test: each half-iteration is one keyed join + one
map-side-combined groupBy over nnz(R) plus a scalar-norm broadcast, so
wall time grows sub-linearly in nnz until the shuffle dominates — the
same shape as the pagerank sweep (scripts/bench_graph_scaling.py), where
per-round job overhead amortizes on a real cluster instead of
multiplying.

Run (quiet host): python scripts/bench_factorization_scaling.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from open_ftth_relational_projector_spark.functions.factorization import (
    power_iteration_factors,
)
from open_ftth_relational_projector_spark.session import get_spark


def ratings_df(spark, nnz: int):
    """Deterministic pseudo-random ratings: entry i sits at hash-derived
    (row, col) with a 1-50 weight; no Python RNG so runs are identical."""
    n_rows, n_cols = max(nnz // 50, 10), max(nnz // 500, 10)
    return (
        spark.range(nnz)
        .select(
            (F.col("id") % n_rows).alias("row_id"),
            ((F.col("id") * 2654435761 + F.col("id") % 89) % n_cols).alias(
                "col_id"
            ),
            ((F.col("id") * 40503 % 50) + 1).cast("double").alias("rating"),
        )
        .groupBy("row_id", "col_id")
        .agg(F.sum("rating").alias("rating"))
        .repartition(32)
    )


def main() -> None:
    spark = get_spark(
        app_name="bench-factorization-scaling",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    print("| nnz | rows | cols | power_iteration(3 it) |")
    print("|---|---|---|---|")
    for nnz in (1_000_000, 10_000_000, 50_000_000):
        r = ratings_df(spark, nnz).localCheckpoint()
        n = r.count()
        t0 = time.perf_counter()
        u, v = power_iteration_factors(r, iters=3)
        # evaluate both outputs fully (noop-sink equivalent)
        u.write.format("noop").mode("overwrite").save()
        v.write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        n_rows = r.select("row_id").distinct().count()
        n_cols = r.select("col_id").distinct().count()
        print(f"| {n:,} | {n_rows:,} | {n_cols:,} | {wall:.1f} s |")
        r.unpersist()

    spark.stop()


if __name__ == "__main__":
    main()
