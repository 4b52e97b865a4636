"""Scaling sweep for the iterative graph family (frontier/relaxation ops).

The r3 bench-notes sweep measured the dedup family at 100× corpus growth;
this does the same for the graph operators: synthesize hash-derived edge
lists at growing |E| (average out-degree held at ~8 so round counts stay
comparable), run pagerank / multi-source BFS / k-core / Bellman-Ford, and
print wall times. The claim under test: per-round cost is driver-free and
shuffle-bound on the frontier, so wall time grows sub-linearly in |E|
until the shuffle dominates — the shape that survives a 1000-executor
scale-up, where per-round job overhead amortizes instead of multiplying.

Run (quiet host): python scripts/bench_graph_scaling.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from open_ftth_relational_projector_spark.functions.graph import (
    bfs_distances,
    kcore_peel,
    pagerank,
    weighted_shortest_paths,
)
from open_ftth_relational_projector_spark.session import get_spark


def edges_df(spark, n_nodes: int, degree: int = 8):
    """Deterministic pseudo-random edge list: node i → hash-derived
    targets, no Python RNG so every run sees identical graphs."""
    return (
        spark.range(n_nodes * degree)
        .select(
            (F.col("id") % n_nodes).alias("src"),
            (
                (F.col("id") * 2654435761 + F.col("id") % 97) % n_nodes
            ).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .repartition(32)
    )


def main() -> None:
    spark = get_spark(
        app_name="bench-graph-scaling",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    print("| nodes | edges | pagerank(3 it) | bfs(4 hops, 100 seeds) | kcore(3 rounds) | bellman-ford(3 hops) |")
    print("|---|---|---|---|---|---|")
    for n_nodes in (10_000, 100_000, 1_000_000):
        e = edges_df(spark, n_nodes).localCheckpoint()
        n_edges = e.count()
        seeds = spark.range(100).select(F.col("id").alias("node"))
        we = e.withColumn("w", (F.col("dst") % 10 + 1).cast("double"))

        t0 = time.perf_counter()
        pagerank(e, iters=3).agg(F.sum("rank")).collect()
        t_pr = time.perf_counter() - t0

        t0 = time.perf_counter()
        bfs_distances(e, seeds, max_hops=4).agg(F.count(F.lit(1))).collect()
        t_bfs = time.perf_counter() - t0

        t0 = time.perf_counter()
        kcore_peel(e, k=4, rounds=3).agg(F.count(F.lit(1))).collect()
        t_kc = time.perf_counter() - t0

        t0 = time.perf_counter()
        weighted_shortest_paths(we, seeds, weight="w", max_hops=3).agg(
            F.count(F.lit(1))
        ).collect()
        t_bf = time.perf_counter() - t0

        print(
            f"| {n_nodes:,} | {n_edges:,} | {t_pr:.1f} s | {t_bfs:.1f} s | "
            f"{t_kc:.1f} s | {t_bf:.1f} s |"
        )
    spark.stop()


if __name__ == "__main__":
    main()
