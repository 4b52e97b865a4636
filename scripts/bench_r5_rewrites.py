"""Measure the two round-5 scale rewrites against their round-4 shapes.

1. q15-style scalar max: unpartitioned-window max over a per-key aggregate
   (single-task WindowExec) vs scalar agg + crossJoin(broadcast) — at
   growing key cardinality, the window funnels all rows through one task
   while the broadcast form stays parallel.
2. negative sampling: |C|x|P| grid + per-customer full-part window vs 24
   deterministic hash draws/customer + part-index join — at growing part
   count, grid work grows with |P| while the draw budget is constant.

Synthetic inputs (spark.range) so cardinalities scale past the sf fixtures.
Run: python scripts/bench_r5_rewrites.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from open_ftth_relational_projector_spark.operators.hierarchical import (
    hierarchical_row_number,
)
from open_ftth_relational_projector_spark.session import get_spark


def timeit(fn):
    t = time.time()
    n = fn()
    return time.time() - t, n


def bench_scalar_max(spark, n_keys: int):
    # per-key aggregate stand-in: n_keys rows of (key, total)
    rev = (
        spark.range(n_keys)
        .select(
            F.col("id").alias("k"),
            (F.xxhash64("id") % 1000000).alias("total"),
        )
        .persist()
    )
    rev.count()

    def window_form():
        top = rev.withColumn("_max", F.max("total").over(W.partitionBy()))
        return top.filter(F.col("total") == F.col("_max")).count()

    def broadcast_form():
        mx = rev.agg(F.max("total").alias("_max"))
        return (
            rev.crossJoin(F.broadcast(mx))
            .filter(F.col("total") == F.col("_max"))
            .count()
        )

    broadcast_form()  # warm the scan once
    tw, nw = timeit(window_form)
    tb, nb = timeit(broadcast_form)
    assert nw == nb
    rev.unpersist()
    return tw, tb


def bench_negative_samples(spark, n_custs: int, n_parts: int):
    custs = spark.range(n_custs).select((F.col("id") + 1).alias("custkey"))
    part = spark.range(n_parts).select((F.col("id") + 1).alias("partkey"))
    # sparse purchase set: ~20 bought parts per customer
    bought = (
        spark.range(n_custs * 20)
        .select(
            (F.col("id") % n_custs + 1).alias("custkey"),
            (F.xxhash64("id") % n_parts + 1).alias("partkey"),
        )
        .distinct()
        .persist()
    )
    bought.count()
    custs = custs.persist()
    custs.count()
    part = part.persist()
    part.count()

    def grid_form():
        cand = custs.crossJoin(F.broadcast(part)).withColumn(
            "u",
            F.substring(
                F.md5(F.concat_ws("#", "custkey", "partkey", F.lit("neg"))), 1, 8
            ),
        )
        unseen = cand.join(bought, ["custkey", "partkey"], "left_anti")
        w = W.partitionBy("custkey").orderBy("u", "partkey")
        return (
            unseen.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 3)
            .count()
        )

    def draw_form():
        part_idx = hierarchical_row_number(part, [F.col("partkey")], "pidx")
        draws = (
            custs.select(
                "custkey",
                F.explode(F.sequence(F.lit(0), F.lit(23))).alias("i"),
            )
            .withColumn(
                "u",
                F.substring(
                    F.md5(F.concat_ws("#", "custkey", "i", F.lit("neg"))), 1, 15
                ),
            )
            .withColumn(
                "pidx",
                F.conv(F.col("u"), 16, 10).cast("long") % F.lit(n_parts) + 1,
            )
        )
        cand = (
            draws.join(part_idx, "pidx")
            .groupBy("custkey", "partkey")
            .agg(F.min("u").alias("u"))
        )
        unseen = cand.join(bought, ["custkey", "partkey"], "left_anti")
        w = W.partitionBy("custkey").orderBy("u", "partkey")
        return (
            unseen.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 3)
            .count()
        )

    draw_form()  # warm the scan once
    tg, _ = timeit(grid_form)
    td, _ = timeit(draw_form)
    for df in (bought, custs, part):
        df.unpersist()
    return tg, td


def main() -> None:
    spark = get_spark(app_name="bench-r5-rewrites", shuffle_partitions=32)
    print("scalar max over per-key aggregate: window vs broadcast")
    for n_keys in (1_000_000, 4_000_000):
        tw, tb = bench_scalar_max(spark, n_keys)
        print(
            f"  n_keys={n_keys:>11,}  window={tw:6.2f}s  "
            f"broadcast={tb:6.2f}s  speedup={tw / tb:5.2f}x", flush=True
        )
    print("negative sampling: grid+full-window vs hash draws (2k customers)", flush=True)
    for n_parts in (20_000, 80_000):
        tg, td = bench_negative_samples(spark, 2_000, n_parts)
        print(
            f"  n_parts={n_parts:>10,}  grid={tg:6.2f}s  "
            f"draws={td:6.2f}s  speedup={tg / td:5.2f}x", flush=True
        )
    spark.stop()


if __name__ == "__main__":
    main()
