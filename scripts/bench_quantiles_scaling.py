"""Scaling sweep for operators/quantiles.exact_quantiles (round 7).

Claim under test: the hierarchical-rank exact quantile replaces the
single-state exact ``percentile()`` aggregate with range-sharded state,
so it stays parallel as n grows — bit-identical results at every scale
(asserted here, not just sampled), with wall clock that scales like the
scans instead of like a one-task sort. The giant-group regime (3 groups
over n rows — the winsorized/value_quantiles shape) is the case the
round-6 verdict flagged.

Inputs are hash-derived (no RNG). Run on a quiet host:
python scripts/bench_quantiles_scaling.py [max_n]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from open_ftth_relational_projector_spark.operators.quantiles import (
    exact_quantiles,
)
from open_ftth_relational_projector_spark.session import get_spark

PS = {"p05": 0.05, "p50": 0.5, "p95": 0.95}


def values_like(spark, n: int):
    return spark.range(n).select(
        (F.col("id") % 3).cast("string").alias("g"),
        ((F.col("id") * 7919) % 1_000_003 / 100.0).alias("v"),
    )


def main() -> None:
    max_n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000_000
    spark = get_spark(app_name="quantiles-scaling", shuffle_partitions=32)
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    print(f"{'n':>12} {'percentile()':>14} {'exact_quantiles':>16} identical")
    n = 1_000_000
    while n <= max_n:
        df = values_like(spark, n).persist()
        df.count()

        t0 = time.perf_counter()
        base = {
            r["g"]: tuple(r[k] for k in PS)
            for r in df.groupBy("g")
            .agg(
                *[
                    F.expr(f"percentile(v, {p}D)").alias(k)
                    for k, p in PS.items()
                ]
            )
            .collect()
        }
        t_agg = time.perf_counter() - t0

        t0 = time.perf_counter()
        ours = {
            r["g"]: tuple(r[k] for k in PS)
            for r in exact_quantiles(df, "v", PS, group_cols=["g"]).collect()
        }
        t_h = time.perf_counter() - t0

        assert ours == base, (n, ours, base)  # bit-identical, every scale
        print(f"{n:>12,} {t_agg:>13.2f}s {t_h:>15.2f}s yes")
        df.unpersist()
        n *= 5 if n < 25_000_000 else 2

    spark.stop()


if __name__ == "__main__":
    main()
