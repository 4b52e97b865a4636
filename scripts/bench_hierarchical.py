"""Measure hierarchical prefix ops vs the single-task global window.

The hierarchical forms exist for 100 TB safety, but the claim worth
recording is that they already WIN locally once rows outgrow one task:
time `sum() OVER (ORDER BY ...)` / `row_number() OVER (ORDER BY ...)`
against hierarchical_cumsum / hierarchical_row_number at growing row
counts on local[32], plus assert value equality at the smallest size.

Run (quiet host): python scripts/bench_hierarchical.py
Appends nothing — prints a markdown table for BENCH_NOTES.md.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import Window
from pyspark.sql import functions as F

from open_ftth_relational_projector_spark.operators.hierarchical import (
    hierarchical_cumsum,
    hierarchical_row_number,
)
from open_ftth_relational_projector_spark.session import get_spark


def timed(fn):
    t0 = time.perf_counter()
    n = fn()
    return time.perf_counter() - t0, n


def main() -> None:
    spark = get_spark(
        app_name="bench-hierarchical",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm-up

    print("| rows | global cumsum | hier cumsum | global rank | hier rank |")
    print("|---|---|---|---|---|")
    for n_rows in (1_000_000, 10_000_000, 50_000_000):
        df = (
            spark.range(n_rows)
            .select(
                (F.col("id") * 2654435761 % 4294967296).alias("k"),
                (F.col("id") % 1000).alias("v"),
            )
            .repartition(32)
        )
        w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
        tg_c, _ = timed(lambda: df.withColumn("c", F.sum("v").over(w)).agg(
            F.max("c")).collect())
        th_c, _ = timed(lambda: hierarchical_cumsum(df, [F.col("k")], "v", "c")
                        .agg(F.max("c")).collect())
        wr = Window.orderBy("k")
        tg_r, _ = timed(lambda: df.withColumn("r", F.row_number().over(wr))
                        .agg(F.max("r")).collect())
        th_r, _ = timed(lambda: hierarchical_row_number(df, [F.col("k")], "r")
                        .agg(F.max("r")).collect())
        print(
            f"| {n_rows:,} | {tg_c:.1f} s | {th_c:.1f} s | "
            f"{tg_r:.1f} s | {th_r:.1f} s |"
        )

    # equality spot-check at 1M (bit-identical contract)
    df = spark.range(1_000_000).select(
        (F.col("id") * 2654435761 % 4294967296).alias("k"),
        (F.col("id") % 1000).alias("v"),
    ).repartition(32)
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    a = df.withColumn("c", F.sum("v").over(w))
    b = hierarchical_cumsum(df, [F.col("k")], "v", "c")
    diff = a.select("k", "c").exceptAll(b.select("k", "c")).count()
    print(f"equality check (1M rows, exceptAll): {diff} differing rows")
    spark.stop()


if __name__ == "__main__":
    main()
