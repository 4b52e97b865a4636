"""Scaling sweep for the one-pass trainers: OLS, Naive Bayes, bootstrap.

The claim under test: these operators' cost is ONE scan + bounded state
(O(d²) moments, vocab×classes counts, B resample sums), so wall time grows
at most linearly in rows with no shape change — the "train/evaluate on
100 TB in one pass" story. Inputs are synthesized at growing row counts
with hash-derived values (no RNG, identical across runs).

Run (quiet host): python scripts/bench_onepass_scaling.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from open_ftth_relational_projector_spark.functions.regression import ols2_fit
from open_ftth_relational_projector_spark.functions.sampling import (
    poisson_bootstrap_ci,
)
from open_ftth_relational_projector_spark.session import get_spark


def numeric_rows(spark, n: int):
    """(group, x1, x2, y) with 2-dp values and a planted linear signal."""
    return (
        spark.range(n)
        .select(
            (F.col("id") % 8).cast("string").alias("g"),
            F.col("id").alias("k"),
            ((F.col("id") * 7919 % 5000) / 100.0).alias("x1"),
            ((F.col("id") * 104729 % 90000) / 100.0).alias("x2"),
        )
        .withColumn(
            "y",
            F.round(
                3.5 * F.col("x1")
                + 0.25 * F.col("x2")
                + (F.col("k") % 97).cast("double") / 10.0,
                2,
            ),
        )
        .repartition(32)
    )


def doc_rows(spark, n: int):
    """Synthetic labeled token docs: label-specific vocab + shared noise."""
    return (
        spark.range(n)
        .select(
            F.col("id").alias("doc_id"),
            (F.col("id") % 5).cast("string").alias("lang"),
        )
        .withColumn(
            "text",
            F.concat_ws(
                " ",
                F.concat(F.lit("w"), F.col("lang"), (F.col("doc_id") % 23).cast("string")),
                F.concat(F.lit("w"), F.col("lang"), (F.col("doc_id") % 31).cast("string")),
                F.concat(F.lit("s"), (F.col("doc_id") % 101).cast("string")),
                F.concat(F.lit("s"), (F.col("doc_id") % 211).cast("string")),
                F.concat(F.lit("w"), F.col("lang"), (F.col("doc_id") % 7).cast("string")),
            ),
        )
    )


def main() -> None:
    from open_ftth_relational_projector_spark.functions.text import (
        naive_bayes_confusion,
    )

    spark = get_spark(
        app_name="bench-onepass-scaling",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    print("| rows | ols2_fit | bootstrap_ci (B=40, 8 groups) | naive_bayes (5 classes) |")
    print("|---|---|---|---|")
    for n in (1_000_000, 10_000_000, 50_000_000):
        num = numeric_rows(spark, n).localCheckpoint()
        t0 = time.perf_counter()
        ols2_fit(num, "x1", "x2", "y").write.format("noop").mode(
            "overwrite"
        ).save()
        t_ols = time.perf_counter() - t0
        t0 = time.perf_counter()
        poisson_bootstrap_ci(
            num, "y", "CAST(k AS STRING)", group_cols=["g"], n_resamples=40
        ).write.format("noop").mode("overwrite").save()
        t_boot = time.perf_counter() - t0
        num.unpersist()
        # NB explodes ~5 tokens/doc; keep doc counts at rows/5 so the token
        # volume matches the numeric legs
        docs = doc_rows(spark, n // 5).localCheckpoint()
        t0 = time.perf_counter()
        naive_bayes_confusion(docs).write.format("noop").mode(
            "overwrite"
        ).save()
        t_nb = time.perf_counter() - t0
        docs.unpersist()
        print(
            f"| {n:,} | {t_ols:.1f} s | {t_boot:.1f} s | {t_nb:.1f} s |",
            flush=True,
        )

    spark.stop()


if __name__ == "__main__":
    main()
