"""Scaling sweep for the round-6 additions: one-pass correlation matrix,
equi-depth bins (hierarchical rank), snapshot diff, mixture planning, and
the restructured bigram LM.

Claims under test:
- correlation_matrix: ONE scan into 15 bounded moment sums → linear, flat
  shape at any n.
- equidepth bins: hierarchical_row_number (range-sharded) instead of a
  single-task global window → stays parallel as n grows.
- snapshot_diff: one co-partitioned full-outer on (id, fingerprint) —
  linear in ids, payload-independent.
- mixture_weights: one corpus scan + dimension-sized normalization.
- bigram_lm_scores: after the r6 restructure, ONE corpus-sized shuffle
  (join on bg) + gram-table-sized side joins.

Inputs are hash-derived (no RNG). Run on a quiet host:
python scripts/bench_r6_scaling.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from open_ftth_relational_projector_spark.session import get_spark


def lineitem_like(spark, n: int):
    return (
        spark.range(n)
        .select(
            F.col("id").alias("k1"),
            (F.col("id") % 7).cast("int").alias("k2"),
            (F.col("id") % 3).cast("string").alias("l_returnflag"),
            ((F.col("id") * 7919 % 5000) / 100.0).alias("l_quantity"),
            ((F.col("id") * 104729 % 9000000) / 100.0).alias("l_extendedprice"),
            ((F.col("id") * 31 % 11) / 100.0).alias("l_discount"),
            ((F.col("id") * 17 % 9) / 100.0).alias("l_tax"),
        )
        .repartition(32)
    )


def docs_like(spark, n: int):
    words = F.expr(
        "transform(sequence(1, 24), i -> "
        "concat('w', CAST((id * i * 2654435761) % 3000 AS STRING)))"
    )
    return (
        spark.range(n)
        .select(
            F.col("id").alias("doc_id"),
            (F.col("id") % 7).cast("string").alias("source"),
            (F.col("id") % 5).cast("string").alias("lang"),
            F.array_join(words, " ").alias("text"),
        )
        .repartition(32)
    )


def timed(label, df):
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    print(f"  {label}: {time.perf_counter() - t0:.2f}s")


def main() -> None:
    from open_ftth_relational_projector_spark.catalog.analytics import (
        _CORR_PAIRS,
        _CORR_VARS,
        _corr_exprs,
        _corr_moment_exprs,
    )
    from open_ftth_relational_projector_spark.functions.dedup import snapshot_diff
    from open_ftth_relational_projector_spark.functions.quality import (
        bigram_lm_scores,
    )
    from open_ftth_relational_projector_spark.functions.sampling import (
        mixture_weights,
    )
    from open_ftth_relational_projector_spark.operators.hierarchical import (
        hierarchical_row_number,
    )

    spark = get_spark(
        app_name="r6-scaling",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    for n in (1_000_000, 10_000_000, 50_000_000):
        print(f"n = {n:,} rows")
        li = lineitem_like(spark, n).persist()
        li.count()

        per = li.groupBy("l_returnflag").agg(
            F.count(F.lit(1)).alias("n"),
            *[F.expr(e) for e in _corr_moment_exprs("DECIMAL(18,4)")],
        )
        out = None
        for x, y in _CORR_PAIRS:
            cov, corr = _corr_exprs(x, y)
            b = per.selectExpr(
                "l_returnflag",
                f"'{_CORR_VARS[x]}' AS var_x",
                f"'{_CORR_VARS[y]}' AS var_y",
                f"ROUND({cov}, 6) AS covariance",
                f"ROUND({corr}, 6) AS corr",
            )
            out = b if out is None else out.unionByName(b)
        timed("correlation_matrix (one-pass)", out)

        r = hierarchical_row_number(
            li.select("l_extendedprice", "k1", "k2"),
            [F.col("l_extendedprice"), F.col("k1"), F.col("k2")],
            "rn",
        )
        cnt = li.agg(F.count(F.lit(1)).alias("n"))
        bins = (
            r.crossJoin(F.broadcast(cnt))
            .selectExpr(
                "l_extendedprice AS v",
                "CAST(((rn - 1) * 10) div n AS INT) AS bucket",
            )
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.round(F.min("v"), 2).alias("lo"),
                 F.round(F.max("v"), 2).alias("hi"))
        )
        timed("equidepth_bins (hierarchical rank)", bins)

        v1 = li.select(
            F.col("k1").cast("string").alias("doc_id"),
            F.md5(F.col("k1").cast("string")).alias("fingerprint"),
        )
        v2 = li.filter("k1 % 10 <> 0").select(
            F.col("k1").cast("string").alias("doc_id"),
            F.when(
                F.col("k1") % 10 == 1,
                F.md5(F.concat(F.col("k1").cast("string"), F.lit("x"))),
            ).otherwise(F.md5(F.col("k1").cast("string"))).alias("fingerprint"),
        )
        timed(
            "snapshot_diff (full-outer on fingerprints)",
            snapshot_diff(v1, v2).groupBy("status").count(),
        )
        li.unpersist()

    for n in (50_000, 500_000, 2_000_000):
        print(f"docs = {n:,}")
        d = docs_like(spark, n).persist()
        d.count()
        timed("mixture_weights", mixture_weights(d))
        timed("bigram_lm_scores (single corpus shuffle)", bigram_lm_scores(d))
        d.unpersist()


if __name__ == "__main__":
    main()
