"""Hierarchical prefix operators vs their single-task global-window twins.

operators/hierarchical.py replaces `OVER (ORDER BY ... )` windows with a
range-shard + shard-offset composition; these tests pin bit-equality
against the global window on multi-partition inputs, including shard
boundaries landing mid-run and fewer rows than shards.
"""

from __future__ import annotations

import random

from pyspark.sql import Window
from pyspark.sql import functions as F

from open_ftth_relational_projector_spark.operators.hierarchical import (
    hierarchical_cumsum,
    hierarchical_row_number,
    ntile_from_rank,
)

from conftest import rows_set


def _data(spark, n=500, parts=11):
    rng = random.Random(42)
    rows = [(i, rng.randint(0, 50)) for i in rng.sample(range(10 * n), n)]
    return spark.createDataFrame(rows, "k long, v long").repartition(parts)


def test_hierarchical_cumsum_matches_global_window(spark):
    df = _data(spark)
    got = hierarchical_cumsum(df, [F.col("k")], "v", "cum")
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    want = df.withColumn("cum", F.sum("v").over(w))
    assert rows_set(got) == rows_set(want)


def test_hierarchical_row_number_matches_global_window(spark):
    df = _data(spark)
    got = hierarchical_row_number(df, [F.col("v").desc(), F.col("k")], "rn")
    want = df.withColumn(
        "rn", F.row_number().over(Window.orderBy(F.col("v").desc(), "k")).cast("long")
    )
    assert rows_set(got) == rows_set(want)


def test_hierarchical_fewer_rows_than_shards(spark):
    df = spark.createDataFrame([(3, 10), (1, 20), (2, 5)], "k long, v long")
    got = rows_set(hierarchical_cumsum(df, [F.col("k")], "v", "cum"))
    assert got == [(1, 20, 20), (2, 5, 25), (3, 10, 35)]
    rn = rows_set(hierarchical_row_number(df, [F.col("k")], "rn"))
    assert rn == [(1, 20, 1), (2, 5, 2), (3, 10, 3)]


def test_ntile_from_rank_matches_sql_ntile(spark):
    # every n in 1..23 exercises n % 5 remainders incl. n < tiles
    for n in (1, 2, 4, 5, 7, 13, 23):
        df = spark.range(1, n + 1).select(F.col("id").alias("k"))
        got = rows_set(
            df.select("k", ntile_from_rank(F.col("k"), n, 5).cast("int").alias("t"))
        )
        want = rows_set(
            df.select("k", F.ntile(5).over(Window.orderBy("k")).alias("t"))
        )
        assert got == want, f"n={n}"


def test_hierarchical_invariant_to_shard_count(spark):
    """Results are identical at any parallelism: n_shards 1, 3, and 64
    (more shards than rows included) all reproduce the global window."""
    df = _data(spark, n=200, parts=7)
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    want = rows_set(df.withColumn("cum", F.sum("v").over(w)))
    for n_shards in (1, 3, 64):
        got = rows_set(
            hierarchical_cumsum(df, [F.col("k")], "v", "cum", n_shards=n_shards)
        )
        assert got == want, f"n_shards={n_shards}"
    want_rn = rows_set(
        df.withColumn("rn", F.row_number().over(Window.orderBy("k")).cast("long"))
    )
    for n_shards in (1, 3, 64):
        got = rows_set(
            hierarchical_row_number(df, [F.col("k")], "rn", n_shards=n_shards)
        )
        assert got == want_rn, f"n_shards={n_shards}"
