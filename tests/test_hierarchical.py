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


def test_hierarchical_cumsum_double_values(spark):
    """Float/double value columns must work (round-4 advice: the offsets
    frame previously pinned `_off long`, so float shard totals crashed at
    createDataFrame verification). Doubles compare at 1e-9 tolerance —
    the shard-offset addition may reassociate the sum."""
    rng = random.Random(7)
    rows = [(i, rng.random() * 10) for i in rng.sample(range(5000), 400)]
    df = spark.createDataFrame(rows, "k long, v double").repartition(5)
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    want = {r.k: r.cum for r in df.withColumn("cum", F.sum("v").over(w)).collect()}
    got = {
        r.k: r.cum
        for r in hierarchical_cumsum(df, [F.col("k")], "v", "cum", n_shards=4).collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-9, k


def test_hierarchical_cumsum_decimal_values_exact(spark):
    """Decimal value columns stay EXACT (offsets carry decimal type):
    bit-equality with the global window, no reassociation error."""
    from decimal import Decimal

    rng = random.Random(11)
    rows = [
        (i, Decimal(rng.randint(0, 99999)) / 100)
        for i in rng.sample(range(5000), 300)
    ]
    df = spark.createDataFrame(rows, "k long, v decimal(10,2)").repartition(5)
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    want = {r.k: r.cum for r in df.withColumn("cum", F.sum("v").over(w)).collect()}
    got = {
        r.k: r.cum
        for r in hierarchical_cumsum(df, [F.col("k")], "v", "cum", n_shards=4).collect()
    }
    assert got == want


def test_hierarchical_cumsum_wide_decimal_exact(spark):
    """decimal(38,0) values whose running totals exceed 1e20 (and scale-0
    columns generally) must stay exact — the offsets schema follows the
    totals' actual scale instead of a fixed decimal(38,18), which could
    not represent >20-integer-digit sums (round-5 review finding)."""
    from decimal import Decimal

    big = Decimal(10) ** 19  # each value 1e19; totals cross 1e20 fast
    rows = [(i, big + i) for i in range(50)]
    df = spark.createDataFrame(rows, "k long, v decimal(38,0)").repartition(4)
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    want = {r.k: r.cum for r in df.withColumn("cum", F.sum("v").over(w)).collect()}
    got = {
        r.k: r.cum
        for r in hierarchical_cumsum(df, [F.col("k")], "v", "cum", n_shards=4).collect()
    }
    assert got == want


def test_grouped_row_number_and_ntile_match_window(spark):
    """hierarchical_grouped_row_number + ntile_from_rank_col must equal
    the plain per-group window ntile exactly: few giant skewed groups,
    ties on the order value broken by id (total order), group sizes
    chosen to exercise NTILE's ceil/floor split (n % t != 0)."""
    from open_ftth_relational_projector_spark.operators.hierarchical import (
        hierarchical_grouped_row_number,
        ntile_from_rank_col,
    )

    rng = random.Random(11)
    rows = []
    for g, n in (("en", 700), ("zh", 101), ("de", 17), ("fr", 3), ("es", 1)):
        for i in range(n):
            rows.append((g, i, rng.randrange(40)))  # heavy ties in v
    df = spark.createDataFrame(rows, "g string, id long, v long").repartition(8)

    w = Window.partitionBy("g").orderBy(F.desc("v"), F.col("id"))
    want = {
        (r.g, r.id): (r.rn, r.b)
        for r in df.withColumn("rn", F.row_number().over(w))
        .withColumn("b", F.ntile(3).over(w))
        .collect()
    }
    ranked = hierarchical_grouped_row_number(
        df, ["g"], [F.desc("v"), F.col("id")], "rn",
        shard_on=-F.col("v"), n_shards=7,
    )
    npg = ranked.groupBy("g").agg(F.count(F.lit(1)).alias("n"))
    got = {
        (r.g, r.id): (r.rn, r.b)
        for r in ranked.join(F.broadcast(npg), "g")
        .withColumn("b", ntile_from_rank_col(F.col("rn"), F.col("n"), 3))
        .collect()
    }
    assert got == want


def test_grouped_rank_null_group_kept_null_key_raises(spark):
    """NULL group keys must survive (SQL windows treat NULL as its own
    partition — the offsets join is null-safe); a NULL SHARD key must
    raise rather than silently mis-rank; total_col carries the per-group
    count without an extra scan."""
    from open_ftth_relational_projector_spark.operators.hierarchical import (
        hierarchical_grouped_row_number,
    )

    rows = [("en", 1, 10), ("en", 2, 5), (None, 3, 7), (None, 4, 1)]
    df = spark.createDataFrame(rows, "g string, id long, v long")
    got = {
        (r.g, r.id): (r.rn, r.n)
        for r in hierarchical_grouped_row_number(
            df, ["g"], [F.col("v"), F.col("id")], "rn",
            total_col="n", n_shards=3,
        ).collect()
    }
    assert got == {
        ("en", 2): (1, 2),
        ("en", 1): (2, 2),
        (None, 4): (1, 2),
        (None, 3): (2, 2),
    }

    import pytest as _pytest

    null_v = spark.createDataFrame(
        [("en", 1, None), ("en", 2, 5)], "g string, id long, v long"
    )
    with _pytest.raises(Exception, match="NULL|ASSERT"):
        hierarchical_grouped_row_number(
            null_v, ["g"], [F.col("v"), F.col("id")], "rn", n_shards=3
        ).collect()
