"""operators/quantiles.exact_quantiles vs Spark's exact percentile().

The helper replaces the single-state exact `percentile` aggregate at the
five data-proportional call sites the round-6 verdict flagged; the pinned
contract is BIT-IDENTITY (==, not approx) with `F.expr("percentile(v,p)")`
for double inputs, at any sharding, grouped and ungrouped — so swapping
the call sites cannot move their (unchanged) DuckDB oracles by an ulp.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from open_ftth_relational_projector_spark.operators.quantiles import (
    exact_quantiles,
)

PS = {"p05": 0.05, "p20": 0.2, "p50": 0.5, "p90": 0.9, "p95": 0.95}


def _expected(spark_df, ps, group_cols=()):
    aggs = [
        F.expr(f"percentile(v, {p}D)").alias(name) for name, p in ps.items()
    ]
    if group_cols:
        exp = spark_df.groupBy(*group_cols).agg(*aggs)
    else:
        exp = spark_df.agg(*aggs)
    return {
        tuple(r[c] for c in group_cols): {n: r[n] for n in ps}
        for r in exp.collect()
    }


def _got(spark_df, ps, group_cols=(), **kw):
    out = exact_quantiles(spark_df, "v", ps, group_cols=list(group_cols), **kw)
    return {
        tuple(r[c] for c in group_cols): {n: r[n] for n in ps}
        for r in out.collect()
    }


def test_ungrouped_bit_identical_random(spark):
    rng = random.Random(7)
    rows = [(rng.uniform(-1e4, 1e4),) for _ in range(997)]
    df = spark.createDataFrame(rows, "v double")
    assert _got(df, PS) == _expected(df, PS)


def test_ungrouped_heavy_ties_and_negatives(spark):
    rng = random.Random(11)
    rows = [(float(rng.choice([-3, -1, 0, 0, 0, 2, 2, 5])),) for _ in range(500)]
    df = spark.createDataFrame(rows, "v double")
    assert _got(df, PS) == _expected(df, PS)


def test_tiny_inputs_n1_n2_n3(spark):
    for vals in ([4.25], [9.0, -2.5], [1.0, 1.0, 3.0]):
        df = spark.createDataFrame([(v,) for v in vals], "v double")
        assert _got(df, PS) == _expected(df, PS), vals


def test_grouped_bit_identical_skewed_groups(spark):
    rng = random.Random(23)
    rows = [("big", rng.gauss(100.0, 37.0)) for _ in range(3000)]
    rows += [("small", float(i)) for i in range(7)]
    rows += [("dup", 5.0) for _ in range(40)]
    df = spark.createDataFrame(rows, "g string, v double")
    assert _got(df, PS, ("g",)) == _expected(df, PS, ("g",))


def test_nulls_skipped_and_count_col(spark):
    rows = [("a", None), ("a", 1.0), ("a", 3.0), ("b", 2.0), ("b", None)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = {
        r["g"]: r
        for r in exact_quantiles(
            df, "v", {"med": 0.5}, group_cols=["g"], count_col="n"
        ).collect()
    }
    assert out["a"]["med"] == 2.0 and out["a"]["n"] == 2
    assert out["b"]["med"] == 2.0 and out["b"]["n"] == 1


def test_sharding_invariance(spark):
    rng = random.Random(41)
    rows = [(rng.uniform(0, 1),) for _ in range(800)]
    df = spark.createDataFrame(rows, "v double")
    exp = _expected(df, PS)
    for n in (1, 2, 5, 64):
        assert _got(df, PS, n_shards=n) == exp, n


def test_column_expression_value(spark):
    rows = [(float(i),) for i in range(101)]
    df = spark.createDataFrame(rows, "v double")
    got = exact_quantiles(
        df.withColumnRenamed("v", "raw"),
        F.abs(F.col("raw") - 50.0),
        {"med": 0.5},
    ).collect()[0]["med"]
    exp = df.agg(
        F.expr("percentile(abs(v - 50.0), 0.5D)").alias("m")
    ).collect()[0]["m"]
    assert got == exp


def test_property_random_quantiles_match_percentile(spark):
    """Property sweep: randomized value distributions (uniform, heavy-tail,
    integer-lattice ties, negatives) × randomized probability sets must
    match percentile() EXACTLY. Seeded, 6 trials — the fixed-seed stand-in
    for a hypothesis strategy (Spark fixtures and hypothesis's function-
    scoped health checks don't mix)."""
    import random

    rng = random.Random(99)
    for trial in range(6):
        n = rng.choice([13, 97, 500, 1201])
        dist = rng.choice(["uniform", "heavy", "lattice"])
        if dist == "uniform":
            vals = [rng.uniform(-1e6, 1e6) for _ in range(n)]
        elif dist == "heavy":
            vals = [rng.gauss(0, 1) ** 7 for _ in range(n)]
        else:
            vals = [float(rng.randint(-5, 5)) for _ in range(n)]
        ps = {
            f"q{i}": round(rng.uniform(0.0, 1.0), 3) for i in range(rng.randint(1, 5))
        }
        ps["q_lo"], ps["q_hi"] = 0.0, 1.0  # extremes always included
        df = spark.createDataFrame([(v,) for v in vals], "v double")
        got = _got(df, ps)
        exp = _expected(df, ps)
        assert got == exp, (trial, dist, n, ps)


def test_all_null_group_and_empty_input_shape(spark):
    """r7 advisor fix: the output SHAPE must match percentile() over
    GROUP BY — an all-NULL group yields a row with NULL quantiles (and
    count 0), grouped; empty / all-NULL input yields exactly one such
    row, ungrouped. Previously those groups were silently dropped."""
    ps = {"med": 0.5, "p90": 0.9}
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("b", None), ("b", None), (None, 2.0)],
        "g string, v double",
    )
    got = {
        r["g"]: (r["med"], r["p90"], r["n"])
        for r in exact_quantiles(
            df, "v", ps, group_cols=["g"], count_col="n"
        ).collect()
    }
    exp = {
        r["g"]: (r["med"], r["p90"], r["n"])
        for r in df.groupBy("g")
        .agg(
            F.expr("percentile(v, 0.5D)").alias("med"),
            F.expr("percentile(v, 0.9D)").alias("p90"),
            F.count("v").alias("n"),
        )
        .collect()
    }
    assert got == exp  # includes g='b' (NULL, NULL, 0) and the NULL key

    empty = spark.createDataFrame([], "v double")
    rows = exact_quantiles(empty, "v", ps, count_col="n").collect()
    assert [(r["med"], r["p90"], r["n"]) for r in rows] == [(None, None, 0)]

    all_null = spark.createDataFrame([(None,), (None,)], "v double")
    rows = exact_quantiles(all_null, "v", ps, count_col="n").collect()
    assert [(r["med"], r["p90"], r["n"]) for r in rows] == [(None, None, 0)]
