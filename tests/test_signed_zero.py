"""The signed-zero ROUND class (r7 driver FAIL, fixed r8).

DuckDB's ROUND(double, n) preserves the sign bit of a tiny negative
(-0.0); Spark's ROUND goes through BigDecimal and always returns +0.0.
Any negative-capable rounded oracle output can therefore hash-mismatch
an otherwise-correct query. The repo-wide rule: normalize such sites
with ``+ 0`` after the ROUND (IEEE -0.0 + 0 = +0.0, a no-op on every
nonzero value). These pins hold the engine behaviors the rule relies on;
the site audit itself lives in BENCH_NOTES.md (round 8) and is enforced
empirically by scripts/check_oracle.py's bit-level float comparison.
"""

from __future__ import annotations

import math
import struct

import duckdb
from pyspark.sql import functions as F


def _bits(v: float) -> str:
    return struct.pack(">d", v).hex()


POS_ZERO = _bits(0.0)
NEG_ZERO = _bits(-0.0)


def test_duckdb_round_preserves_then_plus_zero_normalizes():
    con = duckdb.connect()
    raw, norm, mz = con.sql(
        "SELECT ROUND(CAST(-1e-12 AS DOUBLE), 4),"
        " ROUND(CAST(-1e-12 AS DOUBLE), 4) + 0,"
        " ROUND(CAST(-0.0 AS DOUBLE), 4)"
    ).fetchone()
    assert _bits(raw) == NEG_ZERO  # the hazard
    assert _bits(norm) == POS_ZERO  # the fix
    assert _bits(mz) == POS_ZERO  # exact -0.0 input is NOT a hazard
    # + 0 is a no-op on nonzero values, including negatives
    a, b = con.sql(
        "SELECT ROUND(CAST(-1.23456789 AS DOUBLE), 4),"
        " ROUND(CAST(-1.23456789 AS DOUBLE), 4) + 0"
    ).fetchone()
    assert _bits(a) == _bits(b)


def test_spark_round_always_positive_zero(spark):
    r = (
        spark.range(1)
        .select(
            F.round(F.lit(-1e-12).cast("double"), 4).alias("api"),
            F.expr("round(cast(-1e-12 as double), 4)").alias("sql"),
            F.expr("round(cast(-1e-12 as double), 4) + 0").alias("norm"),
            F.expr("round(cast(-1.23456789 as double), 4)").alias("neg"),
        )
        .collect()[0]
    )
    assert _bits(r["api"]) == POS_ZERO
    assert _bits(r["sql"]) == POS_ZERO
    assert _bits(r["norm"]) == POS_ZERO
    assert r["neg"] == -1.2346


def test_corr_round_norm_shared_text_cross_engine(spark):
    """The exact shared formula text used by correlation_matrix_lineitem
    (catalog/analytics._round_norm) evaluates to bit-identical +0.0 on
    both engines for a tiny negative covariance — the r7 failing cell's
    shape."""
    from open_ftth_relational_projector_spark.catalog.analytics import (
        _round_norm,
    )

    expr = _round_norm("CAST(-3e-9 AS DOUBLE)", 6)
    s = spark.range(1).selectExpr(f"{expr} AS v").collect()[0]["v"]
    d = duckdb.sql(f"SELECT {expr} AS v").fetchone()[0]
    assert _bits(s) == _bits(d) == POS_ZERO
    assert not math.copysign(1.0, s) < 0


def test_duckdb_decimal_double_cast_is_double_rounded():
    """Documents the SECOND cross-engine divergence class the bit-level
    checker surfaced (r8): DuckDB's native DECIMAL→DOUBLE cast is
    double-rounded for significands beyond 2^53, while the STRING
    roundtrip (dec2dbl_sql) is correctly rounded — bit-equal to Python's
    float() and to Spark's BigDecimal cast."""
    con = duckdb.connect()
    cases = [
        "58327261803.27700000",  # the kfold s2y moment that failed
        "4367942965831.35220000",
        "-4543355241190.13050000",
    ]
    from open_ftth_relational_projector_spark.functions.regression import (
        dec2dbl_sql,
    )

    any_direct_diff = False
    for c in cases:
        dec = f"CAST('{c}' AS DECIMAL(38,8))"
        direct = con.sql(f"SELECT CAST({dec} AS DOUBLE)").fetchone()[0]
        via = con.sql(f"SELECT {dec2dbl_sql(dec)}").fetchone()[0]
        assert _bits(via) == _bits(float(c)), c  # correctly rounded
        any_direct_diff |= _bits(direct) != _bits(float(c))
    # the hazard is real on this DuckDB build (if this ever starts
    # failing, DuckDB fixed its cast and dec2dbl_sql becomes a no-op —
    # harmless either way)
    assert any_direct_diff


def test_spark_string_roundtrip_equals_direct_decimal_cast(spark):
    """Spark side of dec2dbl_sql: the STRING roundtrip must be a VALUE
    no-op vs the direct decimal cast (both correctly rounded), so
    adopting the shared text cannot move any previously-green row."""
    from open_ftth_relational_projector_spark.functions.regression import (
        dec2dbl_sql,
    )

    rows = spark.sql(
        "SELECT CAST(v AS DOUBLE) AS direct, "
        + dec2dbl_sql("v")
        + " AS via FROM (SELECT CAST('58327261803.2770' AS DECIMAL(38,8)) v"
        "  UNION ALL SELECT CAST('-4543355241190.1305' AS DECIMAL(38,8))"
        "  UNION ALL SELECT CAST('0.0001' AS DECIMAL(38,8)))"
    ).collect()
    for r in rows:
        assert _bits(r["direct"]) == _bits(r["via"])
