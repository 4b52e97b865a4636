"""Closed-form distributed OLS: normal equations in one aggregation pass.

The canonical one-pass scalable-ML pattern: a d-feature linear model needs
only the moment sums XᵀX (d(d+1)/2 values) and Xᵀy (d values) — one
map-side-combined aggregation over any corpus size, O(d²) state, then a
tiny closed-form solve. Fit statistics come from the same moments
(SSE = Syy − 2βᵀSxy + βᵀSxxβ), so training AND evaluation cost exactly ONE
distributed pass; scoring/residuals are a second map-only pass with the
betas broadcast. At 100 TB nothing about this changes: the shuffle carries
O(d²) numbers per partition, full stop.

Determinism contract: inputs are cast to DECIMAL before multiplication, so
every moment is an EXACT decimal sum — order-independent, hence identical
between Spark partial aggregation and a single-threaded SQL engine (no
per-iteration rounding needed, unlike the float-sum iterative operators).
The 3×3 solve is then a literal expression over the exact moments,
evaluated in double precision in the same textual operation order on both
engines — IEEE arithmetic is deterministic given identical inputs and
order, so betas agree bit-for-bit before any output rounding (the oracle
splices the formulas from OLS2_* below, so the two texts cannot drift).

Implements the d=2 (two features + intercept) solve explicitly — the
adjugate of the symmetric 3×3 moment matrix. Larger d follows the same
shape with the solve done driver-side on the collected O(d²) moments.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# exact decimal type for the inputs: money/quantity-scaled driver columns
# are ≤ 2 dp so (18,4) is lossless; products carry ≤ 8 dp and sums widen
# to 38 digits in both engines without overflow at any realistic corpus
_DEC = "decimal(18,4)"

# the shared solve text — adjugate/determinant of the symmetric 3×3 moment
# matrix A = [[n,s1,s2],[s1,s11,s12],[s2,s12,s22]], rhs b = [sy,s1y,s2y];
# engine-neutral SQL spliced verbatim into BOTH the Spark selectExpr and
# the DuckDB oracle so the IEEE operation order is identical by
# construction
OLS2_DET = (
    "(n * (s11 * s22 - s12 * s12)"
    " - s1 * (s1 * s22 - s12 * s2)"
    " + s2 * (s1 * s12 - s11 * s2))"
)
OLS2_B0 = (
    "(( sy * (s11 * s22 - s12 * s12)"
    " - s1y * (s1 * s22 - s12 * s2)"
    f" + s2y * (s1 * s12 - s11 * s2)) / {OLS2_DET})"
)
OLS2_B1 = (
    "(( sy * (s12 * s2 - s1 * s22)"
    " + s1y * (n * s22 - s2 * s2)"
    f" + s2y * (s1 * s2 - n * s12)) / {OLS2_DET})"
)
OLS2_B2 = (
    "(( sy * (s1 * s12 - s11 * s2)"
    " + s1y * (s2 * s1 - n * s12)"
    f" + s2y * (n * s11 - s1 * s1)) / {OLS2_DET})"
)
OLS2_SSE = (
    "(syy - 2 * (b0 * sy + b1 * s1y + b2 * s2y)"
    " + (b0 * (b0 * n + b1 * s1 + b2 * s2)"
    "  + b1 * (b0 * s1 + b1 * s11 + b2 * s12)"
    "  + b2 * (b0 * s2 + b1 * s12 + b2 * s22)))"
)
OLS2_SST = "(syy - sy * sy / n)"


def dec2dbl_sql(expr: str) -> str:
    """Correctly-rounded DECIMAL→DOUBLE conversion in ENGINE-SHARED SQL
    text. DuckDB's native DECIMAL→DOUBLE cast is double-rounded (int128
    significand → double, then a scale multiply — two IEEE roundings),
    while Spark's goes through BigDecimal and rounds once; on moment sums
    whose significand exceeds 2^53 the results differ by 1 ulp (measured:
    the r8 sweep caught kfold's s2y/syy moments diverging at sf0.001,
    flipping b0 across a 6-dp ROUND boundary). Routing through a STRING
    (decimal→string is exact digits on both engines; string→double parse
    is correctly rounded in both fast_float and Double.parseDouble) makes
    the conversion bit-identical cross-engine. DuckDB accepts STRING as a
    VARCHAR alias, so the same text runs on both engines — and on the
    Spark side the value is UNCHANGED (its direct cast was already
    correctly rounded), so pre-r8 driver-green rows cannot move."""
    return f"CAST(CAST({expr} AS STRING) AS DOUBLE)"


def ols2_moments(df: DataFrame, x1: str, x2: str, y: str) -> DataFrame:
    """ONE distributed pass → a single row of exact-decimal moment sums
    (cast to double after the exact aggregation)."""
    c1, c2, cy = (F.col(c).cast(_DEC) for c in (x1, x2, y))
    return df.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(c1).cast("double").alias("s1"),
        F.sum(c2).cast("double").alias("s2"),
        F.sum(cy).cast("double").alias("sy"),
        F.sum(c1 * c1).cast("double").alias("s11"),
        F.sum(c1 * c2).cast("double").alias("s12"),
        F.sum(c2 * c2).cast("double").alias("s22"),
        F.sum(c1 * cy).cast("double").alias("s1y"),
        F.sum(c2 * cy).cast("double").alias("s2y"),
        F.sum(cy * cy).cast("double").alias("syy"),
    )


def ols2_fit(df: DataFrame, x1: str, x2: str, y: str) -> DataFrame:
    """Fit y ~ b0 + b1·x1 + b2·x2; returns ONE row
    (n, b0, b1, b2, sse, sst) — exact-decimal moments, literal solve."""
    m = ols2_moments(df, x1, x2, y)
    return m.selectExpr(
        "*", f"{OLS2_B0} as b0", f"{OLS2_B1} as b1", f"{OLS2_B2} as b2"
    ).selectExpr(
        "n", "b0", "b1", "b2",
        f"{OLS2_SSE} as sse",
        f"{OLS2_SST} as sst",
    )


def ols2_residuals(
    df: DataFrame, x1: str, x2: str, y: str, fit: DataFrame
) -> DataFrame:
    """Map-only scoring pass: appends prediction + residual columns with
    the one-row fit broadcast (no shuffle of df)."""
    b = F.broadcast(fit.select("b0", "b1", "b2"))
    return (
        df.crossJoin(b)
        .withColumn(
            "_pred",
            F.col("b0") + F.col("b1") * F.col(x1) + F.col("b2") * F.col(x2),
        )
        .withColumn("_resid", F.col(y) - F.col("_pred"))
    )


# --- one-pass k-fold cross-validation ---------------------------------------

#: moment-sum expression bodies over the decimal feature columns
#: (x1d, x2d, yd) — shared verbatim with SQL oracles
def fold_expr_spark(key_expr: str, k: int, salt: str = "f") -> str:
    """md5 fold bucket, Spark spelling. ONE definition per engine so the
    salt/hex-width/modulus can never drift between call sites (the
    OLS2_*/MIX_QD_SQL shared-text convention)."""
    return (
        f"CAST(conv(substring(md5(concat({key_expr}, '#{salt}')), 1, 15),"
        f" 16, 10) AS BIGINT) % {k}"
    )


def fold_expr_sql(key_sql: str, k: int, salt: str = "f") -> str:
    """md5 fold bucket, DuckDB spelling — the twin of fold_expr_spark."""
    return (
        f"('0x' || substr(md5({key_sql} || '#{salt}'), 1, 15))::BIGINT % {k}"
    )


OLS2_MOMENT_EXPRS: dict[str, str] = {
    "s1": "x1d",
    "s2": "x2d",
    "sy": "yd",
    "s11": "x1d * x1d",
    "s12": "x1d * x2d",
    "s22": "x2d * x2d",
    "s1y": "x1d * yd",
    "s2y": "x2d * yd",
    "syy": "yd * yd",
}


def ols2_kfold(
    df: DataFrame,
    x1: str,
    x2: str,
    y: str,
    key_expr: str,
    k: int = 5,
) -> DataFrame:
    """k-fold cross-validation of the 2-feature OLS in ONE distributed
    pass: per-fold exact-decimal moments from one grouped aggregation,
    TRAIN moments for each fold by SUBTRACTION from the totals
    (complement = total − fold, exact on decimals), betas from the
    closed-form solve on the complement, and out-of-fold SSE/SST
    evaluated on the held-out fold's own moments — the same
    SSE = Syy − 2βᵀSxy + βᵀSxxβ identity, so no scoring scan either.

    At 100 TB: the corpus is read once; everything after the k-row moment
    table is literal arithmetic. Folds are md5-bucketed on ``key_expr``
    (engine-portable), so fold membership replays identically in a SQL
    oracle, and the decimal contract makes every moment — hence every
    beta and every R² — bit-identical cross-engine before rounding.

    Returns one row per fold:
    (fold, n_train, n_test, b0, b1, b2 @6dp, r2_oof, rmse_oof @4dp).
    """
    feats = df.selectExpr(
        f"CAST({x1} AS {_DEC}) AS x1d",
        f"CAST({x2} AS {_DEC}) AS x2d",
        f"CAST({y} AS {_DEC}) AS yd",
        f"{fold_expr_spark(key_expr, k)} AS fold",
    )
    per = feats.groupBy("fold").agg(
        F.count(F.lit(1)).cast("double").alias("fn"),
        *[
            F.expr(f"SUM({e})").alias(f"f_{m}")
            for m, e in OLS2_MOMENT_EXPRS.items()
        ],
    # the k-row moment table feeds BOTH the totals and the train stage;
    # without truncation each branch re-runs the corpus aggregation
    # (the factorization localCheckpoint pattern — materialized state is
    # k rows of moments)
    ).localCheckpoint(eager=True)
    tot = per.agg(
        F.sum("fn").alias("tn"),
        *[F.sum(f"f_{m}").alias(f"t_{m}") for m in OLS2_MOMENT_EXPRS],
    )
    train = per.crossJoin(F.broadcast(tot)).selectExpr(
        "fold",
        "tn - fn AS n",
        "fn AS n_test_d",
        *[f"{dec2dbl_sql(f't_{m} - f_{m}')} AS {m}" for m in OLS2_MOMENT_EXPRS],
        *[f"{dec2dbl_sql(f'f_{m}')} AS tf_{m}" for m in OLS2_MOMENT_EXPRS],
    )
    fitted = train.selectExpr(
        "*", f"{OLS2_B0} AS b0", f"{OLS2_B1} AS b1", f"{OLS2_B2} AS b2"
    )
    test = fitted.selectExpr(
        "fold",
        "b0", "b1", "b2",
        "CAST(n AS BIGINT) AS n_train",
        "CAST(n_test_d AS BIGINT) AS n_test",
        "n_test_d AS n",
        *[f"tf_{m} AS {m}" for m in OLS2_MOMENT_EXPRS],
    )
    return test.selectExpr(
        "fold",
        "n_train",
        "n_test",
        "ROUND(b0, 6) + 0 AS b0",
        "ROUND(b1, 6) + 0 AS b1",
        "ROUND(b2, 6) + 0 AS b2",
        f"ROUND(1.0 - {OLS2_SSE} / {OLS2_SST}, 4) + 0 AS r2_oof",
        # GREATEST(·, 0): on an exactly-linear fold the SSE identity
        # cancels to ~±1e-9 in doubles; a tiny negative would sqrt to NaN
        f"ROUND(sqrt(GREATEST({OLS2_SSE}, 0.0) / n), 4) AS rmse_oof",
    )
