"""Isotonic (PAV) calibration over a bounded score-bucket table.

The standard monotone-calibration step between a trained quality
classifier and its filtering threshold: given per-bucket (n, n_pos)
counts over an ordered score axis, fit the best monotone non-decreasing
rate per bucket (the pool-adjacent-violators solution) so thresholds cut
on calibrated probabilities instead of raw per-bucket rates.

PAV is inherently sequential, but on a BOUNDED bucket axis (the decile
table of catalog/analytics.logreg_score_histogram — ≤ 11 rows; any
fixed-resolution score lattice) the closed-form minimax identity is a
plain join+group-by program:

    iso(i) = max_{j ≤ i} min_{k ≥ i} mean(y over buckets j..k)

— O(B³) joined rows over a B-row frame, evaluated entirely engine-side
with NO window functions (no global-window exemption needed) and no
driver logic. The corpus-scale work (scoring + bucket counts) stays the
classifier's one map-only pass; calibration runs on the tiny result.

Determinism: segment means are ONE correctly-rounded division of exact
integers (identical doubles on both engines), MIN/MAX compare identical
doubles, and the 6-dp output ROUND is the established pin. No
transcendentals, no iteration — bit-identical cross-engine by
construction.

Reference parity note: extension family (README "LLM-pipeline surface"),
no counterpart in the reference engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

ISO_MEAN_SQL = "CAST(seg_np AS DOUBLE) / CAST(seg_n AS DOUBLE)"

# The O(B²)-segment / O(B³)-join program below is priced for BOUNDED
# bucket axes (deciles, fixed lattices). This cap makes that contract
# structural (the degeneracy-guard treatment: one bounded probe, named
# failure) instead of caller-guaranteed — a corpus-scale score table can
# never reach the cubic joins silently. 1,024 buckets ≈ 10⁹ joined rows,
# the documented worst case a single executor still absorbs.
PAV_MAX_BUCKETS = 1024


def pav_isotonic(
    dec: DataFrame, d: str = "p_decile", n: str = "n_docs",
    npos: str = "n_pos",
) -> DataFrame:
    """Fit the isotonic rate per bucket of an ordered count table
    ``(d, n, npos)``. Returns (d, n, npos, raw_rate, iso_rate) — both
    rates @6dp; iso_rate is monotone non-decreasing in d and averages
    raw rates over each violating pool (the PAV solution via the
    minimax identity). Intended for BOUNDED bucket axes (deciles /
    fixed lattices): the segment enumeration is O(B²) rows and the
    argmin/argmax O(B³) joined rows, all engine-side."""
    base = dec.selectExpr(
        f"{d} AS d", f"CAST({n} AS BIGINT) AS n",
        f"CAST({npos} AS BIGINT) AS np",
    )
    # bounded-axis guard: probe at most cap+1 bucket rows (the limit()
    # bounds the collect regardless of the caller's frame size)
    probe = base.select("d").limit(PAV_MAX_BUCKETS + 1).collect()
    if len(probe) > PAV_MAX_BUCKETS:
        raise ValueError(
            f"pav_isotonic: bucket axis exceeds {PAV_MAX_BUCKETS} rows — "
            "the minimax-identity program enumerates O(B²) segments and "
            "O(B³) joined rows, which is only priced for bounded score "
            "lattices (deciles / fixed grids). Aggregate the score table "
            "to a bounded bucket axis first."
        )
    j = base.selectExpr("d AS j")
    k = base.selectExpr("d AS k")
    m = base.selectExpr("d AS md", "n AS mn", "np AS mnp")
    seg = (
        j.join(k, F.expr("j <= k"))
        .join(m, F.expr("md BETWEEN j AND k"))
        .groupBy("j", "k")
        .agg(
            F.expr("CAST(SUM(mn) AS BIGINT)").alias("seg_n"),
            F.expr("CAST(SUM(mnp) AS BIGINT)").alias("seg_np"),
        )
        .selectExpr("j", "k", f"{ISO_MEAN_SQL} AS seg_mean")
    )
    inner = (
        base.select("d")
        .join(seg, F.expr("j <= d AND k >= d"))
        .groupBy("d", "j")
        .agg(F.expr("MIN(seg_mean)").alias("min_mean"))
        .groupBy("d")
        .agg(F.expr("MAX(min_mean)").alias("iso"))
    )
    return (
        base.join(inner, "d")
        .selectExpr(
            f"d AS {d}",
            f"n AS {n}",
            f"np AS {npos}",
            "ROUND(CAST(np AS DOUBLE) / CAST(n AS DOUBLE), 6) AS raw_rate",
            "ROUND(iso, 6) AS iso_rate",
        )
        .orderBy(d)
    )


def pav_isotonic_sql(
    dec_cte: str, d: str = "p_decile", n: str = "n_docs",
    npos: str = "n_pos",
) -> str:
    """The oracle twin of pav_isotonic: SQL text computing the same
    program over a CTE named ``dec_cte`` with columns (d, n, npos) —
    the same joins, the same one-division mean, the same pins."""
    return f"""
    base AS (SELECT {d} AS d, CAST({n} AS BIGINT) AS n,
                    CAST({npos} AS BIGINT) AS np FROM {dec_cte}),
    seg AS (SELECT j.d AS j, k.d AS k,
                   CAST(SUM(m.n) AS BIGINT) AS seg_n,
                   CAST(SUM(m.np) AS BIGINT) AS seg_np
            FROM base j JOIN base k ON j.d <= k.d
            JOIN base m ON m.d BETWEEN j.d AND k.d
            GROUP BY j.d, k.d),
    segm AS (SELECT j, k, {ISO_MEAN_SQL} AS seg_mean FROM seg),
    inner1 AS (SELECT b.d, s.j, MIN(s.seg_mean) AS min_mean
               FROM base b JOIN segm s ON s.j <= b.d AND s.k >= b.d
               GROUP BY b.d, s.j),
    isofit AS (SELECT d, MAX(min_mean) AS iso FROM inner1 GROUP BY d)
    SELECT base.d AS {d}, n AS {n}, np AS {npos},
           ROUND(CAST(np AS DOUBLE) / CAST(n AS DOUBLE), 6) AS raw_rate,
           ROUND(iso, 6) AS iso_rate
    FROM base JOIN isofit ON base.d = isofit.d
    ORDER BY 1"""
