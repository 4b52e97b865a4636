"""Rank-1 latent-factor scoring via alternating power iteration.

The simplest member of the matrix-factorization family used on interaction
data (user×item purchase counts, doc×domain co-occurrence): alternating
power iteration on the ratings matrix R converges to the dominant singular
pair, giving every row and column a latent "affinity" score — the
collaborative signal behind item similarity and data-mixture weighting.

Determinism contract (same as functions/graph.pagerank and
functions/clustering.kmeans_fit): both factor vectors are L2-normalized and
ROUNDED to ``iter_dp`` decimals after every half-iteration, so ulp-level
float-sum ordering differences between engines (or between Spark partial
aggregation orders) cannot compound across iterations and an unrolled SQL
oracle hash-matches.

Scale shape: each half-iteration is one join keyed on the ratings matrix's
row (or column) key + one map-side-combined groupBy — both linear in
nnz(R); the L2 norm is a scalar aggregate broadcast back (the q20
scalar-agg + crossJoin(broadcast) pattern — NO ``OVER ()`` window). R and
each half-step's factor vector are localCheckpoint'd so the per-iteration
plans stay flat (see _half_step for why the plan would otherwise double
per half-step); on a cluster, pre-partitioning/bucketing R by its join
keys lets every iteration reuse one partitioning.

Because R is non-negative and the row factor starts at all-ones, every
intermediate value stays non-negative (Perron-Frobenius) — the usual SVD
sign ambiguity cannot appear, so results are comparable across engines
without sign fixups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def power_iteration_factors(
    ratings: DataFrame,
    row_col: str = "row_id",
    col_col: str = "col_id",
    value_col: str = "rating",
    iters: int = 3,
    iter_dp: int = 10,
) -> tuple[DataFrame, DataFrame]:
    """Alternating rank-1 power iteration over a sparse ratings matrix.

    Returns ``(row_factors, col_factors)``: DataFrames
    ``(row_col, factor double)`` / ``(col_col, factor double)``, each an
    L2-unit vector rounded to ``iter_dp`` (the dominant left/right singular
    directions of R after ``iters`` alternations from u = 1⃗).
    """
    r = (
        ratings.select(
            F.col(row_col).alias("_r"),
            F.col(col_col).alias("_c"),
            F.col(value_col).cast("double").alias("_w"),
        )
        .localCheckpoint(eager=True)
    )
    u = r.select("_r").distinct().withColumn("_f", F.lit(1.0))
    v = None
    for _ in range(iters):
        v = _half_step(r, u, "_r", "_c", iter_dp)
        u = _half_step(r, v, "_c", "_r", iter_dp)
    row_factors = u.select(F.col("_r").alias(row_col), F.col("_f").alias("factor"))
    col_factors = v.select(F.col("_c").alias(col_col), F.col("_f").alias("factor"))
    return row_factors, col_factors


def _half_step(
    r: DataFrame, fac: DataFrame, join_key: str, out_key: str, iter_dp: int
) -> DataFrame:
    """One matrix-vector product + L2 normalization + determinism rounding.

    raw(out) = Σ_join w·f  — one keyed join + one map-side-combined groupBy;
    the norm is a scalar aggregate joined back via crossJoin(broadcast).
    """
    raw = (
        r.join(fac.select(join_key, "_f"), join_key)
        .groupBy(out_key)
        .agg(F.sum(F.col("_w") * F.col("_f")).alias("_s"))
    )
    nrm = raw.agg(F.sqrt(F.sum(F.col("_s") * F.col("_s"))).alias("_n"))
    # localCheckpoint per half-step: `raw` is referenced TWICE (norm branch
    # + value branch), so without truncation the logical plan doubles every
    # half-step — 2^(2·iters) copies of the first join by the end. The
    # checkpoint keeps the plan flat (analyzer/optimizer cost linear in
    # iters); the materialized state is one factor vector, linear in the
    # matrix's row/col count — the standard iterative-DataFrame guard.
    return (
        raw.crossJoin(F.broadcast(nrm))
        .select(out_key, F.round(F.col("_s") / F.col("_n"), iter_dp).alias("_f"))
        .localCheckpoint(eager=True)
    )
