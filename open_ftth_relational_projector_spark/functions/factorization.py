"""Low-rank latent-factor scoring via alternating power iteration.

The simplest members of the matrix-factorization family used on interaction
data (user×item purchase counts, doc×domain co-occurrence): alternating
power iteration on the ratings matrix R converges to the dominant singular
pair, giving every row and column a latent "affinity" score — the
collaborative signal behind item similarity and data-mixture weighting.
``power_iteration_rank2`` adds the second component by IMPLICIT deflation:
R₂ = R − σ₁u₁v₁ᵀ is never materialized (it is dense); instead each
matrix-vector product applies the rank-1 correction as
R₂y = Ry − σ₁·u₁·(v₁ᵀy), one broadcast scalar + one keyed join — the trick
that keeps deflation linear in nnz(R) at any scale.

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
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
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


def power_iteration_rank2(
    ratings: DataFrame,
    row_col: str = "row_id",
    col_col: str = "col_id",
    value_col: str = "rating",
    iters: int = 3,
    iter_dp: int = 10,
) -> tuple[DataFrame, DataFrame]:
    """First TWO singular components via implicit deflation.

    Returns ``(row_factors, col_factors)``: DataFrames
    ``(row_col, component int, factor double)`` with component 1 the
    rank-1 result and component 2 the dominant direction of
    R − σ₁u₁v₁ᵀ, iterated from y = 1⃗ with the same per-half-step
    normalize+round contract. σ₁ is estimated as u₁ᵀRv₁ (a single scalar
    aggregate). The deflated matrix is never materialized: each half-step
    computes Ry (keyed join + groupBy) minus σ₁·u₁·(v₁ᵀy) (two broadcast
    scalars applied along the component-1 factor). Component-2 values can
    be negative; sign is deterministic because the start vector and every
    rounding step are.
    """
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    r = (
        ratings.select(
            F.col(row_col).alias("_r"),
            F.col(col_col).alias("_c"),
            F.col(value_col).cast("double").alias("_w"),
        )
        .localCheckpoint(eager=True)
    )
    u1 = r.select("_r").distinct().withColumn("_f", F.lit(1.0))
    v1 = None
    for _ in range(iters):
        v1 = _half_step(r, u1, "_r", "_c", iter_dp)
        u1 = _half_step(r, v1, "_c", "_r", iter_dp)
    sig = (
        r.join(u1.select("_r", F.col("_f").alias("_g")), "_r")
        .join(v1.select("_c", F.col("_f").alias("_h")), "_c")
        .agg(F.sum(F.col("_w") * F.col("_g") * F.col("_h")).alias("_s1"))
        # computed once: every deflated half-step broadcasts this scalar,
        # and without the checkpoint each of the 2·iters steps would
        # re-evaluate the three-way join-aggregate over R
        .localCheckpoint(eager=True)
    )
    y = r.select("_r").distinct().withColumn("_f", F.lit(1.0))
    x = None
    for _ in range(iters):
        x = _deflated_half_step(r, y, u1, v1, sig, "_r", "_c", iter_dp)
        y = _deflated_half_step(r, x, v1, u1, sig, "_c", "_r", iter_dp)
    row_factors = (
        u1.select(F.col("_r").alias(row_col), F.lit(1).alias("component"),
                  F.col("_f").alias("factor"))
        .unionByName(
            y.select(F.col("_r").alias(row_col), F.lit(2).alias("component"),
                     F.col("_f").alias("factor"))
        )
    )
    col_factors = (
        v1.select(F.col("_c").alias(col_col), F.lit(1).alias("component"),
                  F.col("_f").alias("factor"))
        .unionByName(
            x.select(F.col("_c").alias(col_col), F.lit(2).alias("component"),
                     F.col("_f").alias("factor"))
        )
    )
    return row_factors, col_factors


def _deflated_half_step(
    r: DataFrame,
    fac: DataFrame,
    par1: DataFrame,
    out1: DataFrame,
    sig: DataFrame,
    join_key: str,
    out_key: str,
    iter_dp: int,
) -> DataFrame:
    """One deflated matrix-vector product: (R − σ₁u₁v₁ᵀ)ᵀ·fac along one side.

    ``par1``/``out1`` are the component-1 factors on the join/output side.
    raw(out) = Σ_join w·f  −  σ₁ · out1(out) · (par1ᵀ·fac); the overlap
    par1ᵀ·fac and σ₁ are scalar aggregates broadcast back, and out1 (which
    spans the FULL output-key support, unlike the join aggregate when fac
    has exact zeros) anchors a left join so no key drops out.
    """
    overlap = (
        fac.join(par1.select(join_key, F.col("_f").alias("_g")), join_key)
        .agg(F.sum(F.col("_f") * F.col("_g")).alias("_d"))
    )
    base = (
        r.join(fac.select(join_key, "_f"), join_key)
        .groupBy(out_key)
        .agg(F.sum(F.col("_w") * F.col("_f")).alias("_s0"))
    )
    raw = (
        out1.select(out_key, F.col("_f").alias("_g"))
        .join(base, out_key, "left")
        .crossJoin(F.broadcast(sig))
        .crossJoin(F.broadcast(overlap))
        .select(
            out_key,
            (
                F.coalesce(F.col("_s0"), F.lit(0.0))
                - F.col("_s1") * F.col("_g") * F.col("_d")
            ).alias("_s"),
        )
    )
    nrm = raw.agg(F.sqrt(F.sum(F.col("_s") * F.col("_s"))).alias("_n"))
    return (
        raw.crossJoin(F.broadcast(nrm))
        .select(out_key, F.round(F.col("_s") / F.col("_n"), iter_dp).alias("_f"))
        .localCheckpoint(eager=True)
    )
