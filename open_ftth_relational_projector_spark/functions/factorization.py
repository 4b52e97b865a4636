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

Determinism contract (EXACT, upgraded in round 8): the factor vector is
carried as an integer-scaled BIGINT ``fi = round(f · 10^iter_dp)`` and the
ratings weight as an exact BIGINT, so every aggregation in the iteration —
the matrix-vector products, the L2 norm squares, σ₁ and the deflation
overlaps — sums EXACT integers (widened to DECIMAL, which is
summation-order-independent). The only floating-point arithmetic is the
final normalize ratio per half-step, evaluated on identical inputs with
identical shared expression text, so every iterate is bit-identical
cross-engine AND across Spark partial-aggregation orders. The previous
contract (round the double factor to 10 dp each half-step, like
functions/graph.pagerank) only bounded drift probabilistically: a
double-sum ulp difference landing within an ulp of a rounding boundary
escaped the pin — the r8 bit-level sweep caught exactly one such escape
(latent_rank2_affinity at sf0.1). Integer state closes the class.

Exactness bounds (loud, not silent, on violation — DECIMAL overflow raises
in DuckDB and nulls the aggregate in Spark, failing any differential
check): with integer weights ≤ W and ≤ n_k matrix rows joined per output
key, the matvec sum needs W·n_k < 10^(19−iter_dp) for its DECIMAL(19,0)
norm-stage downcast (catalog scale: W ≈ 3·10², n_k ≤ 10⁵ at 100× — five
orders of margin at iter_dp=10, where the bound is 10⁹); norm-square sums
stay under DECIMAL(38,0) for raw values below ~10⁷·10^iter_dp.

Scale shape: each half-iteration is one join keyed on the ratings matrix's
row (or column) key + one map-side-combined groupBy — both linear in
nnz(R); the L2 norm (like σ₁ and the deflation overlaps) is a 1-row
scalar aggregate COLLECTED to the driver and embedded as an exact double
literal (NO ``OVER ()`` window; r13 — the previous crossJoin(broadcast)
scalar pattern cost one extra serial job per half-step). R, the chain
inits and the chain FINALS are localCheckpoint'd so plans stay flat and
the per-step raw aggregates can unpersist (see _half_step); intermediate
iterates stay lazy projections over their persisted raw. On a cluster,
pre-partitioning/bucketing R by its join keys lets every iteration reuse
one partitioning.

Because R is non-negative and the row factor starts at all-ones, every
intermediate value stays non-negative (Perron-Frobenius) — the usual SVD
sign ambiguity cannot appear, so results are comparable across engines
without sign fixups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from open_ftth_relational_projector_spark.functions.similarity import _d


def _scale(iter_dp: int) -> str:
    """The factor scale 10^iter_dp as shared literal text (1e10 etc.)."""
    return f"1e{iter_dp}"


def matvec_sum_sql(w: str, fi: str) -> str:
    """Exact matrix-vector partial: Σ w·fi as DECIMAL(38,0) — identical
    text on both engines; the BIGINT product is exact (w·fi ≤ W·10^dp,
    far under 2^63 at the documented bounds) and the DECIMAL sum is
    order-independent."""
    return f"SUM(CAST({w} * {fi} AS DECIMAL(38,0)))"


def normsq_sum_sql(s: str) -> str:
    """Exact Σ s² over the integer matvec results (DECIMAL(19,0) downcast
    pins the documented range bound loudly; the (19,0)×(19,0) product is
    DECIMAL(38,0)-exact on both engines)."""
    return (
        f"SUM(CAST({s} AS DECIMAL(19,0)) * CAST({s} AS DECIMAL(19,0)))"
    )


def dot_sum_sql(a: str, b: str) -> str:
    """Exact Σ a·b for two integer-scaled factor columns (each ≤ 10^dp:
    the (19,0)×(19,0) product is exact)."""
    return f"SUM(CAST({a} AS DECIMAL(19,0)) * CAST({b} AS DECIMAL(19,0)))"


def dec2dbl_expr(expr: str) -> str:
    """Correctly-rounded DECIMAL→DOUBLE, shared text (see
    functions/regression.dec2dbl_sql for the double-rounding rationale)."""
    return f"CAST(CAST({expr} AS STRING) AS DOUBLE)"


def repin_sql(x_dbl: str, iter_dp: int) -> str:
    """Deterministic double → integer factor state: round half-away at
    10^-iter_dp and store the scaled BIGINT (ROUND(x, 0) rounds half away
    from zero on both engines; the cast is exact below 2^63)."""
    return f"CAST(ROUND(({x_dbl}) * {_scale(iter_dp)}, 0) AS BIGINT)"


def fi_to_f_sql(fi: str, iter_dp: int) -> str:
    """Integer factor state → its exact double value (fi ≤ 10^iter_dp is
    exactly representable; the division by a power of ten is one
    deterministic IEEE rounding, identical on both engines)."""
    return f"(CAST({fi} AS DOUBLE) / {_scale(iter_dp)})"


def power_iteration_factors(
    ratings: DataFrame,
    row_col: str = "row_id",
    col_col: str = "col_id",
    value_col: str = "rating",
    iters: int = 3,
    iter_dp: int = 10,
    weight_dp: int = 2,
) -> tuple[DataFrame, DataFrame]:
    """Alternating rank-1 power iteration over a sparse ratings matrix.

    ``value_col`` must be exact at ``weight_dp`` decimals (the exactness
    contract — the integer weight state is round(w·10^weight_dp); the
    catalog's integer quantity sums satisfy any weight_dp). The rank-1
    normalize ratio cancels the weight scale, so weight_dp only widens
    the intermediate bounds. Returns ``(row_factors, col_factors)``:
    DataFrames ``(row_col, factor double)`` / ``(col_col, factor double)``,
    each an L2-unit vector at 10^-iter_dp resolution (the dominant
    left/right singular directions of R after ``iters`` alternations from
    u = 1⃗).
    """
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    r = (
        ratings.selectExpr(
            f"{row_col} AS _r",
            f"{col_col} AS _c",
            f"CAST(ROUND({value_col} * 1e{weight_dp}, 0) AS BIGINT) AS _wi",
        )
        .localCheckpoint(eager=True)
    )
    one = 10**iter_dp
    u = r.select("_r").distinct().withColumn("_fi", F.expr(f"CAST({one} AS BIGINT)"))
    v = None
    raws: list[DataFrame] = []
    for _ in range(iters):
        v, rw = _half_step(r, u, "_r", "_c", iter_dp)
        raws.append(rw)
        u, rw = _half_step(r, v, "_c", "_r", iter_dp)
        raws.append(rw)
    # the finals outlive this function (the caller's action runs later):
    # pin them flat, THEN release every half-step's raw aggregate — a
    # lazy final over an unpersisted raw chain would recompute the whole
    # iteration per consumer reference.
    u = u.localCheckpoint(eager=True)
    v = v.localCheckpoint(eager=True)
    for rw in raws:
        rw.unpersist(False)
    row_factors = u.selectExpr(
        f"_r AS {row_col}", f"{fi_to_f_sql('_fi', iter_dp)} AS factor"
    )
    col_factors = v.selectExpr(
        f"_c AS {col_col}", f"{fi_to_f_sql('_fi', iter_dp)} AS factor"
    )
    return row_factors, col_factors


def _scalar_lit(n_val: float | None) -> str:
    """A collected double scalar (norm / σ₁ / overlap) as exact SQL
    literal text. None (empty
    input) renders as a NULL double — the same NULL the broadcast-column
    form produced, so downstream arithmetic is unchanged."""
    return "CAST(NULL AS DOUBLE)" if n_val is None else _d(n_val)


def _half_step(
    r: DataFrame, fac: DataFrame, join_key: str, out_key: str, iter_dp: int
) -> tuple[DataFrame, DataFrame]:
    """One matrix-vector product + L2 normalization + integer re-pin.

    raw(out) = Σ_join w·fi — one keyed join + one map-side-combined
    groupBy, EXACT (decimal sum of integer products). The L2 norm is
    collected as ONE bounded scalar and embedded as an exactly-rendered
    double literal (``_d``: repr round-trip + Catalyst's correctly-
    rounded parse — bit-identical to the broadcast-column form it
    replaces, pinned by the r12 literal-parity test). The normalize
    ratio is the only double arithmetic: scales cancel (both numerator
    and norm carry 10^iter_dp), and the result re-pins to integer state.

    Returns ``(out, raw)``: ``out`` is a LAZY single projection over the
    persisted ``raw`` aggregate; the caller unpersists ``raw`` once the
    chain's finals are checkpointed. r13 (guide §1.2 / §7.3, r12 verdict
    #7 job sequencing): the previous form ran TWO serial job barriers
    per half-step — a broadcast-norm sub-job plus an eager
    localCheckpoint of the normalized vector. The norm collect is now
    the only job (it materializes ``raw`` into cache as a byproduct);
    the next half-step's broadcast build reads the cached ``raw``
    through the lazy projection. 13 half-steps per rank-2 extraction ⇒
    13 fewer serial jobs and 13 fewer materialization passes.
    """
    # `raw` is referenced TWICE (norm collect + value branch): the
    # persist keeps the matvec join executing ONCE per half-step (its
    # parents are checkpointed, so the lineage stays flat).
    # r12: pin the factor vector as the broadcast side of the matvec join
    # (guide §3.1 "pick the strategy deliberately"). At catalog scale the
    # planner already picks BroadcastHashJoin(BuildRight) from the
    # checkpointed RDD's origin-stats estimate — plan-identical, measured
    # neutral — but that choice is estimate-dependent: where the origin
    # stats are conservative (or absent) the fallback is a SortMergeJoin
    # that shuffles+sorts the nnz(R)-row ratings side EVERY half-step
    # (13 big-side shuffles per rank-2 extraction). The factor vector is
    # one integer row per key (the documented node-sized bound), so the
    # hint is always safe; the only remaining exchange is the map-side-
    # combined groupBy of the aggregated output. Join strategy cannot
    # change the result: the aggregate is an order-independent exact
    # decimal sum. Past the broadcast cap (~billions of keys) switch to a
    # bucketed/shuffled-hash layout of R instead.
    raw = (
        r.join(F.broadcast(fac.select(join_key, "_fi")), join_key)
        .groupBy(out_key)
        .agg(F.expr(matvec_sum_sql("_wi", "_fi")).alias("_s"))
        .persist()
    )
    # bounded collect: ONE double (the half-step norm), same expression
    # text the broadcast-column form evaluated
    n_val = raw.agg(
        F.expr(f"SQRT({dec2dbl_expr(normsq_sum_sql('_s'))})").alias("_n")
    ).collect()[0]["_n"]
    out = raw.selectExpr(
        out_key,
        f"{repin_sql(dec2dbl_expr('_s') + ' / ' + _scalar_lit(n_val), iter_dp)}"
        " AS _fi",
    )
    return out, raw


def power_iteration_rank2(
    ratings: DataFrame,
    row_col: str = "row_id",
    col_col: str = "col_id",
    value_col: str = "rating",
    iters: int = 3,
    iter_dp: int = 10,
    weight_dp: int = 2,
) -> tuple[DataFrame, DataFrame]:
    """First TWO singular components via implicit deflation.

    Returns ``(row_factors, col_factors)``: DataFrames
    ``(row_col, component int, factor double)`` with component 1 the
    rank-1 result and component 2 the dominant direction of
    R − σ₁u₁v₁ᵀ, iterated from y = 1⃗ with the same exact-integer
    normalize+re-pin contract. σ₁ is estimated as u₁ᵀRv₁ (a single exact
    scalar aggregate). The deflated matrix is never materialized: each
    half-step computes Ry (keyed join + groupBy, exact) minus
    σ₁·u₁·(v₁ᵀy) (two broadcast scalars applied along the component-1
    factor — the one double-arithmetic combination, re-pinned to integer
    state before its norm so the norm sum is exact again). Component-2
    values can be negative; sign is deterministic because the start vector
    and every re-pin are.
    """
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    r = (
        ratings.selectExpr(
            f"{row_col} AS _r",
            f"{col_col} AS _c",
            f"CAST(ROUND({value_col} * 1e{weight_dp}, 0) AS BIGINT) AS _wi",
        )
        .localCheckpoint(eager=True)
    )
    one = 10**iter_dp
    # one all-ones init, materialized once and shared by BOTH chains
    # (r13: the u-chain and the deflated y-chain previously each ran the
    # same distinct shuffle)
    init = (
        r.select("_r")
        .distinct()
        .withColumn("_fi", F.expr(f"CAST({one} AS BIGINT)"))
        .localCheckpoint(eager=True)
    )
    u1 = init
    v1 = None
    raws: list[DataFrame] = []
    for _ in range(iters):
        v1, rw = _half_step(r, u1, "_r", "_c", iter_dp)
        raws.append(rw)
        u1, rw = _half_step(r, v1, "_c", "_r", iter_dp)
        raws.append(rw)
    # u1/v1 anchor σ, every deflated half-step, and the final output —
    # pin them flat so the rank-1 raws can release now
    u1 = u1.localCheckpoint(eager=True)
    v1 = v1.localCheckpoint(eager=True)
    for rw in raws:
        rw.unpersist(False)
    raws = []
    # σ₁ = u₁ᵀRv₁: w·ui fits BIGINT exactly (≤ W·10^dp), the second
    # product widens to DECIMAL — exact, order-independent; the scalar
    # carries scale 10^(2·dp). Collected once as a bounded 1-row scalar
    # and embedded as an exact literal in every deflated half-step (r13:
    # previously a checkpointed 1-row frame crossJoin-broadcast per step
    # — one checkpoint job + 6 broadcast builds removed).
    s1_val = (
        r.join(F.broadcast(u1.selectExpr("_r", "_fi AS _gi")), "_r")
        .join(F.broadcast(v1.selectExpr("_c", "_fi AS _hi")), "_c")
        .agg(
            F.expr(
                f"{dec2dbl_expr(dot_sum_sql('_wi * _gi', '_hi'))}"
                f" / 1e{2 * iter_dp + weight_dp}"
            ).alias("_s1")
        )
        .collect()[0]["_s1"]
    )
    y = init
    x = None
    for _ in range(iters):
        x, rw = _deflated_half_step(
            r, y, u1, v1, s1_val, "_r", "_c", iter_dp, weight_dp
        )
        raws.append(rw)
        y, rw = _deflated_half_step(
            r, x, v1, u1, s1_val, "_c", "_r", iter_dp, weight_dp
        )
        raws.append(rw)
    x = x.localCheckpoint(eager=True)
    y = y.localCheckpoint(eager=True)
    for rw in raws:
        rw.unpersist(False)
    f_out = fi_to_f_sql("_fi", iter_dp)
    row_factors = (
        u1.selectExpr(f"_r AS {row_col}", "1 AS component", f"{f_out} AS factor")
        .withColumn("component", F.col("component").cast("int"))
        .unionByName(
            y.selectExpr(
                f"_r AS {row_col}", "2 AS component", f"{f_out} AS factor"
            ).withColumn("component", F.col("component").cast("int"))
        )
    )
    col_factors = (
        v1.selectExpr(f"_c AS {col_col}", "1 AS component", f"{f_out} AS factor")
        .withColumn("component", F.col("component").cast("int"))
        .unionByName(
            x.selectExpr(
                f"_c AS {col_col}", "2 AS component", f"{f_out} AS factor"
            ).withColumn("component", F.col("component").cast("int"))
        )
    )
    return row_factors, col_factors


def deflated_raw_sql(
    s0: str, s1: str, gi: str, d: str, iter_dp: int, weight_dp: int
) -> str:
    """The deflated raw value as shared double text:
    base/scale − σ₁·g·overlap, with base NULL-coalesced to 0 (an output
    key can miss the join when fac has exact zeros). The base matvec
    carries scale 10^(iter_dp + weight_dp); σ₁ and the overlap arrive
    already de-scaled."""
    return (
        f"(COALESCE({dec2dbl_expr(s0)}, 0.0) / 1e{iter_dp + weight_dp}"
        f" - {s1} * {fi_to_f_sql(gi, iter_dp)} * {d})"
    )


def _deflated_half_step(
    r: DataFrame,
    fac: DataFrame,
    par1: DataFrame,
    out1: DataFrame,
    s1_val: float | None,
    join_key: str,
    out_key: str,
    iter_dp: int,
    weight_dp: int,
) -> tuple[DataFrame, DataFrame]:
    """One deflated matrix-vector product: (R − σ₁u₁v₁ᵀ)ᵀ·fac along one side.

    ``par1``/``out1`` are the component-1 factors on the join/output side.
    raw(out) = Σ_join w·f  −  σ₁ · out1(out) · (par1ᵀ·fac); σ₁ arrives as
    a driver scalar and the overlap par1ᵀ·fac is collected the same way —
    both embed as exactly-rendered double literals (bit-identical to the
    broadcast-column forms they replace), and out1 (which spans the FULL
    output-key support, unlike the join aggregate when fac has exact
    zeros) anchors a left join so no key drops out. The raw combination
    is double arithmetic on deterministic inputs; it re-pins to integer
    state (``_si``) BEFORE the norm, so the norm sum is exact.

    Returns ``(out, raw)`` with the same lazy-out/persisted-raw contract
    as ``_half_step`` (r13: the per-step norm-broadcast sub-job and the
    eager localCheckpoint are gone — serial barriers per deflated step
    drop from ~4 to 2: the overlap collect and the norm collect, the
    latter materializing ``raw`` and building the base broadcast as
    sub-work).
    """
    # bounded collect: ONE double (the deflation overlap par1ᵀ·fac)
    d_val = (
        fac.join(F.broadcast(par1.selectExpr(join_key, "_fi AS _gi")), join_key)
        .agg(
            F.expr(
                f"{dec2dbl_expr(dot_sum_sql('_fi', '_gi'))} / 1e{2 * iter_dp}"
            ).alias("_d")
        )
        .collect()[0]["_d"]
    )
    # pin the factor vector as the broadcast side (same deliberate-strategy
    # rationale as _half_step: estimate-dependent fallback would shuffle
    # the nnz(R) side per half-step)
    base = (
        r.join(F.broadcast(fac.select(join_key, "_fi")), join_key)
        .groupBy(out_key)
        .agg(F.expr(matvec_sum_sql("_wi", "_fi")).alias("_s0"))
    )
    # `raw` feeds both the norm collect and the value branch; the persist
    # keeps the base matvec join executing once per half-step.
    raw = (
        out1.selectExpr(out_key, "_fi AS _gi")
        .join(F.broadcast(base), out_key, "left")
        .selectExpr(
            out_key,
            f"{repin_sql(deflated_raw_sql('_s0', _scalar_lit(s1_val), '_gi', _scalar_lit(d_val), iter_dp, weight_dp), iter_dp)}"
            " AS _si",
        )
        .persist()
    )
    n_val = raw.agg(
        F.expr(f"SQRT({dec2dbl_expr(normsq_sum_sql('_si'))})").alias("_n")
    ).collect()[0]["_n"]
    out = raw.selectExpr(
        out_key,
        f"{repin_sql(dec2dbl_expr('_si') + ' / ' + _scalar_lit(n_val), iter_dp)}"
        " AS _fi",
    )
    return out, raw
