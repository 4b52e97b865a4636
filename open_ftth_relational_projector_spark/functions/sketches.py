"""Fixed-memory streaming sketches with exact self-verification.

Two sketch shapes a 100 TB pipeline leans on when exact state is too big:

  * count_min_heavy_hitters — Count-Min sketch (Cormode & Muthukrishnan
    2005): token frequencies folded into a d×w counter grid. The sketch is
    FIXED SIZE (d·w counters) and mergeable — at scale it replaces the
    unbounded token→count table; here it is built beside the exact counts
    so every run re-validates the structural guarantee est ≥ exact (a
    CMS never under-counts) on real data.

  * bloom_probe_decontamination — benchmark decontamination through a
    Bloom filter: eval-set shingles are folded into an n_bits bit set
    (fixed memory, BROADCAST to the corpus probe) instead of broadcasting
    the full shingle table. False positives possible (flagged docs may be
    clean), false negatives impossible — verified per doc against the
    exact overlap (functions/dedup.benchmark_decontamination's semantics).

Both use the md5-portable hash (dedup.portable_hash64) so a DuckDB oracle
replays the sketch bit-for-bit — the approximate path is hash-matched, not
just smoke-tested.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from open_ftth_relational_projector_spark.functions.dedup import (
    portable_hash64,
    shingles,
)
from open_ftth_relational_projector_spark.functions.text import tokens


# HyperLogLog layout shared by hll_distinct_rollup, the streaming register
# fold (streaming/stateful.streaming_hll_distinct) and both catalog oracles:
# portable_hash64 yields 60 uniform bits; the top HLL_P pick the register,
# the low HLL_REM_BITS feed rho.
HLL_P = 8
HLL_M = 1 << HLL_P  # 256 registers
HLL_REM_BITS = 60 - HLL_P
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)


def hdr_bucket_expr(v: str, k: int) -> str:
    """Spark SQL expression for the log-linear bucket id of column ``v``
    (a positive BIGINT): octave e = floor(log2 v) via the bin-string
    length, then k equal linear sub-buckets. ``k`` must be a power of two
    so the sub-bucket division can be a right-shift for large octaves —
    the naive ``((v - 2^e) * k) DIV 2^e`` overflows int64 once
    e + log2(k) >= 63 (v >= ~2^57 at k=64), silently corrupting buckets
    in non-ANSI arithmetic. For e >= log2(k) the shift form
    ``(v - 2^e) >> (e - log2 k)`` is exactly equal and cannot overflow;
    below that v < k so the multiply is tiny.

    Shared verbatim (text-identical semantics) with the DuckDB oracle
    builder catalog/sketches._hdr_bucket_sql — change them together.
    """
    if k <= 0 or k & (k - 1):
        raise ValueError(f"k must be a power of two, got {k}")
    lg = k.bit_length() - 1
    e = f"(length(bin({v})) - 1)"
    low = f"{v} - shiftleft(CAST(1 AS BIGINT), {e})"
    return (
        f"{e} * {k} + (CASE WHEN {e} >= {lg}"
        f" THEN shiftright({low}, {e} - {lg})"
        f" ELSE (({low}) * {k}) DIV shiftleft(CAST(1 AS BIGINT), {e}) END)"
    )


def count_min_heavy_hitters(
    docs: DataFrame,
    d: int = 4,
    w: int = 128,
    k: int = 20,
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` tokens by exact count, with their Count-Min estimate.

    Returns (token, exact_n, cms_n, overestimates) ordered by the exact
    count: cms_n = min over the d rows of the sketch counter the token
    hashes into; overestimates = cms_n ≥ exact_n, the CMS no-undercount
    invariant — structurally always TRUE, so the column is a live
    self-check the oracle pins every round.

    Scale shape: the sketch is ONE map-side-combined groupBy onto d·w
    cells — fixed-size state regardless of corpus size (this is what
    replaces the unbounded exact table at 100 TB). The exact counts here
    are the verifier; the top-k join touches k·d rows, broadcast.
    """
    toks = docs.select(F.explode(tokens(F.col(text_col))).alias("token"))
    seeds = list(range(d))
    cells = toks.select(
        "token",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("seed"),
                        F.pmod(
                            portable_hash64(F.col("token"), s), F.lit(w)
                        ).alias("bucket"),
                    )
                    for s in seeds
                ]
            )
        ).alias("sb"),
    ).select("token", F.col("sb.seed").alias("seed"), F.col("sb.bucket").alias("bucket"))
    sketch = cells.groupBy("seed", "bucket").agg(
        F.count(F.lit(1)).alias("cell_n")
    )
    exact = toks.groupBy("token").agg(F.count(F.lit(1)).alias("exact_n"))
    topk = exact.orderBy(
        F.col("exact_n").desc(), F.col("token").asc()
    ).limit(k)
    probes = topk.select(
        "token",
        "exact_n",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("seed"),
                        F.pmod(
                            portable_hash64(F.col("token"), s), F.lit(w)
                        ).alias("bucket"),
                    )
                    for s in seeds
                ]
            )
        ).alias("sb"),
    ).select(
        "token", "exact_n",
        F.col("sb.seed").alias("seed"), F.col("sb.bucket").alias("bucket"),
    )
    return (
        F.broadcast(probes)
        .join(sketch, ["seed", "bucket"])
        .groupBy("token", "exact_n")
        .agg(F.min("cell_n").alias("cms_n"))
        .select(
            "token",
            "exact_n",
            "cms_n",
            (F.col("cms_n") >= F.col("exact_n")).alias("overestimates"),
        )
    )


def bloom_probe_decontamination(
    docs: DataFrame,
    eval_mod: int = 50,
    n_bits: int = 16384,
    n_hashes: int = 3,
    n_shingle: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark decontamination probed through a Bloom filter.

    Eval set = docs with id % eval_mod == 0 (mirroring
    dedup.benchmark_decontamination). Their distinct ``n_shingle``-gram
    shingles fold into an ``n_bits`` Bloom bit set via ``n_hashes``
    md5-portable hash functions. Every train doc's shingles probe the
    filter; a shingle is bloom-positive iff ALL its bits are set.

    Returns per train doc: (doc_id, n_shingles, n_bloom_hits, n_true_hits,
    no_false_negatives) where n_true_hits is the exact eval overlap and
    no_false_negatives = n_bloom_hits ≥ n_true_hits — the Bloom guarantee,
    re-proved on data every run.

    Scale shape: the bit set is ≤ n_bits rows — FIXED memory, broadcast —
    where exact decontamination broadcasts the full eval shingle table
    (unbounded). The probe is explode → broadcast-join → per-shingle
    all-bits-present check → per-doc count: map-side except the final
    doc-keyed aggregation.
    """
    sh = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(shingles(F.col(text_col), n_shingle)).alias("shingle"),
    )
    eval_sh = sh.filter(F.col("doc_id") % eval_mod == 0).select(
        "shingle"
    ).distinct()
    train = sh.filter(F.col("doc_id") % eval_mod != 0)
    seeds = list(range(n_hashes))

    def bits_of(col):
        return F.array(
            *[F.pmod(portable_hash64(col, s), F.lit(n_bits)) for s in seeds]
        )

    bloom_bits = eval_sh.select(
        F.explode(bits_of(F.col("shingle"))).alias("bit")
    ).distinct()
    probe = train.select(
        "doc_id", "shingle", F.explode(bits_of(F.col("shingle"))).alias("bit")
    )
    per_shingle = (
        probe.join(
            F.broadcast(bloom_bits.withColumn("hit", F.lit(1))), "bit", "left"
        )
        .groupBy("doc_id", "shingle")
        .agg(
            (F.sum(F.coalesce(F.col("hit"), F.lit(0))) == n_hashes).alias(
                "bloom_pos"
            )
        )
    )
    true_hits = (
        train.join(
            F.broadcast(eval_sh.withColumn("t", F.lit(1))), "shingle", "left"
        )
        .groupBy("doc_id")
        .agg(F.sum(F.coalesce(F.col("t"), F.lit(0))).alias("n_true_hits"))
    )
    return (
        per_shingle.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_shingles"),
            F.sum(F.col("bloom_pos").cast("int")).cast("int").alias(
                "n_bloom_hits"
            ),
        )
        .join(true_hits, "doc_id")
        .select(
            "doc_id",
            "n_shingles",
            "n_bloom_hits",
            F.col("n_true_hits").cast("int").alias("n_true_hits"),
            (F.col("n_bloom_hits") >= F.col("n_true_hits")).alias(
                "no_false_negatives"
            ),
        )
    )


def kmv_distinct_rollup(
    df: DataFrame,
    group_col: str,
    sub_col: str,
    value_col: str,
    k: int = 64,
    seed: int = 7,
    pre_reduce_salt: int | None = None,
) -> DataFrame:
    """Mergeable k-minimum-values distinct-count sketches (Bar-Yossef et
    al. 2002 / the KMV estimator): one k-min sketch per (group, sub)
    cell, MERGED up to group level, estimate vs the exact distinct count.

    This is the pre-aggregated-sketch-table shape a 100 TB warehouse uses
    for COUNT DISTINCT rollups: daily sketches of ≤ k hashes each are
    stored once, and any coarser rollup (month, whole group, ad-hoc unions)
    re-aggregates the sketches WITHOUT touching raw data. The merge is
    lossless by construction — the k smallest hashes of a union are each
    the k smallest of their own cell — and the output carries a live
    ``merge_lossless`` self-check column comparing the merged sketch to a
    sketch built directly from raw values (count + max + sum equality),
    the same always-TRUE-by-theorem pattern as count_min_heavy_hitters'
    ``overestimates``.

    Estimator: with h uniform on [0, 2^60), est = (k−1)/u_k where
    u_k = (max kept hash + 0.5)/2^60; cells with fewer than k distinct
    values report their exact count. md5-portable hash → a DuckDB oracle
    replays the sketch (and the estimate) bit-for-bit.

    Scale shape: per-cell k-min is a window over the DISTINCT (group,
    sub, hash) rows — the sub granularity bounds each sort group; for
    skewed cells ``pre_reduce_salt`` first takes k-mins per (cell, hash %
    salt) so no single sort group exceeds ~|cell|/salt rows (k-min of
    per-salt k-mins is exactly the cell k-min, same mergeability
    argument). The group-level merge then sorts ≤ k·n_subs rows per
    group. The direct-sketch verifier column is the only part that
    windows raw cardinality at group grain — drop it in production.

    Returns (group_col, exact_distinct BIGINT, kmv_est DOUBLE(4dp),
    merge_lossless BOOLEAN).
    """
    from pyspark.sql import Window as W

    hv = portable_hash64(F.col(value_col), seed)
    h = (
        df.select(
            F.col(group_col).alias("g"), F.col(sub_col).alias("s"), hv.alias("hv")
        )
        .distinct()
    )
    if pre_reduce_salt:
        wsalt = W.partitionBy("g", "s", F.col("hv") % pre_reduce_salt).orderBy("hv")
        h = (
            h.withColumn("rn", F.row_number().over(wsalt))
            .filter(F.col("rn") <= k)
            .drop("rn")
        )
    wcell = W.partitionBy("g", "s").orderBy("hv")
    cellk = (
        h.withColumn("rn", F.row_number().over(wcell))
        .filter(F.col("rn") <= k)
        .select("g", "hv")
    )
    wg = W.partitionBy("g").orderBy("hv")
    merged = (
        cellk.distinct()
        .withColumn("rn", F.row_number().over(wg))
        .filter(F.col("rn") <= k)
    )
    direct = (
        df.select(F.col(group_col).alias("g"), hv.alias("hv"))
        .distinct()
        .withColumn("rn", F.row_number().over(wg))
        .filter(F.col("rn") <= k)
    )

    def sketch_stats(sk: DataFrame) -> DataFrame:
        return sk.groupBy("g").agg(
            F.count(F.lit(1)).alias("kn"),
            F.max("hv").alias("hk"),
            F.sum(F.col("hv").cast("decimal(38,0)")).alias("hs"),
        )

    ms, ds = sketch_stats(merged), sketch_stats(direct)
    exact = df.groupBy(F.col(group_col).alias("g")).agg(
        F.countDistinct(value_col).alias("exact_distinct")
    )
    u_k = (F.col("ms.hk").cast("double") + F.lit(0.5)) / F.lit(float(2**60))
    est = F.when(
        F.col("ms.kn") < k, F.col("ms.kn").cast("double")
    ).otherwise(F.lit(float(k - 1)) / u_k)
    return (
        ms.alias("ms")
        .join(ds.alias("ds"), "g")
        .join(exact, "g")
        .select(
            F.col("g").alias(group_col),
            F.col("exact_distinct").cast("long").alias("exact_distinct"),
            F.round(est, 4).alias("kmv_est"),
            (
                (F.col("ms.kn") == F.col("ds.kn"))
                & (F.col("ms.hk") == F.col("ds.hk"))
                & (F.col("ms.hs") == F.col("ds.hs"))
            ).alias("merge_lossless"),
        )
    )


def cms_join_size_estimate(
    a: DataFrame,
    a_key: str,
    b: DataFrame,
    b_key: str,
    d: int = 4,
    w: int = 256,
) -> DataFrame:
    """Equi-join cardinality pre-flight via Count-Min inner products
    (AMS/CMS join-size estimation, Alon-Matias-Szegedy 1996 / Cormode &
    Muthukrishnan 2005): |A ⋈ B| on a key is Σ_k nA(k)·nB(k); each side
    folds into a d×w counter grid, the per-row grid inner products
    estimate the sum, and min over the d rows is the estimate. A CMS
    inner product never UNDER-estimates (colliding keys only add cross
    terms), so the planner-facing guarantee — safe as an upper-bound
    admission check before running a possibly-exploding join — is carried
    as a live ``overestimates`` column verified against the exact size
    every run, the same theorem-as-column pattern as
    count_min_heavy_hitters.

    The grids are 2·d·w counters from one map-side-combined groupBy per
    side — fixed memory at any scale, and mergeable across partitions/
    days like every sketch in this module. The exact verifier (per-key
    count join) is the part to drop at 100 TB. md5-portable buckets → the
    oracle replays grids, inner products, and the min bit-for-bit.

    Returns one row: (exact_size BIGINT, cms_est BIGINT, overestimates
    BOOLEAN).
    """
    seeds = F.array(*[F.lit(s) for s in range(d)])

    def counts(df: DataFrame, key: str, name: str) -> DataFrame:
        return (
            df.select(F.col(key).cast("string").alias("k"))
            .filter(F.col("k").isNotNull())
            .groupBy("k")
            .agg(F.count(F.lit(1)).alias(name))
        )

    def grid(cnt: DataFrame, name: str) -> DataFrame:
        # The grid cell is Σ n(k) over keys hashing to the cell, so it can
        # be built from the per-key COUNTS instead of the raw rows: the md5
        # work drops from O(rows·d) to O(distinct keys·d) and the fact
        # table is scanned once per side for both the grid and the exact
        # verifier (the counts aggregate is the shared subplan — Spark's
        # exchange reuse feeds both consumers from one shuffle when it
        # fires, and even when it re-runs, the re-run is the cheap
        # counts→grid leg, not the fact scan's md5-per-row of the old
        # row-level formulation).
        return (
            cnt.withColumn("seed", F.explode(seeds))
            .select(
                "seed",
                (
                    F.conv(
                        F.substring(
                            F.md5(F.concat_ws("#", F.col("k"), F.col("seed"))),
                            1,
                            15,
                        ),
                        16,
                        10,
                    ).cast("long")
                    % w
                ).alias("bucket"),
                F.col(name).alias("n"),
            )
            .groupBy("seed", "bucket")
            .agg(F.sum("n").alias("c"))
        )

    # Self-join pre-flight (a is b on the same key) is the common planner
    # probe, and both sketch and verifier collapse to second frequency
    # moments — no join at all: ip(seed) = Σ_bucket c² (the AMS F2
    # estimator) and exact = Σ_k n(k)².
    self_join = a is b and a_key == b_key
    ca = counts(a, a_key, "na")
    ga = grid(ca, "na")
    if self_join:
        per_seed = ga.groupBy("seed").agg(
            F.sum(F.col("c") * F.col("c")).alias("ip")
        )
        exact = ca.agg(
            F.coalesce(
                F.sum(F.col("na") * F.col("na")), F.lit(0)
            ).alias("exact_size")
        )
    else:
        cb = counts(b, b_key, "nb")
        gb = grid(cb, "nb")
        # per-seed inner products over shared buckets; a seed whose grids
        # share NO bucket has inner product 0 and must still vote in the
        # min, so the products re-join a full seed spine
        per_seed = (
            ga.alias("ga")
            .join(gb.alias("gb"), ["seed", "bucket"])
            .groupBy("seed")
            .agg(F.sum(F.col("ga.c") * F.col("gb.c")).alias("ip"))
        )
        exact = ca.join(cb, "k").agg(
            F.coalesce(
                F.sum(F.col("na") * F.col("nb")), F.lit(0)
            ).alias("exact_size")
        )
    seed_spine = a.sparkSession.range(d).select(
        F.col("id").cast("int").alias("seed")
    )
    est = (
        seed_spine.join(per_seed, "seed", "left")
        .agg(F.min(F.coalesce(F.col("ip"), F.lit(0))).alias("cms_est"))
    )
    return (
        exact.crossJoin(F.broadcast(est))
        .select(
            F.col("exact_size").cast("long"),
            F.col("cms_est").cast("long"),
            (F.col("cms_est") >= F.col("exact_size")).alias("overestimates"),
        )
    )


def kmv_segment_overlap(
    df: DataFrame,
    segment_col: str,
    seg_a: str,
    seg_b: str,
    value_col: str,
    k: int = 64,
    seed: int = 7,
) -> DataFrame:
    """Set operations on KMV sketches (the theta-sketch workload):
    estimate |A∪B|, Jaccard, and |A∩B| of two segments' distinct-value
    sets from their k-min sketches alone, beside the exact answers.

    The union's k smallest hashes are found within the two sketches
    (any union-k-min element coming from A necessarily ranks within A's
    own k smallest), so union/Jaccard/intersection all come from 2k
    stored hashes — no raw-data rescan. Estimators: D_union from the
    union k-min (KMV), ρ = |U_k ∩ A_k ∩ B_k|/|U_k| (Jaccard), and
    |A∩B| ≈ ρ·D_union — the standard sketch-composition identities.
    md5-portable hashing → a SQL oracle replays every step bit-for-bit.

    Returns one row: (exact_union, est_union, exact_inter, est_inter,
    jaccard_est).
    """
    from pyspark.sql import Window as W

    hv = portable_hash64(F.col(value_col), seed)

    def sketch(seg: str) -> DataFrame:
        return (
            df.filter(F.col(segment_col) == seg)
            .select(hv.alias("hv"))
            .distinct()
            .orderBy("hv")
            .limit(k)
        )

    ak, bk = sketch(seg_a), sketch(seg_b)
    uk = (
        ak.unionByName(bk)
        .distinct()
        .orderBy("hv")
        .limit(k)
        .withColumn("_u", F.lit(1))
    )
    both = (
        uk.join(ak, "hv", "left_semi")
        .join(bk, "hv", "left_semi")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    ustats = uk.agg(
        F.count(F.lit(1)).alias("kn"), F.max("hv").alias("hk")
    )
    est_union = F.when(
        F.col("kn") < k, F.col("kn").cast("double")
    ).otherwise(
        F.lit(float(k - 1))
        / ((F.col("hk").cast("double") + F.lit(0.5)) / F.lit(float(2**60)))
    )
    a_vals = df.filter(F.col(segment_col) == seg_a).select(
        F.col(value_col).alias("v")
    )
    b_vals = df.filter(F.col(segment_col) == seg_b).select(
        F.col(value_col).alias("v")
    )
    exact_union = a_vals.unionByName(b_vals).distinct().count()
    exact_inter = (
        a_vals.distinct().join(b_vals.distinct(), "v", "left_semi").count()
    )
    spark = df.sparkSession
    ex = spark.createDataFrame(
        [(exact_union, exact_inter)], "exact_union long, exact_inter long"
    )
    return (
        ustats.crossJoin(both)
        .crossJoin(F.broadcast(ex))
        .select(
            "exact_union",
            F.round(est_union, 4).alias("est_union"),
            "exact_inter",
            F.round(
                (F.col("n_both") / F.col("kn").cast("double")) * est_union, 4
            ).alias("est_inter"),
            F.round(F.col("n_both") / F.col("kn").cast("double"), 4).alias(
                "jaccard_est"
            ),
        )
    )


def hll_distinct_rollup(
    df: DataFrame,
    group_col: str,
    sub_col: str,
    value_col: str,
    seed: int = 7,
) -> DataFrame:
    """Mergeable HyperLogLog distinct-count sketches (Flajolet et al. 2007):
    one 256-register sketch per (group, sub) cell, max-MERGED up to group
    level, estimate vs the exact distinct count — the register-vector
    sibling of ``kmv_distinct_rollup`` (same pre-aggregated-sketch-table
    shape for 100 TB COUNT DISTINCT rollups, constant 256 bytes per cell
    instead of k hashes).

    Hash layout (md5-portable, ``dedup.portable_hash64``: 60 uniform
    bits): the top p=8 bits pick the register, ρ = 1 + leading zeros of
    the remaining 52 bits (computed exactly with integer/bin-string
    arithmetic — no float log, so a DuckDB oracle replays the registers
    bit-for-bit). Registers fold with MAX, which makes the cell→group
    merge lossless by theorem (max of maxes); the live ``merge_lossless``
    column re-proves it per run against registers built directly from raw
    values, the same always-TRUE-by-construction pattern as KMV's.

    Estimator: est_raw = α_m·m²/Σ 2^{-M_j} with α_m = 0.7213/(1+1.079/m),
    linear-counting fallback m·ln(m/V) when est_raw ≤ 2.5m and V>0 empty
    registers remain (the small-range regime of the original paper). All
    float steps are either exact in IEEE double (2^{-ρ} sums, α constant
    inlined from one Python computation) or 4dp-rounded on both engines.

    Returns (group_col, exact_distinct BIGINT, hll_est DOUBLE(4dp),
    registers_used INT, merge_lossless BOOLEAN).
    """
    P, M, REM = HLL_P, HLL_M, HLL_REM_BITS
    POW_REM = 1 << REM
    alpha = HLL_ALPHA

    hv = portable_hash64(F.col(value_col), seed)
    h = df.select(
        F.col(group_col).alias("g"), F.col(sub_col).alias("s"), hv.alias("hv")
    )
    hb = h.selectExpr(
        "g",
        "s",
        f"hv DIV {POW_REM} AS bucket",
        f"CASE WHEN hv % {POW_REM} = 0 THEN {REM + 1}"
        f" ELSE {REM + 1} - length(bin(hv % {POW_REM})) END AS rho",
    )
    cell = hb.groupBy("g", "s", "bucket").agg(F.expr("max(rho) AS mx"))
    merged = cell.groupBy("g", "bucket").agg(F.expr("max(mx) AS mx"))
    direct = hb.groupBy("g", "bucket").agg(F.expr("max(rho) AS mx"))

    # register-set signature for the merge proof: bucket and rho packed into
    # one int (rho <= 53 < 64), compared via count + sum + max
    def stats(sk: DataFrame) -> DataFrame:
        return sk.groupBy("g").agg(
            F.expr("count(*) AS nz"),
            F.expr("sum(pow(2.0, -mx)) AS pz"),
            F.expr("sum(bucket * 64 + mx) AS sig_s"),
            F.expr("max(bucket * 64 + mx) AS sig_m"),
        )

    ms, ds = stats(merged), stats(direct)
    exact = df.groupBy(F.col(group_col).alias("g")).agg(
        F.countDistinct(value_col).alias("exact_distinct")
    )
    est_raw = (
        f"CAST({alpha!r} AS DOUBLE) * {M * M} / (({M} - ms.nz) + ms.pz)"
    )
    est = (
        f"CASE WHEN {est_raw} <= {2.5 * M} AND ms.nz < {M}"
        f" THEN CAST({M} AS DOUBLE) * ln(CAST({M} AS DOUBLE) / ({M} - ms.nz))"
        f" ELSE {est_raw} END"
    )
    return (
        ms.alias("ms")
        .join(ds.alias("ds"), "g")
        .join(exact, "g")
        .selectExpr(
            f"g AS {group_col}",
            "CAST(exact_distinct AS BIGINT) AS exact_distinct",
            f"ROUND({est}, 4) AS hll_est",
            "CAST(ms.nz AS INT) AS registers_used",
            "(ms.nz = ds.nz AND ms.sig_s = ds.sig_s AND ms.sig_m = ds.sig_m)"
            " AS merge_lossless",
        )
    )


def hdr_quantile_rollup(
    df: DataFrame,
    group_col: str,
    sub_col: str,
    value_col: str,
    k: int = 64,
    quantiles: tuple[float, ...] = (0.5, 0.9, 0.99),
    verify: bool = True,
) -> DataFrame:
    """Mergeable log-linear quantile sketch (the HdrHistogram / DDSketch
    family: Masson et al., VLDB 2019): per-(group, sub) bucket-count
    histograms, SUM-merged to group level, with a guaranteed relative
    error ≤ 1/(2k) on every reported quantile — the percentile sibling of
    ``kmv_distinct_rollup``/``hll_distinct_rollup`` (same pre-aggregated
    sketch-table shape for 100 TB latency/size-distribution rollups: a
    sketch per cell is O(k·log(range)) counters however many rows feed
    it, and rollup across any dimension is count addition).

    Bucketing is INTEGER-EXACT, not float-log: for a value v ≥ 1,
    octave e = floor(log2 v) = length(bin(v)) - 1 (the bin-string trick
    shared with the HLL ρ computation), then the octave [2^e, 2^{e+1}) is
    split into k equal linear sub-buckets:
    ``bucket = e·k + ((v - 2^e)·k) DIV 2^e``. No transcendental function
    is evaluated on data, so a DuckDB oracle replays every bucket id
    bit-for-bit — same portability argument as the HLL register layout.

    The bucket midpoint ``2^e·(2k + 2·sub + 1) / (2k)`` is the estimate;
    any v in the bucket satisfies |est − v|/v ≤ 1/(2k) because the
    half-width 2^e/(2k) is at most 1/(2k) of the bucket's lower edge.
    Quantile rank follows percentile_disc: the q-quantile is the value at
    rank ceil(q·n), read from the first bucket whose cumulative count
    reaches the rank (the cumulative pass runs over the ≤ 64·k bucket
    rows PER GROUP — a partitioned window, bounded by the sketch size,
    never by the data).

    The live ``merge_lossless`` column re-proves SUM-mergeability against
    a histogram built directly from raw values (always true by
    associativity — same pattern as the KMV/HLL proofs), and each
    ``ok_*`` column checks the reported estimate against the group's
    exact percentile_disc within the theoretical bound.

    Only values ≥ 1 are sketched (log buckets need a positive domain;
    integer values keep the sub-bucket arithmetic exact).

    Returns (group_col, n BIGINT, then per q: est_<q> DOUBLE(4dp),
    exact_<q> BIGINT, ok_<q> BOOLEAN). ``verify=False`` drops the exact
    percentile_disc verifier, the ok_* columns and the direct-histogram
    merge proof — the production shape at scale, where the exact
    aggregate (which buffers every group value) is precisely what the
    sketch exists to avoid; merge_lossless then rides on histogram
    construction alone and is omitted.
    """
    tags = [f"p{round(q * 100)}" for q in quantiles]
    if len(set(tags)) != len(tags):
        raise ValueError(
            f"quantiles {quantiles} collide on column tags {tags}; "
            "quantiles must differ by at least a percent"
        )
    b = (
        df.selectExpr(
            f"{group_col} AS g",
            f"{sub_col} AS s",
            f"CAST({value_col} AS BIGINT) AS v",
        )
        .filter("v >= 1")
        .selectExpr("g", "s", "v", f"{hdr_bucket_expr('v', k)} AS bucket")
    )
    direct = b.groupBy("g", "bucket").agg(F.count(F.lit(1)).alias("c"))
    if verify:
        cell = b.groupBy("g", "s", "bucket").agg(F.count(F.lit(1)).alias("c"))
        merged = cell.groupBy("g", "bucket").agg(F.sum("c").alias("c"))
    else:
        # without the merge proof the sub-cell stage is pure overhead —
        # one keyed count builds the same histogram in a single shuffle
        merged = direct

    def sig(h: DataFrame) -> DataFrame:
        return h.groupBy("g").agg(
            F.expr("count(*) AS nb"),
            F.expr("sum(c) AS n"),
            F.expr("sum(bucket * c) AS sig_s"),
            F.expr("max(bucket) AS sig_m"),
        )

    ms, ds = sig(merged), sig(direct)
    from pyspark.sql import Window

    wcum = (
        Window.partitionBy("g")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = merged.withColumn("cum", F.sum("c").over(wcum))
    j = cum.join(ms.select("g", "n"), "g")

    def est_expr(bucket_col: str) -> str:
        return (
            f"CAST(shiftleft(CAST(1 AS BIGINT), {bucket_col} DIV {k}) AS DOUBLE)"
            f" * (2 * {k} + 2 * ({bucket_col} % {k}) + 1) / (2 * {k})"
        )

    aggs = []
    for q in quantiles:
        tag = f"p{round(q * 100)}"
        aggs.append(
            F.min(
                F.when(
                    F.col("cum") >= F.ceil(F.lit(q) * F.col("n").cast("double")),
                    F.col("bucket"),
                )
            ).alias(f"_b{tag}")
        )
    sel = j.groupBy("g").agg(*aggs)

    out_cols = [f"ms.g AS {group_col}", "CAST(ms.n AS BIGINT) AS n"]
    bound = 1.0 / (2 * k) + 1e-12
    for q in quantiles:
        tag = f"p{round(q * 100)}"
        e = est_expr(f"_b{tag}")
        out_cols.append(f"ROUND({e}, 4) AS est_{tag}")
        if verify:
            out_cols += [
                f"exact_{tag}",
                f"(abs({e} - exact_{tag}) / exact_{tag} <= {bound!r})"
                f" AS ok_{tag}",
            ]
    if not verify:
        return ms.alias("ms").join(sel, "g").selectExpr(*out_cols)

    exact = b.selectExpr("g", "v").groupBy("g").agg(
        *[
            F.expr(
                f"CAST(percentile_disc({q!r}) WITHIN GROUP (ORDER BY v) AS BIGINT)"
            ).alias(f"exact_p{round(q * 100)}")
            for q in quantiles
        ]
    )
    out_cols.append(
        "(ms.nb = ds.nb AND ms.n = ds.n AND ms.sig_s = ds.sig_s"
        " AND ms.sig_m = ds.sig_m) AS merge_lossless"
    )
    return (
        ms.alias("ms")
        .join(ds.alias("ds"), "g")
        .join(sel, "g")
        .join(exact, "g")
        .selectExpr(*out_cols)
    )
