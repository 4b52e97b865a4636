"""Graph helpers for dedup pipelines: connected components over near-dup
pairs → canonical cluster ids.

A near-dup detector (MinHash-LSH, SimHash, n-gram Jaccard — functions/
dedup.py) emits PAIRS; deduplicating a corpus needs CLUSTERS (keep one
canonical doc per component). This is min-label propagation expressed as
DataFrame iterations:

    label(n) ← min(label(n), min over neighbors' labels)

repeated to fixpoint. Each round is one join + one aggregation — both
shuffles keyed by node id — and the iteration count is the graph diameter,
which for near-dup graphs is tiny (clusters are dense cliques-of-copies,
diameter 1-2; the cap exists for adversarial chains). ``localCheckpoint``
truncates the plan between rounds so lineage doesn't grow with iterations
— the standard Spark iterative-algorithm guard.

For adversarially long chains (diameter ≫ rounds) ``algorithm="star"``
runs the alternating large-star/small-star formulation (Kiveris et al.,
"Connected Components in MapReduce and Beyond", 2014): the same
join+aggregate round shape, but each round HALVES path lengths instead of
shrinking them by one, so convergence is O(log d) — a 10k-node chain
closes in ~15 rounds instead of 10k (pinned in tests). That is the 100 TB
path; min-label stays the default because near-dup graphs have tiny
diameters and label-prop does one shuffle per round instead of three.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 25,
    out_node: str = "doc_id",
    out_label: str = "component_id",
    algorithm: str = "label",
) -> DataFrame:
    """Components of the undirected graph given by (src, dst) pairs.

    Returns one row per node appearing in any edge: (out_node, out_label)
    where out_label = min node id of the node's component. Raises if the
    propagation hasn't converged after ``max_iter`` rounds.

    algorithm="label" — min-label propagation, one shuffle per round,
    rounds = graph diameter (right for dense near-dup cliques).
    algorithm="star" — alternating large-star/small-star (Kiveris et al.
    2014), rounds = O(log diameter) (right for long chains / 100 TB).
    """
    if algorithm == "star":
        return _connected_components_star(
            edges, src, dst, max_iter, out_node, out_label
        )
    if algorithm != "label":
        raise ValueError(f"unknown algorithm: {algorithm!r}")
    sym = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).unionByName(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    )
    sym = sym.distinct().localCheckpoint(eager=True)
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    # convergence detector, two forms by id type (round-4 advice: the
    # scalar-sum form silently mis-detects on non-numeric ids — a string
    # label cast to decimal is NULL under non-ANSI, so None==None read as
    # "converged" after one round):
    # - integral/decimal ids: per-node labels are monotone NON-INCREASING
    #   (min-propagation) over a FIXED node set, so the exact integer sum
    #   of labels is unchanged iff no label changed — one scalar aggregate
    #   per round. decimal(38,0) accumulator: a long sum of web-scale node
    #   ids overflows ANSI arithmetic (same guard as the star checksum).
    # - any other id type (string GUIDs etc.): exact join-compare — count
    #   of nodes whose label changed this round; type-agnostic, one extra
    #   keyed join per round against the checkpointed previous state.
    from pyspark.sql.types import (
        ByteType,
        DecimalType,
        IntegerType,
        LongType,
        ShortType,
    )

    numeric_ids = isinstance(
        labels.schema["label"].dataType,
        (ByteType, ShortType, IntegerType, LongType, DecimalType),
    )

    def _label_sum(df: DataFrame):
        return df.agg(
            F.sum(F.col("label").cast("decimal(38,0)")).alias("s")
        ).collect()[0]["s"]

    sig = _label_sum(labels) if numeric_ids else None
    for _ in range(max_iter):
        neigh = (
            sym.join(labels, sym.b == labels.node)
            .select(F.col("a").alias("node"), "label")
        )
        prev = labels
        labels = (
            labels.unionByName(neigh)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=True)
        )
        if numeric_ids:
            new_sig = _label_sum(labels)
            converged = new_sig == sig
            sig = new_sig
        else:
            converged = (
                labels.join(
                    prev.select("node", F.col("label").alias("_prev")), "node"
                )
                .filter(F.col("label") != F.col("_prev"))
                .limit(1)
                .count()
                == 0
            )
        if converged:
            return labels.select(
                F.col("node").alias(out_node), F.col("label").alias(out_label)
            )
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds"
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """Large-star round: every node u connects its LARGER neighbors to
    m(u) = min(Γ(u) ∪ {u}). Emitted as (v, m) pairs; self-loops dropped."""
    sym = edges.unionByName(
        edges.select(F.col("u").alias("v"), F.col("v").alias("u"))
    )
    mins = (
        sym.groupBy("u")
        .agg(F.min("v").alias("minv"))
        .select("u", F.least("minv", F.col("u")).alias("m"))
    )
    return (
        sym.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Small-star round: orient edges larger→smaller; every node u
    re-links its (all smaller) neighbors and itself to m(u) = min(Γ(u))."""
    g = (
        edges.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    mins = g.groupBy("u").agg(F.min("v").alias("m"))
    relinked = (
        g.join(mins, "u")
        .filter(F.col("v") != F.col("m"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    own = mins.select("u", F.col("m").alias("v"))
    return (
        relinked.unionByName(own)
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _connected_components_star(
    edges: DataFrame,
    src: str,
    dst: str,
    max_iter: int,
    out_node: str,
    out_label: str,
) -> DataFrame:
    """Alternating large-star/small-star connected components (Kiveris et
    al., "Connected Components in MapReduce and Beyond", SoCC 2014).

    Each round halves path lengths, so a diameter-d graph converges in
    O(log d) rounds where min-label propagation needs d. Convergence =
    edge-set fixpoint, detected via an order-insensitive checksum (count +
    sum of pair hashes) instead of a full set comparison. At fixpoint the
    edge set is a star forest: every edge is (node, component-min)."""
    raw = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    # nodes derive from the UNFILTERED edges: a node whose only edge is a
    # self-loop still "appears in an edge" and must get its own-label row
    # (parity with the label-propagation algorithm)
    nodes = (
        raw.select(F.col("u").alias("node"))
        .unionByName(raw.select(F.col("v").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    e = (
        raw.filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )

    def checksum(df: DataFrame) -> tuple:
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            # decimal accumulator: a long sum of 64-bit hashes overflows ANSI
            F.sum(F.xxhash64(F.col("u"), F.col("v")).cast("decimal(38,0)")).alias("h"),
        ).collect()[0]
        return (row["n"], row["h"])

    prev = None
    for _ in range(max_iter):
        e = _small_star(_large_star(e)).localCheckpoint(eager=True)
        cur = checksum(e)
        if cur == prev:
            # at fixpoint every node carries exactly one out-edge (to its
            # component min); the groupBy is an identity safety net
            stars = (
                e.groupBy("u")
                .agg(F.min("v").alias("label"))
                .select(F.col("u").alias("node"), "label")
            )
            return (
                nodes.join(stars, "node", "left")
                .select(
                    F.col("node").alias(out_node),
                    F.coalesce(F.col("label"), F.col("node")).alias(out_label),
                )
            )
        prev = cur
    raise RuntimeError(
        f"star connected_components did not converge in {max_iter} rounds"
    )


def bfs_distances(
    edges: DataFrame,
    sources: DataFrame,
    src: str = "src",
    dst: str = "dst",
    source_col: str = "node",
    max_hops: int = 6,
    directed: bool = False,
) -> DataFrame:
    """Multi-source BFS hop distances: for every node reachable within
    ``max_hops`` of ANY source node, the minimum hop count to the nearest
    source. Returns (node, dist); sources present in the graph get dist 0.

    The proximity-to-seed signal used in corpus curation (hops from a
    trusted-domain seed set in a link graph, à la Common Crawl seed
    expansion) and in fraud/abuse graph feature engineering.

    Frontier-based level-synchronous BFS: each round joins ONLY the
    frontier (nodes first reached last round) against the edge list and
    anti-joins the visited set, so per-round work is O(edges touched by
    the frontier), not O(|V|·rounds). Both per-round ops are shuffles
    keyed on node id — on a cluster, pre-partition/bucket edges by ``src``
    once and every round reuses that partitioning. ``localCheckpoint``
    truncates lineage per round (the standard iterative-DataFrame guard);
    the ONLY driver-side value per round is the frontier's emptiness check
    (a LIMIT 1 count). Sources not appearing in any edge — as EITHER
    endpoint, so in directed mode a sink-only source still gets its dist-0
    row — are dropped, parity with the reachability semantics of a
    recursive-CTE oracle over the edge list.
    """
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    if not directed:
        e = e.unionByName(
            edges.select(F.col(dst).alias("u"), F.col(src).alias("v"))
        )
    e = e.filter(F.col("u") != F.col("v")).distinct().localCheckpoint(eager=True)
    frontier = (
        sources.select(F.col(source_col).alias("node"))
        .distinct()
        .join(
            e.select(F.col("u").alias("node"))
            .unionByName(e.select(F.col("v").alias("node")))
            .distinct(),
            "node",
            "left_semi",
        )
        .withColumn("dist", F.lit(0))
        .localCheckpoint(eager=True)
    )
    dist = frontier
    for hop in range(1, max_hops + 1):
        if frontier.limit(1).count() == 0:
            break
        reached = (
            frontier.join(e, frontier["node"] == e["u"])
            .select(F.col("v").alias("node"))
            .distinct()
            .join(dist, "node", "left_anti")
            .withColumn("dist", F.lit(hop))
            .localCheckpoint(eager=True)
        )
        dist = dist.unionByName(reached).localCheckpoint(eager=True)
        frontier = reached
    return dist


def pr_init_sql(n: str, iter_dp: int) -> str:
    """Shared-text initial PageRank state: round(10^iter_dp / N) as BIGINT.
    One correctly-rounded double division + a half-away-from-zero integer
    round — deterministic on both engines for identical N."""
    return f"CAST(ROUND(1e{iter_dp} / {n}, 0) AS BIGINT)"


def pr_contrib_sql(ri: str, deg: str) -> str:
    """Shared-text per-edge contribution: the BIGINT rank state split over
    the out-degree and re-pinned to an integer. ri and deg are both exact
    as doubles (< 2^53), the division is one correctly-rounded IEEE op, and
    ROUND(x, 0) is half-away-from-zero on both engines — so the value is a
    deterministic function of (ri, deg), independent of row order."""
    return f"CAST(ROUND({ri} / {deg}, 0) AS BIGINT)"


def pr_sum_sql(x: str) -> str:
    """Shared-text exact integer mass sum. Total rank mass is ~10^iter_dp
    (≤ ~1.1e10 at iter_dp=10 including per-edge rounding slack), so the
    BIGINT sum cannot overflow and its value is order-independent; the
    outer cast pins both engines to BIGINT (DuckDB's SUM(BIGINT) widens to
    HUGEINT, Spark's stays LONG — both exact as doubles downstream)."""
    return f"CAST({x} AS BIGINT)"


def pr_update_sql(
    c: str, dm: str, n: str, damping: float, iter_dp: int
) -> str:
    """Shared-text rank update in integer state:

        ri' = round((1−d)·S/N + d·(C + DM/N)),  S = 10^iter_dp

    where C (summed in-contributions) and DM (dangling mass) are EXACT
    integers ≤ ~1.1·S < 2^53. Every float op is a single correctly-rounded
    IEEE operation on bit-identical operands — subtraction, one multiply,
    two divides, two adds — so the update is deterministic cross-engine
    and across Spark partial-aggregation orders. No double SUM anywhere."""
    d = f"CAST({damping!r} AS DOUBLE)"
    return (
        f"CAST(ROUND((1.0 - {d}) * 1e{iter_dp} / {n}"
        f" + {d} * ({c} + {dm} / {n}), 0) AS BIGINT)"
    )


def pr_out_sql(ri: str, iter_dp: int, out_dp: int) -> str:
    """Shared-text integer state → rounded output rank. ri < 2^53 is exact
    as a double, the power-of-ten division is one IEEE rounding, and
    ROUND(·, out_dp) agrees cross-engine on identical inputs. Ranks are
    strictly positive, so no signed-zero normalization is needed."""
    return f"ROUND({ri} / 1e{iter_dp}, {out_dp})"


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    iters: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
    iter_dp: int = 10,
    out_dp: int = 6,
) -> DataFrame:
    """PageRank over a directed edge list — the classic webgraph quality
    signal for corpus curation (page authority as a pretraining-data
    filter, à la Common Crawl URL-graph scoring).

    Fixed ``iters`` power iterations with damping and full dangling-mass
    redistribution: rank ← (1−d)/N + d·(Σ in-contribs + dangling/N).

    Determinism contract (EXACT, upgraded in round 8 — the
    functions/factorization.py integer-state recipe): rank state is a
    BIGINT ``ri = round(rank · 10^iter_dp)``; each edge contributes
    ``round(ri / out_degree)`` (a per-row deterministic integer), so the
    per-dst aggregation and the dangling-mass aggregation sum EXACT
    integers — order-independent across engines and across Spark's own
    partial-aggregation orders. The only float arithmetic is the update
    expression on identical scalar inputs with identical shared text
    (pr_update_sql — the SQL oracle builds its unrolled iterations from
    these same helpers, so the twin holds by construction). The previous
    contract (round the double rank to 10 dp per iteration) bounded drift
    only probabilistically: hub nodes accumulate O(0.1-magnitude) double
    sums whose ulp is ~1e-17 against a 1e-10 pin — ~1e-3 escape odds per
    run at sf0.1, the same class that bit latent_rank2_affinity in the r8
    bit-level sweep. Integer state closes the class. Per-edge integer
    rounding redistributes ≤ 0.5·10^-iter_dp of mass per edge (vs exact
    real-arithmetic PageRank) — a contract choice, not an error term that
    can diverge between engines.

    Scale shape: each iteration is one join keyed on src (edges re-use one
    partitioning across iterations — on a cluster, pre-partition/bucket
    edges by src once) + one groupBy dst (map-side combined), both linear
    in |E|; the dangling term is a scalar aggregate broadcast back.
    ``localCheckpoint`` truncates lineage per iteration, the standard
    iterative-DataFrame guard. The ONLY driver-side value is N (one count).
    """
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_nodes = nodes.count()
    n_txt = f"CAST({float(n_nodes)!r} AS DOUBLE)"
    # materialized once (node-sized): deg is referenced by BOTH the
    # contribution join and the dangling anti-join in EVERY iteration —
    # unmaterialized it re-aggregates the edge set 2·iters times
    deg = (
        e.groupBy("src")
        .agg(F.count(F.lit(1)).alias("deg"))
        .localCheckpoint(eager=True)
    )
    ranks = nodes.withColumn("ri", F.expr(pr_init_sql(n_txt, iter_dp)))
    for _ in range(iters):
        contrib = (
            e.join(deg, "src")
            .join(ranks.withColumnRenamed("node", "src"), "src")
            .select("dst", F.expr(pr_contrib_sql("ri", "deg")).alias("ci"))
            .groupBy("dst")
            .agg(F.expr(pr_sum_sql("SUM(ci)")).alias("c"))
        )
        dangling = ranks.join(
            deg, ranks["node"] == deg["src"], "left_anti"
        ).agg(F.expr(pr_sum_sql("COALESCE(SUM(ri), 0)")).alias("dm"))
        ranks = (
            nodes.join(
                contrib.withColumnRenamed("dst", "node"), "node", "left"
            )
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                F.expr(
                    pr_update_sql(
                        "COALESCE(c, 0)", "dm", n_txt, damping, iter_dp
                    )
                ).alias("ri"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select(
        "node", F.expr(pr_out_sql("ri", iter_dp, out_dp)).alias("rank")
    )


def triangle_count(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
) -> DataFrame:
    """Global triangle count via the oriented-edge join (the canonical
    MapReduce formulation): orient every edge low→high, join paths
    (u→v, v→w), close each path against the oriented edge set (u→w).
    Orientation means every triangle is counted exactly ONCE (u<v<w) and
    the path join fans out on min-degree endpoints — the trick that tames
    skew on high-degree hubs (a hub's edges mostly point INTO it).

    Returns a single row (n_edges, n_paths, n_triangles) — the density
    audit for near-dup graphs (dense clique clusters ⇒ triangle-heavy;
    chains ⇒ none).
    """
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    paths = (
        e.alias("a")
        .join(e.alias("b"), F.col("a.v") == F.col("b.u"))
        .select(
            F.col("a.u").alias("u"),
            F.col("a.v").alias("v"),
            F.col("b.v").alias("w"),
        )
    )
    tri = paths.join(
        e.select(F.col("u").alias("tu"), F.col("v").alias("tw")),
        (F.col("u") == F.col("tu")) & (F.col("w") == F.col("tw")),
    )
    return (
        e.agg(F.count(F.lit(1)).alias("n_edges"))
        .crossJoin(paths.agg(F.count(F.lit(1)).alias("n_paths")))
        .crossJoin(tri.agg(F.count(F.lit(1)).alias("n_triangles")))
        .select(
            F.col("n_edges").cast("long"),
            F.col("n_paths").cast("long"),
            F.col("n_triangles").cast("long"),
        )
    )


def weighted_shortest_paths(
    edges: DataFrame,
    sources: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    source_col: str = "node",
    max_hops: int = 3,
    directed: bool = False,
    iter_dp: int = 6,
) -> DataFrame:
    """Cheapest-path cost from a source set under ≤ ``max_hops`` edges —
    Bellman-Ford with a bounded round count, the weighted companion to
    bfs_distances (hop counts ignore that one expensive edge can be worse
    than three cheap ones).

    Round h: dist ← min(dist, min over in-edges of dist(u) + w(u,v)) —
    one join keyed on the edge source + one min-aggregation keyed on the
    node, per round; edges reuse one partitioning across rounds (bucket
    by ``src`` on a cluster). Candidate costs are ROUNDed to ``iter_dp``
    every round so an unrolled SQL oracle hash-matches.

    Determinism class (r8 analysis): this operator is EXACTLY
    deterministic already, unlike the pre-r8 pagerank — there is no
    floating-point SUM anywhere. Each candidate cost is a per-row chain
    of single correctly-rounded IEEE ops (one add + one ROUND) on
    identical inputs, and MIN over doubles is order-independent (no
    rounding, associative/commutative on a fixed multiset). The rounding
    boundary therefore cannot be "escaped" by aggregation-order ulp
    noise; no integer-state rewrite is needed.
    Nodes unreachable within the hop budget are absent. Negative weights
    are accepted (it is Bellman-Ford) but the hop bound, not convergence,
    is the termination guarantee.

    Returns (node, cost) with cost rounded to ``iter_dp``.
    """
    e = edges.select(
        F.col(src).alias("u"), F.col(dst).alias("v"), F.col(weight).alias("w")
    )
    if not directed:
        e = e.unionByName(
            edges.select(
                F.col(dst).alias("u"), F.col(src).alias("v"),
                F.col(weight).alias("w"),
            )
        )
    e = e.localCheckpoint(eager=True)
    dist = (
        sources.select(F.col(source_col).alias("node"))
        .distinct()
        .join(
            e.select(F.col("u").alias("node"))
            .unionByName(e.select(F.col("v").alias("node")))
            .distinct(),
            "node",
            "left_semi",
        )
        .withColumn("d", F.lit(0.0))
        .localCheckpoint(eager=True)
    )
    # fixpoint detector: per-node d is monotone NON-INCREASING and the
    # node set only grows, so the scalar pair (count, sum of d) is
    # unchanged iff NO distance changed — and a round that changes nothing
    # makes every later round a no-op (the relaxation is a deterministic
    # function of dist). The sum is taken over EXACT integers (d is
    # already rounded to iter_dp, so d·10^iter_dp is integral and < 2^53)
    # because a float sum's partial-aggregation order could mask a real
    # 1-ulp decrease at large counts. One cheap aggregate over the
    # checkpointed state per round; identical result to running all
    # max_hops rounds.
    scale = 10**iter_dp

    def _sig(df):
        row = df.agg(
            F.count(F.lit(1)).alias("c"),
            F.sum(F.round(F.col("d") * scale).cast("long")).alias("s"),
        ).collect()[0]
        return row["c"], row["s"]

    sig = _sig(dist)
    for _ in range(max_hops):
        relaxed = (
            dist.join(e, dist["node"] == e["u"])
            .select(
                F.col("v").alias("node"),
                F.round(F.col("d") + F.col("w"), iter_dp).alias("d"),
            )
        )
        dist = (
            dist.unionByName(relaxed)
            .groupBy("node")
            .agg(F.min("d").alias("d"))
            .localCheckpoint(eager=True)
        )
        new_sig = _sig(dist)
        if new_sig == sig:
            break
        sig = new_sig
    return dist.select("node", F.col("d").alias("cost"))


def kcore_peel(
    edges: DataFrame,
    k: int = 2,
    rounds: int = 4,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """k-core peeling: iteratively drop nodes with degree < k (and their
    edges) for a FIXED number of rounds — the density filter that strips
    weakly-connected fringe (spam/link-farm pruning in webgraph curation,
    noise-node removal before community detection).

    A fixed ``rounds`` rather than peel-to-fixpoint keeps the result a
    deterministic pure function both engines can replay (an unrolled SQL
    oracle); on most graphs peeling converges in a few rounds — callers
    wanting the true k-core raise ``rounds`` and check a further round
    changes nothing.

    Peeling is DECREMENTAL (the r4 graph-scaling sweep showed the naive
    recount-per-round shape growing 13.6× at 100× edges — the worst of
    the graph family): degrees are aggregated ONCE, then each round
    subtracts, from every still-alive node, its edge count into that
    round's dead set. This is exact, not an approximation: a node dead in
    round r was alive until r, so ALL its edges to currently-alive
    neighbors are still present in the peeled graph — the per-edge
    removal bookkeeping recomputation does is implied by node liveness.
    Per-round work is one scan of the (checkpointed-once) edge list
    joined against the dead set — typically broadcast-sized after round
    1 — plus a |V|-sized degree update; no per-round |E| shuffle or |E|
    checkpoint.

    Returns surviving (node, degree) after the final round; nodes whose
    degree reached 0 without being peeled are dropped (they have no
    surviving edges), matching the recount semantics.
    """
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(
            edges.select(F.col(dst).alias("u"), F.col(src).alias("v"))
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = (
        e.groupBy("u")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    for _ in range(rounds):
        dead = deg.filter(F.col("n") < k).select("u")
        # scalar count over the checkpointed |V|-sized degree table: a
        # fixpoint reached early makes every remaining round a no-op —
        # skip them (identical result; same driver-scalar pattern as the
        # BFS frontier emptiness check). The count also sizes the join:
        # a bounded dead set broadcasts; an unbounded one (adversarial
        # first round) falls back to the keyed join.
        n_dead = dead.count()
        if n_dead == 0:
            break
        dead_v = dead.withColumnRenamed("u", "v")
        if n_dead <= 1_000_000:
            dead_v = F.broadcast(dead_v)
        lost = (
            e.join(dead_v, "v")
            .groupBy("u")
            .agg(F.count(F.lit(1)).alias("lost"))
        )
        deg = (
            deg.join(dead, "u", "left_anti")
            .join(lost, "u", "left")
            .select(
                "u",
                (F.col("n") - F.coalesce(F.col("lost"), F.lit(0))).alias("n"),
            )
            .localCheckpoint(eager=True)
        )
    return (
        deg.filter(F.col("n") > 0)
        .select(F.col("u").alias("node"), F.col("n").cast("long").alias("degree"))
    )
