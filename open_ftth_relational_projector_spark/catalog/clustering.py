"""Clustering, selection, and iterative graph signals: k-means stats, SemDeDup, DSIR weights, k-center coreset, k-core, Bellman-Ford paths, PageRank, multi-source BFS, bigram-LM scores.

Split out of the single-file catalog (round-4 verdict #6); registration
order preserved — see catalog/__init__.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, Window as W  # noqa: F401

from open_ftth_relational_projector_spark.sources.tables import load_table, scattered  # noqa: F401
from open_ftth_relational_projector_spark.events.reader import EventLog  # noqa: F401
from open_ftth_relational_projector_spark.operators import asof_join, latest_by_key  # noqa: F401
from open_ftth_relational_projector_spark.functions import dedup as D  # noqa: F401
from open_ftth_relational_projector_spark.functions import similarity as S  # noqa: F401
from open_ftth_relational_projector_spark.functions import text as TXT  # noqa: F401
from open_ftth_relational_projector_spark.functions.factorization import (  # noqa: F401
    dec2dbl_expr,
    deflated_raw_sql,
    dot_sum_sql,
    fi_to_f_sql,
    matvec_sum_sql,
    normsq_sum_sql,
    repin_sql,
)
from open_ftth_relational_projector_spark.functions.multimodal import (  # noqa: F401
    attach_binary,
    extract_features,
)
from open_ftth_relational_projector_spark.projections.core import (  # noqa: F401
    project_installation,
    project_work_task,
)

from ._registry import _q, _r4  # noqa: F401

# --- distributed clustering + SemDeDup + DSIR selection --------------------
# Shared oracle CTE chain replaying kmeans_fit(k=4, iters=2) exactly:
# deterministic init (first 4 ids), two Lloyd iterations with centroids
# ROUNDED TO 6 DP after every M-step (the cross-engine determinism contract,
# functions/clustering.py module doc), then a final assignment a3 against
# the returned centroids c2 — mirroring kmeans_cluster_stats/semantic_dedup,
# which re-assign with the fitted centroids.
_KMEANS_CTES = """
    WITH pe AS (
      SELECT vec_id,
             UNNEST(range(1, len(embedding) + 1)) AS pos,
             UNNEST(CAST(embedding AS DOUBLE[])) AS val
      FROM embeddings
    ),
    init AS (
      SELECT ROW_NUMBER() OVER (ORDER BY vec_id) AS cid, vec_id
      FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 4)
    ),
    c0 AS (SELECT i.cid, pe.pos, ROUND(pe.val, 6) AS cv
           FROM init i JOIN pe USING (vec_id)),
    d1 AS (SELECT pe.vec_id, c.cid,
                  SUM((pe.val - c.cv) * (pe.val - c.cv)) AS d2
           FROM pe JOIN c0 c USING (pos) GROUP BY 1, 2),
    a1 AS (SELECT vec_id, cid FROM (
             SELECT vec_id, cid,
                    ROW_NUMBER() OVER (PARTITION BY vec_id
                                       ORDER BY d2, cid) AS rn
             FROM d1) WHERE rn = 1),
    c1 AS (SELECT a1.cid, pe.pos, ROUND(AVG(pe.val), 6) AS cv
           FROM a1 JOIN pe USING (vec_id) GROUP BY 1, 2),
    d2t AS (SELECT pe.vec_id, c.cid,
                   SUM((pe.val - c.cv) * (pe.val - c.cv)) AS d2
            FROM pe JOIN c1 c USING (pos) GROUP BY 1, 2),
    a2 AS (SELECT vec_id, cid FROM (
             SELECT vec_id, cid,
                    ROW_NUMBER() OVER (PARTITION BY vec_id
                                       ORDER BY d2, cid) AS rn
             FROM d2t) WHERE rn = 1),
    c2 AS (SELECT a2.cid, pe.pos, ROUND(AVG(pe.val), 6) AS cv
           FROM a2 JOIN pe USING (vec_id) GROUP BY 1, 2),
    d3 AS (SELECT pe.vec_id, c.cid,
                  SUM((pe.val - c.cv) * (pe.val - c.cv)) AS d2
           FROM pe JOIN c2 c USING (pos) GROUP BY 1, 2),
    a3 AS (SELECT vec_id, cid, d2 FROM (
             SELECT vec_id, cid, d2,
                    ROW_NUMBER() OVER (PARTITION BY vec_id
                                       ORDER BY d2, cid) AS rn
             FROM d3) WHERE rn = 1)
"""


@_q(
    "kmeans_cluster_stats",
    _KMEANS_CTES
    + """
    SELECT cid AS cluster_id,
           CAST(COUNT(*) AS INTEGER) AS n_members,
           MIN(vec_id) AS min_vec_id,
           ROUND(AVG(SQRT(d2)), 4) AS avg_dist
    FROM a3 GROUP BY cid
    """,
)
def kmeans_cluster_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Lloyd k-means (functions/clustering.kmeans_cluster_stats):
    E-step is a map-only broadcast-literal expression, M-step a k×dim-group
    aggregation — the oracle unrolls both iterations in SQL."""
    from open_ftth_relational_projector_spark.functions.clustering import (
        kmeans_cluster_stats,
    )

    return kmeans_cluster_stats(
        scattered(load_table(spark, sf_dir, "embeddings")), k=4, iters=2
    )


@_q(
    "semantic_dedup_verdicts",
    _KMEANS_CTES
    + """,
    emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    sims AS (
      SELECT y.vec_id, y.cid,
             MAX(list_dot_product(ex.v, ey.v)
                 / (SQRT(list_dot_product(ex.v, ex.v))
                    * SQRT(list_dot_product(ey.v, ey.v)))) AS max_sim
      FROM a3 x JOIN a3 y ON x.cid = y.cid AND x.vec_id < y.vec_id
      JOIN emb ex ON ex.vec_id = x.vec_id
      JOIN emb ey ON ey.vec_id = y.vec_id
      GROUP BY y.vec_id, y.cid
    )
    SELECT a3.vec_id, a3.cid AS cluster_id,
           ROUND(COALESCE(s.max_sim, -1.0), 4) + 0 AS max_intra_sim,
           COALESCE(s.max_sim, -1.0) < 0.9 AS keep
    FROM a3 LEFT JOIN sims s ON s.vec_id = a3.vec_id
    """,
)
def semantic_dedup_verdicts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (arXiv:2303.09540): quadratic near-dup search confined to
    k-means cells; keep-first-representative drop rule
    (functions/clustering.semantic_dedup)."""
    from open_ftth_relational_projector_spark.functions.clustering import (
        semantic_dedup,
    )

    return semantic_dedup(
        scattered(load_table(spark, sf_dir, "embeddings")),
        threshold=0.9,
        k=4,
        iters=2,
    )


@_q(
    "dsir_doc_weights",
    """
    WITH tok AS (SELECT doc_id, lang, string_split(text, ' ') AS toks
                 FROM documents),
    feats AS (
      SELECT doc_id, lang, UNNEST(toks) AS f FROM tok
      UNION ALL
      SELECT doc_id, lang,
             UNNEST([toks[i] || ' ' || toks[i + 1]
                     FOR i IN range(1, len(toks))]) AS f
      FROM tok
    ),
    fb AS (SELECT doc_id, lang,
                  CAST(('0x' || substr(md5(f || '#0'), 1, 15)) AS BIGINT)
                    % 256 AS b
           FROM feats),
    counts AS (SELECT b, COUNT(*) AS cr,
                      SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS ct
               FROM fb GROUP BY b),
    lw AS (SELECT b,
                  LN(CAST(ct + 1 AS DOUBLE))
                  - LN(CAST((SELECT SUM(ct) FROM counts) + 256 AS DOUBLE))
                  - LN(CAST(cr + 1 AS DOUBLE))
                  + LN(CAST((SELECT SUM(cr) FROM counts) + 256 AS DOUBLE))
                  AS w
           FROM counts)
    SELECT fb.doc_id, CAST(COUNT(*) AS INTEGER) AS n_feats,
           ROUND(SUM(lw.w), 4) + 0 AS log_weight
    FROM fb JOIN lw USING (b)
    GROUP BY fb.doc_id
    """,
)
def dsir_doc_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance-resampling weights (arXiv:2302.03169) under hashed
    unigram+bigram features, md5-portable buckets
    (functions/sampling.dsir_importance_weights)."""
    from open_ftth_relational_projector_spark.functions.sampling import (
        dsir_importance_weights,
    )

    return dsir_importance_weights(
        scattered(load_table(spark, sf_dir, "documents")),
        target_lang="en",
        n_buckets=256,
    )


def _pagerank_iter_sql(i: int) -> str:
    """One unrolled PageRank iteration in EXACT integer state: per-edge
    integer contributions summed exactly, dangling mass summed exactly,
    and the update expression built from the SAME helper functions the
    Spark implementation uses (functions/graph.pr_*_sql) — so the twin
    holds by construction (the r8 integer-state determinism contract)."""
    from open_ftth_relational_projector_spark.functions.graph import (
        pr_contrib_sql,
        pr_sum_sql,
        pr_update_sql,
    )

    p = i - 1
    contrib = pr_contrib_sql("r.ri", "deg.deg")
    csum = pr_sum_sql(f"SUM({contrib})")
    dsum = pr_sum_sql("COALESCE(SUM(ri), 0)")
    update = pr_update_sql("COALESCE(c.c, 0)", "d.dm", "nn.n", 0.85, 10)
    return f"""
    c{i} AS (SELECT e.dst, {csum} AS c
             FROM e JOIN deg USING (src)
             JOIN r{p} r ON r.node = e.src
             GROUP BY e.dst),
    d{i} AS (SELECT {dsum} AS dm FROM r{p}
             WHERE node NOT IN (SELECT src FROM deg)),
    r{i} AS (SELECT nodes.node, {update} AS ri
             FROM nodes CROSS JOIN nn CROSS JOIN d{i} d
             LEFT JOIN c{i} c ON c.dst = nodes.node)"""


def _pagerank_sql() -> str:
    from open_ftth_relational_projector_spark.functions.graph import (
        pr_init_sql,
        pr_out_sql,
    )

    return (
        f"""
    WITH e AS (SELECT DISTINCT o_custkey AS src, l_suppkey + 1000000 AS dst
               FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
    nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
    nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n
           FROM (SELECT src AS node FROM e UNION SELECT dst FROM e)),
    deg AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY src),
    r0 AS (SELECT node, {pr_init_sql('nn.n', 10)} AS ri
           FROM nodes CROSS JOIN nn),"""
        + ",".join(_pagerank_iter_sql(i) for i in (1, 2, 3))
        + f"""
    SELECT node, {pr_out_sql('ri', 10, 6)} AS rank FROM r3
    """
    )


_PAGERANK_SQL = _pagerank_sql()


def _kc_d2(a: str, b: str) -> str:
    """Unrolled squared-L2 between list columns, (x−c)·(x−c) form and
    per-pair ROUND(…, 6) — mirroring clustering.kcenter_select's
    determinism contract."""
    return (
        f"ROUND(list_sum(list_transform(generate_series(1, 64), "
        f"i -> ({a}[i]::DOUBLE - {b}[i]::DOUBLE) * ({a}[i]::DOUBLE - {b}[i]::DOUBLE))), 6)"
    )


_KCENTER_SQL = f"""
    WITH e AS (SELECT vec_id, embedding AS v FROM embeddings),
    c1 AS (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 1),
    m1 AS (SELECT e.vec_id, e.v, {_kc_d2('e.v', 'c1.v')} AS d
           FROM e, c1 WHERE e.vec_id <> c1.vec_id),
    c2 AS (SELECT vec_id, v, d FROM m1 ORDER BY d DESC, vec_id LIMIT 1),
    m2 AS (SELECT m.vec_id, m.v, LEAST(m.d, {_kc_d2('m.v', 'c2.v')}) AS d
           FROM m1 m, c2 WHERE m.vec_id <> c2.vec_id),
    c3 AS (SELECT vec_id, v, d FROM m2 ORDER BY d DESC, vec_id LIMIT 1),
    m3 AS (SELECT m.vec_id, m.v, LEAST(m.d, {_kc_d2('m.v', 'c3.v')}) AS d
           FROM m2 m, c3 WHERE m.vec_id <> c3.vec_id),
    c4 AS (SELECT vec_id, v, d FROM m3 ORDER BY d DESC, vec_id LIMIT 1)
    SELECT 1 AS sel_order, vec_id, 0.0 AS dist FROM c1
    UNION ALL SELECT 2, vec_id, ROUND(d, 4) FROM c2
    UNION ALL SELECT 3, vec_id, ROUND(d, 4) FROM c3
    UNION ALL SELECT 4, vec_id, ROUND(d, 4) FROM c4
    """


@_q("kcenter_coreset", _KCENTER_SQL)
def kcenter_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy k-center (farthest-point) coreset selection over the
    embeddings — the diversity-maximizing sampler for curation
    (functions/clustering.kcenter_select, k=4); the oracle unrolls the
    four greedy rounds with the same per-pair rounding and id
    tie-breaks."""
    from open_ftth_relational_projector_spark.functions.clustering import (
        kcenter_select,
    )

    emb = scattered(load_table(spark, sf_dir, "embeddings"))
    return kcenter_select(emb, k=4)


def _kcore_round(prev: str, out: str, k: int) -> str:
    """One unrolled peel round: degrees from the surviving edge set,
    drop nodes under k, keep edges whose BOTH endpoints survive."""
    return f"""
    {out} AS (
      SELECT e.u, e.v FROM {prev} e
      WHERE e.u IN (SELECT u FROM {prev} GROUP BY u HAVING COUNT(*) >= {k})
        AND e.v IN (SELECT u FROM {prev} GROUP BY u HAVING COUNT(*) >= {k}))"""


_KCORE_SQL = (
    """
    WITH raw AS (SELECT DISTINCT o_custkey AS u, l_suppkey + 1000000 AS v
                 FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
    e0 AS (SELECT u, v FROM raw UNION SELECT v, u FROM raw),"""
    + ",".join(_kcore_round(f"e{i}", f"e{i+1}", 3) for i in range(4))
    + """
    SELECT u AS node, CAST(COUNT(*) AS BIGINT) AS degree
    FROM e4 GROUP BY u
    """
)


@_q("kcore_purchase_graph", _KCORE_SQL)
def kcore_purchase_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-core of the customer↔supplier purchase graph after 4 peel
    rounds (functions/graph.kcore_peel) — the density filter that strips
    weakly-attached fringe nodes in webgraph-style curation; the oracle
    unrolls the same fixed peel rounds."""
    from open_ftth_relational_projector_spark.functions.graph import kcore_peel

    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    edges = (
        orders.join(lineitem, orders["o_orderkey"] == lineitem["l_orderkey"])
        .select(
            F.col("o_custkey").alias("src"),
            (F.col("l_suppkey") + F.lit(1000000)).alias("dst"),
        )
        .distinct()
    )
    return kcore_peel(edges, k=3, rounds=4)


def _wsp_relax(prev: str, out: str) -> str:
    """One unrolled Bellman-Ford round: keep old costs, add relaxed
    candidates ROUNDed to 6 dp, take the min per node — mirroring
    graph.weighted_shortest_paths' determinism contract."""
    return f"""
    {out} AS (SELECT node, MIN(d) AS d FROM (
        SELECT node, d FROM {prev}
        UNION ALL
        SELECT s.v AS node, ROUND(p.d + s.w, 6) AS d
        FROM {prev} p JOIN sym s ON s.u = p.node) t
      GROUP BY node)"""


_WSP_SQL = (
    """
    WITH e0 AS (SELECT o_custkey AS u, l_suppkey + 1000000 AS v,
                       ROUND(MIN(l_extendedprice) / 10000, 6) AS w
                FROM orders JOIN lineitem ON o_orderkey = l_orderkey
                GROUP BY 1, 2),
    sym AS (SELECT u, v, w FROM e0 UNION ALL SELECT v, u, w FROM e0),
    r0 AS (SELECT DISTINCT c_custkey AS node, 0.0::DOUBLE AS d
           FROM customer
           WHERE c_mktsegment = 'AUTOMOBILE'
             AND c_custkey IN (SELECT u FROM sym)),"""
    + ",".join(_wsp_relax(f"r{i}", f"r{i+1}") for i in range(3))
    + """
    SELECT node, d AS cost FROM r3
    """
)


@_q("weighted_purchase_paths", _WSP_SQL)
def weighted_purchase_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded Bellman-Ford cheapest paths from the AUTOMOBILE seed set
    over the purchase graph, edge cost = cheapest item price/10⁴ on that
    customer↔supplier edge, ≤ 3 hops (functions/
    graph.weighted_shortest_paths) — the weighted companion to
    bfs_purchase_distances; the oracle unrolls the three relaxation
    rounds with identical per-round rounding."""
    from open_ftth_relational_projector_spark.functions.graph import (
        weighted_shortest_paths,
    )

    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    edges = (
        orders.join(lineitem, orders["o_orderkey"] == lineitem["l_orderkey"])
        .groupBy(
            F.col("o_custkey").alias("src"),
            (F.col("l_suppkey") + F.lit(1000000)).alias("dst"),
        )
        .agg(F.round(F.min("l_extendedprice") / 10000, 6).alias("w"))
    )
    seeds = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "AUTOMOBILE")
        .select(F.col("c_custkey").alias("node"))
    )
    return weighted_shortest_paths(edges, seeds, max_hops=3)


@_q("pagerank_purchase_graph", _PAGERANK_SQL)
def pagerank_purchase_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (damping 0.85, 3 power iterations, dangling redistribution)
    over the directed customer→supplier purchase graph — the webgraph
    authority-scoring shape used for corpus quality filtering
    (functions/graph.pagerank); oracle unrolls the iterations in SQL."""
    from open_ftth_relational_projector_spark.functions.graph import pagerank

    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    edges = (
        orders.join(
            lineitem, orders["o_orderkey"] == lineitem["l_orderkey"]
        )
        .select(
            F.col("o_custkey").alias("src"),
            (F.col("l_suppkey") + F.lit(1000000)).alias("dst"),
        )
    )
    return pagerank(edges, damping=0.85, iters=3)


@_q(
    "bfs_purchase_distances",
    """
    WITH RECURSIVE e AS (
      SELECT DISTINCT o_custkey AS u, l_suppkey + 1000000 AS v
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
    sym AS (SELECT u, v FROM e UNION SELECT v, u FROM e),
    seed AS (SELECT DISTINCT c_custkey AS node FROM customer
             WHERE c_mktsegment = 'AUTOMOBILE'
               AND c_custkey IN (SELECT u FROM sym)),
    walk(node, dist) AS (
      SELECT node, 0 FROM seed
      UNION
      SELECT s.v, w.dist + 1 FROM walk w JOIN sym s ON s.u = w.node
      WHERE w.dist < 4)
    SELECT node, CAST(MIN(dist) AS INTEGER) AS dist FROM walk GROUP BY node
    """,
)
def bfs_purchase_distances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS hop distance from the AUTOMOBILE-segment seed set
    over the undirected customer↔supplier purchase graph, capped at 4 hops
    — the proximity-to-trusted-seed graph feature (functions/
    graph.bfs_distances, frontier-based level-synchronous BFS); the oracle
    derives the same minimum distances via a recursive CTE."""
    from open_ftth_relational_projector_spark.functions.graph import bfs_distances

    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    edges = (
        orders.join(lineitem, orders["o_orderkey"] == lineitem["l_orderkey"])
        .select(
            F.col("o_custkey").alias("src"),
            (F.col("l_suppkey") + F.lit(1000000)).alias("dst"),
        )
    )
    seeds = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "AUTOMOBILE")
        .select(F.col("c_custkey").alias("node"))
    )
    return bfs_distances(edges, seeds, max_hops=4)


@_q(
    "bigram_lm_doc_scores",
    """
    WITH tok AS (SELECT doc_id, string_split(text, ' ') AS toks
                 FROM documents),
    uni AS (SELECT doc_id, UNNEST(toks) AS w FROM tok),
    big AS (SELECT doc_id,
                   UNNEST([toks[i] FOR i IN range(1, len(toks))]) AS w1,
                   UNNEST([toks[i] || ' ' || toks[i + 1]
                           FOR i IN range(1, len(toks))]) AS bg
            FROM tok),
    c2 AS (SELECT bg, COUNT(*) AS c12 FROM big GROUP BY bg),
    c1 AS (SELECT w, COUNT(*) AS c1 FROM uni GROUP BY w),
    v AS (SELECT COUNT(DISTINCT w) AS v FROM uni)
    SELECT big.doc_id, CAST(COUNT(*) AS INTEGER) AS n_bigrams,
           ROUND(AVG(LN((c2.c12 + 1.0) / (c1.c1 + v.v))), 4) + 0 AS avg_logprob
    FROM big JOIN c2 USING (bg)
    JOIN c1 ON c1.w = big.w1
    CROSS JOIN v
    GROUP BY big.doc_id
    """,
)
def bigram_lm_doc_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained bigram-LM log-probability per document — the
    CCNet/KenLM perplexity-filter shape (functions/quality.bigram_lm_scores):
    count tables keyed on the gram, corpus joins back on the same keys."""
    from open_ftth_relational_projector_spark.functions.quality import (
        bigram_lm_scores,
    )

    return bigram_lm_scores(scattered(load_table(spark, sf_dir, "documents")))




@_q(
    "ccnet_perplexity_buckets",
    """
    WITH tok AS (SELECT doc_id, string_split(text, ' ') AS toks
                 FROM documents),
    uni AS (SELECT doc_id, UNNEST(toks) AS w FROM tok),
    big AS (SELECT doc_id,
                   UNNEST([toks[i] FOR i IN range(1, len(toks))]) AS w1,
                   UNNEST([toks[i] || ' ' || toks[i + 1]
                           FOR i IN range(1, len(toks))]) AS bg
            FROM tok),
    c2 AS (SELECT bg, COUNT(*) AS c12 FROM big GROUP BY bg),
    c1 AS (SELECT w, COUNT(*) AS c1 FROM uni GROUP BY w),
    v AS (SELECT COUNT(DISTINCT w) AS v FROM uni),
    scores AS (
      SELECT big.doc_id, ROUND(AVG(LN((c2.c12 + 1.0) / (c1.c1 + v.v))), 4) + 0
               AS lp
      FROM big JOIN c2 USING (bg)
      JOIN c1 ON c1.w = big.w1
      CROSS JOIN v
      GROUP BY big.doc_id),
    bucketed AS (
      SELECT d.lang, s.lp,
             NTILE(3) OVER (PARTITION BY d.lang
                            ORDER BY s.lp DESC, s.doc_id) AS ppl_bucket
      FROM scores s JOIN documents d USING (doc_id))
    SELECT lang, ppl_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(AVG(lp), 4) + 0 AS mean_logprob,
           ROUND(MIN(lp), 4) + 0 AS min_logprob,
           ROUND(MAX(lp), 4) + 0 AS max_logprob
    FROM bucketed GROUP BY lang, ppl_bucket
    """,
)
def ccnet_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet's head/middle/tail perplexity bucketing (Wenzek et al. 2020):
    per language, documents rank by their corpus-bigram-LM score
    (functions/quality.bigram_lm_scores — higher avg log-prob = lower
    perplexity = cleaner) and split into NTILE(3) terciles; bucket 1 is
    the "head" CCNet keeps preferentially. Ranking uses the 4-dp ROUNDED
    score with doc_id tie-break so tercile boundaries are deterministic
    across engines (raw double sums are summation-order-sensitive). The
    per-lang window is partitioned — bounded by the language's docs,
    the same shape CCNet shards by (lang, shard) at web scale."""
    from open_ftth_relational_projector_spark.functions.quality import (
        bigram_lm_scores,
    )

    from open_ftth_relational_projector_spark.operators.hierarchical import (
        hierarchical_grouped_row_number,
        ntile_from_rank_col,
    )

    docs = scattered(load_table(spark, sf_dir, "documents"))
    # the bigram-LM pipeline (token explode + count-table joins) is the
    # expensive part, and the expression-sharded rank fires two eager
    # driver actions over its output — persist it for the duration of
    # plan construction, release before returning (the returned plan
    # re-derives it once on the consumer's action)
    scores = (
        bigram_lm_scores(docs)
        .select("doc_id", F.round("avg_logprob", 4).alias("lp"))
        .join(docs.select("doc_id", "lang"), "doc_id")
        .persist()
    )
    # languages are FEW and each holds a data-proportional share, so a
    # plain ntile() OVER (PARTITION BY lang ...) would funnel corpus/|lang|
    # rows through one task — exactly the giant-group regime the grouped
    # hierarchical rank exists for; the exact-NTILE formula then assigns
    # terciles from (rank, per-lang count) map-side
    ranked = hierarchical_grouped_row_number(
        scores,
        ["lang"],
        [F.desc("lp"), F.col("doc_id")],
        "_rn",
        shard_on=-F.col("lp"),  # monotone with the DESC order
        total_col="_n",
    )
    bucketed = ranked.withColumn(
        "ppl_bucket", ntile_from_rank_col(F.col("_rn"), F.col("_n"), 3)
    )
    out = bucketed.groupBy("lang", "ppl_bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        _r4(F.avg("lp")).alias("mean_logprob"),
        _r4(F.min("lp")).alias("min_logprob"),
        _r4(F.max("lp")).alias("max_logprob"),
    )
    scores.unpersist(False)
    return out


# --- r5 continuation: dimensionality reduction + latent factors ------------


def _pif_norm_sql(raw_cte: str) -> str:
    """Shared normalize-and-re-pin: integer matvec result -> next integer
    factor state (functions/factorization exact contract; the helpers ARE
    the Spark side's expression text, so the twin holds by construction)."""
    norm = f"(SELECT SQRT({dec2dbl_expr(normsq_sum_sql('s'))}) FROM {raw_cte})"
    return repin_sql(f"{dec2dbl_expr('s')} / {norm}", 10)


def _pif_iter_sql(i: int) -> str:
    """One alternating power-iteration round in SQL: column half-step then
    row half-step, each an EXACT integer matvec (order-independent decimal
    sums) + L2 normalize + integer re-pin at 10 dp — the exact-state
    determinism contract of functions/factorization (round 8)."""
    return f"""
    v{i}r AS MATERIALIZED (SELECT p, {matvec_sum_sql('r.wi', f'u{i - 1}.fi')} AS s
              FROM r JOIN u{i - 1} USING (c) GROUP BY p),
    v{i} AS MATERIALIZED (SELECT p, {_pif_norm_sql(f'v{i}r')} AS fi
             FROM v{i}r),
    u{i}r AS MATERIALIZED (SELECT c, {matvec_sum_sql('r.wi', f'v{i}.fi')} AS s
              FROM r JOIN v{i} USING (p) GROUP BY c),
    u{i} AS MATERIALIZED (SELECT c, {_pif_norm_sql(f'u{i}r')} AS fi
             FROM u{i}r)"""


_AFF_V = f"ROUND({fi_to_f_sql('fi', 10)}, 6) + 0"

_LATENT_SQL = (
    """
    WITH r AS MATERIALIZED (
      SELECT o_custkey AS c, l_partkey AS p,
             CAST(ROUND(SUM(l_quantity) * 1e2, 0) AS BIGINT) AS wi
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      GROUP BY 1, 2),
    u0 AS MATERIALIZED (SELECT DISTINCT c, CAST(10000000000 AS BIGINT) AS fi FROM r),"""
    + ",".join(_pif_iter_sql(i) for i in (1, 2, 3))
    + f"""
    SELECT 'part' AS entity, p AS entity_id, {_AFF_V} AS affinity FROM v3
    UNION ALL
    SELECT 'customer', c, {_AFF_V} FROM u3
    """
)


@_q("latent_part_affinity", _LATENT_SQL)
def latent_part_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-1 matrix factorization of the customer×part quantity matrix by
    alternating power iteration (3 rounds from u = 1⃗) — the dominant
    singular pair as a latent "affinity" score per part and per customer,
    the collaborative-filtering signal behind item similarity and data
    mixture weighting (functions/factorization.power_iteration_factors).
    Per-half-iteration L2 normalization + integer re-pin at 10 dp is the
    EXACT determinism contract (round 8: factor state is an integer-scaled
    BIGINT and every iteration aggregate is an order-independent exact
    decimal sum — see functions/factorization); the oracle unrolls the
    three rounds in SQL from the same shared expression text. Each half-step is one keyed join +
    one map-side-combined groupBy over nnz(R); norms are scalar aggregates
    broadcast back (no OVER () window)."""
    from open_ftth_relational_projector_spark.functions.factorization import (
        power_iteration_factors,
    )

    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    ratings = (
        orders.join(lineitem, orders["o_orderkey"] == lineitem["l_orderkey"])
        .groupBy(
            F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p")
        )
        .agg(F.sum("l_quantity").alias("w"))
    )
    u, v = power_iteration_factors(
        ratings, row_col="c", col_col="p", value_col="w", iters=3
    )
    return v.select(
        F.lit("part").alias("entity"),
        F.col("p").alias("entity_id"),
        F.round("factor", 6).alias("affinity"),
    ).unionByName(
        u.select(
            F.lit("customer").alias("entity"),
            F.col("c").alias("entity_id"),
            F.round("factor", 6).alias("affinity"),
        )
    )


def _jl_audit_sql() -> str:
    """Oracle for jl_projection_audit: the projection, the norms, AND the
    pairwise dot products all replay as ORDERED list arithmetic
    (list_transform index order + sequential list_sum — the same
    left-to-right double summation as Spark's zip_with/aggregate fold),
    the _jl_knn_sql bit-identical-projection contract. The per-bucket
    mean then aggregates an exact DECIMAL(18,9) image of the
    (bit-identical) pair errors, so no cross-engine summation-order
    hazard remains anywhere in the query."""
    from open_ftth_relational_projector_spark.functions.similarity import (
        jl_sign_matrix,
    )

    signs = jl_sign_matrix(16, 64)
    pv = ", ".join(
        "list_sum(list_transform(generate_series(1, 64),"
        " i -> v[i]::DOUBLE * ([" + ", ".join(str(s) for s in row) + "])[i]))"
        " / 4.0"
        for row in signs
    )

    def dot(a, b, n):
        return (
            f"list_sum(list_transform(generate_series(1, {n}),"
            f" i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE))"
        )

    return f"""
    WITH e AS (SELECT vec_id, vec_id % 25 AS bucket, embedding AS v
               FROM embeddings),
    p AS MATERIALIZED (
      SELECT vec_id, bucket, v, [{pv}] AS pv,
             SQRT({dot('v', 'v', 64)}) AS n_orig FROM e),
    n AS MATERIALIZED (
      SELECT vec_id, bucket, v, pv, n_orig,
             SQRT({dot('pv', 'pv', 16)}) AS n_proj FROM p),
    pair AS (
      SELECT a.bucket,
             ABS({dot('a.v', 'b.v', 64)} / (a.n_orig * b.n_orig)
                 - {dot('a.pv', 'b.pv', 16)} / (a.n_proj * b.n_proj)) AS err
      FROM n a JOIN n b ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
    SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_pairs,
           ROUND(CAST(SUM(CAST(ROUND(err, 9) AS DECIMAL(18,9))) AS DOUBLE)
                 / COUNT(*), 4) AS mean_abs_err,
           ROUND(MAX(err), 4) AS max_abs_err
    FROM pair GROUP BY bucket
    """


@_q("jl_projection_audit", _jl_audit_sql())
def jl_projection_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss sign random projection 64→16 dims
    (functions/similarity.jl_project: md5-derived ±1 matrix, map-only,
    one parsed expression) plus the distance-preservation audit: pairwise
    cosine before vs after, blocked by id-residue so the pair count is
    O(n²/B) per block, aggregated to per-block mean/max absolute error.
    The projection is the cheap pre-pass that shrinks every downstream
    pairwise/ANN shuffle by dim/k×; the audit is the QA gate — at corpus
    scale it runs on a bounded md5-picked vector sample (this 500-vector
    table is already sample-sized). The oracle replays projection, norms,
    and pair dot products as ordered list arithmetic (bit-identical to
    the zip_with/aggregate folds), and the bucket mean sums an exact
    DECIMAL(18,9) image of the errors on BOTH sides, so the 4-dp rounding
    can never sit on a cross-engine ulp boundary."""
    from open_ftth_relational_projector_spark.functions.similarity import (
        dot,
        jl_project,
    )

    emb = scattered(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    base = jl_project(emb, vec_col="v", out_col="pv", k=16, dim=64).select(
        "vec_id",
        (F.col("vec_id") % 25).alias("bucket"),
        "v",
        "pv",
        F.expr("sqrt(aggregate(v, 0D, (a, x) -> a + x * x))").alias("n_orig"),
        F.expr("sqrt(aggregate(pv, 0D, (a, x) -> a + x * x))").alias("n_proj"),
    )
    a, b = base.alias("a"), base.alias("b")
    err = F.abs(
        dot(F.col("a.v"), F.col("b.v")) / (F.col("a.n_orig") * F.col("b.n_orig"))
        - dot(F.col("a.pv"), F.col("b.pv"))
        / (F.col("a.n_proj") * F.col("b.n_proj"))
    )
    pairs = a.join(
        b,
        (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.vec_id") < F.col("b.vec_id")),
    ).select(F.col("a.bucket").alias("bucket"), err.alias("err"))
    return pairs.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(
            F.sum(F.expr("CAST(ROUND(err, 9) AS DECIMAL(18,9))"))
            .cast("double")
            / F.count(F.lit(1)),
            4,
        ).alias("mean_abs_err"),
        _r4(F.max("err")).alias("max_abs_err"),
    )


def _pif2_norm_sql(raw_cte: str) -> str:
    """Normalize-and-re-pin over the deflated integer state ``si``."""
    norm = f"(SELECT SQRT({dec2dbl_expr(normsq_sum_sql('si'))}) FROM {raw_cte})"
    return repin_sql(f"{dec2dbl_expr('si')} / {norm}", 10)


def _pif2_iter_sql(i: int) -> str:
    """One DEFLATED alternating round in SQL: the rank-1 correction is
    applied as −σ₁·factor₁·(overlap scalar) per side — R₂ never
    materializes, mirroring functions/factorization._deflated_half_step
    under the exact-integer contract: the matvec and both scalar
    aggregates are exact decimal sums of integer products; the one double
    combination re-pins to integer state (si) BEFORE its norm."""
    ov_x = (
        f"(SELECT {dec2dbl_expr(dot_sum_sql(f'y{i - 1}.fi', 'u3.fi'))} / 1e20"
        f" FROM y{i - 1} JOIN u3 USING (c))"
    )
    ov_y = (
        f"(SELECT {dec2dbl_expr(dot_sum_sql(f'x{i}.fi', 'v3.fi'))} / 1e20"
        f" FROM x{i} JOIN v3 USING (p))"
    )
    sig = "(SELECT s1 FROM sigma)"
    return f"""
    x{i}r AS MATERIALIZED (
      SELECT v3.p,
             {repin_sql(deflated_raw_sql('b.s0', sig, 'v3.fi', ov_x, 10, 2), 10)} AS si
      FROM v3 LEFT JOIN (
        SELECT p, {matvec_sum_sql('r.wi', f'y{i - 1}.fi')} AS s0
        FROM r JOIN y{i - 1} USING (c) GROUP BY p) b USING (p)),
    x{i} AS MATERIALIZED (SELECT p, {_pif2_norm_sql(f'x{i}r')} AS fi
             FROM x{i}r),
    y{i}r AS MATERIALIZED (
      SELECT u3.c,
             {repin_sql(deflated_raw_sql('b.s0', sig, 'u3.fi', ov_y, 10, 2), 10)} AS si
      FROM u3 LEFT JOIN (
        SELECT c, {matvec_sum_sql('r.wi', f'x{i}.fi')} AS s0
        FROM r JOIN x{i} USING (p) GROUP BY c) b USING (c)),
    y{i} AS MATERIALIZED (SELECT c, {_pif2_norm_sql(f'y{i}r')} AS fi
             FROM y{i}r)"""


_LATENT2_SQL = (
    """
    WITH r AS MATERIALIZED (
      SELECT o_custkey AS c, l_partkey AS p,
             CAST(ROUND(SUM(l_quantity) * 1e2, 0) AS BIGINT) AS wi
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      GROUP BY 1, 2),
    u0 AS MATERIALIZED (SELECT DISTINCT c, CAST(10000000000 AS BIGINT) AS fi FROM r),"""
    + ",".join(_pif_iter_sql(i) for i in (1, 2, 3))
    + f""",
    sigma AS MATERIALIZED (SELECT {dec2dbl_expr(dot_sum_sql('r.wi * u3.fi', 'v3.fi'))} / 1e22 AS s1
              FROM r JOIN u3 USING (c) JOIN v3 USING (p)),
    y0 AS MATERIALIZED (SELECT DISTINCT c, CAST(10000000000 AS BIGINT) AS fi FROM r),"""
    + ",".join(_pif2_iter_sql(i) for i in (1, 2, 3))
    + f"""
    SELECT 'part' AS entity, p AS entity_id, 1 AS component,
           {_AFF_V} AS affinity FROM v3
    UNION ALL
    SELECT 'part', p, 2, {_AFF_V} FROM x3
    UNION ALL
    SELECT 'customer', c, 1, {_AFF_V} FROM u3
    UNION ALL
    SELECT 'customer', c, 2, {_AFF_V} FROM y3
    """
)


@_q("latent_rank2_affinity", _LATENT2_SQL)
def latent_rank2_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First TWO singular components of the customer×part quantity matrix
    (functions/factorization.power_iteration_rank2): component 1 by
    alternating power iteration, component 2 by IMPLICIT deflation —
    R₂ = R − σ₁u₁v₁ᵀ is dense and never materialized; every half-step
    applies the correction as −σ₁·factor₁·(overlap scalar), one broadcast
    scalar + one keyed join, keeping deflation linear in nnz(R) at any
    scale. Same exact-integer state contract (the deflated combination is
    the one double expression, re-pinned to integer state before its
    norm); the oracle unrolls both components' iterations in SQL from the
    same shared expression text."""
    from open_ftth_relational_projector_spark.functions.factorization import (
        power_iteration_rank2,
    )

    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    ratings = (
        orders.join(lineitem, orders["o_orderkey"] == lineitem["l_orderkey"])
        .groupBy(
            F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p")
        )
        .agg(F.sum("l_quantity").alias("w"))
    )
    u, v = power_iteration_rank2(
        ratings, row_col="c", col_col="p", value_col="w", iters=3
    )
    return v.select(
        F.lit("part").alias("entity"),
        F.col("p").alias("entity_id"),
        "component",
        F.round("factor", 6).alias("affinity"),
    ).unionByName(
        u.select(
            F.lit("customer").alias("entity"),
            F.col("c").alias("entity_id"),
            "component",
            F.round("factor", 6).alias("affinity"),
        )
    )


def _jl_knn_sql() -> str:
    """Oracle for jl_knn_recall: the projection is replayed as ORDERED
    list arithmetic (list_transform index order + sequential list_sum —
    the same left-to-right double summation as Spark's zip_with/aggregate
    fold), so projected values, cosines, and therefore the ROW_NUMBER
    rankings are bit-identical with no rounding contract needed. Sign
    literals come from jl_sign_matrix (itself pinned against DuckDB's md5
    derivation by test)."""
    from open_ftth_relational_projector_spark.functions.similarity import (
        jl_sign_matrix,
    )

    signs = jl_sign_matrix(16, 64)
    pv = ", ".join(
        "list_sum(list_transform(generate_series(1, 64),"
        " i -> v[i]::DOUBLE * ([" + ", ".join(str(s) for s in row) + "])[i]))"
        " / 4.0"
        for row in signs
    )

    def dot(a, b, n):
        return (
            f"list_sum(list_transform(generate_series(1, {n}),"
            f" i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE))"
        )

    def cos(a, b, n):
        return (
            f"{dot(a, b, n)} / (sqrt({dot(a, a, n)}) * sqrt({dot(b, b, n)}))"
        )

    return f"""
    WITH e AS (SELECT vec_id, embedding AS v FROM embeddings),
    p AS MATERIALIZED (SELECT vec_id, [{pv}] AS pv FROM e),
    q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id % 50 = 0),
    qp AS (SELECT vec_id AS query_id, pv AS qpv FROM p WHERE vec_id % 50 = 0),
    st AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.query_id, c.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY q.query_id
                                  ORDER BY {cos('c.v', 'q.qv', 64)} DESC,
                                           c.vec_id) AS rnk
        FROM e c, q WHERE c.vec_id <> q.query_id) t
      WHERE rnk <= 5),
    at AS (
      SELECT query_id, neighbor_id, 1 AS hit FROM (
        SELECT qp.query_id, c.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY qp.query_id
                                  ORDER BY {cos('c.pv', 'qp.qpv', 16)} DESC,
                                           c.vec_id) AS rnk
        FROM p c, qp WHERE c.vec_id <> qp.query_id) t
      WHERE rnk <= 5)
    SELECT st.query_id,
           CAST(COUNT(*) AS INT) AS n_exact,
           CAST(SUM(COALESCE(at.hit, 0)) AS INT) AS n_found,
           ROUND(SUM(COALESCE(at.hit, 0)) / CAST(COUNT(*) AS DOUBLE), 4)
             AS recall
    FROM st LEFT JOIN at USING (query_id, neighbor_id)
    GROUP BY st.query_id
    """


@_q("jl_knn_recall", _jl_knn_sql())
def jl_knn_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The JL accelerator measured the way it would be deployed: exact
    top-5 cosine kNN on the 16-dim projection vs exact kNN on the full
    64 dims, recall@5 per query (functions/similarity.jl_project +
    knn_bruteforce + knn_recall). At corpus scale the projection cuts
    every candidate dot product 4×; this query is the standing recall
    gate for that trade. Both rankings are deterministic cross-engine
    (sequential double summation both sides), so the oracle replays them
    exactly — the approximate path itself is hash-matched, not just its
    exactness twin."""
    from open_ftth_relational_projector_spark.functions.similarity import (
        jl_project,
        knn_bruteforce,
        knn_recall,
    )

    emb = scattered(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    proj = jl_project(emb, vec_col="v", out_col="pv", k=16, dim=64)
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    pqueries = proj.filter(F.col("vec_id") % 50 == 0)
    exact = knn_bruteforce(emb, queries, k=5, vec_col="v")
    approx = knn_bruteforce(proj, pqueries, k=5, vec_col="pv")
    return knn_recall(approx, exact)
