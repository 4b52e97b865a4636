"""Fixed-memory sketches and retrieval compositions: KMV, CMS, Bloom decontamination, embedding QA, hybrid RRF, incremental dedup, label propagation, mixture sampling, winnowing.

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
from open_ftth_relational_projector_spark.functions.multimodal import (  # noqa: F401
    attach_binary,
    extract_features,
)
from open_ftth_relational_projector_spark.projections.core import (  # noqa: F401
    project_installation,
    project_work_task,
)

from ._registry import _q, _r4  # noqa: F401

# --- fixed-memory sketches, self-verified ----------------------------------


@_q(
    "kmv_distinct_rollup",
    """
    WITH h AS (SELECT DISTINCT event_type, CAST(ts AS DATE) AS day,
                      ('0x' || substr(md5(CAST(user_id AS VARCHAR) || '#7'), 1, 15))::BIGINT AS hv
               FROM events),
    cellk AS (SELECT event_type, hv FROM (
                SELECT event_type, day, hv,
                       ROW_NUMBER() OVER (PARTITION BY event_type, day ORDER BY hv) AS rn
                FROM h) t WHERE rn <= 64),
    merged AS (SELECT event_type, hv FROM (
                 SELECT event_type, hv,
                        ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY hv) AS rn
                 FROM (SELECT DISTINCT event_type, hv FROM cellk) u) t
               WHERE rn <= 64),
    direct AS (SELECT event_type, hv FROM (
                 SELECT event_type, hv,
                        ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY hv) AS rn
                 FROM (SELECT DISTINCT event_type, hv FROM h) u) t
               WHERE rn <= 64),
    ms AS (SELECT event_type, COUNT(*) AS kn, MAX(hv) AS hk, SUM(hv) AS hs
           FROM merged GROUP BY event_type),
    ds AS (SELECT event_type, COUNT(*) AS kn, MAX(hv) AS hk, SUM(hv) AS hs
           FROM direct GROUP BY event_type),
    ex AS (SELECT event_type, COUNT(DISTINCT user_id) AS n
           FROM events GROUP BY event_type)
    SELECT ms.event_type,
           CAST(ex.n AS BIGINT) AS exact_distinct,
           ROUND(CASE WHEN ms.kn < 64 THEN CAST(ms.kn AS DOUBLE)
                      ELSE 63.0 / ((ms.hk + 0.5) / 1152921504606846976.0)
                 END, 4) AS kmv_est,
           (ms.kn = ds.kn AND ms.hk = ds.hk AND ms.hs = ds.hs) AS merge_lossless
    FROM ms JOIN ds ON ms.event_type = ds.event_type
    JOIN ex ON ms.event_type = ex.event_type
    """,
)
def kmv_distinct_rollup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable KMV distinct-user sketches per (event_type, day), merged
    to event_type and compared to the exact COUNT DISTINCT — the
    pre-aggregated sketch-table rollup for 100 TB distinct counting
    (functions/sketches.kmv_distinct_rollup, k=64 md5-portable hashes);
    the oracle replays sketch construction, merge, estimator, and the
    merge-losslessness proof bit-for-bit in SQL."""
    from open_ftth_relational_projector_spark.functions.sketches import (
        kmv_distinct_rollup,
    )

    ev = load_table(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))
    return kmv_distinct_rollup(
        ev, "event_type", "day", "user_id", k=64, seed=7, pre_reduce_salt=8
    )


@_q(
    "kmv_segment_overlap",
    """
    WITH ha AS (SELECT DISTINCT
                  ('0x' || substr(md5(CAST(user_id AS VARCHAR) || '#7'), 1, 15))::BIGINT AS hv
                FROM events WHERE event_type = 'click'),
    hb AS (SELECT DISTINCT
             ('0x' || substr(md5(CAST(user_id AS VARCHAR) || '#7'), 1, 15))::BIGINT AS hv
           FROM events WHERE event_type = 'purchase'),
    ak AS (SELECT hv FROM ha ORDER BY hv LIMIT 64),
    bk AS (SELECT hv FROM hb ORDER BY hv LIMIT 64),
    uk AS (SELECT hv FROM (SELECT hv FROM ak UNION SELECT hv FROM bk) u
           ORDER BY hv LIMIT 64),
    us AS (SELECT COUNT(*) AS kn, MAX(hv) AS hk FROM uk),
    nb AS (SELECT COUNT(*) AS n_both FROM uk
           WHERE hv IN (SELECT hv FROM ak) AND hv IN (SELECT hv FROM bk)),
    exu AS (SELECT COUNT(DISTINCT user_id) AS exact_union FROM events
            WHERE event_type IN ('click', 'purchase')),
    exi AS (SELECT COUNT(*) AS exact_inter FROM
            (SELECT DISTINCT user_id FROM events WHERE event_type = 'click') a
            JOIN (SELECT DISTINCT user_id FROM events
                  WHERE event_type = 'purchase') b USING (user_id)),
    eu AS (SELECT kn,
                  CASE WHEN kn < 64 THEN CAST(kn AS DOUBLE)
                       ELSE 63.0 / ((hk + 0.5) / 1152921504606846976.0)
                  END AS est_u
           FROM us)
    SELECT CAST(exu.exact_union AS BIGINT) AS exact_union,
           ROUND(eu.est_u, 4) AS est_union,
           CAST(exi.exact_inter AS BIGINT) AS exact_inter,
           ROUND((nb.n_both / CAST(eu.kn AS DOUBLE)) * eu.est_u, 4)
             AS est_inter,
           ROUND(nb.n_both / CAST(eu.kn AS DOUBLE), 4) AS jaccard_est
    FROM exu, exi, eu, nb
    """,
)
def kmv_segment_overlap_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch-style SET OPERATIONS on KMV sketches: |click ∪
    purchase|, Jaccard, and |click ∩ purchase| of distinct users
    estimated purely from two 64-hash sketches, beside exact answers
    (functions/sketches.kmv_segment_overlap); the oracle replays sketch
    construction, union k-min, both-membership count, and every
    estimator identity bit-for-bit."""
    from open_ftth_relational_projector_spark.functions.sketches import (
        kmv_segment_overlap,
    )

    ev = load_table(spark, sf_dir, "events")
    return kmv_segment_overlap(
        ev, "event_type", "click", "purchase", "user_id", k=64, seed=7
    )


@_q(
    "cms_join_size_estimate",
    """
    WITH ka AS (SELECT CAST(l_partkey AS VARCHAR) AS k FROM lineitem
                WHERE l_partkey IS NOT NULL),
    seeds AS (SELECT UNNEST([0, 1, 2, 3]) AS seed),
    cells AS (SELECT seed,
                     ('0x' || substr(md5(k || '#' || CAST(seed AS VARCHAR)), 1, 15))::BIGINT
                       % 256 AS bucket
              FROM ka CROSS JOIN seeds),
    grid AS (SELECT seed, bucket, COUNT(*) AS c FROM cells GROUP BY 1, 2),
    ipj AS (SELECT a.seed, SUM(a.c * b.c) AS ip
            FROM grid a JOIN grid b USING (seed, bucket) GROUP BY a.seed),
    ip AS (SELECT s.seed, COALESCE(ipj.ip, 0) AS ip
           FROM seeds s LEFT JOIN ipj USING (seed)),
    est AS (SELECT MIN(ip) AS cms_est FROM ip),
    cnt AS (SELECT k, COUNT(*) AS n FROM ka GROUP BY k),
    ex AS (SELECT COALESCE(SUM(n * n), 0) AS exact_size FROM cnt)
    SELECT CAST(ex.exact_size AS BIGINT) AS exact_size,
           CAST(est.cms_est AS BIGINT) AS cms_est,
           est.cms_est >= ex.exact_size AS overestimates
    FROM ex CROSS JOIN est
    """,
)
def cms_join_size_estimate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-cardinality pre-flight for the skew-sensitive lineitem
    self-join on l_partkey: CMS inner-product estimate vs the exact
    Σ n(k)² size, with the never-underestimates guarantee as a live
    column (functions/sketches.cms_join_size_estimate) — what a planner
    consults before admitting a possibly-exploding join at 100 TB."""
    from open_ftth_relational_projector_spark.functions.sketches import (
        cms_join_size_estimate,
    )

    li = load_table(spark, sf_dir, "lineitem")
    return cms_join_size_estimate(li, "l_partkey", li, "l_partkey", d=4, w=256)


@_q(
    "cms_heavy_hitters",
    """
    WITH toks AS (SELECT UNNEST(string_split(text, ' ')) AS token
                  FROM documents),
    seeds AS (SELECT UNNEST([0, 1, 2, 3]) AS seed),
    cells AS (
      SELECT token, seed,
             CAST(('0x' || substr(md5(token || '#' || seed), 1, 15))
               AS BIGINT) % 128 AS bucket
      FROM toks CROSS JOIN seeds),
    sketch AS (SELECT seed, bucket, COUNT(*) AS cell_n
               FROM cells GROUP BY 1, 2),
    exact AS (SELECT token, COUNT(*) AS exact_n FROM toks GROUP BY 1),
    topk AS (SELECT token, exact_n FROM exact
             ORDER BY exact_n DESC, token ASC LIMIT 20),
    probes AS (
      SELECT t.token, t.exact_n, seed,
             CAST(('0x' || substr(md5(t.token || '#' || seed), 1, 15))
               AS BIGINT) % 128 AS bucket
      FROM topk t CROSS JOIN seeds)
    SELECT p.token, p.exact_n, MIN(sk.cell_n) AS cms_n,
           MIN(sk.cell_n) >= p.exact_n AS overestimates
    FROM probes p JOIN sketch sk USING (seed, bucket)
    GROUP BY p.token, p.exact_n
    """,
)
def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch heavy hitters, self-verified: the d×w counter grid
    is fixed-size mergeable state (the 100 TB replacement for the unbounded
    token table); every run re-proves est ≥ exact on the top-20 tokens
    (functions/sketches.count_min_heavy_hitters, md5-portable hashes)."""
    from open_ftth_relational_projector_spark.functions.sketches import (
        count_min_heavy_hitters,
    )

    return count_min_heavy_hitters(
        scattered(load_table(spark, sf_dir, "documents")), d=4, w=128, k=20
    )


@_q(
    "bloom_decontamination",
    """
    WITH tok AS (SELECT doc_id, string_split(text, ' ') AS toks
                 FROM documents),
    allsh AS (
      SELECT DISTINCT doc_id, shingle FROM (
        SELECT doc_id,
               UNNEST([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' '
                       || toks[i+3] || ' ' || toks[i+4] || ' ' || toks[i+5]
                       || ' ' || toks[i+6] || ' ' || toks[i+7]
                       FOR i IN range(1, len(toks) - 6)]) AS shingle
        FROM tok)
    ),
    eval_sh AS (SELECT DISTINCT shingle FROM allsh WHERE doc_id % 50 = 0),
    train AS (SELECT * FROM allsh WHERE doc_id % 50 <> 0),
    seeds AS (SELECT UNNEST([0, 1, 2]) AS seed),
    bloom AS (SELECT DISTINCT
                CAST(('0x' || substr(md5(shingle || '#' || seed), 1, 15))
                  AS BIGINT) % 16384 AS bit
              FROM eval_sh CROSS JOIN seeds),
    probe AS (SELECT t.doc_id, t.shingle, seed,
                CAST(('0x' || substr(md5(t.shingle || '#' || seed), 1, 15))
                  AS BIGINT) % 16384 AS bit
              FROM train t CROSS JOIN seeds),
    per_sh AS (
      SELECT p.doc_id, p.shingle,
             SUM(CASE WHEN b.bit IS NOT NULL THEN 1 ELSE 0 END) = 3
               AS bloom_pos
      FROM probe p LEFT JOIN bloom b USING (bit)
      GROUP BY p.doc_id, p.shingle),
    th AS (
      SELECT t.doc_id,
             SUM(CASE WHEN e.shingle IS NOT NULL THEN 1 ELSE 0 END) AS n_true
      FROM train t LEFT JOIN eval_sh e USING (shingle)
      GROUP BY t.doc_id)
    SELECT p.doc_id,
           CAST(COUNT(*) AS INTEGER) AS n_shingles,
           CAST(SUM(CASE WHEN bloom_pos THEN 1 ELSE 0 END) AS INTEGER)
             AS n_bloom_hits,
           CAST(th.n_true AS INTEGER) AS n_true_hits,
           SUM(CASE WHEN bloom_pos THEN 1 ELSE 0 END) >= th.n_true
             AS no_false_negatives
    FROM per_sh p JOIN th USING (doc_id)
    GROUP BY p.doc_id, th.n_true
    """,
)
def bloom_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination probed through a FIXED-memory Bloom filter of the
    eval shingles (broadcast bit set instead of the unbounded shingle
    table); per train doc the bloom hit count sits beside the exact
    overlap, re-proving no-false-negatives every run
    (functions/sketches.bloom_probe_decontamination)."""
    from open_ftth_relational_projector_spark.functions.sketches import (
        bloom_probe_decontamination,
    )

    return bloom_probe_decontamination(
        scattered(load_table(spark, sf_dir, "documents")),
        eval_mod=50,
        n_bits=16384,
        n_hashes=3,
        n_shingle=8,
    )


@_q(
    "embedding_outlier_stats",
    """
    WITH pe AS (
      SELECT vec_id,
             UNNEST(range(1, len(embedding) + 1)) AS pos,
             UNNEST(CAST(embedding AS DOUBLE[])) AS val
      FROM embeddings
    ),
    dims AS (
      SELECT pos, AVG(val) AS mu,
             SQRT(AVG(val * val) - AVG(val) * AVG(val)) AS sigma
      FROM pe GROUP BY pos
    ),
    mz AS (
      SELECT pe.vec_id, MAX(ABS(pe.val - d.mu) / d.sigma) AS m
      FROM pe JOIN dims d USING (pos) GROUP BY pe.vec_id
    )
    SELECT vec_id, ROUND(m, 4) AS max_abs_z, m > 3.5 AS is_outlier
    FROM mz
    """,
)
def embedding_outlier_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-shard QA: per-vector max per-dimension |z| and outlier
    flag (functions/similarity.embedding_outlier_stats) — corrupt-shard
    screen before an ANN index build; dim stats broadcast, corpus never
    shuffles."""
    return S.embedding_outlier_stats(
        scattered(load_table(spark, sf_dir, "embeddings")), z_threshold=3.5
    )


@_q(
    "hybrid_rrf_retrieval",
    """
    WITH ql AS (
      SELECT * FROM (VALUES ('hash'), ('merge'), ('window')) AS t(term)),
    tok AS (
      SELECT doc_id, UNNEST(string_split(text, ' ')) AS term FROM documents),
    tf AS (
      SELECT doc_id, term, COUNT(*) AS tf
      FROM tok SEMI JOIN ql USING (term) GROUP BY doc_id, term),
    idf AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    dl AS (
      SELECT doc_id, CAST(LEN(string_split(text, ' ')) AS DOUBLE) AS dl
      FROM documents),
    stats AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM dl),
    bm AS (
      SELECT tf.doc_id,
             ROUND(SUM(
               ln(1 + (stats.n_docs - idf.df + 0.5) / (idf.df + 0.5))
               * tf.tf * (1.2 + 1)
               / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / stats.avgdl))
             ), 4) AS score
      FROM tf
      JOIN idf USING (term)
      JOIN dl ON dl.doc_id = tf.doc_id
      CROSS JOIN stats
      GROUP BY tf.doc_id),
    trank AS (
      SELECT doc_id, rnk AS rank_a FROM (
        SELECT doc_id,
               ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rnk
        FROM bm) WHERE rnk <= 25),
    q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
    c AS (SELECT vec_id AS doc_id, embedding AS cv FROM embeddings
          WHERE vec_id <> 0),
    scored AS (
      SELECT c.doc_id,
             list_sum(list_transform(generate_series(1, 64),
               i -> qv[i]::DOUBLE * cv[i]::DOUBLE))
             / (sqrt(list_sum(list_transform(generate_series(1, 64),
                  i -> qv[i]::DOUBLE * qv[i]::DOUBLE)))
                * sqrt(list_sum(list_transform(generate_series(1, 64),
                    i -> cv[i]::DOUBLE * cv[i]::DOUBLE)))) AS sim
      FROM c, q),
    vrank AS (
      SELECT doc_id, rnk AS rank_b FROM (
        SELECT doc_id,
               ROW_NUMBER() OVER (ORDER BY sim DESC, doc_id) AS rnk
        FROM scored) WHERE rnk <= 25)
    SELECT doc_id,
           CAST(rank_a AS INT) AS rank_a,
           CAST(rank_b AS INT) AS rank_b,
           ROUND(COALESCE(1.0 / (60 + rank_a), 0.0)
                 + COALESCE(1.0 / (60 + rank_b), 0.0), 6) AS rrf_score
    FROM trank FULL OUTER JOIN vrank USING (doc_id)
    ORDER BY rrf_score DESC, doc_id ASC
    LIMIT 15
    """,
)
def hybrid_rrf_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: BM25 top-25 (3-term query) fused with vector
    top-25 (cosine to embedding 0) by reciprocal-rank fusion
    (functions/similarity.rrf_fuse). Each leg reuses its verified
    machinery; the fusion itself only ever joins k-sized lists."""
    from pyspark.sql import Window as W2

    docs = load_table(spark, sf_dir, "documents")
    emb = scattered(load_table(spark, sf_dir, "embeddings"))
    text = TXT.bm25_top_docs(docs, ["hash", "merge", "window"], k=25)
    trank = text.select(
        "doc_id",
        F.row_number()
        .over(W2.orderBy(F.col("score").desc(), F.col("doc_id")))
        .alias("rank"),
    )
    vec = S.knn_bruteforce(
        emb, emb.filter(F.col("vec_id") == 0), k=25
    ).select(F.col("neighbor_id").alias("doc_id"), F.col("rank"))
    fused = S.rrf_fuse(trank, vec, k_rrf=60, top=15)
    return fused.select(
        "doc_id",
        F.col("rank_a").cast("int").alias("rank_a"),
        F.col("rank_b").cast("int").alias("rank_b"),
        "rrf_score",
    )


@_q(
    "incremental_dedup_report",
    """
    WITH newd AS (SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1),
    oldd AS (SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0),
    nsh AS (
      SELECT DISTINCT doc_id, shingle FROM (
        SELECT doc_id,
               UNNEST(list_transform(
                 generate_series(1, GREATEST(LEN(t) - 2, 0)),
                 i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle
        FROM (SELECT doc_id, string_split(text, ' ') AS t FROM newd))),
    osh AS (
      SELECT DISTINCT doc_id AS old_id, shingle FROM (
        SELECT doc_id,
               UNNEST(list_transform(
                 generate_series(1, GREATEST(LEN(t) - 2, 0)),
                 i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle
        FROM (SELECT doc_id, string_split(text, ' ') AS t FROM oldd))),
    nsz AS (SELECT doc_id, COUNT(*) AS n_new FROM nsh GROUP BY doc_id),
    osz AS (SELECT old_id, COUNT(*) AS n_old FROM osh GROUP BY old_id),
    ij AS (
      SELECT n.doc_id, o.old_id, COUNT(*) AS n_inter
      FROM nsh n JOIN osh o USING (shingle)
      GROUP BY n.doc_id, o.old_id),
    scoredp AS (
      SELECT ij.doc_id, ij.old_id,
             ij.n_inter / CAST(nsz.n_new + osz.n_old - ij.n_inter AS DOUBLE)
               AS jaccard
      FROM ij JOIN nsz USING (doc_id) JOIN osz USING (old_id)),
    best AS (
      SELECT doc_id, old_id AS best_match, jaccard AS best_jaccard FROM (
        SELECT doc_id, old_id, jaccard,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY jaccard DESC, old_id ASC) AS rn
        FROM scoredp) WHERE rn = 1),
    ex AS (
      SELECT n.doc_id, MIN(o.doc_id) AS exact_dup_of
      FROM newd n LEFT JOIN oldd o ON md5(n.text) = md5(o.text)
      GROUP BY n.doc_id)
    SELECT ex.doc_id, ex.exact_dup_of, best.best_match,
           ROUND(COALESCE(best.best_jaccard, -1.0), 4) AS best_jaccard,
           CASE WHEN ex.exact_dup_of IS NOT NULL THEN 'exact_dup'
                WHEN COALESCE(best.best_jaccard, -1.0) >= 0.2
                  THEN 'near_dup'
                ELSE 'unique' END AS verdict
    FROM ex LEFT JOIN best USING (doc_id)
    """,
)
def incremental_dedup_report_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Append-only ingestion dedup (functions/dedup.incremental_dedup_report):
    odd-id docs screened against the even-id standing corpus — exact hash
    screen + new-against-old-only shingle inverted index, never old×old."""
    docs = scattered(load_table(spark, sf_dir, "documents"))
    return D.incremental_dedup_report(
        docs.filter(F.col("doc_id") % 2 == 1),
        docs.filter(F.col("doc_id") % 2 == 0),
        threshold=0.2,
        n=3,
    )


@_q(
    "knn_label_propagation",
    """
    WITH q AS (
      SELECT vec_id AS query_id, embedding AS qv, label AS true_label
      FROM embeddings WHERE vec_id % 20 = 0),
    c AS (
      SELECT vec_id AS neighbor_id, embedding AS cv, label AS nb_label
      FROM embeddings WHERE vec_id % 20 <> 0),
    scored AS (
      SELECT q.query_id, q.true_label, c.neighbor_id, c.nb_label,
             list_sum(list_transform(generate_series(1, 64),
               i -> qv[i]::DOUBLE * cv[i]::DOUBLE))
             / (sqrt(list_sum(list_transform(generate_series(1, 64),
                  i -> qv[i]::DOUBLE * qv[i]::DOUBLE)))
                * sqrt(list_sum(list_transform(generate_series(1, 64),
                    i -> cv[i]::DOUBLE * cv[i]::DOUBLE)))) AS sim
      FROM c, q),
    topk AS (
      SELECT query_id, true_label, nb_label FROM (
        SELECT query_id, true_label, nb_label,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY sim DESC, neighbor_id) AS rnk
        FROM scored) WHERE rnk <= 5),
    votes AS (
      SELECT query_id, true_label, nb_label, COUNT(*) AS vote_n
      FROM topk GROUP BY 1, 2, 3)
    SELECT query_id AS vec_id, nb_label AS predicted_label,
           CAST(vote_n AS INT) AS vote_n, true_label,
           nb_label = true_label AS agrees
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY vote_n DESC, nb_label ASC)
                      AS r
          FROM votes) WHERE r = 1
    """,
)
def knn_label_propagation_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weak supervision by k-NN majority vote with leave-out accuracy
    riding along (functions/similarity.knn_label_propagation): every 20th
    vector is held out and relabeled from its 5 nearest labeled
    neighbors."""
    emb = scattered(load_table(spark, sf_dir, "embeddings"))
    return S.knn_label_propagation(emb, F.col("vec_id") % 20 == 0, k=5)


@_q(
    "temperature_mixture_sample",
    """
    WITH shares AS (SELECT source, COUNT(*) AS n_g FROM documents
                    GROUP BY source),
    raw AS (SELECT source,
                   POW(n_g / CAST((SELECT SUM(n_g) FROM shares) AS DOUBLE),
                       0.7 - 1.0) AS rr
            FROM shares),
    rates AS (SELECT source,
                     ROUND(rr / (SELECT MAX(rr) FROM raw), 6) AS keep_rate
              FROM raw)
    SELECT d.doc_id, d.source, r.keep_rate,
           (('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || 'mix'), 1, 13))::BIGINT + 1)
             / CAST(16::HUGEINT ** 13 AS DOUBLE) <= r.keep_rate AS sampled
    FROM documents d JOIN rates r USING (source)
    """,
)
def temperature_mixture_sample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based source rebalancing (α=0.7 exponentiated sampling
    — the multilingual mixing rule): rare sources up-sampled, dominant
    ones down-sampled, deterministic md5-uniform verdicts
    (functions/sampling.temperature_mixture_sample)."""
    from open_ftth_relational_projector_spark.functions.sampling import (
        temperature_mixture_sample,
    )

    return temperature_mixture_sample(
        scattered(load_table(spark, sf_dir, "documents")),
        alpha=0.7,
        salt="mix",
    )


@_q(
    "length_bucketed_batches",
    """
    WITH base AS (
      SELECT doc_id, LEN(string_split(text, ' ')) AS n_tokens
      FROM documents),
    b AS (SELECT doc_id, CAST(n_tokens AS INT) AS n_tokens,
                 CASE WHEN n_tokens < 64 THEN 0
                      WHEN n_tokens < 128 THEN 1
                      WHEN n_tokens < 256 THEN 2
                      ELSE 3 END AS bucket
          FROM base),
    r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY bucket
                                       ORDER BY doc_id) AS rn
          FROM b),
    wb AS (SELECT doc_id, n_tokens, bucket,
                  CAST(FLOOR((rn - 1) / 8) AS INT) AS batch_id
           FROM r)
    SELECT doc_id, n_tokens, bucket, batch_id,
           CAST(MAX(n_tokens) OVER (PARTITION BY bucket, batch_id)
                - n_tokens AS INT) AS pad_waste
    FROM wb
    """,
)
def length_bucketed_batches_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batch assignment for padding efficiency
    (functions/sampling.length_bucketed_batches): bucket by token count,
    deterministic batch ids within buckets, per-doc pad waste vs the
    batch max."""
    from open_ftth_relational_projector_spark.functions.sampling import (
        length_bucketed_batches,
    )

    return length_bucketed_batches(
        scattered(load_table(spark, sf_dir, "documents")),
        bucket_edges=[64, 128, 256],
        batch_size=8,
    )


@_q(
    "winnow_fingerprints",
    """
    WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t
                 FROM documents),
    h AS (SELECT doc_id,
                 [('0x' || substr(md5(t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                                      || ' ' || t[i+3] || '#0'), 1, 15))::BIGINT
                  FOR i IN range(1, len(t) - 2)] AS hs
          FROM tok),
    w AS (SELECT doc_id,
                 CASE WHEN len(hs) >= 5
                        THEN [list_min(hs[i:i+4])
                              FOR i IN range(1, len(hs) - 3)]
                      WHEN len(hs) > 0 THEN [list_min(hs)]
                      ELSE [] END AS fps
          FROM h)
    SELECT DISTINCT doc_id, fingerprint FROM (
      SELECT doc_id, UNNEST(list_distinct(fps)) AS fingerprint FROM w)
    """,
)
def winnow_fingerprints_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprints (Schleimer et al., SIGMOD 2003 — MOSS):
    min-hash of each sliding window of 4-gram hashes, guaranteeing any
    shared substring of length ≥ 8 tokens shares a fingerprint at ~2/6 the
    storage (functions/dedup.winnow_fingerprints, md5-portable)."""
    return D.winnow_fingerprints(
        scattered(load_table(spark, sf_dir, "documents")), k=4, window=5
    )




# α_256 = 0.7213/(1+1.079/256), computed once in Python and inlined as the
# identical IEEE-double literal on both engines (a bare decimal literal would
# parse as DECIMAL on Spark and diverge from DuckDB's double arithmetic)
from open_ftth_relational_projector_spark.functions.sketches import (
    HLL_ALPHA as _HLL_ALPHA_F,
)

# one IEEE-double literal, derived from THE shared constant so the batch
# function, the streaming fold and every oracle agree bit-for-bit
_HLL_ALPHA = repr(_HLL_ALPHA_F)


@_q(
    "hll_distinct_rollup",
    f"""
    WITH h AS (SELECT event_type, CAST(ts AS DATE) AS day,
                 ('0x' || substr(md5(CAST(user_id AS VARCHAR) || '#7'), 1, 15))::BIGINT AS hv
               FROM events),
    hb AS (SELECT event_type, day, hv // 4503599627370496 AS bucket,
                  CASE WHEN hv % 4503599627370496 = 0 THEN 53
                       ELSE 53 - length(bin(hv % 4503599627370496)) END AS rho
           FROM h),
    cell AS (SELECT event_type, day, bucket, MAX(rho) AS mx
             FROM hb GROUP BY event_type, day, bucket),
    merged AS (SELECT event_type, bucket, MAX(mx) AS mx
               FROM cell GROUP BY event_type, bucket),
    direct AS (SELECT event_type, bucket, MAX(rho) AS mx
               FROM hb GROUP BY event_type, bucket),
    ms AS (SELECT event_type, COUNT(*) AS nz, SUM(pow(2.0, -mx)) AS pz,
                  SUM(bucket * 64 + mx) AS sig_s, MAX(bucket * 64 + mx) AS sig_m
           FROM merged GROUP BY event_type),
    ds AS (SELECT event_type, COUNT(*) AS nz,
                  SUM(bucket * 64 + mx) AS sig_s, MAX(bucket * 64 + mx) AS sig_m
           FROM direct GROUP BY event_type),
    ex AS (SELECT event_type, COUNT(DISTINCT user_id) AS n
           FROM events GROUP BY event_type)
    SELECT ms.event_type,
           CAST(ex.n AS BIGINT) AS exact_distinct,
           ROUND(CASE WHEN CAST({_HLL_ALPHA} AS DOUBLE) * 65536 / ((256 - ms.nz) + ms.pz) <= 640.0
                       AND ms.nz < 256
                      THEN CAST(256 AS DOUBLE) * ln(CAST(256 AS DOUBLE) / (256 - ms.nz))
                      ELSE CAST({_HLL_ALPHA} AS DOUBLE) * 65536 / ((256 - ms.nz) + ms.pz)
                 END, 4) AS hll_est,
           CAST(ms.nz AS INT) AS registers_used,
           (ms.nz = ds.nz AND ms.sig_s = ds.sig_s AND ms.sig_m = ds.sig_m)
             AS merge_lossless
    FROM ms JOIN ds ON ms.event_type = ds.event_type
    JOIN ex ON ms.event_type = ex.event_type
    """,
)
def hll_distinct_rollup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-user sketches per (event_type, day), max-merged
    to event_type and compared to the exact COUNT DISTINCT — the
    register-vector sibling of kmv_distinct_rollup: constant 256 bytes per
    cell at any cardinality (functions/sketches.hll_distinct_rollup,
    md5-portable hash, integer-exact ρ). The oracle replays registers,
    merge, the α·m²/Σ2^-M estimator, and the linear-counting fallback
    bit-for-bit in SQL."""
    from open_ftth_relational_projector_spark.functions.sketches import (
        hll_distinct_rollup,
    )

    ev = load_table(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))
    return hll_distinct_rollup(ev, "event_type", "day", "user_id", seed=7)


# hdr_quantile_rollup's constants, shared verbatim with the oracle text so
# the bound literal and k cannot drift apart
_HDR_K = 64
_HDR_BOUND = repr(1.0 / (2 * _HDR_K) + 1e-12)


def _hdr_bucket_sql(v: str) -> str:
    """DuckDB expression for the log-linear bucket id of ``v`` (positive
    BIGINT) — the oracle twin of functions/sketches.hdr_bucket_expr at
    k=_HDR_K, including its large-octave right-shift form (the naive
    multiply overflows int64 for v >= ~2^57). Change them together."""
    lg = _HDR_K.bit_length() - 1
    e = f"(length(bin({v})) - 1)"
    low = f"{v} - (1::BIGINT << {e})"
    return (
        f"{e} * {_HDR_K} + (CASE WHEN {e} >= {lg}"
        f" THEN ({low}) >> ({e} - {lg})"
        f" ELSE (({low}) * {_HDR_K}) // (1::BIGINT << {e}) END)"
    )


def _hdr_sel(q: str, tag: str) -> str:
    return (
        f"MIN(CASE WHEN cum >= CEIL(CAST({q} AS DOUBLE) * CAST(ms.n AS DOUBLE))"
        f" THEN bucket END) AS _b{tag}"
    )


def _hdr_est(b: str) -> str:
    return (
        f"CAST((1::BIGINT << ({b} // {_HDR_K})) AS DOUBLE)"
        f" * (2 * {_HDR_K} + 2 * ({b} % {_HDR_K}) + 1) / (2 * {_HDR_K})"
    )


def _hdr_out(tag: str) -> str:
    e = _hdr_est(f"_b{tag}")
    return (
        f"ROUND({e}, 4) AS est_{tag}, exact_{tag},"
        f" (abs({e} - exact_{tag}) / exact_{tag} <= {_HDR_BOUND}) AS ok_{tag}"
    )


@_q(
    "hdr_quantile_rollup",
    f"""
    WITH bk AS (
      SELECT lang, source, CAST(n_chars AS BIGINT) AS v,
             {_hdr_bucket_sql('CAST(n_chars AS BIGINT)')} AS bucket
      FROM documents WHERE n_chars >= 1),
    cell AS (SELECT lang, source, bucket, COUNT(*) AS c
             FROM bk GROUP BY lang, source, bucket),
    merged AS (SELECT lang, bucket, SUM(c) AS c FROM cell GROUP BY lang, bucket),
    direct AS (SELECT lang, bucket, COUNT(*) AS c FROM bk GROUP BY lang, bucket),
    ms AS (SELECT lang, COUNT(*) AS nb, SUM(c) AS n, SUM(bucket * c) AS sig_s,
                  MAX(bucket) AS sig_m FROM merged GROUP BY lang),
    ds AS (SELECT lang, COUNT(*) AS nb, SUM(c) AS n, SUM(bucket * c) AS sig_s,
                  MAX(bucket) AS sig_m FROM direct GROUP BY lang),
    cum AS (SELECT lang, bucket,
                   SUM(c) OVER (PARTITION BY lang ORDER BY bucket) AS cum
            FROM merged),
    sel AS (SELECT cum.lang,
                   {_hdr_sel('0.5', 'p50')},
                   {_hdr_sel('0.9', 'p90')},
                   {_hdr_sel('0.99', 'p99')}
            FROM cum JOIN ms ON cum.lang = ms.lang GROUP BY cum.lang),
    ex AS (SELECT lang,
             CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY v) AS BIGINT) AS exact_p50,
             CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY v) AS BIGINT) AS exact_p90,
             CAST(percentile_disc(0.99) WITHIN GROUP (ORDER BY v) AS BIGINT) AS exact_p99
           FROM bk GROUP BY lang)
    SELECT ms.lang AS lang, CAST(ms.n AS BIGINT) AS n,
           {_hdr_out('p50')},
           {_hdr_out('p90')},
           {_hdr_out('p99')},
           (ms.nb = ds.nb AND ms.n = ds.n AND ms.sig_s = ds.sig_s
            AND ms.sig_m = ds.sig_m) AS merge_lossless
    FROM ms JOIN ds ON ms.lang = ds.lang
    JOIN sel ON ms.lang = sel.lang
    JOIN ex ON ms.lang = ex.lang
    """,
)
def hdr_quantile_rollup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-linear mergeable quantile sketches per (lang, source), SUM-merged
    to lang and read at p50/p90/p99 with a guaranteed relative error
    ≤ 1/(2k) — the percentile sibling of the KMV/HLL rollups
    (functions/sketches.hdr_quantile_rollup; HdrHistogram/DDSketch family,
    Masson et al. VLDB 2019). Bucketing is integer-exact (bin-string
    floor-log2 + linear sub-bucket division — no float log touches data),
    so the oracle replays bucket ids, the merge signature, the
    cumulative-rank quantile read, and the midpoint estimator verbatim;
    exact percentile_disc and the error-bound booleans ride along as the
    live proof."""
    from open_ftth_relational_projector_spark.functions.sketches import (
        hdr_quantile_rollup,
    )

    return hdr_quantile_rollup(
        load_table(spark, sf_dir, "documents"),
        "lang",
        "source",
        "n_chars",
        k=_HDR_K,
        quantiles=(0.5, 0.9, 0.99),
    )
