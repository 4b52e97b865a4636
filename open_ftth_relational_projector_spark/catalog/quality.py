"""Corpus-quality / decontamination surface.

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


# ===========================================================================
# 9. Corpus-quality / decontamination surface (functions/quality.py,
#    dedup.py cross-doc, similarity.py centroid audit)
# ===========================================================================


@_q(
    "repetition_stats",
    """
    WITH tok AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    big AS (
      SELECT doc_id,
             UNNEST([toks[i] || ' ' || toks[i+1] FOR i IN range(1, len(toks))])
               AS bigram
      FROM tok
    ),
    cnt AS (SELECT doc_id, bigram, COUNT(*) AS c FROM big GROUP BY 1, 2)
    SELECT doc_id,
           CAST(SUM(c) AS BIGINT) AS n_bigrams,
           ROUND(1.0 - COUNT(*) / SUM(c), 4) AS dup_bigram_frac,
           ROUND(MAX(c) / SUM(c), 4) AS top_bigram_frac
    FROM cnt GROUP BY doc_id
    """,
)
def repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from open_ftth_relational_projector_spark.functions import quality as Q

    return Q.repetition_stats(scattered(load_table(spark, sf_dir, "documents")))


@_q(
    "token_entropy",
    """
    WITH cnt AS (
      SELECT doc_id, tok, COUNT(*) AS c
      FROM (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents)
      GROUP BY 1, 2
    )
    SELECT doc_id,
           CAST(SUM(c) AS BIGINT) AS n_tokens,
           ROUND(LN(SUM(c)) - SUM(c * LN(c)) / SUM(c), 4) AS entropy
    FROM cnt GROUP BY doc_id
    """,
)
def token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from open_ftth_relational_projector_spark.functions import quality as Q

    return Q.token_entropy(scattered(load_table(spark, sf_dir, "documents")))


@_q(
    "pii_scan",
    r"""
    WITH aug AS (
      SELECT doc_id,
             text
             || CASE WHEN doc_id % 7 = 0
                     THEN ' contact user' || doc_id || '@example.com'
                     ELSE '' END
             || CASE WHEN doc_id % 11 = 0
                     THEN ' call 555-' || (1000 + doc_id % 9000)
                     ELSE '' END
             || CASE WHEN doc_id % 13 = 0
                     THEN ' host 10.0.' || (doc_id % 256) || '.' || (doc_id % 100)
                     ELSE '' END AS text
      FROM documents
    )
    SELECT doc_id,
           CAST(LEN(regexp_extract_all(text, '[a-z0-9]+@[a-z0-9]+\.[a-z]+'))
                AS INTEGER) AS n_emails,
           CAST(LEN(regexp_extract_all(text, '\d{3}-\d{4}')) AS INTEGER)
             AS n_phones,
           CAST(LEN(regexp_extract_all(text, '\d+\.\d+\.\d+\.\d+')) AS INTEGER)
             AS n_ips,
           MD5(regexp_replace(
                 regexp_replace(
                   regexp_replace(text, '[a-z0-9]+@[a-z0-9]+\.[a-z]+',
                                  '<EMAIL>', 'g'),
                   '\d{3}-\d{4}', '<PHONE>', 'g'),
                 '\d+\.\d+\.\d+\.\d+', '<IP>', 'g')) AS redacted_md5
    FROM aug
    """,
)
def pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from open_ftth_relational_projector_spark.functions import quality as Q

    docs = scattered(load_table(spark, sf_dir, "documents"))
    return Q.pii_scan(Q.with_synthetic_pii(docs))


@_q(
    "cross_doc_shingle_dup",
    """
    WITH tok AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    sh AS (
      SELECT DISTINCT doc_id, shingle FROM (
        SELECT doc_id,
               UNNEST([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' '
                       || toks[i+3] || ' ' || toks[i+4]
                       FOR i IN range(1, len(toks) - 3)]) AS shingle
        FROM tok)
    ),
    cnt AS (SELECT shingle, COUNT(*) AS df FROM sh GROUP BY 1)
    SELECT doc_id,
           CAST(COUNT(*) AS INTEGER) AS n_shingles,
           CAST(SUM(CASE WHEN df > 1 THEN 1 ELSE 0 END) AS INTEGER) AS n_shared,
           ROUND(SUM(CASE WHEN df > 1 THEN 1 ELSE 0 END) / COUNT(*), 4)
             AS shared_frac
    FROM sh JOIN cnt USING (shingle)
    GROUP BY doc_id
    """,
)
def cross_doc_shingle_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.cross_doc_shingle_dup(
        scattered(load_table(spark, sf_dir, "documents"))
    )


@_q(
    "benchmark_decontamination",
    """
    WITH tok AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    allsh AS (
      SELECT DISTINCT doc_id, shingle FROM (
        SELECT doc_id,
               UNNEST([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' '
                       || toks[i+3] || ' ' || toks[i+4] || ' ' || toks[i+5]
                       || ' ' || toks[i+6] || ' ' || toks[i+7]
                       FOR i IN range(1, len(toks) - 6)]) AS shingle
        FROM tok)
    ),
    eval_sh AS (SELECT DISTINCT shingle FROM allsh WHERE doc_id % 50 = 0)
    SELECT t.doc_id,
           CAST(SUM(CASE WHEN e.shingle IS NOT NULL THEN 1 ELSE 0 END)
                AS INTEGER) AS n_overlap,
           SUM(CASE WHEN e.shingle IS NOT NULL THEN 1 ELSE 0 END) > 0
             AS contaminated
    FROM (SELECT * FROM allsh WHERE doc_id % 50 <> 0) t
    LEFT JOIN eval_sh e USING (shingle)
    GROUP BY t.doc_id
    """,
)
def benchmark_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.benchmark_decontamination(
        scattered(load_table(spark, sf_dir, "documents"))
    )


@_q(
    "label_centroid_stats",
    """
    WITH pe AS (
      SELECT vec_id, label,
             UNNEST(range(1, len(embedding) + 1)) AS pos,
             UNNEST(CAST(embedding AS DOUBLE[])) AS val
      FROM embeddings
    ),
    cent AS (SELECT label, pos, AVG(val) AS cv FROM pe GROUP BY 1, 2),
    per_vec AS (
      SELECT pe.vec_id, pe.label,
             SUM(val * cv) AS dot_vc, SUM(val * val) AS vv, SUM(cv * cv) AS cc
      FROM pe JOIN cent USING (label, pos)
      GROUP BY 1, 2
    )
    SELECT label,
           CAST(COUNT(*) AS INTEGER) AS n_vecs,
           ROUND(AVG(dot_vc / (SQRT(vv) * SQRT(cc))), 4) + 0 AS avg_cos_to_centroid
    FROM per_vec GROUP BY label
    """,
)
def label_centroid_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return S.label_centroid_stats(scattered(load_table(spark, sf_dir, "embeddings")))




# the SQL twin of functions/text.quality_score, shared by the eval
# queries' oracles (edit in ONE place if the weights/bands change)
_QUALITY_SCORE_SQL = """ROUND(
               (CASE WHEN LEN(string_split(text, ' ')) BETWEEN 20 AND 10000
                     THEN 0.4::DOUBLE ELSE 0.0::DOUBLE END
                + CASE WHEN LEN(list_filter(string_split(text, ' '),
                        x -> list_contains(['the','a','and','of','to'], x)))
                        / CAST(LEN(string_split(text, ' ')) AS DOUBLE) > 0.01
                       THEN 0.3::DOUBLE ELSE 0.0::DOUBLE END
                + CASE WHEN LENGTH(regexp_replace(LOWER(text), '[a-z0-9 ]', '', 'g'))
                        / CAST(LENGTH(LOWER(text)) AS DOUBLE) < 0.1
                       THEN 0.3::DOUBLE ELSE 0.0::DOUBLE END), 4)"""


@_q(
    "quality_score_auc",
    f"""
    WITH t AS (
      SELECT lang = 'en' AS pos,
             {_QUALITY_SCORE_SQL} AS s
      FROM documents),
    g AS (
      SELECT s,
             CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS npos,
             CAST(SUM(CASE WHEN pos THEN 0 ELSE 1 END) AS BIGINT) AS nneg
      FROM t GROUP BY s),
    c AS (
      SELECT s, npos, nneg,
             COALESCE(SUM(nneg) OVER (ORDER BY s
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS neg_below
      FROM g),
    tot AS (SELECT SUM(npos) AS p, SUM(nneg) AS n FROM g)
    SELECT CASE WHEN tot.p > 0 AND tot.n > 0
                THEN ROUND(SUM(c.npos * (c.neg_below + c.nneg / 2.0))
                           / (tot.p * tot.n), 4) END AS auc,
           CAST(MAX(tot.p) AS BIGINT) AS n_pos,
           CAST(MAX(tot.n) AS BIGINT) AS n_neg
    FROM c CROSS JOIN tot
    GROUP BY tot.p, tot.n
    """,
)
def quality_score_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC-AUC of the quality_score heuristic as a detector of English
    documents (label = lang == 'en') — the rank-based Mann-Whitney form
    with exact tie handling: AUC = Σ_s npos(s)·(neg_below(s) + nneg(s)/2)
    / (P·N). The classifier-evaluation op a filtering pipeline runs when
    calibrating a quality gate.

    Scale shape: one aggregation collapses the corpus to ONE ROW PER
    DISTINCT SCORE — quality_score's value lattice has ≤8 points (sums of
    fixed weights 0.4/0.3/0.3), so the ordered cumulative pass runs over
    a bounded, data-size-independent frame (audit-exempt, same class as
    the PSI 10-bin spine)."""
    docs = scattered(load_table(spark, sf_dir, "documents"))
    t = docs.select(
        (F.col("lang") == "en").alias("pos"),
        F.round(TXT.quality_score(F.col("text")), 4).alias("s"),
    )
    g = t.groupBy("s").agg(
        F.sum(F.when(F.col("pos"), 1).otherwise(0)).alias("npos"),
        F.sum(F.when(F.col("pos"), 0).otherwise(1)).alias("nneg"),
    )
    w = W.orderBy("s").rowsBetween(W.unboundedPreceding, -1)
    c = g.withColumn("neg_below", F.coalesce(F.sum("nneg").over(w), F.lit(0)))
    tot = g.agg(F.sum("npos").alias("p"), F.sum("nneg").alias("n"))
    return (
        c.crossJoin(F.broadcast(tot))
        .groupBy("p", "n")
        .agg(
            F.sum(
                F.col("npos") * (F.col("neg_below") + F.col("nneg") / 2.0)
            ).alias("_num")
        )
        .select(
            F.when(
                (F.col("p") > 0) & (F.col("n") > 0),
                F.round(F.col("_num") / (F.col("p") * F.col("n")), 4),
            ).alias("auc"),
            F.col("p").cast("long").alias("n_pos"),
            F.col("n").cast("long").alias("n_neg"),
        )
    )


@_q(
    "quality_pr_curve",
    f"""
    WITH t AS (
      SELECT lang = 'en' AS pos,
             {_QUALITY_SCORE_SQL} AS s
      FROM documents),
    g AS (
      SELECT s,
             CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS npos,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM t GROUP BY s),
    tot AS (SELECT SUM(npos) AS p FROM g),
    c AS (
      SELECT s,
             SUM(npos) OVER (ORDER BY s DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tp,
             SUM(n) OVER (ORDER BY s DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS kept
      FROM g)
    SELECT c.s AS threshold,
           CAST(c.kept AS BIGINT) AS n_kept,
           ROUND(c.tp / CAST(c.kept AS DOUBLE), 4) AS precision_at,
           ROUND(c.tp / CAST(tot.p AS DOUBLE), 4) AS recall_at,
           ROUND(2.0 * c.tp / (c.kept + tot.p), 4) AS f1_at
    FROM c CROSS JOIN tot
    """,
)
def quality_pr_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision / recall / F1 of the quality gate at EVERY achievable
    threshold (keep docs with score >= t), label = lang == 'en' — the
    operating-point sweep run when choosing where to set a filter. One
    row per distinct score value; like quality_score_auc the ordered
    pass runs over the bounded (<=8-point) score lattice, never the
    corpus. F1 via the 2TP/(kept+P) identity — division-free of
    precision/recall rounding."""
    docs = scattered(load_table(spark, sf_dir, "documents"))
    t = docs.select(
        (F.col("lang") == "en").alias("pos"),
        F.round(TXT.quality_score(F.col("text")), 4).alias("s"),
    )
    g = t.groupBy("s").agg(
        F.sum(F.when(F.col("pos"), 1).otherwise(0)).alias("npos"),
        F.count(F.lit(1)).alias("n"),
    )
    tot = g.agg(F.sum("npos").alias("p"))
    w = W.orderBy(F.desc("s")).rowsBetween(W.unboundedPreceding, 0)
    c = g.select(
        "s",
        F.sum("npos").over(w).alias("tp"),
        F.sum("n").over(w).alias("kept"),
    )
    return c.crossJoin(F.broadcast(tot)).select(
        F.col("s").alias("threshold"),
        F.col("kept").cast("long").alias("n_kept"),
        F.round(F.col("tp") / F.col("kept").cast("double"), 4).alias(
            "precision_at"
        ),
        F.round(F.col("tp") / F.col("p").cast("double"), 4).alias("recall_at"),
        F.round(2.0 * F.col("tp") / (F.col("kept") + F.col("p")), 4).alias(
            "f1_at"
        ),
    )


@_q(
    "lang_guess_kappa",
    """
    WITH t AS (
      SELECT lang AS truth,
             CASE WHEN c_es > GREATEST(c_en, c_de, c_fr) THEN 'es'
                  WHEN c_fr > GREATEST(c_en, c_de) THEN 'fr'
                  WHEN c_de > c_en THEN 'de'
                  WHEN c_en > 0 THEN 'en'
                  ELSE 'und' END AS guess
      FROM (
        SELECT lang,
               LEN(list_filter(string_split(text,' '), x -> list_contains(['the','a','and','of','to'], x))) AS c_en,
               LEN(list_filter(string_split(text,' '), x -> list_contains(['der','die','das','und','zu'], x))) AS c_de,
               LEN(list_filter(string_split(text,' '), x -> list_contains(['le','la','et','les','des'], x))) AS c_fr,
               LEN(list_filter(string_split(text,' '), x -> list_contains(['el','la','los','y','de'], x))) AS c_es
        FROM documents)),
    n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM t),
    agree AS (SELECT SUM(CASE WHEN truth = guess THEN 1 ELSE 0 END) AS a FROM t),
    m AS (
      SELECT cls, SUM(is_truth) AS row_n, SUM(is_guess) AS col_n FROM (
        SELECT truth AS cls, 1 AS is_truth, 0 AS is_guess FROM t
        UNION ALL
        SELECT guess, 0, 1 FROM t)
      GROUP BY cls),
    pe AS (SELECT SUM(row_n * col_n) AS e FROM m)
    SELECT ROUND(agree.a / n.n, 4) AS observed_agreement,
           ROUND(pe.e / (n.n * n.n), 4) AS expected_agreement,
           ROUND((agree.a / n.n - pe.e / (n.n * n.n))
                 / (1.0 - pe.e / (n.n * n.n)), 4) + 0 AS kappa
    FROM agree CROSS JOIN n CROSS JOIN pe
    """,
)
def lang_guess_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between the ground-truth lang column and the
    stopword-vote lang_guess heuristic — chance-corrected agreement, the
    standard way to report a weak labeler's quality. The confusion mass
    reduces to per-class row/column marginals (one tiny groupBy), so
    everything after the scan is class-cardinality-sized."""
    docs = scattered(load_table(spark, sf_dir, "documents"))
    t = docs.select(
        F.col("lang").alias("truth"),
        TXT.lang_guess(F.col("text")).alias("guess"),
    )
    # ONE corpus scan: the confusion matrix (class-cardinality-sized);
    # totals, agreement, and marginals all derive from it
    cm = t.groupBy("truth", "guess").agg(F.count(F.lit(1)).alias("c"))
    totals = cm.agg(
        F.sum("c").alias("n"),
        F.sum(F.when(F.col("truth") == F.col("guess"), F.col("c")).otherwise(0)).alias("a"),
    )
    rows = cm.groupBy(F.col("truth").alias("cls")).agg(F.sum("c").alias("row_n"))
    cols = cm.groupBy(F.col("guess").alias("cls")).agg(F.sum("c").alias("col_n"))
    e = (
        rows.join(cols, "cls", "full")
        .select(
            (F.coalesce(F.col("row_n"), F.lit(0)) * F.coalesce(F.col("col_n"), F.lit(0))).alias("rc")
        )
        .agg(F.sum("rc").alias("e"))
    )
    po = F.col("a") / F.col("n").cast("double")
    pe = F.col("e") / (F.col("n").cast("double") * F.col("n"))
    return totals.crossJoin(F.broadcast(e)).select(
        F.round(po, 4).alias("observed_agreement"),
        F.round(pe, 4).alias("expected_agreement"),
        F.round((po - pe) / (1.0 - pe), 4).alias("kappa"),
    )


@_q(
    "quality_brier_calibration",
    f"""
    WITH t AS (
      SELECT lang = 'en' AS pos,
             {_QUALITY_SCORE_SQL} AS s
      FROM documents),
    g AS (SELECT s, CAST(COUNT(*) AS BIGINT) AS n,
                 SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS np
          FROM t GROUP BY s),
    tot AS (SELECT SUM(n) AS nn,
                   SUM(n * POW(s - np / CAST(n AS DOUBLE), 2)
                       + np * (1 - np / CAST(n AS DOUBLE))) AS bsum,
                   SUM(n * POW(s - np / CAST(n AS DOUBLE), 2)) AS rel
            FROM g)
    SELECT g.s, g.n AS n_docs,
           ROUND(np / CAST(n AS DOUBLE), 4) AS frac_pos,
           ROUND(s - np / CAST(n AS DOUBLE), 4) + 0 AS calib_gap,
           ROUND(tot.bsum / tot.nn, 4) AS brier,
           ROUND(tot.rel / tot.nn, 4) AS reliability
    FROM g CROSS JOIN tot
    """,
)
def quality_brier_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration table + Brier score of the quality_score heuristic read
    as P(lang = 'en'): per score point, empirical positive rate and the
    calibration gap; globally, the Brier score and its reliability term
    (per-bin decomposition — within a bin the prediction is constant, so
    Σn_k[(s_k-p̄_k)² + p̄_k(1-p̄_k)]/N equals the doc-level mean squared
    error exactly). Completes the classifier-eval family (AUC, PR curve,
    kappa) with the proper-scoring-rule view.

    Scale shape: same bounded lattice as quality_score_auc — one corpus
    aggregation to ≤8 score rows, everything downstream data-size
    independent."""
    docs = scattered(load_table(spark, sf_dir, "documents"))
    t = docs.select(
        (F.col("lang") == "en").alias("pos"),
        F.round(TXT.quality_score(F.col("text")), 4).alias("s"),
    )
    g = t.groupBy("s").agg(
        F.expr("CAST(count(*) AS BIGINT) AS n"),
        F.expr("sum(CASE WHEN pos THEN 1 ELSE 0 END) AS np"),
    )
    tot = g.agg(
        F.expr("sum(n) AS nn"),
        F.expr(
            "sum(n * pow(s - np / CAST(n AS DOUBLE), 2)"
            " + np * (1 - np / CAST(n AS DOUBLE))) AS bsum"
        ),
        F.expr("sum(n * pow(s - np / CAST(n AS DOUBLE), 2)) AS rel"),
    )
    return g.crossJoin(F.broadcast(tot)).selectExpr(
        "s",
        "n AS n_docs",
        "ROUND(np / CAST(n AS DOUBLE), 4) AS frac_pos",
        "ROUND(s - np / CAST(n AS DOUBLE), 4) + 0 AS calib_gap",
        "ROUND(bsum / nn, 4) AS brier",
        "ROUND(rel / nn, 4) AS reliability",
    )
