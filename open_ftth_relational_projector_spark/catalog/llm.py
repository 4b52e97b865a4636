"""LLM-pipeline surface: text, dedup, similarity, multimodal.

Split out of the single-file catalog (round-4 verdict #6); registration
order preserved — see catalog/__init__.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F, Window as W  # noqa: F401

from open_ftth_relational_projector_spark.sources.tables import load_table, scattered  # noqa: F401
from open_ftth_relational_projector_spark.cache import tracked_persist  # noqa: F401
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
# 4. LLM-pipeline surface: text, dedup, similarity, multimodal
# ===========================================================================


@_q(
    "text_stats",
    """
    SELECT doc_id,
           LEN(string_split(text, ' ')) AS n_tokens,
           LENGTH(text) AS n_chars_actual,
           ROUND(LEN(LIST_FILTER(string_split(text, ' '), t -> t = 'the'))
                 / CAST(LEN(string_split(text, ' ')) AS DOUBLE), 4) AS the_ratio
    FROM documents
    """,
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = scattered(load_table(spark, sf_dir, "documents"))
    toks = TXT.tokens(F.col("text"))
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.length("text").alias("n_chars_actual"),
        _r4(
            F.size(F.filter(toks, lambda t: t == "the"))
            / F.size(toks).cast("double")
        ).alias("the_ratio"),
    )


@_q(
    "token_counts_bpe",
    """
    SELECT doc_id,
           LEN(string_split(text, ' ')) AS ws_tokens,
           LEN(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]'))
               AS subword_tokens
    FROM documents
    """,
)
def token_counts_bpe_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace vs BPE-ish pre-tokenization token counts per document —
    the token-budget accounting pass of an LLM-corpus pipeline. Both counts
    are single-pass JVM expressions over the scan (no shuffle, no UDF)."""
    docs = scattered(load_table(spark, sf_dir, "documents"))
    return docs.select(
        "doc_id",
        TXT.token_count(F.col("text")).alias("ws_tokens"),
        TXT.subword_token_count(F.col("text")).alias("subword_tokens"),
    )


@_q(
    "lang_quality_stats",
    """
    WITH scored AS (
      SELECT lang, LEN(string_split(text, ' ')) AS n_tokens, n_chars
      FROM documents)
    SELECT lang, COUNT(*) AS n_docs,
           ROUND(AVG(n_tokens), 4) AS avg_tokens,
           ROUND(AVG(n_chars), 4) AS avg_chars
    FROM scored GROUP BY lang
    """,
)
def lang_quality_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("lang", TXT.token_count(F.col("text")).alias("n_tokens"), "n_chars")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            _r4(F.avg("n_tokens")).alias("avg_tokens"),
            _r4(F.avg("n_chars")).alias("avg_chars"),
        )
    )


@_q(
    "exact_dedup_groups",
    """
    SELECT md5(text) AS text_hash, COUNT(*) AS n_copies, MIN(doc_id) AS canonical_id
    FROM documents GROUP BY md5(text)
    """,
)
def exact_dedup_groups_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.exact_dedup_groups(load_table(spark, sf_dir, "documents"))


@_q(
    "doc_fingerprint_groups",
    """
    SELECT md5(TRIM(regexp_replace(LOWER(text), '\\s+', ' ', 'g'))) AS fingerprint,
           COUNT(*) AS n_docs, MIN(doc_id) AS canonical_id
    FROM documents
    GROUP BY fingerprint
    """,
)
def doc_fingerprint_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = scattered(load_table(spark, sf_dir, "documents"))
    return (
        docs.select(TXT.fingerprint(F.col("text")).alias("fingerprint"), "doc_id")
        .groupBy("fingerprint")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("canonical_id"))
    )


@_q(
    "ngram_jaccard_pairs",
    """
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (
      SELECT doc_id,
             UNNEST(list_distinct(list_transform(
               generate_series(1, GREATEST(LEN(t) - 2, 0)),
               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS shingle
      FROM toks),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id)
    SELECT i.doc_a, i.doc_b,
           ROUND(n_inter / CAST(sa.n + sb.n - n_inter AS DOUBLE), 4) AS jaccard
    FROM inter i
    JOIN sizes sa ON i.doc_a = sa.doc_id
    JOIN sizes sb ON i.doc_b = sb.doc_id
    WHERE n_inter / CAST(sa.n + sb.n - n_inter AS DOUBLE) >= 0.05
    """,
)
def ngram_jaccard_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = D.ngram_jaccard_pairs(
        scattered(load_table(spark, sf_dir, "documents")), threshold=0.05, n=3
    )
    return out.select("doc_a", "doc_b", _r4(F.col("jaccard")).alias("jaccard"))


@_q(
    "containment_near_dups",
    """
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (
      SELECT doc_id,
             UNNEST(list_distinct(list_transform(
               generate_series(1, GREATEST(LEN(t) - 2, 0)),
               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS shingle
      FROM toks),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
    d AS (
      SELECT i.doc_a AS contained, i.doc_b AS container,
             ROUND(i.n_inter / CAST(sa.n AS DOUBLE), 4) AS containment
      FROM inter i JOIN sizes sa ON i.doc_a = sa.doc_id
      UNION ALL
      SELECT i.doc_b, i.doc_a, ROUND(i.n_inter / CAST(sb.n AS DOUBLE), 4)
      FROM inter i JOIN sizes sb ON i.doc_b = sb.doc_id)
    SELECT contained, container, containment
    FROM d WHERE containment >= 0.2
    """,
)
def containment_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric shingle containment ≥ 0.2 over the corpus
    (functions/dedup.containment_pairs) — the quote/subset detector that
    catches a paragraph wholly copied into a longer document, which
    Jaccard structurally under-scores; dedup policy drops the CONTAINED
    side. Same inverted-index scale shape as ngram_jaccard_pairs."""
    return D.containment_pairs(
        scattered(load_table(spark, sf_dir, "documents")), threshold=0.2, n=3
    )


@_q(
    "dedup_clusters",
    """
    WITH RECURSIVE toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (
      SELECT doc_id,
             UNNEST(list_distinct(list_transform(
               generate_series(1, GREATEST(LEN(t) - 2, 0)),
               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS shingle
      FROM toks),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id),
    pairs AS (
      SELECT i.doc_a, i.doc_b
      FROM inter i
      JOIN sizes sa ON i.doc_a = sa.doc_id
      JOIN sizes sb ON i.doc_b = sb.doc_id
      WHERE n_inter / CAST(sa.n + sb.n - n_inter AS DOUBLE) >= 0.05),
    edges AS (
      SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs),
    reach(src, node) AS (
      SELECT a, a FROM edges
      UNION
      SELECT r.src, e.b FROM reach r JOIN edges e ON r.node = e.a)
    SELECT src AS doc_id, MIN(node) AS component_id
    FROM reach GROUP BY src
    """,
)
def dedup_clusters_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup PAIRS → dedup CLUSTERS: connected components by iterative
    min-label propagation (functions/graph.py) over the exact n-gram
    Jaccard pairs; the oracle derives the same components via a recursive
    transitive-closure CTE. component_id = min doc_id of the cluster, i.e.
    the canonical document a dedup pass would keep."""
    from open_ftth_relational_projector_spark.functions.graph import (
        connected_components,
    )

    pairs = D.ngram_jaccard_pairs(
        scattered(load_table(spark, sf_dir, "documents")), threshold=0.05, n=3
    )
    return connected_components(pairs)


@_q(
    "corpus_filter_report",
    """
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks, LOWER(text) AS low
      FROM documents),
    c AS (
      SELECT doc_id,
             LEN(toks) AS n,
             LEN(list_filter(toks, x -> list_contains(['the','a','and','of','to'], x))) AS c_en,
             LEN(list_filter(toks, x -> list_contains(['der','die','das','und','zu'], x))) AS c_de,
             LEN(list_filter(toks, x -> list_contains(['le','la','et','les','des'], x))) AS c_fr,
             LEN(list_filter(toks, x -> list_contains(['el','la','los','y','de'], x))) AS c_es,
             LENGTH(regexp_replace(low, '[a-z0-9 ]', '', 'g'))
               / CAST(LENGTH(low) AS DOUBLE) AS pr
      FROM t),
    s AS (
      SELECT doc_id, n,
             (CASE WHEN n BETWEEN 20 AND 10000 THEN 0.4::DOUBLE ELSE 0.0::DOUBLE END
              + CASE WHEN c_en / CAST(n AS DOUBLE) > 0.01 THEN 0.3::DOUBLE ELSE 0.0::DOUBLE END
              + CASE WHEN pr < 0.1 THEN 0.3::DOUBLE ELSE 0.0::DOUBLE END) AS quality,
             CASE WHEN c_es > GREATEST(c_en, c_de, c_fr) THEN 'es'
                  WHEN c_fr > GREATEST(c_en, c_de) THEN 'fr'
                  WHEN c_de > c_en THEN 'de'
                  WHEN c_en > 0 THEN 'en'
                  ELSE 'und' END AS lang_guess
      FROM c)
    SELECT doc_id, CAST(n AS INTEGER) AS n_tokens,
           ROUND(quality, 4) AS quality, lang_guess,
           quality >= 0.7 AND lang_guess = 'en' AS keep
    FROM s
    """,
)
def corpus_filter_report_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The quality-filter verdict a C4/RefinedWeb-style pipeline executes
    per document: composite quality score (length band + stopword presence
    + punctuation ratio, text.quality_score), stopword-vote language guess
    (text.lang_guess, ties resolved in fixed en/de/fr/es order), and the
    resulting keep decision. Single-pass row-local JVM expressions; the
    oracle re-derives score and vote in SQL."""
    docs = scattered(load_table(spark, sf_dir, "documents"))
    qual = TXT.quality_score(F.col("text"))
    guessed = TXT.lang_guess(F.col("text"))
    return docs.select(
        "doc_id",
        TXT.token_count(F.col("text")).alias("n_tokens"),
        _r4(qual).alias("quality"),
        guessed.alias("lang_guess"),
        ((qual >= 0.7) & (guessed == F.lit("en"))).alias("keep"),
    )


@_q(
    "dedup_keep_list",
    """
    WITH RECURSIVE toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (
      SELECT doc_id,
             UNNEST(list_distinct(list_transform(
               generate_series(1, GREATEST(LEN(t) - 2, 0)),
               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS shingle
      FROM toks),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id),
    pairs AS (
      SELECT i.doc_a, i.doc_b
      FROM inter i
      JOIN sizes sa ON i.doc_a = sa.doc_id
      JOIN sizes sb ON i.doc_b = sb.doc_id
      WHERE n_inter / CAST(sa.n + sb.n - n_inter AS DOUBLE) >= 0.05),
    edges AS (
      SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs),
    reach(src, node) AS (
      SELECT a, a FROM edges
      UNION
      SELECT r.src, e.b FROM reach r JOIN edges e ON r.node = e.a),
    comp AS (
      SELECT src AS doc_id, MIN(node) AS component_id
      FROM reach GROUP BY src)
    SELECT d.doc_id,
           COALESCE(c.component_id, d.doc_id) AS component_id,
           COALESCE(c.component_id, d.doc_id) = d.doc_id AS keep
    FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id
    """,
)
def dedup_keep_list_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup DECISION a corpus pipeline actually executes: every doc
    mapped to its near-dup component (exact n-gram Jaccard pairs →
    connected components) with keep = is-the-canonical-member; singleton
    docs keep themselves. Composes ngram_jaccard_pairs + graph.py over the
    full corpus — the end-to-end keep/drop verdict, not just the pair or
    cluster list."""
    from open_ftth_relational_projector_spark.functions.graph import (
        connected_components,
    )

    docs = scattered(load_table(spark, sf_dir, "documents"))
    pairs = D.ngram_jaccard_pairs(docs, threshold=0.05, n=3)
    comp = connected_components(pairs)
    return (
        docs.select("doc_id")
        .join(comp, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("component_id"), F.col("doc_id")).alias(
                "component_id"
            ),
            (
                F.coalesce(F.col("component_id"), F.col("doc_id"))
                == F.col("doc_id")
            ).alias("keep"),
        )
    )


@_q(
    "weighted_doc_sample",
    """
    WITH u AS (
      SELECT doc_id, n_chars,
             (('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'mix1'), 1, 13))::BIGINT + 1)
               / CAST(16::HUGEINT ** 13 AS DOUBLE) AS unif
      FROM documents WHERE n_chars > 0)
    SELECT doc_id, n_chars,
           ROUND(-ln(unif) / n_chars, 4) AS priority
    FROM u
    ORDER BY ROUND(-ln(unif) / n_chars, 4), doc_id
    LIMIT 50
    """,
)
def weighted_doc_sample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling without replacement
    (sampling.weighted_sample, Efraimidis–Spirakis 2006) — the data-mixing
    primitive: longer documents drawn proportionally more often, yet the
    sample is exactly reproducible across runs, partitionings, and engines
    because the uniforms derive from md5(doc_id‖salt). The oracle replays
    the identical priorities in SQL."""
    from open_ftth_relational_projector_spark.functions.sampling import (
        weighted_sample,
    )

    docs = load_table(spark, sf_dir, "documents")
    return weighted_sample(
        docs.select("doc_id", "n_chars"),
        F.col("n_chars"),
        k=50,
        key="doc_id",
        salt="mix1",
    )


@_q(
    "corpus_pipeline_stats",
    """
    WITH RECURSIVE t AS (
      SELECT doc_id, text, string_split(text, ' ') AS toks, LOWER(text) AS low
      FROM documents),
    c AS (
      SELECT doc_id, text, LEN(toks) AS n,
             LEN(list_filter(toks, x -> list_contains(['the','a','and','of','to'], x))) AS c_en,
             LEN(list_filter(toks, x -> list_contains(['der','die','das','und','zu'], x))) AS c_de,
             LEN(list_filter(toks, x -> list_contains(['le','la','et','les','des'], x))) AS c_fr,
             LEN(list_filter(toks, x -> list_contains(['el','la','los','y','de'], x))) AS c_es,
             LENGTH(regexp_replace(low, '[a-z0-9 ]', '', 'g'))
               / CAST(LENGTH(low) AS DOUBLE) AS pr
      FROM t),
    scored AS (
      SELECT doc_id, text, n,
             (CASE WHEN n BETWEEN 20 AND 10000 THEN 0.4::DOUBLE ELSE 0.0::DOUBLE END
              + CASE WHEN c_en / CAST(n AS DOUBLE) > 0.01 THEN 0.3::DOUBLE ELSE 0.0::DOUBLE END
              + CASE WHEN pr < 0.1 THEN 0.3::DOUBLE ELSE 0.0::DOUBLE END) AS quality,
             CASE WHEN c_es > GREATEST(c_en, c_de, c_fr) THEN 'es'
                  WHEN c_fr > GREATEST(c_en, c_de) THEN 'fr'
                  WHEN c_de > c_en THEN 'de'
                  WHEN c_en > 0 THEN 'en'
                  ELSE 'und' END AS lang_guess
      FROM c),
    keepq AS (
      SELECT doc_id, text, n FROM scored
      WHERE quality >= 0.7 AND lang_guess = 'en'),
    canon AS (SELECT MIN(doc_id) AS doc_id FROM keepq GROUP BY md5(text)),
    surv AS (SELECT k.doc_id, k.text, k.n FROM keepq k JOIN canon USING (doc_id)),
    stoks AS (SELECT doc_id, string_split(text, ' ') AS st FROM surv),
    sh AS (
      SELECT doc_id,
             UNNEST(list_distinct(list_transform(
               generate_series(1, GREATEST(LEN(st) - 2, 0)),
               i -> st[i] || ' ' || st[i+1] || ' ' || st[i+2]))) AS shingle
      FROM stoks),
    sizes AS (SELECT doc_id, COUNT(*) AS ns FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id),
    pairs AS (
      SELECT i.doc_a, i.doc_b FROM inter i
      JOIN sizes sa ON i.doc_a = sa.doc_id
      JOIN sizes sb ON i.doc_b = sb.doc_id
      WHERE n_inter / CAST(sa.ns + sb.ns - n_inter AS DOUBLE) >= 0.05),
    edges AS (
      SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs),
    reach(src, node) AS (
      SELECT a, a FROM edges
      UNION
      SELECT r.src, e.b FROM reach r JOIN edges e ON r.node = e.a),
    comp AS (SELECT src AS doc_id, MIN(node) AS component_id
             FROM reach GROUP BY src),
    final AS (
      SELECT s.doc_id, s.n FROM surv s LEFT JOIN comp c2 ON s.doc_id = c2.doc_id
      WHERE COALESCE(c2.component_id, s.doc_id) = s.doc_id)
    SELECT CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < 'e6666666'
                THEN 'train' ELSE 'test' END AS split,
           COUNT(*) AS n_docs,
           CAST(SUM(n) AS BIGINT) AS ws_tokens
    FROM final GROUP BY 1
    """,
)
def corpus_pipeline_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WHOLE training-corpus pipeline as one composed dataflow — the
    flagship LLM-pipeline query: quality/language filter (text.py) →
    exact dedup keeping the canonical copy (md5 groupBy) → near-dup dedup
    via exact n-gram Jaccard pairs + connected components (dedup.py,
    graph.py) → deterministic md5-bucket train/test split (sampling.py) →
    per-split doc and whitespace-token budget. Every stage is individually
    driver-verified elsewhere; this row pins their composition. Plan
    shape: row-local filters, one hash-dedup shuffle, the inverted-index
    pair join, the iterative component join, then a map-side split — no
    all-pairs anything, no driver state."""
    from open_ftth_relational_projector_spark.functions.graph import (
        connected_components,
    )
    from open_ftth_relational_projector_spark.functions.sampling import (
        hash_split,
    )

    docs = scattered(load_table(spark, sf_dir, "documents"))
    qual = TXT.quality_score(F.col("text"))
    guessed = TXT.lang_guess(F.col("text"))
    keepq = docs.filter((qual >= 0.7) & (guessed == F.lit("en")))
    canon = keepq.groupBy(F.md5("text").alias("th")).agg(
        F.min("doc_id").alias("doc_id")
    )
    # surv feeds BOTH the pair-generation branch and the final keep join;
    # without a persist Spark recomputes the quality filter + md5-dedup
    # semi-join once per consumer (a real pipeline would checkpoint the
    # filtered corpus to parquet here for exactly the same reason).
    # tracked (r13): released by the caller loop after the consuming
    # action — this persist previously lived for the whole session.
    surv = tracked_persist(keepq.join(canon.select("doc_id"), "doc_id", "semi"))
    pairs = D.ngram_jaccard_pairs(surv, threshold=0.05, n=3)
    comp = connected_components(pairs)
    final = (
        surv.join(comp, "doc_id", "left")
        .filter(
            F.coalesce(F.col("component_id"), F.col("doc_id"))
            == F.col("doc_id")
        )
        .select("doc_id", "text")
    )
    return hash_split(final, "doc_id", {"train": 0.9, "test": 0.1}).groupBy(
        "split"
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(TXT.token_count(F.col("text")).cast("long")).alias("ws_tokens"),
    )


@_q(
    "train_test_split_stats",
    """
    SELECT CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < 'e6666666'
                THEN 'train' ELSE 'test' END AS split,
           COUNT(*) AS n_docs, ROUND(AVG(n_chars), 4) AS avg_chars
    FROM documents GROUP BY 1
    """,
)
def train_test_split_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic engine-portable 90/10 split (functions/sampling.py):
    md5-bucket compared against a hex threshold as a STRING, so the DuckDB
    oracle reproduces the assignment byte-for-byte. Per-row expression —
    no shuffle, stable under repartitioning."""
    from open_ftth_relational_projector_spark.functions.sampling import hash_split

    docs = load_table(spark, sf_dir, "documents")
    return (
        hash_split(docs, "doc_id", {"train": 0.9, "test": 0.1})
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            _r4(F.avg("n_chars")).alias("avg_chars"),
        )
    )


@_q("minhash_near_dups")  # xxhash64 path; hash-matched via minhash_near_dups_md5
def minhash_near_dups_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = D.minhash_near_dups(
        scattered(load_table(spark, sf_dir, "documents")), threshold=0.05
    )
    return out.select("doc_a", "doc_b", _r4(F.col("jaccard")).alias("jaccard"))


@_q(
    "minhash_near_dups_md5",
    """
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (
      SELECT doc_id,
             UNNEST(list_distinct(list_transform(
               generate_series(1, GREATEST(LEN(t) - 2, 0)),
               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS shingle
      FROM toks),
    mh AS (
      SELECT doc_id, s,
             MIN(('0x' || substr(md5(shingle || '#' || CAST(s AS VARCHAR)), 1, 15))::BIGINT) AS m
      FROM sh CROSS JOIN (SELECT UNNEST(range(0, 32)) AS s) seeds
      GROUP BY doc_id, s),
    bands AS (
      SELECT doc_id, CAST(s // 4 AS INT) AS band_id,
             string_agg(CAST(m AS VARCHAR), ',' ORDER BY s) AS band_key
      FROM mh GROUP BY doc_id, s // 4),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b ON a.band_id = b.band_id AND a.band_key = b.band_key
       AND a.doc_id < b.doc_id),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT c.doc_a, c.doc_b, COUNT(*) AS n_inter
      FROM cand c JOIN sh x ON x.doc_id = c.doc_a
                  JOIN sh y ON y.doc_id = c.doc_b AND y.shingle = x.shingle
      GROUP BY c.doc_a, c.doc_b)
    SELECT i.doc_a, i.doc_b,
           ROUND(n_inter / CAST(sa.n + sb.n - n_inter AS DOUBLE), 4) AS jaccard
    FROM inter i JOIN sizes sa ON i.doc_a = sa.doc_id
                 JOIN sizes sb ON i.doc_b = sb.doc_id
    WHERE n_inter / CAST(sa.n + sb.n - n_inter AS DOUBLE) >= 0.05
    """,
)
def minhash_near_dups_md5_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard verification for minhash_near_dups: the SAME pipeline —
    signatures (functions/dedup.py:minhash_signature), banding, candidate
    join, exact-Jaccard verification — run with the SQL-portable md5 hash
    (portable_hash64) and string band keys, so the oracle reimplements
    every stage in DuckDB SQL and the driver hash-matches end to end. The
    xxhash64 production variant differs ONLY in the hash constants."""
    out = D.minhash_near_dups(
        scattered(load_table(spark, sf_dir, "documents")),
        threshold=0.05,
        hash_fn=D.portable_hash64,
        portable_bands=True,
    )
    return out.select("doc_a", "doc_b", _r4(F.col("jaccard")).alias("jaccard"))


@_q("simhash_fingerprints")  # xxhash64 path; hash-matched via simhash_fingerprints_md5
def simhash_fingerprints_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.simhash64(scattered(load_table(spark, sf_dir, "documents")))


@_q(
    "simhash_fingerprints_md5",
    """
    WITH tok AS (
      SELECT DISTINCT doc_id, UNNEST(string_split(text, ' ')) AS tok
      FROM documents),
    h AS (SELECT doc_id,
                 ('0x' || substr(md5(tok || '#0'), 1, 15))::BIGINT AS h
          FROM tok),
    bits AS (
      SELECT doc_id, b,
             SUM(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS s
      FROM h CROSS JOIN (SELECT UNNEST(range(0, 60)) AS b) bs
      GROUP BY doc_id, b)
    SELECT doc_id,
           CAST(SUM(CASE WHEN s > 0 THEN (1::BIGINT << CAST(b AS INT))
                         ELSE 0 END) AS BIGINT) AS simhash
    FROM bits GROUP BY doc_id
    """,
)
def simhash_fingerprints_md5_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard verification for simhash_fingerprints: the SAME row-local
    aggregate fold (functions/dedup.py:simhash_column) with the
    SQL-portable 60-bit md5 hash, hash-matched against a DuckDB oracle
    that re-derives every bit sum. The xxhash64 production variant differs
    ONLY in hash constants and width."""
    return D.simhash64(
        scattered(load_table(spark, sf_dir, "documents")),
        n_bits=60,
        hash_fn=D.portable_hash64,
    )


@_q(
    "simhash_near_dups",
    """
    WITH tok AS (
      SELECT DISTINCT doc_id, UNNEST(string_split(text, ' ')) AS tok
      FROM documents),
    h AS (SELECT doc_id,
                 ('0x' || substr(md5(tok || '#0'), 1, 15))::BIGINT AS h
          FROM tok),
    bits AS (
      SELECT doc_id, b,
             SUM(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS s
      FROM h CROSS JOIN (SELECT UNNEST(range(0, 60)) AS b) bs
      GROUP BY doc_id, b),
    fp AS (
      SELECT doc_id,
             CAST(SUM(CASE WHEN s > 0 THEN (1::BIGINT << CAST(b AS INT))
                           ELSE 0 END) AS BIGINT) AS simhash
      FROM bits GROUP BY doc_id)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
    FROM fp a JOIN fp b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    """,
)
def simhash_near_dups_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs via pigeonhole banding (dedup.simhash_near_dups)
    — completes the SimHash family: fingerprints → banded candidate join →
    Hamming verification. Runs the md5-portable 60-bit variant so the
    oracle can recompute every fingerprint and do the (oracle-scale-only)
    quadratic Hamming join in SQL; banding with max_hamming < bands is
    provably full-recall, so the band-joined result equals the oracle's
    all-pairs result."""
    return D.simhash_near_dups(
        scattered(load_table(spark, sf_dir, "documents")),
        max_hamming=3,
        n_bits=60,
        bands=4,
        hash_fn=D.portable_hash64,
    )


@_q(
    "embedding_norms_by_label",
    """
    SELECT label,
           COUNT(*) AS n,
           ROUND(AVG(sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE)))), 4) AS avg_l2
    FROM embeddings GROUP BY label
    """,
)
def embedding_norms_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.groupBy("label").agg(
        F.count(F.lit(1)).alias("n"),
        _r4(F.avg(S.l2_norm(S.as_double(F.col("embedding"))))).alias("avg_l2"),
    )


_EMB_NEAR_DUPS_SQL = """
    WITH v AS (SELECT vec_id, embedding FROM embeddings),
    pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             list_sum(list_transform(generate_series(1, 64),
                      i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE))
             / (sqrt(list_sum(list_transform(generate_series(1, 64),
                      i -> a.embedding[i]::DOUBLE * a.embedding[i]::DOUBLE)))
                * sqrt(list_sum(list_transform(generate_series(1, 64),
                      i -> b.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE)))) AS c
      FROM v a JOIN v b ON a.vec_id < b.vec_id)
    SELECT id_a, id_b, ROUND(c, 4) AS cosine FROM pairs WHERE c >= 0.45
    """


@_q("embedding_near_dups", _EMB_NEAR_DUPS_SQL)
def embedding_near_dups_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate dedup, exact all-pairs baseline.

    The synthetic embeddings have no planted duplicates (max cosine ≈ 0.51),
    so the threshold is set inside the tail of the similarity distribution
    to exercise the operator end-to-end.
    """
    out = S.embedding_near_dups(
        scattered(load_table(spark, sf_dir, "embeddings")), threshold=0.45
    )
    return out.select("id_a", "id_b", _r4(F.col("cosine")).alias("cosine"))


@_q("embedding_near_dups_lsh")  # approximate; machinery hash-matched via _fullprobe
def embedding_near_dups_lsh_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = S.embedding_near_dups(
        scattered(load_table(spark, sf_dir, "embeddings")),
        threshold=0.45,
        bucketed=True,
        n_planes=4,
    )
    return out.select("id_a", "id_b", _r4(F.col("cosine")).alias("cosine"))


@_q("embedding_near_dups_lsh_fullprobe", _EMB_NEAR_DUPS_SQL)
def embedding_near_dups_lsh_fullprobe_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard verification for embedding_near_dups_lsh: the SAME bucketed
    pipeline (signatures, bucket assignment, probe expansion, in-bucket
    pair join) multi-probed at radius == n_planes, which scans every
    bucket ⇒ provably equals the exact all-pairs result — so the exact
    SQL oracle hash-matches the LSH machinery end to end. The production
    variant differs ONLY in probe_radius."""
    out = S.embedding_near_dups(
        scattered(load_table(spark, sf_dir, "embeddings")),
        threshold=0.45,
        bucketed=True,
        n_planes=4,
        probe_radius=4,
    )
    return out.select("id_a", "id_b", _r4(F.col("cosine")).alias("cosine"))


@_q(
    "embedding_quantize_int8",
    """
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    s AS (SELECT vec_id, e,
                 list_max(list_transform(e, x -> abs(x))) AS amax FROM v),
    s2 AS (SELECT vec_id, e,
                  CASE WHEN amax = 0 THEN 1.0 ELSE amax / 127.0 END AS scale
           FROM s),
    q AS (SELECT vec_id, e, scale,
                 list_transform(e, x -> CAST(FLOOR(x / scale + 0.5) AS INT)) AS qv
          FROM s2)
    SELECT vec_id,
           CAST(len(qv) AS INT) AS n_dims,
           ROUND(scale, 4) AS scale,
           CAST(list_sum(list_transform(qv, x -> abs(x))) AS BIGINT) AS l1,
           CAST(list_sum(list_transform(range(1, len(qv) + 1),
                                        i -> qv[i] * i)) AS BIGINT) AS checksum,
           ROUND(list_max(list_transform(range(1, len(qv) + 1),
                                         i -> abs(qv[i] * scale - e[i]))), 4)
             AS max_err
    FROM q
    """,
)
def embedding_quantize_int8_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 embedding quantization (similarity.quantize_int8_stats):
    scale/L1/position-weighted checksum/max reconstruction error per
    vector, all row-local JVM — the oracle recomputes the same explicit
    half-up quantizer in SQL."""
    return S.quantize_int8_stats(
        scattered(load_table(spark, sf_dir, "embeddings"))
    )


_KNN_BRUTEFORCE_SQL = """
    WITH q AS (
      SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id % 100 = 0),
    c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
    scored AS (
      SELECT q.query_id, c.neighbor_id,
             list_sum(list_transform(generate_series(1, 64), i -> qv[i]::DOUBLE * cv[i]::DOUBLE))
             / (sqrt(list_sum(list_transform(generate_series(1, 64), i -> qv[i]::DOUBLE * qv[i]::DOUBLE)))
                * sqrt(list_sum(list_transform(generate_series(1, 64), i -> cv[i]::DOUBLE * cv[i]::DOUBLE)))) AS sim
      FROM c, q WHERE c.neighbor_id != q.query_id)
    SELECT query_id, neighbor_id, CAST(rnk AS INT) AS rnk
    FROM (
      SELECT query_id, neighbor_id,
             ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rnk
      FROM scored)
    WHERE rnk <= 5
    """


@_q("knn_bruteforce", _KNN_BRUTEFORCE_SQL)
def knn_bruteforce_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = scattered(load_table(spark, sf_dir, "embeddings"))
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    out = S.knn_bruteforce(emb, queries, k=5)
    return out.withColumnRenamed("rank", "rnk")


_KNN_LABEL_NOISE_SQL = """
    WITH q AS (
      SELECT vec_id AS query_id, embedding AS qv, label AS qlabel
      FROM embeddings WHERE vec_id % 50 = 0),
    c AS (SELECT vec_id AS neighbor_id, embedding AS cv, label AS nlabel
          FROM embeddings),
    scored AS (
      SELECT q.query_id, q.qlabel, c.neighbor_id, c.nlabel,
             list_sum(list_transform(generate_series(1, 64), i -> qv[i]::DOUBLE * cv[i]::DOUBLE))
             / (sqrt(list_sum(list_transform(generate_series(1, 64), i -> qv[i]::DOUBLE * qv[i]::DOUBLE)))
                * sqrt(list_sum(list_transform(generate_series(1, 64), i -> cv[i]::DOUBLE * cv[i]::DOUBLE)))) AS sim
      FROM c, q WHERE c.neighbor_id != q.query_id),
    top AS (
      SELECT query_id, qlabel, nlabel FROM (
        SELECT query_id, qlabel, nlabel,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY sim DESC, neighbor_id) AS rnk
        FROM scored) t
      WHERE rnk <= 5)
    SELECT query_id AS vec_id, CAST(qlabel AS INT) AS label,
           CAST(SUM(CASE WHEN nlabel <> qlabel THEN 1 ELSE 0 END) AS INT)
             AS n_disagree,
           SUM(CASE WHEN nlabel <> qlabel THEN 1 ELSE 0 END) >= 3 AS flagged
    FROM top GROUP BY query_id, qlabel
    """


@_q("knn_label_noise", _KNN_LABEL_NOISE_SQL)
def knn_label_noise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-noise audit à la confident learning: each probe point's
    label vs its 5 exact nearest neighbors' labels; majority disagreement
    flags a likely mislabel — the data-centric cleaning pass run before
    training on a labeled corpus. Rides knn_bruteforce (broadcast
    queries, corpus streams); the tiny (queries × k) neighbor table then
    broadcasts against the label column twice."""
    emb = scattered(load_table(spark, sf_dir, "embeddings"))
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    nb = S.knn_bruteforce(emb, queries, k=5)
    lbl = emb.select("vec_id", "label")
    nlab = lbl.join(
        F.broadcast(nb), lbl["vec_id"] == nb["neighbor_id"]
    ).select("query_id", F.col("label").alias("nlabel"))
    qlab = lbl.select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("qlabel")
    )
    dis = F.sum(
        F.when(F.col("nlabel") != F.col("qlabel"), F.lit(1)).otherwise(F.lit(0))
    )
    return (
        nlab.join(F.broadcast(qlab), "query_id")
        .groupBy("query_id", "qlabel")
        .agg(
            dis.cast("int").alias("n_disagree"),
            (dis >= 3).alias("flagged"),
        )
        .select(
            F.col("query_id").alias("vec_id"),
            F.col("qlabel").cast("int").alias("label"),
            "n_disagree",
            "flagged",
        )
    )


@_q("knn_lsh")  # approximate; machinery hash-matched via knn_lsh_fullprobe
def knn_lsh_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = scattered(load_table(spark, sf_dir, "embeddings"))
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    return S.knn_lsh(emb, queries, k=5).withColumnRenamed("rank", "rnk")


@_q("knn_lsh_fullprobe", _KNN_BRUTEFORCE_SQL)
def knn_lsh_fullprobe_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard verification for knn_lsh: the SAME pipeline — hyperplane
    signatures, corpus bucket assignment, query multi-probe expansion,
    bucket-keyed candidate join, per-query ranking — probed at radius ==
    n_planes (probe_masks covers all buckets ⇒ provably exact), so the
    brute-force SQL oracle hash-matches the LSH machinery end to end. The
    production variant differs ONLY in n_planes/probe_radius."""
    emb = scattered(load_table(spark, sf_dir, "embeddings"))
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    return S.knn_lsh(
        emb, queries, k=5, n_planes=4, probe_radius=4
    ).withColumnRenamed("rank", "rnk")


@_q("knn_ivf")  # approximate; machinery hash-matched via knn_ivf_fullprobe
def knn_ivf_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate nearest neighbors — the inverted-file scale path
    next to knn_bruteforce (exact oracle) and knn_lsh (hash path)."""
    emb = scattered(load_table(spark, sf_dir, "embeddings"))
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    return S.knn_ivf(emb, queries, k=5).withColumnRenamed("rank", "rnk")


@_q("knn_ivf_fullprobe", _KNN_BRUTEFORCE_SQL)
def knn_ivf_fullprobe_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard verification for knn_ivf: the SAME pipeline — sampled
    quantizer training, JVM corpus-to-centroid assignment, probe-join,
    per-query ranking — with n_probe == n_centroids (every cell probed ⇒
    provably exact regardless of the quantizer), so the brute-force SQL
    oracle hash-matches the IVF machinery end to end. The production
    variant differs ONLY in n_probe."""
    emb = scattered(load_table(spark, sf_dir, "embeddings"))
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    return S.knn_ivf(
        emb, queries, k=5, n_centroids=16, n_probe=16
    ).withColumnRenamed("rank", "rnk")


@_q(
    "multimodal_features",
    """
    SELECT doc_id,
           CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
           sha256(text) AS sha256,
           CAST(octet_length(CAST(text AS BLOB)) % 1920 + 1 AS INT) AS width,
           CAST(octet_length(CAST(text AS BLOB)) % 1080 + 1 AS INT) AS height
    FROM documents
    """,
)
def multimodal_features_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = attach_binary(scattered(load_table(spark, sf_dir, "documents")))
    return extract_features(docs, fake=True)


@_q(
    "multimodal_frames",
    """
    -- documents.text is pure ASCII, so VARCHAR substr == byte slicing
    WITH f AS (
      SELECT doc_id, text,
             UNNEST(generate_series(
               0, CAST(FLOOR((length(text) - 1) / 256.0) AS INT))) AS k
      FROM documents WHERE length(text) > 0)
    SELECT doc_id, CAST(k AS INTEGER) AS frame_idx,
           sha256(substring(text, k * 256 + 1, 256)) AS frame_sha256,
           CAST(LEAST(256, length(text) - k * 256) AS INTEGER) AS n_bytes
    FROM f
    """,
)
def multimodal_frames_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling: the JVM twin (sequence + binary substring + sha2,
    whole-stage codegen) — byte-range frames never need Python. The
    mapInPandas variant (sample_frames) carries the codec-shaped 1→N
    batch contract and is differential-pinned equal in tests."""
    from open_ftth_relational_projector_spark.functions.multimodal import (
        sample_frames_jvm,
    )

    docs = attach_binary(scattered(load_table(spark, sf_dir, "documents")))
    return sample_frames_jvm(docs, frame_bytes=256)


@_q(
    "multimodal_resize",
    """
    SELECT doc_id,
           CAST(octet_length(CAST(text AS BLOB)) % 1920 + 1 AS INTEGER) AS width,
           CAST(octet_length(CAST(text AS BLOB)) % 1080 + 1 AS INTEGER) AS height,
           224 AS target_w, 224 AS target_h,
           sha256(text || '224x224') AS resized_sha256
    FROM documents
    """,
)
def multimodal_resize_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stub resize (functions/multimodal.resize_images): deterministic
    payload⊕geometry hash pins the full contract the real codec swap must
    preserve."""
    from open_ftth_relational_projector_spark.functions.multimodal import (
        resize_images,
    )

    docs = attach_binary(scattered(load_table(spark, sf_dir, "documents")))
    return resize_images(docs, 224, 224)


@_q(
    "tfidf_top_terms",
    """
    WITH tok AS (
      SELECT doc_id, UNNEST(string_split(text, ' ')) AS term FROM documents),
    tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term),
    df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term,
             tf.tf * ln(n.n_docs / CAST(df.df AS DOUBLE)) AS tf_idf
      FROM tf JOIN df USING (term) CROSS JOIN n),
    ranked AS (
      SELECT doc_id, term, tf_idf,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY tf_idf DESC, term ASC) AS rnk
      FROM scored)
    SELECT doc_id, term, CAST(rnk AS INTEGER) AS rnk,
           ROUND(tf_idf, 4) AS tf_idf
    FROM ranked WHERE rnk <= 3
    """,
)
def tfidf_top_terms_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document (functions/text.tf_idf_top_terms) —
    deterministic tie-break on term text; term-keyed shuffles only."""
    return TXT.tf_idf_top_terms(
        scattered(load_table(spark, sf_dir, "documents")), k=3
    )


@_q(
    "value_quantiles_by_type",
    """
    SELECT event_type,
           ROUND(quantile_cont(value, 0.25), 4) AS p25,
           ROUND(quantile_cont(value, 0.5), 4) AS p50,
           ROUND(quantile_cont(value, 0.75), 4) AS p75,
           ROUND(quantile_cont(value, 0.9), 4) AS p90,
           COUNT(value) AS n
    FROM events GROUP BY event_type
    """,
)
def value_quantiles_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per key (Spark `percentile` ==
    DuckDB `quantile_cont`, both linear interpolation), via the grouped
    hierarchical-rank quantile (operators/quantiles.exact_quantiles):
    event_type is the low-cardinality giant-group regime — the exact
    `percentile` aggregate would buffer corpus/|types| values in one
    aggregation state at 100×; exact_quantiles is bit-identical with
    range-sharded state. `n` is COUNT(value) on BOTH sides (the
    rank-pass count is non-null by construction)."""
    from open_ftth_relational_projector_spark.operators.quantiles import (
        exact_quantiles,
    )

    ev = load_table(spark, sf_dir, "events")
    return exact_quantiles(
        ev,
        "value",
        {"p25": 0.25, "p50": 0.5, "p75": 0.75, "p90": 0.9},
        group_cols=["event_type"],
        count_col="n",
    ).select(
        "event_type",
        _r4(F.col("p25")).alias("p25"),
        _r4(F.col("p50")).alias("p50"),
        _r4(F.col("p75")).alias("p75"),
        _r4(F.col("p90")).alias("p90"),
        "n",
    )


@_q(
    "weekly_cohort_retention",
    """
    WITH firsts AS (
      SELECT user_id, MIN(time_bucket(INTERVAL '7 days', ts)) AS cohort_week
      FROM events GROUP BY user_id),
    activity AS (
      SELECT DISTINCT e.user_id,
             time_bucket(INTERVAL '7 days', e.ts) AS active_week
      FROM events e)
    SELECT f.cohort_week,
           CAST(date_diff('day', f.cohort_week, a.active_week) / 7 AS INTEGER)
             AS week_offset,
           COUNT(DISTINCT a.user_id) AS n_active
    FROM firsts f JOIN activity a ON f.user_id = a.user_id
    GROUP BY 1, 2
    """,
)
def weekly_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort/retention matrix: users bucketed by first-seen week, counted
    per week-offset of later activity. Two aggregations + one join, all
    keyed on user_id — the first-seen aggregate broadcasts (dimension-sized
    at one row per user per shuffle partition)."""
    ev = load_table(spark, sf_dir, "events")
    # DuckDB's time_bucket anchors week intervals at 2000-01-03 (Monday),
    # not the 1970 epoch (Thursday) — use the same origin
    origin = 946_857_600  # 2000-01-03 00:00:00 UTC
    week = F.timestamp_seconds(
        ((F.col("ts").cast("timestamp").cast("long") - origin) / (7 * 86400))
        .cast("long") * (7 * 86400) + origin
    ).cast("timestamp_ntz")
    bucketed = ev.select("user_id", week.alias("week"))
    firsts = bucketed.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    activity = bucketed.distinct()
    return (
        activity.join(firsts, "user_id")
        .groupBy(
            "cohort_week",
            (
                F.datediff(F.col("week"), F.col("cohort_week")) / 7
            ).cast("int").alias("week_offset"),
        )
        .agg(F.count_distinct("user_id").alias("n_active"))
    )


@_q(
    "signup_to_purchase_funnel",
    """
    WITH s AS (
      SELECT user_id, MIN(ts) AS signup_ts FROM events
      WHERE event_type = 'signup' GROUP BY user_id),
    c AS (
      SELECT e.user_id, MIN(e.ts) AS click_ts
      FROM events e JOIN s ON e.user_id = s.user_id
      WHERE e.event_type = 'click' AND e.ts > s.signup_ts
      GROUP BY e.user_id),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS purchase_ts
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.click_ts
      GROUP BY e.user_id)
    SELECT (SELECT COUNT(*) FROM s) AS n_signup,
           (SELECT COUNT(*) FROM c) AS n_clicked_after,
           (SELECT COUNT(*) FROM p) AS n_purchased_after
    """,
)
def signup_to_purchase_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel signup → click → purchase: each stage keeps users
    whose stage event strictly follows their previous stage's first event.
    Implemented as per-user min-aggregations chained by broadcast joins;
    event-order comparison, not mere existence."""
    ev = load_table(spark, sf_dir, "events")

    def stage(etype, prev, prev_ts):
        src = ev.filter(F.col("event_type") == etype)
        if prev is not None:
            src = src.join(F.broadcast(prev), "user_id").filter(
                F.col("ts") > F.col(prev_ts)
            )
        return src.groupBy("user_id").agg(F.min("ts").alias(f"{etype}_ts"))

    s = stage("signup", None, "")
    c = stage("click", s, "signup_ts")
    p = stage("purchase", c, "click_ts")
    return (
        s.agg(F.count(F.lit(1)).alias("n_signup"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("n_clicked_after")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("n_purchased_after")))
    )


@_q(
    "clicks_within_signup_day",
    """
    WITH s AS (
      SELECT user_id, ts AS start_ts, ts + INTERVAL '1 day' AS end_ts
      FROM events WHERE event_type = 'signup'),
    c AS (SELECT user_id, ts FROM events WHERE event_type = 'click')
    SELECT c.user_id, COUNT(*) AS n_clicks
    FROM c JOIN s ON c.user_id = s.user_id
               AND c.ts >= s.start_ts AND c.ts < s.end_ts
    GROUP BY c.user_id
    """,
)
def clicks_within_signup_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-containment join via operators/range_join.interval_join:
    clicks falling inside any same-user [signup, +24h) window. Bucketized
    equi-join on (user_id, 6h bucket) + exact containment filter — no
    BroadcastNestedLoopJoin anywhere in the plan (pinned in test_plans)."""
    from open_ftth_relational_projector_spark.operators.range_join import (
        interval_join,
    )

    ev = load_table(spark, sf_dir, "events")
    signups = ev.filter(F.col("event_type") == "signup").select(
        "user_id",
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 1 DAY")).alias("end_ts"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts")
    joined = interval_join(
        clicks,
        signups,
        fact_ts="ts",
        start="start_ts",
        end="end_ts",
        bucket_seconds=21_600,
        extra_keys=["user_id"],
    )
    return joined.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_clicks"))


@_q(
    "stratified_doc_sample",
    """
    WITH ranked AS (
      SELECT lang, doc_id,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY substr(md5(CAST(doc_id AS VARCHAR)), 1, 8), doc_id
             ) AS rn
      FROM documents)
    SELECT lang, doc_id FROM ranked WHERE rn <= 20
    """,
)
def stratified_doc_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 20-per-language sample (functions/sampling.
    stratified_sample): hash-ranked inside each group, reproducible across
    engines and partitionings."""
    from open_ftth_relational_projector_spark.functions.sampling import (
        stratified_sample,
    )

    docs = load_table(spark, sf_dir, "documents").select("lang", "doc_id")
    return stratified_sample(docs, "lang", 20, "doc_id")


@_q(
    "token_budget_chunks",
    """
    WITH t AS (
      SELECT doc_id, LEN(string_split(text, ' ')) AS tok FROM documents),
    c AS (
      SELECT doc_id, tok,
             SUM(tok) OVER (ORDER BY doc_id
                            ROWS UNBOUNDED PRECEDING) AS cum
      FROM t)
    SELECT CAST(FLOOR((cum - tok) / 2048.0) AS BIGINT) AS chunk_id,
           COUNT(*) AS n_docs, CAST(SUM(tok) AS BIGINT) AS total_tokens
    FROM c GROUP BY 1
    """,
)
def token_budget_chunks_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-sequence packing: contiguous 2048-token chunks over the
    corpus (functions/sampling.token_budget_chunks)."""
    from open_ftth_relational_projector_spark.functions.sampling import (
        token_budget_chunks,
    )

    return token_budget_chunks(load_table(spark, sf_dir, "documents"), 2048)


@_q(
    "epoch_shuffle_manifest",
    """
    WITH e AS (
      SELECT doc_id, UNNEST(range(0, 2)) AS epoch FROM documents),
    u AS (
      SELECT doc_id, epoch,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#' || epoch
                                 || '#epoch'), 1, 15))::BIGINT AS u
      FROM e),
    r AS (
      SELECT doc_id, epoch,
             ROW_NUMBER() OVER (PARTITION BY epoch
                                ORDER BY u, doc_id) AS position
      FROM u)
    SELECT doc_id, CAST(epoch AS INT) AS epoch, position,
           CAST((position - 1) % 4 AS INT) AS shard
    FROM r
    """,
)
def epoch_shuffle_manifest_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible training-run data ordering (functions/sampling.
    epoch_shuffle_manifest): each epoch's global document order derives
    from md5(doc_id‖epoch‖salt) — no rand() — with round-robin shard
    interleaving; the per-epoch global rank runs on the giant-group
    hierarchical primitive, never a per-epoch single-task window. The
    oracle replays the permutation exactly."""
    from open_ftth_relational_projector_spark.functions.sampling import (
        epoch_shuffle_manifest,
    )

    docs = load_table(spark, sf_dir, "documents")
    return epoch_shuffle_manifest(docs, "doc_id", n_epochs=2, n_shards=4)


@_q(
    "sliding_window_chunks",
    """
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    base AS (
      SELECT doc_id, toks,
             1 + CAST(FLOOR((GREATEST(LEN(toks) - 64, 0) + 47) / 48.0)
                      AS BIGINT) AS n_chunks
      FROM t),
    idx AS (
      SELECT doc_id, toks,
             UNNEST(range(0, n_chunks)) AS chunk_idx
      FROM base)
    SELECT doc_id,
           CAST(chunk_idx AS INTEGER) AS chunk_idx,
           CAST(chunk_idx * 48 AS INTEGER) AS start_token,
           CAST(LEN(list_slice(toks, chunk_idx * 48 + 1, chunk_idx * 48 + 64))
                AS INTEGER) AS n_tokens,
           md5(array_to_string(
                 list_slice(toks, chunk_idx * 48 + 1, chunk_idx * 48 + 64),
                 ' ')) AS chunk_md5
    FROM idx
    """,
)
def sliding_window_chunks_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping 64-token windows every 48 tokens (functions/sampling.
    sliding_window_chunks): map-only context-window preparation; chunk
    identity as md5 for downstream dedup/packing."""
    from open_ftth_relational_projector_spark.functions.sampling import (
        sliding_window_chunks,
    )

    return sliding_window_chunks(
        load_table(spark, sf_dir, "documents"), window=64, stride=48
    )


@_q(
    "bm25_top_docs",
    """
    WITH ql AS (
      SELECT * FROM (VALUES ('hash'), ('merge'), ('window')) AS t(term)),
    tok AS (
      SELECT doc_id, UNNEST(string_split(text, ' ')) AS term FROM documents),
    tf AS (
      SELECT doc_id, term, COUNT(*) AS tf
      FROM tok SEMI JOIN ql USING (term) GROUP BY doc_id, term),
    df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    dl AS (
      SELECT doc_id, CAST(LEN(string_split(text, ' ')) AS DOUBLE) AS dl
      FROM documents),
    stats AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM dl)
    SELECT tf.doc_id, COUNT(*) AS n_matched,
           ROUND(SUM(
             ln(1 + (stats.n_docs - df.df + 0.5) / (df.df + 0.5))
             * tf.tf * (1.2 + 1)
             / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / stats.avgdl))
           ), 4) AS score
    FROM tf
    JOIN df USING (term)
    JOIN dl ON dl.doc_id = tf.doc_id
    CROSS JOIN stats
    GROUP BY tf.doc_id
    ORDER BY score DESC, tf.doc_id ASC
    LIMIT 25
    """,
)
def bm25_top_docs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-25 retrieval for a fixed 3-term query (functions/text.
    bm25_top_docs): token stream filtered to query terms before any
    aggregation; N/avgdl/df broadcast; global top-k via sort+limit. The
    rank key is the ROUNDED score with doc_id tie-break, so the top-k cut
    is FP-stable across engines."""
    return TXT.bm25_top_docs(
        load_table(spark, sf_dir, "documents"),
        ["hash", "merge", "window"],
        k=25,
    )


@_q(
    "salted_event_counts",
    """
    SELECT event_type, COUNT(*) AS n_events, ROUND(SUM(value), 4) AS sum_value
    FROM events GROUP BY event_type
    """,
)
def salted_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe aggregation (operators/skew.py): 5 event types over 100k
    rows is exactly the hot-key shape that stalls a single reducer at
    100 TB — count/sum fold per (key, salt) first, then per key, so no
    reducer sees more than 1/n_salts of a hot key. Result must equal the
    plain GROUP BY (the oracle)."""
    from open_ftth_relational_projector_spark.operators.skew import (
        salted_aggregate,
    )

    ev = load_table(spark, sf_dir, "events")
    return salted_aggregate(
        ev,
        ["event_type"],
        partial={
            "_n": F.count(F.lit(1)),
            "_sv": F.sum("value"),
        },
        merge={
            "n_events": F.sum("_n"),
            "sum_value": _r4(F.sum("_sv")),
        },
    )


@_q(
    "lineitem_profile",
    """
    SELECT 'l_quantity' AS col, COUNT(*) AS n,
           CAST(COUNT(DISTINCT l_quantity) AS BIGINT) AS n_distinct,
           CAST(COUNT(*) - COUNT(l_quantity) AS BIGINT) AS n_null,
           ROUND(MIN(l_quantity), 4) AS min_v, ROUND(MAX(l_quantity), 4) AS max_v
    FROM lineitem
    UNION ALL
    SELECT 'l_discount', COUNT(*),
           CAST(COUNT(DISTINCT l_discount) AS BIGINT),
           CAST(COUNT(*) - COUNT(l_discount) AS BIGINT),
           ROUND(MIN(l_discount), 4), ROUND(MAX(l_discount), 4)
    FROM lineitem
    UNION ALL
    SELECT 'l_extendedprice', COUNT(*),
           CAST(COUNT(DISTINCT l_extendedprice) AS BIGINT),
           CAST(COUNT(*) - COUNT(l_extendedprice) AS BIGINT),
           ROUND(MIN(l_extendedprice), 4), ROUND(MAX(l_extendedprice), 4)
    FROM lineitem
    """,
)
def lineitem_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling (n, distinct, nulls, min/max) for three numeric
    lineitem columns in ONE scan: per-column aggregates computed side by
    side, then unpivoted — the data-quality pass a pipeline runs before
    training ingestion. (At 100 TB swap COUNT DISTINCT for
    approx_count_distinct — same shape, mergeable sketch.)"""
    li = load_table(spark, sf_dir, "lineitem")
    cols = ["l_quantity", "l_discount", "l_extendedprice"]
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__n"),
            F.count_distinct(F.col(c)).alias(f"{c}__nd"),
            (F.count(F.lit(1)) - F.count(c)).alias(f"{c}__nn"),
            _r4(F.min(c)).alias(f"{c}__min"),
            _r4(F.max(c)).alias(f"{c}__max"),
        ]
    wide = li.agg(*aggs)
    stack = ", ".join(
        f"'{c}', {c}__n, {c}__nd, {c}__nn, {c}__min, {c}__max" for c in cols
    )
    return wide.selectExpr(
        f"stack({len(cols)}, {stack}) AS (col, n, n_distinct, n_null, min_v, max_v)"
    )



_BPE_ITER_BLOCK = """
p{i} AS (
  SELECT UNNEST(list_transform(generate_series(1, GREATEST(len(s) - 1, 0)),
                               j -> s[j] || ' ' || s[j + 1])) AS p,
         cnt
  FROM s{prev}),
m{i} AS (SELECT p, CAST(SUM(cnt) AS BIGINT) AS n FROM p{i} GROUP BY p
         ORDER BY n DESC, p ASC LIMIT 1),
mm{i} AS (
  -- exhaustion guard: when no pairs remain m{i} is empty, and a bare
  -- cross join would drop the whole vocabulary from s{i}; the sentinel
  -- pair (a lone control char: its split has no second element, so the
  -- merge condition is never TRUE) makes the pass an explicit no-op
  SELECT p FROM m{i}
  UNION ALL
  SELECT chr(1) WHERE NOT EXISTS (SELECT 1 FROM m{i})),
r{i} AS (
  SELECT w, cnt, s AS rest, []::VARCHAR[] AS done FROM s{prev}
  UNION ALL
  SELECT r.w, r.cnt,
         CASE WHEN len(r.rest) >= 2 AND r.rest[1] = string_split(m.p, ' ')[1]
                   AND r.rest[2] = string_split(m.p, ' ')[2]
              THEN r.rest[3:] ELSE r.rest[2:] END,
         CASE WHEN len(r.rest) >= 2 AND r.rest[1] = string_split(m.p, ' ')[1]
                   AND r.rest[2] = string_split(m.p, ' ')[2]
              THEN list_append(r.done, replace(m.p, ' ', ''))
              ELSE list_append(r.done, r.rest[1]) END
  FROM r{i} r, mm{i} m WHERE len(r.rest) > 0),
s{i} AS (SELECT w, cnt, done AS s FROM r{i} WHERE len(rest) = 0)"""

# shared CTE chain (wv -> s0 -> 3 x pair-count/argmax/greedy-merge); both
# BPE oracles compose from it instead of string surgery on each other
_BPE_CTE_PREFIX = (
    r"""
    WITH RECURSIVE
    wv AS (
      SELECT w, COUNT(*) AS cnt
      FROM (SELECT UNNEST(string_split(text, ' ')) AS w FROM documents)
      WHERE w <> '' GROUP BY w),
    s0 AS (
      SELECT w, cnt,
             string_split(trim(regexp_replace(w, '(.)', '\1 ', 'g')), ' ') AS s
      FROM wv),"""
    + ",".join(_BPE_ITER_BLOCK.format(i=i, prev=i - 1) for i in (1, 2, 3))
)

_BPE_SQL = (
    _BPE_CTE_PREFIX
    + """
    SELECT * FROM (
      SELECT 1 AS it, string_split(p, ' ')[1] AS lhs,
             string_split(p, ' ')[2] AS rhs, n AS pair_count FROM m1
      UNION ALL SELECT 2, string_split(p, ' ')[1], string_split(p, ' ')[2], n FROM m2
      UNION ALL SELECT 3, string_split(p, ' ')[1], string_split(p, ' ')[2], n FROM m3
    )
    """
)


@_q("bpe_learned_merges", _BPE_SQL)
def bpe_learned_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer TRAINING (Sennrich et al. 2016): the first 3 merge
    rules learned from the documents corpus — per iteration, count
    adjacent symbol pairs over the (word, count) vocabulary, take the
    most frequent pair (pair-string tiebreak), apply the merge greedily
    left-to-right (functions/text.bpe_learn: an F.aggregate fold, no
    UDF). The oracle replays the identical algorithm with chained
    recursive CTEs — the per-word greedy merge as a head-or-pair
    consuming recursion. Scale shape: state is vocabulary-sized; each
    iteration is one pair-count shuffle plus a single-row argmax
    collect (the rule itself)."""
    return TXT.bpe_learn(
        scattered(load_table(spark, sf_dir, "documents")), n_merges=3
    )


_BPE_TOKENIZE_SQL = (
    _BPE_CTE_PREFIX
    + """,
    occ AS (
      SELECT doc_id, w FROM (
        SELECT doc_id, UNNEST(string_split(text, ' ')) AS w FROM documents)
      WHERE w <> '')
    SELECT o.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(len(s3.s)) AS BIGINT) AS n_bpe_tokens
    FROM occ o JOIN s3 USING (w)
    GROUP BY o.doc_id
    """
)


@_q("bpe_token_counts", _BPE_TOKENIZE_SQL)
def bpe_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer APPLICATION: train 3 merges on the documents corpus
    (bpe_learned_merges), then tokenize every document with them and
    report per-doc (n_words, n_bpe_tokens) — the counts the token-budget
    and packing ops consume. Merges apply on the VOCABULARY (each
    distinct word folded once) and join back to word occurrences, so
    repeated words never re-tokenize (functions/text.bpe_tokenize_counts).
    The oracle extends the training CTE chain with the occurrence join
    over the fully merged symbol table."""
    docs = scattered(load_table(spark, sf_dir, "documents"))
    _, vocab = TXT.bpe_learn(docs, n_merges=3, return_vocab=True)
    out = TXT.bpe_tokenize_counts(docs, merged_vocab=vocab)
    return out.select(
        "doc_id",
        F.col("n_words").cast("long").alias("n_words"),
        F.col("n_bpe_tokens").cast("long").alias("n_bpe_tokens"),
    )


@_q(
    "cluster_safe_split_stats",
    """
    WITH RECURSIVE toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (
      SELECT doc_id,
             UNNEST(list_distinct(list_transform(
               generate_series(1, GREATEST(LEN(t) - 2, 0)),
               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS shingle
      FROM toks),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id),
    pairs AS (
      SELECT i.doc_a, i.doc_b
      FROM inter i
      JOIN sizes sa ON i.doc_a = sa.doc_id
      JOIN sizes sb ON i.doc_b = sb.doc_id
      WHERE n_inter / CAST(sa.n + sb.n - n_inter AS DOUBLE) >= 0.05),
    edges AS (
      SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs),
    reach(src, node) AS (
      SELECT a, a FROM edges
      UNION
      SELECT r.src, e.b FROM reach r JOIN edges e ON r.node = e.a),
    comp AS (SELECT src AS doc_id, MIN(node) AS cluster FROM reach GROUP BY src),
    spl AS (
      SELECT d.doc_id,
             COALESCE(c.cluster, d.doc_id) AS cluster_id,
             CASE WHEN substr(md5(CAST(COALESCE(c.cluster, d.doc_id) AS VARCHAR)), 1, 8) < 'cccccccc' THEN 'train'
                  WHEN substr(md5(CAST(COALESCE(c.cluster, d.doc_id) AS VARCHAR)), 1, 8) < 'e6666666' THEN 'val'
                  ELSE 'test' END AS split,
             CASE WHEN substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8) < 'cccccccc' THEN 'train'
                  WHEN substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8) < 'e6666666' THEN 'val'
                  ELSE 'test' END AS nsplit
      FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id),
    base AS (SELECT split, CAST(COUNT(*) AS BIGINT) AS n_docs,
                    CAST(COUNT(DISTINCT cluster_id) AS BIGINT) AS n_clusters
             FROM spl GROUP BY split),
    pj AS (SELECT a.split AS sa, b.split AS sb, a.nsplit AS na, b.nsplit AS nb
           FROM pairs p
           JOIN spl a ON p.doc_a = a.doc_id
           JOIN spl b ON p.doc_b = b.doc_id),
    leakc AS (SELECT s AS split, COUNT(*) AS n FROM (
                SELECT UNNEST([sa, sb]) AS s FROM pj WHERE sa != sb) GROUP BY s),
    leakn AS (SELECT s AS split, COUNT(*) AS n FROM (
                SELECT UNNEST([na, nb]) AS s FROM pj WHERE na != nb) GROUP BY s)
    SELECT base.split, base.n_docs, base.n_clusters,
           CAST(COALESCE(leakc.n, 0) AS BIGINT) AS n_leaked_pairs,
           CAST(COALESCE(leakn.n, 0) AS BIGINT) AS n_leaked_pairs_naive
    FROM base
    LEFT JOIN leakc ON base.split = leakc.split
    LEFT JOIN leakn ON base.split = leakn.split
    """,
)
def cluster_safe_split_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontaminated train/val/test splits: near-dup CLUSTERS (connected
    components over the exact 3-gram Jaccard pairs, threshold 0.05) are
    the unit of assignment (functions/sampling.cluster_safe_split), so no
    near-dup pair can straddle a split — n_leaked_pairs is 0 by
    construction, while n_leaked_pairs_naive shows what the per-document
    hash split of the SAME fractions would leak. The oracle replays
    pairs → components → md5-threshold assignment → leak counts in SQL."""
    from open_ftth_relational_projector_spark.functions.sampling import (
        cluster_safe_split,
        hash_split,
    )

    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    docs = load_table(spark, sf_dir, "documents")
    pairs = (
        D.ngram_jaccard_pairs(scattered(docs), threshold=0.05, n=3)
        .select("doc_a", "doc_b")
        .persist()
    )
    assigned = cluster_safe_split(docs, pairs, "doc_id", fr).persist()
    naive = hash_split(docs.select("doc_id"), "doc_id", fr, out="nsplit")

    base = assigned.groupBy("split").agg(
        F.expr("CAST(count(*) AS BIGINT) AS n_docs"),
        F.expr("CAST(count(DISTINCT cluster_id) AS BIGINT) AS n_clusters"),
    )
    pj = (
        pairs.join(
            assigned.selectExpr("doc_id AS doc_a", "split AS sa"), "doc_a"
        )
        .join(assigned.selectExpr("doc_id AS doc_b", "split AS sb"), "doc_b")
        .join(naive.selectExpr("doc_id AS doc_a", "nsplit AS na"), "doc_a")
        .join(naive.selectExpr("doc_id AS doc_b", "nsplit AS nb"), "doc_b")
    )

    def leaks(col_a: str, col_b: str, out: str) -> DataFrame:
        return (
            pj.filter(f"{col_a} != {col_b}")
            .selectExpr(f"explode(array({col_a}, {col_b})) AS split")
            .groupBy("split")
            .agg(F.expr(f"count(*) AS {out}"))
        )

    out = (
        base.join(leaks("sa", "sb", "n_leaked_pairs"), "split", "left")
        .join(leaks("na", "nb", "n_leaked_pairs_naive"), "split", "left")
        .selectExpr(
            "split",
            "n_docs",
            "n_clusters",
            "CAST(COALESCE(n_leaked_pairs, 0) AS BIGINT) AS n_leaked_pairs",
            "CAST(COALESCE(n_leaked_pairs_naive, 0) AS BIGINT)"
            " AS n_leaked_pairs_naive",
        )
    )
    rows = out.collect()  # bounded: one row per split label (3)
    pairs.unpersist()
    assigned.unpersist()
    return spark.createDataFrame(rows, out.schema)


@_q(
    "dup_substring_spans",
    """
    WITH base AS (SELECT doc_id, text AS t,
                         CAST(length(text) AS BIGINT) AS n_chars
                  FROM documents),
    grams AS (
      SELECT b.doc_id, u.pos,
             substr(b.t, CAST(u.pos + 1 AS INT), 20) AS gram
      FROM (SELECT * FROM base WHERE n_chars >= 20) b,
           LATERAL unnest(generate_series(0, b.n_chars - 20)) AS u(pos)),
    freq AS (SELECT gram FROM grams GROUP BY gram HAVING COUNT(*) >= 2),
    hits AS (SELECT g.doc_id, g.pos FROM grams g JOIN freq USING (gram)),
    marked AS (
      SELECT doc_id, pos,
             CASE WHEN lag(pos) OVER w IS NULL
                    OR pos > lag(pos) OVER w + 20
                  THEN 1 ELSE 0 END AS new_span
      FROM hits WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
    sp AS (SELECT doc_id, pos,
                  SUM(new_span) OVER (PARTITION BY doc_id ORDER BY pos)
                    AS span_id
           FROM marked),
    spans AS (SELECT doc_id, span_id,
                     MAX(pos) + 20 - MIN(pos) AS span_chars
              FROM sp GROUP BY doc_id, span_id),
    agg AS (SELECT doc_id, CAST(COUNT(*) AS INT) AS n_dup_spans,
                   CAST(SUM(span_chars) AS BIGINT) AS dup_chars
            FROM spans GROUP BY doc_id)
    SELECT b.doc_id,
           COALESCE(a.n_dup_spans, 0) AS n_dup_spans,
           CAST(COALESCE(a.dup_chars, 0) AS BIGINT) AS dup_chars,
           b.n_chars,
           CASE WHEN b.n_chars = 0 THEN 0.0
                ELSE ROUND(COALESCE(a.dup_chars, 0)
                           / CAST(b.n_chars AS DOUBLE), 4) END AS dup_frac
    FROM base b LEFT JOIN agg a USING (doc_id)
    """,
)
def dup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeated-substring span budget per document — the exact-substring
    dedup preprocessing of Lee et al. 2022 (functions/dedup.duplicated_spans,
    L=20): maximal char spans covered by corpus-repeated 20-grams, via an
    inverted gram index (hash shuffle standing in for the suffix array's
    global sort) + a per-doc ordered merge pass (window bounded by doc
    length). The oracle replays gram expansion, frequency filter, interval
    merge and the per-doc budget in SQL."""
    return D.duplicated_spans(
        load_table(spark, sf_dir, "documents"),
        min_len=20,
        repartition_to=spark.sparkContext.defaultParallelism,
    )


# --- r6: static domain-mixture planning -------------------------------------

def _mixture_sql() -> str:
    from open_ftth_relational_projector_spark.functions.sampling import (
        MIX_QD_SQL,
        mix_final_exprs,
    )

    finals = ",\n           ".join(mix_final_exprs(1_000_000))
    return f"""
    WITH per AS (
      SELECT source, SUM(LEN(string_split(text, ' '))) AS n_tokens
      FROM documents GROUP BY source),
    base AS (
      SELECT source, CAST(n_tokens AS BIGINT) AS n_tokens,
             CAST(n_tokens AS DOUBLE) / nt AS p_raw,
             {MIX_QD_SQL} AS qd
      FROM per CROSS JOIN (SELECT SUM(n_tokens) AS nt FROM per) tot)
    SELECT source, n_tokens,
           {finals}
    FROM base CROSS JOIN (SELECT SUM(qd) AS qsum FROM base) den
    """


@_q("domain_mixture_weights", _mixture_sql())
def domain_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Static domain-mixture plan for a 1M-token training draw
    (functions/sampling.mixture_weights): per source, token totals, raw
    share, √-temperature sampling weight (upweights small domains), the
    planned token draw, and implied epochs (>1 ⇒ repetition). One corpus
    scan; the G-row normalization uses exact DECIMAL(18,9) sums so both
    engines hold bit-identical weights (τ=0.5 makes the reweight an IEEE
    sqrt — correctly rounded, engine-identical by construction)."""
    from open_ftth_relational_projector_spark.functions.sampling import (
        mixture_weights,
    )

    return mixture_weights(
        load_table(spark, sf_dir, "documents"), token_budget=1_000_000
    )


# --- r6: corpus snapshot diff ------------------------------------------------

_SNAPSHOT_DIFF_SQL = """
    WITH d AS (SELECT CAST(doc_id AS VARCHAR) AS doc_id, lang, text
               FROM documents),
    v1 AS (SELECT doc_id, lang, md5(text) AS fp FROM d),
    b AS (SELECT doc_id, lang, text,
                 ('0x' || substr(md5(doc_id || '#0'), 1, 15))::BIGINT % 10
                   AS bkt
          FROM d),
    v2 AS (
      SELECT doc_id, lang,
             CASE WHEN bkt = 1 THEN md5(text || ' [rev2]')
                  ELSE md5(text) END AS fp
      FROM b WHERE bkt <> 0
      UNION ALL
      SELECT doc_id || '::v2', lang, md5('new:' || doc_id)
      FROM b WHERE bkt = 2)
    SELECT CASE WHEN v1.doc_id IS NULL THEN 'added'
                WHEN v2.doc_id IS NULL THEN 'removed'
                WHEN v1.fp = v2.fp THEN 'unchanged'
                ELSE 'changed' END AS status,
           COALESCE(v1.lang, v2.lang) AS lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id
    GROUP BY 1, 2
    """


@_q("corpus_snapshot_diff", _SNAPSHOT_DIFF_SQL)
def corpus_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-versioning diff (functions/dedup.snapshot_diff): v2 is a
    deterministic md5-bucketed mutation of the corpus (bucket 0 of 10
    removed, bucket 1 edited, bucket 2 additionally spawns a new doc),
    and the diff classifies every id added/removed/changed/unchanged by
    content fingerprint, aggregated per (status, lang). At scale only
    (id, fingerprint, lang) triples ship through the one full-outer
    shuffle — the text never moves; the output is the work-list an
    incremental recrawl/retrain pass re-enters into the pipeline."""
    from open_ftth_relational_projector_spark.functions.dedup import (
        portable_hash64,
        snapshot_diff,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("doc_id"), "lang", "text"
    )
    b = docs.select(
        "doc_id", "lang", "text",
        (portable_hash64(F.col("doc_id")) % 10).alias("bkt"),
    )
    v1 = docs.select("doc_id", "lang", F.md5("text").alias("fingerprint"))
    v2 = (
        b.filter("bkt <> 0")
        .select(
            "doc_id",
            "lang",
            F.when(
                F.col("bkt") == 1,
                F.md5(F.concat(F.col("text"), F.lit(" [rev2]"))),
            )
            .otherwise(F.md5("text"))
            .alias("fingerprint"),
        )
        .unionByName(
            b.filter("bkt = 2").select(
                F.concat(F.col("doc_id"), F.lit("::v2")).alias("doc_id"),
                "lang",
                F.md5(F.concat(F.lit("new:"), F.col("doc_id"))).alias(
                    "fingerprint"
                ),
            )
        )
    )
    return (
        snapshot_diff(v1, v2, carry=("lang",))
        .groupBy("status", "lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


# --- r6: overlapping token-window chunking -----------------------------------

_SLIDING_CHUNKS_SQL = """
    WITH d AS (SELECT CAST(doc_id AS VARCHAR) AS doc_id,
                      string_split(text, ' ') AS toks,
                      LEN(string_split(text, ' ')) AS n
               FROM documents),
    c AS (SELECT doc_id, toks, n,
                 UNNEST(range(0, (GREATEST(n - 64, 0) + 47) // 48 + 1)) AS idx
          FROM d)
    SELECT doc_id || ':' || CAST(idx AS VARCHAR) AS chunk_id,
           doc_id,
           CAST(idx AS INT) AS idx,
           CAST(LEAST(64, n - (idx * 48 + 1) + 1) AS INT) AS n_chunk_tokens,
           md5(array_to_string(list_slice(toks, idx * 48 + 1, idx * 48 + 64),
                               ' ')) AS fp
    FROM c
    """


@_q("sliding_token_chunks", _SLIDING_CHUNKS_SQL)
def sliding_token_chunks_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping 64-token windows at stride 48 (16-token overlap) per
    document (functions/text.sliding_token_chunks) — the long-document
    context-window preparation step. Map-only scan-side transform (one
    split + sequence/explode, no shuffle, no Python); chunk ids and the
    md5 of each chunk's space-rejoined text hash-match the oracle, so
    boundaries AND content replay exactly."""
    from open_ftth_relational_projector_spark.functions.text import (
        sliding_token_chunks,
    )

    return sliding_token_chunks(
        load_table(spark, sf_dir, "documents"), window=64, stride=48
    )


# --- r6: per-source quality capping ------------------------------------------

_QUALITY_CAP_SQL = """
    WITH r AS (
      SELECT source, doc_id, n_chars,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY n_chars DESC, doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY source) AS n
      FROM documents)
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN rn <= CEIL(0.6 * n) THEN 1 ELSE 0 END)
                AS BIGINT) AS n_kept,
           CAST(MIN(CASE WHEN rn <= CEIL(0.6 * n) THEN n_chars END)
                AS BIGINT) AS cutoff_chars
    FROM r GROUP BY source
    """


@_q("per_source_quality_cap", _QUALITY_CAP_SQL)
def per_source_quality_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep the top 60% of documents per source by a quality proxy
    (n_chars, tie-broken by id) — the per-domain curation cap that stops
    one noisy source from flooding the mix. The within-source rank rides
    operators.hierarchical_grouped_row_number (sources are the
    low-cardinality giant-group regime: a plain partitioned window would
    funnel each source through ONE task at corpus scale). The oracle
    replays rank, cap, and cutoff in window SQL."""
    from open_ftth_relational_projector_spark.operators.hierarchical import (
        hierarchical_grouped_row_number,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "source", "doc_id", "n_chars"
    )
    ranked = hierarchical_grouped_row_number(
        docs,
        ["source"],
        [F.desc("n_chars"), F.col("doc_id")],
        "_rn",
        shard_on=-F.col("n_chars"),
        total_col="_n",
    )
    kept = F.col("_rn") <= F.ceil(F.lit(0.6) * F.col("_n"))
    return ranked.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(kept, 1).otherwise(0)).alias("n_kept"),
        F.min(F.when(kept, F.col("n_chars"))).cast("long").alias(
            "cutoff_chars"
        ),
    )


# ===========================================================================
# Round 7: driver-visible twin agreement for the five rows-only ANN entries
# ===========================================================================
# minhash_near_dups / simhash_fingerprints / embedding_near_dups_lsh /
# knn_lsh / knn_ivf are approximate-by-design xxhash/partial-probe paths:
# their exact outputs are hash-family-dependent, so no ANSI-SQL oracle can
# replay them row-for-row. Their machinery is hash-matched through the
# *_md5 / *_fullprobe twins, and the guarantees the production variants DO
# make (pinned in tests/test_pipeline_functions.py) are verified here as
# catalog entries whose verdict columns have SQL-derivable expectations —
# so the driver's correctness gate sees the twin equivalence every round
# (round-6 verdict #6) instead of a rows-only record.

_SEP = chr(31)  # token/shingle joiner for set fingerprints (unit separator)

# Canonical set fingerprint = elements length-prefixed ("LEN:elem") then
# chr(31)-joined after sorting. The length prefix makes the encoding
# injective even if an element CONTAINS chr(31) (r7 advisor: without it,
# {"a\x1fb"} and {"a","b"} alias). Empty tokens need no special-casing:
# Spark F.split and DuckDB string_split agree exactly on leading /
# consecutive / trailing empties (pinned in
# tests/test_pipeline_functions.py::test_split_tokenization_engine_agreement).


def _canon_set_fp(arr: Column) -> Column:  # Spark side; twin: _canon_set_fp_sql
    return F.md5(
        F.concat_ws(
            _SEP,
            F.transform(
                F.array_sort(arr),
                lambda x: F.concat_ws(":", F.length(x), x),
            ),
        )
    )


def _canon_set_fp_sql(list_expr: str) -> str:
    return (
        f"array_to_string(list_transform(list_sort({list_expr}),"
        " x -> LEN(x) || ':' || x), chr(31))"
    )

_MINHASH_AGREE_SQL = f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (
      SELECT doc_id,
             list_distinct(list_transform(
               generate_series(1, GREATEST(LEN(t) - 2, 0)),
               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS g
      FROM toks),
    fp AS (SELECT {_canon_set_fp_sql('g')} AS f
           FROM sh WHERE LEN(g) > 0),
    grp AS (SELECT f, COUNT(*) AS n FROM fp GROUP BY f),
    exp AS (SELECT CAST(COALESCE(SUM(n * (n - 1) // 2), 0) AS BIGINT) AS d
            FROM grp)
    SELECT v.variant, exp.d AS n_dup_expected, exp.d AS n_dup_found,
           CAST(0 AS BIGINT) AS n_precision_viol
    FROM exp, (VALUES ('md5_portable'), ('production')) v(variant)
    ORDER BY v.variant
    """


@_q("minhash_twin_agreement", _MINHASH_AGREE_SQL)
def minhash_twin_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-visible verdict for the rows-only `minhash_near_dups`
    (xxhash64) entry and its `minhash_near_dups_md5` twin: both variants
    must (a) emit EVERY exact-duplicate pair — identical shingle sets
    collide on all bands under any hash family — and (b) emit ONLY
    exactly-scored true pairs (precision 1.0 against the n-gram Jaccard
    recomputed from the shingle sets). The expected duplicate-pair count
    is derived independently on both engines by grouping documents on a
    canonical sorted-shingle-set fingerprint; the violation counters'
    expectation is 0. Full pair-set equality across hash families is NOT
    claimed (banding recall at J<1 is hash-dependent) — see
    tests/test_pipeline_functions.py::test_minhash_xxhash_and_md5_twin_same_guarantees."""
    docs = scattered(load_table(spark, sf_dir, "documents"))
    sh = D.add_shingles(docs, 3)
    fp = _canon_set_fp(F.col("sh"))
    # cheap-token-count pre-filter instead of size(sh) > 0 on the projected
    # column: the latter is pushed below the shingle Project with the whole
    # chain substituted into the predicate — double evaluation per row
    # (same r12 fix as functions/dedup.minhash_banded; exactly equivalent,
    # grams are non-empty iff the token count reaches n=3)
    expected = (
        D.add_shingles(
            docs.filter(F.size(TXT.tokens(F.col("text"))) >= 3), 3
        )
        .groupBy(fp.alias("f"))
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(
            F.coalesce(
                F.sum(F.expr("n * (n - 1) DIV 2")), F.lit(0)
            ).cast("long").alias("n_dup_expected")
        )
    )
    sh_a = sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    sh_b = sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))

    def verdict(variant: str, **kw) -> DataFrame:
        out = D.minhash_near_dups(docs, threshold=0.05, **kw)
        j = out.join(sh_a, "doc_a").join(sh_b, "doc_b")
        inter = F.size(F.array_intersect("sh_a", "sh_b"))
        uni = F.size("sh_a") + F.size("sh_b") - inter
        jx = inter / uni.cast("double")
        viol = (F.col("jaccard") < F.lit(0.05)) | (
            F.abs(F.col("jaccard") - jx) > F.lit(1e-9)
        )
        counts = j.agg(
            F.coalesce(
                F.sum(F.when((inter == uni) & (uni > 0), 1).otherwise(0)),
                F.lit(0),
            ).cast("long").alias("n_dup_found"),
            F.coalesce(
                F.sum(F.when(viol, 1).otherwise(0)), F.lit(0)
            ).cast("long").alias("n_precision_viol"),
        )
        return (
            expected.crossJoin(F.broadcast(counts))
            .select(
                F.lit(variant).alias("variant"),
                "n_dup_expected",
                "n_dup_found",
                "n_precision_viol",
            )
        )

    return verdict("production").unionByName(
        verdict(
            "md5_portable", hash_fn=D.portable_hash64, portable_bands=True
        )
    )


_SIMHASH_AGREE_SQL = f"""
    WITH fp AS (
      SELECT {_canon_set_fp_sql("list_distinct(string_split(text, ' '))")} AS f
      FROM documents),
    g AS (SELECT f, COUNT(*) AS n FROM fp GROUP BY f)
    SELECT v.variant,
           CAST((SELECT SUM(n) FROM g) AS BIGINT) AS n_docs,
           CAST((SELECT COUNT(*) FROM g) AS BIGINT) AS n_token_set_groups,
           CAST(0 AS BIGINT) AS n_fp_mismatch
    FROM (VALUES ('md5_portable'), ('production')) v(variant)
    ORDER BY v.variant
    """


@_q("simhash_twin_agreement", _SIMHASH_AGREE_SQL)
def simhash_twin_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-visible verdict for the rows-only `simhash_fingerprints`
    (xxhash64) entry and its `simhash_fingerprints_md5` twin: a SimHash
    is a deterministic function of the document's DISTINCT token set, so
    within each variant every group of documents sharing a token set must
    carry exactly one distinct fingerprint (n_fp_mismatch = 0); the group
    census (n_docs, n_token_set_groups) is derived independently on both
    engines from a canonical sorted-token-set fingerprint."""
    docs = scattered(load_table(spark, sf_dir, "documents"))
    fp = docs.select(
        "doc_id",
        _canon_set_fp(F.array_distinct(TXT.tokens(F.col("text")))).alias("f"),
    )

    def verdict(variant: str, **kw) -> DataFrame:
        sim = D.simhash64(docs, **kw)
        g = sim.join(fp, "doc_id").groupBy("f").agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("simhash").alias("nd"),
        )
        return g.agg(
            F.lit(variant).alias("variant"),
            F.sum("n").cast("long").alias("n_docs"),
            F.count(F.lit(1)).cast("long").alias("n_token_set_groups"),
            F.sum(F.when(F.col("nd") > 1, 1).otherwise(0))
            .cast("long")
            .alias("n_fp_mismatch"),
        )

    return verdict("production").unionByName(
        verdict("md5_portable", n_bits=60, hash_fn=D.portable_hash64)
    )


# Certification sample bound (r7 verdict #4): the agreement entry NEEDS an
# exact all-pairs ground truth (same standing as knn_bruteforce), but exact
# all-pairs is O(n²) — so it certifies on the deterministic prefix sample
# `vec_id < _EMB_AGREE_MAX_ID` (vec_id is the table's dense key; both
# engines replay the same WHERE). ≤4096 vectors ⇒ ≤ ~8.4M scored pairs,
# a fixed ceiling at any corpus size; at the test fixtures (≤2000 rows)
# the filter passes everything, so certified behavior is unchanged.
_EMB_AGREE_MAX_ID = 4096

_EMB_NEAR_DUPS_SAMPLE_SQL = _EMB_NEAR_DUPS_SQL.replace(
    "FROM embeddings),",
    f"FROM embeddings WHERE vec_id < {_EMB_AGREE_MAX_ID}),",
)
assert "WHERE vec_id <" in _EMB_NEAR_DUPS_SAMPLE_SQL  # template anchor moved?

_EMB_LSH_AGREE_SQL = f"""
    SELECT CAST((SELECT COUNT(*) FROM ({_EMB_NEAR_DUPS_SAMPLE_SQL}) e) AS BIGINT)
             AS n_exact_pairs,
           CAST(0 AS BIGINT) AS n_fullprobe_diff,
           CAST(0 AS BIGINT) AS n_prod_violations
    """


@_q("emb_lsh_twin_agreement", _EMB_LSH_AGREE_SQL)
def emb_lsh_twin_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-visible verdict for the rows-only `embedding_near_dups_lsh`
    entry: (a) its fullprobe twin (probe_radius == n_planes scans every
    bucket) must equal the exact all-pairs result row-for-row including
    cosines (n_fullprobe_diff = 0, with the exact pair count replayed by
    the SQL oracle), and (b) every pair the production partial-probe
    variant emits must exist in the exact result with the identical
    cosine — LSH bucketing can only LOSE pairs, never invent or rescore
    one (n_prod_violations = 0).

    Certifies on the deterministic bounded sample ``vec_id <
    _EMB_AGREE_MAX_ID`` (all rows at fixture scale; a fixed ≤4096-vector
    ceiling at 100×) so the exact all-pairs ground truth this entry
    requires never becomes a corpus-sized O(n²) join."""
    # the bounded sample is read by THREE pipelines (exact / fullprobe /
    # prod) — pin it once instead of rescanning per branch
    emb = (
        scattered(load_table(spark, sf_dir, "embeddings"))
        .filter(F.col("vec_id") < _EMB_AGREE_MAX_ID)
        .localCheckpoint(eager=True)
    )
    exact = S.embedding_near_dups(emb, threshold=0.45)
    full = S.embedding_near_dups(
        emb, threshold=0.45, bucketed=True, n_planes=4, probe_radius=4
    )
    prod = S.embedding_near_dups(emb, threshold=0.45, bucketed=True, n_planes=4)

    # the exact all-pairs result anchors BOTH verdicts (the fullprobe
    # full-outer diff and the prod containment join); without the
    # checkpoint the O(sample²) cosine pass runs twice. Bounded by the
    # _EMB_AGREE_MAX_ID ceiling that bounds the ground truth itself.
    e = (
        exact.select("id_a", "id_b", F.col("cosine").alias("c_e"))
        .withColumn("_e", F.lit(1))
        .localCheckpoint(eager=True)
    )
    n_exact = e.agg(F.count(F.lit(1)).cast("long").alias("n_exact_pairs"))
    f = full.select("id_a", "id_b", F.col("cosine").alias("c_f")).withColumn(
        "_f", F.lit(1)
    )
    fd = e.join(f, ["id_a", "id_b"], "full_outer")
    n_full_diff = fd.agg(
        F.coalesce(
            F.sum(
                F.when(
                    F.col("_e").isNull()
                    | F.col("_f").isNull()
                    | (F.col("c_e") != F.col("c_f")),
                    1,
                ).otherwise(0)
            ),
            F.lit(0),
        ).cast("long").alias("n_fullprobe_diff")
    )
    pd_ = prod.select("id_a", "id_b", F.col("cosine").alias("c_p")).join(
        e, ["id_a", "id_b"], "left"
    )
    n_prod_viol = pd_.agg(
        F.coalesce(
            F.sum(
                F.when(
                    F.col("_e").isNull() | (F.col("c_p") != F.col("c_e")), 1
                ).otherwise(0)
            ),
            F.lit(0),
        ).cast("long").alias("n_prod_violations")
    )
    return (
        n_exact.crossJoin(F.broadcast(n_full_diff))
        .crossJoin(F.broadcast(n_prod_viol))
    )


# ceiling on the twin probes' corpus: brute-force ground truth is
# (n/100 queries × n corpus) pairs — 43M comparisons at the ceiling,
# far past any fixture (≤2000 rows) but still probe-feasible
_KNN_TWIN_MAX_ROWS = 65536


def _knn_twin_verdict(
    spark: SparkSession, sf_dir: str, fullprobe, production
) -> DataFrame:
    """Shared assembly for the knn twin-agreement entries: fullprobe must
    equal brute force on (query_id, neighbor_id, rnk) exactly; the
    production approximate result must be internally consistent — each
    query's returned neighbors ranked by TRUE exact cosine (descending,
    neighbor_id tiebreak) with the reported contiguous ranks. The rank
    recheck joins the tiny (queries × k) result against the embeddings
    and windows over ≤k rows per query — bounded regardless of corpus
    size."""
    # five pipelines read the embeddings (brute / fullprobe / prod /
    # query-vector / candidate-vector sides) — pin the scan once. The
    # twin is a CERTIFICATION probe, not a production path: its brute-
    # force ground truth is only feasible at probe scale anyway (the
    # scale paths are the rows-only knn_lsh/knn_ivf entries this twin
    # certifies), so materializing the probe corpus once is the right
    # trade — it is not a pattern for corpus-sized production inputs.
    # The probe-scale assumption is ENFORCED, not advisory (r11 advice):
    # a corpus past the ceiling fails named BEFORE the checkpoint
    # materializes it (the count is a parquet-metadata read). Filtering
    # instead of failing would silently change the certified result set.
    # guard-count the UN-scattered frame (r12 review): counting after the
    # round-robin repartition executed a full scan + exchange job; on the
    # bare parquet scan Spark answers the count from footer metadata —
    # same value, same guard, no data pass
    base = load_table(spark, sf_dir, "embeddings")
    n_emb = base.count()
    if n_emb > _KNN_TWIN_MAX_ROWS:
        raise ValueError(
            f"_knn_twin_verdict is a probe-scale certification path: "
            f"embeddings has {n_emb} rows > {_KNN_TWIN_MAX_ROWS}; run it "
            f"on a bounded probe corpus (the production ANN paths are the "
            f"scale entries this twin certifies)"
        )
    emb = scattered(base).localCheckpoint(eager=True)
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    brute = S.knn_bruteforce(emb, queries, k=5)
    b = brute.withColumn("_b", F.lit(1))
    f = fullprobe(emb, queries).withColumn("_f", F.lit(1))
    n_exact = b.agg(F.count(F.lit(1)).cast("long").alias("n_exact_rows"))
    d = b.join(f, ["query_id", "neighbor_id", "rank"], "full_outer")
    n_diff = d.agg(
        F.coalesce(
            F.sum(
                F.when(F.col("_b").isNull() | F.col("_f").isNull(), 1).otherwise(0)
            ),
            F.lit(0),
        ).cast("long").alias("n_fullprobe_diff")
    )
    prod = production(emb, queries)
    qv = emb.select(
        F.col("vec_id").alias("query_id"),
        S.as_double(F.col("embedding")).alias("qv"),
    ).withColumn("qn", S.l2_norm(F.col("qv")))
    cv = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        S.as_double(F.col("embedding")).alias("cv"),
    ).withColumn("cn", S.l2_norm(F.col("cv")))
    scored = (
        cv.join(F.broadcast(prod), "neighbor_id")
        .join(F.broadcast(qv.join(F.broadcast(prod.select("query_id").distinct()), "query_id")), "query_id")
        .withColumn(
            "sim",
            S.cosine_prenormed(
                F.col("qv"), F.col("cv"), F.col("qn"), F.col("cn")
            ),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    n_misrank = scored.withColumn("_rr", F.row_number().over(w)).agg(
        F.coalesce(
            F.sum(F.when(F.col("rank") != F.col("_rr"), 1).otherwise(0)),
            F.lit(0),
        ).cast("long").alias("n_prod_misranked")
    )
    return (
        n_exact.crossJoin(F.broadcast(n_diff))
        .crossJoin(F.broadcast(n_misrank))
    )


_KNN_AGREE_SQL = f"""
    SELECT CAST((SELECT COUNT(*) FROM ({_KNN_BRUTEFORCE_SQL}) b) AS BIGINT)
             AS n_exact_rows,
           CAST(0 AS BIGINT) AS n_fullprobe_diff,
           CAST(0 AS BIGINT) AS n_prod_misranked
    """


@_q("knn_lsh_twin_agreement", _KNN_AGREE_SQL)
def knn_lsh_twin_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-visible verdict for the rows-only `knn_lsh` entry: the
    fullprobe twin (radius == n_planes covers every bucket) must equal
    brute force exactly (count replayed by the SQL oracle), and the
    production partial-probe result must rank its returned candidates by
    true exact cosine — bucketing restricts the CANDIDATE set but never
    reorders survivors."""
    return _knn_twin_verdict(
        spark,
        sf_dir,
        fullprobe=lambda emb, q: S.knn_lsh(
            emb, q, k=5, n_planes=4, probe_radius=4
        ),
        production=lambda emb, q: S.knn_lsh(emb, q, k=5),
    )


@_q("knn_ivf_twin_agreement", _KNN_AGREE_SQL)
def knn_ivf_twin_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-visible verdict for the rows-only `knn_ivf` entry: probing
    every cell (n_probe == n_centroids) must equal brute force exactly
    regardless of the trained quantizer (count replayed by the SQL
    oracle), and the production n_probe=4 result must rank its returned
    candidates by true exact cosine — the inverted file restricts the
    CANDIDATE set but never reorders survivors."""
    return _knn_twin_verdict(
        spark,
        sf_dir,
        fullprobe=lambda emb, q: S.knn_ivf(
            emb, q, k=5, n_centroids=16, n_probe=16
        ),
        production=lambda emb, q: S.knn_ivf(emb, q, k=5),
    )
