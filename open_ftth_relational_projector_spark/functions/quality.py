"""Corpus-quality signals for LLM training-data pipelines: repetition,
token entropy, PII detection/redaction.

These are the standard pre-training filters (Gopher/MassiveText repetition
rules, entropy-style gibberish screens, PII scrubbing) re-expressed as pure
Spark column expressions — whole-stage codegen, no Python anywhere.

Scale design: every signal here is a PER-DOCUMENT aggregate, so none of
them shuffles at all. Instead of the textbook explode → groupBy(doc, gram)
→ groupBy(doc) (two corpus-sized exchanges), each document's n-gram
multiset is sorted row-locally (`array_sort`) and folded in one
`F.aggregate` pass over the runs — O(len·log len) per row, zero Exchange
in the plan, embarrassingly parallel over whatever partitioning the scan
arrives with. On 100 TB that is the difference between a map-only job and
shuffling ~4× the corpus. pii_scan is per-row regexp work, same shape.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from open_ftth_relational_projector_spark.functions.text import let, tokens


def _bigrams_all(text: Column) -> Column:
    """ALL word-bigram occurrences (unlike dedup.shingles, no de-dup —
    repetition measures need multiplicity)."""

    def grams(toks: Column) -> Column:
        cnt = F.size(toks)
        idx = F.when(cnt >= 2, F.sequence(F.lit(1), cnt - 1)).otherwise(
            F.array().cast("array<int>")
        )
        return F.transform(
            idx,
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i), F.element_at(toks, i + 1)
            ),
        )

    return let(tokens(text), grams)


def _run_stats(sorted_arr: Column) -> Column:
    """Fold a SORTED array into struct(n_distinct, max_run, sum_clnc):
    distinct element count, longest equal-run length, and Σ c·ln(c) over
    run lengths c — everything the repetition and entropy signals need,
    in one O(len) codegen pass with no shuffle."""
    zero = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("n_distinct"),
        F.lit(0).cast("long").alias("max_run"),
        F.lit(0.0).alias("sum_clnc"),
    )

    def close_run(acc: Column) -> Column:
        # contributions of the just-finished run (no-op when run == 0)
        return (
            F.greatest(acc["max_run"], acc["run"]).alias("max_run"),
            (
                acc["sum_clnc"]
                + F.when(
                    acc["run"] > 0, acc["run"] * F.log(acc["run"])
                ).otherwise(F.lit(0.0))
            ).alias("sum_clnc"),
        )

    def step(acc: Column, x: Column) -> Column:
        same = acc["prev"].eqNullSafe(x)
        max_run, sum_clnc = close_run(acc)
        return F.struct(
            x.alias("prev"),
            F.when(same, acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.when(same, acc["n_distinct"])
            .otherwise(acc["n_distinct"] + 1)
            .alias("n_distinct"),
            F.when(same, acc["max_run"]).otherwise(max_run).alias("max_run"),
            F.when(same, acc["sum_clnc"]).otherwise(sum_clnc).alias("sum_clnc"),
        )

    def finish(acc: Column) -> Column:
        max_run, sum_clnc = close_run(acc)
        return F.struct(acc["n_distinct"], max_run, sum_clnc)

    return F.aggregate(sorted_arr, zero, step, finish)


def repetition_stats(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition signals per document.

    Returns (doc_id, n_bigrams, dup_bigram_frac, top_bigram_frac):
      * dup_bigram_frac — fraction of bigram OCCURRENCES that are repeats
        of an earlier occurrence (1 - distinct/total);
      * top_bigram_frac — fraction taken by the single most frequent
        bigram (MassiveText filters docs where this is large).

    Row-local: sort the doc's bigram multiset, fold the runs. Zero
    Exchange in the plan (vs 2 for explode → groupBy → groupBy); the job
    is map-only at any corpus size. Docs with <2 tokens have no bigrams
    and drop out (the oracle's GROUP BY drops them identically).
    """
    n = F.col("_n")
    st = F.col("_st")
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            _bigrams_all(F.col(text_col)).alias("_big"),
        )
        .select(
            "doc_id",
            F.size("_big").alias("_n"),
            _run_stats(F.array_sort("_big")).alias("_st"),
        )
        .filter(n >= 1)
        .select(
            "doc_id",
            n.cast("long").alias("n_bigrams"),
            F.round(1.0 - st["n_distinct"] / n, 4).alias("dup_bigram_frac"),
            F.round(st["max_run"] / n, 4).alias("top_bigram_frac"),
        )
    )


def token_entropy(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Shannon entropy (nats) of each document's word distribution — the
    cheap gibberish/boilerplate screen (near-zero entropy = one token
    repeated; high entropy = diverse vocabulary).

    H = ln(n) - (Σ c·ln c)/n with the c's read off equal-runs of the
    row-locally sorted token array — one fold, no shuffle, map-only at
    any scale.
    """
    n = F.col("_n")
    st = F.col("_st")
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            tokens(F.col(text_col)).alias("_tok"),
        )
        .select(
            "doc_id",
            F.size("_tok").alias("_n"),
            _run_stats(F.array_sort("_tok")).alias("_st"),
        )
        .select(
            "doc_id",
            n.cast("long").alias("n_tokens"),
            F.round(F.log(n) - st["sum_clnc"] / n, 4).alias("entropy"),
        )
    )


# Regex subset shared by Java regex (Spark) and RE2 (DuckDB) — keep these
# engine-portable so the oracle runs the identical pattern.
EMAIL_RE = "[a-z0-9]+@[a-z0-9]+\\.[a-z]+"
PHONE_RE = "\\d{3}-\\d{4}"
IPV4_RE = "\\d+\\.\\d+\\.\\d+\\.\\d+"


def with_synthetic_pii(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Deterministically inject synthetic PII derived from the doc id.

    The test corpus contains no PII by construction, so an extraction
    oracle over raw text would only ever verify zeros. This injection —
    reproduced verbatim in the SQL oracle — makes the extraction and
    redaction logic itself the thing under differential test.
    """
    i = F.col(id_col)
    aug = F.concat(
        F.col(text_col),
        F.when(
            i % 7 == 0, F.concat(F.lit(" contact user"), i, F.lit("@example.com"))
        ).otherwise(F.lit("")),
        F.when(
            i % 11 == 0, F.concat(F.lit(" call 555-"), (1000 + i % 9000))
        ).otherwise(F.lit("")),
        F.when(
            i % 13 == 0,
            F.concat(F.lit(" host 10.0."), i % 256, F.lit("."), i % 100),
        ).otherwise(F.lit("")),
    )
    return docs.withColumn(text_col, aug)


def pii_scan(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document PII counts + redacted-text fingerprint.

    Pure row-local regexp expressions (codegen, zero shuffle): counts of
    email / phone / IPv4 matches, and the md5 of the text with all three
    replaced by typed placeholders — the shippable scrubbed corpus is the
    same expression minus the md5. Redaction order (email → phone → ip) is
    part of the contract; the oracle applies the identical order.
    """
    t = F.col(text_col)
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
        ),
        IPV4_RE,
        "<IP>",
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(F.regexp_extract_all(t, F.lit(EMAIL_RE), F.lit(0)))
        .cast("int")
        .alias("n_emails"),
        F.size(F.regexp_extract_all(t, F.lit(PHONE_RE), F.lit(0)))
        .cast("int")
        .alias("n_phones"),
        F.size(F.regexp_extract_all(t, F.lit(IPV4_RE), F.lit(0)))
        .cast("int")
        .alias("n_ips"),
        F.md5(redacted).alias("redacted_md5"),
    )


def bigram_lm_scores(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-trained bigram language-model score per document — the
    CCNet/KenLM-style "perplexity filter": documents whose text the
    corpus LM finds improbable are gibberish/outlier candidates.

    Model: P(w2|w1) = (C(w1 w2) + 1) / (C(w1) + V), trained on the WHOLE
    input corpus (C = occurrence counts, V = distinct-token vocabulary
    size). Returned per doc: (doc_id, n_bigrams, avg_logprob) where
    avg_logprob = mean ln P over the doc's bigrams (perplexity =
    exp(−avg_logprob); kept in log space so the 4-dp rounding contract
    is additive).

    Scale shape — the sharded-n-gram-table recipe: bigram and unigram
    count tables come from map-side-combined groupBys keyed on the gram;
    the corpus joins back against them ON THE SAME KEYS (co-partitioned
    shuffles, no broadcast of corpus-sized state); V is one scalar
    aggregate broadcast via a 1-row cross join. Everything stays JVM-side.
    """
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("text"),
    )
    uni = base.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("w")
    )
    big = base.select(
        "doc_id",
        F.explode(_bigrams_all(F.col("text"))).alias("bg"),
    )
    c2 = big.groupBy("bg").agg(F.count(F.lit(1)).alias("c12"))
    c1 = uni.groupBy("w").agg(F.count(F.lit(1)).alias("c1"))
    # V = |{distinct w}| = the row count of the c1 gram table — a
    # gram-table-sized aggregate, NOT another countDistinct pass over the
    # exploded corpus
    vocab = c1.agg(F.count(F.lit(1)).alias("v"))
    # pre-score the GRAM table (c2 ⋈ c1 is gram-sized), so the corpus-sized
    # bigram stream shuffles once (join on bg) instead of twice (bg then
    # w1) — the per-row lp value is identical, just computed once per
    # distinct bigram instead of once per occurrence
    lp_table = (
        c2.withColumn("w1", F.split(F.col("bg"), " ").getItem(0))
        .join(c1, F.col("w1") == c1["w"])
        .crossJoin(F.broadcast(vocab))
        .select(
            "bg",
            F.log(
                (F.col("c12") + F.lit(1)).cast("double")
                / (F.col("c1") + F.col("v")).cast("double")
            ).alias("lp"),
        )
    )
    return (
        big.join(lp_table, "bg")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_bigrams"),
            F.round(F.avg("lp"), 4).alias("avg_logprob"),
        )
    )


def robust_outlier_stats(
    df: DataFrame,
    group_col: str,
    value_col: str,
    z_thresh: float = 3.5,
) -> DataFrame:
    """Median/MAD robust outlier audit per group (Iglewicz-Hoaglin
    modified z-score): z = 0.6745·(x − median)/MAD, flagged when
    |z| > ``z_thresh``. The robust counterpart to mean/stddev z-scoring —
    immune to the outliers it is hunting (a single 10^9 glitch inflates a
    stddev gate into uselessness but moves a median not at all).

    Two exact-median passes (median of values, then median of absolute
    deviations), each via the grouped hierarchical-rank exact quantile
    (``operators/quantiles.exact_quantiles`` — bit-identical to the exact
    ``percentile`` aggregate, but range-sharded instead of buffering a
    data-proportional group's values in one aggregation state), with the
    tiny per-group stats broadcast back — the value stream is scanned,
    never self-joined.
    Groups with MAD ≈ 0 (over half the values identical) are excluded:
    every deviation would be infinitely many MADs out.

    Returns (group_col, n BIGINT, med, mad, n_anomalies BIGINT).
    """
    from open_ftth_relational_projector_spark.operators.quantiles import (
        exact_quantiles,
    )

    # persist: the tiny per-group median frame feeds the MAD pass's input
    # (which exact_quantiles evaluates in two eager jobs + the final
    # action) AND the final join — without it the whole median pipeline
    # re-executes once per consumer evaluation
    from open_ftth_relational_projector_spark.cache import tracked_persist

    med = tracked_persist(
        exact_quantiles(df, value_col, {"_med": 0.5}, group_cols=[group_col])
    )
    mad = exact_quantiles(
        df.join(F.broadcast(med), group_col),
        F.abs(F.col(value_col) - F.col("_med")),
        {"_mad": 0.5},
        group_cols=[group_col],
    )
    z = F.lit(0.6745) * (F.col(value_col) - F.col("_med")) / F.col("_mad")
    return (
        df.join(F.broadcast(med), group_col)
        .join(F.broadcast(mad), group_col)
        .filter(F.col("_mad") > 1e-12)
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.min("_med"), 4).alias("med"),
            F.round(F.min("_mad"), 4).alias("mad"),
            F.sum(
                F.when(F.abs(z) > z_thresh, F.lit(1)).otherwise(F.lit(0))
            )
            .cast("long")
            .alias("n_anomalies"),
        )
    )
