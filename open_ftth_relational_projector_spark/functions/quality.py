"""Corpus-quality signals for LLM training-data pipelines: repetition,
token entropy, PII detection/redaction.

These are the standard pre-training filters (Gopher/MassiveText repetition
rules, entropy-style gibberish screens, PII scrubbing) re-expressed as pure
Spark column expressions + keyed aggregations — whole-stage codegen, no
Python in any hot path, every shuffle keyed by doc or by term.

Scale design:
  * repetition_stats / token_entropy — explode n-grams/tokens, ONE
    map-side-combined groupBy per level; work is linear in corpus tokens
    and partitions by doc, so 1000 executors split 100 TB evenly.
  * pii_scan — per-row regexp expressions only; no shuffle at all.
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


def repetition_stats(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition signals per document.

    Returns (doc_id, n_bigrams, dup_bigram_frac, top_bigram_frac):
      * dup_bigram_frac — fraction of bigram OCCURRENCES that are repeats
        of an earlier occurrence (1 - distinct/total);
      * top_bigram_frac — fraction taken by the single most frequent
        bigram (MassiveText filters docs where this is large).

    Two keyed aggregations — (doc, bigram) then doc — both map-side
    combined; no joins, no windows. Docs with <2 tokens have no bigrams
    and drop out (the oracle's GROUP BY drops them identically).
    """
    occ = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(_bigrams_all(F.col(text_col))).alias("bigram"),
    )
    per_bigram = occ.groupBy("doc_id", "bigram").agg(
        F.count(F.lit(1)).alias("c")
    )
    return per_bigram.groupBy("doc_id").agg(
        F.sum("c").alias("n_bigrams"),
        F.round(1.0 - F.count(F.lit(1)) / F.sum("c"), 4).alias(
            "dup_bigram_frac"
        ),
        F.round(F.max("c") / F.sum("c"), 4).alias("top_bigram_frac"),
    )


def token_entropy(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Shannon entropy (nats) of each document's word distribution — the
    cheap gibberish/boilerplate screen (near-zero entropy = one token
    repeated; high entropy = diverse vocabulary).

    Uses H = ln(n) - (Σ c·ln c)/n so one (doc, token) count pass plus one
    per-doc aggregate suffices — no second join to bring n alongside c.
    """
    counts = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(tokens(F.col(text_col))).alias("tok"),
        )
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    n = F.sum("c")
    return counts.groupBy("doc_id").agg(
        n.cast("long").alias("n_tokens"),
        F.round(F.log(n) - F.sum(F.col("c") * F.log("c")) / n, 4).alias(
            "entropy"
        ),
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
