"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Scale design:
  * exact_dedup_groups — hash-groupBy, one shuffle on the content hash.
  * ngram_jaccard_pairs — EXACT similarity join via shingle inverted index
    (explode → co-occurrence join → count). Quadratic only within a shingle
    bucket; used as the oracle for the approximate paths and fine up to
    ~10^6 docs. At 100 TB use minhash_lsh_candidates first.
  * minhash_lsh_candidates — MinHash signatures (xxhash64 with k seeds, all
    JVM-side) banded into LSH buckets; candidate pairs only ever join inside
    a (band, band-signature) bucket → linear shuffle, no all-pairs.
  * simhash64 — 64-bit sign-sum fingerprint per doc; near-dups = small
    Hamming distance, found by multi-probe on rotated prefixes (buckets).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from open_ftth_relational_projector_spark.functions.text import let, tokens


def shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of the single-space-tokenized text.

    The token array is let-bound (functions.text.let), so the tokenizing
    split evaluates once per row however the expression is referenced or
    rewritten — safe to use inline, including under explode.
    """
    return let(tokens(text), lambda toks: _grams_of(toks, n))


def _grams_of(toks: Column, n: int) -> Column:
    cnt = F.size(toks)
    # guard: Spark's sequence(1, x) DESCENDS when x < 1, so short texts need
    # an explicit empty-array branch
    idx = F.when(
        cnt >= n, F.sequence(F.lit(1), cnt - (n - 1))
    ).otherwise(F.array().cast("array<int>"))
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + j) for j in range(n)]
        ),
    )
    return F.array_distinct(grams)


def add_shingles(
    docs: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    out: str = "sh",
) -> DataFrame:
    """(id, shingle-array); the split is let-bound inside the expression,
    so downstream plan rewrites can't multiply its evaluation."""
    return docs.select(
        F.col(id_col).alias("doc_id"), shingles(F.col(text_col), n).alias(out)
    )


def exact_dedup_groups(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Group identical texts: (text_hash, n_copies, canonical_id=min id)."""
    return (
        docs.select(F.md5(F.col(text_col)).alias("text_hash"), F.col(id_col))
        .groupBy("text_hash")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min(id_col).alias("canonical_id"),
        )
    )


def _shingle_index(docs: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    return add_shingles(docs, n, text_col, id_col).select(
        "doc_id", F.explode("sh").alias("shingle")
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.2,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact n-gram Jaccard similarity join via inverted index.

    Returns (doc_a, doc_b, jaccard) for doc_a < doc_b with J ≥ threshold.

    Plan shape (one tokenize pass, two shuffles, no self-join):
    shingle arrays are computed ONCE with the doc's shingle count carried
    alongside; the inverted index groups on a 64-bit shingle hash (long
    shuffle keys, not strings) and each posting list expands to its
    in-bucket pairs with higher-order array functions — work per shingle is
    |postings|², confined to genuinely shared shingles. A pair's
    intersection size is then a plain count. At 100 TB, cap/salt posting
    lists of stop-shingles before the expansion (they dominate the square).
    """
    # one exploded struct keeps the shingle array single-referenced (one
    # evaluation per row); n_sh rides along on every posting row
    entries = let(
        shingles(F.col(text_col), n),
        lambda g: F.transform(
            g, lambda s: F.struct(F.size(g).alias("n_sh"), s.alias("shingle"))
        ),
    )
    sh = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(entries).alias("e")
    ).select("doc_id", F.col("e.n_sh").alias("n_sh"), F.col("e.shingle").alias("shingle"))

    postings = sh.groupBy(F.xxhash64("shingle").alias("sh_hash")).agg(
        F.array_sort(F.collect_list(F.struct("doc_id", "n_sh"))).alias("ds")
    )
    pairs = postings.filter(F.size("ds") > 1).select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("ds"),
                    lambda a, i: F.transform(
                        F.slice(
                            F.col("ds"), i + F.lit(2), F.size("ds") - i - 1
                        ),
                        lambda b: F.struct(a.alias("a"), b.alias("b")),
                    ),
                )
            )
        ).alias("p")
    )
    inter = pairs.groupBy(
        F.col("p.a.doc_id").alias("doc_a"),
        F.col("p.b.doc_id").alias("doc_b"),
    ).agg(
        F.count(F.lit(1)).alias("n_inter"),
        F.first("p.a.n_sh").alias("size_a"),
        F.first("p.b.n_sh").alias("size_b"),
    )
    return (
        inter.withColumn(
            "jaccard",
            F.col("n_inter")
            / (F.col("size_a") + F.col("size_b") - F.col("n_inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def minhash_signature(shingle_arr: Column, num_hashes: int = 32) -> Column:
    """MinHash signature: per seed, min xxhash64 over the shingle set.

    xxhash64 is a JVM built-in — the whole signature is codegen'd, no UDF.
    Pass a MATERIALIZED shingle array column (compute shingles once; the
    32 per-seed passes then scan the array without re-deriving the grams).
    """
    mins = [
        F.array_min(F.transform(shingle_arr, lambda s: F.xxhash64(s, F.lit(i))))
        for i in range(num_hashes)
    ]
    return F.array(*mins)


def minhash_lsh_candidates(
    docs: DataFrame,
    num_hashes: int = 32,
    bands: int = 8,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """LSH candidate pairs: docs sharing ≥1 identical signature band.

    rows_per_band = num_hashes // bands. Returns distinct (doc_a, doc_b).
    Shuffle is keyed by (band_id, band_hash) — linear in corpus size; the
    quadratic blow-up is confined to true near-dup buckets.
    """
    rows = num_hashes // bands
    sig = add_shingles(docs, n, text_col, id_col).select(
        "doc_id", minhash_signature(F.col("sh"), num_hashes).alias("sig")
    )
    banded = sig.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.hash(F.slice(F.col("sig"), i * rows + 1, rows))
                    for i in range(bands)
                ]
            )
        ).alias("band_id", "band_hash"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(b, ["band_id", "band_hash"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


def minhash_near_dups(
    docs: DataFrame,
    threshold: float = 0.2,
    num_hashes: int = 32,
    bands: int = 8,
    n: int = 3,
) -> DataFrame:
    """LSH candidates verified with exact Jaccard, computed per candidate
    pair via array_intersect on the two shingle arrays — work is strictly
    proportional to the candidate count (no shingle-index self-join)."""
    cands = minhash_lsh_candidates(docs, num_hashes, bands, n)
    sh = add_shingles(docs, n)
    a = sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    return (
        cands.join(a, "doc_a")
        .join(b, "doc_b")
        .withColumn(
            "jaccard",
            inter
            / (F.size("sh_a") + F.size("sh_b") - inter).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def cross_doc_shingle_dup(
    docs: DataFrame,
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cross-document duplication profile (the RefinedWeb/CCNet signal):
    for each doc, the fraction of its distinct n-gram shingles that also
    appear in at least one OTHER document.

    Plan: explode distinct shingles → one groupBy(shingle) posting count →
    join back keyed on the shingle → one per-doc aggregate. Inverted-index
    shape, linear shuffles, no pair expansion at all — this is the filter
    you run at 100 TB where even bucketed pair joins are too much. Shingle
    strings are the join key here for oracle parity; at scale key on
    xxhash64(shingle) (64-bit shuffle keys) exactly as ngram_jaccard_pairs
    does.
    """
    sh = _shingle_index(docs, text_col, id_col, n)
    counts = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    return (
        sh.join(counts, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_shingles"),
            F.sum(F.when(F.col("df") > 1, 1).otherwise(0))
            .cast("int")
            .alias("n_shared"),
            F.round(
                F.sum(F.when(F.col("df") > 1, 1).otherwise(0))
                / F.count(F.lit(1)),
                4,
            ).alias("shared_frac"),
        )
    )


def benchmark_decontamination(
    docs: DataFrame,
    every: int = 50,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Training-set decontamination against a held-out benchmark: flag
    every training doc sharing any n-gram shingle with the eval set.

    The eval set here is the deterministic slice doc_id % every == 0 (in a
    real pipeline: the benchmark suites). Its distinct shingle set is
    small relative to the corpus by construction, so it BROADCASTS — the
    training corpus is scanned once, never shuffled for the probe; the
    only shuffle is the per-doc overlap count. 8-grams are the standard
    contamination unit (GPT-3/PaLM reports use 8-13).
    """
    is_eval = (F.col(id_col) % every) == 0
    eval_sh = (
        _shingle_index(docs.filter(is_eval), text_col, id_col, n)
        .select("shingle")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    train_sh = _shingle_index(docs.filter(~is_eval), text_col, id_col, n)
    return (
        train_sh.join(F.broadcast(eval_sh), "shingle", "left")
        .groupBy("doc_id")
        .agg(F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("int").alias("n_overlap"))
        .select(
            "doc_id",
            "n_overlap",
            (F.col("n_overlap") > 0).alias("contaminated"),
        )
    )


def simhash64(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """64-bit SimHash per document, fully JVM-side: explode distinct tokens,
    xxhash64 each, and for every bit accumulate +1/-1 in ONE groupBy pass
    (64 conditional-sum aggregates, map-side combined); the fingerprint has
    bit b set when its sum is positive. Returns (id_col, simhash long)."""
    tok = docs.select(
        F.col(id_col),
        F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("tok"),
    ).withColumn("h", F.xxhash64("tok"))
    bit_aggs = [
        F.sum(
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{b}")
        for b in range(64)
    ]
    sums = tok.groupBy(id_col).agg(*bit_aggs)
    fp = None
    for b in range(64):
        term = F.when(
            F.col(f"b{b}") > 0, F.shiftleft(F.lit(1).cast("long"), b)
        ).otherwise(F.lit(0).cast("long"))
        fp = term if fp is None else fp.bitwiseOR(term)
    return sums.select(F.col(id_col), fp.alias("simhash"))


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))
