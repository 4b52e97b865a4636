"""Driver-checkable sims of the keyed-state streaming operators.

`streaming/stateful.py`'s incremental dedup and LSH near-dup candidate
operators (round-4 additions) were test-only; these entries drive them
through a REAL Structured Streaming query (file source, 3 utime-ordered
micro-batches, availableNow drain) on driver data so the driver's oracle
gate can check the state machinery end to end — the same promotion
`stream_incremental_sim` gave the relational streaming path (round-4
verdict #7).

Registered after every other family so existing registration order (and
the r1-r4 correctness-row keying) is untouched.
"""

from __future__ import annotations

import itertools
import json
import os
import shutil
import tempfile
import time

from pyspark.sql import DataFrame, SparkSession, functions as F  # noqa: F401

from open_ftth_relational_projector_spark.sources.tables import load_table

from ._registry import _q

_CALL_SEQ = itertools.count()


def _drain_stream_over_doc_batches(
    spark: SparkSession,
    sf_dir: str,
    op,
    name: str,
    shuffle_partitions: int | None = None,
    extra_fields: dict[str, str] | None = None,
    payloads_for_batch=None,
):
    """Split the documents table into 3 doc_id-ranged micro-batches
    (seq = doc_id), write them as utime-ordered json files (FileStreamSource
    processes oldest-modTime first, so cross-batch arrival follows seq
    order), drain `op(stream)` with availableNow into a memory sink, and
    return the materialized rows + output schema.

    ``payloads_for_batch(b, rows)`` overrides the per-batch payload
    generation (default: range-sliced thirds of the docs, seq = doc_id) —
    e.g. the snapshot sim emits per-batch document VERSIONS.

    Driver-side bounds: the documents table is collected once to write the
    batch files — 500 rows at the driver-gate sf0.01, 5k at sf0.1 (the
    bounded-sim class, same as stream_incremental_sim's watermark collect).
    At production scale the stream IS the source; this sim exists to put
    the state fold under the correctness gate, not to model ingest.
    """
    extra = dict(extra_fields or {})  # name -> spark DDL type, e.g. "long"
    rows = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text", *extra)
        .collect()
    )
    rows.sort(key=lambda r: r["doc_id"])
    if payloads_for_batch is None:
        third = (len(rows) + 2) // 3

        def payloads_for_batch(b, rows):  # noqa: PLR1704 - default impl
            for r in rows[b * third : (b + 1) * third]:
                payload = {
                    "doc_id": r["doc_id"],
                    "seq": r["doc_id"],
                    "text": r["text"],
                }
                for c in extra:
                    payload[c] = r[c]
                yield payload

    qname = f"{name}_{next(_CALL_SEQ)}"
    tmp = tempfile.mkdtemp(prefix=f"ofrp_{name}_")
    try:
        os.makedirs(f"{tmp}/in")
        now = time.time()
        for b in range(3):
            path = f"{tmp}/in/batch_{b:05d}.json"
            with open(path, "w") as fh:
                for payload in payloads_for_batch(b, rows):
                    fh.write(json.dumps(payload) + "\n")
            os.utime(path, (now + b, now + b))
        schema_ddl = "doc_id long, seq long, text string" + "".join(
            f", {c} {t}" for c, t in extra.items()
        )
        stream = (
            spark.readStream.schema(schema_ddl)
            .option("maxFilesPerTrigger", "1")
            .json(f"{tmp}/in")
        )
        # the state-store partition count is fixed at query START, so set
        # it before .start() and restore after (same rationale as bench.py's
        # _domain_conf). Callers whose per-batch work is trivial (dedup:
        # md5 + first-wins) pass a small value — a 32-way keyed-state
        # shuffle is pure task + python-worker overhead there (14s -> 5s
        # measured at sf0.1); compute-heavy folds (LSH banding) keep the
        # session parallelism (4-way measured SLOWER: 29s vs 22s).
        prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
        if shuffle_partitions is not None:
            spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
        try:
            q = (
                op(stream)
                .writeStream.outputMode("append")
                .format("memory")
                .queryName(qname)
                .option("checkpointLocation", f"{tmp}/cp")
                .trigger(availableNow=True)
                .start()
            )
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        try:
            # a False return (timeout, no exception) would mean comparing a
            # PARTIAL drain against the full-batch oracle — fail loudly
            if not q.awaitTermination(600):
                raise RuntimeError(
                    f"{name}: availableNow drain did not finish in 600s"
                )
        finally:
            if q.isActive:
                q.stop()  # never rmtree under a still-running query
        out = spark.table(qname)
        schema = out.schema
        collected = out.collect()
        return collected, schema
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.catalog.dropTempView(qname)


@_q(
    "stream_dedup_sim",
    """
    SELECT md5(text) AS text_hash,
           CAST(MIN(doc_id) AS BIGINT) AS doc_id,
           CAST(MIN(doc_id) AS BIGINT) AS first_seen_seq
    FROM documents GROUP BY md5(text)
    """,
)
def stream_dedup_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """streaming_dedup_first driven through a real 3-micro-batch stream:
    each distinct content hash is admitted exactly once across the whole
    drained stream, earliest (seq, doc_id) copy winning. With seq = doc_id
    and seq-ordered batch arrival, the union of the appended micro-batch
    outputs must equal the batch first-occurrence result — which the
    oracle states as MIN(doc_id) per md5(text)."""
    from open_ftth_relational_projector_spark.streaming.stateful import (
        streaming_dedup_first,
    )

    rows, schema = _drain_stream_over_doc_batches(
        spark, sf_dir, streaming_dedup_first, "sdedup", shuffle_partitions=4
    )
    return spark.createDataFrame(rows, schema)


@_q(
    "stream_lsh_sim",
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
      FROM sh CROSS JOIN (SELECT UNNEST(range(0, 16)) AS s) seeds
      GROUP BY doc_id, s),
    bands AS (
      SELECT doc_id, CAST(s // 4 AS INT) AS band_id,
             string_agg(CAST(m AS VARCHAR), ',' ORDER BY s) AS band_key
      FROM mh GROUP BY doc_id, s // 4)
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b ON a.band_id = b.band_id AND a.band_key = b.band_key
     AND a.doc_id < b.doc_id
    """,
)
def stream_lsh_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """streaming_lsh_candidates (md5-portable banding, same twin hash as
    minhash_near_dups_md5) drained over a real 3-micro-batch stream: the
    DISTINCT (doc_a, doc_b) set must equal the batch banding's in-bucket
    pairs — pairs only ever form against already-admitted bucket members,
    so splitting the corpus across micro-batches must not lose or invent
    any pair (arrival order is irrelevant to the distinct-pair set).
    max_bucket is raised so the degenerate-bucket cap (pinned separately
    in tests/test_stateful.py) never binds at driver scale and the oracle
    stays the uncapped bucket join."""
    from open_ftth_relational_projector_spark.functions.dedup import (
        portable_hash64,
    )
    from open_ftth_relational_projector_spark.streaming.stateful import (
        streaming_lsh_candidates,
    )

    def op(stream):
        # 16 hashes / 4 bands (4 rows per band, same rows-per-band as the
        # batch default): half the per-batch signature cost of the 32-hash
        # default — this sim gates state-machinery correctness, not recall
        return streaming_lsh_candidates(
            stream,
            num_hashes=16,
            bands=4,
            hash_fn=portable_hash64,
            portable_bands=True,
            max_bucket=4096,
        )

    rows, _ = _drain_stream_over_doc_batches(spark, sf_dir, op, "slshsim")
    pairs = sorted({(r["doc_a"], r["doc_b"]) for r in rows})
    return spark.createDataFrame(pairs or [], "doc_a long, doc_b long")


# α_256 as one IEEE-double literal, from the same shared constant as the
# batch function / streaming fold / batch oracle (catalog/sketches.py)
from .sketches import _HLL_ALPHA as _HLL_ALPHA_SQL  # noqa: E402


@_q(
    "stream_hll_sim",
    f"""
    WITH h AS (SELECT lang,
                 ('0x' || substr(md5(CAST(n_chars AS VARCHAR) || '#7'), 1, 15))::BIGINT AS hv
               FROM documents),
    hb AS (SELECT lang, hv // 4503599627370496 AS bucket,
                  CASE WHEN hv % 4503599627370496 = 0 THEN 53
                       ELSE 53 - length(bin(hv % 4503599627370496)) END AS rho
           FROM h),
    reg AS (SELECT lang, bucket, MAX(rho) AS mx FROM hb GROUP BY lang, bucket),
    ms AS (SELECT lang, COUNT(*) AS nz, SUM(pow(2.0, -mx)) AS pz,
                  SUM(bucket * 64 + mx) AS sig_s, MAX(bucket * 64 + mx) AS sig_m
           FROM reg GROUP BY lang)
    SELECT lang,
           CAST(nz AS INT) AS registers_used,
           CAST(sig_s AS BIGINT) AS sig_s,
           CAST(sig_m AS BIGINT) AS sig_m,
           ROUND(CASE WHEN CAST({_HLL_ALPHA_SQL} AS DOUBLE) * 65536 / ((256 - nz) + pz) <= 640.0
                       AND nz < 256
                      THEN CAST(256 AS DOUBLE) * ln(CAST(256 AS DOUBLE) / (256 - nz))
                      ELSE CAST({_HLL_ALPHA_SQL} AS DOUBLE) * 65536 / ((256 - nz) + pz)
                 END, 4) AS hll_est
    FROM ms
    """,
)
def stream_hll_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """streaming_hll_distinct (per-lang distinct n_chars cardinality via
    256 HLL registers in keyed state) drained over a real 3-micro-batch
    stream: register max-merge is order- and batching-independent, so the
    final per-group state must equal the batch sketch over the union of
    the batches — the oracle replays registers + exact integer register
    signature + estimator in SQL. The sketch-state pattern: per-group
    state is CONSTANT-SIZE however many distinct values stream past
    (contrast streaming_dedup_first, whose state grows with keys)."""
    from open_ftth_relational_projector_spark.streaming.stateful import (
        streaming_hll_distinct,
    )

    def op(stream):
        return streaming_hll_distinct(stream, "lang", "n_chars", seed=7)

    rows, _ = _drain_stream_over_doc_batches(
        spark,
        sf_dir,
        op,
        "shll",
        shuffle_partitions=4,
        extra_fields={"lang": "string", "n_chars": "long"},
    )
    out = _final_state(
        rows, ("g", "registers_used", "sig_s", "sig_m", "hll_est")
    )
    return spark.createDataFrame(
        out,
        "lang string, registers_used int, sig_s long, sig_m long,"
        " hll_est double",
    ).selectExpr(
        "lang",
        "registers_used",
        "sig_s",
        "sig_m",
        "ROUND(hll_est, 4) AS hll_est",
    )


from .sketches import _HDR_K, _hdr_bucket_sql, _hdr_est, _hdr_sel  # noqa: E402


def _final_state(rows, fields):
    """Drained availableNow sims emit one summary row per (group,
    micro-batch); the group's FINAL state is its highest-n_updates row
    (state only accumulates). Shared by the HLL/HDR sketch sims."""
    best: dict = {}
    for r in rows:
        if r["g"] not in best or r["n_updates"] > best[r["g"]]["n_updates"]:
            best[r["g"]] = r
    return [tuple(r[f] for f in fields) for r in best.values()]


@_q(
    "stream_hdr_sim",
    f"""
    WITH bk AS (
      SELECT lang, CAST(n_chars AS BIGINT) AS v,
             {_hdr_bucket_sql('CAST(n_chars AS BIGINT)')} AS bucket
      FROM documents WHERE n_chars >= 1),
    merged AS (SELECT lang, bucket, COUNT(*) AS c FROM bk GROUP BY lang, bucket),
    ms AS (SELECT lang, COUNT(*) AS nb, SUM(c) AS n, SUM(bucket * c) AS sig_s,
                  MAX(bucket) AS sig_m FROM merged GROUP BY lang),
    cum AS (SELECT lang, bucket,
                   SUM(c) OVER (PARTITION BY lang ORDER BY bucket) AS cum
            FROM merged),
    sel AS (SELECT cum.lang,
                   {_hdr_sel('0.5', 'p50')},
                   {_hdr_sel('0.9', 'p90')},
                   {_hdr_sel('0.99', 'p99')}
            FROM cum JOIN ms ON cum.lang = ms.lang GROUP BY cum.lang)
    SELECT ms.lang AS lang, CAST(ms.n AS BIGINT) AS n,
           CAST(ms.nb AS INT) AS nb,
           CAST(ms.sig_s AS BIGINT) AS sig_s,
           CAST(ms.sig_m AS BIGINT) AS sig_m,
           ROUND({_hdr_est('_bp50')}, 4) AS est_p50,
           ROUND({_hdr_est('_bp90')}, 4) AS est_p90,
           ROUND({_hdr_est('_bp99')}, 4) AS est_p99
    FROM ms JOIN sel ON ms.lang = sel.lang
    """,
)
def stream_hdr_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """streaming_hdr_quantiles (per-lang p50/p90/p99 of n_chars via the
    log-linear bucket histogram in keyed state) drained over a real
    3-micro-batch stream: histogram addition is order- and
    batching-independent, so the final per-group state must equal the
    batch sketch over the union of the batches — the oracle replays
    bucket ids, histogram signature, cumulative-rank reads and the
    midpoint estimator in SQL. Contrast stream_hll_sim (distinct-count
    registers): same constant-bounded sketch-state pattern, quantile
    flavor."""
    from open_ftth_relational_projector_spark.streaming.stateful import (
        streaming_hdr_quantiles,
    )

    def op(stream):
        return streaming_hdr_quantiles(stream, "lang", "n_chars")

    rows, _ = _drain_stream_over_doc_batches(
        spark,
        sf_dir,
        op,
        "shdr",
        shuffle_partitions=4,
        extra_fields={"lang": "string", "n_chars": "long"},
    )
    out = _final_state(
        rows,
        (
            "g",
            "n_updates",
            "nb",
            "sig_s",
            "sig_m",
            "est_p50",
            "est_p90",
            "est_p99",
        ),
    )
    return spark.createDataFrame(
        out,
        "lang string, n long, nb int, sig_s long, sig_m long,"
        " est_p50 double, est_p90 double, est_p99 double",
    ).selectExpr(
        "lang",
        "n",
        "nb",
        "sig_s",
        "sig_m",
        "ROUND(est_p50, 4) AS est_p50",
        "ROUND(est_p90, 4) AS est_p90",
        "ROUND(est_p99, 4) AS est_p99",
    )


@_q(
    "stream_topk_sim",
    """
    WITH d AS (
      SELECT lang,
             ('0x' || substr(md5(lang || '#0'), 1, 15))::BIGINT % 2 AS shard
      FROM documents),
    s AS (SELECT shard, COUNT(*) AS n_shard FROM d GROUP BY shard),
    c AS (SELECT shard, lang, COUNT(*) AS n FROM d GROUP BY shard, lang)
    SELECT CAST(c.shard AS VARCHAR) AS shard, c.lang AS lang,
           CAST(c.n AS BIGINT) AS exact_n,
           CAST(s.n_shard AS BIGINT) AS n_shard,
           TRUE AS retained,
           TRUE AS est_bounds_ok
    FROM c JOIN s USING (shard)
    WHERE c.n * 2 > s.n_shard
    """,
)
def stream_topk_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """streaming_space_saving (m=2 counters per shard, 2 md5-hash shards,
    key=lang) drained over a real 3-micro-batch stream. SpaceSaving's
    counter evolution is order-SENSITIVE, so the oracle checks its
    order-INDEPENDENT guarantees instead of replaying state: every lang
    whose true count exceeds n_shard/m must be retained in its shard's
    final counters (`retained`), with true <= est <= true + err
    (`est_bounds_ok`) — both computed live from the drained state against
    exact SQL counts, TRUE by the Metwally et al. 2005 theorems."""
    from open_ftth_relational_projector_spark.streaming.stateful import (
        streaming_space_saving,
    )

    def op(stream):
        return streaming_space_saving(stream, "lang", "seq", m=2, n_shards=2)

    rows, _ = _drain_stream_over_doc_batches(
        spark,
        sf_dir,
        op,
        "stopk",
        shuffle_partitions=4,
        extra_fields={"lang": "string"},
    )
    # final counter table per shard = rows carrying the highest n_shard
    final_n: dict = {}
    for r in rows:
        if r["shard"] not in final_n or r["n_shard"] > final_n[r["shard"]]:
            final_n[r["shard"]] = r["n_shard"]
    retained = {
        (r["shard"], r["key"]): r
        for r in rows
        if r["n_shard"] == final_n[r["shard"]]
    }
    from open_ftth_relational_projector_spark.functions.dedup import (
        portable_hash64,
    )

    exact = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("lang").isNotNull())
        .select(
            F.pmod(portable_hash64(F.col("lang"), 0), F.lit(2))
            .cast("string")
            .alias("shard"),
            "lang",
        )
        .groupBy("shard", "lang")
        .count()
        .collect()
    )
    out = []
    for r in exact:
        shard, lang, n = r["shard"], r["lang"], int(r["count"])
        n_shard = final_n[shard]
        if n * 2 > n_shard:  # the guaranteed-retention threshold (m=2)
            hit = retained.get((shard, lang))
            bounds = hit is not None and (
                n <= hit["est"] <= n + hit["err"]
            )
            out.append((shard, lang, n, n_shard, hit is not None, bool(bounds)))
    return spark.createDataFrame(
        out,
        "shard string, lang string, exact_n long, n_shard long,"
        " retained boolean, est_bounds_ok boolean",
    )




def _drain_query(spark, df, tag: str, tmp: str, shuffle_partitions: int = 4):
    """Start an availableNow drain of ``df`` into a memory sink and return
    the collected rows — shuffle-partition save/restore and the
    stop-before-cleanup guard shared with _drain_stream_over_doc_batches
    (never rmtree a checkpoint under a still-running query)."""
    prev_sp = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
    try:
        q = (
            df.writeStream.outputMode("append")
            .format("memory")
            .queryName(tag)
            .option("checkpointLocation", f"{tmp}/cp")
            .trigger(availableNow=True)
            .start()
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_sp)
    try:
        try:
            if not q.awaitTermination(600):
                raise RuntimeError(f"{tag}: drain did not finish in 600s")
        finally:
            if q.isActive:
                q.stop()
        return spark.sql(f"SELECT * FROM {tag}").collect()
    finally:
        spark.catalog.dropTempView(tag)


@_q(
    "stream_join_sim",
    """
    SELECT v.event_id AS view_id, p.event_id AS purchase_id,
           v.user_id AS user_id,
           CAST(epoch_us(p.ts) - epoch_us(v.ts) AS BIGINT) AS gap_us
    FROM events v JOIN events p
      ON v.user_id = p.user_id
     AND v.event_type = 'view' AND p.event_type = 'purchase'
     AND p.ts >= v.ts
     AND p.ts <= v.ts + INTERVAL 360 MINUTE
    """,
)
def stream_join_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join (streaming/joins.stream_interval_join):
    the events table splits into a VIEW stream and a PURCHASE stream, each
    replayed as 3 event-id-ordered micro-batch files; purchases join to
    the same user's views within a 6-hour event-time window. Both sides
    are watermarked — the time-range condition is what lets Spark evict
    two-sided join state (bounded by max_gap of data, not stream length)
    — and an inner interval join drops no in-watermark matches, so the
    fully drained replay must equal the batch interval join the oracle
    runs. Timestamps travel as epoch micros and rebuild with
    timestamp_micros, so event-time comparisons are integer-exact on
    both engines."""
    from open_ftth_relational_projector_spark.streaming.joins import (
        stream_interval_join,
    )

    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("view", "purchase"))
        .selectExpr(
            "event_id",
            "user_id",
            "unix_micros(CAST(ts AS TIMESTAMP)) AS ts_us",
            "event_type",
        )
        .collect()
    )
    # replay in EVENT-TIME order: batch files are the arrival order, and
    # with a finite watermark delay an out-of-order replay could drop
    # late rows / evict join state the batch oracle keeps
    ev.sort(key=lambda r: r["ts_us"])
    tag = f"sjoin{next(_CALL_SEQ)}"
    tmp = tempfile.mkdtemp(prefix=f"ofrp_{tag}_")
    try:
        for side in ("view", "purchase"):
            os.makedirs(f"{tmp}/{side}")
        now = time.time()
        third = (len(ev) + 2) // 3
        for b in range(3):
            chunk = ev[b * third : (b + 1) * third]
            for side in ("view", "purchase"):
                path = f"{tmp}/{side}/batch_{b:05d}.json"
                with open(path, "w") as fh:
                    for r in chunk:
                        if r["event_type"] == side:
                            fh.write(
                                json.dumps(
                                    {
                                        "event_id": r["event_id"],
                                        "user_id": r["user_id"],
                                        "ts_us": r["ts_us"],
                                    }
                                )
                                + "\n"
                            )
                os.utime(path, (now + b, now + b))

        def src(side):
            return (
                spark.readStream.schema("event_id long, user_id long, ts_us long")
                .option("maxFilesPerTrigger", "1")
                .json(f"{tmp}/{side}")
                .selectExpr(
                    f"event_id AS {side}_id",
                    "user_id",
                    f"timestamp_micros(ts_us) AS {side}_ts",
                    f"ts_us AS {side}_us",
                )
            )

        joined = stream_interval_join(
            src("view"),
            src("purchase"),
            "user_id",
            "view_ts",
            "purchase_ts",
            max_gap_minutes=360,
        ).selectExpr(
            "l.view_id AS view_id",
            "r.purchase_id AS purchase_id",
            "l.user_id AS user_id",
            "r.purchase_us - l.view_us AS gap_us",
        )
        rows = _drain_query(spark, joined, tag, tmp)
        out = sorted(
            (r["view_id"], r["purchase_id"], r["user_id"], r["gap_us"])
            for r in rows
        )
        return spark.createDataFrame(
            out or [],
            "view_id long, purchase_id long, user_id long, gap_us long",
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@_q(
    "stream_session_sim",
    """
    WITH e AS (
      SELECT user_id, epoch_us(ts) AS ts_us FROM events
      WHERE event_type IN ('view', 'click', 'purchase')),
    flagged AS (
      SELECT user_id, ts_us,
             CASE WHEN lag(ts_us) OVER w IS NULL
                    OR ts_us - lag(ts_us) OVER w > 1800000000
                  THEN 1 ELSE 0 END AS new_session
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)),
    sess AS (
      SELECT user_id, ts_us,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts_us)
               AS session_id
      FROM flagged)
    SELECT CAST(user_id AS VARCHAR) AS g,
           MIN(ts_us) AS start_us,
           MAX(ts_us) AS end_us,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM sess GROUP BY user_id, session_id
    """,
)
def stream_session_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """streaming_sessionize (EventTimeTimeout state; 30-min gap over each
    user's view/click/purchase stream) drained over 3 ordered micro-batch
    files plus a watermark-flushing SENTINEL batch (one far-future event
    for a key the output drops): the sentinel advances the event-time
    watermark past every real session's end + gap, so ALL sessions emit
    and the drained output must equal batch lag/island sessionization —
    which is exactly the SQL the oracle runs. Session bounds travel as
    epoch micros, integer-exact on both engines."""
    from open_ftth_relational_projector_spark.streaming.stateful import (
        streaming_sessionize,
    )

    GAP_MIN = 30
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("view", "click", "purchase"))
        .selectExpr("user_id", "unix_micros(CAST(ts AS TIMESTAMP)) AS ts_us")
        .collect()
    )
    ev.sort(key=lambda r: r["ts_us"])
    if not ev:
        return spark.createDataFrame(
            [], "g string, start_us long, end_us long, n_events long"
        )
    tag = f"ssess{next(_CALL_SEQ)}"
    tmp = tempfile.mkdtemp(prefix=f"ofrp_{tag}_")
    try:
        os.makedirs(f"{tmp}/in")
        now = time.time()
        third = (len(ev) + 2) // 3
        for b in range(3):
            path = f"{tmp}/in/batch_{b:05d}.json"
            with open(path, "w") as fh:
                for r in ev[b * third : (b + 1) * third]:
                    fh.write(
                        json.dumps({"user_id": r["user_id"], "ts_us": r["ts_us"]})
                        + "\n"
                    )
            os.utime(path, (now + b, now + b))
        # sentinel: one event far past max_ts + gap + watermark delay, for a
        # key that cannot collide with real user ids — advances the
        # watermark so every real session times out and emits
        sentinel_ts = ev[-1]["ts_us"] + (GAP_MIN + 10) * 60_000_000
        path = f"{tmp}/in/batch_99999.json"
        with open(path, "w") as fh:
            fh.write(json.dumps({"user_id": -1, "ts_us": sentinel_ts}) + "\n")
        os.utime(path, (now + 3, now + 3))

        stream = (
            spark.readStream.schema("user_id long, ts_us long")
            .option("maxFilesPerTrigger", "1")
            .json(f"{tmp}/in")
        )
        rows = _drain_query(
            spark, streaming_sessionize(stream, "user_id", "ts_us", GAP_MIN),
            tag, tmp,
        )
        out = sorted(
            (r["g"], r["start_us"], r["end_us"], r["n_events"])
            for r in rows
            if r["g"] != "-1"  # the sentinel's own session is not data
        )
        return spark.createDataFrame(
            out or [],
            "g string, start_us long, end_us long, n_events long",
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


from open_ftth_relational_projector_spark.functions.regression import (  # noqa: E402
    OLS2_B0,
    OLS2_B1,
    OLS2_B2,
    OLS2_SSE,
    OLS2_SST,
)

_SOLS_FEAT = """
    f AS (
      SELECT lang,
             CAST(n_chars AS BIGINT) AS x1,
             CAST(LEN(text) - LEN(REPLACE(text, 'e', '')) AS BIGINT) AS x2,
             CAST(LEN(string_split(text, ' ')) AS BIGINT) AS y
      FROM documents)
"""


@_q(
    "stream_ols_sim",
    f"""
    WITH {_SOLS_FEAT},
    m AS (
      SELECT lang,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(x1) AS DOUBLE) AS s1,
             CAST(SUM(x2) AS DOUBLE) AS s2,
             CAST(SUM(y)  AS DOUBLE) AS sy,
             CAST(SUM(x1 * x1) AS DOUBLE) AS s11,
             CAST(SUM(x1 * x2) AS DOUBLE) AS s12,
             CAST(SUM(x2 * x2) AS DOUBLE) AS s22,
             CAST(SUM(x1 * y) AS DOUBLE) AS s1y,
             CAST(SUM(x2 * y) AS DOUBLE) AS s2y,
             CAST(SUM(y * y) AS DOUBLE) AS syy
      FROM f GROUP BY lang),
    beta AS (
      SELECT *, {OLS2_B0} AS b0, {OLS2_B1} AS b1, {OLS2_B2} AS b2 FROM m),
    fit AS (
      SELECT lang, n, b0, b1, b2, {OLS2_SSE} AS sse, {OLS2_SST} AS sst
      FROM beta)
    SELECT lang, CAST(n AS BIGINT) AS n_rows,
           ROUND(b0, 6) + 0 AS beta0, ROUND(b1, 6) + 0 AS beta1,
           ROUND(b2, 6) + 0 AS beta2,
           ROUND(1 - sse / sst, 6) + 0 AS r2
    FROM fit
    """,
)
def stream_ols_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """streaming_ols_moments (per-lang normal-equation moment sums as
    keyed state — online model refresh, 10 integers of state per group)
    drained over a real 3-micro-batch stream: integer-moment addition is
    order- and batching-independent, so the final state must equal the
    batch aggregation over the batch union; BOTH sides then apply the
    identical regression.OLS2_* solve text (token count ~ chars +
    'e'-count per language). Contrast ols_price_model: same closed-form
    one-pass family, streaming-state flavor."""
    from open_ftth_relational_projector_spark.streaming.stateful import (
        streaming_ols_moments,
    )

    def op(stream):
        feats = stream.selectExpr(
            "lang",
            "n_chars AS x1",
            "length(text) - length(replace(text, 'e', '')) AS x2",
            "size(split(text, ' ')) AS y",
        )
        return streaming_ols_moments(feats, "lang", "x1", "x2", "y")

    rows, _ = _drain_stream_over_doc_batches(
        spark,
        sf_dir,
        op,
        "sols",
        shuffle_partitions=4,
        extra_fields={"lang": "string", "n_chars": "long"},
    )
    out = _final_state(
        rows,
        ("g", "n_updates", "s1", "s2", "sy", "s11", "s12", "s22",
         "s1y", "s2y", "syy"),
    )
    df = spark.createDataFrame(
        out,
        "lang string, n long, s1 long, s2 long, sy long, s11 long,"
        " s12 long, s22 long, s1y long, s2y long, syy long",
    ).selectExpr(
        "lang",
        "CAST(n AS DOUBLE) AS n",
        *[f"CAST({c} AS DOUBLE) AS {c}"
          for c in ("s1", "s2", "sy", "s11", "s12", "s22",
                    "s1y", "s2y", "syy")],
    )
    return df.selectExpr(
        "*",
        f"{OLS2_B0} AS b0",
        f"{OLS2_B1} AS b1",
        f"{OLS2_B2} AS b2",
    ).selectExpr(
        "lang",
        "CAST(n AS BIGINT) AS n_rows",
        "ROUND(b0, 6) + 0 AS beta0",
        "ROUND(b1, 6) + 0 AS beta1",
        "ROUND(b2, 6) + 0 AS beta2",
        f"ROUND(1 - {OLS2_SSE} / {OLS2_SST}, 6) + 0 AS r2",
    )


@_q(
    "stream_snapshot_sim",
    """
    WITH v AS (
      SELECT doc_id, j, doc_id * 4 + j AS seq,
             md5(text || CASE WHEN j >= 1 THEN ' [rev]' ELSE '' END) AS fp
      FROM documents
      CROSS JOIN (SELECT UNNEST(range(0, 3)) AS j) js
      WHERE j <= doc_id % 3),
    s AS (SELECT doc_id, seq, fp,
                 LAG(fp) OVER (PARTITION BY doc_id ORDER BY j) AS prev
          FROM v)
    SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(seq AS BIGINT) AS seq,
           CASE WHEN prev IS NULL THEN 'added'
                WHEN prev = fp THEN 'unchanged'
                ELSE 'changed' END AS status,
           fp
    FROM s
    """,
)
def stream_snapshot_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """streaming_snapshot_status (the streaming twin of
    functions/dedup.snapshot_diff) drained over a real 3-micro-batch
    stream of document VERSIONS: batch j carries version j of every doc
    with doc_id % 3 ≥ j, version 1 edits the text and version 2 repeats
    it — so every id walks added → changed → unchanged against the
    fingerprint state store. The drained union must equal the batch
    LAG-over-versions replay, which is exactly the oracle."""
    from open_ftth_relational_projector_spark.streaming.stateful import (
        streaming_snapshot_status,
    )

    def version_payloads(b, rows):
        for r in rows:
            if b > r["doc_id"] % 3:
                continue
            yield {
                "doc_id": r["doc_id"],
                "seq": r["doc_id"] * 4 + b,
                "text": r["text"] + (" [rev]" if b >= 1 else ""),
            }

    rows, schema = _drain_stream_over_doc_batches(
        spark,
        sf_dir,
        streaming_snapshot_status,
        "ssnap",
        shuffle_partitions=4,
        payloads_for_batch=version_payloads,
    )
    return spark.createDataFrame(rows, schema)
