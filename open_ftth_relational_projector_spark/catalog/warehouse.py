"""Warehouse modeling, audits, and behavioral windows: SCD2, expectations, snapshots, histograms, triangles, TF-IDF pairs, z-order audit, ER, PIT features, anonymization, rolling stats, RFM, concurrency peaks.

Split out of the single-file catalog (round-4 verdict #6); registration
order preserved — see catalog/__init__.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, Window as W  # noqa: F401

from open_ftth_relational_projector_spark.sources.tables import load_table, scattered  # noqa: F401
from open_ftth_relational_projector_spark.cache import tracked_persist  # noqa: F401
from open_ftth_relational_projector_spark.events.reader import EventLog  # noqa: F401
from open_ftth_relational_projector_spark.operators import asof_join, latest_by_key  # noqa: F401
from open_ftth_relational_projector_spark.operators.hierarchical import (  # noqa: F401
    hierarchical_row_number,
)
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

@_q(
    "scd2_user_value_history",
    """
    SELECT user_id,
           ROUND(value, 4) AS value,
           ts AS valid_from,
           LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS valid_to,
           LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             IS NULL AS is_current
    FROM events
    WHERE event_type = 'purchase'
    """,
)
def scd2_user_value_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2 view of the purchase stream: each
    user's value as validity intervals [valid_from, valid_to) with the
    open current row — the warehouse-history pattern the reference's
    last-write-wins tables flatten away. One keyed window, no joins."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return ev.select(
        "user_id",
        _r4(F.col("value")).alias("value"),
        F.col("ts").alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


@_q(
    "expectations_audit",
    """
    WITH agg AS (
      SELECT
        SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS nn,
        SUM(CASE WHEN l_quantity IS NULL
                   OR l_quantity < 1 OR l_quantity > 25
                 THEN 1 ELSE 0 END) AS rng,
        SUM(CASE WHEN l_returnflag IS NULL
                   OR l_returnflag NOT IN ('A', 'N', 'R')
                 THEN 1 ELSE 0 END) AS av
      FROM lineitem),
    dup AS (
      SELECT COALESCE(SUM(CASE WHEN n > 1 THEN n - 1 END), 0) AS d
      FROM (SELECT l_orderkey, COUNT(*) AS n FROM lineitem
            GROUP BY l_orderkey)),
    orph AS (
      SELECT COUNT(*) AS o FROM orders
      WHERE o_custkey IS NOT NULL
        AND o_custkey NOT IN (SELECT c_custkey FROM customer)),
    rows_out AS (
      SELECT 'lineitem' AS tbl, 'not_null' AS rule, 'l_orderkey' AS col,
             CAST(nn AS BIGINT) AS n_violations FROM agg
      UNION ALL
      SELECT 'lineitem', 'accepted_range', 'l_quantity',
             CAST(rng AS BIGINT) FROM agg
      UNION ALL
      SELECT 'lineitem', 'accepted_values', 'l_returnflag',
             CAST(av AS BIGINT) FROM agg
      UNION ALL
      SELECT 'lineitem', 'unique', 'l_orderkey', CAST(d AS BIGINT) FROM dup
      UNION ALL
      SELECT 'orders', 'refers_to', 'o_custkey', CAST(o AS BIGINT) FROM orph)
    SELECT tbl AS "table", rule, col AS "column", n_violations,
           n_violations = 0 AS passed
    FROM rows_out
    """,
)
def expectations_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality audit (functions/expectations — the
    dbt-test/Great-Expectations surface): all column rules fold into ONE
    aggregation pass per table; uniqueness adds a keyed groupBy and the
    foreign-key check a broadcast anti-join. The range rule is set to
    [1, 25] so real violations flow through the report."""
    from open_ftth_relational_projector_spark.functions.expectations import (
        check_expectations,
    )

    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    li = check_expectations(
        lineitem,
        "lineitem",
        [
            {"rule": "not_null", "column": "l_orderkey"},
            {"rule": "accepted_range", "column": "l_quantity", "lo": 1, "hi": 25},
            {"rule": "accepted_values", "column": "l_returnflag",
             "values": ["A", "N", "R"]},
            {"rule": "unique", "column": "l_orderkey"},
        ],
    )
    od = check_expectations(
        orders,
        "orders",
        [{"rule": "refers_to", "column": "o_custkey", "ref": customer,
          "ref_column": "c_custkey"}],
    )
    return li.unionByName(od)


@_q(
    "snapshot_diff_orders",
    """
    WITH old_s AS (SELECT o_orderkey, o_totalprice, o_orderstatus
                   FROM orders WHERE o_orderkey % 3 <> 0),
    new_s AS (SELECT o_orderkey, o_totalprice, o_orderstatus
              FROM orders WHERE o_orderkey % 5 <> 0)
    SELECT change, CAST(COUNT(*) AS BIGINT) AS n_keys,
           ROUND(COALESCE(SUM(delta), 0), 2) + 0 AS total_price_delta
    FROM (
      SELECT CASE WHEN o.o_orderkey IS NULL THEN 'inserted'
                  WHEN n.o_orderkey IS NULL THEN 'deleted'
                  WHEN o.o_totalprice = n.o_totalprice
                       AND o.o_orderstatus = n.o_orderstatus
                    THEN 'unchanged'
                  ELSE 'changed' END AS change,
             COALESCE(n.o_totalprice, 0) - COALESCE(o.o_totalprice, 0)
               AS delta
      FROM old_s o FULL OUTER JOIN new_s n USING (o_orderkey))
    GROUP BY change
    """,
)
def snapshot_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation — the table-diff a pipeline runs between
    two corpus versions (old = keys % 3 ≠ 0, new = keys % 5 ≠ 0 of the
    same table, giving all four change classes): one key-keyed full outer
    join, per-class counts and value drift. At 100 TB both snapshots
    bucket by the key so the diff join is co-located."""
    o = load_table(spark, sf_dir, "orders")
    old_s = o.filter(F.col("o_orderkey") % 3 != 0).select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    new_s = o.filter(F.col("o_orderkey") % 5 != 0).select(
        F.col("o_orderkey"),
        F.col("o_totalprice").alias("n_price"),
        F.col("o_orderstatus").alias("n_status"),
    )
    j = old_s.join(new_s, "o_orderkey", "full_outer")
    change = (
        F.when(F.col("o_totalprice").isNull(), "inserted")
        .when(F.col("n_price").isNull(), "deleted")
        .when(
            (F.col("o_totalprice") == F.col("n_price"))
            & (F.col("o_orderstatus") == F.col("n_status")),
            "unchanged",
        )
        .otherwise("changed")
    )
    delta = F.coalesce(F.col("n_price"), F.lit(0)) - F.coalesce(
        F.col("o_totalprice"), F.lit(0)
    )
    return (
        j.select(change.alias("change"), delta.alias("delta"))
        .groupBy("change")
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            # r2, not r4: the delta sum reaches ~1e10 at sf0.1, where
            # double summation noise (~2e-6 absolute) crosses the 4-dp
            # quantum between engines — caught by the sf0.1 sweep
            F.round(F.coalesce(F.sum("delta"), F.lit(0.0)), 2).alias(
                "total_price_delta"
            ),
        )
    )


@_q(
    "price_histogram",
    """
    WITH b AS (
      SELECT CAST(LEAST(FLOOR(o_totalprice / 25000.0), 19) AS INT)
               AS bucket
      FROM orders)
    SELECT bucket,
           CAST(bucket * 25000.0 AS DOUBLE) AS lo,
           CAST((bucket + 1) * 25000.0 AS DOUBLE) AS hi,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM b GROUP BY bucket
    """,
)
def price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of order totals (fixed 25k buckets, top bucket
    clamped): one map-side-combined aggregation over ≤20 groups — the
    profiling primitive behind range-partition planning and skew
    detection."""
    o = load_table(spark, sf_dir, "orders")
    bucket = F.least(
        F.floor(F.col("o_totalprice") / 25000.0), F.lit(19)
    ).cast("int")
    return (
        o.select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "bucket",
            (F.col("bucket") * 25000.0).alias("lo"),
            ((F.col("bucket") + 1) * 25000.0).alias("hi"),
            "n",
        )
    )


@_q(
    "dedup_graph_triangles",
    """
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (
      SELECT DISTINCT doc_id, shingle FROM (
        SELECT doc_id,
               UNNEST(list_transform(
                 generate_series(1, GREATEST(LEN(t) - 2, 0)),
                 i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle
        FROM toks)),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS u, b.doc_id AS v, COUNT(*) AS n_inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
    e AS (
      SELECT i.u, i.v FROM inter i
      JOIN sizes sa ON i.u = sa.doc_id
      JOIN sizes sb ON i.v = sb.doc_id
      WHERE n_inter / CAST(sa.n + sb.n - n_inter AS DOUBLE) >= 0.05),
    paths AS (
      SELECT a.u, a.v, b.v AS w FROM e a JOIN e b ON a.v = b.u),
    tri AS (
      SELECT 1 FROM paths p JOIN e ON p.u = e.u AND p.w = e.v)
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM e) AS n_edges,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM paths) AS n_paths,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM tri) AS n_triangles
    """,
)
def dedup_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census of the near-dup graph (oriented-edge join,
    functions/graph.triangle_count over ngram_jaccard_pairs ≥ 0.05):
    clique-shaped duplicate clusters are triangle-dense, chains are not —
    the density audit behind choosing the dedup clustering strategy."""
    from open_ftth_relational_projector_spark.functions.graph import (
        triangle_count,
    )

    docs = scattered(load_table(spark, sf_dir, "documents"))
    pairs = D.ngram_jaccard_pairs(docs, threshold=0.05, n=3)
    return triangle_count(pairs)


@_q(
    "tfidf_cosine_pairs",
    """
    WITH tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM (
        SELECT doc_id, UNNEST(string_split(text, ' ')) AS term
        FROM documents)
      GROUP BY doc_id, term),
    dft AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    nd AS (SELECT CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS n
           FROM documents),
    w AS (SELECT tf.doc_id, tf.term,
                 tf.tf * LN(nd.n / dft.df) AS w
          FROM tf JOIN dft USING (term) CROSS JOIN nd),
    norms AS (SELECT doc_id, SQRT(SUM(w * w)) AS norm FROM w GROUP BY doc_id),
    dots AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, SUM(a.w * b.w) AS dot
      FROM w a JOIN w b ON a.term = b.term AND a.doc_id < b.doc_id
      GROUP BY 1, 2)
    SELECT d.doc_a, d.doc_b,
           ROUND(d.dot / (na.norm * nb.norm), 4) AS cosine
    FROM dots d
    JOIN norms na ON na.doc_id = d.doc_a
    JOIN norms nb ON nb.doc_id = d.doc_b
    WHERE d.dot / (na.norm * nb.norm) >= 0.75
    """,
)
def tfidf_cosine_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse TF-IDF cosine similarity join (functions/text.
    tfidf_cosine_pairs): candidate pairs only via the term inverted
    index, weighted dot products, precomputed norms — the weighted
    counterpart to ngram_jaccard_pairs."""
    return TXT.tfidf_cosine_pairs(
        scattered(load_table(spark, sf_dir, "documents")), threshold=0.75
    )


@_q(
    "time_weighted_user_value",
    """
    WITH iv AS (
      SELECT user_id, value, ts AS valid_from,
             LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS valid_to
      FROM events WHERE event_type = 'purchase')
    SELECT user_id,
           CAST(COUNT(*) AS INTEGER) AS n_intervals,
           ROUND(SUM(value * (epoch_us(valid_to) - epoch_us(valid_from)))
                 / SUM(epoch_us(valid_to) - epoch_us(valid_from)), 4)
             AS tw_avg_value
    FROM iv WHERE valid_to IS NOT NULL
    GROUP BY user_id
    HAVING SUM(epoch_us(valid_to) - epoch_us(valid_from)) > 0
    """,
)
def time_weighted_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average over the SCD2 validity intervals (the correct
    'average balance' semantics — each value weighted by how long it was
    current, open intervals excluded): one keyed window + one keyed
    aggregate, composing scd2_user_value_history."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    iv = ev.select(
        "user_id",
        "value",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
    ).filter(F.col("valid_to").isNotNull())
    # exact integer microseconds: unix_timestamp would TRUNCATE to seconds
    # while DuckDB's epoch keeps the fraction — µs is exact on both engines
    dur = (
        F.unix_micros(F.col("valid_to").cast("timestamp"))
        - F.unix_micros(F.col("valid_from").cast("timestamp"))
    ).cast("double")
    return (
        iv.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_intervals"),
            (F.sum(F.col("value") * dur) / F.sum(dur)).alias("_tw"),
            F.sum(dur).alias("_d"),
        )
        .filter(F.col("_d") > 0)
        .select("user_id", "n_intervals", _r4(F.col("_tw")).alias("tw_avg_value"))
    )


@_q(
    "zorder_locality_audit",
    """
    WITH m AS (
      SELECT o_orderkey,
             o_custkey % 1024 AS ck,
             CAST(FLOOR(date_diff('day', DATE '1992-01-01',
                                  CAST(o_orderdate AS DATE)) / 7.0)
               AS BIGINT) % 1024 AS wk
      FROM orders),
    z AS (
      SELECT o_orderkey, ck, wk,
             list_sum([(((ck >> b) & 1) << (2 * b))
                       + (((wk >> b) & 1) << (2 * b + 1))
                       FOR b IN range(0, 10)]) AS morton
      FROM m),
    chunks AS (
      SELECT ck, wk, 'zorder' AS ordering,
             CAST(FLOOR((ROW_NUMBER() OVER (ORDER BY morton, o_orderkey) - 1)
                        / 150) AS INT) AS chunk
      FROM z
      UNION ALL
      SELECT ck, wk, 'natural',
             CAST(FLOOR((ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1)
                        / 150) AS INT)
      FROM z)
    SELECT ordering, CAST(COUNT(*) AS BIGINT) AS n_chunks,
           ROUND(AVG(ck_span), 4) AS avg_ck_span,
           ROUND(AVG(wk_span), 4) AS avg_wk_span
    FROM (
      SELECT ordering, chunk, MAX(ck) - MIN(ck) AS ck_span,
             MAX(wk) - MIN(wk) AS wk_span
      FROM chunks GROUP BY ordering, chunk)
    GROUP BY ordering
    """,
)
def zorder_locality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) layout audit — the Delta/Iceberg OPTIMIZE ZORDER
    primitive: interleave the bits of (custkey, order-week), sort by the
    code, cut into 150-row chunks (stand-ins for row groups), and measure
    per-chunk key spans. Narrow spans on BOTH dimensions are what make
    min/max row-group pruning effective for predicates on EITHER key —
    the property a single-column sort cannot give. Bit interleave is a
    pure JVM expression; the chunking is a global-rank assignment done
    with hierarchical_row_number (range-sharded rank + broadcast shard
    offsets — bit-identical to row_number() OVER (ORDER BY ...) with no
    single-task WindowExec), exactly the write-path sort at scale."""
    o = load_table(spark, sf_dir, "orders")
    ck = F.col("o_custkey") % 1024
    wk = (
        F.floor(
            F.datediff(F.col("o_orderdate").cast("date"), F.lit("1992-01-01"))
            / F.lit(7)
        ).cast("long")
        % 1024
    )
    morton = None
    for b in range(10):
        term = (
            F.shiftleft((ck.cast("long") / F.lit(2**b)).cast("long") % 2, 2 * b)
            + F.shiftleft((wk / F.lit(2**b)).cast("long") % 2, 2 * b + 1)
        )
        morton = term if morton is None else morton + term
    z = o.select(
        "o_orderkey", ck.alias("ck"), wk.alias("wk"), morton.alias("morton")
    )
    def chunked(order_cols, label):
        # (morton, o_orderkey) / (o_orderkey,) are total orders, so the
        # hierarchical rank equals the global row_number exactly
        ranked = hierarchical_row_number(
            z, [F.col(c) for c in order_cols], "_rn"
        )
        return ranked.select(
            "ck",
            "wk",
            F.lit(label).alias("ordering"),
            F.floor((F.col("_rn") - 1) / F.lit(150)).cast("int").alias("chunk"),
        )

    chunks = chunked(["morton", "o_orderkey"], "zorder").unionByName(
        chunked(["o_orderkey"], "natural")
    )
    spans = chunks.groupBy("ordering", "chunk").agg(
        (F.max("ck") - F.min("ck")).alias("ck_span"),
        (F.max("wk") - F.min("wk")).alias("wk_span"),
    )
    return spans.groupBy("ordering").agg(
        F.count(F.lit(1)).cast("long").alias("n_chunks"),
        _r4(F.avg("ck_span")).alias("avg_ck_span"),
        _r4(F.avg("wk_span")).alias("avg_wk_span"),
    )


@_q(
    "event_transition_matrix",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events),
    pairs AS (SELECT event_type AS prev_type, next_type
              FROM seq WHERE next_type IS NOT NULL),
    totals AS (SELECT prev_type, COUNT(*) AS n_from FROM pairs
               GROUP BY prev_type)
    SELECT p.prev_type, p.next_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(COUNT(*) / CAST(t.n_from AS DOUBLE), 4) AS p_transition
    FROM pairs p JOIN totals t USING (prev_type)
    GROUP BY p.prev_type, p.next_type, t.n_from
    """,
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of the event stream: per-user
    consecutive event-type pairs (one keyed window), counts and row-
    normalized transition probabilities — the behavioral-analytics
    primitive behind next-action prediction and funnel anomaly checks."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            F.col("event_type").alias("prev_type"),
            F.lead("event_type").over(w).alias("next_type"),
        )
        .filter(F.col("next_type").isNotNull())
    )
    counts = pairs.groupBy("prev_type", "next_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    totals = counts.groupBy("prev_type").agg(F.sum("n").alias("n_from"))
    return (
        counts.join(F.broadcast(totals), "prev_type")
        .select(
            "prev_type",
            "next_type",
            "n",
            _r4(F.col("n") / F.col("n_from").cast("double")).alias(
                "p_transition"
            ),
        )
    )


@_q(
    "rolling_7d_active_users",
    """
    WITH du AS (
      SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
    days AS (SELECT DISTINCT day FROM du)
    SELECT d.day,
           CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS wau
    FROM days d
    JOIN du u ON u.day BETWEEN d.day - 6 AND d.day
    GROUP BY d.day
    """,
)
def rolling_7d_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct active users per day (the WAU curve).
    Distinct-over-sliding-window cannot ride an ordinary window frame, so
    the standing shape is (day, user) pairs range-joined to the day
    spine — pair volume is active-days × 7, linear in users; at 100 TB
    swap the exact distinct for an HLL sketch merged across the frame."""
    ev = load_table(spark, sf_dir, "events")
    du = ev.select(
        F.col("ts").cast("date").alias("day"), "user_id"
    ).distinct()
    days = du.select("day").distinct()
    return (
        days.alias("d")
        .join(
            du.alias("u"),
            F.col("u.day").between(
                F.date_sub(F.col("d.day"), 6), F.col("d.day")
            ),
        )
        .groupBy(F.col("d.day").alias("day"))
        .agg(F.countDistinct("u.user_id").alias("wau"))
    )


@_q(
    "json_dlq_report",
    """
    WITH raw AS (
      SELECT event_type,
             '{"id": ' || event_id
             || CASE WHEN event_id % 7 = 0 THEN ', "v" ' ELSE ', "v": ' END
             || ROUND(value, 4) || '}' AS payload
      FROM events),
    parsed AS (
      SELECT event_type,
             CASE WHEN json_valid(payload) THEN 1 ELSE 0 END AS ok
      FROM raw)
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_total,
           CAST(SUM(ok) AS BIGINT) AS n_ok,
           CAST(SUM(1 - ok) AS BIGINT) AS n_dlq
    FROM parsed GROUP BY event_type
    """,
)
def json_dlq_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dead-letter-queue ingestion accounting: JSON payloads built from
    the events table with every 7th record deterministically corrupted
    (missing colon); the malformed ones must land in the DLQ
    count, not crash the job and not silently vanish. Spark's PERMISSIVE
    from_json yields a struct of null fields for corrupt rows (the router
    predicate is a required field's nullness) while DuckDB classifies
    with json_valid."""
    ev = load_table(spark, sf_dir, "events")
    payload = F.concat(
        F.lit('{"id": '),
        F.col("event_id").cast("string"),
        # corruption: drop the colon after "v" — invalid for every parser
        # (a missing closing brace is repaired by lenient Jackson readers)
        F.when(F.col("event_id") % 7 == 0, F.lit(', "v" ')).otherwise(
            F.lit(', "v": ')
        ),
        F.round("value", 4).cast("string"),
        F.lit("}"),
    )
    parsed = ev.select(
        "event_type",
        F.from_json(payload, "id LONG, v DOUBLE").alias("j"),
    )
    # PERMISSIVE from_json yields a struct of NULL FIELDS (not a null
    # struct) for corrupt records — route on a required field
    ok = F.col("j.id").isNotNull().cast("int")
    return parsed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(ok).alias("n_ok"),
        F.sum(1 - ok).alias("n_dlq"),
    )


@_q(
    "customer_er_candidates",
    """
    SELECT a.c_custkey AS cust_a, b.c_custkey AS cust_b,
           CAST(levenshtein(a.c_name, b.c_name) AS INT) AS name_dist,
           a.c_mktsegment = b.c_mktsegment AS same_segment
    FROM customer a JOIN customer b
      ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
    WHERE levenshtein(a.c_name, b.c_name) <= 2
    """,
)
def customer_er_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution candidate generation — blocking + pairwise fuzzy
    match: pairs only form INSIDE a nation block (the record-linkage move
    that avoids the all-pairs explosion; at 100 TB block on several
    cheap keys and union), scored with edit distance (JVM levenshtein ==
    DuckDB levenshtein) plus corroborating-attribute agreement."""
    c = load_table(spark, sf_dir, "customer")
    a = c.select(
        F.col("c_custkey").alias("cust_a"),
        F.col("c_nationkey").alias("nk"),
        F.col("c_name").alias("name_a"),
        F.col("c_mktsegment").alias("seg_a"),
    )
    b = c.select(
        F.col("c_custkey").alias("cust_b"),
        F.col("c_nationkey").alias("nk"),
        F.col("c_name").alias("name_b"),
        F.col("c_mktsegment").alias("seg_b"),
    )
    dist = F.levenshtein(F.col("name_a"), F.col("name_b"))
    return (
        a.join(b, "nk")
        .filter(F.col("cust_a") < F.col("cust_b"))
        .filter(dist <= 2)
        .select(
            "cust_a",
            "cust_b",
            dist.cast("int").alias("name_dist"),
            (F.col("seg_a") == F.col("seg_b")).alias("same_segment"),
        )
    )


@_q(
    "sorted_neighborhood_er",
    """
    WITH r AS (SELECT c_custkey, c_name,
                      ROW_NUMBER() OVER (ORDER BY c_name, c_custkey) AS rn
               FROM customer)
    SELECT a.c_custkey AS cust_a, b.c_custkey AS cust_b,
           CAST(levenshtein(a.c_name, b.c_name) AS INT) AS name_dist
    FROM r a JOIN r b ON b.rn BETWEEN a.rn + 1 AND a.rn + 2
    WHERE levenshtein(a.c_name, b.c_name) <= 2
    """,
)
def sorted_neighborhood_er(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood ER pass (operators/sorted_neighborhood):
    customers ranked by name via the distributed global-rank primitive
    (range partition + per-partition window + broadcast offsets — no
    single-partition ORDER BY window), paired with their 2 successors,
    kept at edit distance ≤ 2 — the complement to customer_er_candidates'
    blocking pass for typos in the block key itself."""
    from open_ftth_relational_projector_spark.operators.sorted_neighborhood import (
        sorted_neighborhood_pairs,
    )

    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    pairs = sorted_neighborhood_pairs(c, ["c_name", "c_custkey"], window=2)
    dist = F.levenshtein(F.col("c_name"), F.col("c_name_b"))
    return (
        pairs.filter(dist <= 2)
        .select(
            F.col("c_custkey").alias("cust_a"),
            F.col("c_custkey_b").alias("cust_b"),
            dist.cast("int").alias("name_dist"),
        )
    )


@_q(
    "point_in_time_features",
    """
    WITH tagged AS (
      SELECT event_id, user_id, ts, event_type, value,
             COUNT(CASE WHEN event_type = 'click' THEN 1 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS n_clicks_before,
             SUM(CASE WHEN event_type = 'click' THEN value END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS click_value_before
      FROM events)
    SELECT event_id AS label_event_id, user_id, ts AS label_ts,
           CAST(COALESCE(n_clicks_before, 0) AS BIGINT) AS n_clicks_before,
           ROUND(COALESCE(click_value_before, 0.0), 4)
             AS click_value_before
    FROM tagged WHERE event_type = 'purchase'
    """,
)
def point_in_time_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time-correct feature join — the feature-store leakage
    guard: every purchase (label) row carries the user's click count and
    click-value mass STRICTLY BEFORE the label timestamp (frame ends at
    1 PRECEDING, so a click at the exact label row can't leak). One keyed
    window over the unioned stream — no per-label point lookup, no future
    data; the pattern training-set builders must use instead of a naive
    feature join."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    is_click = F.col("event_type") == "click"
    tagged = ev.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.count(F.when(is_click, 1)).over(w).alias("n_clicks_before"),
        F.sum(F.when(is_click, F.col("value"))).over(w).alias(
            "click_value_before"
        ),
    )
    return tagged.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("label_event_id"),
        "user_id",
        F.col("ts").alias("label_ts"),
        F.coalesce(F.col("n_clicks_before"), F.lit(0))
        .cast("long")
        .alias("n_clicks_before"),
        _r4(F.coalesce(F.col("click_value_before"), F.lit(0.0))).alias(
            "click_value_before"
        ),
    )


@_q(
    "negative_samples_per_customer",
    """
    WITH bought AS (
      SELECT DISTINCT o.o_custkey AS custkey, l.l_partkey AS partkey
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
    custs AS (SELECT DISTINCT custkey FROM bought),
    np AS (SELECT COUNT(*) AS n FROM part),
    pidx AS (
      SELECT p_partkey AS partkey,
             ROW_NUMBER() OVER (ORDER BY p_partkey) AS pidx
      FROM part),
    draws AS (
      SELECT c.custkey, t.i,
             substr(md5(c.custkey || '#' || t.i || '#neg'), 1, 15) AS u
      FROM custs c CROSS JOIN range(0, 24) t(i)),
    cand AS (
      SELECT d.custkey, p.partkey, MIN(d.u) AS u
      FROM draws d
      JOIN np ON TRUE
      JOIN pidx p ON p.pidx = (('0x' || d.u)::BIGINT % np.n) + 1
      GROUP BY d.custkey, p.partkey),
    unseen AS (
      SELECT cand.custkey, cand.partkey, cand.u
      FROM cand LEFT JOIN bought b
        ON b.custkey = cand.custkey AND b.partkey = cand.partkey
      WHERE b.custkey IS NULL)
    SELECT custkey, partkey FROM (
      SELECT custkey, partkey,
             ROW_NUMBER() OVER (PARTITION BY custkey
                                ORDER BY u, partkey) AS rn
      FROM unseen) WHERE rn <= 3
    """,
)
def negative_samples_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative sampling for recommender training: per
    customer, UP TO 3 parts they never bought — reproducible across runs
    and engines (md5-derived draws, no rand()). Unlike the old grid form
    (which ranked ALL unseen parts and returned exactly 3 whenever three
    existed), the draw form can return fewer for a customer whose bought
    set swallows most of a SMALL part catalog or whose 24 draws collide
    modulo |P| — at TPC-H shapes (|P| >= 2000, ~tens bought) the
    shortfall probability is negligible and every sf fixture emits
    3/customer, but the contract is "at most 3".

    Scale-safe candidate generation (round-4 verdict #3): instead of
    enumerating the |customers|x|parts| grid and ranking ALL unseen parts
    per customer (O(|C|*|P|) work for O(|C|*k) output), each customer gets
    24 deterministic hash draws (k=3 with 8x oversampling against bought
    collisions), each draw mapping hash(custkey, i) mod |P| to a part via a
    dense part index. Duplicate draws collapse keeping the smallest draw
    hash; bought parts drop via anti-join; the first 3 survivors per
    customer (by draw hash) are the samples. Total work is
    O(|C|*k*c + |P|) and the per-customer window ranks <=24 rows. The part
    index itself is built with hierarchical_row_number (no single-task
    global window). The oracle applies the identical candidate rule."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    bought = (
        orders.join(lineitem, orders["o_orderkey"] == lineitem["l_orderkey"])
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("l_partkey").alias("partkey"),
        )
        .distinct()
    )
    custs = bought.select("custkey").distinct()
    n_parts = part.count()
    part_idx = hierarchical_row_number(
        part.select(F.col("p_partkey").alias("partkey")),
        [F.col("partkey")],
        "pidx",
    )
    n_draws = 24  # k=3 * oversample c=8
    draws = custs.select(
        "custkey",
        F.explode(F.sequence(F.lit(0), F.lit(n_draws - 1))).alias("i"),
    ).withColumn(
        "u",
        F.substring(
            F.md5(F.concat_ws("#", F.col("custkey"), F.col("i"), F.lit("neg"))),
            1,
            15,
        ),
    ).withColumn(
        "pidx",
        F.conv(F.col("u"), 16, 10).cast("long") % F.lit(n_parts) + 1,
    )
    cand = (
        draws.join(part_idx, "pidx")
        .groupBy("custkey", "partkey")
        .agg(F.min("u").alias("u"))
    )
    unseen = cand.join(bought, ["custkey", "partkey"], "left_anti")
    w = W.partitionBy("custkey").orderBy("u", "partkey")
    return (
        unseen.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("custkey", "partkey")
    )


@_q(
    "winsorized_value_stats",
    """
    WITH thr AS (
      SELECT event_type,
             percentile_cont(0.05) WITHIN GROUP (ORDER BY value) AS p05,
             percentile_cont(0.95) WITHIN GROUP (ORDER BY value) AS p95
      FROM events GROUP BY event_type)
    SELECT e.event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(AVG(e.value), 4) AS raw_mean,
           ROUND(AVG(LEAST(GREATEST(e.value, t.p05), t.p95)), 4)
             AS winsorized_mean,
           CAST(SUM(CASE WHEN e.value < t.p05 OR e.value > t.p95
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_capped
    FROM events e JOIN thr t USING (event_type)
    GROUP BY e.event_type
    """,
)
def winsorized_value_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization — outlier capping at the per-group p05/p95 before
    statistics (the feature-prep step that keeps heavy tails from
    dominating a mean): exact interpolating percentiles per key via the
    grouped hierarchical-rank quantile (operators/quantiles — bit-identical
    to the exact `percentile` aggregate without buffering a
    data-proportional event_type group in one aggregation state; the tiny
    per-group table broadcasts back), then clamp-and-average."""
    from open_ftth_relational_projector_spark.operators.quantiles import (
        exact_quantiles,
    )

    ev = load_table(spark, sf_dir, "events")
    thr = exact_quantiles(
        ev, "value", {"p05": 0.05, "p95": 0.95}, group_cols=["event_type"]
    )
    clamped = F.least(
        F.greatest(F.col("value"), F.col("p05")), F.col("p95")
    )
    return (
        ev.join(F.broadcast(thr), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            _r4(F.avg("value")).alias("raw_mean"),
            _r4(F.avg(clamped)).alias("winsorized_mean"),
            F.sum(
                F.when(
                    (F.col("value") < F.col("p05"))
                    | (F.col("value") > F.col("p95")),
                    1,
                ).otherwise(0)
            ).alias("n_capped"),
        )
    )


@_q(
    "pseudonymized_join_integrity",
    """
    WITH pc AS (
      SELECT md5('tenant-salt#' || c_custkey) AS pid, c_nationkey
      FROM customer),
    po AS (
      SELECT md5('tenant-salt#' || o_custkey) AS pid, o_totalprice
      FROM orders)
    SELECT pc.c_nationkey AS nationkey,
           CAST(COUNT(DISTINCT pc.pid) AS BIGINT) AS n_customers,
           CAST(COUNT(po.pid) AS BIGINT) AS n_orders,
           ROUND(COALESCE(SUM(po.o_totalprice), 0), 4) AS total_price
    FROM pc LEFT JOIN po USING (pid)
    GROUP BY pc.c_nationkey
    """,
)
def pseudonymized_join_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic pseudonymization that PRESERVES JOINABILITY: customer
    and order keys are independently tokenized with the same salted md5,
    then joined on the pseudonym — per-nation order counts and totals come
    out identical to joining raw keys, while no raw key crosses the
    boundary. The privacy-pipeline pattern for sharing linked tables
    without identifiers (salt rotation = re-keying the whole universe)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")

    def pseudo(col):
        return F.md5(F.concat(F.lit("tenant-salt#"), col.cast("string")))

    pc = cust.select(
        pseudo(F.col("c_custkey")).alias("pid"), "c_nationkey"
    )
    po = orders.select(
        pseudo(F.col("o_custkey")).alias("pid"), "o_totalprice"
    )
    return (
        pc.join(po, "pid", "left")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(
            F.countDistinct("pid").alias("n_customers"),
            F.count("o_totalprice").alias("n_orders"),
            _r4(F.coalesce(F.sum("o_totalprice"), F.lit(0.0))).alias(
                "total_price"
            ),
        )
    )


@_q(
    "k_anonymity_audit",
    """
    WITH g AS (
      SELECT c_nationkey, c_mktsegment, COUNT(*) AS group_size
      FROM customer GROUP BY c_nationkey, c_mktsegment)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(MIN(group_size) AS BIGINT) AS min_group,
           CAST(SUM(CASE WHEN group_size < 10 THEN group_size ELSE 0 END)
             AS BIGINT) AS n_rows_below_k,
           MIN(group_size) >= 10 AS k10_anonymous
    FROM g
    """,
)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the quasi-identifier (nation, segment):
    smallest equivalence class, rows in classes below k=10, and the
    release verdict — the privacy gate run before publishing a
    pseudonymized extract (pairs with pseudonymized_join_integrity)."""
    c = load_table(spark, sf_dir, "customer")
    g = c.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("group_size")
    )
    return g.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.min("group_size").alias("min_group"),
        F.sum(
            F.when(F.col("group_size") < 10, F.col("group_size")).otherwise(0)
        ).alias("n_rows_below_k"),
        (F.min("group_size") >= 10).alias("k10_anonymous"),
    )


@_q(
    "rolling_zscore_anomalies",
    """
    WITH st AS (
      SELECT event_id, user_id, ts, value,
             AVG(value) OVER w AS mu,
             COUNT(*) OVER w AS n,
             AVG(value * value) OVER w AS m2
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING))
    SELECT event_id, user_id,
           ROUND((value - mu) / SQRT(m2 - mu * mu), 4) + 0 AS z
    FROM st
    WHERE n >= 10 AND m2 - mu * mu > 1e-12
      AND ABS((value - mu) / SQRT(m2 - mu * mu)) > 3
    """,
)
def rolling_zscore_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming-style anomaly flags: each event scored against ITS OWN
    trailing window (20 prior events, self excluded — no leakage), flagged
    when |z| > 3. Variance from the explicit E[x²]−E[x]² form so the
    oracle matches formula-for-formula; the frame is a ROWS window — one
    keyed sort, no self-join."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-20, -1)
    )
    mu = F.avg("value").over(w)
    n = F.count(F.lit(1)).over(w)
    m2 = F.avg(F.col("value") * F.col("value")).over(w)
    var = m2 - mu * mu
    z = (F.col("value") - mu) / F.sqrt(var)
    return (
        ev.select("event_id", "user_id", F.col("value"), mu.alias("mu"),
                  n.alias("n"), var.alias("var"), z.alias("zraw"))
        .filter(
            (F.col("n") >= 10)
            & (F.col("var") > 1e-12)
            & (F.abs(F.col("zraw")) > 3)
        )
        .select("event_id", "user_id", _r4(F.col("zraw")).alias("z"))
    )


@_q(
    "mad_outlier_stats",
    """
    WITH med AS (SELECT event_type, quantile_cont(value, 0.5) AS med
                 FROM events GROUP BY event_type),
    mad AS (SELECT e.event_type,
                   quantile_cont(ABS(e.value - m.med), 0.5) AS mad
            FROM events e JOIN med m USING (event_type)
            GROUP BY e.event_type),
    scored AS (
      SELECT e.event_type, m.med, d.mad,
             0.6745 * (e.value - m.med) / d.mad AS z
      FROM events e
      JOIN med m USING (event_type) JOIN mad d USING (event_type)
      WHERE d.mad > 1e-12)
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(MIN(med), 4) AS med,
           ROUND(MIN(mad), 4) AS mad,
           CAST(SUM(CASE WHEN ABS(z) > 3.5 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_anomalies
    FROM scored GROUP BY event_type
    """,
)
def mad_outlier_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median/MAD modified-z outlier audit of event values per type
    (functions/quality.robust_outlier_stats) — the robust complement to
    rolling_zscore_anomalies' mean/stddev gate; oracle replays both
    percentile passes and the 0.6745 scaling formula-for-formula."""
    from open_ftth_relational_projector_spark.functions.quality import (
        robust_outlier_stats,
    )

    ev = load_table(spark, sf_dir, "events")
    return robust_outlier_stats(ev, "event_type", "value", z_thresh=3.5)


@_q(
    "dow_seasonality_index",
    """
    WITH r AS (SELECT dayofweek(CAST(o_orderdate AS DATE)) + 1 AS dow,
                      o_totalprice
               FROM orders),
    agg AS (SELECT dow, CAST(COUNT(*) AS BIGINT) AS n_orders,
                   SUM(o_totalprice) AS rev
            FROM r GROUP BY dow),
    tot AS (SELECT SUM(rev) AS trev FROM agg)
    SELECT dow AS dow, n_orders,
           ROUND(rev, 2) AS revenue,
           ROUND(rev / (tot.trev / 7.0), 4) AS seasonal_index
    FROM agg CROSS JOIN tot
    """,
)
def dow_seasonality_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonality: revenue per weekday vs the uniform 1/7
    expectation (index 1.0 = no weekly cycle) — the baseline every
    anomaly detector and forecast deseasonalizes against. dow uses
    Spark's 1=Sunday..7 convention (DuckDB's 0-based dayofweek shifted
    to match); revenue rounded to 2 dp (1e9-magnitude sums exceed 4-dp
    double agreement, the snapshot_diff lesson)."""
    orders = load_table(spark, sf_dir, "orders")
    agg = orders.groupBy(
        F.dayofweek(F.col("o_orderdate").cast("date")).alias("dow")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum("o_totalprice").alias("rev"),
    )
    tot = agg.agg(F.sum("rev").alias("trev"))
    return (
        agg.crossJoin(F.broadcast(tot))
        .select(
            "dow",
            "n_orders",
            F.round(F.col("rev"), 2).alias("revenue"),
            _r4(F.col("rev") / (F.col("trev") / F.lit(7.0))).alias(
                "seasonal_index"
            ),
        )
    )


@_q(
    "peak_concurrent_sessions",
    """
    WITH iv AS (SELECT user_id, epoch_us(ts)::BIGINT AS s,
                       epoch_us(ts)::BIGINT + 1800000000 AS e,
                       event_id
                FROM events),
    pts AS (
      SELECT s AS t, 1 AS d, event_id FROM iv
      UNION ALL
      SELECT e AS t, -1 AS d, event_id FROM iv),
    sw AS (SELECT t, d,
                  SUM(d) OVER (ORDER BY t, d DESC, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS load
           FROM pts)
    SELECT CAST(MAX(load) AS BIGINT) AS peak_concurrency,
           CAST(MIN(t) AS BIGINT) AS first_peak_at
    FROM sw WHERE load = (SELECT MAX(load) FROM sw)
    """,
)
def peak_concurrent_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrency: every event opens a 30-minute session interval;
    the classic +1/−1 boundary sweep finds the maximum simultaneous
    sessions and the first instant it occurs — capacity planning's
    gauge-peak query. Boundary order processes starts BEFORE ends at the
    same instant, so touching intervals count as overlapping
    (closed-interval semantics — a session starting exactly when another
    ends IS concurrent with it; the oracle sorts identically).

    Scale shape: deltas are PRE-AGGREGATED per distinct timestamp (one
    keyed groupBy — the bucketed rewrite the r3 verdict asked for), then
    the running load is a hierarchical cumsum over the bucket series
    (operators/hierarchical.py), not a single-task global window. The
    within-timestamp peak is ``cum + n_ends``: starts-first ordering means
    load at time t crests at cum_before + n_starts = cum_incl + n_ends —
    identical to the point-level sweep at any parallelism."""
    from ..operators.hierarchical import hierarchical_cumsum

    ev = load_table(spark, sf_dir, "events").withColumn(
        "us", F.unix_micros(F.col("ts").cast("timestamp"))
    )
    starts = ev.select(F.col("us").alias("t"), F.lit(1).alias("d"))
    ends = ev.select(
        (F.col("us") + F.lit(1_800_000_000)).alias("t"), F.lit(-1).alias("d")
    )
    per_t = (
        starts.unionByName(ends)
        .groupBy("t")
        .agg(
            F.sum(F.when(F.col("d") == 1, 1).otherwise(0)).alias("ns"),
            F.sum(F.when(F.col("d") == -1, 1).otherwise(0)).alias("ne"),
        )
        .withColumn("delta", F.col("ns") - F.col("ne"))
    )
    sw = hierarchical_cumsum(per_t, [F.col("t")], "delta", "cum").withColumn(
        "peak_t", F.col("cum") + F.col("ne")
    )
    peak = sw.agg(F.max("peak_t").alias("mx"))
    return (
        sw.join(F.broadcast(peak), sw["peak_t"] == peak["mx"])
        .agg(
            F.max("peak_t").cast("long").alias("peak_concurrency"),
            F.min("t").cast("long").alias("first_peak_at"),
        )
    )


@_q(
    "attribution_linear_multitouch",
    """
    WITH e AS (SELECT event_id, user_id, event_type,
                      epoch_us(ts)::BIGINT AS us
               FROM events),
    pur AS (SELECT event_id, user_id, us FROM e WHERE event_type = 'purchase'),
    clk AS (SELECT event_id, user_id, us FROM e WHERE event_type = 'click'),
    touch AS (
      SELECT p.event_id AS purchase_id, c.event_id AS click_id,
             COUNT(*) OVER (PARTITION BY p.event_id) AS n_touches
      FROM pur p JOIN clk c
        ON c.user_id = p.user_id
       AND c.us < p.us AND c.us >= p.us - 604800000000)
    SELECT click_id, CAST(COUNT(*) AS BIGINT) AS n_conversions,
           ROUND(SUM(1.0 / n_touches), 4) AS credit
    FROM touch GROUP BY click_id
    """,
)
def attribution_linear_multitouch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution: every click in a purchase's 7-day
    lookback shares the conversion credit equally (1/n_touches) — the
    fractional-credit complement to attribution_last_touch. The
    touch join is keyed on user (pairs bounded per user-week); credit
    normalization is one window keyed on the purchase."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "us", F.unix_micros(F.col("ts").cast("timestamp"))
    )
    pur = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), F.col("us").alias("pus")
    )
    clk = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("us").alias("cus")
    )
    touch = (
        pur.join(clk, "user_id")
        .filter(
            (F.col("cus") < F.col("pus"))
            & (F.col("cus") >= F.col("pus") - F.lit(604_800_000_000))
        )
        .withColumn(
            "n_touches",
            F.count(F.lit(1)).over(W.partitionBy("purchase_id")),
        )
    )
    return touch.groupBy("click_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_conversions"),
        _r4(F.sum(F.lit(1.0) / F.col("n_touches"))).alias("credit"),
    )


@_q(
    "psi_value_drift",
    """
    WITH src AS (
      SELECT CASE WHEN epoch_us(ts) % 2 = 0 THEN 'ref' ELSE 'cur' END AS half,
             LEAST(GREATEST(CAST(FLOOR(value / 100.0) AS INT), 0), 9) AS bin
      FROM events WHERE value IS NOT NULL),
    c AS (SELECT half, bin, COUNT(*) AS n FROM src GROUP BY half, bin),
    t AS (SELECT half, SUM(n) AS tot FROM c GROUP BY half),
    bins AS (SELECT UNNEST(generate_series(0, 9)) AS bin),
    p AS (SELECT b.bin,
                 COALESCE(r.n, 0) / CAST(tr.tot AS DOUBLE) AS p_ref,
                 COALESCE(u.n, 0) / CAST(tc.tot AS DOUBLE) AS p_cur
          FROM bins b
          LEFT JOIN (SELECT bin, n FROM c WHERE half = 'ref') r USING (bin)
          LEFT JOIN (SELECT bin, n FROM c WHERE half = 'cur') u USING (bin)
          CROSS JOIN (SELECT tot FROM t WHERE half = 'ref') tr
          CROSS JOIN (SELECT tot FROM t WHERE half = 'cur') tc),
    sm AS (SELECT bin, p_ref, p_cur,
                  (GREATEST(p_cur, 0.0001) - GREATEST(p_ref, 0.0001))
                    * LN(GREATEST(p_cur, 0.0001) / GREATEST(p_ref, 0.0001))
                    AS term
           FROM p)
    SELECT bin, ROUND(p_ref, 4) AS p_ref, ROUND(p_cur, 4) AS p_cur,
           ROUND(term, 6) AS psi_term,
           ROUND(SUM(term) OVER (), 4) AS psi_total
    FROM sm
    """,
)
def psi_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between two slices of the event-value
    distribution (even vs odd microsecond — a deterministic stand-in for
    reference vs current snapshot): per-bin contribution and the total
    PSI — the standard ML-ops drift gate (<0.1 stable, >0.25 retrain).
    Zero-count bins floor at 1e-4 (the conventional PSI smoothing). Two
    map-side histograms onto 10 fixed bins; everything after is
    constant-size."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    half = F.when(
        F.unix_micros(F.col("ts").cast("timestamp")) % 2 == 0, "ref"
    ).otherwise("cur")
    bin_ = F.least(
        F.greatest(F.floor(F.col("value") / 100.0).cast("int"), F.lit(0)),
        F.lit(9),
    )
    c = (
        ev.select(half.alias("half"), bin_.alias("bin"))
        .groupBy("half", "bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    t = c.groupBy("half").agg(F.sum("n").alias("tot"))
    bins = spark.range(0, 10).select(F.col("id").cast("int").alias("bin"))
    r = c.filter(F.col("half") == "ref").select("bin", F.col("n").alias("nr"))
    u = c.filter(F.col("half") == "cur").select("bin", F.col("n").alias("nc"))
    tr = t.filter(F.col("half") == "ref").select(F.col("tot").alias("tot_r"))
    tc = t.filter(F.col("half") == "cur").select(F.col("tot").alias("tot_c"))
    p = (
        bins.join(F.broadcast(r), "bin", "left")
        .join(F.broadcast(u), "bin", "left")
        .crossJoin(F.broadcast(tr))
        .crossJoin(F.broadcast(tc))
        .select(
            "bin",
            (F.coalesce(F.col("nr"), F.lit(0)) / F.col("tot_r").cast("double")).alias("p_ref"),
            (F.coalesce(F.col("nc"), F.lit(0)) / F.col("tot_c").cast("double")).alias("p_cur"),
        )
    )
    pr = F.greatest(F.col("p_ref"), F.lit(0.0001))
    pc = F.greatest(F.col("p_cur"), F.lit(0.0001))
    term = (pc - pr) * F.log(pc / pr)
    wall = W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return p.withColumn("term", term).select(
        "bin",
        _r4(F.col("p_ref")).alias("p_ref"),
        _r4(F.col("p_cur")).alias("p_cur"),
        F.round(F.col("term"), 6).alias("psi_term"),
        _r4(F.sum("term").over(wall)).alias("psi_total"),
    )


@_q(
    "rfm_customer_segments",
    """
    WITH rfm AS (
      SELECT o_custkey AS custkey,
             date_diff('day', CAST(MAX(o_orderdate) AS DATE),
                       DATE '1999-01-01') AS recency_d,
             COUNT(*) AS frequency,
             ROUND(SUM(o_totalprice), 4) AS monetary
      FROM orders GROUP BY o_custkey),
    scored AS (
      SELECT custkey, recency_d, frequency, monetary,
             NTILE(5) OVER (ORDER BY recency_d DESC, custkey) AS r_score,
             NTILE(5) OVER (ORDER BY frequency, custkey) AS f_score,
             NTILE(5) OVER (ORDER BY monetary, custkey) AS m_score
      FROM rfm)
    SELECT custkey, CAST(recency_d AS INT) AS recency_d,
           CAST(frequency AS BIGINT) AS frequency, monetary,
           CAST(r_score AS INT) AS r_score,
           CAST(f_score AS INT) AS f_score,
           CAST(m_score AS INT) AS m_score,
           CASE WHEN r_score >= 4 AND f_score >= 4 AND m_score >= 4
                  THEN 'champion'
                WHEN r_score >= 4 AND f_score <= 2 THEN 'new'
                WHEN r_score <= 2 AND f_score >= 4 THEN 'at_risk'
                WHEN r_score <= 2 AND f_score <= 2 THEN 'hibernating'
                ELSE 'regular' END AS segment
    FROM scored
    """,
)
def rfm_customer_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per customer recency (days before the epoch
    close), order frequency, and monetary total, each quintile-scored
    (NTILE with id tie-breaks for cross-engine determinism) and rolled
    into the standard champion/new/at-risk/hibernating labels — the
    composite warehouse segmentation every CRM feed runs. NTILE is
    rank-based (position, not value), so the scale-safe form is an EXACT
    global rank per metric via the hierarchical range-shard row_number
    (operators/hierarchical.py — no single-task global window), then the
    NTILE position formula over the driver-known row count: bit-identical
    to ``NTILE(5) OVER (ORDER BY ...)`` with the same id tie-breaks."""
    from ..operators.hierarchical import hierarchical_row_number, ntile_from_rank

    orders = load_table(spark, sf_dir, "orders")
    rfm = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.datediff(
            F.lit("1999-01-01").cast("date"),
            F.max(F.col("o_orderdate").cast("date")),
        ).alias("recency_d"),
        F.count(F.lit(1)).alias("frequency"),
        _r4(F.sum("o_totalprice")).alias("monetary"),
    )
    rfm = tracked_persist(rfm)  # every rank's eager actions and the final evaluation
    # read this aggregate; independent (unchained) ranks keep each of
    # those actions a pure cache read — chaining them made action k
    # re-execute the k-1 upstream windows (measured 6s of construction
    # at sf0.1 vs ~2s unchained)
    r_rank = hierarchical_row_number(
        rfm.select("custkey", "recency_d"),
        [F.col("recency_d").desc(), F.col("custkey")],
        "_r_rn",
        shard_on=-F.col("recency_d"),  # expression path for the DESC order
    ).select("custkey", "_r_rn")
    f_rank = hierarchical_row_number(
        rfm.select("custkey", "frequency"),
        [F.col("frequency"), F.col("custkey")],
        "_f_rn",
    ).select("custkey", "_f_rn")
    m_rank = hierarchical_row_number(
        rfm.select("custkey", "monetary"),
        [F.col("monetary"), F.col("custkey")],
        "_m_rn",
    ).select("custkey", "_m_rn")
    ranked = rfm.join(r_rank, "custkey").join(f_rank, "custkey").join(
        m_rank, "custkey"
    )
    n_cust = rfm.count()
    scored = ranked.select(
        "custkey",
        F.col("recency_d").cast("int").alias("recency_d"),
        F.col("frequency").cast("long").alias("frequency"),
        "monetary",
        ntile_from_rank(F.col("_r_rn"), n_cust, 5).cast("int").alias("r_score"),
        ntile_from_rank(F.col("_f_rn"), n_cust, 5).cast("int").alias("f_score"),
        ntile_from_rank(F.col("_m_rn"), n_cust, 5).cast("int").alias("m_score"),
    )
    seg = (
        F.when(
            (F.col("r_score") >= 4) & (F.col("f_score") >= 4) & (F.col("m_score") >= 4),
            F.lit("champion"),
        )
        .when((F.col("r_score") >= 4) & (F.col("f_score") <= 2), F.lit("new"))
        .when((F.col("r_score") <= 2) & (F.col("f_score") >= 4), F.lit("at_risk"))
        .when(
            (F.col("r_score") <= 2) & (F.col("f_score") <= 2),
            F.lit("hibernating"),
        )
        .otherwise(F.lit("regular"))
    )
    # the cache stays for the session (MEMORY_AND_DISK, evictable):
    # the chained ranks hit it from every eager action AND from the
    # consumer's evaluation — releasing it here re-derives the orders
    # aggregation + window chain several times over (measured 6.6 s vs
    # ~2 s at sf0.1)
    return scored.withColumn("segment", seg)


