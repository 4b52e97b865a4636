"""Event-stream semantics in batch: LWW, as-of, epochs, sessions, JSON.

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
# 2. event-stream semantics in batch (A2, as-of, epochs, sessions, JSON)
# ===========================================================================


@_q(
    "lww_latest_event_per_user",
    """
    SELECT user_id,
           ARG_MAX(event_type, event_id) AS event_type,
           ROUND(ARG_MAX(value, event_id), 4) AS value,
           MAX(event_id) AS seq
    FROM events GROUP BY user_id
    """,
)
def lww_latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: dict[id] = state ≡ max_by over the sequence."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.col("event_id").alias("seq"), "event_type", "value"
    )
    out = latest_by_key(ev, "user_id", value_cols=["event_type", "value"])
    return out.select("user_id", "event_type", _r4(F.col("value")).alias("value"), "seq")


@_q(
    "asof_purchase_prior_signup",
    """
    SELECT event_id, user_id,
           ROUND(value, 4) AS purchase_value,
           ROUND(prior_signup_value, 4) AS prior_signup_value
    FROM (
      SELECT event_id, user_id, value, event_type,
             LAST_VALUE(CASE WHEN event_type = 'signup' THEN value END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior_signup_value
      FROM events)
    WHERE event_type = 'purchase'
    """,
)
def asof_purchase_prior_signup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase sees the latest strictly-earlier signup."""
    ev = load_table(spark, sf_dir, "events")
    versions = ev.filter(F.col("event_type") == "signup").select(
        "user_id", F.col("event_id").alias("seq"), F.col("value").alias("prior_signup_value")
    )
    facts = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("seq"), F.col("value").alias("purchase_value")
    )
    out = asof_join(facts, versions, "user_id")
    return out.select(
        F.col("seq").alias("event_id"),
        "user_id",
        _r4(F.col("purchase_value")).alias("purchase_value"),
        _r4(F.col("prior_signup_value")).alias("prior_signup_value"),
    )


@_q(
    "asof_forward_error_recovery",
    """
    WITH e AS (SELECT event_id, user_id, event_type,
                      epoch_us(ts)::BIGINT AS us
               FROM events),
    err AS (SELECT event_id, user_id, us FROM e WHERE event_type = 'error'),
    cand AS (
      SELECT r.event_id, n.event_id AS next_event_id,
             n.event_type AS next_type, n.us AS nus,
             ROW_NUMBER() OVER (PARTITION BY r.event_id ORDER BY n.us) AS rn
      FROM err r JOIN e n
        ON n.user_id = r.user_id AND n.event_type <> 'error'
       AND n.us > r.us AND n.us <= r.us + 3600000000)
    SELECT err.event_id, err.user_id, c.next_event_id, c.next_type,
           CAST(c.nus - err.us AS BIGINT) AS gap_us
    FROM err LEFT JOIN (SELECT * FROM cand WHERE rn = 1) c
      ON err.event_id = c.event_id
    """,
)
def asof_forward_error_recovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of with tolerance (operators/asof.asof_join_directed):
    each error event finds the user's first subsequent non-error event
    within one hour — time-to-recovery attribution, the
    pandas-merge_asof(direction='forward', tolerance=…) surface run as a
    backward as-of over negated micros (single shuffle, no range join).
    Unmatched/late recoveries stay as NULL rows (left semantics)."""
    from open_ftth_relational_projector_spark.operators.asof import (
        asof_join_directed,
    )

    ev = load_table(spark, sf_dir, "events").withColumn(
        "us", F.unix_micros(F.col("ts").cast("timestamp"))
    )
    facts = ev.filter(F.col("event_type") == "error").select(
        "user_id", "us", "event_id"
    )
    versions = ev.filter(F.col("event_type") != "error").select(
        "user_id",
        "us",
        F.col("event_id").alias("next_event_id"),
        F.col("event_type").alias("next_type"),
    )
    out = asof_join_directed(
        facts,
        versions,
        "user_id",
        fact_seq="us",
        version_seq="us",
        version_cols=["next_event_id", "next_type"],
        direction="forward",
        strict=True,
        tolerance=3_600_000_000,
    )
    return out.select(
        "event_id",
        "user_id",
        "next_event_id",
        "next_type",
        (F.col("matched_seq") - F.col("us")).cast("long").alias("gap_us"),
    )


@_q(
    "attribution_last_touch",
    """
    WITH e AS (SELECT event_id, user_id, event_type,
                      epoch_us(ts)::BIGINT AS us
               FROM events),
    pur AS (SELECT event_id, user_id, us FROM e WHERE event_type = 'purchase'),
    cand AS (
      SELECT p.event_id, c.event_id AS click_id, c.us AS cus,
             ROW_NUMBER() OVER (PARTITION BY p.event_id ORDER BY c.us DESC) AS rn
      FROM pur p JOIN e c
        ON c.user_id = p.user_id AND c.event_type = 'click'
       AND c.us < p.us AND c.us >= p.us - 604800000000)
    SELECT pur.event_id, pur.user_id, c.click_id,
           CAST(pur.us - c.cus AS BIGINT) AS touch_age_us,
           c.click_id IS NOT NULL AS attributed
    FROM pur LEFT JOIN (SELECT * FROM cand WHERE rn = 1) c
      ON pur.event_id = c.event_id
    """,
)
def attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase credits the user's most
    recent click within a 7-day lookback — asof_join_directed in
    backward mode with tolerance (one shuffle, no range join);
    out-of-window purchases stay as unattributed NULL rows."""
    from open_ftth_relational_projector_spark.operators.asof import (
        asof_join_directed,
    )

    ev = load_table(spark, sf_dir, "events").withColumn(
        "us", F.unix_micros(F.col("ts").cast("timestamp"))
    )
    facts = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "us", "event_id"
    )
    versions = ev.filter(F.col("event_type") == "click").select(
        "user_id", "us", F.col("event_id").alias("click_id")
    )
    out = asof_join_directed(
        facts,
        versions,
        "user_id",
        fact_seq="us",
        version_seq="us",
        version_cols=["click_id"],
        direction="backward",
        strict=True,
        tolerance=604_800_000_000,
    )
    return out.select(
        "event_id",
        "user_id",
        "click_id",
        (F.col("us") - F.col("matched_seq")).cast("long").alias("touch_age_us"),
        F.col("click_id").isNotNull().alias("attributed"),
    )


@_q(
    "json_props_stats",
    """
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
           COUNT(*) AS n, ROUND(SUM(value), 4) AS sum_value
    FROM events GROUP BY k_bucket
    """,
)
def json_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3: JSON payload parsing with schema-on-read."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn(
            "k_bucket", F.get_json_object("props", "$.k").cast("bigint") % 10
        )
        .groupBy("k_bucket")
        .agg(F.count(F.lit(1)).alias("n"), _r4(F.sum("value")).alias("sum_value"))
    )


@_q(
    "running_value_per_user",
    """
    SELECT event_id, user_id,
           ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_value
    FROM events
    """,
)
def running_value_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return ev.select(
        "event_id", "user_id", _r4(F.sum("value").over(w)).alias("running_value")
    )


@_q(
    "event_deltas_range_frame",
    """
    WITH t AS (
      SELECT event_id, user_id, value,
             CAST(FLOOR(epoch(ts)) AS BIGINT) AS sec
      FROM events)
    SELECT event_id, user_id,
           ROUND(value - LAG(value, 1, 0.0)
                 OVER (PARTITION BY user_id ORDER BY event_id), 4) + 0
             AS delta_prev,
           ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY sec
                 RANGE BETWEEN 86400 PRECEDING AND CURRENT ROW), 4)
             AS day_window_sum
    FROM t
    """,
)
def event_deltas_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag with default + a RANGE frame keyed on event-time seconds (the
    trailing-24h running sum). Both windows share one partition-by-user
    shuffle; the range frame is evaluated by a single ordered sweep per
    key — no self-join-per-row, the shape that survives wide keys."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "sec", F.col("ts").cast("timestamp").cast("long")
    )
    w_row = W.partitionBy("user_id").orderBy("event_id")
    w_range = (
        W.partitionBy("user_id").orderBy("sec").rangeBetween(-86400, W.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        _r4(F.col("value") - F.lag("value", 1, 0.0).over(w_row)).alias("delta_prev"),
        _r4(F.sum("value").over(w_range)).alias("day_window_sum"),
    )


@_q(
    "doc_length_deciles",
    """
    SELECT lang, doc_id,
           CAST(NTILE(10) OVER (PARTITION BY lang
                ORDER BY n_chars, doc_id) AS INTEGER) AS decile
    FROM documents
    """,
)
def doc_length_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language length deciles (data-mixing strata). Deterministic:
    the NTILE order breaks ties on doc_id so both engines cut identical
    buckets. Languages are few and huge (the giant-group window regime),
    so the rank comes from hierarchical_grouped_row_number + the exact
    NTILE formula instead of a per-lang single-task ntile() window."""
    from open_ftth_relational_projector_spark.operators.hierarchical import (
        hierarchical_grouped_row_number,
        ntile_from_rank_col,
    )

    d = load_table(spark, sf_dir, "documents")
    ranked = hierarchical_grouped_row_number(
        d.select("lang", "doc_id", "n_chars"),
        ["lang"],
        [F.col("n_chars"), F.col("doc_id")],
        "_rn",
        total_col="_n",  # group totals ride the offsets broadcast — no
        # second scan/join for the NTILE denominator
    )
    return ranked.select(
        "lang",
        "doc_id",
        ntile_from_rank_col(F.col("_rn"), F.col("_n"), 10).alias("decile"),
    )


@_q(
    "repeat_buyer_churn_setops",
    """
    SELECT user_id FROM (
      SELECT DISTINCT user_id FROM events
      WHERE event_type = 'purchase' AND ts < TIMESTAMP '2024-01-10 00:00:00'
      INTERSECT
      SELECT DISTINCT user_id FROM events
      WHERE event_type = 'purchase'
        AND ts >= TIMESTAMP '2024-01-10 00:00:00'
        AND ts < TIMESTAMP '2024-01-20 00:00:00')
    EXCEPT
    SELECT DISTINCT user_id FROM events
    WHERE event_type = 'purchase'
      AND ts >= TIMESTAMP '2024-01-20 00:00:00'
    """,
)
def repeat_buyer_churn_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational set ops: buyers purchasing in both early windows
    (INTERSECT) with no purchase in the final decade (EXCEPT). Spark
    plans both as hash semi/anti joins on the distinct sets — no
    sort-based set op, no cartesian."""
    ev = load_table(spark, sf_dir, "events")
    ts = F.col("ts")
    h1 = (
        ev.filter((F.col("event_type") == "purchase") & (ts < F.lit("2024-01-10").cast("timestamp_ntz")))
        .select("user_id").distinct()
    )
    h2 = (
        ev.filter(
            (F.col("event_type") == "purchase")
            & (ts >= F.lit("2024-01-10").cast("timestamp_ntz"))
            & (ts < F.lit("2024-01-20").cast("timestamp_ntz"))
        )
        .select("user_id").distinct()
    )
    later = (
        ev.filter(
            (F.col("event_type") == "purchase")
            & (ts >= F.lit("2024-01-20").cast("timestamp_ntz"))
        )
        .select("user_id").distinct()
    )
    return h1.intersect(h2).exceptAll(later)


@_q(
    "sessionize_30min",
    """
    WITH t AS (
      SELECT user_id, event_id,
             CAST(FLOOR(epoch(ts)) AS BIGINT) AS sec,
             CAST(FLOOR(epoch(LAG(ts) OVER (PARTITION BY user_id ORDER BY event_id))) AS BIGINT) AS prev_sec
      FROM events),
    flags AS (
      SELECT user_id,
             CASE WHEN prev_sec IS NULL OR sec - prev_sec > 1800 THEN 1 ELSE 0 END AS new_session
      FROM t)
    SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS n_sessions, COUNT(*) AS n_events
    FROM flags GROUP BY user_id
    """,
)
def sessionize_30min(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").withColumn(
        "sec", F.col("ts").cast("timestamp").cast("long")
    )
    w = W.partitionBy("user_id").orderBy("event_id")
    flags = ev.withColumn("prev_sec", F.lag("sec").over(w)).withColumn(
        "new_session",
        F.when(
            F.col("prev_sec").isNull() | (F.col("sec") - F.col("prev_sec") > 1800), 1
        ).otherwise(0),
    )
    return flags.groupBy("user_id").agg(
        F.sum("new_session").alias("n_sessions"), F.count(F.lit(1)).alias("n_events")
    )


@_q(
    "tumbling_event_windows",
    """
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
           time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS window_end,
           event_type, COUNT(*) AS n_events,
           ROUND(SUM(value), 4) AS sum_value
    FROM events GROUP BY 1, 2, 3
    """,
)
def tumbling_event_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """streaming/windows.tumbling_counts in batch mode — the same
    expression the streaming path runs with a watermark (tested against
    real late-data eviction in tests/test_streaming_windows.py)."""
    from open_ftth_relational_projector_spark.streaming.windows import (
        tumbling_counts,
    )

    return tumbling_counts(load_table(spark, sf_dir, "events"), "1 hour")


@_q(
    "sliding_event_windows",
    """
    SELECT time_bucket(INTERVAL '30 minutes', ts)
             - to_minutes(30 * k.k) AS window_start,
           time_bucket(INTERVAL '30 minutes', ts)
             - to_minutes(30 * k.k) + INTERVAL '1 hour' AS window_end,
           event_type, COUNT(*) AS n_events
    FROM events CROSS JOIN (SELECT unnest([0, 1]) AS k) k
    GROUP BY 1, 2, 3
    """,
)
def sliding_event_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding every 30 minutes: each event lands in exactly
    duration/slide = 2 windows (the oracle materializes both by bucket
    arithmetic; Spark's window expression does the same expansion)."""
    from open_ftth_relational_projector_spark.streaming.windows import (
        sliding_counts,
    )

    return sliding_counts(
        load_table(spark, sf_dir, "events"), "1 hour", "30 minutes"
    )


@_q(
    "session_event_windows",
    """
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN LAG(ts) OVER w IS NULL
                       OR ts - LAG(ts) OVER w > INTERVAL '30 minutes'
                  THEN 1 ELSE 0 END AS new_s
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
    numbered AS (
      SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged)
    SELECT user_id, MIN(ts) AS session_start,
           MAX(ts) + INTERVAL '30 minutes' AS session_end,
           COUNT(*) AS n_events, ROUND(SUM(value), 4) AS sum_value
    FROM numbered GROUP BY user_id, sid
    """,
)
def session_event_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session_window (gap-based) per user — the oracle derives the
    same sessions via gaps-and-islands SQL; session_end = last event + gap
    (Spark's session_window close semantics)."""
    from open_ftth_relational_projector_spark.streaming.windows import (
        session_windows,
    )

    return session_windows(load_table(spark, sf_dir, "events"), "30 minutes")

