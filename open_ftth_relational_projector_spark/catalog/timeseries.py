"""Time-series repair and distribution audits: survival, CUSUM, EWMA, exact median, Benford/FD/FK audits, grouping sets, interpolation, set reconciliation.

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

@_q(
    "conversion_survival_curve",
    """
    WITH s AS (SELECT user_id, MIN(epoch_us(ts)) AS sus FROM events
               WHERE event_type = 'signup' GROUP BY user_id),
    p AS (SELECT e.user_id, MIN(epoch_us(e.ts)) AS pus
          FROM events e JOIN s ON e.user_id = s.user_id
          WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > s.sus
          GROUP BY e.user_id),
    life AS (SELECT s.user_id,
                    CAST(FLOOR((p.pus - s.sus) / 86400000000.0) AS INT)
                      AS conv_day
             FROM s LEFT JOIN p ON s.user_id = p.user_id),
    days AS (SELECT UNNEST(generate_series(0, 13)) AS day),
    km AS (
      SELECT d.day,
             (SELECT COUNT(*) FROM life
              WHERE conv_day IS NULL OR conv_day >= d.day) AS n_at_risk,
             (SELECT COUNT(*) FROM life WHERE conv_day = d.day) AS n_conv
      FROM days d),
    hz AS (SELECT day, n_at_risk, n_conv,
                  CASE WHEN n_at_risk > 0
                       THEN n_conv / CAST(n_at_risk AS DOUBLE)
                       ELSE 0.0 END AS h
           FROM km)
    SELECT day, CAST(n_at_risk AS BIGINT) AS n_at_risk,
           CAST(n_conv AS BIGINT) AS n_conv,
           ROUND(h, 4) AS hazard,
           ROUND(CASE WHEN MAX(CASE WHEN h >= 1.0 THEN 1 ELSE 0 END)
                        OVER w = 1
                      THEN 0.0
                      ELSE EXP(SUM(CASE WHEN h < 1.0 THEN LN(1.0 - h)
                                        ELSE 0.0 END) OVER w)
                 END, 4) AS survival
    FROM hz
    WINDOW w AS (ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def conversion_survival_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete Kaplan-Meier conversion curve: per day since first
    signup, users still unconverted (at risk), conversions that day, the
    hazard, and the KM survival product — the time-to-event view of the
    signup→purchase funnel (censored users never leave the risk set).
    The day spine is a 14-row literal; per-day counts come from one pass
    over per-user lifetimes (a tiny table after the two min-aggregates);
    the KM product is a running sum of logs over 14 rows."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "us", F.unix_micros(F.col("ts").cast("timestamp"))
    )
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("us").alias("sus"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(F.broadcast(s), "user_id")
        .filter(F.col("us") > F.col("sus"))
        .groupBy("user_id")
        .agg(F.min("us").alias("pus"))
    )
    life = s.join(p, "user_id", "left").select(
        "user_id",
        F.floor((F.col("pus") - F.col("sus")) / F.lit(86_400_000_000.0))
        .cast("int")
        .alias("conv_day"),
    )
    days = spark.range(0, 14).select(F.col("id").cast("int").alias("day"))
    joined = days.crossJoin(F.broadcast(life))
    km = joined.groupBy("day").agg(
        F.sum(
            F.when(
                F.col("conv_day").isNull() | (F.col("conv_day") >= F.col("day")),
                F.lit(1),
            ).otherwise(F.lit(0))
        ).alias("n_at_risk"),
        F.sum(
            F.when(F.col("conv_day") == F.col("day"), F.lit(1)).otherwise(F.lit(0))
        ).alias("n_conv"),
    )
    h = F.when(
        F.col("n_at_risk") > 0,
        F.col("n_conv") / F.col("n_at_risk").cast("double"),
    ).otherwise(F.lit(0.0))
    wkm = W.orderBy("day").rowsBetween(W.unboundedPreceding, W.currentRow)
    ln_term = F.when(
        F.col("h") < 1.0, F.log(F.lit(1.0) - F.col("h"))
    ).otherwise(F.lit(0.0))
    hit_one = F.max(
        F.when(F.col("h") >= 1.0, F.lit(1)).otherwise(F.lit(0))
    ).over(wkm)
    survival = F.when(hit_one == 1, F.lit(0.0)).otherwise(
        F.exp(F.sum(ln_term).over(wkm))
    )
    return (
        km.withColumn("h", h)
        .select(
            "day",
            F.col("n_at_risk").cast("long").alias("n_at_risk"),
            F.col("n_conv").cast("long").alias("n_conv"),
            _r4(F.col("h")).alias("hazard"),
            _r4(survival).alias("survival"),
        )
    )


@_q(
    "cusum_changepoints",
    """
    WITH s AS (SELECT event_id, user_id, value,
                      epoch_us(ts)::BIGINT AS us
               FROM events),
    mu AS (SELECT user_id, ROUND(AVG(value), 2) AS mu FROM s
           GROUP BY user_id),
    c AS (SELECT s.event_id, s.user_id,
                 ROUND(SUM(s.value - mu.mu)
                         OVER (PARTITION BY s.user_id ORDER BY s.us, s.event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                       6) AS cusum
          FROM s JOIN mu USING (user_id)),
    r AS (SELECT user_id, event_id, cusum,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                                    ORDER BY ABS(cusum) DESC, event_id) AS rn
          FROM c)
    SELECT user_id, event_id AS changepoint_event,
           ROUND(cusum, 4) + 0 AS peak_cusum
    FROM r WHERE rn = 1
    """,
)
def cusum_changepoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point location per user: running sum of deviations
    from the user's own mean peaks (in absolute value) where the series'
    level shifts — the classic drift/regime-change locator for metric
    monitoring. Per-iteration ROUND(…, 6) before the argmax is the usual
    cross-engine determinism contract; one keyed window + one broadcast
    mean join, no self-join."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "us", F.unix_micros(F.col("ts").cast("timestamp"))
    )
    # mu quantized to 2 dp: the engines' AVG differs at ~1e-10 and the
    # running sum amplifies it by k (row index) — at sf0.1 that is ~1e-5
    # noise on every cusum, enough to cross ANY output quantum near a
    # boundary. With an identical mu the running sums are bit-identical
    # (both engines accumulate the ordered frame sequentially), so the
    # target itself must carry the determinism, not the output rounding.
    mu = ev.groupBy("user_id").agg(F.round(F.avg("value"), 2).alias("mu"))
    wrun = (
        W.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    c = (
        ev.join(F.broadcast(mu), "user_id")
        .withColumn(
            "cusum",
            F.round(F.sum(F.col("value") - F.col("mu")).over(wrun), 6),
        )
    )
    wpick = W.partitionBy("user_id").orderBy(
        F.abs(F.col("cusum")).desc(), F.col("event_id")
    )
    return (
        c.withColumn("rn", F.row_number().over(wpick))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("changepoint_event"),
            _r4(F.col("cusum")).alias("peak_cusum"),
        )
    )


@_q(
    "ewma_user_values",
    """
    WITH s AS (SELECT event_id, user_id, value,
                      epoch_us(ts)::BIGINT AS us
               FROM events),
    arr AS (SELECT event_id, user_id,
                   list(value) OVER (PARTITION BY user_id ORDER BY us, event_id
                                     ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
                     AS a
            FROM s)
    SELECT event_id, user_id,
           ROUND(
             list_sum(list_transform(a, (x, i) -> x * pow(0.7, len(a) - i)))
             / list_sum(list_transform(a, (x, i) -> pow(0.7, len(a) - i))),
             4) AS ewma
    FROM arr
    """,
)
def ewma_user_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average (α=0.3, pandas adjust=True
    normalization) over each user's trailing 20 events — the recency-
    weighted smoother. The recursion is unrolled as a JVM array fold over
    the windowed value list (collect_list frame → F.transform weights →
    aggregate), zero Python; the oracle runs the identical fold with
    DuckDB list lambdas (its 1-based index mirrors the 0-based Spark
    exponent)."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "us", F.unix_micros(F.col("ts").cast("timestamp"))
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(-19, 0)
    )
    decay = F.lit(0.7)
    arr = ev.withColumn("a", F.collect_list("value").over(w))
    m = F.size(F.col("a"))
    weighted = F.aggregate(
        F.transform(
            F.col("a"),
            lambda x, i: x * F.pow(decay, (m - 1 - i).cast("double")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = F.aggregate(
        F.transform(
            F.col("a"),
            lambda x, i: F.pow(decay, (m - 1 - i).cast("double")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return arr.select(
        "event_id", "user_id", _r4(weighted / norm).alias("ewma")
    )


@_q(
    "exact_median_twopass",
    """
    SELECT CAST(COUNT(l_extendedprice) AS BIGINT) AS n,
           ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS median
    FROM lineitem
    """,
)
def exact_median_twopass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT median of the whole l_extendedprice column via the two-pass
    histogram refinement (operators/median.exact_median_two_pass):
    map-side 1024-bin histogram → driver locates the middle bins (O(bins)
    state) → rank only those bins' rows. The technique that gets exact
    order statistics on a column too big to sort as one group; the oracle
    is DuckDB's quantile_cont."""
    from open_ftth_relational_projector_spark.operators.median import (
        exact_median_two_pass,
    )

    li = load_table(spark, sf_dir, "lineitem")
    n, med = exact_median_two_pass(li, "l_extendedprice")
    return spark.createDataFrame(
        [(n, round(med, 4))], "n long, median double"
    )


@_q(
    "benford_price_audit",
    """
    WITH d AS (
      SELECT CAST(substr(CAST(CAST(FLOOR(o_totalprice * 100) AS BIGINT)
                              AS VARCHAR), 1, 1) AS INT) AS digit
      FROM orders WHERE o_totalprice > 0),
    c AS (SELECT digit, COUNT(*) AS n FROM d GROUP BY digit),
    t AS (SELECT SUM(n) AS total FROM c)
    SELECT c.digit, CAST(c.n AS BIGINT) AS n,
           ROUND(c.n / CAST(t.total AS DOUBLE), 4) AS observed_frac,
           ROUND(LOG10(1.0 + 1.0 / c.digit), 4) AS benford_frac,
           ROUND(ABS(c.n / CAST(t.total AS DOUBLE)
                     - LOG10(1.0 + 1.0 / c.digit)), 4) AS abs_dev
    FROM c CROSS JOIN t
    """,
)
def benford_price_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of order totals — the
    data-forensics screen for fabricated or truncated numeric columns.
    First digit extracted via integer-string arithmetic (FLOOR·100 →
    BIGINT → first char) so both engines agree bit-for-bit where
    double→string formatting would not; observed digit shares vs
    log10(1+1/d) expectation. One groupBy onto ≤9 cells + a broadcast
    scalar total — map-side at any scale."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    digit = (
        F.substring(
            F.floor(F.col("o_totalprice") * 100).cast("long").cast("string"), 1, 1
        )
        .cast("int")
        .alias("digit")
    )
    c = orders.select(digit).groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    t = c.agg(F.sum("n").alias("total"))
    obs = F.col("n") / F.col("total").cast("double")
    ben = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit"))
    return (
        c.crossJoin(F.broadcast(t))
        .select(
            "digit",
            F.col("n").cast("long").alias("n"),
            _r4(obs).alias("observed_frac"),
            _r4(ben).alias("benford_frac"),
            _r4(F.abs(obs - ben)).alias("abs_dev"),
        )
    )


@_q(
    "fd_violation_profile",
    """
    WITH a AS (
      SELECT 'custkey->orderpriority' AS fd,
             o_custkey AS lhs, o_orderpriority AS rhs FROM orders),
    b AS (
      SELECT 'custkey->orderstatus', o_custkey, o_orderstatus FROM orders),
    c AS (
      SELECT 'orderkey->custkey', o_orderkey, CAST(o_custkey AS VARCHAR)
      FROM orders),
    u AS (SELECT * FROM a UNION ALL SELECT * FROM b UNION ALL SELECT * FROM c),
    g AS (SELECT fd, lhs, COUNT(DISTINCT rhs) AS nd, COUNT(*) AS n
          FROM u GROUP BY fd, lhs)
    SELECT fd,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS violating_groups,
           CAST(SUM(CASE WHEN nd > 1 THEN n ELSE 0 END) AS BIGINT)
             AS rows_in_violation,
           CAST(MAX(nd) AS BIGINT) AS max_distinct_rhs
    FROM g GROUP BY fd
    """,
)
def fd_violation_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency discovery profile: candidate FDs X→Y scored
    by groups where X maps to >1 distinct Y — the schema-inference/data-
    profiling pass (does this column determine that one?) that feeds key
    detection and normalization decisions. One groupBy per candidate over
    a unioned long form, linear at any scale; 'orderkey->custkey' is the
    planted TRUE dependency (0 violations expected), the others are
    deliberately false."""
    orders = load_table(spark, sf_dir, "orders")

    def cand(name: str, lhs: str, rhs):
        return orders.select(
            F.lit(name).alias("fd"),
            F.col(lhs).alias("lhs"),
            rhs.alias("rhs"),
        )

    u = (
        cand("custkey->orderpriority", "o_custkey", F.col("o_orderpriority"))
        .unionByName(cand("custkey->orderstatus", "o_custkey", F.col("o_orderstatus")))
        .unionByName(
            cand("orderkey->custkey", "o_orderkey", F.col("o_custkey").cast("string"))
        )
    )
    g = u.groupBy("fd", "lhs").agg(
        F.countDistinct("rhs").alias("nd"), F.count(F.lit(1)).alias("n")
    )
    viol = F.when(F.col("nd") > 1, F.lit(1)).otherwise(F.lit(0))
    return g.groupBy("fd").agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum(viol).cast("long").alias("violating_groups"),
        F.sum(F.when(F.col("nd") > 1, F.col("n")).otherwise(F.lit(0)))
        .cast("long")
        .alias("rows_in_violation"),
        F.max("nd").cast("long").alias("max_distinct_rhs"),
    )


@_q(
    "fk_fanout_audit",
    """
    WITH fan AS (
      SELECT o.o_orderkey, COUNT(l.l_orderkey) AS n_items
      FROM orders o LEFT JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      GROUP BY o.o_orderkey),
    orphans AS (
      SELECT COUNT(*) AS n FROM lineitem l
      WHERE NOT EXISTS (SELECT 1 FROM orders o
                        WHERE o.o_orderkey = l.l_orderkey))
    SELECT CAST(COUNT(*) AS BIGINT) AS n_parents,
           CAST(MIN(n_items) AS BIGINT) AS min_fanout,
           ROUND(AVG(n_items), 4) AS avg_fanout,
           CAST(MAX(n_items) AS BIGINT) AS max_fanout,
           CAST(SUM(CASE WHEN n_items = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_childless,
           (SELECT CAST(n AS BIGINT) FROM orphans) AS n_orphan_children
    FROM fan
    """,
)
def fk_fanout_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Foreign-key fanout audit for orders→lineitem: per-parent child
    counts (min/avg/max — the max IS the join-skew bound), childless
    parents, and orphaned children — the data-modeling health check that
    predicts join behavior before a query ever runs."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    fan = (
        orders.join(
            lineitem,
            orders["o_orderkey"] == lineitem["l_orderkey"],
            "left",
        )
        .groupBy(orders["o_orderkey"])
        .agg(F.count(lineitem["l_orderkey"]).alias("n_items"))
    )
    n_orphans = (
        lineitem.join(
            orders, lineitem["l_orderkey"] == orders["o_orderkey"], "left_anti"
        ).count()
    )
    return fan.agg(
        F.count(F.lit(1)).alias("n_parents"),
        F.min("n_items").alias("min_fanout"),
        _r4(F.avg("n_items")).alias("avg_fanout"),
        F.max("n_items").alias("max_fanout"),
        F.sum(F.when(F.col("n_items") == 0, 1).otherwise(0)).alias(
            "n_childless"
        ),
        F.lit(n_orphans).cast("long").alias("n_orphan_children"),
    )


@_q(
    "table_content_fingerprints",
    """
    WITH nh AS (
      SELECT ('0x' || substr(md5(n_nationkey || '|' || n_name || '|'
                                 || n_regionkey), 1, 15))::BIGINT AS h
      FROM nation),
    rh AS (
      SELECT ('0x' || substr(md5(r_regionkey || '|' || r_name), 1, 15))::BIGINT
        AS h
      FROM region)
    SELECT 'nation' AS "table",
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(h % 1000000007) % 1000000007 AS BIGINT) AS content_sum
    FROM nh
    UNION ALL
    SELECT 'region', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(h % 1000000007) % 1000000007 AS BIGINT)
    FROM rh
    """,
)
def table_content_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive table content fingerprint: each row hashes to a
    portable md5-derived 60-bit value, summed into one DECIMAL per table —
    the cross-system reconciliation primitive (compare against a warehouse
    copy without moving rows; any single changed/missing/extra row moves
    the sum). Dimension tables only here: integer/string columns
    stringify identically on every engine, which float columns do not —
    the documented contract."""
    out = None
    for name, cols in (
        ("nation", ["n_nationkey", "n_name", "n_regionkey"]),
        ("region", ["r_regionkey", "r_name"]),
    ):
        t = load_table(spark, sf_dir, name)
        h = F.conv(
            F.substring(
                F.md5(F.concat_ws("|", *[F.col(c).cast("string") for c in cols])),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        # modular sum keeps the fingerprint in BIGINT on every engine
        # (a raw sum of 60-bit hashes overflows, and DECIMAL accumulators
        # trip the driver's typed hasher — the q12 class)
        agg = t.select((h % F.lit(1000000007)).alias("h")).agg(
            F.count(F.lit(1)).alias("n_rows"),
            (F.sum("h") % F.lit(1000000007)).cast("long").alias("content_sum"),
        ).select(
            F.lit(name).alias("table"), "n_rows", "content_sum"
        )
        out = agg if out is None else out.unionByName(agg)
    return out


@_q(
    "grouping_sets_revenue",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag, l_linestatus) AS INT) AS gid,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(l_extendedprice), 4) AS revenue
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary GROUPING SETS (neither ROLLUP nor CUBE expresses this
    combination: each single-column marginal plus the grand total, but NOT
    the cross product): one Expand-node pass, identical GROUPING-bit
    semantics on both engines. Completes the grouping-construct family
    beside rollup_lineitem_status and cube_orders_status_priority."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupingSets(
            [["l_returnflag"], ["l_linestatus"], []],
            "l_returnflag",
            "l_linestatus",
        )
        .agg(
            F.grouping_id().cast("int").alias("gid"),
            F.count(F.lit(1)).alias("n"),
            _r4(F.sum("l_extendedprice")).alias("revenue"),
        )
    )


@_q(
    "null_safe_segment_join",
    """
    WITH l AS (
      SELECT NULLIF(c_mktsegment, 'BUILDING') AS seg,
             COUNT(*) AS n_customers
      FROM customer GROUP BY 1),
    r AS (
      SELECT NULLIF(c_mktsegment, 'BUILDING') AS seg,
             ROUND(AVG(c_acctbal), 4) + 0 AS avg_bal
      FROM customer GROUP BY 1)
    SELECT COALESCE(l.seg, '(null)') AS segment, l.n_customers, r.avg_bal
    FROM l JOIN r ON l.seg IS NOT DISTINCT FROM r.seg
    """,
)
def null_safe_segment_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (<=> / IS NOT DISTINCT FROM): the NULL
    group — here the deliberately nulled-out BUILDING segment — must MATCH
    itself across the two aggregates, which a plain equi-join silently
    drops. The classic silent-data-loss trap in merge keys with nullable
    columns."""
    c = load_table(spark, sf_dir, "customer")
    seg = F.nullif(F.col("c_mktsegment"), F.lit("BUILDING"))
    lhs = c.groupBy(seg.alias("seg")).agg(
        F.count(F.lit(1)).alias("n_customers")
    )
    rhs = c.groupBy(seg.alias("seg")).agg(
        _r4(F.avg("c_acctbal")).alias("avg_bal")
    )
    return lhs.join(
        rhs, lhs["seg"].eqNullSafe(rhs["seg"])
    ).select(
        F.coalesce(lhs["seg"], F.lit("(null)")).alias("segment"),
        "n_customers",
        "avg_bal",
    )


@_q(
    "revenue_share_of_region",
    """
    WITH nrev AS (
      SELECT r.r_name AS region, n.n_name AS nation,
             SUM(o.o_totalprice) AS revenue
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      GROUP BY 1, 2)
    SELECT region, nation,
           ROUND(revenue, 4) AS revenue,
           ROUND(revenue / SUM(revenue) OVER (PARTITION BY region), 4)
             AS share_of_region
    FROM nrev
    """,
)
def revenue_share_of_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-parent: each nation's revenue as a share of its region's
    total via a partitioned window sum over the already-aggregated frame
    (25 rows — the window never touches the fact table). Dims broadcast."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    nrev = (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy(
            F.col("r_name").alias("region"), F.col("n_name").alias("nation")
        )
        .agg(F.sum("o_totalprice").alias("revenue"))
    )
    w = W.partitionBy("region")
    return nrev.select(
        "region",
        "nation",
        _r4(F.col("revenue")).alias("revenue"),
        _r4(F.col("revenue") / F.sum("revenue").over(w)).alias(
            "share_of_region"
        ),
    )


@_q(
    "forward_filled_values",
    """
    WITH gapped AS (
      SELECT event_id, user_id, ts,
             CASE WHEN event_id % 7 = 0 THEN NULL
                  ELSE ROUND(value, 4) END AS v
      FROM events)
    SELECT event_id, user_id,
           v AS raw_value,
           LAST_VALUE(v IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS filled_value,
           v IS NULL AS was_gap
    FROM gapped
    """,
)
def forward_filled_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward fill (last observation carried forward): every 7th reading
    deterministically nulled, then imputed from the user's most recent
    non-null value via LAST_VALUE ... IGNORE NULLS over an ordered frame —
    the time-series gap-repair primitive; leading gaps legitimately stay
    null. One keyed window, no self-join."""
    ev = load_table(spark, sf_dir, "events")
    v = F.when(F.col("event_id") % 7 == 0, F.lit(None)).otherwise(
        _r4(F.col("value"))
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    g = ev.select("event_id", "user_id", "ts", v.alias("v"))
    return g.select(
        "event_id",
        "user_id",
        F.col("v").alias("raw_value"),
        F.last("v", ignorenulls=True).over(w).alias("filled_value"),
        F.col("v").isNull().alias("was_gap"),
    )


def _interp_sql() -> str:
    return """
    WITH gapped AS (
      SELECT event_id, user_id, epoch_us(ts)::BIGINT AS us,
             CASE WHEN event_id % 7 = 0 THEN NULL
                  ELSE ROUND(value, 4) END AS v
      FROM events),
    ctx AS (
      SELECT event_id, user_id, us, v,
             LAST_VALUE(v IGNORE NULLS) OVER wp AS pv,
             LAST_VALUE(us_v IGNORE NULLS) OVER wp AS pus,
             FIRST_VALUE(v IGNORE NULLS) OVER wn AS nv,
             FIRST_VALUE(us_v IGNORE NULLS) OVER wn AS nus
      FROM (SELECT event_id, user_id, us,
                   v, CASE WHEN v IS NOT NULL THEN us END AS us_v
            FROM gapped) g
      WINDOW wp AS (PARTITION BY user_id ORDER BY us, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             wn AS (PARTITION BY user_id ORDER BY us, event_id
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
    SELECT event_id, user_id, v AS raw_value,
           ROUND(CASE
             WHEN v IS NOT NULL THEN v
             WHEN pv IS NOT NULL AND nv IS NOT NULL
               THEN pv + (nv - pv) * ((us - pus) / CAST(nus - pus AS DOUBLE))
             WHEN pv IS NOT NULL THEN pv
             ELSE nv END, 4) AS filled_value,
           CASE WHEN v IS NOT NULL THEN 'observed'
                WHEN pv IS NOT NULL AND nv IS NOT NULL THEN 'interp'
                WHEN pv IS NOT NULL THEN 'locf'
                WHEN nv IS NOT NULL THEN 'nocb'
                ELSE 'none' END AS fill_kind
    FROM ctx
    """


# NOTE: the pus/nus columns must come from the same non-null rows as
# pv/nv; LAST_VALUE(us IGNORE NULLS) over all rows would grab the
# current row's us. The oracle therefore masks us to us_v first — see
# the Spark twin below for the same guard.
@_q("linear_interpolated_values", _interp_sql())
def linear_interpolated_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation over deterministic gaps (every 7th reading
    nulled): interior gaps are filled proportionally in event time
    between the neighboring observations, edges degrade to LOCF/NOCB,
    all-null groups stay null — pandas' interpolate(limit_direction=
    'both') semantics without extrapolation, as two keyed window passes
    (no self-join); ``fill_kind`` labels the imputation used."""
    ev = load_table(spark, sf_dir, "events")
    v = F.when(F.col("event_id") % 7 == 0, F.lit(None)).otherwise(
        _r4(F.col("value"))
    )
    g = ev.select(
        "event_id",
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        v.alias("v"),
    ).withColumn("us_v", F.when(F.col("v").isNotNull(), F.col("us")))
    wp = (
        W.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wn = (
        W.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    pv = F.last("v", ignorenulls=True).over(wp)
    pus = F.last("us_v", ignorenulls=True).over(wp)
    nv = F.first("v", ignorenulls=True).over(wn)
    nus = F.first("us_v", ignorenulls=True).over(wn)
    both = pv.isNotNull() & nv.isNotNull()
    interp = pv + (nv - pv) * (
        (F.col("us") - pus) / (nus - pus).cast("double")
    )
    filled = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(both, interp)
        .when(pv.isNotNull(), pv)
        .otherwise(nv)
    )
    kind = (
        F.when(F.col("v").isNotNull(), F.lit("observed"))
        .when(both, F.lit("interp"))
        .when(pv.isNotNull(), F.lit("locf"))
        .when(nv.isNotNull(), F.lit("nocb"))
        .otherwise(F.lit("none"))
    )
    return g.select(
        "event_id",
        "user_id",
        F.col("v").alias("raw_value"),
        _r4(filled).alias("filled_value"),
        kind.alias("fill_kind"),
    )

