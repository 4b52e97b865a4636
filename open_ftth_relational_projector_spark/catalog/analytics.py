"""Corpus statistics, recommendations, journeys, A/B stats, PQ serving, prefix-filtered similarity joins.

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

from open_ftth_relational_projector_spark.cache import tracked_persist  # noqa: F401
from ._registry import _q, _r4  # noqa: F401

@_q(
    "corpus_zipf_heaps",
    """
    WITH t AS (SELECT source, UNNEST(string_split(text, ' ')) AS tok
               FROM documents),
    agg AS (SELECT source, COUNT(*) AS n_tokens,
                   COUNT(DISTINCT tok) AS n_vocab
            FROM t GROUP BY source),
    tf AS (SELECT source, tok, COUNT(*) AS f FROM t GROUP BY source, tok),
    rk AS (SELECT source, tok, f,
                  ROW_NUMBER() OVER (PARTITION BY source
                                     ORDER BY f DESC, tok) AS r
           FROM tf),
    top AS (SELECT source, LN(CAST(r AS DOUBLE)) AS x,
                   LN(CAST(f AS DOUBLE)) AS y
            FROM rk WHERE r <= 50),
    ols AS (SELECT source, COUNT(*) AS n, AVG(x) AS mx, AVG(y) AS my,
                   SUM(x * y) AS sxy, SUM(x * x) AS sxx
            FROM top GROUP BY source)
    SELECT a.source,
           CAST(a.n_tokens AS BIGINT) AS n_tokens,
           CAST(a.n_vocab AS BIGINT) AS n_vocab,
           ROUND(LN(CAST(a.n_vocab AS DOUBLE))
                 / LN(CAST(a.n_tokens AS DOUBLE)), 4) AS heaps_beta,
           ROUND((o.sxy - o.n * o.mx * o.my)
                 / (o.sxx - o.n * o.mx * o.mx), 4) + 0 AS zipf_slope
    FROM agg a JOIN ols o ON a.source = o.source
    """,
)
def corpus_zipf_heaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-linguistics health diagnostics per source: Heaps' exponent
    proxy (log vocab / log tokens — vocabulary growth; too low ⇒
    boilerplate, too high ⇒ noise/gibberish) and the Zipf slope (OLS on
    the log-log top-50 rank/frequency curve; natural text sits near −1).
    Two keyed aggregations + a 50-row-per-source regression — the
    corpus-level screen run before committing a crawl source to
    training."""
    from open_ftth_relational_projector_spark.functions.text import tokens

    docs = scattered(load_table(spark, sf_dir, "documents"))
    t = docs.select("source", F.explode(tokens(F.col("text"))).alias("tok"))
    agg = t.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.countDistinct("tok").alias("n_vocab"),
    )
    tf = t.groupBy("source", "tok").agg(F.count(F.lit(1)).alias("f"))
    # two-phase exact top-50 (operators/hierarchical.two_phase_top_n):
    # tf has one row per (source, token), so the sub-shard pre-rank is
    # lossless, and the final window sees 32*50 candidates per source
    # rather than the vocab (1e8+ rows per source at corpus scale)
    from open_ftth_relational_projector_spark.operators.hierarchical import (
        two_phase_top_n,
    )

    top = (
        two_phase_top_n(
            tf,
            [F.col("source")],
            [F.col("f").desc(), F.col("tok")],
            50,
            F.col("tok"),
            out_col="r",
        )
        .select(
            "source",
            F.log(F.col("r").cast("double")).alias("x"),
            F.log(F.col("f").cast("double")).alias("y"),
        )
    )
    ols = top.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("x").alias("mx"),
        F.avg("y").alias("my"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    slope = (F.col("sxy") - F.col("n") * F.col("mx") * F.col("my")) / (
        F.col("sxx") - F.col("n") * F.col("mx") * F.col("mx")
    )
    return agg.join(F.broadcast(ols), "source").select(
        "source",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_vocab").cast("long").alias("n_vocab"),
        _r4(
            F.log(F.col("n_vocab").cast("double"))
            / F.log(F.col("n_tokens").cast("double"))
        ).alias("heaps_beta"),
        _r4(slope).alias("zipf_slope"),
    )


@_q(
    "acctbal_distribution_ranks",
    """
    SELECT c_custkey, c_mktsegment,
           ROUND(PERCENT_RANK() OVER w, 4) AS pct_rank,
           ROUND(CUME_DIST() OVER w, 4) AS cume_dist
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    """,
)
def acctbal_distribution_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution position of every customer's balance within its
    market segment: PERCENT_RANK ((rank−1)/(n−1)) and CUME_DIST — the
    relative-standing analytics (plain keyed windows, one shuffle)."""
    c = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        "c_mktsegment",
        _r4(F.percent_rank().over(w)).alias("pct_rank"),
        _r4(F.cume_dist().over(w)).alias("cume_dist"),
    )


@_q(
    "item_item_similarity",
    """
    WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    n AS (SELECT l_partkey, COUNT(*) AS n_orders FROM li GROUP BY l_partkey),
    co AS (
      SELECT a.l_partkey AS pa, b.l_partkey AS pb, COUNT(*) AS n_ab
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
      GROUP BY 1, 2),
    sim AS (
      SELECT co.pa, co.pb,
             ROUND(co.n_ab / SQRT(na.n_orders * CAST(nb.n_orders AS DOUBLE)), 4)
               AS cosine
      FROM co
      JOIN n na ON co.pa = na.l_partkey
      JOIN n nb ON co.pb = nb.l_partkey),
    top AS (
      SELECT pa, pb, cosine,
             ROW_NUMBER() OVER (PARTITION BY pa
                                ORDER BY cosine DESC, pb) AS rnk
      FROM sim)
    SELECT pa AS part_a, pb AS part_b, cosine, CAST(rnk AS INT) AS rnk
    FROM top WHERE rnk <= 3
    """,
)
def item_item_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item collaborative-filtering precompute: cosine similarity of
    parts over the order-basket incidence (n_ab/√(n_a·n_b)), top-3
    neighbors per part — the classic recommender neighborhood table. The
    pair expansion is keyed on the basket id (quadratic only within a
    basket, the same skew contract as part_cooccurrence_top_pairs); the
    count vectors broadcast back onto the pair table."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    n = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n_orders"))
    a = li.select("l_orderkey", F.col("l_partkey").alias("pa"))
    b = li.select("l_orderkey", F.col("l_partkey").alias("pb"))
    co = (
        a.join(b, "l_orderkey")
        .filter(F.col("pa") != F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    sim = (
        co.join(
            F.broadcast(n.select(F.col("l_partkey").alias("pa"),
                                 F.col("n_orders").alias("na"))), "pa"
        )
        .join(
            F.broadcast(n.select(F.col("l_partkey").alias("pb"),
                                 F.col("n_orders").alias("nb"))), "pb"
        )
        .select(
            "pa",
            "pb",
            _r4(
                F.col("n_ab")
                / F.sqrt(F.col("na") * F.col("nb").cast("double"))
            ).alias("cosine"),
        )
    )
    wtop = W.partitionBy("pa").orderBy(F.col("cosine").desc(), F.col("pb"))
    return (
        sim.withColumn("rnk", F.row_number().over(wtop))
        .filter(F.col("rnk") <= 3)
        .select(
            F.col("pa").alias("part_a"),
            F.col("pb").alias("part_b"),
            "cosine",
            F.col("rnk").cast("int").alias("rnk"),
        )
    )


@_q(
    "part_cooccurrence_top_pairs",
    """
    WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    pairs AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             COUNT(*) AS n_orders
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2)
    SELECT part_a, part_b, CAST(n_orders AS BIGINT) AS n_orders
    FROM pairs
    ORDER BY n_orders DESC, part_a, part_b
    LIMIT 25
    """,
)
def part_cooccurrence_top_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: part pairs bought in the same order,
    top-25 by support — the self-join keyed on the basket id, quadratic
    ONLY within a basket (baskets are small; a hot basket is the skew to
    cap, same contract as the shingle inverted index)."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = li.select(
        F.col("l_orderkey"), F.col("l_partkey").alias("part_a")
    )
    b = li.select(
        F.col("l_orderkey"), F.col("l_partkey").alias("part_b")
    )
    return (
        a.join(b, "l_orderkey")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy(F.col("n_orders").desc(), "part_a", "part_b")
        .limit(25)
    )


@_q(
    "calendar_monthly_rollup",
    """
    WITH bounds AS (
      SELECT CAST(MIN(ts) AS DATE) AS lo, CAST(MAX(ts) AS DATE) AS hi
      FROM events),
    spine AS (
      SELECT UNNEST(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS day
      FROM bounds),
    cal AS (
      SELECT day,
             CAST(date_part('year', day) AS INT) AS year,
             CAST(date_part('month', day) AS INT) AS month,
             CAST(date_part('isodow', day) AS INT) AS iso_dow
      FROM spine),
    daily AS (
      SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n,
             SUM(value) AS v
      FROM events GROUP BY 1)
    SELECT cal.year, cal.month,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(SUM(CASE WHEN cal.iso_dow >= 6 THEN 1 ELSE 0 END)
             AS BIGINT) AS n_weekend_days,
           CAST(COALESCE(SUM(daily.n), 0) AS BIGINT) AS n_events,
           ROUND(COALESCE(SUM(daily.v), 0), 4) AS total_value
    FROM cal LEFT JOIN daily USING (day)
    GROUP BY cal.year, cal.month
    """,
)
def calendar_monthly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conformed calendar dimension generated as a date SPINE (sequence
    between the corpus bounds — days with no events still exist, the
    property a GROUP BY over facts alone loses) joined to daily facts and
    rolled up monthly with weekend accounting. Spine generation is one
    F.sequence over a 2-row bound aggregate — no external table."""
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.min(F.col("ts").cast("date")).alias("lo"),
        F.max(F.col("ts").cast("date")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))
        ).alias("day")
    )
    cal = spine.select(
        "day",
        F.year("day").alias("year"),
        F.month("day").alias("month"),
        F.dayofweek("day").alias("_dow"),  # Sun=1..Sat=7
    ).withColumn(
        "iso_dow",
        F.when(F.col("_dow") == 1, 7).otherwise(F.col("_dow") - 1),
    )
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).alias("n"), F.sum("value").alias("v")
    )
    return (
        cal.join(daily, "day", "left")
        .groupBy("year", "month")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.sum(
                F.when(F.col("iso_dow") >= 6, 1).otherwise(0)
            ).alias("n_weekend_days"),
            F.coalesce(F.sum("n"), F.lit(0)).alias("n_events"),
            _r4(F.coalesce(F.sum("v"), F.lit(0.0))).alias("total_value"),
        )
    )


@_q(
    "user_activity_streaks",
    """
    WITH du AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
    grp AS (
      SELECT user_id, day,
             day - CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                                           ORDER BY day) AS INT) AS island
      FROM du),
    streaks AS (
      SELECT user_id, COUNT(*) AS len FROM grp
      GROUP BY user_id, island)
    SELECT user_id,
           CAST(MAX(len) AS BIGINT) AS longest_streak,
           CAST(COUNT(*) AS BIGINT) AS n_streaks
    FROM streaks GROUP BY user_id
    """,
)
def user_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: per-user longest run of CONSECUTIVE active days
    (day minus per-user rank is constant within an island — the classic
    trick turning consecutiveness into a grouping key; one keyed window +
    two keyed aggregations, no self-join)."""
    ev = load_table(spark, sf_dir, "events")
    du = ev.select(
        "user_id", F.col("ts").cast("date").alias("day")
    ).distinct()
    w = W.partitionBy("user_id").orderBy("day")
    grp = du.withColumn(
        "island", F.date_sub(F.col("day"), F.row_number().over(w))
    )
    streaks = grp.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).alias("len")
    )
    return streaks.groupBy("user_id").agg(
        F.max("len").alias("longest_streak"),
        F.count(F.lit(1)).alias("n_streaks"),
    )


@_q(
    "lang_source_chisq",
    """
    WITH obs AS (
      SELECT lang, source, COUNT(*) AS o FROM documents GROUP BY 1, 2),
    rows_m AS (SELECT lang, SUM(o) AS rt FROM obs GROUP BY lang),
    cols_m AS (SELECT source, SUM(o) AS ct FROM obs GROUP BY source),
    tot AS (SELECT SUM(o) AS n FROM obs),
    ex AS (
      SELECT o.lang, o.source, o.o,
             r.rt * c.ct / CAST(t.n AS DOUBLE) AS e
      FROM obs o JOIN rows_m r USING (lang) JOIN cols_m c USING (source)
      CROSS JOIN tot t)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
           ROUND(SUM((o - e) * (o - e) / e), 4) AS chi_square,
           CAST((SELECT COUNT(*) FROM rows_m) - 1 AS BIGINT)
             * ((SELECT COUNT(*) FROM cols_m) - 1) AS dof
    FROM ex
    """,
)
def lang_source_chisq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence statistic for (lang × source) — the
    profiling check for whether corpus slices are confounded (a source
    that only speaks one language biases per-source sampling). Expected
    counts from broadcast row/column marginals; the statistic folds in
    one pass over the contingency cells."""
    docs = load_table(spark, sf_dir, "documents")
    obs = docs.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("o"))
    rows_m = obs.groupBy("lang").agg(F.sum("o").alias("rt"))
    cols_m = obs.groupBy("source").agg(F.sum("o").alias("ct"))
    tot = obs.agg(F.sum("o").alias("n"))
    ex = (
        obs.join(F.broadcast(rows_m), "lang")
        .join(F.broadcast(cols_m), "source")
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "e", F.col("rt") * F.col("ct") / F.col("n").cast("double")
        )
    )
    n_rows = rows_m.count()
    n_cols = cols_m.count()
    return ex.agg(
        F.count(F.lit(1)).alias("n_cells"),
        _r4(
            F.sum(
                (F.col("o") - F.col("e"))
                * (F.col("o") - F.col("e"))
                / F.col("e")
            )
        ).alias("chi_square"),
        F.lit((n_rows - 1) * (n_cols - 1)).cast("long").alias("dof"),
    )


@_q(
    "kwic_snippets",
    """
    WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t
                 FROM documents),
    hits AS (
      SELECT doc_id,
             UNNEST([i FOR i IN range(1, len(t) + 1)
                     IF t[i] = 'window']) AS pos,
             t
      FROM tok)
    SELECT doc_id, CAST(pos AS INT) AS pos,
           array_to_string(
             t[GREATEST(pos - 3, 1):LEAST(pos + 3, len(t))], ' ')
             AS snippet
    FROM hits
    """,
)
def kwic_snippets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword-in-context extraction: every occurrence of the term with
    ±3 tokens of context — the corpus-inspection tool behind filter-rule
    debugging (is 'window' a UI word or an SQL word here?). Row-local
    array ops (positions via filtered sequence, snippet via slice), one
    explode — map-only at any scale."""
    docs = load_table(spark, sf_dir, "documents")
    from open_ftth_relational_projector_spark.functions.text import let, tokens

    def hits_of(toks):
        idx = F.filter(
            F.sequence(F.lit(1), F.size(toks)),
            lambda i: F.element_at(toks, i) == F.lit("window"),
        )
        return F.transform(
            idx,
            lambda p: F.struct(
                p.alias("pos"),
                F.array_join(
                    F.slice(
                        toks,
                        F.greatest(p - 3, F.lit(1)),
                        F.least(p + 3, F.size(toks))
                        - F.greatest(p - 3, F.lit(1))
                        + 1,
                    ),
                    " ",
                ).alias("snippet"),
            ),
        )

    return (
        docs.select(
            "doc_id",
            F.explode(let(tokens(F.col("text")), hits_of)).alias("h"),
        )
        .select(
            "doc_id",
            F.col("h.pos").cast("int").alias("pos"),
            F.col("h.snippet").alias("snippet"),
        )
    )


@_q(
    "user_value_trend",
    """
    WITH px AS (
      SELECT user_id,
             CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS DOUBLE) / 86400000000.0
               AS x,
             value AS y
      FROM events WHERE event_type = 'purchase'),
    s AS (
      SELECT user_id, COUNT(*) AS n,
             SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * y) AS sxy, SUM(x * x) AS sxx
      FROM px GROUP BY user_id)
    SELECT user_id, CAST(n AS BIGINT) AS n,
           ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 4) + 0 AS slope
    FROM s WHERE n >= 5 AND (n * sxx - sx * sx) > 1e-9
    """,
)
def user_value_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user OLS trend of purchase value over time (closed-form slope
    from one grouped pass of the five sufficient statistics — time in
    fractional days so the normal-equation denominator keeps precision).
    The groupwise-regression shape: no per-key fitting loop, one
    map-side-combined aggregation at any scale."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    x = (
        F.unix_micros(F.col("ts").cast("timestamp")).cast("double")
        / F.lit(86400000000.0)
    )
    px = ev.select("user_id", x.alias("x"), F.col("value").alias("y"))
    s = px.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    denom = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / denom
    return (
        s.filter((F.col("n") >= 5) & (denom > 1e-9))
        .select("user_id", F.col("n").cast("long").alias("n"),
                _r4(slope).alias("slope"))
    )


@_q(
    "ab_test_zscore",
    """
    WITH arms AS (
      SELECT user_id,
             CASE WHEN substr(md5(user_id || '#exp1'), 1, 1) < '8'
                  THEN 'A' ELSE 'B' END AS arm,
             MAX(CASE WHEN event_type = 'purchase' AND value > 150
                      THEN 1 ELSE 0 END) AS converted
      FROM events GROUP BY user_id),
    agg AS (
      SELECT arm, COUNT(*) AS n, SUM(converted) AS conv
      FROM arms GROUP BY arm),
    wide AS (
      SELECT
        MAX(CASE WHEN arm = 'A' THEN n END) AS na,
        MAX(CASE WHEN arm = 'A' THEN conv END) AS ca,
        MAX(CASE WHEN arm = 'B' THEN n END) AS nb,
        MAX(CASE WHEN arm = 'B' THEN conv END) AS cb
      FROM agg)
    SELECT CAST(na AS BIGINT) AS n_a, CAST(ca AS BIGINT) AS conv_a,
           CAST(nb AS BIGINT) AS n_b, CAST(cb AS BIGINT) AS conv_b,
           ROUND((ca / CAST(na AS DOUBLE)) - (cb / CAST(nb AS DOUBLE)), 4) + 0
             AS lift,
           ROUND(((ca / CAST(na AS DOUBLE)) - (cb / CAST(nb AS DOUBLE)))
                 / SQRT(((ca + cb) / CAST(na + nb AS DOUBLE))
                        * (1 - (ca + cb) / CAST(na + nb AS DOUBLE))
                        * (1.0 / na + 1.0 / nb)), 4) + 0 AS z
    FROM wide
    """,
)
def ab_test_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test over a deterministic md5 arm split (the same
    engine-portable assignment as hash_split — an experiment framework
    must reproduce its arms everywhere): per-arm conversion, lift, and the
    pooled-variance z statistic — the experimentation readout, computed
    from two grouped passes and a 2-row pivot."""
    ev = load_table(spark, sf_dir, "events")
    arm = F.when(
        F.substring(
            F.md5(F.concat(F.col("user_id").cast("string"), F.lit("#exp1"))),
            1,
            1,
        )
        < "8",
        "A",
    ).otherwise("B")
    # conversion = any HIGH-VALUE purchase: every user purchases
    # eventually, which would give pooled p = 1 and zero variance
    arms = ev.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") > 150),
                1,
            ).otherwise(0)
        ).alias("converted")
    ).withColumn("arm", arm)
    agg = arms.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"), F.sum("converted").alias("conv")
    )
    wide = agg.agg(
        F.max(F.when(F.col("arm") == "A", F.col("n"))).alias("na"),
        F.max(F.when(F.col("arm") == "A", F.col("conv"))).alias("ca"),
        F.max(F.when(F.col("arm") == "B", F.col("n"))).alias("nb"),
        F.max(F.when(F.col("arm") == "B", F.col("conv"))).alias("cb"),
    )
    pa = F.col("ca") / F.col("na").cast("double")
    pb = F.col("cb") / F.col("nb").cast("double")
    pp = (F.col("ca") + F.col("cb")) / (
        F.col("na") + F.col("nb")
    ).cast("double")
    z = (pa - pb) / F.sqrt(
        pp * (1 - pp) * (1.0 / F.col("na") + 1.0 / F.col("nb"))
    )
    return wide.select(
        F.col("na").cast("long").alias("n_a"),
        F.col("ca").cast("long").alias("conv_a"),
        F.col("nb").cast("long").alias("n_b"),
        F.col("cb").cast("long").alias("conv_b"),
        _r4(pa - pb).alias("lift"),
        _r4(z).alias("z"),
    )


@_q(
    "top_user_journey_prefixes",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events),
    j AS (
      SELECT user_id,
             string_agg(event_type, ' > ' ORDER BY rn) AS journey
      FROM seq WHERE rn <= 3 GROUP BY user_id)
    SELECT journey, CAST(COUNT(*) AS BIGINT) AS n_users
    FROM j GROUP BY journey
    ORDER BY n_users DESC, journey
    LIMIT 15
    """,
)
def top_user_journey_prefixes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top first-3-event journeys: each user's opening event-type sequence
    folded to a path string, ranked by frequency — the onboarding-funnel
    readout. One keyed window + ordered string_agg (ORDER BY inside the
    aggregate keeps the path deterministic on both engines)."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id", "event_type", F.row_number().over(w).alias("rn")
    ).filter(F.col("rn") <= 3)
    j = (
        seq.groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("rn", "event_type"))
                    ),
                    lambda s: s["event_type"],
                ),
                " > ",
            ).alias("journey")
        )
    )
    return (
        j.groupBy("journey")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy(F.col("n_users").desc(), "journey")
        .limit(15)
    )


@_q(
    "dedup_strategy_matrix",
    """
    WITH ex AS (
      SELECT doc_id,
             MIN(doc_id) OVER (PARTITION BY md5(text)) < doc_id AS exact_dup
      FROM documents),
    toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (
      SELECT DISTINCT doc_id, shingle FROM (
        SELECT doc_id,
               UNNEST(list_transform(
                 generate_series(1, GREATEST(LEN(t) - 2, 0)),
                 i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle
        FROM toks)),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS u, b.doc_id AS v, COUNT(*) AS ni
      FROM sh a JOIN sh b ON a.shingle = b.shingle
                          AND a.doc_id <> b.doc_id
      GROUP BY 1, 2),
    jd AS (
      SELECT DISTINCT i.u AS doc_id FROM inter i
      JOIN sizes sa ON i.u = sa.doc_id
      JOIN sizes sb ON i.v = sb.doc_id
      WHERE i.ni / CAST(sa.n + sb.n - i.ni AS DOUBLE) >= 0.2
        AND i.v < i.u)
    SELECT d.doc_id,
           ex.exact_dup,
           jd.doc_id IS NOT NULL AS jaccard_dup,
           ex.exact_dup = (jd.doc_id IS NOT NULL) AS strategies_agree
    FROM documents d
    JOIN ex USING (doc_id)
    LEFT JOIN jd USING (doc_id)
    """,
)
def dedup_strategy_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-strategy agreement matrix: per doc, the EXACT-hash verdict
    beside the n-gram-Jaccard (τ=0.2) verdict and whether they agree —
    the measurement that tells you what fuzzy matching adds over exact
    (exact ⊂ jaccard: identical texts share all shingles). Drop rule in
    both: a LOWER-id duplicate exists."""
    docs = scattered(load_table(spark, sf_dir, "documents"))
    wex = W.partitionBy(F.md5(F.col("text")))
    ex = docs.select(
        "doc_id",
        (F.min("doc_id").over(wex) < F.col("doc_id")).alias("exact_dup"),
    )
    pairs = D.ngram_jaccard_pairs(docs, threshold=0.2, n=3)
    jd = (
        pairs.select(F.col("doc_b").alias("doc_id"))
        .distinct()
        .withColumn("is_jd", F.lit(True))
    )
    return (
        ex.join(jd, "doc_id", "left")
        .select(
            "doc_id",
            "exact_dup",
            F.coalesce(F.col("is_jd"), F.lit(False)).alias("jaccard_dup"),
            (
                F.col("exact_dup")
                == F.coalesce(F.col("is_jd"), F.lit(False))
            ).alias("strategies_agree"),
        )
    )


@_q(
    "jaccard_pairs_prefix_filtered",
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
    WHERE n_inter / CAST(sa.n + sb.n - n_inter AS DOUBLE) >= 0.3
    """,
)
def jaccard_pairs_prefix_filtered_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AllPairs/PPJoin prefix-filtered EXACT similarity join
    (functions/dedup.jaccard_pairs_prefix_filtered): the oracle is the
    SAME full-inverted-index SQL shape as ngram_jaccard_pairs (at τ=0.3)
    — prefix filtering is lossless, only the candidate set shrinks."""
    # threshold 0.3: prefix filtering is a HIGH-threshold technique —
    # at t the prefix is ~(1−t) of the set, so t=0.05 degenerates to the
    # full index plus overhead (measured: 9.2 s vs 2.5 s at sf0.1)
    out = D.jaccard_pairs_prefix_filtered(
        scattered(load_table(spark, sf_dir, "documents")),
        threshold=0.3,
        n=3,
    )
    return out.select("doc_a", "doc_b", _r4(F.col("jaccard")).alias("jaccard"))


def _pq_sub_ctes(j: int | str, lo: int, hi: int) -> str:
    """The kmeans CTE chain (k=4, iters=2 — see _KMEANS_CTES) restricted
    to subspace ``j`` = embedding positions [lo, hi]; suffixed so multiple
    chains coexist in one statement (ivfpq's coarse chain passes j="c"
    over the full 1..64 range)."""
    return f"""
    pe{j} AS (
      SELECT vec_id, pos, val FROM (
        SELECT vec_id,
               UNNEST(range(1, len(embedding) + 1)) AS pos,
               UNNEST(CAST(embedding AS DOUBLE[])) AS val
        FROM embeddings)
      WHERE pos BETWEEN {lo} AND {hi}),
    c0{j} AS (SELECT i.cid, p.pos, ROUND(p.val, 6) AS cv
              FROM pqinit i JOIN pe{j} p USING (vec_id)),
    d1{j} AS (SELECT p.vec_id, c.cid,
                     SUM((p.val - c.cv) * (p.val - c.cv)) AS d2
              FROM pe{j} p JOIN c0{j} c USING (pos) GROUP BY 1, 2),
    a1{j} AS (SELECT vec_id, cid FROM (
                SELECT vec_id, cid,
                       ROW_NUMBER() OVER (PARTITION BY vec_id
                                          ORDER BY d2, cid) AS rn
                FROM d1{j}) WHERE rn = 1),
    c1{j} AS (SELECT a.cid, p.pos, ROUND(AVG(p.val), 6) AS cv
              FROM a1{j} a JOIN pe{j} p USING (vec_id) GROUP BY 1, 2),
    d2t{j} AS (SELECT p.vec_id, c.cid,
                      SUM((p.val - c.cv) * (p.val - c.cv)) AS d2
               FROM pe{j} p JOIN c1{j} c USING (pos) GROUP BY 1, 2),
    a2{j} AS (SELECT vec_id, cid FROM (
                SELECT vec_id, cid,
                       ROW_NUMBER() OVER (PARTITION BY vec_id
                                          ORDER BY d2, cid) AS rn
                FROM d2t{j}) WHERE rn = 1),
    c2{j} AS (SELECT a.cid, p.pos, ROUND(AVG(p.val), 6) AS cv
              FROM a2{j} a JOIN pe{j} p USING (vec_id) GROUP BY 1, 2),
    d3{j} AS (SELECT p.vec_id, c.cid,
                     SUM((p.val - c.cv) * (p.val - c.cv)) AS d2
              FROM pe{j} p JOIN c2{j} c USING (pos) GROUP BY 1, 2),
    a3{j} AS (SELECT vec_id, cid, d2 FROM (
                SELECT vec_id, cid, d2,
                       ROW_NUMBER() OVER (PARTITION BY vec_id
                                          ORDER BY d2, cid) AS rn
                FROM d3{j}) WHERE rn = 1)"""


_PQ_SQL = (
    """
    WITH pqinit AS (
      SELECT ROW_NUMBER() OVER (ORDER BY vec_id) AS cid, vec_id
      FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 4)),"""
    + ",".join([_pq_sub_ctes(1, 1, 32), _pq_sub_ctes(2, 33, 64)])
    + """
    SELECT a.vec_id,
           CAST(a.cid AS INT) AS code_1,
           CAST(b.cid AS INT) AS code_2,
           ROUND(SQRT(a.d2 + b.d2), 4) AS recon_err
    FROM a31 a JOIN a32 b USING (vec_id)
    """
)


@_q("pq_codes", _PQ_SQL)
def pq_codes_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization (Jégou et al. 2011): two per-subspace k-means
    codebooks (same fixed-point Lloyd contract as kmeans_cluster_stats),
    per-vector code tuple + reconstruction error
    (functions/clustering.pq_codes); the oracle unrolls BOTH codebook
    trainings in one statement."""
    from open_ftth_relational_projector_spark.functions.clustering import (
        pq_codes,
    )

    return pq_codes(
        scattered(load_table(spark, sf_dir, "embeddings")),
        m=2,
        k=4,
        iters=2,
        dim=64,
    )


_PQ_ADC_SQL = (
    """
    WITH pqinit AS (
      SELECT ROW_NUMBER() OVER (ORDER BY vec_id) AS cid, vec_id
      FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 4)),"""
    + ",".join([_pq_sub_ctes(1, 1, 32), _pq_sub_ctes(2, 33, 64)])
    + """,
    qd1 AS (
      SELECT q.vec_id AS query_id, c.cid,
             ROUND(SUM((q.val - c.cv) * (q.val - c.cv)), 6) AS d
      FROM pe1 q JOIN c21 c USING (pos)
      WHERE q.vec_id % 100 = 0 GROUP BY 1, 2),
    qd2 AS (
      SELECT q.vec_id AS query_id, c.cid,
             ROUND(SUM((q.val - c.cv) * (q.val - c.cv)), 6) AS d
      FROM pe2 q JOIN c22 c USING (pos)
      WHERE q.vec_id % 100 = 0 GROUP BY 1, 2),
    scored AS (
      SELECT qd1.query_id, a.vec_id AS neighbor_id, qd1.d + qd2.d AS adist
      FROM a31 a
      JOIN a32 b ON a.vec_id = b.vec_id
      JOIN qd1 ON qd1.cid = a.cid
      JOIN qd2 ON qd2.query_id = qd1.query_id AND qd2.cid = b.cid
      WHERE a.vec_id <> qd1.query_id)
    SELECT query_id, neighbor_id, CAST(rnk AS INT) AS rnk FROM (
      SELECT query_id, neighbor_id,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY adist, neighbor_id) AS rnk
      FROM scored) WHERE rnk <= 5
    """
)


@_q("pq_knn_adc", _PQ_ADC_SQL)
def pq_knn_adc_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric-distance kNN over PQ codes (clustering.pq_knn_adc): the
    corpus is represented only by centroid-id tuples; query→centroid
    lookup tables (rounded 6 dp, the fixed-point contract) rank the
    codes. The oracle unrolls both codebooks and replays the LUT ranking."""
    from open_ftth_relational_projector_spark.functions.clustering import (
        pq_knn_adc,
    )

    emb = scattered(load_table(spark, sf_dir, "embeddings"))
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    return pq_knn_adc(emb, queries, m=2, k=4, iters=2, knn_k=5, dim=64)


def _ivfpq_res_ctes(j: int, lo: int, hi: int) -> str:
    """The PQ codebook kmeans chain (k=4, iters=2 — the `_pq_sub_ctes`
    recipe) over the coarse-quantizer RESIDUALS (`res`) restricted to
    subspace ``j`` = positions [lo, hi]; r-prefixed so the coarse chain
    and both residual chains coexist in one statement. Same empty-cell
    caveat as every unrolled kmeans chain here: a cell that empties
    mid-training vanishes from the SQL chain while the engine carries
    its centroid forward — the fixtures keep all cells populated, which
    the oracle runs themselves verify."""
    return f"""
    rs{j} AS (SELECT vec_id, pos, val FROM res
              WHERE pos BETWEEN {lo} AND {hi}),
    r0{j} AS (SELECT i.cid, r.pos, ROUND(r.val, 6) AS cv
              FROM pqinit i JOIN rs{j} r USING (vec_id)),
    rd1{j} AS (SELECT r.vec_id, c.cid,
                      SUM((r.val - c.cv) * (r.val - c.cv)) AS d2
               FROM rs{j} r JOIN r0{j} c USING (pos) GROUP BY 1, 2),
    ra1{j} AS (SELECT vec_id, cid FROM (
                 SELECT vec_id, cid,
                        ROW_NUMBER() OVER (PARTITION BY vec_id
                                           ORDER BY d2, cid) AS rn
                 FROM rd1{j}) WHERE rn = 1),
    rc1{j} AS (SELECT a.cid, r.pos, ROUND(AVG(r.val), 6) AS cv
               FROM ra1{j} a JOIN rs{j} r USING (vec_id) GROUP BY 1, 2),
    rd2{j} AS (SELECT r.vec_id, c.cid,
                      SUM((r.val - c.cv) * (r.val - c.cv)) AS d2
               FROM rs{j} r JOIN rc1{j} c USING (pos) GROUP BY 1, 2),
    ra2{j} AS (SELECT vec_id, cid FROM (
                 SELECT vec_id, cid,
                        ROW_NUMBER() OVER (PARTITION BY vec_id
                                           ORDER BY d2, cid) AS rn
                 FROM rd2{j}) WHERE rn = 1),
    rc2{j} AS (SELECT a.cid, r.pos, ROUND(AVG(r.val), 6) AS cv
               FROM ra2{j} a JOIN rs{j} r USING (vec_id) GROUP BY 1, 2),
    rd3{j} AS (SELECT r.vec_id, c.cid,
                      SUM((r.val - c.cv) * (r.val - c.cv)) AS d2
               FROM rs{j} r JOIN rc2{j} c USING (pos) GROUP BY 1, 2),
    ra3{j} AS (SELECT vec_id, cid FROM (
                 SELECT vec_id, cid,
                        ROW_NUMBER() OVER (PARTITION BY vec_id
                                           ORDER BY d2, cid) AS rn
                 FROM rd3{j}) WHERE rn = 1)"""


_IVFPQ_ADC_SQL = (
    """
    WITH pqinit AS (
      SELECT ROW_NUMBER() OVER (ORDER BY vec_id) AS cid, vec_id
      FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 4)),"""
    # coarse quantizer: the same kmeans chain over ALL 64 positions
    + _pq_sub_ctes("c", 1, 64)
    + """,
    res AS (
      SELECT p.vec_id, p.pos, p.val - cc.cv AS val
      FROM pec p
      JOIN a3c a ON a.vec_id = p.vec_id
      JOIN c2c cc ON cc.cid = a.cid AND cc.pos = p.pos),"""
    + ",".join([_ivfpq_res_ctes(1, 1, 32), _ivfpq_res_ctes(2, 33, 64)])
    + """,
    qprobe AS (
      SELECT query_id, cid AS cell FROM (
        SELECT t.query_id, t.cid,
               ROW_NUMBER() OVER (PARTITION BY t.query_id
                                  ORDER BY t.d, t.cid) AS pr
        FROM (SELECT p.vec_id AS query_id, cc.cid,
                     ROUND(SUM((p.val - cc.cv) * (p.val - cc.cv)), 6) AS d
              FROM pec p JOIN c2c cc ON cc.pos = p.pos
              WHERE p.vec_id % 100 = 0
              GROUP BY 1, 2) t) WHERE pr <= 2),
    qres AS (
      SELECT qp.query_id, qp.cell, p.pos, p.val - cc.cv AS val
      FROM qprobe qp
      JOIN pec p ON p.vec_id = qp.query_id
      JOIN c2c cc ON cc.cid = qp.cell AND cc.pos = p.pos),
    ld1 AS (
      SELECT r.query_id, r.cell, c.cid,
             ROUND(SUM((r.val - c.cv) * (r.val - c.cv)), 6) AS d
      FROM qres r JOIN rc21 c ON c.pos = r.pos
      WHERE r.pos BETWEEN 1 AND 32
      GROUP BY 1, 2, 3),
    ld2 AS (
      SELECT r.query_id, r.cell, c.cid,
             ROUND(SUM((r.val - c.cv) * (r.val - c.cv)), 6) AS d
      FROM qres r JOIN rc22 c ON c.pos = r.pos
      WHERE r.pos BETWEEN 33 AND 64
      GROUP BY 1, 2, 3),
    scored AS (
      SELECT qp.query_id, v.vec_id AS neighbor_id, l1.d + l2.d AS adist
      FROM a3c v
      JOIN ra31 k1 ON k1.vec_id = v.vec_id
      JOIN ra32 k2 ON k2.vec_id = v.vec_id
      JOIN qprobe qp ON qp.cell = v.cid
      JOIN ld1 l1 ON l1.query_id = qp.query_id AND l1.cell = qp.cell
                 AND l1.cid = k1.cid
      JOIN ld2 l2 ON l2.query_id = qp.query_id AND l2.cell = qp.cell
                 AND l2.cid = k2.cid
      WHERE v.vec_id <> qp.query_id)
    SELECT query_id, neighbor_id, CAST(rnk AS INT) AS rnk FROM (
      SELECT query_id, neighbor_id,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY adist, neighbor_id) AS rnk
      FROM scored) WHERE rnk <= 5
    """
)


@_q("ivfpq_knn_adc", _IVFPQ_ADC_SQL)
def ivfpq_knn_adc_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFADC (clustering.ivfpq_knn_adc): coarse Lloyd cells route the
    corpus into inverted lists, residuals against the cell centroid are
    product-quantized, and each query scores only its 2 probed cells via
    per-cell ADC lookup tables — the FAISS IVF-PQ serving composition.
    The oracle unrolls coarse training, residuals, both residual
    codebooks, probe selection, and the ADC ranking in one statement."""
    from open_ftth_relational_projector_spark.functions.clustering import (
        ivfpq_knn_adc,
    )

    emb = scattered(load_table(spark, sf_dir, "embeddings"))
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    return ivfpq_knn_adc(
        emb,
        queries,
        n_cells=4,
        m=2,
        k=4,
        iters=2,
        n_probe=2,
        knn_k=5,
        dim=64,
    )




# --- r5 continuation: closed-form distributed OLS ---------------------------

# the oracle splices the SAME solve text as the Spark path (imported
# constants), so the IEEE operation order over the exact decimal moments is
# identical by construction — betas match bit-for-bit before rounding
from open_ftth_relational_projector_spark.functions.regression import (  # noqa: E402
    OLS2_B0,
    OLS2_B1,
    OLS2_B2,
    OLS2_SSE,
    OLS2_SST,
    PIN_NOTNULL,
)

_OLS_MOMENTS_SQL = """
    m AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(CAST(SUM(x1) AS STRING) AS DOUBLE) AS s1,
             CAST(CAST(SUM(x2) AS STRING) AS DOUBLE) AS s2,
             CAST(CAST(SUM(y) AS STRING) AS DOUBLE) AS sy,
             CAST(CAST(SUM(x1 * x1) AS STRING) AS DOUBLE) AS s11,
             CAST(CAST(SUM(x1 * x2) AS STRING) AS DOUBLE) AS s12,
             CAST(CAST(SUM(x2 * x2) AS STRING) AS DOUBLE) AS s22,
             CAST(CAST(SUM(x1 * y) AS STRING) AS DOUBLE) AS s1y,
             CAST(CAST(SUM(x2 * y) AS STRING) AS DOUBLE) AS s2y,
             CAST(CAST(SUM(y * y) AS STRING) AS DOUBLE) AS syy
      FROM feat),
    beta AS (
      SELECT *, {b0} AS b0, {b1} AS b1, {b2} AS b2 FROM m),
    fit AS (
      SELECT n, b0, b1, b2, {sse} AS sse, {sst} AS sst FROM beta)
"""

_OLS_FEAT_SQL = """
    feat AS (
      SELECT CAST(l_quantity AS DECIMAL(19,4)) AS x1,
             CAST(p_retailprice AS DECIMAL(19,4)) AS x2,
             CAST(l_extendedprice AS DECIMAL(19,4)) AS y,
             l_suppkey
      FROM lineitem JOIN part ON l_partkey = p_partkey)
"""
# DECIMAL(19,4), not (18,4): DuckDB multiplies width-≤18 decimals in int64
# and range-errors on y*y (~1e18 at the 1e4 scale); width 19 forces the
# hugeint path → DECIMAL(38,8), still exact. Spark stays at (18,4)
# (products are decimal(37,8), exact) — both engines sum the identical
# exact values.

_OLS_MODEL_SQL = (
    "WITH" + _OLS_FEAT_SQL + "," + _OLS_MOMENTS_SQL.format(
        b0=OLS2_B0, b1=OLS2_B1, b2=OLS2_B2, sse=OLS2_SSE, sst=OLS2_SST
    )
    + """
    SELECT CAST(n AS BIGINT) AS n_rows,
           ROUND(b0, 6) + 0 AS beta0, ROUND(b1, 6) + 0 AS beta1,
           ROUND(b2, 6) + 0 AS beta2,
           ROUND(1 - sse / sst, 6) + 0 AS r2,
           ROUND(SQRT(sse / n), 4) AS rmse
    FROM fit
    """
)


@_q("ols_price_model", _OLS_MODEL_SQL)
def ols_price_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form OLS (functions/regression.ols2_fit): price ~ quantity +
    retailprice over lineitem⋈part. ONE distributed aggregation pass
    builds the exact-decimal moment matrix (order-independent sums → no
    cross-engine float drift), the 3×3 normal-equation solve is a literal
    expression over that one row, and R²/RMSE derive from the SAME
    moments — train + evaluate on any corpus size in one pass with O(d²)
    shuffle state. The oracle splices the identical solve text."""
    from open_ftth_relational_projector_spark.functions.regression import (
        ols2_fit,
    )

    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    feat = lineitem.join(
        part, lineitem["l_partkey"] == part["p_partkey"]
    ).select(
        F.col("l_quantity").alias("x1"),
        F.col("p_retailprice").alias("x2"),
        F.col("l_extendedprice").alias("y"),
    )
    fit = ols2_fit(feat, "x1", "x2", "y")
    return fit.select(
        F.col("n").cast("long").alias("n_rows"),
        F.round("b0", 6).alias("beta0"),
        F.round("b1", 6).alias("beta1"),
        F.round("b2", 6).alias("beta2"),
        F.round(F.lit(1.0) - F.col("sse") / F.col("sst"), 6).alias("r2"),
        F.round(F.sqrt(F.col("sse") / F.col("n")), 4).alias("rmse"),
    )


_OLS_RESID_SQL = (
    "WITH" + _OLS_FEAT_SQL + "," + _OLS_MOMENTS_SQL.format(
        b0=OLS2_B0, b1=OLS2_B1, b2=OLS2_B2, sse=OLS2_SSE, sst=OLS2_SST
    )
    + """
    SELECT n_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           ROUND(AVG(CAST(f.y AS DOUBLE)
                     - (fit.b0 + fit.b1 * CAST(f.x1 AS DOUBLE)
                               + fit.b2 * CAST(f.x2 AS DOUBLE))), 4)
             AS mean_resid,
           ROUND(SQRT(AVG(POW(CAST(f.y AS DOUBLE)
                     - (fit.b0 + fit.b1 * CAST(f.x1 AS DOUBLE)
                               + fit.b2 * CAST(f.x2 AS DOUBLE)), 2))), 4)
             AS rmse_resid
    FROM feat f CROSS JOIN fit
    JOIN supplier ON f.l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_name
    """
)


@_q("ols_residual_by_nation", _OLS_RESID_SQL)
def ols_residual_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-debug residual rollup: the one-row OLS fit broadcast onto a
    map-only scoring pass (functions/regression.ols2_residuals — no
    shuffle of the fact side beyond the nation rollup), residual
    mean/RMSE per supplier nation — the per-slice bias screen run after
    any closed-form fit. Nation/supplier dims broadcast."""
    from open_ftth_relational_projector_spark.functions.regression import (
        ols2_fit,
        ols2_residuals,
    )

    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    feat = lineitem.join(
        part, lineitem["l_partkey"] == part["p_partkey"]
    ).select(
        F.col("l_quantity").alias("x1"),
        F.col("p_retailprice").alias("x2"),
        F.col("l_extendedprice").alias("y"),
        "l_suppkey",
    )
    fit = ols2_fit(feat, "x1", "x2", "y")
    scored = ols2_residuals(feat, "x1", "x2", "y", fit)
    return (
        scored.join(
            F.broadcast(supplier.select("s_suppkey", "s_nationkey")),
            scored["l_suppkey"] == F.col("s_suppkey"),
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            _r4(F.avg("_resid")).alias("mean_resid"),
            _r4(F.sqrt(F.avg(F.pow(F.col("_resid"), 2)))).alias("rmse_resid"),
        )
    )


_NB_SQL = """
    WITH d AS MATERIALIZED (
      SELECT doc_id, lang, text,
             substr(md5(CAST(doc_id AS VARCHAR) || 'nb'), 1, 8)
               < 'b3333333' AS is_train
      FROM documents),
    tok AS (SELECT doc_id, lang, is_train,
                   UNNEST(string_split(text, ' ')) AS term FROM d),
    tokf AS MATERIALIZED (SELECT * FROM tok WHERE term <> ''),
    cls AS MATERIALIZED (
      SELECT lang AS cls, COUNT(*) AS tok_c
      FROM tokf WHERE is_train GROUP BY 1),
    nc AS (SELECT lang AS cls, COUNT(*) AS n_c FROM d WHERE is_train
           GROUP BY 1),
    voc AS (SELECT COUNT(DISTINCT term) AS v FROM tokf WHERE is_train),
    nt AS (SELECT COUNT(*) AS n FROM d WHERE is_train),
    classes AS MATERIALIZED (
      SELECT c.cls,
             CAST(ROUND(LN(1.0 / (c.tok_c + voc.v)), 6)
                  AS DECIMAL(18,6)) AS dflt,
             CAST(ROUND(LN(CAST(nc.n_c AS DOUBLE) / CAST(nt.n AS DOUBLE)), 6)
                  AS DECIMAL(18,6)) AS prior
      FROM cls c JOIN nc USING (cls) CROSS JOIN voc CROSS JOIN nt),
    cond AS MATERIALIZED (
      SELECT t.lang AS cls, t.term,
             CAST(ROUND(LN((COUNT(*) + 1.0) / (c.tok_c + voc.v)), 6)
                  AS DECIMAL(18,6)) AS ll
      FROM tokf t JOIN cls c ON c.cls = t.lang CROSS JOIN voc
      WHERE t.is_train GROUP BY t.lang, t.term, c.tok_c, voc.v),
    ts AS MATERIALIZED (
      SELECT t.doc_id, cl.cls, SUM(COALESCE(cond.ll, cl.dflt)) AS s
      FROM tokf t CROSS JOIN classes cl
      LEFT JOIN cond ON cond.cls = cl.cls AND cond.term = t.term
      WHERE NOT t.is_train
      GROUP BY 1, 2),
    sc AS MATERIALIZED (
      SELECT b.doc_id, b.lang AS true_label, cl.cls,
             cl.prior + COALESCE(ts.s, CAST(0 AS DECIMAL(18,6))) AS score
      FROM d b CROSS JOIN classes cl
      LEFT JOIN ts ON ts.doc_id = b.doc_id AND ts.cls = cl.cls
      WHERE NOT b.is_train),
    mx AS (SELECT doc_id, MAX(score) AS m FROM sc GROUP BY 1),
    pred AS (
      SELECT sc.doc_id, MAX(sc.true_label) AS true_label,
             MAX(sc.cls) AS pred_label
      FROM sc JOIN mx ON sc.doc_id = mx.doc_id AND sc.score = mx.m
      GROUP BY 1)
    SELECT true_label, pred_label, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM pred GROUP BY 1, 2
    """


@_q("nb_lang_confusion", _NB_SQL)
def nb_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial Naive Bayes language classifier with Laplace smoothing
    (functions/text.naive_bayes_confusion) — the fastText-shaped
    provenance/quality classifier of a curation pipeline: trained on an
    md5-deterministic ~70% split in ONE token-aggregation pass (the model
    is the vocab×classes log-likelihood table, broadcast), evaluated as a
    confusion matrix over the held-out 30%. Per-token log-likelihoods are
    rounded then summed as EXACT decimals, so scores and argmax
    tie-breaks are engine-identical; the oracle replays the identical
    split, smoothing, and tie rule."""
    from open_ftth_relational_projector_spark.functions.text import (
        naive_bayes_confusion,
    )

    return naive_bayes_confusion(
        scattered(load_table(spark, sf_dir, "documents"))
    )


from open_ftth_relational_projector_spark.functions.sampling import (  # noqa: E402
    poisson_weight_sql,
)

# the DuckDB-side 12-bit draw: block-derived like the Spark path — digest
# m = b//10 of the row key, 3 hex chars at offset (b%10)*3+1, an exact
# integer on 0..4095 in both engines
_BOOT_H = (
    "(('0x' || substr(md5(k || '#boot' || CAST(b // 10 AS VARCHAR)),"
    " (b % 10) * 3 + 1, 3))::BIGINT)"
)

_BOOT_SQL = f"""
    WITH r AS MATERIALIZED (
      SELECT l_returnflag AS flag,
             CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS vc,
             CAST(l_orderkey AS VARCHAR) || '-'
               || CAST(l_linenumber AS VARCHAR) AS k
      FROM lineitem),
    w AS MATERIALIZED (
      SELECT flag, vc, bs.b, {poisson_weight_sql(_BOOT_H)} AS w
      FROM r CROSS JOIN (SELECT UNNEST(range(40)) AS b) bs),
    bm AS (SELECT flag, b,
                  CAST(SUM(vc * w) AS DOUBLE) / SUM(w) / 100.0 AS m
           FROM w GROUP BY flag, b),
    rk AS (SELECT flag, m,
                  ROW_NUMBER() OVER (PARTITION BY flag ORDER BY m, b) AS rn
           FROM bm),
    base AS (SELECT flag, CAST(COUNT(*) AS BIGINT) AS n_rows,
                    ROUND(CAST(SUM(vc) AS DOUBLE) / COUNT(*) / 100.0, 4)
                      AS mean
             FROM r GROUP BY flag)
    SELECT base.flag AS l_returnflag, n_rows, mean,
           ROUND(MAX(CASE WHEN rn = 2 THEN m END), 4) AS ci_lo,
           ROUND(MAX(CASE WHEN rn = 39 THEN m END), 4) AS ci_hi
    FROM base JOIN rk USING (flag) GROUP BY 1, 2, 3
    """


@_q("bootstrap_revenue_ci", _BOOT_SQL)
def bootstrap_revenue_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson-bootstrap 95% CI for mean extended price per return flag
    (functions/sampling.poisson_bootstrap_ci): every row draws 40
    deterministic md5-derived Poisson(1) weights, ONE aggregation pass
    emits the 40 exact-decimal (Σwx, Σw) pairs per group, and the CI is
    order statistics of the sorted resample means — O(B) state per group
    at any corpus size, the one-scan uncertainty-quantification recipe.
    The oracle replays the weights row-exploded (toy scale) and the
    identical order-statistic rule; exact decimal sums make the 40 means
    bit-identical cross-engine."""
    from open_ftth_relational_projector_spark.functions.sampling import (
        poisson_bootstrap_ci,
    )

    # scattered: the per-row work (4 md5 + 8 hex parses + a 40-wide
    # explode) dwarfs the scan, and the single-file local scan yields
    # 2-3 partitions — the same compute-parallelism trap the shingling
    # queries hit (sources/tables.scattered docstring)
    li = scattered(load_table(spark, sf_dir, "lineitem"))
    return poisson_bootstrap_ci(
        li,
        value_col="l_extendedprice",
        key_expr=(
            "concat(CAST(l_orderkey AS STRING), '-',"
            " CAST(l_linenumber AS STRING))"
        ),
        group_cols=["l_returnflag"],
        n_resamples=40,
    )


from open_ftth_relational_projector_spark.functions.sampling import (  # noqa: E402
    two_sided_p_sql,
)

# shared formula text: per-nation vs rest-of-world two-sample z on the
# mean, population variances from (n, Σv, Σv²). The moment sums are EXACT
# DECIMAL(18,4)-derived aggregates (summation-order-independent, so both
# engines hold bit-identical sums by construction — the regression.py
# contract); they convert to DOUBLE only here, at the ratio stage, and the
# rest-of-world stats subtract ON THE DECIMALS before that conversion.
_FDR_STATS_LIST = [
    "n1",
    "CAST(CAST(s1d AS STRING) AS DOUBLE) / n1 AS m1",
    "CAST(CAST(ss1d AS STRING) AS DOUBLE) / n1"
    " - (CAST(CAST(s1d AS STRING) AS DOUBLE) / n1) * (CAST(CAST(s1d AS STRING) AS DOUBLE) / n1) AS v1",
    "nt - n1 AS n2",
    "CAST(CAST(std - s1d AS STRING) AS DOUBLE) / (nt - n1) AS m2",
    "CAST(CAST(sstd - ss1d AS STRING) AS DOUBLE) / (nt - n1)"
    " - (CAST(CAST(std - s1d AS STRING) AS DOUBLE) / (nt - n1))"
    " * (CAST(CAST(std - s1d AS STRING) AS DOUBLE) / (nt - n1)) AS v2",
]
_FDR_STATS = ", ".join(_FDR_STATS_LIST)
_FDR_Z = "ROUND((m1 - m2) / sqrt(v1 / n1 + v2 / n2), 6)"
_FDR_Q = 0.1

# DECIMAL(19,4) on the DuckDB side, not (18,4): width ≤ 18 multiplies in
# int64 and overflows; 19 forces the hugeint path → exact DECIMAL(38,8).
# Spark keeps (18,4); the aggregated VALUES are identical either way.
_FDR_SQL = f"""
    WITH f AS MATERIALIZED (
      SELECT n_name, CAST(l_extendedprice AS DECIMAL(19,4)) AS v
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey),
    per AS MATERIALIZED (
      SELECT n_name, CAST(COUNT(*) AS DOUBLE) AS n1,
             SUM(v) AS s1d, SUM(v * v) AS ss1d
      FROM f GROUP BY n_name),
    tot AS (SELECT SUM(n1) AS nt, SUM(s1d) AS std, SUM(ss1d) AS sstd
            FROM per),
    stats AS (SELECT n_name, {_FDR_STATS} FROM per CROSS JOIN tot),
    zt AS MATERIALIZED (
      SELECT n_name, n1, {_FDR_Z} AS z FROM stats),
    pt AS MATERIALIZED (
      SELECT n_name, n1, z, {two_sided_p_sql('abs(z)')} AS p FROM zt),
    rk AS MATERIALIZED (
      SELECT a.n_name, a.n1, a.z, a.p,
             1 + CAST(SUM(CASE WHEN b.p < a.p
                          OR (b.p = a.p AND b.n_name < a.n_name)
                          THEN 1 ELSE 0 END) AS INT) AS bh_rank
      FROM pt a CROSS JOIN pt b
      GROUP BY a.n_name, a.n1, a.z, a.p),
    m AS (SELECT CAST(COUNT(*) AS DOUBLE) AS m FROM rk),
    kstar AS (
      SELECT COALESCE(MAX(CASE WHEN p <= {_FDR_Q} * bh_rank / m.m
                           THEN bh_rank END), 0) AS k
      FROM rk CROSS JOIN m)
    SELECT rk.n_name, CAST(rk.n1 AS BIGINT) AS n_rows,
           ROUND(rk.z, 4) AS z, rk.p, rk.bh_rank,
           rk.bh_rank <= kstar.k AS significant
    FROM rk CROSS JOIN kstar
    """


@_q("ab_tests_fdr_nations", _FDR_SQL)
def ab_tests_fdr_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Many simultaneous hypothesis tests with multiple-testing control:
    per supplier nation, a two-sample z-test of mean extended price vs
    the rest of the corpus (rest-stats derived by SUBTRACTION from one
    grouped pass — no second scan), then Benjamini-Hochberg step-up at
    q=0.1 across the 25 tests. One fact scan; the BH step runs on the
    25-row test table via a window-free rank join + scalar k*. The moment
    sums (Σv, Σv²) accumulate as exact DECIMAL(18,4)-derived aggregates —
    summation-order-independent, so both engines hold bit-identical z
    inputs BY CONSTRUCTION (the regression.py contract), not merely with
    high probability; the decimals convert to DOUBLE only at the ratio
    stage, the normal CDF is a shared-text polynomial
    (functions/sampling.PHI_ABS_SQL), and z rounds to 6 dp before it, so
    p-values and the BH decision replay identically in the oracle."""
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    f = (
        li.join(
            F.broadcast(supplier.select("s_suppkey", "s_nationkey")),
            li["l_suppkey"] == F.col("s_suppkey"),
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .selectExpr("n_name", "CAST(l_extendedprice AS DECIMAL(18,4)) AS v")
    )
    per = f.groupBy("n_name").agg(
        F.count(F.lit(1)).cast("double").alias("n1"),
        F.sum("v").alias("s1d"),
        F.sum(F.expr("v * v")).alias("ss1d"),
    )
    tot = per.agg(
        F.sum("n1").alias("nt"), F.sum("s1d").alias("std"),
        F.sum("ss1d").alias("sstd"),
    )
    stats = per.crossJoin(F.broadcast(tot)).selectExpr(
        "n_name", *_FDR_STATS_LIST
    )
    zt = stats.selectExpr("n_name", "n1", f"{_FDR_Z} AS z")
    pt = zt.selectExpr(
        "n_name", "n1", "z", f"{two_sided_p_sql('abs(z)')} AS p"
    )
    a, b_ = pt.alias("a"), pt.selectExpr(
        "n_name AS bn", "p AS bp"
    ).alias("b")
    rk = (
        a.crossJoin(F.broadcast(b_))
        .groupBy("a.n_name", "a.n1", "a.z", "a.p")
        .agg(
            (
                F.lit(1)
                + F.sum(
                    F.when(
                        (F.col("bp") < F.col("a.p"))
                        | (
                            (F.col("bp") == F.col("a.p"))
                            & (F.col("bn") < F.col("a.n_name"))
                        ),
                        1,
                    ).otherwise(0)
                )
            ).cast("int").alias("bh_rank")
        )
    )
    m = rk.agg(F.count(F.lit(1)).cast("double").alias("m"))
    kstar = (
        rk.crossJoin(F.broadcast(m))
        .agg(
            F.coalesce(
                F.max(
                    F.when(
                        F.col("p")
                        <= F.lit(_FDR_Q) * F.col("bh_rank") / F.col("m"),
                        F.col("bh_rank"),
                    )
                ),
                F.lit(0),
            ).alias("k")
        )
    )
    return rk.crossJoin(F.broadcast(kstar)).select(
        "n_name",
        F.col("n1").cast("long").alias("n_rows"),
        F.round("z", 4).alias("z"),
        "p",
        "bh_rank",
        (F.col("bh_rank") <= F.col("k")).alias("significant"),
    )


# --- r6: robust (winsorized/trimmed) statistics ------------------------------

_WINSOR_SQL = """
    WITH li AS (SELECT l_returnflag AS flag, CAST(l_extendedprice AS DOUBLE) AS v
                FROM lineitem),
    pct AS (
      SELECT flag, CAST(COUNT(*) AS BIGINT) AS n_rows,
             ROUND(quantile_cont(v, 0.05), 6) AS p05,
             ROUND(quantile_cont(v, 0.95), 6) AS p95
      FROM li GROUP BY flag),
    cl AS (
      SELECT li.flag, pct.n_rows, pct.p05, pct.p95,
             CAST(ROUND(LEAST(GREATEST(li.v, pct.p05), pct.p95), 6)
                  AS DECIMAL(19,6)) AS w,
             li.v BETWEEN pct.p05 AND pct.p95 AS inside,
             CAST(ROUND(li.v, 6) AS DECIMAL(19,6)) AS vd
      FROM li JOIN pct USING (flag))
    SELECT flag AS l_returnflag, n_rows, p05, p95,
           ROUND(CAST(SUM(w) AS DOUBLE) / n_rows, 4) AS winsorized_mean,
           CAST(SUM(CASE WHEN inside THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           ROUND(CAST(SUM(CASE WHEN inside THEN vd END) AS DOUBLE)
                 / SUM(CASE WHEN inside THEN 1 ELSE 0 END), 4) AS trimmed_mean
    FROM cl GROUP BY 1, 2, 3, 4
    """


@_q("winsorized_price_stats", _WINSOR_SQL)
def winsorized_price_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-group statistics: 5/95% winsorized mean (tails clamped
    to the percentiles) and trimmed mean (tails dropped) of extended
    price per return flag — the outlier-resistant summary a corpus-stats
    pass reports instead of a raw mean. Two passes by nature (percentile,
    then clamp). Stage 1 is the grouped hierarchical-rank exact quantile
    (operators/quantiles.exact_quantiles — bit-identical to the exact
    `percentile` aggregate, but range-sharded instead of buffering each
    data-proportional flag group in one aggregation state); the clamp
    stage is map-side either way. Determinism by
    construction: 2-dp inputs make every interpolated percentile a ≤4-dp
    real (never on a 6-dp rounding boundary), and the clamped values are
    rounded to 6 dp then summed as exact DECIMAL(19,6) on BOTH sides —
    no cross-engine summation-order hazard."""
    from open_ftth_relational_projector_spark.operators.quantiles import (
        exact_quantiles,
    )

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_extendedprice").cast("double").alias("v"),
    )
    pct = exact_quantiles(
        li, "v", {"p05": 0.05, "p95": 0.95}, group_cols=["flag"],
        count_col="n_rows",
    ).select(
        "flag",
        "n_rows",
        F.round(F.col("p05"), 6).alias("p05"),
        F.round(F.col("p95"), 6).alias("p95"),
    )
    cl = li.join(F.broadcast(pct), "flag").selectExpr(
        "flag",
        "n_rows",
        "p05",
        "p95",
        "CAST(ROUND(LEAST(GREATEST(v, p05), p95), 6) AS DECIMAL(19,6)) AS w",
        "v BETWEEN p05 AND p95 AS inside",
        "CAST(ROUND(v, 6) AS DECIMAL(19,6)) AS vd",
    )
    return cl.groupBy("flag", "n_rows", "p05", "p95").agg(
        F.round(
            F.sum("w").cast("double") / F.col("n_rows"), 4
        ).alias("winsorized_mean"),
        F.sum(F.when(F.col("inside"), 1).otherwise(0)).alias("n_kept"),
        F.round(
            F.sum(F.when(F.col("inside"), F.col("vd"))).cast("double")
            / F.sum(F.when(F.col("inside"), 1).otherwise(0)),
            4,
        ).alias("trimmed_mean"),
    ).withColumnRenamed("flag", "l_returnflag")


# --- r6: one-pass correlation matrix ----------------------------------------

_CORR_VARS = {"q": "l_quantity", "p": "l_extendedprice", "d": "l_discount",
              "t": "l_tax"}
_CORR_PAIRS = [("q", "p"), ("q", "d"), ("q", "t"), ("p", "d"), ("p", "t"),
               ("d", "t")]


def _round_norm(expr: str, digits: int) -> str:
    """ROUND normalized through ``+ 0`` so IEEE -0.0 becomes +0.0.

    Spark's ROUND goes through BigDecimal and always returns +0.0 for a
    tiny negative input, while DuckDB's ROUND(double) preserves the sign
    bit (-0.0) — the r7 driver hash fail on correlation_matrix_lineitem
    was exactly one such cell. ``x + 0`` is a no-op on every nonzero
    double and maps -0.0 to +0.0 on both engines (IEEE 754 addition), so
    the shared formula text stays engine-identical AND sign-normalized.
    """
    return f"(ROUND({expr}, {digits}) + 0)"


def _corr_exprs(x: str, y: str) -> tuple[str, str]:
    """Shared covariance/correlation text over the exact-decimal moment
    sums (converted to DOUBLE only here, the regression.py contract)."""
    n = "CAST(n AS DOUBLE)"
    sx = f"CAST(CAST(s_{x} AS STRING) AS DOUBLE)"
    sy = f"CAST(CAST(s_{y} AS STRING) AS DOUBLE)"
    sxy = f"CAST(CAST(s_{x}{y} AS STRING) AS DOUBLE)"
    sxx = f"CAST(CAST(s_{x}{x} AS STRING) AS DOUBLE)"
    syy = f"CAST(CAST(s_{y}{y} AS STRING) AS DOUBLE)"
    cov = f"({sxy} / {n} - ({sx} / {n}) * ({sy} / {n}))"

    def var(s1, s2):
        return f"({s2} / {n} - ({s1} / {n}) * ({s1} / {n}))"

    corr = f"({cov} / sqrt({var(sx, sxx)} * {var(sy, syy)}))"
    return cov, corr


def _corr_moment_exprs(dec: str) -> list[str]:
    exprs = []
    ks = list(_CORR_VARS)
    for k in ks:
        exprs.append(f"SUM(CAST({_CORR_VARS[k]} AS {dec})) AS s_{k}")
    for i, x in enumerate(ks):
        for y in ks[i:]:
            exprs.append(
                f"SUM(CAST({_CORR_VARS[x]} AS {dec})"
                f" * CAST({_CORR_VARS[y]} AS {dec})) AS s_{x}{y}"
            )
    return exprs


def _corr_sql() -> str:
    moments = ",\n             ".join(_corr_moment_exprs("DECIMAL(19,4)"))
    branches = []
    for x, y in _CORR_PAIRS:
        cov, corr = _corr_exprs(x, y)
        branches.append(
            f"SELECT l_returnflag, '{_CORR_VARS[x]}' AS var_x,"
            f" '{_CORR_VARS[y]}' AS var_y,"
            f" {_round_norm(cov, 6)} AS covariance,"
            f" {_round_norm(corr, 6)} AS corr"
            " FROM m"
        )
    body = "\n    UNION ALL\n    ".join(branches)
    return f"""
    WITH m AS (
      SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
             {moments}
      FROM lineitem GROUP BY l_returnflag)
    {body}
    """


@_q("correlation_matrix_lineitem", _corr_sql())
def correlation_matrix_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation + covariance of the four lineitem
    measures per return flag, from ONE map-side-combined aggregation pass
    (15 exact-DECIMAL moment sums per group — the d² one-pass recipe that
    scales to any corpus size; the 6-pair unpivot runs on the 3-row moment
    table). Moments are summation-order-independent by the decimal
    contract, and both engines apply the identical shared formula text, so
    every correlation replays bit-identically in the oracle."""
    li = load_table(spark, sf_dir, "lineitem")
    per = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        # Spark stays at DECIMAL(18,4); the oracle widens to (19,4) only to
        # force DuckDB's hugeint multiply path — identical values either way
        *[F.expr(e) for e in _corr_moment_exprs("DECIMAL(18,4)")],
    )
    out = None
    for x, y in _CORR_PAIRS:
        cov, corr = _corr_exprs(x, y)
        branch = per.selectExpr(
            "l_returnflag",
            f"'{_CORR_VARS[x]}' AS var_x",
            f"'{_CORR_VARS[y]}' AS var_y",
            f"{_round_norm(cov, 6)} AS covariance",
            f"{_round_norm(corr, 6)} AS corr",
        )
        out = branch if out is None else out.unionByName(branch)
    return out


# --- r6: equi-depth histogram without a single-task window -------------------

_EQUIDEPTH_SQL = """
    WITH li AS (SELECT CAST(l_extendedprice AS DOUBLE) AS v,
                       l_orderkey AS k1, l_linenumber AS k2
                FROM lineitem),
    r AS (SELECT v, ROW_NUMBER() OVER (ORDER BY v, k1, k2) AS rn FROM li),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM li)
    SELECT CAST(((rn - 1) * 10) // n AS INT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           ROUND(MIN(v), 2) AS lo, ROUND(MAX(v), 2) AS hi
    FROM r CROSS JOIN n
    GROUP BY 1
    """


@_q("equidepth_price_bins", _EQUIDEPTH_SQL)
def equidepth_price_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (equal-count) 10-bucket histogram of extended price —
    the optimizer/data-profiling histogram form equi-width bins can't
    give on skewed data. The exact global rank comes from
    operators.hierarchical_row_number (range-sharded, broadcast offsets)
    instead of `ROW_NUMBER() OVER (ORDER BY ...)`, so no single task ever
    sees the whole corpus; ties split deterministically by the (orderkey,
    linenumber) tiebreak, and bucket = ((rank−1)·10) div n is exact
    integer arithmetic on both engines."""
    from open_ftth_relational_projector_spark.operators.hierarchical import (
        hierarchical_row_number,
    )

    li = load_table(spark, sf_dir, "lineitem").selectExpr(
        "CAST(l_extendedprice AS DOUBLE) AS v",
        "l_orderkey AS k1",
        "l_linenumber AS k2",
    )
    r = hierarchical_row_number(
        li, [F.col("v"), F.col("k1"), F.col("k2")], "rn"
    )
    cnt = li.agg(F.count(F.lit(1)).alias("n"))
    return (
        r.crossJoin(F.broadcast(cnt))
        .selectExpr("v", "CAST(((rn - 1) * 10) div n AS INT) AS bucket")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.min("v"), 2).alias("lo"),
            F.round(F.max("v"), 2).alias("hi"),
        )
    )


# --- r6: one-pass k-fold cross-validation ------------------------------------

_KFOLD_KEY_SQL = (
    "CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR)"
)
_KFOLD_KEY_SPARK = (
    "concat(CAST(l_orderkey AS STRING), '-', CAST(l_linenumber AS STRING))"
)


def _kfold_sql() -> str:
    from open_ftth_relational_projector_spark.functions.regression import (
        OLS2_MOMENT_EXPRS,
        fold_expr_sql,
    )

    f_sums = ",\n             ".join(
        f"SUM({e}) AS f_{m}" for m, e in OLS2_MOMENT_EXPRS.items()
    )
    t_sums = ", ".join(f"SUM(f_{m}) AS t_{m}" for m in OLS2_MOMENT_EXPRS)
    train_cols = ",\n             ".join(
        f"CAST(CAST(t_{m} - f_{m} AS STRING) AS DOUBLE) AS {m}" for m in OLS2_MOMENT_EXPRS
    )
    test_cols = ",\n             ".join(
        f"CAST(CAST(f_{m} AS STRING) AS DOUBLE) AS tf_{m}" for m in OLS2_MOMENT_EXPRS
    )
    test_renames = ", ".join(f"tf_{m} AS {m}" for m in OLS2_MOMENT_EXPRS)
    return f"""
    WITH feats AS (
      SELECT CAST(l_quantity AS DECIMAL(19,4)) AS x1d,
             CAST(p_retailprice AS DECIMAL(19,4)) AS x2d,
             CAST(l_extendedprice AS DECIMAL(19,4)) AS yd,
             {fold_expr_sql(_KFOLD_KEY_SQL, 5)} AS fold
      FROM lineitem JOIN part ON l_partkey = p_partkey),
    per AS (
      SELECT fold, CAST(COUNT(*) AS DOUBLE) AS fn,
             {f_sums}
      FROM feats GROUP BY fold),
    tot AS (SELECT SUM(fn) AS tn, {t_sums} FROM per),
    train AS (
      SELECT fold, tn - fn AS n, fn AS n_test_d,
             {train_cols},
             {test_cols}
      FROM per CROSS JOIN tot),
    fitted AS (
      SELECT *, {OLS2_B0} AS b0, {OLS2_B1} AS b1, {OLS2_B2} AS b2
      FROM train),
    test AS (
      SELECT fold, b0, b1, b2,
             CAST(n AS BIGINT) AS n_train, CAST(n_test_d AS BIGINT) AS n_test,
             n_test_d AS n, {test_renames}
      FROM fitted)
    SELECT fold, n_train, n_test,
           ROUND(b0, 6) + 0 AS b0, ROUND(b1, 6) + 0 AS b1, ROUND(b2, 6) + 0 AS b2,
           ROUND(1.0 - {OLS2_SSE} / {OLS2_SST}, 4) + 0 AS r2_oof,
           ROUND(sqrt(GREATEST({OLS2_SSE}, 0.0) / n), 4) AS rmse_oof
    FROM test
    """


@_q("ols_crossval_kfold", _kfold_sql())
def ols_crossval_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-fold cross-validation of the price model in ONE distributed pass
    (functions/regression.ols2_kfold): per-fold exact-decimal moments from
    one grouped aggregation, train moments for each fold by SUBTRACTION
    from the totals (complement = total − fold, exact on decimals), betas
    from the closed-form solve on the complement, and the out-of-fold
    R²/RMSE evaluated on the held-out fold's own moments via the same
    SSE identity — model VALIDATION at corpus scale with no second scan
    and no scoring pass. Folds are md5-bucketed on the line key, so
    membership, moments, betas, and OOF metrics all replay bit-identically
    in the oracle."""
    from open_ftth_relational_projector_spark.functions.regression import (
        ols2_kfold,
    )

    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    feats = li.join(
        F.broadcast(part.select("p_partkey", "p_retailprice")),
        li["l_partkey"] == F.col("p_partkey"),
    )
    return ols2_kfold(
        feats,
        x1="l_quantity",
        x2="p_retailprice",
        y="l_extendedprice",
        key_expr=_KFOLD_KEY_SPARK,
        k=5,
    )


# --- r6: split-conformal prediction intervals --------------------------------

def _conformal_sql() -> str:
    from open_ftth_relational_projector_spark.functions.regression import (
        OLS2_MOMENT_EXPRS,
        fold_expr_sql,
    )

    sums = ",\n             ".join(
        f"CAST(CAST(SUM(CASE WHEN fold >= 2 THEN {e} END) AS STRING) AS DOUBLE) AS {m}"
        for m, e in OLS2_MOMENT_EXPRS.items()
    )
    return f"""
    WITH feats AS (
      SELECT CAST(l_quantity AS DECIMAL(19,4)) AS x1d,
             CAST(p_retailprice AS DECIMAL(19,4)) AS x2d,
             CAST(l_extendedprice AS DECIMAL(19,4)) AS yd,
             {fold_expr_sql(_KFOLD_KEY_SQL, 5)} AS fold
      FROM lineitem JOIN part ON l_partkey = p_partkey),
    m AS (
      SELECT CAST(SUM(CASE WHEN fold >= 2 THEN 1 ELSE 0 END) AS DOUBLE) AS n,
             {sums}
      FROM feats),
    beta AS (SELECT n, {OLS2_B0} AS b0, {OLS2_B1} AS b1, {OLS2_B2} AS b2
             FROM m),
    scored AS (
      SELECT fold,
             ROUND(ABS(CAST(yd AS DOUBLE)
                       - (b0 + b1 * CAST(x1d AS DOUBLE)
                          + b2 * CAST(x2d AS DOUBLE))), 6) AS ar
      FROM feats CROSS JOIN beta WHERE fold <= 1),
    q AS (SELECT quantile_cont(ar, 0.9) AS q90,
                 CAST(COUNT(*) AS BIGINT) AS n_calib
          FROM scored WHERE fold = 0),
    t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_test,
                 CAST(SUM(CASE WHEN ar <= (SELECT q90 FROM q)
                          THEN 1 ELSE 0 END) AS BIGINT) AS n_covered
          FROM scored WHERE fold = 1)
    SELECT CAST(beta.n AS BIGINT) AS n_train, q.n_calib, t.n_test,
           ROUND(beta.b0, 6) + 0 AS b0, ROUND(beta.b1, 6) + 0 AS b1,
           ROUND(beta.b2, 6) + 0 AS b2,
           ROUND(q.q90, 4) AS q90_width,
           ROUND(CAST(t.n_covered AS DOUBLE) / t.n_test, 4) AS test_coverage
    FROM beta CROSS JOIN q CROSS JOIN t
    """


@_q("ols_conformal_intervals", _conformal_sql())
def ols_conformal_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction intervals for the price model: train on
    md5-folds 2-4 (exact-decimal moments, CASE-gated inside ONE
    aggregation pass), calibrate the 90% absolute-residual quantile on
    fold 0, and report honest empirical coverage on the untouched fold 1
    — the distribution-free uncertainty wrapper a model-serving pipeline
    attaches to any regressor. Two passes total (moments; then a map-only
    scoring pass with the betas broadcast feeding two scalar aggregates).
    Residuals round to 6 dp before the quantile, so the interpolated q90
    and the coverage count replay identically in the oracle."""
    from open_ftth_relational_projector_spark.functions.regression import (
        OLS2_B0,
        OLS2_B1,
        OLS2_B2,
        OLS2_MOMENT_EXPRS,
        _DEC,
        fold_expr_spark,
    )

    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    feats = li.join(
        F.broadcast(part.select("p_partkey", "p_retailprice")),
        li["l_partkey"] == F.col("p_partkey"),
    ).selectExpr(
        f"CAST(l_quantity AS {_DEC}) AS x1d",
        f"CAST(p_retailprice AS {_DEC}) AS x2d",
        f"CAST(l_extendedprice AS {_DEC}) AS yd",
        f"{fold_expr_spark(_KFOLD_KEY_SPARK, 5)} AS fold",
    )
    m = feats.agg(
        F.expr(
            "CAST(SUM(CASE WHEN fold >= 2 THEN 1 ELSE 0 END) AS DOUBLE)"
        ).alias("n"),
        *[
            # same text as the oracle's train-moment conversion: string
            # roundtrip = correctly-rounded DECIMAL→DOUBLE on both engines
            # (dec2dbl_sql rationale in functions/regression.py)
            F.expr(
                f"CAST(CAST(SUM(CASE WHEN fold >= 2 THEN {e} END)"
                " AS STRING) AS DOUBLE)"
            ).alias(mm)
            for mm, e in OLS2_MOMENT_EXPRS.items()
        ],
    )
    beta = m.selectExpr(
        "n", f"{OLS2_B0} AS b0", f"{OLS2_B1} AS b1", f"{OLS2_B2} AS b2"
    )
    scored = (
        feats.filter("fold <= 1")
        .crossJoin(F.broadcast(beta))
        .selectExpr(
            "fold",
            "ROUND(ABS(CAST(yd AS DOUBLE)"
            " - (b0 + b1 * CAST(x1d AS DOUBLE)"
            " + b2 * CAST(x2d AS DOUBLE))), 6) AS ar",
        )
    )
    # consumed by the calib quantile AND the test coverage; tracked (r13):
    # released by the caller loop after the consuming action
    scored = tracked_persist(scored)
    # calib-fold q90 via the hierarchical-rank exact quantile: the calib
    # fold is corpus/5-sized, so the exact `percentile` aggregate would
    # buffer it in ONE aggregation state at 100× — exact_quantiles is
    # bit-identical with range-sharded state ('ar' is never null, so
    # count_col == COUNT(*)).
    from open_ftth_relational_projector_spark.operators.quantiles import (
        exact_quantiles,
    )

    # Left-join against a constant-true condition (not crossJoin): on an
    # empty calibration fold exact_quantiles yields ZERO rows where the
    # old global aggregate yielded one (null q90, n_calib 0) — the left
    # join + coalesce restores that shape so the query and its oracle
    # (whose aggregate CTEs always produce a row) stay row-for-row equal
    # on any fold-hash outcome.
    q = exact_quantiles(
        scored.filter("fold = 0"), "ar", {"q90": 0.9}, count_col="n_calib"
    )
    q = (
        spark.range(1)
        .join(F.broadcast(q), F.lit(True), "left")
        .select(
            "q90", F.coalesce("n_calib", F.lit(0)).cast("long").alias("n_calib")
        )
    )
    t = (
        scored.filter("fold = 1")
        .crossJoin(F.broadcast(q.select("q90")))
        .agg(
            F.count(F.lit(1)).alias("n_test"),
            F.sum(F.when(F.col("ar") <= F.col("q90"), 1).otherwise(0)).alias(
                "n_covered"
            ),
        )
    )
    # constants come from the 1-row beta frame, not a limit(1) over the
    # corpus-sized scored frame — cheaper, and it matches the oracle's
    # FROM beta CROSS JOIN shape even when the calib/test folds are empty
    one = beta.selectExpr("CAST(n AS BIGINT) AS n_train", "b0", "b1", "b2")
    return (
        one.crossJoin(F.broadcast(q))
        .crossJoin(F.broadcast(t))
        .selectExpr(
            "n_train",
            "n_calib",
            "n_test",
            "ROUND(b0, 6) + 0 AS b0",
            "ROUND(b1, 6) + 0 AS b1",
            "ROUND(b2, 6) + 0 AS b2",
            "ROUND(q90, 4) AS q90_width",
            "ROUND(CAST(n_covered AS DOUBLE) / n_test, 4) AS test_coverage",
        )
    )


# ---------------------------------------------------------------------------
# Logistic regression (IRLS) — quality-classifier training
# ---------------------------------------------------------------------------

# Engine-shared per-row texts for the language classifier over documents:
# label = doc is English; features = length (kilochars) + space ratio —
# the CCNet/fastText curation-filter shape. Every op is a single IEEE op
# per row; the pin helpers make the state integer from here on.
_LOGREG_Y = "CASE WHEN lang = 'en' THEN 1 ELSE 0 END"
# 1e3 (not 1000.0): a bare decimal literal parses as DECIMAL in Spark
# but drives DOUBLE division in DuckDB — the exponent form keeps the
# whole per-row chain DOUBLE on both engines (r8 shared-text convention)
_LOGREG_X1 = "n_chars / 1e3"
_LOGREG_X2 = (
    "(LENGTH(text) - LENGTH(REPLACE(text, ' ', '')))"
    " / CAST(LENGTH(text) AS DOUBLE)"
)
_LOGREG_WHERE = "LENGTH(text) > 0"


def _pinned_rows_cte(lead: str = "", extra: str = "") -> str:
    """THE classifier-family rows CTE — one shared definition for every
    family oracle (logreg fit / k-fold / stump / depth-2 tree / WOE /
    AdaBoost / grouped AdaBoost / grouped logreg / Naive Bayes): the
    pinned (y, x1, x2) document projection with the PIN_NOTNULL filter
    hoisted OUTSIDE the pin subquery, exactly the shape of every fit's
    pinned frame (functions/regression.py PIN_NOTNULL — shared text).
    Hoisting it into ONE helper closes the advisory class permanently:
    an edit to the pinned projection reaches all 13+ family oracles at
    once, so sibling CTEs cannot drift (r9 advisory; its 10-parallel-
    sites closure was flagged again in r10 as re-openable).

    ``lead`` prepends select columns ('source AS g, '); ``extra``
    appends them (', CAST(... ) AS fold')."""
    from open_ftth_relational_projector_spark.functions.regression import (
        logreg_xpin_sql,
    )

    return f"""rows AS (SELECT * FROM (SELECT {lead}{_LOGREG_Y} AS y,
                   {logreg_xpin_sql(_LOGREG_X1)} AS x1,
                   {logreg_xpin_sql(_LOGREG_X2)} AS x2{extra}
            FROM documents WHERE {_LOGREG_WHERE}) pinraw
            WHERE {PIN_NOTNULL})"""


def _logreg_sql() -> str:
    """Unrolled 3-step IRLS oracle built FROM the functions/regression
    logreg_* helpers (twin by construction — the r8 integer-state
    convention, see functions/factorization.py and graph.pagerank)."""
    from open_ftth_relational_projector_spark.functions.regression import (
        LOGREG_MOMENTS,
        OLS2_B0,
        OLS2_B1,
        OLS2_B2,
        dec2dbl_sql,
        logreg_beta_out_sql,
        logreg_moment_exprs,
        logreg_p_sql,
        logreg_update_sql,
        logreg_z_sql,
    )

    z = logreg_z_sql("bi0", "bi1", "bi2", "x1", "x2")
    parts = [
        _pinned_rows_cte(),
        """b0 AS (SELECT CAST(0 AS BIGINT) AS bi0,
                  CAST(0 AS BIGINT) AS bi1, CAST(0 AS BIGINT) AS bi2)""",
    ]
    for i in (1, 2, 3):
        p = i - 1
        moments = ", ".join(logreg_moment_exprs())
        dbl = ", ".join(f"{dec2dbl_sql(m)} AS {m}" for m in LOGREG_MOMENTS)
        parts.append(
            f"""s{i} AS (SELECT y, x1, x2, {logreg_p_sql(z)} AS pi
                FROM rows CROSS JOIN b{p})"""
        )
        parts.append(f"mr{i} AS (SELECT {moments} FROM s{i})")
        parts.append(f"m{i} AS (SELECT {dbl} FROM mr{i})")
        parts.append(
            f"""b{i} AS (SELECT {logreg_update_sql('bi0', OLS2_B0)} AS bi0,
                   {logreg_update_sql('bi1', OLS2_B1)} AS bi1,
                   {logreg_update_sql('bi2', OLS2_B2)} AS bi2
                FROM m{i} CROSS JOIN b{p})"""
        )
    return (
        "WITH "
        + ",\n    ".join(parts)
        + f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(y) AS BIGINT) AS n_pos,
           {logreg_beta_out_sql('bi0')} AS b0,
           {logreg_beta_out_sql('bi1')} AS b1,
           {logreg_beta_out_sql('bi2')} AS b2,
           ROUND(SUM(CASE WHEN ({z} > 0) = (y = 1) THEN 1 ELSE 0 END)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS accuracy
    FROM rows CROSS JOIN b3
    GROUP BY bi0, bi1, bi2
    """
    )


@_q("logreg_lang_classifier", _logreg_sql())
def logreg_lang_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed logistic regression (3 unrolled IRLS/Newton steps) for
    the is-English quality-classifier over documents — one exact-integer
    aggregation pass per iteration + a closed-form 3×3 solve reusing the
    OLS adjugate text (functions/regression.logreg_fit_irls). Reports the
    raw-basis betas and the EXACT 0.5-threshold training accuracy (the
    decision is an integer-logit sign test). Scale: per iteration one
    map-only scoring pass + one map-side-combined 9-value aggregation —
    O(d²) state at any corpus size."""
    from open_ftth_relational_projector_spark.functions.regression import (
        logreg_fit_irls,
        logreg_summary,
    )

    docs = load_table(spark, sf_dir, "documents")
    pinned, beta = logreg_fit_irls(
        docs, _LOGREG_X1, _LOGREG_X2, _LOGREG_Y, iters=3, where=_LOGREG_WHERE
    )
    return logreg_summary(pinned, beta)


def _logreg_score_sql() -> str:
    """Scoring-pass oracle: the _logreg_sql CTE chain + one decile
    histogram over the pinned per-doc probabilities — counts are exact
    integers (the pi pin makes the bucket an integer floor-divide)."""
    base = _logreg_sql()
    # reuse the full training chain up to b3, swap the final SELECT
    head = base[: base.rindex("SELECT")]
    from open_ftth_relational_projector_spark.functions.regression import (
        logreg_p_sql,
        logreg_z_sql,
    )

    z = logreg_z_sql("bi0", "bi1", "bi2", "x1", "x2")
    return (
        head
        + f"""SELECT CAST(FLOOR({logreg_p_sql(z)} / 1e6) AS INT) AS p_decile,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(y) AS BIGINT) AS n_pos
    FROM rows CROSS JOIN b3
    GROUP BY 1
    ORDER BY 1
    """
    )


@_q("logreg_score_histogram", _logreg_score_sql())
def logreg_score_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation-filter application of the trained classifier: score
    every document with the fitted model (map-only — betas ride in via
    one broadcast row) and histogram the pinned probabilities into
    deciles with the true-label count per bucket — the
    calibration-at-a-glance table a filtering pipeline thresholds on.
    Bucketing is EXACT: p_decile = FLOOR(pi / 10^6) on the pinned
    integer probability, counts are integers."""
    from open_ftth_relational_projector_spark.functions.regression import (
        logreg_fit_irls,
        logreg_p_sql,
        logreg_z_sql,
    )

    docs = load_table(spark, sf_dir, "documents")
    pinned, beta = logreg_fit_irls(
        docs, _LOGREG_X1, _LOGREG_X2, _LOGREG_Y, iters=3, where=_LOGREG_WHERE
    )
    z = logreg_z_sql("bi0", "bi1", "bi2", "x1", "x2")
    return (
        pinned.crossJoin(F.broadcast(beta))
        .selectExpr(
            "y", f"CAST(FLOOR({logreg_p_sql(z)} / 1e6) AS INT) AS p_decile"
        )
        .groupBy("p_decile")
        .agg(
            F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_docs"),
            F.expr("CAST(SUM(y) AS BIGINT)").alias("n_pos"),
        )
        .orderBy("p_decile")
    )


def _logreg_kfold_sql() -> str:
    """Unrolled 5-fold × 3-step IRLS oracle: the logreg CTE chain with a
    fold column, moments GROUP BY complement id, per-fold Newton solves
    joined back on the fold key — every value-determining expression from
    the shared logreg_*/OLS2_* helpers."""
    from open_ftth_relational_projector_spark.functions.regression import (
        LOGREG_MOMENTS,
        OLS2_B0,
        OLS2_B1,
        OLS2_B2,
        dec2dbl_sql,
        fold_expr_sql,
        logreg_beta_out_sql,
        logreg_moment_exprs,
        logreg_p_sql,
        logreg_update_sql,
        logreg_z_sql,
    )

    z = logreg_z_sql("bi0", "bi1", "bi2", "x1", "x2")
    fold = fold_expr_sql("CAST(doc_id AS VARCHAR)", 5)
    parts = [
        _pinned_rows_cte(
            extra=f",\n                   CAST({fold} AS INT) AS fold"
        ),
        """b0 AS (SELECT CAST(UNNEST(generate_series(0, 4)) AS INT) AS bfold,
                  CAST(0 AS BIGINT) AS bi0, CAST(0 AS BIGINT) AS bi1,
                  CAST(0 AS BIGINT) AS bi2)""",
    ]
    for i in (1, 2, 3):
        p = i - 1
        moments = ", ".join(logreg_moment_exprs())
        dbl = ", ".join(f"{dec2dbl_sql(m)} AS {m}" for m in LOGREG_MOMENTS)
        parts.append(
            f"""s{i} AS (SELECT b.bfold, y, x1, x2, {logreg_p_sql(z)} AS pi
                FROM rows CROSS JOIN b{p} b WHERE fold <> b.bfold)"""
        )
        parts.append(f"mr{i} AS (SELECT bfold, {moments} FROM s{i} GROUP BY bfold)")
        parts.append(f"m{i} AS (SELECT bfold, {dbl} FROM mr{i})")
        parts.append(
            f"""b{i} AS (SELECT m.bfold,
                   {logreg_update_sql('bi0', OLS2_B0)} AS bi0,
                   {logreg_update_sql('bi1', OLS2_B1)} AS bi1,
                   {logreg_update_sql('bi2', OLS2_B2)} AS bi2
                FROM m{i} m JOIN b{p} USING (bfold))"""
        )
    return (
        "WITH "
        + ",\n    ".join(parts)
        + f""",
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM rows),
    oof AS (SELECT fold, bi0, bi1, bi2,
                   CAST(COUNT(*) AS BIGINT) AS n_test,
                   ROUND(SUM(CASE WHEN ({z} > 0) = (y = 1) THEN 1 ELSE 0 END)
                         / CAST(COUNT(*) AS DOUBLE), 6) AS accuracy_oof
            FROM rows JOIN b3 ON fold = bfold
            GROUP BY fold, bi0, bi1, bi2)
    SELECT fold, n_total - n_test AS n_train, n_test,
           {logreg_beta_out_sql('bi0')} AS b0,
           {logreg_beta_out_sql('bi1')} AS b1,
           {logreg_beta_out_sql('bi2')} AS b2,
           accuracy_oof
    FROM oof CROSS JOIN tot
    ORDER BY fold
    """
    )


@_q("logreg_crossval_kfold", _logreg_kfold_sql())
def logreg_crossval_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-fold cross-validated logistic classifier over documents: each
    fold's model trains on its complement (3 unrolled IRLS steps, all 5
    fits advancing in ONE k-expanded scoring pass + ONE grouped 45-value
    aggregation per iteration) and reports honest out-of-fold accuracy —
    the overfit gate a curation-classifier pipeline ships with
    (functions/regression.logreg_kfold). Folds md5-bucketed on doc_id."""
    from open_ftth_relational_projector_spark.functions.regression import (
        logreg_kfold,
        logreg_kfold_summary,
    )

    docs = load_table(spark, sf_dir, "documents")
    pinned, betas = logreg_kfold(
        docs,
        _LOGREG_X1,
        _LOGREG_X2,
        _LOGREG_Y,
        key_expr="CAST(doc_id AS STRING)",
        k=5,
        iters=3,
        where=_LOGREG_WHERE,
    )
    return logreg_kfold_summary(pinned, betas)


def _logreg_auc_sql() -> str:
    """Exact-AUC oracle: the trained-model CTE chain + per-score class
    counts + a window cumsum (the oracle MAY use a global window — the
    Spark side replaces it with hierarchical_cumsum) + the shared
    rank-sum texts."""
    base = _logreg_sql()
    head = base[: base.rindex("SELECT")]
    from open_ftth_relational_projector_spark.functions.regression import (
        auc_out_sql,
        auc_u2_sum_sql,
        logreg_p_sql,
        logreg_z_sql,
    )

    z = logreg_z_sql("bi0", "bi1", "bi2", "x1", "x2")
    return (
        head.rstrip()
        + f""",
    scored AS (SELECT y, {logreg_p_sql(z)} AS pi FROM rows CROSS JOIN b3),
    g AS (SELECT pi, CAST(SUM(y) AS BIGINT) AS n_p,
                 CAST(SUM(1 - y) AS BIGINT) AS n_n
          FROM scored GROUP BY pi),
    c AS (SELECT pi, n_p, n_n,
                 SUM(n_n) OVER (ORDER BY pi
                                ROWS UNBOUNDED PRECEDING) AS cum_nn
          FROM g),
    a AS (SELECT CAST(SUM(n_p) AS BIGINT) AS n_pos,
                 CAST(SUM(n_n) AS BIGINT) AS n_neg,
                 {auc_u2_sum_sql()} AS u2
          FROM c)
    SELECT n_pos, n_neg, {auc_out_sql('u2', 'n_pos', 'n_neg')} AS auc
    FROM a
    """
    )


@_q("logreg_auc_exact", _logreg_auc_sql())
def logreg_auc_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distributed AUC of the trained language classifier: the
    pinned integer probabilities form an exact score lattice, so the
    tie-averaged Mann-Whitney rank-sum is pure integer arithmetic — per-
    score class counts, negatives-below via hierarchical_cumsum (range-
    sharded: NO single-partition global window at any lattice size), and
    one final division. The doubled numerator 2U keeps the 0.5 tie credit
    integral."""
    from open_ftth_relational_projector_spark.functions.regression import (
        auc_out_sql,
        auc_u2_sum_sql,
        logreg_fit_irls,
        logreg_p_sql,
        logreg_z_sql,
    )
    from open_ftth_relational_projector_spark.operators.hierarchical import (
        hierarchical_cumsum,
    )

    docs = load_table(spark, sf_dir, "documents")
    pinned, beta = logreg_fit_irls(
        docs, _LOGREG_X1, _LOGREG_X2, _LOGREG_Y, iters=3, where=_LOGREG_WHERE
    )
    z = logreg_z_sql("bi0", "bi1", "bi2", "x1", "x2")
    scored = pinned.crossJoin(F.broadcast(beta)).selectExpr(
        "y", f"{logreg_p_sql(z)} AS pi"
    )
    g = scored.groupBy("pi").agg(
        F.expr("CAST(SUM(y) AS BIGINT)").alias("n_p"),
        F.expr("CAST(SUM(1 - y) AS BIGINT)").alias("n_n"),
    )
    c = hierarchical_cumsum(g, [F.col("pi")], "n_n", "cum_nn")
    a = c.agg(
        F.expr("CAST(SUM(n_p) AS BIGINT)").alias("n_pos"),
        F.expr("CAST(SUM(n_n) AS BIGINT)").alias("n_neg"),
        F.expr(auc_u2_sum_sql()).alias("u2"),
    )
    return a.selectExpr(
        "n_pos", "n_neg", f"{auc_out_sql('u2', 'n_pos', 'n_neg')} AS auc"
    )


def _stump_sql() -> str:
    """Decision-stump oracle: pinned features, exact-integer equal-width
    bucketing, per-feature cumulative class counts, misclassification
    argmin — every value-determining expression from functions/tree's
    shared helpers (stack() becomes UNION ALL; the cumulative window is
    per-feature, oracle-side)."""
    from open_ftth_relational_projector_spark.functions.tree import (
        stump_bucket_sql,
        stump_score_sql,
        stump_threshold_sql,
        stump_width_sql,
    )

    return f"""
    WITH {_pinned_rows_cte()},
    st0 AS (SELECT MIN(x1) AS lo1, MAX(x1) AS hi1, MIN(x2) AS lo2,
                   MAX(x2) AS hi2, CAST(SUM(y) AS BIGINT) AS tnp,
                   CAST(SUM(1 - y) AS BIGINT) AS tnn
            FROM rows),
    st AS (SELECT lo1, lo2, tnp, tnn,
                  {stump_width_sql('lo1', 'hi1', 64)} AS w1,
                  {stump_width_sql('lo2', 'hi2', 64)} AS w2
           FROM st0),
    buck AS (SELECT y, {stump_bucket_sql('x1', 'lo1', 'w1')} AS b1,
                    {stump_bucket_sql('x2', 'lo2', 'w2')} AS b2
             FROM rows CROSS JOIN st),
    per AS (SELECT feat, b, CAST(SUM(y) AS BIGINT) AS np,
                   CAST(SUM(1 - y) AS BIGINT) AS nn
            FROM (SELECT y, 1 AS feat, b1 AS b FROM buck
                  UNION ALL SELECT y, 2, b2 FROM buck)
            GROUP BY feat, b),
    cum AS (SELECT feat, b,
                   SUM(np) OVER (PARTITION BY feat ORDER BY b
                                 ROWS UNBOUNDED PRECEDING) AS cnp,
                   SUM(nn) OVER (PARTITION BY feat ORDER BY b
                                 ROWS UNBOUNDED PRECEDING) AS cnn,
                   MAX(b) OVER (PARTITION BY feat) AS maxb
            FROM per),
    cand AS (SELECT feat, b, cnp, cnn,
                    {stump_score_sql('cnp', 'cnn', 'tnp', 'tnn')} AS score
             FROM cum CROSS JOIN st
             WHERE b < maxb),
    best AS (SELECT * FROM cand ORDER BY score, feat, b LIMIT 1)
    SELECT feat,
           CASE WHEN feat = 1 THEN {stump_threshold_sql('lo1', 'b', 'w1')}
                ELSE {stump_threshold_sql('lo2', 'b', 'w2')} END AS threshold,
           CAST(cnp + cnn AS BIGINT) AS n_left,
           CAST(cnp AS BIGINT) AS left_np,
           CAST(cnn AS BIGINT) AS left_nn,
           CAST(tnp + tnn - cnp - cnn AS BIGINT) AS n_right,
           CAST(tnp - cnp AS BIGINT) AS right_np,
           CAST(tnn - cnn AS BIGINT) AS right_nn,
           CAST(score AS BIGINT) AS split_miscls,
           CAST(LEAST(tnp, tnn) AS BIGINT) AS baseline_miscls
    FROM best CROSS JOIN st
    """


@_q("stump_quality_rule", _stump_sql())
def stump_quality_rule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best single human-auditable threshold rule ("x ≤ t") for the
    is-English label over (kilochars, space-ratio) — 1R/CART-root rule
    induction with an all-integer misclassification argmin
    (functions/tree.stump_fit); two scans + arithmetic on a ≤2·64-row
    bucket table at any corpus size."""
    from open_ftth_relational_projector_spark.functions.tree import stump_fit

    docs = load_table(spark, sf_dir, "documents")
    return stump_fit(
        docs, _LOGREG_X1, _LOGREG_X2, _LOGREG_Y, n_buckets=64,
        where=_LOGREG_WHERE,
    )


def _tree2_sql() -> str:
    """Depth-2 tree oracle: the stump CTE chain, then per-side candidate
    scans against the root's bucket grid, per-side ROW_NUMBER argmin —
    all value-determining expressions from functions/tree's helpers."""
    from open_ftth_relational_projector_spark.functions.tree import (
        stump_bucket_sql,
        stump_score_sql,
        stump_threshold_sql,
        stump_width_sql,
    )

    return f"""
    WITH {_pinned_rows_cte()},
    st0 AS (SELECT MIN(x1) AS lo1, MAX(x1) AS hi1, MIN(x2) AS lo2,
                   MAX(x2) AS hi2 FROM rows),
    st AS (SELECT lo1, lo2,
                  {stump_width_sql('lo1', 'hi1', 64)} AS w1,
                  {stump_width_sql('lo2', 'hi2', 64)} AS w2
           FROM st0),
    buck AS (SELECT y, {stump_bucket_sql('x1', 'lo1', 'w1')} AS b1,
                    {stump_bucket_sql('x2', 'lo2', 'w2')} AS b2
             FROM rows CROSS JOIN st),
    rootper AS (SELECT feat, b, CAST(SUM(y) AS BIGINT) AS np,
                       CAST(SUM(1 - y) AS BIGINT) AS nn
                FROM (SELECT y, 1 AS feat, b1 AS b FROM buck
                      UNION ALL SELECT y, 2, b2 FROM buck)
                GROUP BY feat, b),
    rootcum AS (SELECT feat, b,
                   SUM(np) OVER (PARTITION BY feat ORDER BY b
                                 ROWS UNBOUNDED PRECEDING) AS cnp,
                   SUM(nn) OVER (PARTITION BY feat ORDER BY b
                                 ROWS UNBOUNDED PRECEDING) AS cnn,
                   MAX(b) OVER (PARTITION BY feat) AS maxb,
                   SUM(np) OVER (PARTITION BY feat) AS gnp,
                   SUM(nn) OVER (PARTITION BY feat) AS gnn
            FROM rootper),
    rootcand AS (SELECT feat, b, cnp, cnn, gnp, gnn,
                    {stump_score_sql('cnp', 'cnn', 'gnp', 'gnn')} AS score
             FROM rootcum WHERE b < maxb),
    root AS (SELECT * FROM rootcand ORDER BY score, feat, b LIMIT 1),
    sided AS (SELECT CASE WHEN (CASE WHEN root.feat = 1 THEN b1 ELSE b2 END)
                          <= root.b THEN 'L' ELSE 'R' END AS node,
                     y, b1, b2
              FROM buck CROSS JOIN root),
    sideper AS (SELECT node, feat, b, CAST(SUM(y) AS BIGINT) AS np,
                       CAST(SUM(1 - y) AS BIGINT) AS nn
                FROM (SELECT node, y, 1 AS feat, b1 AS b FROM sided
                      UNION ALL SELECT node, y, 2, b2 FROM sided)
                GROUP BY node, feat, b),
    sidecum AS (SELECT node, feat, b,
                   SUM(np) OVER (PARTITION BY node, feat ORDER BY b
                                 ROWS UNBOUNDED PRECEDING) AS cnp,
                   SUM(nn) OVER (PARTITION BY node, feat ORDER BY b
                                 ROWS UNBOUNDED PRECEDING) AS cnn,
                   MAX(b) OVER (PARTITION BY node, feat) AS maxb,
                   SUM(np) OVER (PARTITION BY node, feat) AS gnp,
                   SUM(nn) OVER (PARTITION BY node, feat) AS gnn
            FROM sideper),
    sidecand AS (SELECT node, feat, b, cnp, cnn, gnp, gnn,
                    {stump_score_sql('cnp', 'cnn', 'gnp', 'gnn')} AS score
             FROM sidecum WHERE b < maxb),
    children AS (SELECT node, feat, b, cnp, cnn, gnp, gnn, score
                 FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY node
                              ORDER BY score, feat, b) AS rn
                       FROM sidecand) WHERE rn = 1),
    unioned AS (SELECT 'root' AS node, feat, b, cnp, cnn, gnp, gnn, score
                FROM root
                UNION ALL
                SELECT node, feat, b, cnp, cnn, gnp, gnn, score
                FROM children)
    SELECT node, feat,
           CASE WHEN feat = 1 THEN {stump_threshold_sql('lo1', 'b', 'w1')}
                ELSE {stump_threshold_sql('lo2', 'b', 'w2')} END AS threshold,
           CAST(cnp + cnn AS BIGINT) AS n_left,
           CAST(cnp AS BIGINT) AS left_np,
           CAST(cnn AS BIGINT) AS left_nn,
           CAST(gnp + gnn - cnp - cnn AS BIGINT) AS n_right,
           CAST(gnp - cnp AS BIGINT) AS right_np,
           CAST(gnn - cnn AS BIGINT) AS right_nn,
           CAST(score AS BIGINT) AS split_miscls,
           CAST(LEAST(gnp, gnn) AS BIGINT) AS baseline_miscls
    FROM unioned CROSS JOIN st
    ORDER BY node
    """


@_q("tree2_quality_rules", _tree2_sql())
def tree2_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Depth-2 decision tree (root split + best split inside each side,
    ≤ 4 leaves) for the is-English label over (kilochars, space-ratio) —
    the auditable rule-set upgrade of stump_quality_rule; same exact
    integer misclassification argmin, child thresholds snapped to the
    root's bucket grid (functions/tree.tree_fit_depth2; three scans
    total at any corpus size)."""
    from open_ftth_relational_projector_spark.functions.tree import (
        tree_fit_depth2,
    )

    docs = load_table(spark, sf_dir, "documents")
    return tree_fit_depth2(
        docs, _LOGREG_X1, _LOGREG_X2, _LOGREG_Y, n_buckets=64,
        where=_LOGREG_WHERE,
    )


def _woe_sql() -> str:
    """WOE-table oracle over the stump bucket grid (shared helpers)."""
    from open_ftth_relational_projector_spark.functions.tree import (
        stump_bucket_sql,
        stump_width_sql,
        woe_sql,
    )

    return f"""
    WITH {_pinned_rows_cte()},
    st0 AS (SELECT MIN(x1) AS lo1, MAX(x1) AS hi1, MIN(x2) AS lo2,
                   MAX(x2) AS hi2, CAST(SUM(y) AS BIGINT) AS tnp,
                   CAST(SUM(1 - y) AS BIGINT) AS tnn
            FROM rows),
    st AS (SELECT lo1, lo2, tnp, tnn,
                  {stump_width_sql('lo1', 'hi1', 16)} AS w1,
                  {stump_width_sql('lo2', 'hi2', 16)} AS w2
           FROM st0),
    per AS (SELECT feat, b, CAST(SUM(y) AS BIGINT) AS np,
                   CAST(SUM(1 - y) AS BIGINT) AS nn
            FROM (SELECT y, 1 AS feat,
                         {stump_bucket_sql('x1', 'lo1', 'w1')} AS b
                  FROM rows CROSS JOIN st
                  UNION ALL
                  SELECT y, 2, {stump_bucket_sql('x2', 'lo2', 'w2')}
                  FROM rows CROSS JOIN st)
            GROUP BY feat, b)
    SELECT feat, b,
           CASE WHEN feat = 1 THEN ROUND((lo1 + b * w1) / 1e4, 6) + 0
                ELSE ROUND((lo2 + b * w2) / 1e4, 6) + 0 END AS bucket_lo,
           np, nn,
           {woe_sql('np', 'nn', 'tnp', 'tnn')} AS woe
    FROM per CROSS JOIN st
    ORDER BY feat, b
    """


@_q("woe_feature_audit", _woe_sql())
def woe_feature_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-evidence table for the is-English label over the two
    classifier features on the exact integer bucket grid — the scorecard
    feature-strength diagnostic (functions/tree.woe_table): which value
    ranges argue for/against the label, Laplace-smoothed, exact counts."""
    from open_ftth_relational_projector_spark.functions.tree import woe_table

    docs = load_table(spark, sf_dir, "documents")
    return woe_table(
        docs, _LOGREG_X1, _LOGREG_X2, _LOGREG_Y, n_buckets=16,
        where=_LOGREG_WHERE,
    )


def _logreg_isotonic_sql() -> str:
    """Calibration oracle: the classifier training chain, the decile
    CTE, then the PAV minimax program verbatim from
    functions/calibration.pav_isotonic_sql (twin by construction)."""
    from open_ftth_relational_projector_spark.functions.calibration import (
        pav_isotonic_sql,
    )
    from open_ftth_relational_projector_spark.functions.regression import (
        logreg_p_sql,
        logreg_z_sql,
    )

    base = _logreg_sql()
    head = base[: base.rindex("SELECT")]
    z = logreg_z_sql("bi0", "bi1", "bi2", "x1", "x2")
    return (
        head
        + f""", dec AS (SELECT CAST(FLOOR({logreg_p_sql(z)} / 1e6) AS INT) AS p_decile,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(y) AS BIGINT) AS n_pos
    FROM rows CROSS JOIN b3
    GROUP BY 1),"""
        + pav_isotonic_sql("dec")
    )


@_q("logreg_isotonic_calibration", _logreg_isotonic_sql())
def logreg_isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic (PAV) calibration of the trained quality classifier's
    decile table — the monotone-probability step a curation pipeline
    runs before picking a filtering threshold. The corpus-scale work is
    the classifier's one map-only scoring pass; the PAV fit is the
    closed-form minimax identity (functions/calibration.pav_isotonic)
    evaluated engine-side on the bounded decile frame — no windows, no
    driver logic, no transcendentals."""
    from open_ftth_relational_projector_spark.functions.calibration import (
        pav_isotonic,
    )
    from open_ftth_relational_projector_spark.functions.regression import (
        logreg_fit_irls,
        logreg_p_sql,
        logreg_z_sql,
    )

    docs = load_table(spark, sf_dir, "documents")
    pinned, beta = logreg_fit_irls(
        docs, _LOGREG_X1, _LOGREG_X2, _LOGREG_Y, iters=3, where=_LOGREG_WHERE
    )
    z = logreg_z_sql("bi0", "bi1", "bi2", "x1", "x2")
    dec = (
        pinned.crossJoin(F.broadcast(beta))
        .selectExpr(
            "y", f"CAST(FLOOR({logreg_p_sql(z)} / 1e6) AS INT) AS p_decile"
        )
        .groupBy("p_decile")
        .agg(
            F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_docs"),
            F.expr("CAST(SUM(y) AS BIGINT)").alias("n_pos"),
        )
    )
    return pav_isotonic(dec)


def _ada_chain_sql(n_rounds: int = 3, n_buckets: int = 16) -> tuple[str, str]:
    """Shared CTE chain for the AdaBoost oracles: pinned rows, the root
    bucket grid, then per boosting round a weight CTE (the nested
    shared-text weight expression over the prior stump CTEs), weighted
    bucket counts, per-feature cumulative window, and the ORDER BY/LIMIT
    argmin stump — every value-determining expression from
    functions/boosting's helpers (twin by construction). Returns
    (with_clause, cross_joins_of_all_stumps)."""
    from open_ftth_relational_projector_spark.functions.boosting import (
        ADA_WS,
        ada_alpha_sql,
        ada_factor_sql,
        ada_next_w_sql,
        ada_pred_sql,
        ada_wcount_sql,
    )
    from open_ftth_relational_projector_spark.functions.tree import (
        stump_bucket_sql,
        stump_score_sql,
        stump_width_sql,
    )

    parts = [
        _pinned_rows_cte(),
        """st0 AS (SELECT MIN(x1) AS lo1, MAX(x1) AS hi1, MIN(x2) AS lo2,
                   MAX(x2) AS hi2 FROM rows)""",
        f"""st AS (SELECT lo1, lo2,
                  {stump_width_sql('lo1', 'hi1', n_buckets)} AS w1,
                  {stump_width_sql('lo2', 'hi2', n_buckets)} AS w2
           FROM st0)""",
        f"""buck AS (SELECT y, {stump_bucket_sql('x1', 'lo1', 'w1')} AS b1,
                    {stump_bucket_sql('x2', 'lo2', 'w2')} AS b2
             FROM rows CROSS JOIN st)""",
    ]
    w_text = str(ADA_WS)
    joins = ""
    for t in range(1, n_rounds + 1):
        alpha = ada_alpha_sql("score", "(gnp + gnn)")
        parts.append(
            f"""wr{t} AS (SELECT y, b1, b2, ({w_text}) AS w
                FROM buck{joins})"""
        )
        parts.append(
            f"""per{t} AS (SELECT feat, b,
                    {ada_wcount_sql('w', 'y')} AS wnp,
                    {ada_wcount_sql('w', '(1 - y)')} AS wnn
                FROM (SELECT y, w, 1 AS feat, b1 AS b FROM wr{t}
                      UNION ALL SELECT y, w, 2, b2 FROM wr{t})
                GROUP BY feat, b)"""
        )
        parts.append(
            f"""cum{t} AS (SELECT feat, b,
                   SUM(wnp) OVER (PARTITION BY feat ORDER BY b
                                 ROWS UNBOUNDED PRECEDING) AS cnp,
                   SUM(wnn) OVER (PARTITION BY feat ORDER BY b
                                 ROWS UNBOUNDED PRECEDING) AS cnn,
                   MAX(b) OVER (PARTITION BY feat) AS maxb,
                   SUM(wnp) OVER (PARTITION BY feat) AS gnp,
                   SUM(wnn) OVER (PARTITION BY feat) AS gnn
            FROM per{t})"""
        )
        parts.append(
            f"""cand{t} AS (SELECT feat, b, cnp, cnn, gnp, gnn,
                    {stump_score_sql('cnp', 'cnn', 'gnp', 'gnn')} AS score
             FROM cum{t} WHERE b < maxb)"""
        )
        parts.append(
            f"""s{t} AS (SELECT feat AS rf_{t}, b AS rb_{t},
                   CASE WHEN cnp > cnn THEN 1 ELSE 0 END AS ll_{t},
                   CASE WHEN gnp - cnp > gnn - cnn THEN 1 ELSE 0 END AS rl_{t},
                   {alpha} AS ab_{t},
                   {ada_factor_sql(alpha, wrong=False)} AS fc_{t},
                   {ada_factor_sql(alpha, wrong=True)} AS fw_{t},
                   score AS score_{t},
                   gnp + gnn AS wtot_{t}
                FROM cand{t} ORDER BY score, feat, b LIMIT 1)"""
        )
        joins += f" CROSS JOIN s{t}"
        pred = ada_pred_sql(f"rf_{t}", f"rb_{t}", f"ll_{t}", f"rl_{t}")
        w_text = ada_next_w_sql(w_text, pred, f"fc_{t}", f"fw_{t}")
    return "WITH " + ",\n    ".join(parts), joins


def _ada_rounds_sql() -> str:
    """Boosting rounds-table oracle: the chain + one row per round from
    its stump CTE (threshold/ε/α via the shared texts)."""
    from open_ftth_relational_projector_spark.functions.regression import (
        dec2dbl_sql,
    )
    from open_ftth_relational_projector_spark.functions.tree import (
        stump_threshold_sql,
    )

    with_clause, _ = _ada_chain_sql()
    selects = []
    for t in (1, 2, 3):
        selects.append(
            f"""SELECT {t} AS boost_round, rf_{t} AS feat,
           CASE WHEN rf_{t} = 1 THEN {stump_threshold_sql('lo1', f'rb_{t}', 'w1')}
                ELSE {stump_threshold_sql('lo2', f'rb_{t}', 'w2')} END AS threshold,
           ll_{t} AS left_label,
           rl_{t} AS right_label,
           ROUND(({dec2dbl_sql(f'score_{t}')}) / ({dec2dbl_sql(f'wtot_{t}')}), 6) AS eps,
           ROUND(ab_{t} / 1e6, 6) AS alpha
    FROM s{t} CROSS JOIN st"""
        )
    return (
        with_clause
        + "\n    "
        + "\n    UNION ALL ".join(selects)
        + "\n    ORDER BY boost_round"
    )


def _ada_summary_sql() -> str:
    """Boosting ensemble-summary oracle: margin = Σ ±α̃ per row over the
    bucketed corpus crossed with all stump CTEs; exact integer sign
    test for accuracy."""
    from open_ftth_relational_projector_spark.functions.boosting import (
        ada_pred_sql,
    )
    from open_ftth_relational_projector_spark.functions.regression import (
        dec2dbl_sql,
    )

    with_clause, joins = _ada_chain_sql()
    terms = []
    for t in (1, 2, 3):
        pred = ada_pred_sql(f"rf_{t}", f"rb_{t}", f"ll_{t}", f"rl_{t}")
        terms.append(f"(CASE WHEN ({pred}) = 1 THEN ab_{t} ELSE -ab_{t} END)")
    margin = "(" + " + ".join(terms) + ")"
    avg_num = dec2dbl_sql(
        "CAST(SUM(CASE WHEN y = 1 THEN margin ELSE -margin END)"
        " AS DECIMAL(38,0))"
    )
    return (
        with_clause
        + f""",
    scored AS (SELECT y, {margin} AS margin FROM buck{joins})
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(y) AS BIGINT) AS n_pos,
           ROUND(SUM(CASE WHEN (margin > 0) = (y = 1) THEN 1 ELSE 0 END)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS accuracy,
           ROUND({avg_num} / 1e6 / CAST(COUNT(*) AS DOUBLE), 6) + 0
               AS avg_margin
    FROM scored
    """
    )


@_q("adaboost_quality_rounds", _ada_rounds_sql())
def adaboost_quality_rounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three rounds of discrete AdaBoost over exact-integer decision
    stumps for the is-English label — the boosted rule-list curation
    filter (functions/boosting.adaboost_fit): each round ONE map-only
    weighted-count pass (per-row weights are a nested expression over
    the broadcast prior stumps, never materialized) + an argmin on a
    ≤2·16-row frame. Reports each round's rule (feature, threshold,
    side labels), weighted error ε and pinned round weight α."""
    from open_ftth_relational_projector_spark.functions.boosting import (
        adaboost_fit,
        adaboost_rounds_table,
    )

    docs = load_table(spark, sf_dir, "documents")
    _, st, stumps = adaboost_fit(
        docs, _LOGREG_X1, _LOGREG_X2, _LOGREG_Y, n_rounds=3, n_buckets=16,
        where=_LOGREG_WHERE,
    )
    return adaboost_rounds_table(st, stumps)


@_q("adaboost_margin_report", _ada_summary_sql())
def adaboost_margin_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ensemble report for the boosted rule list: training accuracy of
    sign(Σ ±α̃) — an EXACT integer test on the pinned round weights —
    plus the mean label-signed margin (how confidently the rules
    separate the classes). One map-only scoring pass with all three
    one-row stumps broadcast."""
    from open_ftth_relational_projector_spark.functions.boosting import (
        adaboost_fit,
        adaboost_train_summary,
    )

    docs = load_table(spark, sf_dir, "documents")
    bucketed, _, stumps = adaboost_fit(
        docs, _LOGREG_X1, _LOGREG_X2, _LOGREG_Y, n_rounds=3, n_buckets=16,
        where=_LOGREG_WHERE,
    )
    return adaboost_train_summary(bucketed, stumps)


def _ada_group_rounds_sql(
    n_rounds: int = 3, n_buckets: int = 16, _want: str = "rounds"
) -> str:
    """Per-source AdaBoost oracle: the _ada_chain_sql program keyed on
    the source column — per-group grids, PARTITION BY (g, feat) windows,
    ROW_NUMBER per-group argmin, group-keyed weight nesting (shared
    helpers throughout, twin by construction). ``_want`` picks the final
    report: the per-(group, round) rules table or the per-group margin
    summary over the same chain."""
    from open_ftth_relational_projector_spark.functions.boosting import (
        ADA_WS,
        ada_alpha_sql,
        ada_factor_sql,
        ada_next_w_sql,
        ada_pred_sql,
        ada_wcount_sql,
    )
    from open_ftth_relational_projector_spark.functions.regression import (
        dec2dbl_sql,
    )
    from open_ftth_relational_projector_spark.functions.tree import (
        stump_bucket_sql,
        stump_score_sql,
        stump_threshold_sql,
        stump_width_sql,
    )

    parts = [
        _pinned_rows_cte(lead="source AS g, "),
        """st0 AS (SELECT g, MIN(x1) AS lo1, MAX(x1) AS hi1, MIN(x2) AS lo2,
                   MAX(x2) AS hi2 FROM rows GROUP BY g)""",
        f"""st AS (SELECT g, lo1, lo2,
                  {stump_width_sql('lo1', 'hi1', n_buckets)} AS w1,
                  {stump_width_sql('lo2', 'hi2', n_buckets)} AS w2
           FROM st0)""",
        f"""buck AS (SELECT rows.g, y,
                    {stump_bucket_sql('x1', 'lo1', 'w1')} AS b1,
                    {stump_bucket_sql('x2', 'lo2', 'w2')} AS b2
             FROM rows JOIN st USING (g))""",
    ]
    w_text = str(ADA_WS)
    joins = ""
    for t in range(1, n_rounds + 1):
        alpha = ada_alpha_sql("score", "(gnp + gnn)")
        parts.append(
            f"""wr{t} AS (SELECT g, y, b1, b2, ({w_text}) AS w
                FROM buck{joins})"""
        )
        parts.append(
            f"""per{t} AS (SELECT g, feat, b,
                    {ada_wcount_sql('w', 'y')} AS wnp,
                    {ada_wcount_sql('w', '(1 - y)')} AS wnn
                FROM (SELECT g, y, w, 1 AS feat, b1 AS b FROM wr{t}
                      UNION ALL SELECT g, y, w, 2, b2 FROM wr{t})
                GROUP BY g, feat, b)"""
        )
        parts.append(
            f"""cum{t} AS (SELECT g, feat, b,
                   SUM(wnp) OVER (PARTITION BY g, feat ORDER BY b
                                 ROWS UNBOUNDED PRECEDING) AS cnp,
                   SUM(wnn) OVER (PARTITION BY g, feat ORDER BY b
                                 ROWS UNBOUNDED PRECEDING) AS cnn,
                   MAX(b) OVER (PARTITION BY g, feat) AS maxb,
                   SUM(wnp) OVER (PARTITION BY g, feat) AS gnp,
                   SUM(wnn) OVER (PARTITION BY g, feat) AS gnn
            FROM per{t})"""
        )
        parts.append(
            f"""cand{t} AS (SELECT g, feat, b, cnp, cnn, gnp, gnn,
                    {stump_score_sql('cnp', 'cnn', 'gnp', 'gnn')} AS score
             FROM cum{t} WHERE b < maxb)"""
        )
        parts.append(
            f"""s{t} AS (SELECT g, feat AS rf_{t}, b AS rb_{t},
                   CASE WHEN cnp > cnn THEN 1 ELSE 0 END AS ll_{t},
                   CASE WHEN gnp - cnp > gnn - cnn THEN 1 ELSE 0 END AS rl_{t},
                   {alpha} AS ab_{t},
                   {ada_factor_sql(alpha, wrong=False)} AS fc_{t},
                   {ada_factor_sql(alpha, wrong=True)} AS fw_{t},
                   score AS score_{t},
                   gnp + gnn AS wtot_{t}
                FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY g
                             ORDER BY score, feat, b) AS rn
                      FROM cand{t}) WHERE rn = 1)"""
        )
        joins += f" JOIN s{t} USING (g)"
        pred = ada_pred_sql(f"rf_{t}", f"rb_{t}", f"ll_{t}", f"rl_{t}")
        w_text = ada_next_w_sql(w_text, pred, f"fc_{t}", f"fw_{t}")
    if _want == "margins":
        terms = []
        for t in range(1, n_rounds + 1):
            pred = ada_pred_sql(f"rf_{t}", f"rb_{t}", f"ll_{t}", f"rl_{t}")
            terms.append(
                f"(CASE WHEN ({pred}) = 1 THEN ab_{t} ELSE -ab_{t} END)"
            )
        margin = "(" + " + ".join(terms) + ")"
        avg_num = dec2dbl_sql(
            "CAST(SUM(CASE WHEN y = 1 THEN margin ELSE -margin END)"
            " AS DECIMAL(38,0))"
        )
        return (
            "WITH "
            + ",\n    ".join(parts)
            + f""",
    scored AS (SELECT g, y, {margin} AS margin FROM buck{joins})
    SELECT g, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(y) AS BIGINT) AS n_pos,
           ROUND(SUM(CASE WHEN (margin > 0) = (y = 1) THEN 1 ELSE 0 END)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS accuracy,
           ROUND({avg_num} / 1e6 / CAST(COUNT(*) AS DOUBLE), 6) + 0
               AS avg_margin
    FROM scored
    GROUP BY g
    ORDER BY g
    """
        )
    selects = []
    for t in range(1, n_rounds + 1):
        selects.append(
            f"""SELECT s{t}.g AS g, {t} AS boost_round, rf_{t} AS feat,
           CASE WHEN rf_{t} = 1 THEN {stump_threshold_sql('lo1', f'rb_{t}', 'w1')}
                ELSE {stump_threshold_sql('lo2', f'rb_{t}', 'w2')} END AS threshold,
           ll_{t} AS left_label,
           rl_{t} AS right_label,
           ROUND(({dec2dbl_sql(f'score_{t}')}) / ({dec2dbl_sql(f'wtot_{t}')}), 6) AS eps,
           ROUND(ab_{t} / 1e6, 6) AS alpha
    FROM s{t} JOIN st USING (g)"""
        )
    return (
        "WITH "
        + ",\n    ".join(parts)
        + "\n    "
        + "\n    UNION ALL ".join(selects)
        + "\n    ORDER BY g, boost_round"
    )


@_q("adaboost_per_source_rounds", _ada_group_rounds_sql())
def adaboost_per_source_rounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One boosted rule list PER SOURCE, all models trained together
    (functions/boosting.adaboost_fit_grouped): per boosting round one
    grouped weighted-count aggregation (groups × 2·16 bucket rows) and
    a per-group argmin — the per-domain rule-list farm at the scan cost
    of one model. Reports every (source, round) rule with its weighted
    error and pinned round weight."""
    from open_ftth_relational_projector_spark.functions.boosting import (
        adaboost_fit_grouped,
        adaboost_group_rounds_table,
    )

    docs = load_table(spark, sf_dir, "documents")
    _, st, stumps = adaboost_fit_grouped(
        docs, _LOGREG_X1, _LOGREG_X2, _LOGREG_Y, group_expr="source",
        n_rounds=3, n_buckets=16, where=_LOGREG_WHERE,
    )
    return adaboost_group_rounds_table(st, stumps)


@_q("adaboost_per_source_margins", _ada_group_rounds_sql(_want="margins"))
def adaboost_per_source_margins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source ensemble report for the boosted rule-list farm: each
    source's training accuracy under sign(Σ ±α̃) — the exact integer
    decision — plus its mean label-signed margin, from one map-only
    scoring pass with the group-keyed stump frames broadcast
    (functions/boosting.adaboost_group_summary)."""
    from open_ftth_relational_projector_spark.functions.boosting import (
        adaboost_fit_grouped,
        adaboost_group_summary,
    )

    docs = load_table(spark, sf_dir, "documents")
    bucketed, _, stumps = adaboost_fit_grouped(
        docs, _LOGREG_X1, _LOGREG_X2, _LOGREG_Y, group_expr="source",
        n_rounds=3, n_buckets=16, where=_LOGREG_WHERE,
    )
    return adaboost_group_summary(bucketed, stumps)


def _logreg_group_sql() -> str:
    """Per-source IRLS oracle: the logreg CTE chain keyed on the source
    column — moments GROUP BY source, per-source solves joined back on
    the key (shared helpers throughout)."""
    from open_ftth_relational_projector_spark.functions.regression import (
        LOGREG_MOMENTS,
        OLS2_B0,
        OLS2_B1,
        OLS2_B2,
        dec2dbl_sql,
        logreg_beta_out_sql,
        logreg_moment_exprs,
        logreg_p_sql,
        logreg_update_sql,
        logreg_z_sql,
    )

    z = logreg_z_sql("bi0", "bi1", "bi2", "x1", "x2")
    parts = [
        _pinned_rows_cte(lead="source AS g, "),
        """b0 AS (SELECT g, CAST(0 AS BIGINT) AS bi0,
                  CAST(0 AS BIGINT) AS bi1, CAST(0 AS BIGINT) AS bi2
           FROM (SELECT DISTINCT g FROM rows))""",
    ]
    for i in (1, 2, 3):
        p = i - 1
        moments = ", ".join(logreg_moment_exprs())
        dbl = ", ".join(f"{dec2dbl_sql(m)} AS {m}" for m in LOGREG_MOMENTS)
        parts.append(
            f"""s{i} AS (SELECT rows.g, y, x1, x2, {logreg_p_sql(z)} AS pi
                FROM rows JOIN b{p} USING (g))"""
        )
        parts.append(f"mr{i} AS (SELECT g, {moments} FROM s{i} GROUP BY g)")
        parts.append(f"m{i} AS (SELECT g, {dbl} FROM mr{i})")
        parts.append(
            f"""b{i} AS (SELECT m.g,
                   {logreg_update_sql('bi0', OLS2_B0)} AS bi0,
                   {logreg_update_sql('bi1', OLS2_B1)} AS bi1,
                   {logreg_update_sql('bi2', OLS2_B2)} AS bi2
                FROM m{i} m JOIN b{p} USING (g))"""
        )
    return (
        "WITH "
        + ",\n    ".join(parts)
        + f"""
    SELECT g, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(y) AS BIGINT) AS n_pos,
           {logreg_beta_out_sql('bi0')} AS b0,
           {logreg_beta_out_sql('bi1')} AS b1,
           {logreg_beta_out_sql('bi2')} AS b2,
           ROUND(SUM(CASE WHEN ({z} > 0) = (y = 1) THEN 1 ELSE 0 END)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS accuracy
    FROM rows JOIN b3 USING (g)
    GROUP BY g, bi0, bi1, bi2
    ORDER BY g
    """
    )


@_q("logreg_per_source", _logreg_group_sql())
def logreg_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One is-English logistic filter PER SOURCE, all 20 models trained
    together (functions/regression.logreg_fit_irls_grouped): per IRLS
    iteration one map-only scoring pass + one grouped 9-moment
    aggregation — the per-domain quality-filter farm a curation pipeline
    trains over thousands of sources at the cost of one model's scans."""
    from open_ftth_relational_projector_spark.functions.regression import (
        logreg_fit_irls_grouped,
        logreg_group_summary,
    )

    docs = load_table(spark, sf_dir, "documents")
    pinned, betas = logreg_fit_irls_grouped(
        docs, _LOGREG_X1, _LOGREG_X2, _LOGREG_Y, group_expr="source",
        iters=3, where=_LOGREG_WHERE,
    )
    return logreg_group_summary(pinned, betas)


# ---------------------------------------------------------------------------
# Bucketed Naive Bayes (r10): the counting classifier of the
# trainable-curation-filter family — same pinned features, same stump
# grid, Laplace-smoothed per-bucket class likelihoods, exact integer
# log-score decision.
# ---------------------------------------------------------------------------


def _nb_chain_sql(n_buckets: int = 16) -> str:
    """Shared CTE chain for the Naive Bayes oracles: pinned non-null
    rows → grid/totals → bucketing → pinned log-priors → per-(feature,
    bucket) class counts → pinned log-likelihoods — every
    value-determining expression from functions/bayes' shared texts."""
    from open_ftth_relational_projector_spark.functions.bayes import (
        nb_loglik_sql,
    )
    from open_ftth_relational_projector_spark.functions.tree import (
        stump_bucket_sql,
        stump_width_sql,
    )

    return f"""
    WITH {_pinned_rows_cte()},
    st0 AS (SELECT MIN(x1) AS lo1, MAX(x1) AS hi1, MIN(x2) AS lo2,
                   MAX(x2) AS hi2, CAST(SUM(y) AS BIGINT) AS tnp,
                   CAST(SUM(1 - y) AS BIGINT) AS tnn
            FROM rows),
    st AS (SELECT lo1, lo2, tnp, tnn,
                  {stump_width_sql('lo1', 'hi1', n_buckets)} AS w1,
                  {stump_width_sql('lo2', 'hi2', n_buckets)} AS w2
           FROM st0),
    buck AS (SELECT y, {stump_bucket_sql('x1', 'lo1', 'w1')} AS b1,
                    {stump_bucket_sql('x2', 'lo2', 'w2')} AS b2
             FROM rows CROSS JOIN st),
    prior AS (SELECT tnp, tnn,
                     {nb_loglik_sql('tnp', 'tnp + tnn', 2)} AS pr1,
                     {nb_loglik_sql('tnn', 'tnp + tnn', 2)} AS pr0
              FROM st),
    cnt AS (SELECT feat, b, CAST(SUM(y) AS BIGINT) AS np,
                   CAST(SUM(1 - y) AS BIGINT) AS nn
            FROM (SELECT y, 1 AS feat, b1 AS b FROM buck
                  UNION ALL SELECT y, 2, b2 FROM buck)
            GROUP BY feat, b),
    lik AS (SELECT feat, b, np, nn,
                   {nb_loglik_sql('np', 'tnp', n_buckets)} AS ll1,
                   {nb_loglik_sql('nn', 'tnn', n_buckets)} AS ll0
            FROM cnt CROSS JOIN prior)"""


def _nb_quality_sql() -> str:
    """Naive Bayes fit-report oracle: the chain, then the exact integer
    log-score decision replayed per row."""
    from open_ftth_relational_projector_spark.functions.bayes import (
        nb_out_sql,
    )

    return f"""{_nb_chain_sql()},
    scored AS (SELECT bk.y, pr1 + l1.ll1 + l2.ll1 AS s1,
                      pr0 + l1.ll0 + l2.ll0 AS s0, pr1
               FROM buck bk
               JOIN lik l1 ON l1.feat = 1 AND l1.b = bk.b1
               JOIN lik l2 ON l2.feat = 2 AND l2.b = bk.b2
               CROSS JOIN prior)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(y) AS BIGINT) AS n_pos,
           {nb_out_sql('pr1')} AS prior_pos,
           ROUND(SUM(CASE WHEN (s1 > s0) = (y = 1) THEN 1 ELSE 0 END)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS accuracy
    FROM scored
    GROUP BY pr1
    """


@_q("naive_bayes_quality", _nb_quality_sql())
def naive_bayes_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed Naive Bayes is-English filter over (kilochars,
    space-ratio) — the counting classifier of the curation-filter
    family (functions/bayes.nb_fit): one grid pass + one bucketing pass
    + one ≤2·B-row count reduce train the model; scoring is map-only
    with the model broadcast. Exact integer log-score decision."""
    from open_ftth_relational_projector_spark.functions.bayes import (
        nb_fit,
        nb_summary,
    )

    docs = load_table(spark, sf_dir, "documents")
    bucketed, prior, lik = nb_fit(
        docs, _LOGREG_X1, _LOGREG_X2, _LOGREG_Y, n_buckets=16,
        where=_LOGREG_WHERE,
    )
    return nb_summary(bucketed, prior, lik)


def _nb_lik_sql() -> str:
    """Per-bucket likelihood-table oracle: the chain's lik CTE."""
    from open_ftth_relational_projector_spark.functions.bayes import (
        nb_out_sql,
    )

    return f"""{_nb_chain_sql()}
    SELECT feat, b, np AS n_pos, nn AS n_neg,
           {nb_out_sql('ll1')} AS ll_pos,
           {nb_out_sql('ll0')} AS ll_neg
    FROM lik
    ORDER BY feat, b
    """


@_q("naive_bayes_bucket_likelihoods", _nb_lik_sql())
def naive_bayes_bucket_likelihoods(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The Naive Bayes model itself, human-auditable: per (feature,
    bucket) class counts and Laplace-smoothed log-likelihoods — the
    WOE-table treatment of the counting classifier (≤ 2·B rows at any
    corpus size)."""
    from open_ftth_relational_projector_spark.functions.bayes import (
        nb_fit,
        nb_out_sql,
    )

    docs = load_table(spark, sf_dir, "documents")
    _, _, lik = nb_fit(
        docs, _LOGREG_X1, _LOGREG_X2, _LOGREG_Y, n_buckets=16,
        where=_LOGREG_WHERE,
    )
    return lik.selectExpr(
        "feat",
        "b",
        "np AS n_pos",
        "nn AS n_neg",
        f"{nb_out_sql('ll1')} AS ll_pos",
        f"{nb_out_sql('ll0')} AS ll_neg",
    ).orderBy("feat", "b")
