"""Decision-stump rule induction — interpretable quality-filter training.

The "one simple rule" companion to the logistic classifier
(functions/regression.logreg_fit_irls): pick the single best threshold
rule ``x_f ≤ t`` over the candidate features — the 1R / CART-root shape a
curation pipeline ships when the filter must be human-auditable
("drop documents with space_ratio ≤ 0.12").

Algorithm (two scans + bounded small-table arithmetic, any corpus size):

  1. One aggregation pass → per-feature integer min/max of the PINNED
     features (x̃ = round(x·10^4) BIGINT — the logreg pin).
  2. Equal-width integer bucketing into ≤ B buckets per feature (widths
     derived from min/max in exact integer arithmetic); one grouped
     aggregation → per-(feature, bucket) class counts. That table is
     ≤ 2·B rows — everything after is arithmetic on a tiny frame.
  3. Candidate split at every interior bucket edge; left counts by a
     cumulative sum over the per-feature bucket table (window
     PARTITIONED by feature — bounded partitions, never a global
     window); split quality = total MISCLASSIFICATION COUNT
     min(np_l, nn_l) + min(np_r, nn_r) — pure integers, so the argmin
     (tie-break: lowest score, then feature id, then bucket) is exactly
     deterministic cross-engine. No Gini ratio, no float compare.

Determinism: the pins make every count exact; the two FLOOR-of-division
expressions (bucket width, bucket id) divide integers ≤ ~2·10^5 whose
quotient is either exact or ≥ 1/W away from an integer — 12+ orders
above double ulp, so FLOOR cannot be flipped by the one correctly-rounded
division (rationale mirrors functions/clustering.py's quantified-pin
note). The SQL oracle builds every value-determining expression from the
helpers below (twin by construction).

Reference parity note: extension family (README "LLM-pipeline surface"),
no counterpart in the reference engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

from open_ftth_relational_projector_spark.functions.regression import (
    PIN_NOTNULL,
    logreg_xpin_sql,
)


def stump_width_sql(minv: str, maxv: str, n_buckets: int) -> str:
    """Shared-text integer bucket width: FLOOR((max−min)/B) + 1 —
    guarantees max's bucket index ≤ B−1 and width ≥ 1."""
    return (
        f"CAST(FLOOR(({maxv} - {minv}) / CAST({n_buckets} AS DOUBLE))"
        f" AS BIGINT) + 1"
    )


def stump_bucket_sql(x: str, minv: str, width: str) -> str:
    """Shared-text bucket id: FLOOR((x̃−min)/W) over exact integers."""
    return f"CAST(FLOOR(({x} - {minv}) / CAST({width} AS DOUBLE)) AS BIGINT)"


def stump_score_sql(cnp: str, cnn: str, tnp: str, tnn: str) -> str:
    """Shared-text split quality: misclassified count if each side
    predicts its majority class — exact BIGINT."""
    return (
        f"(LEAST({cnp}, {cnn}) + LEAST({tnp} - {cnp}, {tnn} - {cnn}))"
    )


def stump_threshold_sql(minv: str, bucket: str, width: str) -> str:
    """Shared-text real-units threshold: the largest pinned value in the
    left side, unpinned (exact integer arithmetic, one division; can be
    negative and round to ±0 → signed-zero-normalized)."""
    return f"ROUND(({minv} + ({bucket} + 1) * {width} - 1) / 1e4, 6) + 0"


def stump_fit(
    df: DataFrame,
    x1: str,
    x2: str,
    y: str,
    n_buckets: int = 64,
    where: str | None = None,
) -> DataFrame:
    """Fit the best single threshold rule over (x1, x2); returns ONE row:
    (feat, threshold, n_left, left_np, left_nn, n_right, right_np,
    right_nn, split_miscls, baseline_miscls). ``feat`` is 1 or 2;
    the rule is ``x_feat ≤ threshold``; baseline_miscls is the
    no-split majority-class error for lift-at-a-glance.

    Scale shape: one min/max aggregation + one per-(feature, bucket)
    grouped aggregation (map-side combined, ≤ 2·B groups); everything
    downstream runs on ≤ 2·B rows. Constant features contribute no
    candidates; if both are constant the result is empty (no rule
    exists)."""
    base = df.filter(F.expr(where)) if where else df
    pinned = base.selectExpr(
        f"CAST({y} AS BIGINT) AS y",
        f"{logreg_xpin_sql(x1)} AS x1",
        f"{logreg_xpin_sql(x2)} AS x2",
    ).filter(
        # NULL raw features would put a NULL bucket row into the
        # cumulative b-ordered window, where Spark defaults to NULLS
        # FIRST and DuckDB to NULLS LAST — the cumulative class counts
        # (hence the split/WOE) would diverge cross-engine. Dropping
        # NULL-pinned rows makes the non-null contract structural
        # instead of caller-guaranteed (r8 advisor note).
        PIN_NOTNULL
    ).localCheckpoint(eager=True)
    st = pinned.agg(
        F.expr("MIN(x1)").alias("lo1"),
        F.expr("MAX(x1)").alias("hi1"),
        F.expr("MIN(x2)").alias("lo2"),
        F.expr("MAX(x2)").alias("hi2"),
        F.expr("CAST(SUM(y) AS BIGINT)").alias("tnp"),
        F.expr("CAST(SUM(1 - y) AS BIGINT)").alias("tnn"),
    ).selectExpr(
        "lo1", "lo2", "tnp", "tnn",
        f"{stump_width_sql('lo1', 'hi1', n_buckets)} AS w1",
        f"{stump_width_sql('lo2', 'hi2', n_buckets)} AS w2",
        # one-row frame, checkpointed: it feeds three consumers
        # (bucketing, scoring, output) and would otherwise re-run the
        # full-corpus min/max aggregation once per consumer
    ).localCheckpoint(eager=True)
    tagged = pinned.crossJoin(F.broadcast(st))
    per = (
        tagged.selectExpr(
            "y",
            f"{stump_bucket_sql('x1', 'lo1', 'w1')} AS b1",
            f"{stump_bucket_sql('x2', 'lo2', 'w2')} AS b2",
        )
        .selectExpr(
            "y",
            "stack(2, 1, b1, 2, b2) AS (feat, b)",
        )
        .groupBy("feat", "b")
        .agg(
            F.expr("CAST(SUM(y) AS BIGINT)").alias("np"),
            F.expr("CAST(SUM(1 - y) AS BIGINT)").alias("nn"),
        )
    )
    w = W.partitionBy("feat").orderBy("b").rowsBetween(W.unboundedPreceding, 0)
    cum = per.select(
        "feat",
        "b",
        F.sum("np").over(w).alias("cnp"),
        F.sum("nn").over(w).alias("cnn"),
        F.max("b").over(W.partitionBy("feat")).alias("maxb"),
    )
    cand = (
        cum.filter("b < maxb")
        .crossJoin(F.broadcast(st))
        .selectExpr(
            "feat",
            "b",
            "cnp",
            "cnn",
            f"{stump_score_sql('cnp', 'cnn', 'tnp', 'tnn')} AS score",
        )
    )
    best = cand.orderBy("score", "feat", "b").limit(1)
    return (
        best.crossJoin(F.broadcast(st))
        .selectExpr(
            "feat",
            "CASE WHEN feat = 1 THEN"
            f" {stump_threshold_sql('lo1', 'b', 'w1')}"
            " ELSE"
            f" {stump_threshold_sql('lo2', 'b', 'w2')}"
            " END AS threshold",
            "cnp + cnn AS n_left",
            "cnp AS left_np",
            "cnn AS left_nn",
            "tnp + tnn - cnp - cnn AS n_right",
            "tnp - cnp AS right_np",
            "tnn - cnn AS right_nn",
            "score AS split_miscls",
            "LEAST(tnp, tnn) AS baseline_miscls",
        )
    )


def tree_fit_depth2(
    df: DataFrame,
    x1: str,
    x2: str,
    y: str,
    n_buckets: int = 64,
    where: str | None = None,
) -> DataFrame:
    """Depth-2 tree: the stump's root split, then the best split INSIDE
    each side — up to 4 leaves, every split chosen by the same exact
    integer misclassification argmin. Child candidate thresholds reuse
    the ROOT's bucket grid (one global min/max pass — children do not
    re-derive widths; a contract choice that keeps the plan at three
    scans total and the oracle finite).

    Returns up to 3 rows — (node 'root'|'L'|'R', feat, threshold,
    n_left, left_np, left_nn, n_right, right_np, right_nn,
    split_miscls, baseline_miscls) — where a child row's baseline is its
    side's majority-class error (so lift per node is visible) and a pure
    or single-bucket side simply has no row.

    Scale shape: scan 1 = min/max + totals; scan 2 = root per-(feature,
    bucket) counts; scan 3 = per-(side, feature, bucket) counts with the
    one-row root split broadcast. All argmin work happens on ≤ 4·B-row
    frames."""
    base = df.filter(F.expr(where)) if where else df
    pinned = base.selectExpr(
        f"CAST({y} AS BIGINT) AS y",
        f"{logreg_xpin_sql(x1)} AS x1",
        f"{logreg_xpin_sql(x2)} AS x2",
    ).filter(
        # NULL raw features would put a NULL bucket row into the
        # cumulative b-ordered window, where Spark defaults to NULLS
        # FIRST and DuckDB to NULLS LAST — the cumulative class counts
        # (hence the split/WOE) would diverge cross-engine. Dropping
        # NULL-pinned rows makes the non-null contract structural
        # instead of caller-guaranteed (r8 advisor note).
        PIN_NOTNULL
    ).localCheckpoint(eager=True)
    st = pinned.agg(
        F.expr("MIN(x1)").alias("lo1"),
        F.expr("MAX(x1)").alias("hi1"),
        F.expr("MIN(x2)").alias("lo2"),
        F.expr("MAX(x2)").alias("hi2"),
        F.expr("CAST(SUM(y) AS BIGINT)").alias("tnp"),
        F.expr("CAST(SUM(1 - y) AS BIGINT)").alias("tnn"),
    ).selectExpr(
        "lo1", "lo2", "tnp", "tnn",
        f"{stump_width_sql('lo1', 'hi1', n_buckets)} AS w1",
        f"{stump_width_sql('lo2', 'hi2', n_buckets)} AS w2",
    ).localCheckpoint(eager=True)

    bucketed = pinned.crossJoin(F.broadcast(st)).selectExpr(
        "y",
        f"{stump_bucket_sql('x1', 'lo1', 'w1')} AS b1",
        f"{stump_bucket_sql('x2', 'lo2', 'w2')} AS b2",
    ).localCheckpoint(eager=True)

    def _split_candidates(per: DataFrame, group: list[str]) -> DataFrame:
        """per: (*group, feat, b, np, nn) counts → scored candidate rows
        (*group, feat, b, cnp, cnn, gnp, gnn, score). Every window here
        partitions by at least ``feat`` — no global window even when
        ``group`` is empty (the root call), keeping the module contract
        auditable at the plan level."""
        w = (
            W.partitionBy(*group, "feat")
            .orderBy("b")
            .rowsBetween(W.unboundedPreceding, 0)
        )
        # totals come from the per-FEATURE partition (each row appears
        # once per feature in the stacked frame; a per-group window would
        # double-count every document)
        wt = W.partitionBy(*group, "feat")
        cum = per.select(
            *group,
            "feat",
            "b",
            F.sum("np").over(w).alias("cnp"),
            F.sum("nn").over(w).alias("cnn"),
            F.max("b").over(wt).alias("maxb"),
            F.sum("np").over(wt).alias("gnp"),
            F.sum("nn").over(wt).alias("gnn"),
        )
        return cum.filter("b < maxb").selectExpr(
            *group,
            "feat",
            "b",
            "cnp",
            "cnn",
            "gnp",
            "gnn",
            f"{stump_score_sql('cnp', 'cnn', 'gnp', 'gnn')} AS score",
        )

    def _best_splits(per: DataFrame, group: list[str]) -> DataFrame:
        """One best-split row per group key (empty if no candidates)."""
        rw = W.partitionBy(*group).orderBy("score", "feat", "b")
        return (
            _split_candidates(per, group)
            .withColumn("_rn", F.row_number().over(rw))
            .filter("_rn = 1")
            .drop("_rn")
        )

    root_per = (
        bucketed.selectExpr("y", "stack(2, 1, b1, 2, b2) AS (feat, b)")
        .groupBy("feat", "b")
        .agg(
            F.expr("CAST(SUM(y) AS BIGINT)").alias("np"),
            F.expr("CAST(SUM(1 - y) AS BIGINT)").alias("nn"),
        )
    )
    # root argmin: orderBy + limit(1) (the stump_fit shape) — a
    # row_number window here would have an empty partition spec (the
    # r8 advisor finding: a literal group key folds to a global window)
    root = (
        _split_candidates(root_per, [])
        .orderBy("score", "feat", "b")
        .limit(1)
        .localCheckpoint(eager=True)
    )

    side_per = (
        bucketed.crossJoin(
            F.broadcast(
                root.selectExpr("feat AS rfeat", "b AS rb")
            )
        )
        .selectExpr(
            "CASE WHEN (CASE WHEN rfeat = 1 THEN b1 ELSE b2 END) <= rb"
            " THEN 'L' ELSE 'R' END AS node",
            "y",
            "stack(2, 1, b1, 2, b2) AS (feat, b)",
        )
        .groupBy("node", "feat", "b")
        .agg(
            F.expr("CAST(SUM(y) AS BIGINT)").alias("np"),
            F.expr("CAST(SUM(1 - y) AS BIGINT)").alias("nn"),
        )
    )
    children = _best_splits(side_per, ["node"])

    out_cols = [
        "node",
        "feat",
        "CASE WHEN feat = 1 THEN"
        f" {stump_threshold_sql('lo1', 'b', 'w1')}"
        " ELSE"
        f" {stump_threshold_sql('lo2', 'b', 'w2')}"
        " END AS threshold",
        "cnp + cnn AS n_left",
        "cnp AS left_np",
        "cnn AS left_nn",
        "gnp + gnn - cnp - cnn AS n_right",
        "gnp - cnp AS right_np",
        "gnn - cnn AS right_nn",
        "score AS split_miscls",
        "LEAST(gnp, gnn) AS baseline_miscls",
    ]
    allrows = root.selectExpr("'root' AS node", "*").unionByName(
        children
    )
    return (
        allrows.crossJoin(F.broadcast(st.select("lo1", "lo2", "w1", "w2")))
        .selectExpr(*out_cols)
        .orderBy("node")
    )


def woe_sql(np: str, nn: str, tnp: str, tnn: str) -> str:
    """Shared-text Laplace-smoothed weight of evidence per bucket:
    ln(((np+½)/(tnp+1)) / ((nn+½)/(tnn+1))), rounded 6 dp with
    signed-zero normalization. Smoothing keeps empty-class buckets
    finite; ½ and 1 are spelled 5e-1 / 1e0 (bare decimal literals parse
    as DECIMAL in Spark — the r8 hazard catalog). LN is transcendental:
    the 6-dp pin on a per-bucket output value is the quantified-
    negligible class (≤2·B pinned values per run, ulp/pin ≈ 1e-10)."""
    return (
        f"ROUND(LN((({np} + 5e-1) / ({tnp} + 1e0))"
        f" / (({nn} + 5e-1) / ({tnn} + 1e0))), 6) + 0"
    )


def woe_table(
    df: DataFrame,
    x1: str,
    x2: str,
    y: str,
    n_buckets: int = 16,
    where: str | None = None,
) -> DataFrame:
    """Per-(feature, bucket) weight-of-evidence audit over the stump's
    exact integer bucket grid — the scorecard-style feature-strength
    diagnostic (which ranges of a feature argue for/against the label).
    Returns (feat, b, bucket_lo, np, nn, woe): bucket_lo is the bucket's
    smallest raw-units value; WOE positive ⇒ the bucket leans positive.
    Same scan shape as stump_fit (min/max pass + one grouped count pass;
    everything downstream on ≤ 2·B rows)."""
    base = df.filter(F.expr(where)) if where else df
    pinned = base.selectExpr(
        f"CAST({y} AS BIGINT) AS y",
        f"{logreg_xpin_sql(x1)} AS x1",
        f"{logreg_xpin_sql(x2)} AS x2",
    ).filter(
        # NULL raw features would put a NULL bucket row into the
        # cumulative b-ordered window, where Spark defaults to NULLS
        # FIRST and DuckDB to NULLS LAST — the cumulative class counts
        # (hence the split/WOE) would diverge cross-engine. Dropping
        # NULL-pinned rows makes the non-null contract structural
        # instead of caller-guaranteed (r8 advisor note).
        PIN_NOTNULL
    ).localCheckpoint(eager=True)
    st = pinned.agg(
        F.expr("MIN(x1)").alias("lo1"),
        F.expr("MAX(x1)").alias("hi1"),
        F.expr("MIN(x2)").alias("lo2"),
        F.expr("MAX(x2)").alias("hi2"),
        F.expr("CAST(SUM(y) AS BIGINT)").alias("tnp"),
        F.expr("CAST(SUM(1 - y) AS BIGINT)").alias("tnn"),
    ).selectExpr(
        "lo1", "lo2", "tnp", "tnn",
        f"{stump_width_sql('lo1', 'hi1', n_buckets)} AS w1",
        f"{stump_width_sql('lo2', 'hi2', n_buckets)} AS w2",
    ).localCheckpoint(eager=True)
    per = (
        pinned.crossJoin(F.broadcast(st))
        .selectExpr(
            "y",
            f"{stump_bucket_sql('x1', 'lo1', 'w1')} AS b1",
            f"{stump_bucket_sql('x2', 'lo2', 'w2')} AS b2",
        )
        .selectExpr("y", "stack(2, 1, b1, 2, b2) AS (feat, b)")
        .groupBy("feat", "b")
        .agg(
            F.expr("CAST(SUM(y) AS BIGINT)").alias("np"),
            F.expr("CAST(SUM(1 - y) AS BIGINT)").alias("nn"),
        )
    )
    return (
        per.crossJoin(F.broadcast(st))
        .selectExpr(
            "feat",
            "b",
            "CASE WHEN feat = 1 THEN ROUND((lo1 + b * w1) / 1e4, 6) + 0"
            " ELSE ROUND((lo2 + b * w2) / 1e4, 6) + 0 END AS bucket_lo",
            "np",
            "nn",
            f"{woe_sql('np', 'nn', 'tnp', 'tnn')} AS woe",
        )
        .orderBy("feat", "b")
    )
