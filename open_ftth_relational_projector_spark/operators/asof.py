"""As-of (temporal) join — state-at-event-time lookups (SURVEY §2.3 J1-J5).

The reference fold looks mutable dictionaries up *at event time*: e.g. a
terminal-equipment placement reads ``_nodeContainerToRouteNodeRelation`` as it
stood when the placement event arrived (ProjektorState.cs:536-537), and a
node-container placement reads the spec registry as of that moment
(ProjektorState.cs:56). A plain final-state join would be wrong whenever the
looked-up state changed later. The faithful relational rewrite is an as-of
join: for each fact row, take the version row with the greatest version
sequence strictly below the fact's sequence.

Implementation: union the two sides tagged by origin, then a single
``last(..., ignorenulls=True)`` running window per key. One shuffle on the
join key, no per-fact probe, no driver state — linear in input at any scale.
Spark's range-join alternative (fact.seq BETWEEN v.start AND v.end) needs the
version intervals materialized first; the union-window form skips that pass.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F


def asof_join(
    facts: DataFrame,
    versions: DataFrame,
    key: str | Sequence[str],
    fact_seq: str = "seq",
    version_seq: str = "seq",
    version_cols: Sequence[str] | None = None,
    strict: bool = True,
) -> DataFrame:
    """For each fact row, attach the latest version row as of the fact's seq.

    strict=True → version.seq < fact.seq (the reference applies events in
    total order, so a lookup only ever sees strictly earlier events).
    Version rows whose value columns are all NULL act as tombstones only if
    the caller models them that way (the struct wrapper below keeps a
    deletion distinguishable: the marker is non-null, its fields are null).
    """
    keys = [key] if isinstance(key, str) else list(key)
    if version_cols is None:
        version_cols = [c for c in versions.columns if c not in keys and c != version_seq]

    fact_payload = [c for c in facts.columns if c not in keys and c != fact_seq]

    # String-built selects: the per-column Column-API chains here cost ~5
    # py4j round trips per column per call, and the projection engine calls
    # this operator once per as-of lookup — construction latency, not data
    # cost. Semantics unchanged (same expression trees after parsing).
    keyq = [f"`{k}`" for k in keys]
    vstruct = ", ".join(f"`{c}`" for c in version_cols)
    v = versions.selectExpr(
        *keyq,
        f"`{version_seq}` AS _seq",
        "0 AS _side",
        f"struct({vstruct}) AS _vstate",
        *[
            f"CAST(NULL AS {facts.schema[c].dataType.simpleString()}) AS `{c}`"
            for c in fact_payload
        ],
    )
    f = facts.selectExpr(
        *keyq,
        f"`{fact_seq}` AS _seq",
        "1 AS _side",
        f"CAST(NULL AS {v.schema['_vstate'].dataType.simpleString()}) AS _vstate",
        *[f"`{c}`" for c in fact_payload],
    )

    # Equal-seq tiebreak: under strict the fact must NOT see a co-sequenced
    # version, so facts sort first (the 1-PRECEDING frame end then excludes
    # it); under non-strict versions sort first so the CURRENT-ROW frame end
    # includes them. Event seqs are globally unique in the reference log, so
    # this is belt-and-braces.
    side_order = "DESC" if strict else "ASC"
    frame_end = "1 PRECEDING" if strict else "CURRENT ROW"
    joined = (
        v.unionByName(f)
        .selectExpr(
            "*",
            f"last(_vstate, true) OVER (PARTITION BY {', '.join(keyq)}"
            f" ORDER BY _seq, _side {side_order}"
            f" ROWS BETWEEN UNBOUNDED PRECEDING AND {frame_end}) AS _asof",
        )
        .filter("_side = 1")
    )
    return joined.selectExpr(
        *keyq,
        f"_seq AS `{fact_seq}`",
        *[f"`{c}`" for c in fact_payload],
        *[f"_asof.`{c}` AS `{c}`" for c in version_cols],
    )


def asof_join_broadcast(
    facts: DataFrame,
    versions: DataFrame,
    key: str | Sequence[str],
    fact_seq: str = "seq",
    version_seq: str = "seq",
    version_cols: Sequence[str] | None = None,
    strict: bool = True,
) -> DataFrame:
    """As-of join against a BROADCAST-SIZED version stream — zero fact shuffle.

    The union-window form (asof_join) shuffles the fact stream on the join
    key. When the version side is a dimension REGISTRY (spec registrations:
    thousands of rows however big the fact log gets — ProjektorState.cs:56,
    122 style lookups), that shuffle is pure waste: pack each key's version
    timeline into one sorted array row, broadcast the packed table, and
    probe it per fact with an array scan. The fact side stays in whatever
    partitioning it already had — no exchange, no window sort, and the
    probe stays inside whole-stage codegen.

    Do NOT use when versions scale with the data (per-entity relations,
    per-equipment registries): one row per key must fit in a broadcast.
    """
    keys = [key] if isinstance(key, str) else list(key)
    if version_cols is None:
        version_cols = [
            c for c in versions.columns if c not in keys and c != version_seq
        ]
    # String-built (see asof_join): sort_array orders by the leading _vseq
    # field, same as the Column form.
    vstruct = ", ".join(f"`{c}`" for c in version_cols)
    packed = versions.groupBy(*keys).agg(
        F.expr(
            f"sort_array(collect_list(struct(`{version_seq}` AS _vseq,"
            f" struct({vstruct}) AS _vstate))) AS _vtl"
        )
    )
    out = facts.join(F.broadcast(packed), keys, "left")
    op = "<" if strict else "<="
    hits = f"filter(_vtl, v -> v._vseq {op} `{fact_seq}`)"
    factq = [f"`{c}`" for c in facts.columns]
    picked = out.selectExpr(
        *factq,
        f"CASE WHEN size({hits}) > 0 THEN element_at({hits}, -1)._vstate END"
        " AS _pick",
    )
    return picked.selectExpr(
        *factq, *[f"_pick.`{c}` AS `{c}`" for c in version_cols]
    )


def asof_join_directed(
    facts: DataFrame,
    versions: DataFrame,
    key: str | Sequence[str],
    fact_seq: str = "seq",
    version_seq: str = "seq",
    version_cols: Sequence[str] | None = None,
    direction: str = "backward",
    strict: bool = True,
    tolerance: int | float | None = None,
    fact_id: str | None = None,
) -> DataFrame:
    """Directional/tolerance as-of join — the full pandas-``merge_asof``
    surface on top of the union-window technique:

    * direction="backward" — latest version at-or-before the fact with
      ``strict=False``; the default ``strict=True`` excludes the
      equal-seq version, i.e. strictly-before (the base asof_join);
    * direction="forward" — EARLIEST version at-or-after the fact with
      ``strict=False`` (strictly-after under the default
      ``strict=True``), run as a backward as-of over negated sequence
      numbers (one extra column, same single-shuffle plan);
    * direction="nearest" — closer of the two, ties to backward; needs
      ``fact_id`` (a unique fact key) to align the two passes, and costs
      two as-of shuffles plus one fact-keyed join.

    ``tolerance`` (same units as the seq columns) nulls out matches
    farther than the bound while KEEPING the fact row — left-join
    semantics, exactly pandas' tolerance contract.

    Every output gains ``matched_seq`` (the matched version's seq, null
    when unmatched/out-of-tolerance) so callers can compute gaps without
    re-deriving the match. Sequences must be numeric (negation is the
    forward trick) and unique per (key, seq) on the version side for
    deterministic tie-breaks — same precondition as asof_join.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction: {direction!r}")
    keys = [key] if isinstance(key, str) else list(key)
    if version_cols is None:
        version_cols = [
            c for c in versions.columns if c not in keys and c != version_seq
        ]
    vcols = [*version_cols, "matched_seq"]

    def one_side(back: bool) -> DataFrame:
        v2 = versions.withColumn("matched_seq", F.col(version_seq))
        if back:
            out = asof_join(facts, v2, keys, fact_seq, version_seq, vcols, strict)
        else:
            fn = facts.withColumn("_negseq", (-F.col(fact_seq)).alias("_negseq"))
            vn = v2.withColumn("_negseq", -F.col(version_seq))
            out = asof_join(
                fn, vn, keys, "_negseq", "_negseq", vcols, strict
            ).drop("_negseq")
        if tolerance is not None:
            ok = F.abs(F.col(fact_seq) - F.col("matched_seq")) <= tolerance
            for c in vcols:
                out = out.withColumn(c, F.when(ok, F.col(c)))
        return out

    if direction != "nearest":
        return one_side(direction == "backward")

    if fact_id is None:
        raise ValueError("direction='nearest' requires fact_id")
    bw, fw = one_side(True), one_side(False)
    fsel = fw.select(
        F.col(fact_id), *[F.col(c).alias(f"_f_{c}") for c in vcols]
    )
    gap_b = F.col(fact_seq) - F.col("matched_seq")
    gap_f = F.col("_f_matched_seq") - F.col(fact_seq)
    use_b = F.col("matched_seq").isNotNull() & (
        F.col("_f_matched_seq").isNull() | (gap_b <= gap_f)
    )
    out = bw.join(fsel, fact_id)
    for c in vcols:
        out = out.withColumn(c, F.when(use_b, F.col(c)).otherwise(F.col(f"_f_{c}")))
    return out.drop(*[f"_f_{c}" for c in vcols])
