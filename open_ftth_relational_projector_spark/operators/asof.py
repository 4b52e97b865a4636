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

from pyspark.sql import DataFrame, Window as W, functions as F


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

    v = versions.select(
        *keys,
        F.col(version_seq).alias("_seq"),
        F.lit(0).alias("_side"),
        F.struct(*[F.col(c) for c in version_cols]).alias("_vstate"),
        *[F.lit(None).cast(facts.schema[c].dataType).alias(c) for c in fact_payload],
    )
    f = facts.select(
        *keys,
        F.col(fact_seq).alias("_seq"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(v.schema["_vstate"].dataType).alias("_vstate"),
        *fact_payload,
    )

    # Equal-seq tiebreak: under strict the fact must NOT see a co-sequenced
    # version, so facts sort first (the -1 frame end then excludes it); under
    # non-strict versions sort first so the frame-end-0 includes them. Event
    # seqs are globally unique in the reference log, so this is belt-and-braces.
    tiebreak = (-F.col("_side")) if strict else F.col("_side")
    w = (
        W.partitionBy(*keys)
        .orderBy(F.col("_seq"), tiebreak)
        .rowsBetween(W.unboundedPreceding, -1 if strict else 0)
    )

    joined = (
        v.unionByName(f)
        .withColumn("_asof", F.last("_vstate", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
    )
    return joined.select(
        *keys,
        F.col("_seq").alias(fact_seq),
        *fact_payload,
        *[F.col(f"_asof.{c}").alias(c) for c in version_cols],
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
    packed = versions.groupBy(*keys).agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col(version_seq).alias("_vseq"),
                    F.struct(*[F.col(c) for c in version_cols]).alias("_vstate"),
                )
            )
        ).alias("_vtl")
    )
    out = facts.join(F.broadcast(packed), keys, "left")
    if strict:
        cond = lambda v: v["_vseq"] < F.col(fact_seq)  # noqa: E731
    else:
        cond = lambda v: v["_vseq"] <= F.col(fact_seq)  # noqa: E731
    hits = F.filter(F.col("_vtl"), cond)
    pick = F.when(F.size(hits) > 0, F.element_at(hits, -1)["_vstate"])
    return out.select(
        *facts.columns, *[pick[c].alias(c) for c in version_cols]
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
