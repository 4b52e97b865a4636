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
