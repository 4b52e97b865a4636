"""Entity-fold helper: the declarative rewrite of ``dict[id] = state``.

Every reference projection is: creations define all fields; update events
overwrite a subset; removals delete; latest creation starts a fresh epoch.
That whole protocol reduces to ONE keyed aggregation over touch-marker rows
(operators/lww.py): a creation is a row touching every field, an update is a
row touching its subset, a removal is a row touching nothing — and per key
we take per-field ``max_by(marker, seq-if-touched)`` plus the max creation
and removal seqs. Updates that precede the last creation lose on seq to the
creation's own markers, which reproduces epoch semantics exactly; an update
without any creation is dropped by the created-seq filter (the reference's
guarded ContainsKey no-ops, ProjektorState.cs:551, 604, 633); a removal
after the last creation drops the row, a removal before it does not
(re-creation revives — ProjektorState.cs epoch behavior).

Cost shape: ONE shuffle on the entity key with map-side partial
aggregation — creations, updates, and removals all ride the same exchange;
no joins, no windows over the full log, no driver state. This is the
100 TB path.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, functions as F


def _normalize(
    part: DataFrame,
    key: str,
    fields: dict[str, str],
    seq_col: str,
    is_base: bool,
    is_removal: bool = False,
) -> DataFrame:
    # One selectExpr with string expressions instead of per-column F.col /
    # untouched().alias() chains: each Column-API call is a py4j round trip,
    # and fold_entity builds (fields+4) columns for every input stream — at
    # 13 fields × 6 streams that alone was ~0.5 s of driver-side latency per
    # projection (constant in data size, but the dominant cost of the bench's
    # toy-scale domain fold). The string form is one round trip per stream.
    have = set(part.columns)
    exprs = [f"`{key}`", f"`{seq_col}`"]
    for f, dtype in fields.items():
        exprs.append(
            f"`{f}`" if f in have else f"CAST(NULL AS struct<v:{dtype}>) AS `{f}`"
        )
    exprs.append(
        f"`{seq_col}` AS _cseq" if is_base else "CAST(NULL AS bigint) AS _cseq"
    )
    exprs.append(
        f"`{seq_col}` AS _rseq" if is_removal else "CAST(NULL AS bigint) AS _rseq"
    )
    return part.selectExpr(*exprs)


def fold_entity(
    bases: list[DataFrame],
    updates: list[DataFrame],
    key: str,
    fields: dict[str, str],
    removals: DataFrame | None = None,
    seq_col: str = "seq",
) -> DataFrame:
    """Fold creation/update/removal streams into final entity state.

    bases/updates: DataFrames carrying (key, seq, touch-marker columns —
    any subset of ``fields``; markers are one-field structs from
    operators.lww.touched). Returns one row per live entity with unwrapped
    field values plus ``_created_seq``.
    """
    parts = [_normalize(b, key, fields, seq_col, is_base=True) for b in bases]
    parts += [_normalize(u, key, fields, seq_col, is_base=False) for u in updates]
    if removals is not None:
        parts.append(
            _normalize(
                removals, key, fields, seq_col, is_base=False, is_removal=True
            )
        )
    unioned = reduce(lambda a, b: a.unionByName(b), parts)

    # F.expr string per aggregate (1 round trip) instead of
    # max_by(col, when(...)) chains (~6 round trips each).
    aggs = [
        F.expr(
            f"max_by(`{f}`, CASE WHEN `{f}` IS NOT NULL"
            f" THEN `{seq_col}` END) AS `{f}`"
        )
        for f in fields
    ]
    folded = unioned.groupBy(key).agg(
        *aggs,
        F.expr("max(_cseq) AS _created_seq"),
        F.expr("max(_rseq) AS _removed_seq"),
    )
    live = folded.filter(
        "_created_seq IS NOT NULL AND"
        " (_removed_seq IS NULL OR _removed_seq < _created_seq)"
    )
    return live.selectExpr(
        f"`{key}`",
        *[f"`{f}`.v AS `{f}`" for f in fields],
        "_created_seq",
    )
