"""Entity-fold helper: the declarative rewrite of ``dict[id] = state``.

Every reference projection is: creations define all fields; update events
overwrite a subset; removals delete; latest creation starts a fresh epoch.
That whole protocol reduces to ONE keyed aggregation over touch-marker rows
(operators/lww.py): a creation is a row touching every field, an update is a
row touching its subset, and per-field ``max_by(marker, seq-if-touched)``
yields the final state. Updates that precede the last creation lose on seq
to the creation's own markers, which reproduces epoch semantics exactly; an
update without any creation is dropped by the inner join on creation keys
(the reference's guarded ContainsKey no-ops, ProjektorState.cs:551, 604, 633).

Cost shape: one shuffle on the entity key with map-side partial aggregation,
plus one broadcast-sized join per auxiliary stream — no windows over the full
log, no driver state. This is the 100 TB path.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, functions as F

from open_ftth_relational_projector_spark.operators.lww import (
    latest_touch_by_key,
    untouched,
)


def _normalize(part: DataFrame, key: str, fields: dict[str, str], seq_col: str) -> DataFrame:
    cols = [F.col(key), F.col(seq_col)]
    for f, dtype in fields.items():
        cols.append(F.col(f) if f in part.columns else untouched(dtype).alias(f))
    return part.select(*cols)


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
    parts = [_normalize(p, key, fields, seq_col) for p in [*bases, *updates]]
    unioned = reduce(lambda a, b: a.unionByName(b), parts)
    folded = latest_touch_by_key(unioned, key, list(fields), seq_col)

    created = (
        reduce(lambda a, b: a.unionByName(b), [b.select(key, seq_col) for b in bases])
        .groupBy(key)
        .agg(F.max(seq_col).alias("_created_seq"))
    )
    out = folded.join(created, key, "inner")

    if removals is not None:
        last_rm = removals.groupBy(key).agg(F.max(seq_col).alias("_removed_seq"))
        out = (
            out.join(last_rm, key, "left")
            .filter(
                F.col("_removed_seq").isNull()
                | (F.col("_removed_seq") < F.col("_created_seq"))
            )
            .drop("_removed_seq")
        )

    return out.select(
        key,
        *[F.col(f"{f}.v").alias(f) for f in fields],
        "_created_seq",
    )
