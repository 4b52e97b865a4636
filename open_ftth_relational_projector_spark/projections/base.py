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

from open_ftth_relational_projector_spark.operators.lww import untouched


def _normalize(
    part: DataFrame,
    key: str,
    fields: dict[str, str],
    seq_col: str,
    is_base: bool,
    is_removal: bool = False,
) -> DataFrame:
    cols = [F.col(key), F.col(seq_col)]
    for f, dtype in fields.items():
        cols.append(F.col(f) if f in part.columns else untouched(dtype).alias(f))
    cols.append(
        (F.col(seq_col) if is_base else F.lit(None).cast("long")).alias("_cseq")
    )
    cols.append(
        (F.col(seq_col) if is_removal else F.lit(None).cast("long")).alias("_rseq")
    )
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
    parts = [_normalize(b, key, fields, seq_col, is_base=True) for b in bases]
    parts += [_normalize(u, key, fields, seq_col, is_base=False) for u in updates]
    if removals is not None:
        parts.append(
            _normalize(
                removals, key, fields, seq_col, is_base=False, is_removal=True
            )
        )
    unioned = reduce(lambda a, b: a.unionByName(b), parts)

    aggs = [
        F.max_by(F.col(f), F.when(F.col(f).isNotNull(), F.col(seq_col))).alias(f)
        for f in fields
    ]
    folded = unioned.groupBy(key).agg(
        *aggs,
        F.max("_cseq").alias("_created_seq"),
        F.max("_rseq").alias("_removed_seq"),
    )
    live = folded.filter(
        F.col("_created_seq").isNotNull()
        & (
            F.col("_removed_seq").isNull()
            | (F.col("_removed_seq") < F.col("_created_seq"))
        )
    )
    return live.select(
        key,
        *[F.col(f"{f}.v").alias(f) for f in fields],
        "_created_seq",
    )
