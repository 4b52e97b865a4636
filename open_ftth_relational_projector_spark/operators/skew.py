"""Skew mitigation: salting for hot keys (the manual path; AQE's skew-join
splitting — enabled in session.py — is the automatic one).

At 100 TB a handful of hot entity keys (a mega-walk interest, a stop-shingle
in dedup) can pin one reducer. Salting splits a hot key across ``n_salts``
partial groups and merges the partials — the classic two-stage aggregation.
Results are EXACTLY equal to the unsalted form for decomposable aggregates
(count/sum/min/max); the salt never leaks into the output.

For joins where both sides are large and one has hot keys:
``with_salt`` the skewed fact side and ``replicate_for_salt`` the other
side, then join on (key, salt). Replication factor × small side must stay
below the fact side's skew win to pay off.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F


def with_salt(df: DataFrame, n_salts: int = 32, col_name: str = "_salt") -> DataFrame:
    """Deterministic per-row salt in [0, n_salts): hash of the whole row.

    Deterministic (vs F.rand) so retried tasks salt identically — required
    for exactly-once sinks under task retry.
    """
    return df.withColumn(
        col_name, F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    )


def replicate_for_salt(
    df: DataFrame, n_salts: int = 32, col_name: str = "_salt"
) -> DataFrame:
    """Cross the build side with salt ids 0..n_salts-1 so every salted
    probe partition finds its match."""
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    return df.withColumn(col_name, salts)


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    partial: dict[str, Column],
    merge: dict[str, Column],
    n_salts: int = 32,
) -> DataFrame:
    """Two-stage aggregation: groupBy(keys + salt) computing ``partial``
    (name → agg expr over input columns), then groupBy(keys) computing
    ``merge`` (name → agg expr over the partial columns). Exact for any
    decomposable aggregate.
    """
    staged = (
        with_salt(df, n_salts)
        .groupBy(*keys, "_salt")
        .agg(*[expr.alias(name) for name, expr in partial.items()])
    )
    return staged.groupBy(*keys).agg(
        *[expr.alias(name) for name, expr in merge.items()]
    )


def salted_count(df: DataFrame, keys: Sequence[str], n_salts: int = 32) -> DataFrame:
    """count(*) per key, skew-safe."""
    return salted_aggregate(
        df,
        keys,
        partial={"_c": F.count(F.lit(1))},
        merge={"cnt": F.sum("_c")},
        n_salts=n_salts,
    )


def salted_sum(
    df: DataFrame, keys: Sequence[str], value_col: str, n_salts: int = 32
) -> DataFrame:
    """sum(value) per key, skew-safe."""
    return salted_aggregate(
        df,
        keys,
        partial={"_s": F.sum(value_col)},
        merge={f"sum_{value_col}": F.sum("_s")},
        n_salts=n_salts,
    )
