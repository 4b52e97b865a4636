"""Shared registration state for the query catalog package.

Family modules register via the ``_q`` decorator; ``catalog/__init__``
imports them in a fixed order and then applies the driver-window reorder.

Caching convention (r13): catalog functions return LAZY DataFrames, so a
``.persist()`` placed inside one (to stop a multi-consumer sub-pipeline
re-executing per consumer) cannot be paired with an ``unpersist()`` at
the call site — the action happens later, in the caller. Such persists
go through ``cache.tracked_persist``: long-lived callers (bench.py,
scripts/check_oracle.py) call ``cache.release_tracked_persists(spark)``
after each query's action, giving every catalog-created cache a
query-scoped lifetime instead of the pre-r13 session lifetime (which
silently warmed later queries in shared sessions and leaked executor
memory at scale — r12 verdict items 1-2). Callers that do not release
still fall back to Spark's LRU block eviction, which is correctness-free
for the DETERMINISTIC frames catalog functions persist (the frame just
recomputes to the same values). Caveat: eviction/release recompute with
fresh evaluation, so persist() is NOT a durability guarantee for
rand()-derived frames — operators with a value-determinism contract on
their input (operators/hierarchical, operators/quantiles) must not be
fed a persisted nondeterministic frame; derive determinism from the data
(hash columns), as every catalog entry does.

Laziness exception: entries built on ``operators/quantiles.
exact_quantiles`` (and anything else on ``operators/hierarchical``'s
collected shard offsets) run bounded cluster jobs at DataFrame
CONSTRUCTION time — the shard-bound sample and per-shard counts collect
execute when the catalog function is CALLED, not at the later action.
Plan-only callers (audits, speculative construction) therefore pay those
jobs; the collected offsets are frozen at construction, which is exactly
the value-determinism contract above. The operator docstring carries the
same warning. The iterative fits are in this class too — pagerank,
power-iteration factorization, logreg/tree training — their per-iteration
``localCheckpoint(eager=True)`` state pins run the (bounded-state)
iteration jobs at construction; the returned frame is a flat plan over
the final checkpointed state.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

QueryFn = Callable[[SparkSession, str], DataFrame]

SPARK_QUERIES: dict[str, QueryFn] = {}
ORACLE_SQL: dict[str, str] = {}


def _q(name: str, sql: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        SPARK_QUERIES[name] = fn
        if sql is not None:
            ORACLE_SQL[name] = sql
        return fn

    return deco


def _r4(col):
    return F.round(col, 4)
