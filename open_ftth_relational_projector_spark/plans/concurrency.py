"""Concurrent Spark job submission for independent outputs.

The engine's unit of output is a TABLE (8 standing projections + the slack
aux set), and the tables are independent once the shared substreams/state
are cached — but a naive ``for df in tables: df.count()`` runs them as
serial jobs. The Spark scheduler happily runs jobs from multiple driver
threads at once (each job's stages fill free task slots), so materializing
N independent tables is an embarrassingly-parallel fan-out.

Scale note: on a cluster this is exactly how independent sink writes
overlap — N writer jobs in flight, each bounded by its own shuffle, sharing
the executor pool. Locally (local[32] with 8-partition domain jobs) serial
materialization leaves 3/4 of the cores idle; concurrent submission hides
per-job scheduling latency behind real work. Shared lazy caches (persisted
typed substreams, the folded span state) are primed by whichever job gets
there first; concurrent first-touch can duplicate a partition's compute,
which is bounded by (worker threads × partition cost) and is still a large
net win — prime explicitly first if that ever matters.
"""

from __future__ import annotations

from collections.abc import Callable, Mapping
from concurrent.futures import ThreadPoolExecutor
from typing import TypeVar

T = TypeVar("T")

DEFAULT_WORKERS = 8


def run_concurrent(
    thunks: Mapping[str, Callable[[], T]], max_workers: int = DEFAULT_WORKERS
) -> dict[str, T]:
    """Run named thunks on a thread pool; return {name: result}.

    Each thunk typically triggers one Spark action (count / toArrow /
    write). Exceptions propagate — the first failing thunk's error is
    raised after all threads settle (futures are all resolved), so a
    failed fan-out never leaks running jobs unobserved.
    """
    if len(thunks) <= 1:
        return {k: fn() for k, fn in thunks.items()}
    with ThreadPoolExecutor(max_workers=max_workers) as ex:
        futures = {name: ex.submit(fn) for name, fn in thunks.items()}
        results: dict[str, T] = {}
        errors: list[Exception] = []
        for name, fut in futures.items():
            try:
                results[name] = fut.result()
            except Exception as exc:  # noqa: BLE001 - re-raised below
                errors.append(exc)
        if errors:
            raise errors[0]
        return results


def materialize_counts(
    tables: Mapping[str, "object"], max_workers: int = DEFAULT_WORKERS
) -> dict[str, int]:
    """Count every table concurrently (benchmark/materialization helper)."""
    return run_concurrent(
        {name: (lambda d=df: d.count()) for name, df in tables.items()},
        max_workers=max_workers,
    )
