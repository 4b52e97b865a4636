"""Stream-stream interval join (Structured Streaming's two-sided state).

The one streaming surface the keyed-state folds don't exercise: BOTH
sides of a join arriving as unbounded streams, matched on an equality
key plus an EVENT-TIME range (the click→purchase / impression→click
attribution shape). Spark buffers each side in join state; the
watermarks + the time-range condition are what let it EVICT state — a
left row older than (right watermark − max_gap) can never match a
future right row, so its buffer entry is dropped. Without the range
condition the state grows with the stream; with it, state is bounded by
max_gap worth of data per side regardless of stream length.

Correctness contract (what the catalog sim pins): an inner interval
join never drops matches whose rows arrive within watermark bounds, so
a fully drained ordered replay equals the equivalent BATCH interval
join — the DuckDB oracle runs that batch join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    max_gap_minutes: int,
    watermark_delay: str = "48 hours",
) -> DataFrame:
    """Inner join of two streams on ``key`` where the right event lands in
    ``[left_ts, left_ts + max_gap_minutes]``. Both sides are watermarked
    on their event-time columns (required for state eviction; the delay
    bounds how out-of-order arrivals may be without losing matches).

    Column names must be disjoint apart from ``key`` (standard Spark
    join-output rules apply).
    """
    lw = left.withWatermark(left_ts, watermark_delay).alias("l")
    rw = right.withWatermark(right_ts, watermark_delay).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}"))
        & (
            F.col(f"r.{right_ts}")
            <= F.col(f"l.{left_ts}")
            + F.expr(f"INTERVAL {max_gap_minutes} MINUTES")
        )
    )
    return lw.join(rw, cond, "inner")
