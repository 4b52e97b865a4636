"""Scaling evidence: hdr_quantile_rollup vs exact percentile_disc.

Synthetic spark.range input so cardinality scales past the sf fixtures:
v = ((id%1000003)·(id%999983)) % 1e6 + 1 (multi-octave spread, no int64 overflow), 8 groups by id % 8,
sub-cells by id % 64. The exact aggregate buffers every value per group
(memory and sort grow with rows); the sketch is a bucket-count groupBy
whose state is bounded by the bucket count (~64·20) regardless of rows.

Run: python scripts/bench_hdr_sketch.py [rows ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from open_ftth_relational_projector_spark.functions.sketches import (  # noqa: E402
    hdr_quantile_rollup,
)
from open_ftth_relational_projector_spark.session import get_spark  # noqa: E402


def main(sizes: list[int]) -> None:
    spark = get_spark(app_name="hdr-bench", shuffle_partitions=32)
    for n in sizes:
        df = (
            spark.range(n)
            .selectExpr(
                "CAST(id % 8 AS STRING) AS g",
                "CAST(id % 64 AS STRING) AS s",
                "((id % 1000003) * (id % 999983)) % 1000000 + 1 AS v",
            )
            .persist()
        )
        df.count()  # materialize once so both paths read warm cache

        t0 = time.monotonic()
        exact = df.groupBy("g").agg(
            F.expr(
                "CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY v) AS BIGINT)"
            ).alias("p50"),
            F.expr(
                "CAST(percentile_disc(0.99) WITHIN GROUP (ORDER BY v) AS BIGINT)"
            ).alias("p99"),
        ).collect()
        t_exact = time.monotonic() - t0

        t0 = time.monotonic()
        sk = hdr_quantile_rollup(
            df, "g", "s", "v", k=64, quantiles=(0.5, 0.99), verify=False
        ).collect()
        t_sketch = time.monotonic() - t0

        # the bound check the verify=True path embeds, done here against
        # the separately-timed exact aggregate
        ex = {r["g"]: r for r in exact}
        ok = all(
            abs(r[f"est_{t}"] - ex[r["g"]][t]) / ex[r["g"]][t]
            <= 1.0 / 128 + 1e-9
            for r in sk
            for t in ("p50", "p99")
        )
        assert ok, sk
        print(
            f"rows={n:>12,}  exact={t_exact:6.2f}s  sketch={t_sketch:6.2f}s  "
            f"bound_ok={ok}"
        )
        df.unpersist()
    spark.stop()


if __name__ == "__main__":
    main([int(a) for a in sys.argv[1:]] or [1_000_000, 10_000_000, 50_000_000])
