"""Dual-protocol measurement: the frozen headline set timed under BOTH the
pre-r5 count() protocol and the r5+ noop-sink protocol, same session.

Purpose (round-5 verdict ask #8): one offset data point existed from the
r5 session; a second one makes the count→noop conversion factor usable to
mentally rebase the r1-r4 bench series against r5+ numbers. Appends a row
to the BENCH_NOTES.md dual-measurement table by hand.

Run: python scripts/bench_dual_protocol.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from open_ftth_relational_projector_spark.session import get_spark  # noqa: E402
from open_ftth_relational_projector_spark.catalog import SPARK_QUERIES  # noqa: E402
from bench import BENCH_QUERIES  # noqa: E402


def main(sf_dir: str) -> None:
    spark = get_spark(
        app_name="bench-dual",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.range(1_000).mapInPandas(lambda it: it, "id long").count()

    # count() first, then noop, so the noop pass (the protocol of record)
    # is the warm one — matching how the r5 session measured its pair
    out: dict[str, dict[str, float]] = {}
    for proto in ("count", "noop"):
        for name in BENCH_QUERIES:
            fn = SPARK_QUERIES[name]
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            if proto == "count":
                df.count()
            else:
                df.write.format("noop").mode("overwrite").save()
            out.setdefault(name, {})[proto] = round(time.perf_counter() - t0, 3)

    totals = {
        p: round(sum(v[p] for v in out.values()), 2) for p in ("count", "noop")
    }
    print(json.dumps({"totals": totals, "queries": out}, indent=1))
    print(
        f"\ncount total {totals['count']} s  |  noop total {totals['noop']} s"
        f"  |  noop/count = {totals['noop'] / totals['count']:.3f}"
    )


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1")
