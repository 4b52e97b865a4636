"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
{"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from open_ftth_relational_projector_spark.session import get_spark  # noqa: E402
from open_ftth_relational_projector_spark.catalog import SPARK_QUERIES  # noqa: E402

BENCH_QUERIES = [
    "q1_pricing_summary",
    "q3_order_revenue",
    "q5_region_nation_revenue",
    "order_item_seq",
    "dedup_first_occurrence",
    "top3_orders_per_customer",
    "running_value_per_user",
    "asof_purchase_prior_signup",
    "proj_work_task_sim",
    "proj_installation_sim",
    "text_stats",
    "exact_dedup_groups",
    "ngram_jaccard_pairs",
    "minhash_near_dups",
    "simhash_fingerprints",
    "knn_bruteforce",
    "knn_lsh",
    "multimodal_features",
]


def bench_domain_projection(spark) -> tuple[str, float]:
    """End-to-end domain event fold: generate → JSON envelopes → all 8 tables."""
    from open_ftth_relational_projector_spark.events.generator import (
        generate,
        to_envelope_rows,
    )
    from open_ftth_relational_projector_spark.events.reader import EventLog
    from open_ftth_relational_projector_spark.events.schemas import ENVELOPE_SCHEMA
    from open_ftth_relational_projector_spark.projections import project_all

    t0 = time.perf_counter()
    raw = spark.createDataFrame(
        to_envelope_rows(generate(seed=42, scale=60)), ENVELOPE_SCHEMA
    ).coalesce(8)
    tables = project_all(EventLog.from_envelopes(raw))
    for df in tables.values():
        df.count()
    return "domain_projection_8tables", time.perf_counter() - t0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = get_spark(app_name="bench")

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn = SPARK_QUERIES[name]
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        timings[name] = round(time.perf_counter() - t0, 3)

    pname, psec = bench_domain_projection(spark)
    timings[pname] = round(psec, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
