"""Round-12 optimization profiler: time catalog queries + dump plans.

Usage:
    python scripts/profile_r12.py [--plans DIR --suffix before] [--n 3] q1 q2 ...
    python scripts/profile_r12.py --headline          # the bench headline set
    python scripts/profile_r12.py --explain-only q1   # plans, no timing

Times each query with the noop sink (guide §1.4) after the same JVM/Python
warm-up bench.py performs, labels jobs (guide §1.5), and optionally writes
``<plans>/<query>_<suffix>.txt`` with the .explain("formatted") output so
plan-shape claims in OPTIMIZATION_r12.md are checkable without Spark.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from open_ftth_relational_projector_spark.session import get_spark  # noqa: E402
from open_ftth_relational_projector_spark.catalog import SPARK_QUERIES  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--headline", action="store_true")
    ap.add_argument("--n", type=int, default=3)
    ap.add_argument("--plans", default=None, help="directory for explain dumps")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--explain-only", action="store_true")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    names = list(args.queries)
    if args.headline:
        from bench import BENCH_QUERIES
        names = BENCH_QUERIES + [n for n in names if n not in BENCH_QUERIES]
    unknown = [n for n in names if n not in SPARK_QUERIES]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    spark = get_spark(app_name="profile_r12",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.range(1_000).mapInPandas(lambda it: it, "id long").count()

    try:
        load0 = round(os.getloadavg()[0], 2)
    except OSError:
        load0 = None
    print(f"# sf_dir={args.sf_dir} n={args.n} load_start={load0}", flush=True)

    for name in names:
        fn = SPARK_QUERIES[name]
        if args.plans:
            df = fn(spark, args.sf_dir)
            os.makedirs(args.plans, exist_ok=True)
            with open(os.path.join(args.plans, f"{name}_{args.suffix}.txt"), "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
                    df._jdf.queryExecution(), "formatted"))
        if args.explain_only:
            print(
                f"{name}: plan written" if args.plans
                else f"{name}: skipped (--explain-only without --plans)",
                flush=True,
            )
            continue
        runs = []
        for i in range(args.n):
            spark.sparkContext.setJobDescription(f"profile:{name}:{i}")
            t0 = time.perf_counter()
            fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        print(f"{name}: best={min(runs)} runs={runs}", flush=True)

    try:
        print(f"# load_end={round(os.getloadavg()[0], 2)}", flush=True)
    except OSError:
        pass
    spark.stop()


if __name__ == "__main__":
    main()
