"""Scaling sweep for the trainable-curation-filter family (IRLS logreg
+ the r9 AdaBoost boosted rule list).

The graph/dedup families carry measured scaling tables in BENCH_NOTES;
this does the same for the r8 classifier family. Claims under test:

1. **Corpus growth** (single fit): per IRLS iteration the cost is ONE
   map-only scoring pass + ONE map-side-combined aggregation to 9
   exact-integer moments — wall time should grow ~linearly in rows with
   a flat driver-side state (the 100 TB shape: more executors, same
   9-value reduce).
2. **Group-count growth** (grouped fit, fixed corpus): all groups
   advance per scan, so wall time should stay ~flat in the number of
   groups until the broadcast per-group beta frame stops being small —
   the measured knee is the documented threshold for swapping the two
   broadcast joins to shuffle joins (functions/regression.py docstring).
3. **Boost rounds** (adaboost_fit, fixed corpus): 2 up-front passes +
   ONE map-only weighted-count pass per round — wall should grow
   ~linearly in T with a small per-round constant (the nested weight
   expression deepens, but stays a per-row integer chain).
4. **Boosted model farm** (adaboost_fit_grouped, fixed corpus) vs group
   count: same all-groups-advance-per-scan shape as the logreg farm;
   the measured knee documents the broadcast threshold for the
   group-keyed stump-frame joins (functions/boosting.py docstring).
5. **Naive Bayes corpus growth** (nb_fit, B=16): one pinned pass + one
   min/max/count aggregate + ONE stack/groupBy count pass to a ≤ 2·B-row
   model frame — wall should grow ~linearly in rows with a fixed-size
   reduce (the 100 TB shape).
6. **Naive Bayes bucket growth** (nb_fit, fixed corpus) vs B: the corpus
   work is B-independent (bucketing is per-row arithmetic; the count
   pass reduces to 2·B cells), so wall should stay ~flat in B until the
   model frame itself matters.

Synthesis is hash-derived (no Python RNG): every run sees identical
frames, so numbers are comparable across rounds.

Run (quiet host): python scripts/bench_logreg_scaling.py
Pass sweep numbers to run a subset: python scripts/bench_logreg_scaling.py 5 6
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from open_ftth_relational_projector_spark.functions.bayes import nb_fit
from open_ftth_relational_projector_spark.functions.boosting import (
    adaboost_fit,
    adaboost_fit_grouped,
)
from open_ftth_relational_projector_spark.functions.regression import (
    logreg_fit_irls,
    logreg_fit_irls_grouped,
)
from open_ftth_relational_projector_spark.session import get_spark


def docs_df(spark, n_rows: int, n_groups: int):
    """Deterministic labeled corpus: features on the pinned |x| ≤ 10
    grid, label correlated with both features. Features derive from the
    WITHIN-group index ``id div G`` (not id itself): deriving them from
    ``id mod <modulus>`` makes every feature constant inside a
    ``id mod G`` group whenever G divides the modulus — the exact
    degenerate-design class the fit's singular-Hessian guard exists to
    catch (it did, in this script's first draft)."""
    j = F.col("id") / n_groups  # integer div below keeps it exact
    j = F.floor(j)
    x1 = (j * 2654435761 % 1000) / 100.0
    x2 = (j * 97 % 500) / 100.0
    return (
        spark.range(n_rows)
        .select(
            (F.col("id") % n_groups).cast("string").alias("g"),
            x1.alias("x1"),
            x2.alias("x2"),
            ((j * 31 % 100) < (20 + 6 * x1 - 4 * x2)).cast("int").alias("y"),
        )
        .repartition(32)
    )


def main() -> None:
    try:
        want = {int(a) for a in sys.argv[1:]} or set(range(1, 7))
    except ValueError:
        sys.exit(f"usage: {sys.argv[0]} [sweep numbers 1-6]")
    if not want <= set(range(1, 7)):
        # fail BEFORE Spark startup — an out-of-range number would
        # otherwise pay the session + warmup and exit printing nothing,
        # looking like a sweep that ran (r11 review)
        sys.exit(
            f"unknown sweep number(s) {sorted(want - set(range(1, 7)))}; "
            f"usage: {sys.argv[0]} [sweep numbers 1-6]"
        )
    spark = get_spark(
        app_name="bench-logreg-scaling",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    if 1 in want:
        print("sweep 1: single fit (3 IRLS iterations) vs corpus size")
        print("| rows | fit wall | wall / Mrow |")
        print("|---|---|---|")
        for n in (100_000, 1_000_000, 10_000_000):
            d = docs_df(spark, n, 1).localCheckpoint()
            d.count()
            t0 = time.perf_counter()
            _, beta = logreg_fit_irls(d, "x1", "x2", "y", iters=3)
            beta.collect()
            dt = time.perf_counter() - t0
            print(f"| {n:,} | {dt:.2f} s | {dt / (n / 1e6):.2f} s |")
        print()

    if 2 in want:
        print("sweep 2: grouped fit (3 IRLS iterations, 2M rows) vs group count")
        print("| groups | fit wall (incl. degeneracy guard) |")
        print("|---|---|")
        for g in (10, 100, 1_000, 10_000):
            d = docs_df(spark, 2_000_000, g).localCheckpoint()
            d.count()
            t0 = time.perf_counter()
            _, betas = logreg_fit_irls_grouped(
                d, "x1", "x2", "y", group_expr="g", iters=3
            )
            betas.agg(F.count(F.lit(1))).collect()
            dt = time.perf_counter() - t0
            print(f"| {g:,} | {dt:.2f} s |")
        print()

    if 3 in want:
        print("sweep 3: adaboost_fit (2M rows) vs boosting rounds T")
        print("| rounds | fit wall (incl. weight-bound guard) | wall / round |")
        print("|---|---|---|")
        d = docs_df(spark, 2_000_000, 1).localCheckpoint()
        d.count()
        for t_rounds in (1, 2, 3, 5):
            t0 = time.perf_counter()
            _, _, stumps = adaboost_fit(d, "x1", "x2", "y", n_rounds=t_rounds)
            for s in stumps:
                s.collect()
            dt = time.perf_counter() - t0
            print(f"| {t_rounds} | {dt:.2f} s | {dt / t_rounds:.2f} s |")
        print()

    if 4 in want:
        print("sweep 4: adaboost_fit_grouped (T=3, 2M rows) vs group count")
        print("| groups | fit wall (incl. weight-bound guard) |")
        print("|---|---|")
        for g in (10, 100, 1_000, 10_000):
            d = docs_df(spark, 2_000_000, g).localCheckpoint()
            d.count()
            t0 = time.perf_counter()
            _, _, stumps = adaboost_fit_grouped(
                d, "x1", "x2", "y", group_expr="g", n_rounds=3
            )
            stumps[-1].agg(F.count(F.lit(1))).collect()
            dt = time.perf_counter() - t0
            print(f"| {g:,} | {dt:.2f} s |")
        print()

    if 5 in want:
        print("sweep 5: nb_fit (B=16) vs corpus size")
        print("| rows | fit wall | wall / Mrow |")
        print("|---|---|---|")
        for n in (100_000, 1_000_000, 10_000_000):
            d = docs_df(spark, n, 1).localCheckpoint()
            d.count()
            t0 = time.perf_counter()
            _, prior, lik = nb_fit(d, "x1", "x2", "y", n_buckets=16)
            # force the full model frame (every pinned log-likelihood),
            # not a prunable count
            lik.write.format("noop").mode("overwrite").save()
            prior.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            print(f"| {n:,} | {dt:.2f} s | {dt / (n / 1e6):.2f} s |")
        print()

    if 6 in want:
        print("sweep 6: nb_fit (2M rows) vs bucket count B")
        print("| buckets | fit wall | model rows |")
        print("|---|---|---|")
        d = docs_df(spark, 2_000_000, 1).localCheckpoint()
        d.count()
        for b in (8, 16, 64, 256, 1024):
            t0 = time.perf_counter()
            _, prior, lik = nb_fit(d, "x1", "x2", "y", n_buckets=b)
            lik.write.format("noop").mode("overwrite").save()
            prior.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            nmodel = lik.count()
            print(f"| {b:,} | {dt:.2f} s | {nmodel} |")
        print()
    spark.stop()


if __name__ == "__main__":
    main()
