"""Audit every catalog query's optimized plan for single-task operators.

Detects Window operators with an empty partition spec — both the ordered
form (`windowspecdefinition(<order>...)`, the `WindowExec: No Partition
Defined` shape) and the frame-only form (`OVER ()`, neither partition nor
order — still a single-task WindowExec). Prints one line per finding so
the list of global-window queries is explicit and reviewable rather than
latent.

Run: python scripts/audit_global_windows.py [sf_dir]

A second, MANUAL lens this audit cannot see statically: windows
PARTITIONED by a low-cardinality key over data-proportional rows (lang,
source, bucket — each group = corpus/|groups| through one task). Those
are found by grepping partitionBy keys and judging cardinality; the
round-5 sweep rewrote the five found (ccnet buckets, doc_length_deciles,
length_bucketed_batches via operators/hierarchical's grouped rank;
stratified_sample + the zipf top-50 via two-phase exact top-n). New
windows over lang/source/event_type/bucket-like keys need the same
judgment.
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")

from open_ftth_relational_projector_spark.catalog import SPARK_QUERIES  # noqa: E402
from open_ftth_relational_projector_spark.session import get_spark  # noqa: E402

# Queries where a global pass is the documented point of the operator
# (diagnostics over a deliberately global layout) or provably bounded by
# construction. Each entry exempts ONLY the named window kinds — an
# exemption argued for a bounded frame-only spec must not silence a future
# ordered global window in the same query (the q15 defect class).
# name -> (exempted kinds, why)
EXEMPT: dict[str, tuple[frozenset[str], str]] = {
    "conversion_survival_curve": (
        frozenset({"GLOBAL-WINDOW"}),
        "KM running product over the 14-row day spine — window cardinality "
        "is fixed by the query (days), not the data",
    ),
    "hybrid_rrf_retrieval": (
        frozenset({"GLOBAL-WINDOW"}),
        "ranks the BM25 top-k list (k=25 rows) — bounded by construction "
        "before the window",
    ),
    "dsir_doc_weights": (
        frozenset({"FRAME-ONLY-WINDOW"}),
        "frame-only OVER () sums run over the n_buckets hashed-feature "
        "sketch rows (n_buckets=256 at this catalog entry), not the "
        "corpus — bounded by construction",
    ),
    "temperature_mixture_sample": (
        frozenset({"FRAME-ONLY-WINDOW"}),
        "frame-only OVER () share/max run over one row per SOURCE (the "
        "group-by output), bounded by group cardinality, not data size",
    ),
    "psi_value_drift": (
        frozenset({"FRAME-ONLY-WINDOW"}),
        "frame-only OVER () psi_total sum runs over the fixed 10-bin "
        "histogram spine (spark.range(0, 10)), not the events",
    ),
    "curation_decisions": (
        frozenset({"FRAME-ONLY-WINDOW"}),
        "inherits dsir_importance_weights' frame-only OVER () over its "
        "n_buckets=256 hashed-feature sketch rows — bounded by construction",
    ),
    "quality_score_auc": (
        frozenset({"GLOBAL-WINDOW"}),
        "ordered cumulative pass over ONE ROW PER DISTINCT quality score "
        "— the score lattice has <=8 points (sums of fixed weights), "
        "data-size-independent",
    ),
    "quality_pr_curve": (
        frozenset({"GLOBAL-WINDOW"}),
        "same bounded <=8-point score lattice as quality_score_auc: the "
        "threshold sweep's cumulative TP/kept run over score groups",
    ),
}

# Streaming-state sims materialize through an availableNow drain and
# return a driver-built LocalRelation: their batch-visible plan carries no
# window to audit, and building them costs two full stream drains per
# sweep. Their correctness is gated by check_oracle/sweep_full_scale; the
# state folds have no window operators by construction.
SKIP = {
    "stream_dedup_sim": "availableNow drain; result plan is a LocalRelation",
    "stream_lsh_sim": "availableNow drain; result plan is a LocalRelation",
    "stream_hll_sim": "availableNow drain; result plan is a LocalRelation",
    "stream_hdr_sim": "availableNow drain; result plan is a LocalRelation",
    "stream_topk_sim": "availableNow drain; result plan is a LocalRelation",
    "stream_join_sim": "availableNow drain; result plan is a LocalRelation",
    "stream_session_sim": "availableNow drain; result plan is a LocalRelation",
    "stream_ols_sim": "availableNow drain; result plan is a LocalRelation",
    "stream_snapshot_sim": "availableNow drain; result plan is a LocalRelation",
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="window-audit", shuffle_partitions=4)
    findings = []
    relied: set[tuple[str, str]] = set()  # (query, kind) exemptions used
    fully_scanned: set[str] = set()  # plans walked to the end (no SKIP /
    # PLAN-ERROR / unexempted early break) — the only queries whose
    # exemptions can be judged stale without false-positiving
    for name, fn in SPARK_QUERIES.items():
        if name in SKIP:
            findings.append((name, f"SKIP: {SKIP[name]}"))
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().optimizedPlan().toString()  # noqa: SLF001
        except Exception as exc:  # noqa: BLE001
            findings.append((name, f"PLAN-ERROR {type(exc).__name__}: {exc}"))
            continue
        worst = None  # an ordered global window outranks a frame-only one
        for m in re.finditer(r"windowspecdefinition\(([^)]*)\)", plan):
            spec = m.group(1)
            # partition columns precede the first Asc/Desc sort order token;
            # a spec that STARTS with a sort order has no partition columns,
            # and one that starts with specifiedwindowframe(...) has neither
            # partition NOR order (the frame-only `OVER ()` shape — still a
            # single-task WindowExec; round-4 verdict blind spot).
            first = spec.split(",")[0].strip()
            ordered_global = re.search(
                r"(ASC NULLS FIRST|DESC NULLS LAST|ASC NULLS LAST|DESC NULLS FIRST)",
                first,
            )
            frame_only = first.startswith("specifiedwindowframe")
            if not (ordered_global or frame_only):
                continue
            kind = "GLOBAL-WINDOW" if ordered_global else "FRAME-ONLY-WINDOW"
            exempted = name in EXEMPT and kind in EXEMPT[name][0]
            tag = f"EXEMPT[{kind}]: " + EXEMPT[name][1] if exempted else kind
            entry = (name, f"{tag} [{spec[:90]}]")
            if not exempted:
                worst = entry
                break  # an unexempted spec decides the query outright
            relied.add((name, kind))
            worst = worst or entry
        else:
            fully_scanned.add(name)
        if worst:
            findings.append(worst)
    for name, msg in findings:
        print(f"{name}: {msg}")
    bad = [
        n
        for n, m in findings
        if m.startswith(("GLOBAL-WINDOW", "FRAME-ONLY-WINDOW", "PLAN-ERROR"))
    ]
    # Stale-exemption gate (round-6 verdict #5): an EXEMPT entry whose
    # named window kind no longer appears in the query's plan is dead
    # documentation — the printed exemption list and the EXEMPT dict must
    # not drift apart, so a stale entry fails the audit until removed.
    # Only FULLY-scanned plans can prove staleness: a SKIPped or
    # PLAN-ERROR query, or one whose scan broke early on an unexempted
    # spec, never populated `relied`, and flagging its entries would be a
    # wrong diagnosis (the unexempted case already fails via `bad`).
    stale = [
        (name, kind)
        for name, (kinds, _) in EXEMPT.items()
        for kind in sorted(kinds)
        if name in fully_scanned and (name, kind) not in relied
    ]
    for name, kind in stale:
        print(f"STALE-EXEMPT {name}: plan no longer contains a {kind}")
    print(
        f"\n{len(bad)} unexempted global-window/plan-error queries; "
        f"{len(relied)} exemptions relied on; {len(stale)} stale"
    )
    sys.exit(1 if bad or stale else 0)


if __name__ == "__main__":
    main()
