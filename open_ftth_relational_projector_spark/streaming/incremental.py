"""Incremental view maintenance: affected-key recompute per micro-batch.

The reference applies each event imperatively against in-memory state and
issues per-row DML (RelationalDatabaseProjection.cs:226-264, 407-458). The
Spark-first equivalent keeps NO driver state: each projection is a pure
function of the event log (projections/core.py), and a micro-batch is
maintained by

  1. extracting the entity keys the batch touches (per-event-type id map),
  2. re-running the SAME projection expressions over the accumulated log
     *restricted to those keys* — entity streams are semi-joined to the key
     set while dimension streams (spec registrations, container relations,
     interest walks) pass through whole so as-of joins still see them,
  3. MERGE/DELETE-ing the recomputed rows into the relational sink keyed by
     entity id (delete = affected key with no recomputed row).

Correctness rests on per-key determinism: a key's final row depends only on
(its own entity stream) × (dimension streams), so recompute-from-log equals
the reference's incremental fold — verified by tests/test_streaming.py
equivalence over random batch splits.

Scale: step 2's cost is ∝ events-of-touched-keys, reached through a
broadcast semi-join that Catalyst pushes into the (bucketed-by-entity at
scale) bronze scan, not ∝ log size. conduit_slack — the one cross-entity
aggregate — is maintained through the persisted ``_aux_slack_end``
pre-aggregation: replace touched equipments' end rows, re-aggregate only
touched route nodes (the standard IVM delta-aggregation; the reference's
imperative counters, ProjektorState.cs:473-512, are the single-threaded
special case of this).
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, functions as F

from open_ftth_relational_projector_spark.events.reader import EventLog
from open_ftth_relational_projector_spark.projections.core import (
    _has_child_final,
    _parent_edges,
    _span_state,
    project_installation,
    project_node_container,
    project_rel_fiber_cable_to_route_element,
    project_rel_interest_to_route_element,
    project_service_termination,
    project_span_equipment,
    project_work_task,
    slack_ends,
)

# -- per-event-type affected-entity extraction ------------------------------
# event_type -> (domain, id expression in the flattened typed frame).
# Spec-registration events are absent on purpose: their values are resolved
# as-of later events (frozen-at-use semantics, projections/core.py), so they
# never retroactively touch existing rows.
AFFECTED: dict[str, tuple[str, str]] = {
    "NodeContainerPlacedInRouteNetwork": ("node_container", "container.id"),
    "NodeContainerRemovedFromRouteNetwork": ("node_container", "nodeContainerId"),
    "NodeContainerSpecificationChanged": ("node_container", "nodeContainerId"),
    "WalkOfInterestRegistered": ("interest", "interest.id"),
    "WalkOfInterestRouteNetworkElementsModified": ("interest", "interestId"),
    "InterestUnregistered": ("interest", "interestId"),
    "SpanEquipmentPlacedInRouteNetwork": ("span", "equipment.id"),
    "SpanEquipmentMoved": ("span", "spanEquipmentId"),
    "SpanEquipmentMerged": ("span", "spanEquipmentId"),
    "SpanEquipmentRemoved": ("span", "spanEquipmentId"),
    "SpanEquipmentAffixedToParent": ("span", "spanEquipmentId"),
    "SpanEquipmentDetachedFromParent": ("span", "spanEquipmentId"),
    "SpanEquipmentAddressInfoChanged": ("span", "spanEquipmentId"),
    "SpanEquipmentSpecificationChanged": ("span", "spanEquipmentId"),
    "TerminalEquipmentPlacedInNodeContainer": ("terminal", "equipment.id"),
    "TerminalEquipmentRemoved": ("terminal", "terminalEquipmentId"),
    "TerminalEquipmentNamingInfoChanged": ("terminal", "terminalEquipmentId"),
    "TerminalEquipmentAddressInfoChanged": ("terminal", "terminalEquipmentId"),
    "WorkTaskCreated": ("work_task", "workTaskId"),
    "WorkTaskStatusChanged": ("work_task", "workTaskId"),
    "InstallationCreated": ("installation", "id"),
    "InstallationUnitAddressChanged": ("installation", "id"),
    "InstallationStatusChanged": ("installation", "id"),
    "InstallationLocationRemarkChanged": ("installation", "id"),
}

SPAN_ENTITY_TYPES = [t for t, (d, _) in AFFECTED.items() if d == "span"]
# fiber-cable relation triggers: placement / affix / detach only
# (ProjektorState.cs:169-171, 388, 421 — walk edits and removals do NOT
# retrigger).
CABLE_TRIGGER_TYPES = [
    "SpanEquipmentPlacedInRouteNetwork",
    "SpanEquipmentAffixedToParent",
    "SpanEquipmentDetachedFromParent",
]


def collect_batch(batch_envelopes: DataFrame) -> list[tuple[int, str, dict]]:
    """ONE job: pull the micro-batch to the driver as (seq, type, payload).

    A micro-batch is one poll interval of events — small by construction
    (the reference applies it on a single thread). Everything per-batch and
    ∝ batch (touched-key extraction, edge-delta resolution) then happens
    driver-side with zero additional Spark jobs; only the neighborhood
    recompute fans out to the cluster.
    """
    return parse_envelope_rows(
        batch_envelopes.select("seq", "event_type", "payload").collect()
    )


def parse_envelope_rows(rows) -> list[tuple[int, str, dict]]:
    """(seq, event_type, payload-json-string) rows → parsed tuples — the
    ONE definition of the driver-side batch shape (collect_batch and
    apply_batch's size-gate probe both route through it)."""
    import json

    return [(r.seq, r.event_type, json.loads(r.payload)) for r in rows]


def _payload_get(payload: dict, dotted: str):
    cur = payload
    for part in dotted.split("."):
        if not isinstance(cur, dict) or cur is None:
            return None
        cur = cur.get(part)
    return cur


def affected_ids_from_rows(
    parsed: list[tuple[int, str, dict]],
) -> dict[str, list[str]]:
    """Distinct touched entity ids per domain, from a collected batch."""
    per_domain: dict[str, set[str]] = {}
    cable: set[str] = set()
    for _seq, etype, payload in parsed:
        if etype not in AFFECTED:
            continue
        domain, id_path = AFFECTED[etype]
        eid = _payload_get(payload, id_path)
        if eid is None:
            continue
        per_domain.setdefault(domain, set()).add(eid)
        if etype in CABLE_TRIGGER_TYPES:
            cable.add(eid)
    out = {d: sorted(s) for d, s in per_domain.items()}
    if cable:
        out["cable"] = sorted(cable)
    return out


def affected_ids(batch_envelopes: DataFrame) -> dict[str, list[str]]:
    """Distinct touched entity ids per domain (one collect; see
    collect_batch)."""
    return affected_ids_from_rows(collect_batch(batch_envelopes))


def affected_ids_distributed(batch_log: EventLog) -> dict[str, list[str]]:
    """Touched entity ids per domain, extracted as Spark aggregations.

    The oversized-batch twin of ``affected_ids``: the batch rows never
    reach the driver — per-type id projections union per domain and only
    the DISTINCT id lists are collected (∝ touched entities, not ∝ batch
    rows; a catch-up batch after long downtime can hold the whole backlog,
    but the entity universe it touches is bounded by the domain). The tiny
    id lists then drive the same semi-join restriction as the driver path.

    One tiny distinct aggregate first narrows the union to the event
    types actually PRESENT in the batch (round-6 advice: unioning all
    ~30 AFFECTED projections built a wide filter/parse plan even when a
    batch held a handful of types).
    """
    present: set[str] | None = None
    if batch_log.raw is not None:
        present = {
            r.event_type
            for r in batch_log.raw.select("event_type").distinct().collect()
        }
    parts: list[DataFrame] = []
    for etype, (domain, id_path) in AFFECTED.items():
        if present is not None and etype not in present:
            continue
        df = batch_log.of(etype).select(
            F.lit(domain).alias("domain"), F.expr(id_path).alias("id")
        )
        parts.append(df)
        if etype in CABLE_TRIGGER_TYPES:
            parts.append(df.select(F.lit("cable").alias("domain"), "id"))
    if not parts:  # batch holds no AFFECTED types at all
        return {}
    # ONE tagged union → ONE distinct().collect() job for every domain
    # (per-domain collects would pay ~7 scheduler round trips on the
    # catch-up path, where latency already hurts)
    u = parts[0]
    for d in parts[1:]:
        u = u.unionByName(d)
    out: dict[str, set[str]] = {}
    for r in u.where(F.col("id").isNotNull()).distinct().collect():
        out.setdefault(r.domain, set()).add(r.id)
    return {d: sorted(s) for d, s in out.items()}


@dataclass
class TableDelta:
    """Keyed-merge delta: recomputed rows + keys with no row (deletes)."""

    upserts: object  # pyarrow.Table in sink column order
    delete_keys: list[str] = field(default_factory=list)


@dataclass
class GroupDelta:
    """Group-replace delta (S8): delete all rows of ``group_keys``, insert."""

    group_keys: list[str]
    rows: object  # pyarrow.Table


@dataclass
class EdgeContext:
    """Sink-maintained affix-edge neighborhood for one micro-batch.

    The affix-edge set, the root-segment registry, and the detach set are
    all APPEND-ONLY functions of the log (an edge's parent is frozen at
    edge time; registry rows and detaches are events). Keeping them as sink
    aux tables turns the per-batch has-child/slack recompute from
    ∝ accumulated-log (_parent_edges over the whole history, every batch)
    into ∝ batch-neighborhood: resolve only the batch's new edges, then
    read back just the touched parents' edges and their children's
    detaches. At 100 TB these aux sets live in the same store as the
    output tables (or Delta), and a micro-batch touches O(batch) rows of
    them through indexed lookups.
    """

    all_eq: list[str]  # touched spans ∪ their affix parents (fold keys)
    has_child_rows: list[tuple[str, bool]]  # folded flags, keys ⊆ all_eq
    new_edges: object  # pyarrow appends for _aux_affix_edge
    new_registry: object  # pyarrow appends for _aux_root_segment
    new_detaches: object  # pyarrow appends for _aux_detach
    span_replay: object = None  # streaming.replay.SpanReplayResult


def _fold_has_child(
    edges: list[tuple[str, int, str]], detaches: list[tuple[str, int]]
) -> list[tuple[str, bool]]:
    """Driver-side twin of projections.core._has_child_final over a
    neighborhood-sized edge/detach set (micro-batch scale — the data is
    already on the driver; running it as Spark stages would cost more in
    scheduling than the fold itself).

    Timeline per parent: an edge at eseq sets TRUE; the FIRST detach of
    that edge's child after eseq sets FALSE at that detach's seq; the
    highest-seq entry wins (seqs are globally unique).
    """
    from bisect import bisect_right

    det_by_child: dict[str, list[int]] = {}
    for child, dseq in detaches:
        det_by_child.setdefault(child, []).append(dseq)
    for seqs in det_by_child.values():
        seqs.sort()

    best: dict[str, tuple[int, bool]] = {}

    def visit(parent: str, seq: int, val: bool) -> None:
        cur = best.get(parent)
        if cur is None or seq > cur[0]:
            best[parent] = (seq, val)

    for child, eseq, parent in edges:
        visit(parent, eseq, True)
        ds = det_by_child.get(child)
        if ds:
            i = bisect_right(ds, eseq)
            if i < len(ds):
                visit(parent, ds[i], False)
    return [(p, v) for p, (_, v) in best.items()]


def _latest_before(versions: list[tuple[int, str | None]], seq: int):
    """Rightmost (vseq, value) with vseq < seq, else None — the driver-side
    twin of operators.asof.asof_join's strict semantics. ``versions`` must
    be sorted by vseq (event seqs are globally unique)."""
    from bisect import bisect_left

    i = bisect_left(versions, seq, key=lambda v: v[0])
    return versions[i - 1] if i > 0 else None


# Batches above this row count skip the driver-side edge-delta path and fall
# back to the distributed full recompute (a giant catch-up batch amortizes
# it; a poll-interval micro-batch never gets near this).
MAX_DRIVER_BATCH_ROWS = 200_000


def build_edge_context(
    full: EventLog,
    parsed: list[tuple[int, str, dict]],
    ids: dict[str, list[str]],
    sink,
) -> EdgeContext | None:
    """Resolve the batch's edge/registry/detach deltas against the sink aux
    tables and assemble the restricted fold inputs — driver-side, zero
    Spark jobs (the batch is already collected; the sink lookups are
    indexed ∝ batch-neighborhood).

    Returns None when the batch touches no span-equipment entities or is
    too large for driver-side handling (the caller then recomputes the
    edge sets distributedly from the full log).
    """
    from open_ftth_relational_projector_spark.sinks.ddl import SCHEMA

    span_ids = ids.get("span")
    if not span_ids or len(parsed) > MAX_DRIVER_BATCH_ROWS:
        return None
    import pyarrow as pa

    spark = full.spark
    children = ids.get("cable", [])

    # -- batch extraction (mirrors core._edge_events / _parent_registry) ---
    placements: list[tuple[str, int, str]] = []  # (parent_id, seq, root_seg)
    edge_events: list[tuple[str, int, str]] = []  # (child_id, seq, root_seg)
    removals: list[tuple[str, int]] = []  # (pid, seq)
    detaches: list[tuple[str, int]] = []  # (child_id, seq)
    for seq, etype, payload in parsed:
        if etype == "SpanEquipmentPlacedInRouteNetwork":
            eq = payload.get("equipment") or {}
            root = _payload_get(eq, "spanStructures")
            root_seg = None
            if root:
                segs = (root[0] or {}).get("spanSegments")
                if segs:
                    root_seg = (segs[0] or {}).get("id")
            if root_seg is not None:
                placements.append((eq.get("id"), seq, root_seg))
            for hop in eq.get("utilityNetworkHops") or []:
                for affix in (hop or {}).get("parentAffixes") or []:
                    edge_events.append((eq.get("id"), seq, affix.get("spanSegmentId")))
        elif etype == "SpanEquipmentAffixedToParent":
            cid = payload.get("spanEquipmentId")
            for hop in payload.get("newUtilityHopList") or []:
                for affix in (hop or {}).get("parentAffixes") or []:
                    edge_events.append((cid, seq, affix.get("spanSegmentId")))
        elif etype == "SpanEquipmentRemoved":
            removals.append((payload.get("spanEquipmentId"), seq))
        elif etype == "SpanEquipmentDetachedFromParent":
            detaches.append((payload.get("spanEquipmentId"), seq))

    def fetch(sql: str, params: list) -> list[tuple]:
        return list(sink.fetch_df(sql, params).itertuples(index=False, name=None))

    def in_clause(vals: list[str]) -> str:
        return ", ".join("?" for _ in vals)

    # -- registry deltas: placements register, removals tombstone ----------
    new_registry: list[tuple[str, int, str | None]] = [
        (root, seq, pid) for pid, seq, root in placements
    ]
    if removals:
        rm_ids = sorted({pid for pid, _ in removals})
        by_pid: dict[str, list[tuple[int, str]]] = {}
        for root, vseq, pid in fetch(
            f'SELECT root_segment_id, seq, parent_id FROM {SCHEMA}."_aux_root_segment" '
            f"WHERE parent_id IN ({in_clause(rm_ids)})",
            rm_ids,
        ):
            by_pid.setdefault(pid, []).append((vseq, root))
        for pid, seq, root in placements:
            by_pid.setdefault(pid, []).append((seq, root))
        for versions in by_pid.values():
            versions.sort()
        for pid, seq in removals:
            hit = _latest_before(by_pid.get(pid, []), seq)
            if hit is not None:
                new_registry.append((hit[1], seq, None))

    # -- batch edges, resolved as of the edge event (frozen at edge time) --
    new_edges: list[tuple[str, int, str]] = []
    roots = sorted({root for _, _, root in edge_events if root is not None})
    if roots:
        by_root: dict[str, list[tuple[int, str | None]]] = {}
        for root, vseq, pid in fetch(
            f'SELECT root_segment_id, seq, parent_id FROM {SCHEMA}."_aux_root_segment" '
            f"WHERE root_segment_id IN ({in_clause(roots)})",
            roots,
        ):
            by_root.setdefault(root, []).append((vseq, pid))
        for root, vseq, pid in new_registry:
            by_root.setdefault(root, []).append((vseq, pid))
        for versions in by_root.values():
            versions.sort(key=lambda v: v[0])
        for cid, seq, root in edge_events:
            hit = _latest_before(by_root.get(root, []), seq) if root else None
            if hit is not None and hit[1] is not None:
                new_edges.append((cid, seq, hit[1]))

    # -- parent expansion: prior edges of touched children + batch edges ---
    parents: set[str] = {p for _, _, p in new_edges}
    if children:
        parents.update(
            p
            for (p,) in fetch(
                f'SELECT DISTINCT parent_id FROM {SCHEMA}."_aux_affix_edge" '
                f"WHERE child_id IN ({in_clause(children)})",
                children,
            )
        )
    all_eq = sorted(set(span_ids) | parents)

    # -- fold inputs: every edge of every fold key, + their detaches -------
    prior_edges = fetch(
        f'SELECT child_id, seq, parent_id FROM {SCHEMA}."_aux_affix_edge" '
        f"WHERE parent_id IN ({in_clause(all_eq)})",
        all_eq,
    )
    fold_edges = prior_edges + new_edges
    fold_children = sorted({c for c, _, _ in fold_edges})
    fold_detaches = list(detaches)
    if fold_children:
        fold_detaches += fetch(
            f'SELECT child_id, seq FROM {SCHEMA}."_aux_detach" '
            f"WHERE child_id IN ({in_clause(fold_children)})",
            fold_children,
        )

    def arrow(rows: list[tuple], names: list[str], types: list) -> pa.Table:
        cols = list(zip(*rows)) if rows else [[] for _ in names]
        return pa.table(
            {n: pa.array(list(c), t) for n, c, t in zip(names, cols, types)}
        )

    has_child_rows = _fold_has_child(fold_edges, fold_detaches)

    from open_ftth_relational_projector_spark.streaming.replay import (
        replay_span_batch,
    )

    return EdgeContext(
        all_eq=all_eq,
        has_child_rows=has_child_rows,
        new_edges=arrow(
            new_edges, ["child_id", "seq", "parent_id"], ["string", "int64", "string"]
        ),
        new_registry=arrow(
            new_registry,
            ["root_segment_id", "seq", "parent_id"],
            ["string", "int64", "string"],
        ),
        new_detaches=arrow(detaches, ["child_id", "seq"], ["string", "int64"]),
        span_replay=replay_span_batch(
            parsed, span_ids, all_eq, dict(has_child_rows), sink
        ),
    )


def _ids_df(log: EventLog, ids: list[str]) -> DataFrame:
    return log.spark.createDataFrame([(i,) for i in ids], "id string")


# Above this many keys an IN-set literal filter stops being the cheap form
# and the restriction goes through a broadcast semi-join instead.
MAX_INLINE_IDS = 10_000


def _restrict(log: EventLog, types: list[str], ids: list[str]) -> EventLog:
    key: list | DataFrame = (
        ids if len(ids) <= MAX_INLINE_IDS else _ids_df(log, ids)
    )
    return log.restricted({t: (AFFECTED[t][1], key) for t in types})


def _keyed_to(df: DataFrame, ids: list[str], col: str = "id") -> DataFrame:
    """Restrict a keyed frame to ``ids`` — IN-set filter for small sets."""
    if len(ids) <= MAX_INLINE_IDS:
        return df.filter(F.col(col).isin(ids))
    return df.join(
        F.broadcast(_ids_df_any(df, ids, col)), col, "left_semi"
    )


def _ids_df_any(df: DataFrame, ids: list[str], col: str) -> DataFrame:
    return df.sparkSession.createDataFrame([(i,) for i in ids], f"{col} string")


def _keyed_delta(result: DataFrame, affected: list[str], key: str = "id") -> TableDelta:
    tbl = result.toArrow()
    present = set(tbl.column(key).to_pylist())
    return TableDelta(
        upserts=tbl, delete_keys=[k for k in affected if k not in present]
    )


def md5_uuid(value: str) -> str:
    """Python twin of projections.core.NODE_UUID_EXPR."""
    h = hashlib.md5(value.encode("utf-8")).hexdigest()
    return f"{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:32]}"


def compute_deltas(
    full: EventLog,
    ids: dict[str, list[str]],
    edge_ctx: EdgeContext | None = None,
    skip: tuple[str, ...] = (),
) -> dict[str, TableDelta | GroupDelta]:
    """Recompute every affected row set against the accumulated log.

    Returns per-table deltas; ``_aux_slack_end`` carries the slack-end
    pre-aggregation whose node-level re-aggregation happens sink-side
    (apply_slack_delta in runner.py).

    Per-table deltas are independent Spark jobs over the shared cached log,
    so the collect step (toArrow) fans out on a thread pool — a micro-batch
    costs max(table job), not sum(table jobs). Plans are built serially
    (cheap, driver-side); only the actions run concurrently.
    """
    from open_ftth_relational_projector_spark.plans.concurrency import run_concurrent

    thunks: dict[str, object] = {}

    if ids.get("work_task") and "work_task" not in skip:
        a = ids["work_task"]
        r = _restrict(full, ["WorkTaskCreated", "WorkTaskStatusChanged"], a)
        thunks["work_task"] = lambda a=a, r=r: _keyed_delta(project_work_task(r), a)

    if ids.get("installation") and "installation" not in skip:
        a = ids["installation"]
        r = _restrict(
            full,
            [
                "InstallationCreated",
                "InstallationUnitAddressChanged",
                "InstallationStatusChanged",
                "InstallationLocationRemarkChanged",
            ],
            a,
        )
        thunks["installation"] = lambda a=a, r=r: _keyed_delta(
            project_installation(r), a
        )

    if ids.get("node_container") and "node_container" not in skip:
        a = ids["node_container"]
        r = _restrict(
            full,
            [
                "NodeContainerPlacedInRouteNetwork",
                "NodeContainerRemovedFromRouteNetwork",
                "NodeContainerSpecificationChanged",
            ],
            a,
        )
        thunks["node_container"] = lambda a=a, r=r: _keyed_delta(
            project_node_container(r), a
        )

    if ids.get("terminal") and "service_termination" not in skip:
        a = ids["terminal"]
        r = _restrict(
            full,
            [
                "TerminalEquipmentPlacedInNodeContainer",
                "TerminalEquipmentRemoved",
                "TerminalEquipmentNamingInfoChanged",
                "TerminalEquipmentAddressInfoChanged",
            ],
            a,
        )
        thunks["service_termination"] = lambda a=a, r=r: _keyed_delta(
            project_service_termination(r), a
        )

    if ids.get("span") and edge_ctx is not None:
        # driver-side state-seeded replay (streaming/replay.py) already
        # produced both span deltas inside build_edge_context; nothing to
        # fan out. The aux state writes ride the sink transaction in
        # runner.apply_batch.
        rr = edge_ctx.span_replay
        thunks["_span_group"] = lambda rr=rr, all_eq=edge_ctx.all_eq: {
            "span_equipment": TableDelta(
                upserts=rr.span_upserts, delete_keys=rr.span_deletes
            ),
            "_aux_slack_end": GroupDelta(group_keys=all_eq, rows=rr.slack_rows),
        }
    elif ids.get("span"):
        # distributed fallback: recompute the superset's state and the
        # has-child fold from the full log (large catch-up batches).
        def _span_group(a=ids["span"], ids=ids):
            edges = _parent_edges(full).persist()
            all_eq, restricted, span_state = _span_state_superset(
                full, ids, edges=edges
            )
            span_state = span_state.persist()
            has_child_src = _has_child_final(full, edges=edges)
            try:
                state_a = _keyed_to(span_state, a)
                span_df = project_span_equipment(restricted, state=state_a)
                # has_child needs the UNRESTRICTED edge set (other
                # children's affixes keep a parent flagged); filter to
                # affected ids after the fold (ProjektorState.cs:360-368,
                # 405-413 — the superset includes parents of touched
                # children).
                has_child = _keyed_to(has_child_src, all_eq)
                ends_df = slack_ends(
                    restricted, state=span_state, has_child=has_child
                )
                return {
                    "span_equipment": _keyed_delta(span_df, a),
                    "_aux_slack_end": GroupDelta(
                        group_keys=all_eq, rows=ends_df.toArrow()
                    ),
                }
            finally:
                span_state.unpersist()
                edges.unpersist()

        thunks["_span_group"] = _span_group

    if ids.get("interest") and "rel_interest_to_route_element" not in skip:
        a = ids["interest"]
        r = _restrict(
            full,
            [
                "WalkOfInterestRegistered",
                "WalkOfInterestRouteNetworkElementsModified",
                "InterestUnregistered",
            ],
            a,
        )
        df = project_rel_interest_to_route_element(r)
        thunks["rel_interest_to_route_element"] = lambda a=a, df=df: GroupDelta(
            group_keys=a, rows=df.toArrow()
        )

    if ids.get("cable") and "rel_fiber_cable_to_route_element" not in skip:
        a = ids["cable"]
        # restrict only the trigger streams; walks + specs stay whole (dims)
        r = _restrict(full, CABLE_TRIGGER_TYPES, a)
        df = project_rel_fiber_cable_to_route_element(r)
        thunks["rel_fiber_cable_to_route_element"] = lambda a=a, df=df: GroupDelta(
            group_keys=a, rows=df.toArrow()
        )

    results = run_concurrent(thunks)
    deltas: dict[str, TableDelta | GroupDelta] = {}
    for name, value in results.items():
        if name == "_span_group":
            deltas.update(value)
        else:
            deltas[name] = value
    return deltas


def _span_state_superset(
    full: EventLog, ids: dict[str, list[str]], edges: DataFrame | None = None
) -> tuple[list[str], EventLog, DataFrame]:
    """Touched spans ∪ their affix parents, the span-entity streams
    restricted to that set, and the folded state over it.

    Parent expansion runs only when the batch actually carries edge-changing
    events (placement/affix/detach — the only flips of a parent's has-child
    flag, ProjektorState.cs:360-368, 405-413); address/move/spec/remove-only
    batches skip the edge-set scan entirely. Pass ``edges`` to reuse an
    already-persisted _parent_edges set.
    """
    span_ids = ids["span"]
    all_ids = set(span_ids)
    if ids.get("cable"):  # cable triggers == the edge-changing event types
        ids_df = _ids_df(full, ids["cable"])
        parents = (
            (_parent_edges(full) if edges is None else edges)
            .join(
                F.broadcast(ids_df.withColumnRenamed("id", "child_id")),
                "child_id",
                "left_semi",
            )
            .select(F.col("parent_id").alias("id"))
            .distinct()
        )
        all_ids.update(r.id for r in parents.collect())
    all_ids = sorted(all_ids)
    restricted = _restrict(full, SPAN_ENTITY_TYPES, all_ids)
    return all_ids, restricted, _span_state(restricted)
