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


def affected_ids(batch_envelopes: DataFrame) -> dict[str, list[str]]:
    """Distinct touched entity ids per domain, collected to the driver.

    ONE job over the raw micro-batch: the id is pulled straight from the
    JSON payload with get_json_object (no per-type filter jobs, no full
    payload parse). Micro-batch key sets are small by construction (one
    poll interval of events); they drive broadcast semi-joins and sink
    DELETE lists.
    """
    id_expr = F.coalesce(
        *[
            F.when(
                F.col("event_type") == t,
                F.get_json_object("payload", "$." + expr),
            )
            for t, (_, expr) in AFFECTED.items()
        ]
    )
    rows = (
        batch_envelopes.select("event_type", id_expr.alias("id"))
        .filter(F.col("id").isNotNull())
        .distinct()
        .collect()
    )
    per_domain: dict[str, set[str]] = {}
    cable: set[str] = set()
    for r in rows:
        domain = AFFECTED[r.event_type][0]
        per_domain.setdefault(domain, set()).add(r.id)
        if r.event_type in CABLE_TRIGGER_TYPES:
            cable.add(r.id)
    out = {d: sorted(s) for d, s in per_domain.items()}
    if cable:
        out["cable"] = sorted(cable)
    return out


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


def _ids_df(log: EventLog, ids: list[str]) -> DataFrame:
    return log.spark.createDataFrame([(i,) for i in ids], "id string")


def _restrict(log: EventLog, types: list[str], ids_df: DataFrame) -> EventLog:
    return log.restricted({t: (AFFECTED[t][1], ids_df) for t in types})


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
    full: EventLog, ids: dict[str, list[str]]
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

    if ids.get("work_task"):
        a = ids["work_task"]
        r = _restrict(
            full, ["WorkTaskCreated", "WorkTaskStatusChanged"], _ids_df(full, a)
        )
        thunks["work_task"] = lambda a=a, r=r: _keyed_delta(project_work_task(r), a)

    if ids.get("installation"):
        a = ids["installation"]
        r = _restrict(
            full,
            [
                "InstallationCreated",
                "InstallationUnitAddressChanged",
                "InstallationStatusChanged",
                "InstallationLocationRemarkChanged",
            ],
            _ids_df(full, a),
        )
        thunks["installation"] = lambda a=a, r=r: _keyed_delta(
            project_installation(r), a
        )

    if ids.get("node_container"):
        a = ids["node_container"]
        r = _restrict(
            full,
            [
                "NodeContainerPlacedInRouteNetwork",
                "NodeContainerRemovedFromRouteNetwork",
                "NodeContainerSpecificationChanged",
            ],
            _ids_df(full, a),
        )
        thunks["node_container"] = lambda a=a, r=r: _keyed_delta(
            project_node_container(r), a
        )

    if ids.get("terminal"):
        a = ids["terminal"]
        r = _restrict(
            full,
            [
                "TerminalEquipmentPlacedInNodeContainer",
                "TerminalEquipmentRemoved",
                "TerminalEquipmentNamingInfoChanged",
                "TerminalEquipmentAddressInfoChanged",
            ],
            _ids_df(full, a),
        )
        thunks["service_termination"] = lambda a=a, r=r: _keyed_delta(
            project_service_termination(r), a
        )

    if ids.get("span"):
        # one restricted span-state fold serves BOTH the span_equipment
        # delta and the slack-end delta; the restriction set is the slack
        # superset (touched spans ∪ their affix parents). Both outputs share
        # the persisted state and the persisted affix-edge set, so they live
        # in ONE thunk (serial inside, concurrent with every other table) —
        # including the parent-expansion collect, which would otherwise
        # serialize the whole fan-out behind a full _parent_edges job.
        def _span_group(a=ids["span"], ids=ids):
            edges = _parent_edges(full).persist()
            try:
                all_eq, restricted, span_state = _span_state_superset(
                    full, ids, edges=edges
                )
                span_state = span_state.persist()
                try:
                    state_a = span_state.join(
                        F.broadcast(_ids_df(full, a)), "id", "left_semi"
                    )
                    span_df = project_span_equipment(restricted, state=state_a)
                    # has_child needs the UNRESTRICTED edge set (other
                    # children's affixes keep a parent flagged); filter to
                    # affected ids after the fold. An affix/detach on a child
                    # flips the PARENT's has-child flag (ProjektorState.cs:
                    # 360-368, 405-413), so the superset includes parents of
                    # touched children.
                    eq_ids = _ids_df(full, all_eq)
                    has_child = _has_child_final(full, edges=edges).join(
                        F.broadcast(eq_ids), "id", "left_semi"
                    )
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
            finally:
                edges.unpersist()

        thunks["_span_group"] = _span_group

    if ids.get("interest"):
        a = ids["interest"]
        r = _restrict(
            full,
            [
                "WalkOfInterestRegistered",
                "WalkOfInterestRouteNetworkElementsModified",
                "InterestUnregistered",
            ],
            _ids_df(full, a),
        )
        df = project_rel_interest_to_route_element(r)
        thunks["rel_interest_to_route_element"] = lambda a=a, df=df: GroupDelta(
            group_keys=a, rows=df.toArrow()
        )

    if ids.get("cable"):
        a = ids["cable"]
        # restrict only the trigger streams; walks + specs stay whole (dims)
        r = _restrict(full, CABLE_TRIGGER_TYPES, _ids_df(full, a))
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
    restricted = _restrict(full, SPAN_ENTITY_TYPES, _ids_df(full, all_ids))
    return all_ids, restricted, _span_state(restricted)
