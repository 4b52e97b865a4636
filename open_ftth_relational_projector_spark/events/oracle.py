"""Single-threaded Python fold oracle for golden tests.

A literal (independent, re-written) transcription of the reference's
projection semantics (State/ProjektorState.cs), used ONLY by tests to
produce ground-truth output tables for a synthetic event log. The Spark
engine never calls this — it exists so batch/stream results can be compared
against an implementation that mirrors the reference's event-at-a-time fold
exactly, including its quirks:

  * IsCustomerConduit frozen at placement from the spec name at that time
    (SpanEquipmentState.cs:53; spec-change does NOT recompute it,
    ProjektorState.cs:293-310).
  * state.IsCable comes from the placement payload's isCable flag, while the
    cable→route-element trigger uses the SPEC's IsCable (ProjektorState.cs:169
    vs SpanEquipmentState.cs:49).
  * Affix/detach events run ProcessCableToRouteElement unconditionally — a
    non-cable that gets affixed also lands in the fiber-cable relation table
    (ProjektorState.cs:388, 421).
  * Cable relations survive equipment removal (ProcessSpanEquipmentRemoved
    never touches _fiberCableToRouteElementRelations).
  * Lookups read state as of the event (specs, container→route-node).
  * conduit_slack rows keyed by route_node_id; id is Guid.NewGuid() —
    excluded from comparisons (FIXTURES.md §3).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

EMPTY_GUID = "00000000-0000-0000-0000-000000000000"


def _dedup(ids: list[str]) -> list[str]:
    seen: set[str] = set()
    out = []
    for i in ids:
        if i not in seen:
            seen.add(i)
            out.append(i)
    return out


def _subtract_hops(walk: list[str], hops: list[dict] | None) -> list[str]:
    if hops is None:
        return list(walk)
    stack = [(h["fromNodeId"], h["toNodeId"]) for h in reversed(hops)]
    result: list[str] = []
    i = 0
    n = len(walk)
    while i < n:
        elem = walk[i]
        if stack and stack[-1][0] == elem:
            _, to_node = stack.pop()
            j = i + 1
            while j < n and walk[j] != to_node:
                j += 1
                i += 1
        else:
            result.append(elem)
        i += 1
    return result


@dataclass
class _SpanState:
    id: str
    name: str | None
    walk_of_interest_id: str
    specification_id: str
    from_node_id: str
    to_node_id: str
    is_cable: bool
    is_customer_conduit: bool
    root_segment_id: str
    root_has_from_conn: bool
    root_has_to_conn: bool
    has_child: bool = False
    access_address_id: str | None = None
    unit_address_id: str | None = None
    spec_name: str | None = None
    outer_diameter: int | None = None


@dataclass
class FoldOracle:
    """Feed events in seq order via apply(); read tables at the end."""

    nc_specs: dict[str, dict] = field(default_factory=dict)
    node_containers: dict[str, dict] = field(default_factory=dict)
    nc_to_route_node: dict[str, str] = field(default_factory=dict)
    route_node_to_nc: dict[str, str] = field(default_factory=dict)

    walks: dict[str, list[str]] = field(default_factory=dict)
    cable_rels: dict[str, list[str]] = field(default_factory=dict)

    span_specs: dict[str, dict] = field(default_factory=dict)
    struct_specs: dict[str, dict] = field(default_factory=dict)
    spans: dict[str, _SpanState] = field(default_factory=dict)
    spans_by_root_seg: dict[str, _SpanState] = field(default_factory=dict)
    slack_by_node: dict[str, int] = field(default_factory=dict)
    parents_by_child: dict[str, list[_SpanState]] = field(default_factory=dict)

    term_specs: dict[str, dict] = field(default_factory=dict)
    terminations: dict[str, dict] = field(default_factory=dict)

    work_tasks: dict[str, dict] = field(default_factory=dict)
    installations: dict[str, dict] = field(default_factory=dict)

    # --- dispatch -----------------------------------------------------
    def apply(self, event_type: str, p: dict[str, Any]) -> None:
        getattr(self, f"_on_{event_type}")(p)

    def run(self, events: list[dict]) -> None:
        for e in sorted(events, key=lambda e: e["seq"]):
            self.apply(e["event_type"], e["payload"])

    # --- node containers ---------------------------------------------
    def _on_NodeContainerSpecificationAdded(self, p):
        s = p["specification"]
        self.nc_specs[s["id"]] = s

    def _on_NodeContainerPlacedInRouteNetwork(self, p):
        c = p["container"]
        spec = self.nc_specs[c["specificationId"]]
        self.node_containers[c["id"]] = {
            "id": c["id"],
            "route_node_id": c["routeNodeId"],
            "spec_name": spec["name"],
            "spec_category": spec["category"],
        }
        self.nc_to_route_node[c["id"]] = c["routeNodeId"]
        self.route_node_to_nc[c["routeNodeId"]] = c["id"]

    def _on_NodeContainerRemovedFromRouteNetwork(self, p):
        cid = p["nodeContainerId"]
        self.node_containers.pop(cid, None)
        rn = self.nc_to_route_node.pop(cid, None)
        if rn is not None:
            self.route_node_to_nc.pop(rn, None)

    def _on_NodeContainerSpecificationChanged(self, p):
        spec = self.nc_specs[p["newSpecificationId"]]
        st = self.node_containers[p["nodeContainerId"]]
        st["spec_name"] = spec["name"]
        st["spec_category"] = spec["category"]

    # --- interests ----------------------------------------------------
    def _on_WalkOfInterestRegistered(self, p):
        i = p["interest"]
        self.walks[i["id"]] = _dedup(i["routeNetworkElementRefs"])

    def _on_WalkOfInterestRouteNetworkElementsModified(self, p):
        self.walks[p["interestId"]] = _dedup(p["routeNetworkElementIds"])

    def _on_InterestUnregistered(self, p):
        self.walks.pop(p["interestId"], None)

    # --- span equipment -----------------------------------------------
    @staticmethod
    def _any_from_conn(eq: dict) -> bool:
        for st in eq["spanStructures"]:
            for seg in st["spanSegments"]:
                if seg["fromNodeOfInterestIndex"] == 0 and seg["fromTerminalId"] != EMPTY_GUID:
                    return True
        return False

    @staticmethod
    def _any_to_conn(eq: dict) -> bool:
        last = len(eq["nodesOfInterestIds"]) - 1
        for st in eq["spanStructures"]:
            for seg in st["spanSegments"]:
                if seg["toNodeOfInterestIndex"] == last and seg["toTerminalId"] != EMPTY_GUID:
                    return True
        return False

    def _is_from_slack(self, s: _SpanState) -> bool:
        return s.is_customer_conduit and not s.root_has_from_conn and not s.has_child

    def _is_to_slack(self, s: _SpanState) -> bool:
        return s.is_customer_conduit and not s.root_has_to_conn and not s.has_child

    def _inc_slack(self, node: str) -> None:
        self.slack_by_node[node] = self.slack_by_node.get(node, 0) + 1

    def _dec_slack(self, node: str) -> None:
        if node not in self.slack_by_node:
            raise RuntimeError(f"slack decrement without prior increment: {node}")
        self.slack_by_node[node] -= 1
        if self.slack_by_node[node] == 0:
            del self.slack_by_node[node]

    def _cable_to_route_element(self, cable_id, interest_id, hops):
        walk = self.walks[interest_id]
        self.cable_rels[cable_id] = _subtract_hops(walk, hops)

    def _on_SpanEquipmentPlacedInRouteNetwork(self, p):
        eq = p["equipment"]
        spec = self.span_specs[eq["specificationId"]]
        sspec = self.struct_specs[spec["rootTemplate"]["spanStructureSpecificationId"]]
        addr = eq.get("addressInfo") or {}
        s = _SpanState(
            id=eq["id"],
            name=eq.get("name"),
            walk_of_interest_id=eq["walkOfInterestId"],
            specification_id=eq["specificationId"],
            from_node_id=eq["nodesOfInterestIds"][0],
            to_node_id=eq["nodesOfInterestIds"][-1],
            is_cable=eq["isCable"],
            is_customer_conduit="ø12" in spec["name"].lower(),
            root_segment_id=eq["spanStructures"][0]["spanSegments"][0]["id"],
            root_has_from_conn=self._any_from_conn(eq),
            root_has_to_conn=self._any_to_conn(eq),
            access_address_id=addr.get("accessAddressId"),
            unit_address_id=addr.get("unitAddressId"),
            spec_name=spec["name"],
            outer_diameter=sspec.get("outerDiameter"),
        )
        self.spans[s.id] = s
        self.spans_by_root_seg[s.root_segment_id] = s
        if self._is_from_slack(s):
            self._inc_slack(s.from_node_id)
        if self._is_to_slack(s):
            self._inc_slack(s.to_node_id)
        hops = eq.get("utilityNetworkHops")
        if hops:
            self._on_SpanEquipmentAffixedToParent(
                {"spanEquipmentId": eq["id"], "newUtilityHopList": hops}
            )
        if spec["isCable"]:
            self._cable_to_route_element(eq["id"], eq["walkOfInterestId"], hops)

    def _on_SpanEquipmentMoved(self, p):
        nodes = p["nodesOfInterestIds"]
        s = self.spans.get(p["spanEquipmentId"])
        if s is None:
            return
        new_from, new_to = nodes[0], nodes[-1]
        if s.from_node_id != new_from:
            if self._is_from_slack(s):
                self._dec_slack(s.from_node_id)
                self._inc_slack(new_from)
            s.from_node_id = new_from
        if s.to_node_id != new_to:
            if self._is_to_slack(s):
                self._dec_slack(s.to_node_id)
                self._inc_slack(new_to)
            s.to_node_id = new_to

    def _on_SpanEquipmentMerged(self, p):
        self._on_SpanEquipmentMoved(p)

    def _on_SpanEquipmentRemoved(self, p):
        s = self.spans[p["spanEquipmentId"]]
        if self._is_from_slack(s):
            self._dec_slack(s.from_node_id)
        if self._is_to_slack(s):
            self._dec_slack(s.to_node_id)
        del self.spans_by_root_seg[s.root_segment_id]
        del self.spans[s.id]

    def _on_SpanEquipmentSpecificationChanged(self, p):
        spec = self.span_specs[p["newSpecificationId"]]
        sspec = self.struct_specs[spec["rootTemplate"]["spanStructureSpecificationId"]]
        s = self.spans[p["spanEquipmentId"]]
        s.specification_id = p["newSpecificationId"]
        s.spec_name = spec["name"]
        s.outer_diameter = sspec.get("outerDiameter")
        # NOTE: is_customer_conduit deliberately NOT recomputed (reference quirk)

    def _on_SpanEquipmentAddressInfoChanged(self, p):
        s = self.spans[p["spanEquipmentId"]]
        addr = p["addressInfo"] or {}
        s.access_address_id = addr.get("accessAddressId")
        s.unit_address_id = addr.get("unitAddressId")

    def _on_SpanEquipmentSpecificationAdded(self, p):
        self.span_specs[p["specification"]["id"]] = p["specification"]

    def _on_SpanStructureSpecificationAdded(self, p):
        self.struct_specs[p["specification"]["id"]] = p["specification"]

    def _on_SpanEquipmentAffixedToParent(self, p):
        for hop in p["newUtilityHopList"]:
            for affix in hop.get("parentAffixes") or []:
                parent = self.spans_by_root_seg.get(affix["spanSegmentId"])
                if parent is not None:
                    if self._is_to_slack(parent):
                        self._dec_slack(parent.to_node_id)
                    if self._is_from_slack(parent):
                        self._dec_slack(parent.from_node_id)
                    parent.has_child = True
                    self.parents_by_child.setdefault(p["spanEquipmentId"], []).append(parent)
        s = self.spans[p["spanEquipmentId"]]
        self._cable_to_route_element(
            p["spanEquipmentId"], s.walk_of_interest_id, p["newUtilityHopList"]
        )

    def _on_SpanEquipmentDetachedFromParent(self, p):
        parents = self.parents_by_child.pop(p["spanEquipmentId"], None)
        if parents:
            for parent in parents:
                parent.has_child = False
                if self._is_to_slack(parent):
                    self._inc_slack(parent.to_node_id)
                if self._is_from_slack(parent):
                    self._inc_slack(parent.from_node_id)
        s = self.spans[p["spanEquipmentId"]]
        self._cable_to_route_element(
            p["spanEquipmentId"], s.walk_of_interest_id, p["newUtilityHopList"]
        )

    # --- terminal equipment --------------------------------------------
    def _on_TerminalEquipmentSpecificationAdded(self, p):
        self.term_specs[p["specification"]["id"]] = p["specification"]

    def _on_TerminalEquipmentPlacedInNodeContainer(self, p):
        eq = p["equipment"]
        spec = self.term_specs.get(eq["specificationId"])
        if spec is None:
            return
        route_node = self.nc_to_route_node.get(eq["nodeContainerId"])
        if route_node is None:
            return
        if not spec["isCustomerTermination"]:
            return
        addr = eq.get("addressInfo") or {}
        self.terminations[eq["id"]] = {
            "id": eq["id"],
            "route_node_id": route_node,
            "name": eq.get("name"),
            "access_address_id": addr.get("accessAddressId"),
            "unit_address_id": addr.get("unitAddressId"),
        }

    def _on_TerminalEquipmentNamingInfoChanged(self, p):
        t = self.terminations.get(p["terminalEquipmentId"])
        if t is not None:
            ni = p.get("namingInfo")
            t["name"] = None if ni is None else ni.get("name")

    def _on_TerminalEquipmentAddressInfoChanged(self, p):
        t = self.terminations.get(p["terminalEquipmentId"])
        if t is not None:
            addr = p["addressInfo"] or {}
            t["access_address_id"] = addr.get("accessAddressId")
            t["unit_address_id"] = addr.get("unitAddressId")

    def _on_TerminalEquipmentRemoved(self, p):
        self.terminations.pop(p["terminalEquipmentId"], None)

    # --- work tasks -----------------------------------------------------
    def _on_WorkTaskCreated(self, p):
        wt = p["workTask"]
        if not wt.get("status"):
            return
        self.work_tasks[p["workTaskId"]] = {
            "id": p["workTaskId"],
            "number": wt.get("number"),
            "status": wt["status"],
        }

    def _on_WorkTaskStatusChanged(self, p):
        wt = self.work_tasks.get(p["workTaskId"])
        if wt is not None:
            wt["status"] = p["status"]

    # --- installations ----------------------------------------------------
    def _on_InstallationCreated(self, p):
        self.installations[p["id"]] = {
            "id": p["id"],
            "installation_id": p.get("installationId"),
            "unit_address_id": p.get("unitAddressId"),
            "status": p.get("status"),
            "location_remark": p.get("locationRemark"),
        }

    def _on_InstallationUnitAddressChanged(self, p):
        i = self.installations.get(p["id"])
        if i is not None:
            i["unit_address_id"] = p.get("unitAddressId")

    def _on_InstallationStatusChanged(self, p):
        i = self.installations.get(p["id"])
        if i is not None:
            i["status"] = p.get("status")

    def _on_InstallationLocationRemarkChanged(self, p):
        i = self.installations.get(p["id"])
        if i is not None:
            i["location_remark"] = p.get("locationRemark")

    # --- output tables (order-insensitive row sets) ------------------------
    def tables(self) -> dict[str, list[tuple]]:
        rel_interest = sorted(
            (iid, el, n + 1)
            for iid, els in self.walks.items()
            for n, el in enumerate(els)
        )
        rel_cable = sorted(
            (cid, el, n + 1)
            for cid, els in self.cable_rels.items()
            for n, el in enumerate(els)
        )
        node_container = sorted(
            (c["id"], c["route_node_id"], c["spec_name"], c["spec_category"])
            for c in self.node_containers.values()
        )
        span_equipment = sorted(
            (
                s.id,
                s.walk_of_interest_id,
                s.outer_diameter,
                s.is_cable,
                s.name,
                s.spec_name,
                s.access_address_id,
                s.unit_address_id,
            )
            for s in self.spans.values()
        )
        service_termination = sorted(
            (
                t["id"],
                t["route_node_id"],
                t["name"],
                t["access_address_id"],
                t["unit_address_id"],
            )
            for t in self.terminations.values()
        )
        conduit_slack = sorted(self.slack_by_node.items())
        work_task = sorted(
            (w["id"], w["number"], w["status"]) for w in self.work_tasks.values()
        )
        installation = sorted(
            (
                i["id"],
                i["installation_id"],
                i["unit_address_id"],
                i["status"],
                i["location_remark"],
            )
            for i in self.installations.values()
        )
        return {
            "rel_interest_to_route_element": rel_interest,
            "rel_fiber_cable_to_route_element": rel_cable,
            "node_container": node_container,
            "span_equipment": span_equipment,
            "service_termination": service_termination,
            "conduit_slack": conduit_slack,
            "work_task": work_task,
            "installation": installation,
        }
