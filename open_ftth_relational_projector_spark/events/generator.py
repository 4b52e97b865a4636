"""Deterministic domain-event fixture generator (FIXTURES.md §2/§4).

Produces an event log exercising every projection and every documented edge
case, while respecting the referential/order invariants the reference fold
assumes (specs registered before use, adds before updates/removes — blind
dict lookups at ProjektorState.cs:36, 138, 272). Seeded RNG → identical log
for a given (seed, scale).

Edge cases covered (FIXTURES.md §4):
  1. walks with duplicate route-element ids
  2. cable hops at walk start / end, back-to-back, missing ToNode,
     absent FromNode (stack-blocking)
  3. customer-conduit slack lifecycle: place → affix (decrement) →
     detach (re-increment) → remove (count to 0)
  4. move/merge changing one end only
  5. terminal equipment dropped on missing spec / missing container /
     non-customer spec
  6. spec change after placement (re-denormalization; also spec re-register
     with a new name, testing as-of lookups)
  7. null vs present addressInfo; empty-GUID terminal ids
  8. (batch/stream equivalence: tests split this log at arbitrary points)

Deliberately avoided (reference would corrupt/throw): events for missing
entities on blind-indexed paths, multiple concurrent children affixed to one
parent (double slack-credit quirk, see SURVEY §7 hard part 3).
"""

from __future__ import annotations

import json
import random
import uuid
from typing import Any

EMPTY_GUID = "00000000-0000-0000-0000-000000000000"


class _Gen:
    def __init__(self, seed: int, scale: int):
        self.rng = random.Random(seed)
        self.scale = max(1, scale)
        self.events: list[dict[str, Any]] = []
        self.seq = 0

    def guid(self) -> str:
        return str(uuid.UUID(int=self.rng.getrandbits(128)))

    def emit(self, event_type: str, payload: dict) -> None:
        self.seq += 1
        self.events.append(
            {"seq": self.seq, "event_type": event_type, "payload": payload}
        )


def generate(seed: int = 42, scale: int = 10) -> list[dict]:
    """Return event dicts: {seq, event_type, payload(dict)}."""
    g = _Gen(seed, scale)
    rng = g.rng

    # ---- dimension specs ------------------------------------------------
    nc_specs = []
    for i in range(3 * g.scale):
        sid = g.guid()
        nc_specs.append(sid)
        g.emit(
            "NodeContainerSpecificationAdded",
            {"specification": {"id": sid, "name": f"nc-spec-{i}", "category": f"cat-{i % 4}"}},
        )

    struct_specs = []
    for i in range(3 * g.scale):
        sid = g.guid()
        struct_specs.append(sid)
        g.emit(
            "SpanStructureSpecificationAdded",
            {
                "specification": {
                    "id": sid,
                    "outerDiameter": None if i % 5 == 0 else 10 + i,
                }
            },
        )

    span_specs = []  # (id, name, isCable)
    for i in range(4 * g.scale):
        sid = g.guid()
        if i % 4 == 0:
            name = f"Conduit Ø12-{i}"  # uppercase Ø → tests lower()
        elif i % 4 == 1:
            name = f"rør ø12 kunde-{i}"
        elif i % 4 == 2:
            name = f"Fiber Cable {i}"
        else:
            name = f"Conduit Ø40-{i}"
        is_cable = i % 4 == 2
        span_specs.append((sid, name, is_cable))
        g.emit(
            "SpanEquipmentSpecificationAdded",
            {
                "specification": {
                    "id": sid,
                    "name": name,
                    "isCable": is_cable,
                    "rootTemplate": {
                        "spanStructureSpecificationId": rng.choice(struct_specs)
                    },
                }
            },
        )

    term_specs = []  # (id, isCustomer)
    for i in range(2 * g.scale):
        sid = g.guid()
        term_specs.append((sid, i % 3 != 0))
        g.emit(
            "TerminalEquipmentSpecificationAdded",
            {"specification": {"id": sid, "isCustomerTermination": i % 3 != 0}},
        )

    # ---- route nodes / containers ----------------------------------------
    route_nodes = [g.guid() for _ in range(20 * g.scale)]
    containers = []  # (id, route_node)
    n_containers = 6 * g.scale
    for i in range(n_containers):
        if i == n_containers // 2:
            # spec re-registered with new content MID-stream: containers
            # placed before must keep the v1 name (as-of semantics), ones
            # after get v2 — distinguishes as-of from final-state joins.
            g.emit(
                "NodeContainerSpecificationAdded",
                {
                    "specification": {
                        "id": nc_specs[0],
                        "name": "nc-spec-0-v2",
                        "category": "cat-v2",
                    }
                },
            )
        cid = g.guid()
        rn = route_nodes[i]
        containers.append((cid, rn))
        # bias the first spec so both as-of versions are exercised
        spec = nc_specs[0] if i % 3 == 0 else rng.choice(nc_specs)
        g.emit(
            "NodeContainerPlacedInRouteNetwork",
            {
                "container": {
                    "id": cid,
                    "routeNodeId": rn,
                    "specificationId": spec,
                }
            },
        )
    # spec change on some; removal of some
    for cid, _ in containers[:: max(1, g.scale)]:
        g.emit(
            "NodeContainerSpecificationChanged",
            {"nodeContainerId": cid, "newSpecificationId": rng.choice(nc_specs)},
        )
    removed_containers = set()
    for cid, _ in containers[1 :: max(3, g.scale)]:
        removed_containers.add(cid)
        g.emit("NodeContainerRemovedFromRouteNetwork", {"nodeContainerId": cid})

    # ---- interests / walks -------------------------------------------------
    interests: dict[str, list[str]] = {}
    interest_ids = []
    for i in range(8 * g.scale):
        iid = g.guid()
        n = rng.randint(2, 8)
        walk = rng.sample(route_nodes, n)
        if i % 4 == 0:  # inject duplicates (edge case 1)
            walk = walk + [walk[0], walk[-1]]
        interests[iid] = walk
        interest_ids.append(iid)
        g.emit(
            "WalkOfInterestRegistered",
            {"interest": {"id": iid, "routeNetworkElementRefs": walk}},
        )

    # ---- terminal equipments -----------------------------------------------
    live_containers = [c for c in containers if c[0] not in removed_containers]
    terminations = []
    for i in range(6 * g.scale):
        tid = g.guid()
        case = i % 6
        spec_id, _is_cust = rng.choice([t for t in term_specs if t[1]])
        container = rng.choice(live_containers)
        addr = None
        if case == 0:  # fully valid with address
            addr = {"accessAddressId": g.guid(), "unitAddressId": g.guid()}
        elif case == 1:  # missing spec → dropped
            spec_id = g.guid()
        elif case == 2:  # unknown container → dropped
            container = (g.guid(), None)
        elif case == 3:  # non-customer spec → dropped
            non_cust = [t for t in term_specs if not t[1]]
            if non_cust:
                spec_id, _ = rng.choice(non_cust)
        elif case == 4:  # removed container → dropped (relation gone)
            if removed_containers:
                container = (rng.choice(sorted(removed_containers)), None)
        # case 5: valid, no address
        g.emit(
            "TerminalEquipmentPlacedInNodeContainer",
            {
                "equipment": {
                    "id": tid,
                    "name": f"term-{i}",
                    "specificationId": spec_id,
                    "nodeContainerId": container[0],
                    "addressInfo": addr,
                }
            },
        )
        terminations.append(tid)
        if case == 0:
            g.emit(
                "TerminalEquipmentNamingInfoChanged",
                {
                    "terminalEquipmentId": tid,
                    "namingInfo": {"name": f"term-{i}-renamed"} if i % 2 else None,
                },
            )
            g.emit(
                "TerminalEquipmentAddressInfoChanged",
                {
                    "terminalEquipmentId": tid,
                    "addressInfo": {
                        "accessAddressId": g.guid(),
                        "unitAddressId": None,
                    },
                },
            )
        if case == 5 and i % 2 == 0:
            g.emit("TerminalEquipmentRemoved", {"terminalEquipmentId": tid})

    # ---- span equipments: customer conduits with slack lifecycle -----------
    def make_segments(root_seg_id, n_nodes, from_conn, to_conn):
        segs = [
            {
                "id": root_seg_id,
                "fromNodeOfInterestIndex": 0,
                "toNodeOfInterestIndex": n_nodes - 1,
                "fromTerminalId": g.guid() if from_conn else EMPTY_GUID,
                "toTerminalId": g.guid() if to_conn else EMPTY_GUID,
            }
        ]
        # extra non-root segment that never matches the end checks
        segs.append(
            {
                "id": g.guid(),
                "fromNodeOfInterestIndex": 1,
                "toNodeOfInterestIndex": max(1, n_nodes - 2),
                "fromTerminalId": EMPTY_GUID,
                "toTerminalId": EMPTY_GUID,
            }
        )
        return [{"spanSegments": segs}]

    conduit_specs = [(s, n) for s, n, c in span_specs if not c and "ø12" in n.lower()]
    noncust_specs = [(s, n) for s, n, c in span_specs if not c and "ø12" not in n.lower()]
    cable_specs = [(s, n) for s, n, c in span_specs if c]

    conduits = []  # (id, root_seg_id, interest_id)
    for i in range(8 * g.scale):
        cid = g.guid()
        root_seg = g.guid()
        iid = rng.choice(interest_ids)
        spec_id, _ = rng.choice(conduit_specs if i % 3 else noncust_specs)
        from_conn = i % 5 == 1
        to_conn = i % 7 == 2
        walk = interests[iid]
        addr = (
            {"accessAddressId": g.guid(), "unitAddressId": None}
            if i % 4 == 0
            else None
        )
        g.emit(
            "SpanEquipmentPlacedInRouteNetwork",
            {
                "equipment": {
                    "id": cid,
                    "name": f"conduit-{i}",
                    "specificationId": spec_id,
                    "walkOfInterestId": iid,
                    "nodesOfInterestIds": [walk[0], walk[-1]],
                    "isCable": False,
                    "spanStructures": make_segments(root_seg, 2, from_conn, to_conn),
                    "utilityNetworkHops": None,
                    "addressInfo": addr,
                }
            },
        )
        conduits.append((cid, root_seg, iid))

    # moves / merges / spec changes / address changes / removals
    for i, (cid, _rs, _iid) in enumerate(conduits):
        if i % 6 == 0:
            new_nodes = [rng.choice(route_nodes), rng.choice(route_nodes)]
            g.emit(
                "SpanEquipmentMoved",
                {"spanEquipmentId": cid, "nodesOfInterestIds": new_nodes},
            )
        elif i % 6 == 1:
            g.emit(
                "SpanEquipmentMerged",
                {"spanEquipmentId": cid, "nodesOfInterestIds": [rng.choice(route_nodes), rng.choice(route_nodes)]},
            )
        elif i % 6 == 2:
            new_spec, _ = rng.choice(noncust_specs)  # ø12 flag must stay frozen
            g.emit(
                "SpanEquipmentSpecificationChanged",
                {"spanEquipmentId": cid, "newSpecificationId": new_spec},
            )
        elif i % 6 == 3:
            g.emit(
                "SpanEquipmentAddressInfoChanged",
                {
                    "spanEquipmentId": cid,
                    "addressInfo": {"accessAddressId": None, "unitAddressId": g.guid()},
                },
            )

    # ---- cables with hop subtraction over real walks -----------------------
    cables = []
    for i in range(6 * g.scale):
        cable_id = g.guid()
        iid = rng.choice(interest_ids)
        walk = []
        seen = set()
        for el in interests[iid]:  # deduped view, as the projector stores it
            if el not in seen:
                seen.add(el)
                walk.append(el)
        spec_id, _ = rng.choice(cable_specs)
        hops = None
        case = i % 6
        if len(walk) >= 3:
            if case == 0:  # interior hop
                hops = [{"fromNodeId": walk[1], "toNodeId": walk[-1], "parentAffixes": []}]
            elif case == 1:  # hop at walk start
                hops = [{"fromNodeId": walk[0], "toNodeId": walk[-2], "parentAffixes": []}]
            elif case == 2:  # missing ToNode → tail dropped
                hops = [{"fromNodeId": walk[1], "toNodeId": g.guid(), "parentAffixes": []}]
            elif case == 3 and len(walk) >= 4:  # back-to-back hops
                hops = [
                    {"fromNodeId": walk[0], "toNodeId": walk[1], "parentAffixes": []},
                    {"fromNodeId": walk[1], "toNodeId": walk[3], "parentAffixes": []},
                ]
            elif case == 4:  # absent FromNode blocks the stack
                hops = [
                    {"fromNodeId": g.guid(), "toNodeId": walk[1], "parentAffixes": []},
                    {"fromNodeId": walk[1], "toNodeId": walk[2], "parentAffixes": []},
                ]
        root_seg = g.guid()
        g.emit(
            "SpanEquipmentPlacedInRouteNetwork",
            {
                "equipment": {
                    "id": cable_id,
                    "name": f"cable-{i}",
                    "specificationId": spec_id,
                    "walkOfInterestId": iid,
                    "nodesOfInterestIds": [walk[0], walk[-1]],
                    "isCable": True,
                    "spanStructures": make_segments(root_seg, 2, False, False),
                    "utilityNetworkHops": hops,
                    "addressInfo": None,
                }
            },
        )
        cables.append((cable_id, iid))

    # ---- affix / detach lifecycle (slack credit + cable recompute) ---------
    # child cable affixed to a conduit parent, then detached; one parent per
    # child, one concurrent child per parent (see module docstring).
    used_parents = set()
    affix_pairs = []
    for i, (cable_id, iid) in enumerate(cables):
        if i % 3 != 0:
            continue
        parent = next(
            ((pid, rs, piid) for pid, rs, piid in conduits if rs not in used_parents),
            None,
        )
        if parent is None:
            break
        used_parents.add(parent[1])
        walk = interests[iid]
        hop = {
            "fromNodeId": walk[0],
            "toNodeId": walk[-1],
            "parentAffixes": [{"spanSegmentId": parent[1]}],
        }
        g.emit(
            "SpanEquipmentAffixedToParent",
            {"spanEquipmentId": cable_id, "newUtilityHopList": [hop]},
        )
        affix_pairs.append((cable_id, parent))
        if i % 6 == 0:  # detach half of them again
            g.emit(
                "SpanEquipmentDetachedFromParent",
                {"spanEquipmentId": cable_id, "newUtilityHopList": []},
            )

    # a NON-cable child affixed: quirk — it still lands in the cable relation
    if conduits:
        child = conduits[-1]
        parent = next(
            ((pid, rs, piid) for pid, rs, piid in conduits[:-1] if rs not in used_parents),
            None,
        )
        if parent is not None:
            used_parents.add(parent[1])
            affix_pairs.append((child[0], parent))
            g.emit(
                "SpanEquipmentAffixedToParent",
                {
                    "spanEquipmentId": child[0],
                    "newUtilityHopList": [
                        {
                            "fromNodeId": interests[child[2]][0],
                            "toNodeId": interests[child[2]][-1],
                            "parentAffixes": [{"spanSegmentId": parent[1]}],
                        }
                    ],
                },
            )

    # walk modified AFTER cable placement: cable rel must keep the old walk
    for i, (cable_id, iid) in enumerate(cables[:2]):
        new_walk = rng.sample(route_nodes, 4)
        interests[iid] = new_walk
        g.emit(
            "WalkOfInterestRouteNetworkElementsModified",
            {"interestId": iid, "routeNetworkElementIds": new_walk},
        )

    # some conduit removals (slack decrement to zero) — never remove a parent
    # that is still affixed (its state object lives in a child's parent list)
    removed_spans = set()
    affixed_parent_ids = {p[0] for _, p in affix_pairs}
    for i, (cid, rs, _iid) in enumerate(conduits):
        if i % 7 == 0 and cid not in affixed_parent_ids:
            removed_spans.add(cid)
            g.emit("SpanEquipmentRemoved", {"spanEquipmentId": cid})

    # interests unregistered — only those no live span equipment references
    referenced = {iid for _, _, iid in conduits} | {iid for _, iid in cables}
    for iid in interest_ids:
        if iid not in referenced and rng.random() < 0.3:
            g.emit("InterestUnregistered", {"interestId": iid})

    # ---- work tasks ----------------------------------------------------------
    for i in range(5 * g.scale):
        wid = g.guid()
        status = [None, "", "created", "in-progress"][i % 4]
        g.emit(
            "WorkTaskCreated",
            {"workTaskId": wid, "workTask": {"number": f"W-{i:05d}", "status": status}},
        )
        if i % 3 == 0:
            # status change lands whether or not creation was skipped
            g.emit("WorkTaskStatusChanged", {"workTaskId": wid, "status": "done"})

    # ---- installations --------------------------------------------------------
    for i in range(5 * g.scale):
        iid = g.guid()
        g.emit(
            "InstallationCreated",
            {
                "id": iid,
                "installationId": f"INST-{i:05d}",
                "unitAddressId": g.guid() if i % 2 else None,
                "status": "NEW",
                "locationRemark": None if i % 3 else f"remark {i}",
            },
        )
        if i % 2 == 0:
            g.emit("InstallationStatusChanged", {"id": iid, "status": "ACTIVE"})
        if i % 3 == 0:
            g.emit("InstallationUnitAddressChanged", {"id": iid, "unitAddressId": None})
        if i % 4 == 0:
            g.emit(
                "InstallationLocationRemarkChanged",
                {"id": iid, "locationRemark": f"moved {i}"},
            )

    return g.events


def to_envelope_rows(events: list[dict]) -> list[tuple[int, str, str]]:
    """(seq, event_type, payload-json) rows — the storage representation."""
    return [
        (e["seq"], e["event_type"], json.dumps(e["payload"], ensure_ascii=False))
        for e in events
    ]
