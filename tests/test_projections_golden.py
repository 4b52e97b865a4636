"""Golden end-to-end test: full event log through the real JSON envelope path,
all 8 projections, compared order-insensitively against the Python fold
oracle (which mirrors the reference event-at-a-time semantics)."""

from __future__ import annotations

import pytest

from open_ftth_relational_projector_spark.events.generator import (
    generate,
    to_envelope_rows,
)
from open_ftth_relational_projector_spark.events.oracle import FoldOracle
from open_ftth_relational_projector_spark.events.reader import EventLog
from open_ftth_relational_projector_spark.events.schemas import ENVELOPE_SCHEMA
from open_ftth_relational_projector_spark.projections import project_all

import os
SEED = int(os.environ.get("GOLDEN_SEED", "42"))
SCALE = 10


@pytest.fixture(scope="module")
def results(spark):
    events = generate(seed=SEED, scale=SCALE)
    raw = spark.createDataFrame(to_envelope_rows(events), ENVELOPE_SCHEMA)
    log = EventLog.from_envelopes(raw)
    tables = project_all(log)

    oracle = FoldOracle()
    oracle.run(events)
    return tables, oracle.tables()


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.select(*cols).collect())


TABLE_COLS = {
    "rel_interest_to_route_element": ["interest_id", "route_network_element_id", "seq_no"],
    "rel_fiber_cable_to_route_element": ["fiber_cable_id", "route_network_element_id", "seq_no"],
    "node_container": ["id", "route_node_id", "spec_name", "spec_category"],
    "span_equipment": [
        "id",
        "interest_id",
        "outer_diameter",
        "is_cable",
        "name",
        "spec_name",
        "access_address_id",
        "unit_address_id",
    ],
    "service_termination": [
        "id",
        "route_node_id",
        "name",
        "access_address_id",
        "unit_address_id",
    ],
    "conduit_slack": ["route_node_id", "number_of_ends"],  # id excluded (X6)
    "work_task": ["id", "number", "status"],
    "installation": [
        "id",
        "installation_id",
        "unit_address_id",
        "status",
        "location_remark",
    ],
}


@pytest.mark.parametrize("table", sorted(TABLE_COLS))
def test_projection_matches_oracle(results, table):
    tables, golden = results
    got = _rows(tables[table], TABLE_COLS[table])
    expected = sorted(golden[table])
    assert len(got) == len(expected), f"{table}: {len(got)} vs {len(expected)}"
    assert got == expected, f"{table} mismatch; first diff: " + str(
        next(
            (g, e)
            for g, e in zip(got, expected)
            if g != e
        )
    )
