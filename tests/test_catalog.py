"""Catalog integrity: the driver-contract surface must stay well-formed.

These run WITHOUT Spark: registration/window invariants plus a DuckDB
EXPLAIN of every oracle against the sf0.001 tables — catching SQL typos,
bad identifiers, and dropped registrations long before a driver round."""

from __future__ import annotations

import duckdb
import pytest

from open_ftth_relational_projector_spark.catalog import (
    _DRIVER_WINDOW_FRONT,
    ORACLE_SQL,
    SPARK_QUERIES,
)

SF = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def test_driver_window_well_formed():
    assert len(_DRIVER_WINDOW_FRONT) == 50
    assert len(set(_DRIVER_WINDOW_FRONT)) == 50, "duplicate window entries"
    missing = [n for n in _DRIVER_WINDOW_FRONT if n not in SPARK_QUERIES]
    assert not missing, missing
    # the reorder ran: the first 50 registered queries ARE the window
    assert list(SPARK_QUERIES)[:50] == _DRIVER_WINDOW_FRONT


def test_every_oracle_names_a_query():
    orphans = [n for n in ORACLE_SQL if n not in SPARK_QUERIES]
    assert not orphans, orphans


def test_entry_flagship_is_first():
    assert next(iter(SPARK_QUERIES)) == "q1_pricing_summary"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


def test_every_oracle_plans_in_duckdb(duck):
    """EXPLAIN (not execute) every oracle: syntax, identifiers, and types
    must resolve against the real table schemas."""
    bad = []
    for name, sql in ORACLE_SQL.items():
        try:
            duck.sql(f"EXPLAIN {sql}")
        except Exception as e:  # noqa: BLE001
            bad.append((name, str(e).splitlines()[0]))
    assert not bad, bad
