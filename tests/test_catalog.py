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


def test_oracle_sql_portable_subset_runs_in_spark_sql(spark):
    """The raw-SQL surface: for dialect-portable catalog entries, running
    the ORACLE string itself through spark.sql over registered temp views
    must reproduce the DataFrame implementation row-for-row — one engine,
    two front ends. (DuckDB-specific oracles — list lambdas, quantile_cont,
    2-arg GROUPING — are exercised by scripts/check_oracle.py instead.)"""
    from tests.conftest import rows_set

    import __spark_entry__ as entry_mod
    from open_ftth_relational_projector_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events"]:
        load_table(spark, sf, t).createOrReplaceTempView(t)
    qs, osql = entry_mod.queries(), entry_mod.oracle_sql()
    portable = [
        "q1_pricing_summary", "q3_order_revenue", "q4_order_priority",
        "q5_region_nation_revenue", "q6_forecast_revenue",
        "q10_returned_items", "q12_shipmode_priority",
        "q13_customer_order_distribution", "q14_promo_effect",
        "q19_discounted_revenue", "semi_join_customers_with_urgent_orders",
        "anti_join_customers_without_orders", "rollup_lineitem_status",
        "unpivot_lineitem_measures", "price_histogram",
    ]
    for name in portable:
        via_sql = spark.sql(osql[name])
        via_df = qs[name](spark, sf)
        assert sorted(via_sql.columns) == sorted(via_df.columns), name
        a = rows_set(via_sql.select(*sorted(via_sql.columns)))
        b = rows_set(via_df.select(*sorted(via_df.columns)))
        assert a == b, f"{name}: spark.sql != DataFrame result"


def test_every_catalog_entry_has_query_signature():
    """Decorator-capture guard: every registered callable must accept
    exactly (spark, sf_dir) — a mis-scoped @_q landing on a helper (the
    forward_filled_values regression) fails here without Spark."""
    import inspect

    import __spark_entry__ as entry_mod

    for name, fn in entry_mod.queries().items():
        params = list(inspect.signature(fn).parameters)
        assert len(params) == 2, f"{name}: bad signature {params} ({fn.__name__})"


def test_catalog_split_preserves_registration_order():
    """The catalog package (split from the single-file catalog in round 4)
    must register the identical 187-name ordering — the driver window and
    cross-round correctness rows key on it."""
    import pathlib

    want = (
        pathlib.Path(__file__).parent / "data" / "catalog_order.txt"
    ).read_text().split()
    assert list(SPARK_QUERIES) == want
