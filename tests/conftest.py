from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "8g")


@pytest.fixture(scope="session")
def spark():
    from open_ftth_relational_projector_spark.session import get_spark

    s = get_spark(app_name="tests", shuffle_partitions=4)
    yield s


def rows_set(df):
    """Order-insensitive comparable representation of a DataFrame."""
    return sorted(
        tuple(None if v is None else v for v in row)
        for row in (tuple(r) for r in df.collect())
    )
