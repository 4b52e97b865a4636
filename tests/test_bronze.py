"""Typed bronze round-trip: envelopes → per-type parquet → same projections."""

from __future__ import annotations

import shutil
import tempfile

from open_ftth_relational_projector_spark.events.generator import (
    generate,
    to_envelope_rows,
)
from open_ftth_relational_projector_spark.events.reader import EventLog
from open_ftth_relational_projector_spark.events.schemas import ENVELOPE_SCHEMA
from open_ftth_relational_projector_spark.projections import project_all
from open_ftth_relational_projector_spark.sources.bronze import (
    read_typed_bronze,
    write_typed_bronze,
)

from conftest import rows_set


def test_bronze_roundtrip_preserves_projections(spark):
    env = spark.createDataFrame(
        to_envelope_rows(generate(seed=5, scale=2)), ENVELOPE_SCHEMA
    )
    tmp = tempfile.mkdtemp(prefix="ofrp_bronze_")
    try:
        write_typed_bronze(env, tmp, repartition_by_entity=4)
        direct = project_all(EventLog.from_envelopes(env), persist=False)
        via_bronze = project_all(read_typed_bronze(spark, tmp), persist=False)
        for name in direct:
            assert rows_set(direct[name]) == rows_set(via_bronze[name]), name
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_csv_source_roundtrip_with_edges(spark, tmp_path):
    """CSV source coverage: explicit schema read (no inference), quoted
    delimiters/newlines inside fields, empty-string-vs-null distinction,
    and timestamp parsing — write → read equals the original frame."""
    from datetime import datetime

    from pyspark.sql import functions as F

    rows = [
        (1, 'has,comma', 3.5, datetime(2024, 1, 1, 10, 0, 0)),
        (2, 'has "quote"', -0.25, datetime(2024, 6, 30, 23, 59, 59)),
        (3, "multi\nline", 0.0, datetime(2025, 2, 28, 0, 0, 0)),
        (4, None, None, None),
    ]
    schema = "id long, note string, score double, ts timestamp_ntz"
    df = spark.createDataFrame(rows, schema)
    path = str(tmp_path / "csv_out")
    (
        df.coalesce(1)
        .write.option("header", True)
        .option("quoteAll", True)
        .csv(path)
    )
    back = (
        spark.read.schema(schema)
        .option("header", True)
        .option("multiLine", True)
        .csv(path)
    )
    a = sorted(map(tuple, df.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b
    # header-only pushdown sanity: column pruning reaches the CSV scan
    pruned = back.select("id").where(F.col("id") > 1)
    assert pruned.count() == 3
