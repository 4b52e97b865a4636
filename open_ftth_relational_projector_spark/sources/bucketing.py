"""Bucketed-table layout: co-located joins and aggregations.

The reference has no storage layout at all (it replays events into
Postgres); at 100 TB the dominant Spark cost of this engine's fact⋈fact
joins (lineitem⋈orders, bronze self-joins keyed by entity id) is the
shuffle. Bucketing is the standing answer: write both sides pre-hashed
into the same number of buckets on the join key, and Spark's scan planner
exposes the bucket hash as the output partitioning, so the join (and any
groupBy on the key) runs with ZERO Exchange operators — the shuffle was
paid once at write time and amortizes over every subsequent query.

Usage shape on a cluster: the bronze/ingest job calls ``write_bucketed``
once per fact table (buckets sized so one bucket ≈ one task's worth of
data, e.g. 100 TB / 2048 buckets ≈ 50 GB splittable files); every
downstream join on the bucket key is then co-located. Locally the same
code runs against the session warehouse, which is how the tests pin the
no-Exchange property.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str | list[str],
    buckets: int,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a parquet table bucketed (and optionally sorted)
    by ``key``. Sorting within buckets lets a downstream sort-merge join
    skip its Sort as well, leaving a pure zip-merge."""
    keys = [key] if isinstance(key, str) else list(key)
    writer = df.write.format("parquet").mode(mode).bucketBy(buckets, *keys)
    if sort:
        writer = writer.sortBy(*keys)
    writer.saveAsTable(table)


def bucket_spec(spark: SparkSession, table: str) -> tuple[list[str], int] | None:
    """(bucket columns, num buckets) of a saved table, or None if unbucketed."""
    rows = spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect()
    cols: list[str] | None = None
    n: int | None = None
    for r in rows:
        if r.col_name == "Num Buckets":
            n = int(r.data_type)
        elif r.col_name == "Bucket Columns":
            cols = [c.strip(" `") for c in r.data_type.strip("[]").split(",")]
    if cols is None or n is None:
        return None
    return cols, n


def write_partitioned(
    df: DataFrame,
    path: str,
    cols: str | list[str],
    mode: str = "overwrite",
) -> None:
    """Hive-style directory partitioning — the pruning half of the layout
    story (bucketing co-locates joins; partitioning eliminates IO).

    A scan with a predicate on a partition column never opens the other
    directories: the plan shows the predicate under ``PartitionFilters``
    (not PushedFilters — it prunes the file listing, before any reader
    touches bytes). At 100 TB this is the difference between scanning a
    lang=en/ subtree and scanning the corpus. Partition columns must be
    low-cardinality (lang, source, date) — high-cardinality partitioning
    (doc_id) creates a small-files catastrophe; that axis belongs to
    bucketing instead.
    """
    cols_list = [cols] if isinstance(cols, str) else list(cols)
    df.write.mode(mode).partitionBy(*cols_list).parquet(path)
