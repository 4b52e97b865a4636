"""Driver-testdata table loaders (SURVEY §2.1 S1-class scans).

Parquet scans stay fully declarative so Catalyst applies column pruning and
predicate pushdown; the only normalization done here is type repair for the
one column Spark cannot read natively (events.ts is parquet TIMESTAMP(NANOS);
with spark.sql.legacy.parquet.nanosAsLong=true it arrives as a long of
epoch-nanos and is converted to TIMESTAMP_NTZ to match the DuckDB oracle's
naive microsecond timestamps).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # runtime-settable; needed even when the caller owns the session
        # (events.ts is parquet TIMESTAMP(NANOS))
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # nanos → micros (floor), matching DuckDB's ns→us truncation.
        df = df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz")
        )
    # ms-precision timestamps (l_shipdate, o_orderdate) read as TimestampNTZ
    # or Timestamp depending on writer metadata; normalize to NTZ so value
    # hashing against the DuckDB oracle is timezone-free.
    for col, dtype in df.dtypes:
        if dtype == "timestamp":
            df = df.withColumn(col, F.col(col).cast("timestamp_ntz"))
    return df


def scattered(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Spread a narrow scan for compute-heavy per-row pipelines.

    Shingling, signature hashing, and vector math cost far more per row than
    the scan, so compute parallelism must not be capped by file layout (the
    local testdata is one row group = one task; a small dimension table on a
    cluster is the same trap). Round-robin repartition to the default
    parallelism when the scan yields fewer partitions — a no-op for inputs
    that are already wide, which is the normal case at scale.
    """
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names or TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every driver table as a temp view (SQL entry path)."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
