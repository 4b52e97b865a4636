"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)    — flagship query (TPC-H Q1-style pricing summary) at sf0.001.
queries()       — one entry per implemented operator (SURVEY.md §2 + the
                  LLM-pipeline surface); each callable (spark, sf_dir) → DataFrame.
oracle_sql()    — matching DuckDB SQL per query (omitted only for operators
                  whose hashing is Spark-specific: minhash/simhash/LSH-knn).

Implementation lives in open_ftth_relational_projector_spark/ (catalog.py
maps names → queries; projections/ is the event-fold engine itself).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from open_ftth_relational_projector_spark.catalog import (  # noqa: E402
    ORACLE_SQL,
    SPARK_QUERIES,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return SPARK_QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(SPARK_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE_SQL)
