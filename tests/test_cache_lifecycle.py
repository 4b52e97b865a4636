"""Tracked-persist lifecycle (r13): catalog-created caches are released
between queries by long-lived callers, so a re-run can never read a cache
a previous run left behind (the bench honest-cold retry contract)."""

from pyspark.sql import functions as F

from open_ftth_relational_projector_spark.cache import (
    release_tracked_persists,
    tracked_persist,
)


def test_tracked_persist_registers_and_release_unpersists(spark):
    df = spark.range(100).select(F.col("id"), (F.col("id") * 2).alias("v"))
    out = tracked_persist(df)
    assert out is df
    assert df.storageLevel.useMemory  # persisted
    n = release_tracked_persists(spark)
    assert n == 1
    assert not df.storageLevel.useMemory  # unpersisted
    # registry is cleared: releasing again is a no-op
    assert release_tracked_persists(spark) == 0


def test_release_is_safe_with_no_registry(spark):
    assert release_tracked_persists(spark) >= 0


def test_catalog_query_persists_are_query_scoped(spark):
    """corpus_pipeline_stats (llm.py) persists its survivor frame through
    tracked_persist; after the action + release, no catalog-created cache
    remains registered."""
    from open_ftth_relational_projector_spark.catalog import SPARK_QUERIES

    release_tracked_persists(spark)
    df = SPARK_QUERIES["corpus_pipeline_stats"](spark, "/root/testdata/sf0.001")
    df.write.format("noop").mode("overwrite").save()
    assert release_tracked_persists(spark) >= 1
