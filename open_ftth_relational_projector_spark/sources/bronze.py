"""Typed bronze layer: per-event-type parquet tables (SURVEY §1.4).

``EventLog.persisted()`` materializes typed streams for one session; this
module makes the same thing durable: each event type written as its own
parquet table with the payload parsed into columns, plus an ``entity_id``
column (the key the event touches) so that

* per-type scans read only their columns (pruning) instead of re-parsing
  JSON envelopes per projection,
* the incremental path's key restriction (streaming/incremental.py) becomes
  a pushable predicate on ``entity_id`` — on a cluster, partition/bucket
  each type's table by ``entity_id`` and a micro-batch recompute touches
  only the matching buckets, cost ∝ events-of-touched-keys at any log size.

The reference has no such layer (it re-reads the Postgres event store,
RelationalDatabaseProjection.cs:90); this is the Spark-native replacement.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from open_ftth_relational_projector_spark.events.reader import EventLog
from open_ftth_relational_projector_spark.events.schemas import PAYLOAD_SCHEMAS


def _entity_id_expr(etype: str):
    from open_ftth_relational_projector_spark.streaming.incremental import AFFECTED

    if etype in AFFECTED:
        return F.col(AFFECTED[etype][1])
    return F.lit(None).cast("string")


def write_typed_bronze(
    envelopes: DataFrame, path: str, repartition_by_entity: int | None = None
) -> list[str]:
    """Parse the envelope stream once and land one parquet table per event
    type. ``repartition_by_entity`` hash-distributes rows by entity_id (the
    local stand-in for bucketing) so same-key events co-locate."""
    log = EventLog.from_envelopes(envelopes)
    written = []
    for etype in PAYLOAD_SCHEMAS:
        df = log.of(etype).withColumn("entity_id", _entity_id_expr(etype))
        if repartition_by_entity:
            df = df.repartition(repartition_by_entity, "entity_id")
        out = os.path.join(path, etype)
        df.write.mode("overwrite").parquet(out)
        written.append(out)
    return written


def read_typed_bronze(spark: SparkSession, path: str) -> EventLog:
    typed = {}
    for etype in PAYLOAD_SCHEMAS:
        sub = os.path.join(path, etype)
        if os.path.exists(sub):
            typed[etype] = spark.read.parquet(sub).drop("entity_id")
    return EventLog.from_typed(spark, typed)
