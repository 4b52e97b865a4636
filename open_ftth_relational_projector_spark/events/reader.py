"""Event-log reader: envelope scan + type dispatch + JSON parse (S1/S3/S4).

The reference replays envelopes through a 27-way type switch
(RelationalDatabaseProjection.cs:90-221). Spark-first, dispatch is a filter
per type over one scan — Catalyst pushes ``event_type = 'X'`` into the
parquet scan, and each projection reads only the payloads it consumes.

``EventLog`` is the seam between the raw stream and the projection
expression core: projections consume *typed* per-event DataFrames, so tests
and driver queries can inject typed events directly (no JSON round-trip)
while production reads JSON envelopes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from open_ftth_relational_projector_spark.events.schemas import (
    ENVELOPE_SCHEMA,
    PAYLOAD_SCHEMAS,
)


class EventLog:
    """Typed access to an event stream.

    ``of(event_type)`` → DataFrame of (seq, <payload fields...>) for that
    type, payload struct flattened one level.
    """

    def __init__(self, typed: dict[str, DataFrame], spark: SparkSession):
        self._typed = typed
        self._spark = spark

    @classmethod
    def from_envelopes(cls, raw: DataFrame) -> "EventLog":
        """raw: (seq long, event_type string, payload json-string)."""
        spark = raw.sparkSession
        typed = {}
        for etype, schema in PAYLOAD_SCHEMAS.items():
            typed[etype] = (
                raw.filter(F.col("event_type") == etype)
                .select("seq", F.from_json("payload", schema).alias("p"))
                .select("seq", "p.*")
            )
        return cls(typed, spark)

    @classmethod
    def from_typed(cls, spark: SparkSession, typed: dict[str, DataFrame]) -> "EventLog":
        return cls(dict(typed), spark)

    def of(self, event_type: str) -> DataFrame:
        if event_type in self._typed:
            return self._typed[event_type]
        # absent type → empty DataFrame with the right flattened schema
        return self._spark.createDataFrame([], _flat_schema(event_type))

    def persisted(self, level: str = "MEMORY_AND_DISK") -> "EventLog":
        """Materialize the typed per-type streams once.

        Every projection re-reads several typed streams; without this each
        consumer re-filters and re-parses the JSON envelopes. Locally this
        is ``persist()``; at 100 TB the same role is played by writing the
        typed bronze out as per-type parquet/Delta tables (columnar, typed,
        partitioned by entity key) and reading those — one parse, N scans
        with column pruning.
        """
        from pyspark.storagelevel import StorageLevel

        lvl = getattr(StorageLevel, level)
        return EventLog(
            {t: df.persist(lvl) for t, df in self._typed.items()}, self._spark
        )

    def unpersist(self) -> None:
        for df in self._typed.values():
            df.unpersist()

    def restricted(
        self, filters: dict[str, tuple[str, DataFrame]]
    ) -> "EventLog":
        """Key-restricted view for incremental recompute.

        ``filters[event_type] = (id_expr, ids_df)`` narrows that type's
        stream to events whose ``id_expr`` is in ``ids_df.id`` (broadcast
        semi-join — the id set is a micro-batch's touched keys, always
        small). Unlisted types pass through whole, which is what keeps
        dimension streams (spec registrations, container relations, walks)
        visible to as-of joins during a per-key recompute.
        """
        typed = dict(self._typed)
        for etype, (id_expr, ids_df) in filters.items():
            src = self.of(etype)
            typed[etype] = src.join(
                F.broadcast(ids_df.select(F.col("id").alias("_rid"))),
                F.col(id_expr) == F.col("_rid"),
                "left_semi",
            )
        return EventLog(typed, self._spark)

    @property
    def spark(self) -> SparkSession:
        return self._spark


def _flat_schema(event_type: str):
    from pyspark.sql import types as T

    schema = PAYLOAD_SCHEMAS[event_type]
    return T.StructType(
        [T.StructField("seq", T.LongType(), False), *schema.fields]
    )


def read_event_log(spark: SparkSession, path: str) -> EventLog:
    """Read a parquet/json envelope table and return the typed view."""
    if path.endswith(".json") or path.endswith(".jsonl"):
        raw = spark.read.schema(ENVELOPE_SCHEMA).json(path)
    else:
        raw = spark.read.parquet(path)
    return EventLog.from_envelopes(raw)
