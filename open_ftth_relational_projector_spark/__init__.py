"""open_ftth_relational_projector_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference projector (DAXGRID/open-ftth-relational-projector):
an event-sourced CQRS write side that folds a 27-event-type stream into 8
denormalized relational tables.

Design stance (NOT a port):
  * The reference's sequential in-memory fold (ProjektorState.cs) becomes a set
    of declarative DataFrame projection definitions (projections/).
  * Dictionary lookups become broadcast / as-of joins (operators/asof.py).
  * Incremental counters become groupBy aggregations over current state.
  * The one genuinely custom scalar operator — walk ⊖ hop-interval subtraction
    (ProjektorState.cs:178-221) — is a JVM-side higher-order-function fold
    (operators/walk_hops.py), no Python in the hot path.
  * Batch (full replay) and streaming (foreachBatch incremental) share one
    expression core (projections/core.py + streaming/incremental.py).

Beyond reference parity, functions/ adds the LLM-training-data-pipeline
surface: dedup (exact/MinHash-LSH/SimHash/n-gram/embedding), similarity
search, text analysis, and multimodal column plumbing — all designed for
100 TB scale (keyed partitioning, broadcast small sides, no driver state).
"""

__version__ = "0.1.0"
