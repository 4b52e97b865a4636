"""Graph helpers for dedup pipelines: connected components over near-dup
pairs → canonical cluster ids.

A near-dup detector (MinHash-LSH, SimHash, n-gram Jaccard — functions/
dedup.py) emits PAIRS; deduplicating a corpus needs CLUSTERS (keep one
canonical doc per component). This is min-label propagation expressed as
DataFrame iterations:

    label(n) ← min(label(n), min over neighbors' labels)

repeated to fixpoint. Each round is one join + one aggregation — both
shuffles keyed by node id — and the iteration count is the graph diameter,
which for near-dup graphs is tiny (clusters are dense cliques-of-copies,
diameter 1-2; the cap exists for adversarial chains). ``localCheckpoint``
truncates the plan between rounds so lineage doesn't grow with iterations
— the standard Spark iterative-algorithm guard. At 100 TB scale swap the
loop body for the alternating large-star/small-star optimization
(Kiveris et al., "Connected Components in MapReduce and Beyond") — same
per-round join shape, provably fewer rounds on long chains.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 25,
    out_node: str = "doc_id",
    out_label: str = "component_id",
) -> DataFrame:
    """Components of the undirected graph given by (src, dst) pairs.

    Returns one row per node appearing in any edge: (out_node, out_label)
    where out_label = min node id of the node's component. Raises if the
    propagation hasn't converged after ``max_iter`` rounds (diameter larger
    than the cap — raise it, or switch to large-star/small-star).
    """
    sym = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).unionByName(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    )
    sym = sym.distinct().localCheckpoint(eager=True)
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        neigh = (
            sym.join(labels, sym.b == labels.node)
            .select(F.col("a").alias("node"), "label")
        )
        new_labels = (
            labels.unionByName(neigh)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels.select(
                F.col("node").alias(out_node), F.col("label").alias(out_label)
            )
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds"
    )
