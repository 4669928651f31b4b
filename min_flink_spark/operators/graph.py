"""Iterative connected components — duplicate-cluster resolution.

Near-dup detection yields PAIRS; curation needs CLUSTERS (one canonical
doc per group of mutual near-dups). Components over the pair graph via
label propagation: every node starts as its own label (its id), then
repeatedly adopts the min label among itself and its neighbors until a
fixed point.

Scale: each iteration is one join + one agg on the edge list —
O(E) per round, O(diameter) rounds. Dedup graphs are unions of small
cliques (diameter ~1-2), so convergence takes 2-3 rounds. Iterations
are driven from the driver loop, but ONLY the convergence flag
(one count) crosses to the driver — never the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 20,
) -> DataFrame:
    """(node, component) with component = min node id in the component.

    ``edges`` is an undirected pair list; isolated nodes don't appear
    (callers union them in with their own id if needed).
    """
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        # materialize once: every iteration joins against the edge list,
        # and without this the ENTIRE upstream pipeline that produced the
        # edges (e.g. a shingle self-join) re-executes per round
        .localCheckpoint(eager=True)
    )
    labels = sym.select(F.col("u").alias("node")).distinct().withColumn(
        "component", F.col("node")
    )
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym["v"] == labels["node"])
            .groupBy(F.col("u").alias("node"))
            .agg(F.min("component").alias("nbr_component"))
        )
        updated = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce("nbr_component", F.col("component"))
                ).alias("component"),
                F.col("component").alias("_old"),
            )
        )
        # Materialize FIRST (truncates the exponentially growing lineage
        # of iterative plans), then derive both the convergence flag and
        # the next labels from the checkpointed frame — one execution
        # per round, not two.
        updated = updated.localCheckpoint(eager=True)
        changed = updated.filter(F.col("component") != F.col("_old")).limit(1).count()
        labels = updated.drop("_old")
        if changed == 0:
            break
    return labels
