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
    strict: bool = True,
) -> DataFrame:
    """(node, component) with component = min node id in the component.

    ``edges`` is an undirected pair list; isolated nodes don't appear
    (callers union them in with their own id if needed).

    Min-label propagation advances one hop per round, so components
    with diameter > ``max_iter`` would come back SPLIT; with ``strict``
    (default) the function raises instead of returning silently wrong
    clusters — raise ``max_iter`` for long-chain graphs (dedup graphs
    are near-cliques, diameter 1-2).
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
    converged = False
    prev_ckpt: DataFrame | None = None
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
        # per round, not two. Free the superseded round's blocks so the
        # loop holds at most two label copies, not max_iter.
        updated = updated.localCheckpoint(eager=True)
        if prev_ckpt is not None:
            prev_ckpt.unpersist()
        prev_ckpt = updated
        changed = updated.filter(F.col("component") != F.col("_old")).limit(1).count()
        labels = updated.drop("_old")
        if changed == 0:
            converged = True
            break
    if strict and not converged:
        raise RuntimeError(
            f"connected_components did not converge within {max_iter} rounds "
            "(component diameter exceeds max_iter); raise max_iter or pass "
            "strict=False to accept split components"
        )
    return labels
