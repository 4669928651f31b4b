"""Iterative connected components — duplicate-cluster resolution.

Near-dup detection yields PAIRS; curation needs CLUSTERS (one canonical
doc per group of mutual near-dups). Components over the pair graph via
label propagation: every node starts as its own label (its id), then
repeatedly adopts the min label among itself and its neighbors until a
fixed point.

Scale: each iteration is one join + one agg on the edge list plus one
label-compression join — O(E + V) per round. Plain min-label
propagation advances ONE hop per round (O(diameter) rounds — a
1M-node chain would need 1M rounds); the added pointer-jumping step
(``component ← label[component]``, the path-halving trick from the
classic PRAM algorithm, cf. Kiveris et al., "Connected Components in
MapReduce and Beyond") doubles the collapsed distance per round, so
convergence is O(log diameter) — 20 rounds cover a 1M-hop chain.
Dedup graphs are unions of near-cliques (diameter 1-2) and converge
in 2-3 rounds either way. Iterations are driven from the driver loop,
but ONLY the convergence flag (one count) crosses to the driver —
never the data.
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

    Min-label propagation with pointer jumping: labels reach
    2^rounds hops per round, so components with diameter > 2^max_iter
    would come back SPLIT; with ``strict`` (default) the function
    raises instead of returning silently wrong clusters. The default
    ``max_iter=20`` covers diameters up to ~10^6 hops.
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
        stepped = labels.join(neighbor_min, "node", "left").select(
            "node",
            F.least(
                F.col("component"), F.coalesce("nbr_component", F.col("component"))
            ).alias("component"),
            F.col("component").alias("_old"),
        )
        # Pointer jumping (path halving): component ← label[component].
        # Every label IS a node id, so its own current label exists in
        # the label table; following it doubles the collapsed distance
        # per round — O(log diameter) total rounds instead of O(diameter).
        parents = labels.select(
            F.col("node").alias("_pnode"), F.col("component").alias("_pcomp")
        )
        updated = (
            stepped.join(parents, stepped["component"] == F.col("_pnode"), "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce("_pcomp", F.col("component"))
                ).alias("component"),
                "_old",
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
