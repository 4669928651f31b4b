"""Graph analytics over a co-occurrence graph, end to end.

The graph family on one dataset: parts that share an order form an
undirected co-purchase graph; the pipeline computes
  - connected components (pointer-jumping label propagation),
  - integer PageRank (bit-reproducible importance ranks),
  - degree-ordered triangle counts (local clustering),
  - multi-source BFS hop distance from a seed set (blast radius),
  - k-core membership after fixed-round peeling (dense-core flag),
and joins them into one per-part feature table — the shape a
recommender or graph-ML feature store materializes nightly.

Run: python examples/graph_analytics.py [sf_dir]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from min_flink_spark import get_spark
from min_flink_spark.operators.graph import (
    bfs_hops,
    connected_components,
    k_core,
    pagerank_integer,
    triangle_counts,
)


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_spark(app_name="graph-analytics")
    spark.sparkContext.setLogLevel("ERROR")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_partkey"
    )
    a, b = li.alias("a"), li.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") != F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst"))
        .distinct()
        .localCheckpoint(eager=True)  # three consumers below
    )

    comps = connected_components(
        edges.select(F.col("src").alias("doc_a"), F.col("dst").alias("doc_b"))
    ).select(F.col("node"), F.col("component"))
    ranks = pagerank_integer(edges, iterations=3)
    tris = triangle_counts(edges)
    seeds = edges.filter(F.col("src") < 5).select(F.col("src").alias("node"))
    hops = bfs_hops(edges, seeds, max_hops=3)
    core = (
        # keep_all=False: only the fixed point is needed, so superseded
        # peeling rounds are freed as the next round materializes
        k_core(edges, k=100, rounds=3, keep_all=False)[-1]
        .select(F.col("src").alias("node"))
        .distinct()
        .withColumn("in_core", F.lit(True))
    )

    features = (
        ranks.join(comps, "node", "left")
        .join(tris, "node", "left")
        .join(hops, "node", "left")
        .join(core, "node", "left")
        .select(
            F.col("node").alias("part_id"),
            "component",
            F.col("rank").alias("pagerank_units"),
            F.coalesce("n_triangles", F.lit(0)).alias("n_triangles"),
            F.col("hops").alias("seed_hops"),
            F.coalesce("in_core", F.lit(False)).alias("in_k100_core"),
        )
    )
    print("parts in graph:", features.count())
    print("components:", features.select("component").distinct().count())
    features.orderBy(F.desc("pagerank_units")).show(5, truncate=False)
    # deterministic block release now that every action has run: the
    # lazy rank/triangle results still referenced internal checkpoints
    from min_flink_spark.core.ckpt import release_backing, unpersist_checkpoint

    release_backing(ranks)
    release_backing(tris)
    unpersist_checkpoint(edges)
    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:2])
