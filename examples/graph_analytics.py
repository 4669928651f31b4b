"""Graph analytics over a co-occurrence graph, end to end.

The graph family on one dataset: parts that share an order form an
undirected co-purchase graph; the pipeline computes
  - connected components (pointer-jumping label propagation),
  - integer PageRank (bit-reproducible importance ranks),
  - degree-ordered triangle counts (local clustering),
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
    connected_components,
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

    features = (
        ranks.join(comps, "node", "left")
        .join(tris, "node", "left")
        .select(
            F.col("node").alias("part_id"),
            "component",
            F.col("rank").alias("pagerank_units"),
            F.coalesce("n_triangles", F.lit(0)).alias("n_triangles"),
        )
    )
    print("parts in graph:", features.count())
    print("components:", features.select("component").distinct().count())
    features.orderBy(F.desc("pagerank_units")).show(5, truncate=False)
    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:2])
