"""Connected components, approximate-aggregate error bounds, pivot."""

from pyspark.sql import functions as F

from min_flink_spark.operators.graph import connected_components


def test_connected_components_basic(spark):
    # two components: {1,2,3,4} (chain) and {10,11}; 20-21-22 triangle
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)],
        "doc_a bigint, doc_b bigint",
    )
    got = {r["node"]: r["component"] for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_connected_components_long_chain(spark):
    """Label propagation must cross a diameter-8 path (several rounds)."""
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(100, 108)], "doc_a bigint, doc_b bigint"
    )
    got = {r["node"]: r["component"] for r in connected_components(edges).collect()}
    assert set(got.values()) == {100} and len(got) == 9


def test_approx_count_distinct_error_bound(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    exact = ev.agg(F.countDistinct("user_id")).first()[0]
    approx = ev.agg(F.approx_count_distinct("user_id", rsd=0.02)).first()[0]
    assert abs(approx - exact) / exact < 0.1  # 2% rsd target, 10% guard


def test_approx_percentile_near_exact(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    exact = ev.agg(F.expr("percentile(value, 0.5)")).first()[0]
    approx = ev.agg(F.expr("approx_percentile(value, 0.5, 1000)")).first()[0]
    assert abs(approx - exact) <= 0.05 * (abs(exact) + 1)


def test_pivot_row_sums_match_counts(spark, sf_dir):
    from min_flink_spark.queries.analytics_q import EVENT_TYPES, q_pivot

    piv = q_pivot(spark, sf_dir)
    total = piv.select(
        sum([F.col(t) for t in EVENT_TYPES], F.lit(0)).alias("s")
    ).agg(F.sum("s")).first()[0]
    n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert total == n_events


def test_connected_components_log_rounds_on_chain(spark):
    """Pointer jumping must collapse a 96-hop chain within ~log2 rounds
    (plain one-hop propagation would need 96; strict=True raises if the
    budget is blown, so passing PROVES the O(log d) behavior)."""
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(96)], "doc_a bigint, doc_b bigint"
    )
    got = {
        r["node"]: r["component"]
        for r in connected_components(edges, max_iter=10, strict=True).collect()
    }
    assert set(got.values()) == {0} and len(got) == 97


def test_connected_components_matches_union_find_random(spark):
    """Distributed result equals a pure-Python union-find on a pseudo-
    random graph (deterministic edge set)."""
    import hashlib

    def h(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)

    n = 200
    edge_list = []
    for i in range(300):
        a, b = h(i) % n, h(i + 1000) % n
        if a != b:
            edge_list.append((min(a, b), max(a, b)))
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edge_list:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {}
    touched = {x for e in edge_list for x in e}
    for x in touched:
        expected[x] = find(x)
    # canonical label = min node in component
    comp_min = {}
    for x, r in expected.items():
        comp_min.setdefault(r, x)
        comp_min[r] = min(comp_min[r], x)
    expected = {x: comp_min[r] for x, r in expected.items()}

    edges = spark.createDataFrame(edge_list, "doc_a bigint, doc_b bigint")
    got = {r["node"]: r["component"] for r in connected_components(edges).collect()}
    assert got == expected


def test_declining_streak_handmade(spark, tmp_path):
    """3-step decline detected; interrupted runs reset; ties on ts
    segment by event_id."""
    import datetime as dt

    from min_flink_spark.queries.analytics_q import q_declining_streaks

    t0 = dt.datetime(2020, 1, 1)
    rows = [
        # user 1: 5 > 4 > 3 then up — longest run 3
        (1, t0, 1, 5.0), (1, t0, 2, 4.0), (1, t0, 3, 3.0), (1, t0, 4, 9.0),
        # user 2: strictly increasing — no run
        (2, t0, 5, 1.0), (2, t0, 6, 2.0), (2, t0, 7, 3.0),
        # user 3: 4-long decline
        (3, t0, 8, 9.0), (3, t0, 9, 7.0), (3, t0, 10, 5.0), (3, t0, 11, 1.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id bigint, ts timestamp, event_id bigint, value double"
    )
    src = str(tmp_path / "streak_events")
    df.write.parquet(src + "/events.parquet")
    got = {
        r["user_id"]: r["longest_decline"]
        for r in q_declining_streaks(spark, src).collect()
    }
    assert got == {1: 3, 3: 4}


def test_iterate_fixed_point_bfs(spark):
    """Single-source shortest hop distances via iterate_fixed_point:
    relax each node's distance through its neighbors until stable."""
    from pyspark.sql import functions as F

    from min_flink_spark.operators.iterate import iterate_fixed_point

    # chain 0-1-2-3 plus triangle 3-4-5-3: distances from node 0
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (5, 3)],
        "u bigint, v bigint",
    )
    sym = edges.union(edges.select("v", "u")).localCheckpoint(eager=True)
    big = 10**9
    nodes = sym.select(F.col("u").alias("node")).distinct()
    init = nodes.withColumn(
        "dist", F.when(F.col("node") == 0, F.lit(0)).otherwise(F.lit(big))
    )

    def relax(state):
        nbr = (
            sym.join(state, sym["v"] == state["node"])
            .groupBy(F.col("u").alias("node"))
            .agg(F.min(F.col("dist") + 1).alias("nd"))
        )
        return state.join(nbr, "node", "left").select(
            "node", F.least("dist", F.coalesce("nd", F.col("dist"))).alias("dist")
        )

    out = iterate_fixed_point(init, relax, max_iter=10)
    got = {r["node"]: r["dist"] for r in out.collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3, 4: 4, 5: 4}


def test_iterate_fixed_point_strict_raises(spark):
    """A step that never stabilizes must raise under strict."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from min_flink_spark.operators.iterate import iterate_fixed_point

    init = spark.createDataFrame([(0,)], "x bigint")
    with _pytest.raises(RuntimeError, match="did not converge"):
        iterate_fixed_point(init, lambda df: df.select((F.col("x") + 1).alias("x")), max_iter=3)


def test_bfs_hops_chain_and_early_exit(spark):
    from min_flink_spark.operators.graph import bfs_hops

    # undirected chain 1-2-3-4-5 (symmetrized), seed {1}
    und = [(i, i + 1) for i in range(1, 5)]
    edges = spark.createDataFrame(
        und + [(b, a) for a, b in und], "src bigint, dst bigint"
    )
    seeds = spark.createDataFrame([(1,)], "node bigint")
    got = {r["node"]: r["hops"] for r in bfs_hops(edges, seeds, max_hops=3).collect()}
    assert got == {1: 0, 2: 1, 3: 2, 4: 3}  # 5 is beyond max_hops
    # directed: 1→2→3 only; 3's out-edge absence stops the walk (early
    # exit fires when the frontier empties before max_hops)
    d_edges = spark.createDataFrame([(1, 2), (2, 3)], "src bigint, dst bigint")
    got_d = {
        r["node"]: r["hops"] for r in bfs_hops(d_edges, seeds, max_hops=5).collect()
    }
    assert got_d == {1: 0, 2: 1, 3: 2}


def test_bfs_hops_min_distance_from_any_seed(spark):
    from min_flink_spark.operators.graph import bfs_hops

    und = [(1, 2), (2, 3), (3, 4), (4, 5)]
    edges = spark.createDataFrame(
        und + [(b, a) for a, b in und], "src bigint, dst bigint"
    )
    seeds = spark.createDataFrame([(1,), (5,)], "node bigint")
    got = {r["node"]: r["hops"] for r in bfs_hops(edges, seeds, max_hops=3).collect()}
    assert got == {1: 0, 5: 0, 2: 1, 4: 1, 3: 2}  # min over both seeds


def test_k_core_peels_pendant_keeps_clique(spark):
    from min_flink_spark.operators.graph import k_core

    # triangle {1,2,3} + pendant 4 hanging off 1
    und = [(1, 2), (1, 3), (2, 3), (1, 4)]
    edges = spark.createDataFrame(
        und + [(b, a) for a, b in und], "src bigint, dst bigint"
    )
    rounds = k_core(edges, k=2, rounds=3)
    per_round = [
        sorted({r["src"] for r in df.select("src").distinct().collect()})
        for df in rounds
    ]
    assert per_round[0] == [1, 2, 3]  # pendant 4 (deg 1) peels immediately
    assert per_round[1] == [1, 2, 3] == per_round[2]  # fixed point: idempotent
    # cascading: chain 1-2-3-4 at k=2 dissolves completely (endpoints
    # peel, middles become endpoints, repeat)
    chain = [(1, 2), (2, 3), (3, 4)]
    cedges = spark.createDataFrame(
        chain + [(b, a) for a, b in chain], "src bigint, dst bigint"
    )
    crounds = k_core(cedges, k=2, rounds=3)
    assert crounds[-1].count() == 0
