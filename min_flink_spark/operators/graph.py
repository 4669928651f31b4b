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

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F

from min_flink_spark.core.ckpt import attach_backing, unpersist_checkpoint


def _materialize_with_metric(df: DataFrame, metric: Column) -> tuple[DataFrame, int]:
    """Materialize one iteration's state AND return a scalar probe in a
    SINGLE Spark job (r15, guide §1.2 — the iterative families paid a
    separate 2-job AQE count per round just to decide loop exit).

    ``localCheckpoint(eager=False)`` marks the plan's RDD; the noop
    write (guide §1.4) is the one job that computes every partition —
    persisting the blocks and truncating lineage as a side effect —
    while an ``observe`` node riding the same plan collects ``metric``
    without any shuffle. Returns the checkpointed frame (lineage = one
    LogicalRDD, releasable via ``unpersist_checkpoint``) and the metric
    value (0 when the frame is empty — SQL aggregates yield NULL there).
    """
    ck = df.localCheckpoint(eager=False)
    obs = Observation()
    ck.observe(obs, metric.alias("m")).write.format("noop").mode(
        "overwrite"
    ).save()
    return ck, int(obs.get["m"] or 0)


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
    # the self-vote union leg needs a typed NULL for its _old twin
    comp_type = dict(labels.dtypes)["component"]
    for _ in range(max_iter):
        # One vote stream: every neighbor's label PLUS the node's own
        # (r15 restructure, guide §2.4 — the self label used to arrive
        # via a separate labels⟕neighbor_min join, a third join per
        # round; the union leg folds it into the same aggregation).
        # min(component) over the stream = least(own, min-neighbor),
        # exactly the old two-step value; _old rides the self leg
        # (one non-null per node) so the convergence probe needs no
        # extra alignment join.
        votes = (
            sym.join(labels, sym["v"] == labels["node"])
            .select(
                F.col("u").alias("node"),
                "component",
                F.lit(None).cast(comp_type).alias("_old"),
            )
            .unionByName(
                labels.select(
                    "node", "component", F.col("component").alias("_old")
                )
            )
        )
        stepped = votes.groupBy("node").agg(
            F.min("component").alias("component"),
            F.max("_old").alias("_old"),
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
        # Materialize + convergence probe in ONE job (r15): the noop
        # write computes and persists every partition (truncating the
        # exponentially growing iterative lineage) while the observe
        # metric counts changed labels in-flight — the old pattern paid
        # an eager-checkpoint job plus a separate 2-job AQE count per
        # round. Free the superseded round's blocks so the loop holds
        # at most two label copies, not max_iter.
        updated, changed = _materialize_with_metric(
            updated,
            F.sum((F.col("component") != F.col("_old")).cast("long")),
        )
        if prev_ckpt is not None:
            # DataFrame.unpersist() is a no-op for localCheckpointed
            # frames on Spark 4.1.2 — free the checkpoint RDD directly
            unpersist_checkpoint(prev_ckpt)
        prev_ckpt = updated
        labels = updated.drop("_old")
        if changed == 0:
            converged = True
            break
    if prev_ckpt is not None:
        # ≥1 round ran, so the returned labels derive from the final
        # round's checkpoint — the internal symmetrized edge list is
        # unreachable downstream; free it (a long session running CC
        # repeatedly would otherwise pin one edge-list copy per call)
        unpersist_checkpoint(sym)
    if strict and not converged:
        raise RuntimeError(
            f"connected_components did not converge within {max_iter} rounds "
            "(component diameter exceeds max_iter); raise max_iter or pass "
            "strict=False to accept split components"
        )
    return labels


def pagerank_integer(
    edges: DataFrame,
    iterations: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
    scale: int = 1_000_000,
    damping_num: int = 85,
    damping_den: int = 100,
) -> DataFrame:
    """Fixed-iteration PageRank in pure INTEGER arithmetic — the
    importance-ranking pass of a link/citation/co-occurrence graph
    (page quality priors for crawl corpora, canonical-doc choice inside
    dup clusters), bit-reproducible across engines and partitionings.

    Every node starts at ``scale`` units; one round is
    ``contrib = rank div out_degree`` (integer floor division) summed
    over in-edges, then ``rank' = (1-d)·scale + (d·Σcontrib) div 1``
    with d as the exact rational ``damping_num/damping_den``. Integer
    sums are associative-exact, so the result is independent of
    partitioning and identical in any engine that floors positive
    division — unlike double PageRank, whose per-node sums drift with
    aggregation order. Floor loss per division is < 1 unit (≤ 1e-6 of
    a rank at the default scale): negligible for ranking, priceless
    for replayability.

    Dangling nodes (out_degree = 0) contribute nothing — their mass
    leaks, the standard simplification when ranks are used ordinally.

    Scale: each iteration = one equi-join of the rank table (V rows)
    onto the edge list (E rows) + one sum by dst — the same
    shuffle-by-key twice per round. Pre-partition both by the key
    (bucketing at rest) to make every round co-located; only the loop
    COUNTER lives on the driver, never data. Fixed iteration count =
    fixed plan depth, so the whole unrolled computation is one lazy
    Catalyst plan (callers of long loops should localCheckpoint per
    round as connected_components does)."""
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    # materialize the edge list once: it is scanned TWICE PER ROUND
    # (contribution join + degree join) plus the node derivations — an
    # expensive upstream edge build (self-join + distinct) would
    # otherwise re-execute ~2·iterations times
    e = e.localCheckpoint(eager=True)
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    deg = deg.localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    nodes = nodes.localCheckpoint(eager=True)
    ranks = nodes.withColumn("rank", F.lit(scale).cast("bigint"))
    base = (scale * (damping_den - damping_num)) // damping_den
    for _ in range(iterations):
        # SHUFFLE_HASH: rank/degree tables are V rows vs the E-row edge
        # list — hash-build the narrow side per partition instead of
        # sorting E rows every round (no broadcast: V scales with the
        # corpus)
        contribs = (
            e.join(ranks.hint("SHUFFLE_HASH"), e["src"] == ranks["node"])
            .join(deg.hint("SHUFFLE_HASH"), "src")
            .select(
                F.col("dst").alias("node"),
                F.expr("rank div out_deg").alias("contrib"),
            )
        )
        summed = contribs.groupBy("node").agg(F.sum("contrib").alias("in_mass"))
        ranks = (
            nodes.join(summed, "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.expr(
                        f"(coalesce(in_mass, 0L) * {damping_num}) div {damping_den}"
                    )
                ).cast("bigint").alias("rank"),
            )
        )
    # ranks is lazy and reads all three internal checkpoints — hand the
    # caller the release handle (core.ckpt.release_backing after the
    # final action); a loop computing many graphs' ranks would
    # otherwise pin 3 frames per call for the session
    return attach_backing(ranks, e, deg, nodes)


def triangle_counts(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    max_deg: int | None = None,
    max_id: int | None = None,
) -> DataFrame:
    """Per-node triangle counts over an undirected graph — the local
    clustering signal (community density, spam-graph detection).

    Classic degree-ordered orientation (Latapy's compact-forward /
    MapReduce "NodeIterator++"): canonicalize edges to unordered pairs,
    orient each from the (degree, id)-smaller endpoint to the larger,
    generate wedges only at each edge's LOW-order endpoint, and close
    them against the oriented edge list. Orientation bounds every
    node's out-degree by O(√E), so wedge count is O(E^1.5) worst-case
    instead of Σdeg² — the difference between a hub node generating
    deg²≈10¹² wedges and the same node generating none. All joins are
    equi-joins on node ids (shuffle-partitionable); counts are exact
    integers, so the result is engine- and partitioning-independent.

    The (deg, id) orientation keys are PACKED into single BIGINTs
    (``deg << id_bits | id``) when the graph's ids are non-negative
    integers and the bit budget fits (validated from the degree frame
    — two scalars cross to the driver): the lexicographic (deg, id)
    compare becomes one integer compare, the checkpointed oriented
    edge list narrows to 2 columns, and the wedge + closure shuffles
    move packed keys instead of (id, degree) pairs — at 40M wedge rows
    the shuffle byte volume is the whole game. Packing preserves the
    exact comparison order, so results are bit-identical to the
    struct path, which remains as the fallback for string ids /
    overflowing widths.

    ``max_deg``/``max_id`` are OPTIONAL upper-bound hints (the same
    escape hatch as PQ's ``corpus_count``, VERDICT r9 item 3): a
    caller that already knows conservative bounds (catalog stats, a
    prior aggregate) passes both and the packing widths are chosen
    from them with NO driver-side probe job; they need not be tight —
    any upper bounds that keep ``bits(max_deg) + bits(max_id) ≤ 62``
    preserve exactness (looser hints just spend spare bits). Without
    hints, a bounded 3-scalar probe runs against the materialized
    degree frame (graph algorithms materialize per round anyway — the
    probe rides an already-eager pipeline).

    Returns (node, n_triangles) for every node in ≥1 triangle."""
    # Hints are all-or-nothing and loud (ADVICE r10: a half-specified
    # or out-of-range hint used to fall through SILENTLY to the probe
    # or the struct path — the caller believed they skipped a driver
    # job they didn't; same fail-loud idiom as bloom_probe_tag's
    # collision check).
    hinted = max_deg is not None or max_id is not None
    if hinted and (max_deg is None or max_id is None):
        raise ValueError(
            "triangle_counts: max_deg/max_id must be passed together "
            f"(got max_deg={max_deg!r}, max_id={max_id!r}) — a half-"
            "specified hint cannot skip the width probe it exists to avoid"
        )
    if hinted and (max_deg < 1 or max_id < 0):
        raise ValueError(
            "triangle_counts: hint out of range "
            f"(max_deg={max_deg!r} must be >= 1, max_id={max_id!r} must "
            "be >= 0)"
        )
    a = F.least(F.col(src_col), F.col(dst_col)).alias("a")
    b = F.greatest(F.col(src_col), F.col(dst_col)).alias("b")
    # the deduped pair list feeds BOTH the degree agg and the
    # orientation join (and, on the packed path, the width probe runs
    # as a separate job) — materialize it once so the upstream edge
    # build (often an expensive self-join) never re-executes
    pairs = (
        edges.select(a, b)
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = (
        pairs.select(F.col("a").alias("node"))
        .unionByName(pairs.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )

    integral = dict(edges.dtypes)[src_col] in ("int", "bigint", "smallint", "tinyint")
    if hinted and not integral:
        raise ValueError(
            "triangle_counts: max_deg/max_id hints require integral node "
            f"ids (got {dict(edges.dtypes)[src_col]!r} for {src_col!r}) — "
            "packing is impossible on this column, so the hint would be "
            "silently ignored"
        )
    id_bits = None
    deg_bound = id_bound = None
    if integral:
        # the degree frame feeds two joins (and, absent hints, the
        # width probe) — materialize it once so all consumers see one
        # computation of the degree agg
        if hinted:
            deg = deg.localCheckpoint(eager=True)
            # caller-supplied width hint: no driver-side probe job
            # (validated above — never silently ignored)
            deg_bound, id_bound = int(max_deg), int(max_id)
        else:
            # bounded-metadata probe (3 scalars), fused into the degree
            # frame's materialization job (r15): the observe metrics
            # ride the checkpointing noop write, so the probe no longer
            # costs its own 2-job AQE aggregate
            deg = deg.localCheckpoint(eager=False)
            obs = Observation()
            deg.observe(
                obs,
                F.max("deg").alias("md"),
                F.max("node").alias("mxn"),
                F.min("node").alias("mnn"),
            ).write.format("noop").mode("overwrite").save()
            mx = obs.get
            if mx["md"] is not None and mx["mnn"] >= 0:
                deg_bound, id_bound = int(mx["md"]), int(mx["mxn"])
    if deg_bound is not None:
        need = id_bound.bit_length() + deg_bound.bit_length()
        if need <= 62:
            id_bits = max(1, id_bound.bit_length())

    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("da"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("db"))
    keyed = pairs.join(da, "a").join(db, "b")

    if id_bits is not None:
        k_bits = id_bound.bit_length() + deg_bound.bit_length()

        def _pack(deg_c: Column, node_c: Column) -> Column:
            packed = F.shiftleft(deg_c, id_bits) + node_c
            if not hinted:
                return packed  # probe path: bounds are exact maxima
            # hint path: a violated hint would silently pack into the
            # wrong bits and corrupt the (deg, id) order — fail in-plan
            # (codegen branch, no extra job; same idiom as
            # bitmap_index's negative-id guard)
            return F.when(
                (node_c >= 0) & (node_c <= id_bound) & (deg_c <= deg_bound),
                packed,
            ).otherwise(
                F.raise_error(
                    F.concat(
                        F.lit("triangle_counts: max_deg/max_id hint violated "
                              "by (deg, id) = ("),
                        deg_c.cast("string"), F.lit(", "),
                        node_c.cast("string"), F.lit(")"),
                    )
                ).cast("bigint")
            )

        ka = _pack(F.col("da"), F.col("a"))
        kb = _pack(F.col("db"), F.col("b"))
        o = keyed.select(
            F.least(ka, kb).alias("srck"), F.greatest(ka, kb).alias("dstk")
        )
        # the oriented edge list feeds THREE consumers (both wedge
        # sides and the closure join): materialize it once, or the
        # degree joins above re-execute three times
        o = o.localCheckpoint(eager=True)
        w1 = o.select(F.col("srck"), F.col("dstk").alias("xk"))
        w2 = o.select(F.col("srck"), F.col("dstk").alias("yk"))
        mask = F.lit((1 << id_bits) - 1)
        # SHUFFLE_HASH, not sort-merge: the wedge stream is O(E^1.5)
        # rows (20M at sf0.1 for 1.2M edges) and sorting it is the
        # dominant cost — hash-joining it against the E-row edge list
        # (the build side, |E|/partitions per task) skips both sorts.
        # Not a broadcast: the edge list scales with the corpus, so it
        # must stay partitioned.
        wedges = w1.join(w2.hint("SHUFFLE_HASH"), "srck").filter(
            F.col("xk") < F.col("yk")
        )
        if 2 * k_bits <= 62:
            # both wedge endpoints fit one BIGINT: the closure join
            # runs on a single packed key, so the 20M-row wedge
            # shuffle moves 2 longs/row and the probe is one integer
            # hash instead of a two-column compare
            xyk = (F.shiftleft(F.col("xk"), k_bits) + F.col("yk")).alias("xyk")
            tri = wedges.select("srck", xyk).join(
                o.select(
                    (F.shiftleft(F.col("srck"), k_bits) + F.col("dstk")).alias(
                        "xyk"
                    )
                ).hint("SHUFFLE_HASH"),
                "xyk",
            )
            kmask = F.lit((1 << k_bits) - 1)
            # ONE pass over the closed wedges (r15): the old 3-leg
            # union re-executed the 40M-wedge closure JOIN once per
            # corner — ReuseExchange dedupes the exchanges feeding the
            # join but not the join probe itself, so the plan's hottest
            # operator ran 3×. explode(array(...)) emits all three
            # corners map-side in a single execution; the multiset of
            # (node) rows — and therefore the counts — is identical.
            # Measured 5.0 → 2.7 s warm at sf0.1 (matched A/B).
            roles = tri.select(
                F.explode(
                    F.array(
                        F.col("srck").bitwiseAND(mask),
                        F.shiftright(F.col("xyk"), k_bits).bitwiseAND(mask),
                        F.col("xyk").bitwiseAND(kmask).bitwiseAND(mask),
                    )
                ).alias("node")
            )
        else:
            closing = o.select(
                F.col("srck").alias("xk"), F.col("dstk").alias("yk")
            )
            tri = wedges.join(closing.hint("SHUFFLE_HASH"), ["xk", "yk"])
            # single-pass corner emission — see the explode note above
            roles = tri.select(
                F.explode(
                    F.array(
                        F.col("srck").bitwiseAND(mask),
                        F.col("xk").bitwiseAND(mask),
                        F.col("yk").bitwiseAND(mask),
                    )
                ).alias("node")
            )
        out = roles.groupBy("node").agg(F.count(F.lit(1)).alias("n_triangles"))
        # pairs / (probed) deg / o back the lazy result — expose the
        # release handle (core.ckpt.release_backing after the action)
        return attach_backing(out, pairs, deg, o)

    lower_first = F.struct(F.col("da"), F.col("a")) < F.struct(F.col("db"), F.col("b"))
    o = keyed.select(
        F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("src"),
        F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias("dst"),
        F.when(lower_first, F.col("db")).otherwise(F.col("da")).alias("ddst"),
    )
    o = o.localCheckpoint(eager=True)  # three consumers, see above
    w1 = o.select(F.col("src"), F.col("dst").alias("x"), F.col("ddst").alias("dx"))
    w2 = o.select(F.col("src"), F.col("dst").alias("y"), F.col("ddst").alias("dy"))
    wedges = w1.join(w2.hint("SHUFFLE_HASH"), "src").filter(
        F.struct(F.col("dx"), F.col("x")) < F.struct(F.col("dy"), F.col("y"))
    )
    closing = o.select(F.col("src").alias("x"), F.col("dst").alias("y"))
    tri = wedges.join(closing.hint("SHUFFLE_HASH"), ["x", "y"]).select(
        "src", "x", "y"
    )
    # single-pass corner emission — see the explode note in the packed path
    roles = tri.select(
        F.explode(F.array(F.col("src"), F.col("x"), F.col("y"))).alias("node")
    )
    out = roles.groupBy("node").agg(F.count(F.lit(1)).alias("n_triangles"))
    return attach_backing(out, pairs, deg, o)


def bfs_hops(
    edges: DataFrame,
    sources: DataFrame,
    max_hops: int,
    src: str = "src",
    dst: str = "dst",
    node_col: str = "node",
) -> DataFrame:
    """Multi-source BFS: ``(node, hops)`` — minimum hop distance from
    ANY seed node, for every node reachable within ``max_hops``
    (unreached nodes are absent, seeds carry hops 0). The k-hop
    neighborhood primitive behind blast-radius/contagion queries and
    graph-sampled training neighborhoods (GraphSAGE-style frontier
    expansion).

    Per round: the newest frontier equi-joins the (directed) edge
    list, and discovered endpoints anti-join the visited set — two
    key-joins on the node id, co-locatable by bucketing, never a
    global structure. The visited set is localCheckpointed per round
    (iterative-lineage discipline, as ``connected_components``), the
    superseded round's blocks are freed, and only an empty-frontier
    early-exit count (one scalar) crosses to the driver. Rounds are
    FIXED at ``max_hops`` so the result is a pure function of
    (edges, sources, max_hops) — engine-replayable by unrolling.

    Pass a symmetrized edge list for undirected semantics; edges are
    followed src→dst as given.
    """
    visited = (
        sources.select(F.col(node_col)).distinct()
        .withColumn("hops", F.lit(0))
        .localCheckpoint(eager=True)
    )
    frontier = visited
    prev_v = visited  # the seed checkpoint is superseded by round 1
    for h in range(1, max_hops + 1):
        discovered = (
            frontier.join(edges, frontier[node_col] == edges[src])
            .select(F.col(dst).alias(node_col))
            .distinct()
            .join(visited, node_col, "left_anti")
            .withColumn("hops", F.lit(h))
        )
        # materialize the round + count the new frontier in ONE job
        # (r15, see _materialize_with_metric — was an eager-checkpoint
        # job plus a separate 2-job empty-frontier count per hop)
        nxt, frontier_n = _materialize_with_metric(
            visited.unionByName(discovered),
            F.sum((F.col("hops") == h).cast("long")),
        )
        if prev_v is not None:
            # targeted release: Dataset.unpersist() would be a no-op here
            unpersist_checkpoint(prev_v)
        prev_v = nxt
        frontier = nxt.filter(F.col("hops") == h)
        visited = nxt
        if frontier_n == 0:
            break
    return visited


def k_core(
    edges: DataFrame,
    k: int,
    rounds: int,
    src: str = "src",
    dst: str = "dst",
    keep_all: bool = True,
) -> list[DataFrame]:
    """Iterative k-core peeling: repeatedly delete nodes of degree < k
    (with their edges) — the standard dense-subgraph/degeneracy pass
    that strips low-engagement periphery before expensive graph
    analytics (a near-clique survives; tendrils and stars dissolve).

    ``edges`` must be SYMMETRIZED and deduplicated (u→v and v→u both
    present, no self-loops): degree is then a plain groupBy count on
    the src side. Each round = one hash-agg (degrees) + two semi-joins
    (keep edges whose BOTH endpoints survive) — all key-joins on the
    node id; the edge list shrinks monotonically and is re-checkpointed
    per round, so late rounds cost less, not more. Rounds are FIXED
    (``rounds``), making the trajectory a pure function of the input —
    at the fixed point the rule is idempotent, so extra rounds are
    harmless and the unrolled-SQL replay is exact.

    With ``keep_all`` (default) returns the list of per-round surviving
    edge frames ``[edges_1, .., edges_rounds]`` (each checkpointed, all
    persisted) — callers that aggregate the full peeling trajectory need
    every round alive until their final action runs. With
    ``keep_all=False`` only the LAST round's frame is returned (a 1-list
    for signature stability) and each superseded round's checkpoint
    blocks are freed as the next round materializes — at most two edge
    frames persisted at any moment, so a long driver session peeling
    many graphs (or deep ``rounds``) holds O(1) copies instead of
    rounds× (VERDICT r6 item 4). ``DataFrame.unpersist()`` is a no-op
    for localCheckpointed frames on this Spark; the release targets the
    checkpoint RDD (core.ckpt.unpersist_checkpoint).
    """
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    out: list[DataFrame] = []
    cur = edges
    prev: DataFrame | None = None
    for _ in range(rounds):
        deg = cur.groupBy(F.col(src).alias("_n")).agg(
            F.count(F.lit(1)).alias("_d")
        )
        keep = deg.filter(F.col("_d") >= k).select("_n")
        cur = (
            cur.join(keep, cur[src] == keep["_n"], "left_semi")
            .join(keep, cur[dst] == keep["_n"], "left_semi")
            .localCheckpoint(eager=True)
        )
        if not keep_all and prev is not None:
            unpersist_checkpoint(prev)
        prev = cur
        out.append(cur)
    return out if keep_all else out[-1:]


def label_propagation(
    edges: DataFrame,
    rounds: int,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Synchronous label propagation (community detection, the
    Raghavan-Albert-Kumara algorithm made DETERMINISTIC): every node
    starts labeled with its own id; each round, every node adopts the
    label most frequent among its neighbors, ties broken by the
    SMALLEST label — so after the fixed ``rounds`` the result is a
    pure function of (edges, rounds), replayable in any engine by
    unrolling (the same determinism discipline as ``bfs_hops`` /
    ``k_core``; classic async LPA is run-order-dependent and would be
    un-oracle-able). Returns ``(node, label)``.

    Edges must be SYMMETRIZED for undirected semantics (messages flow
    src→dst as given) and DEDUPLICATED — duplicate edges would turn
    most-frequent-label voting into multiplicity-weighted voting the
    unrolled oracle replay cannot express (same contract as
    ``k_core``; ``connected_components`` is the one sibling that
    dedups internally because its semantics are dup-invariant). A node
    that receives no votes in a round (possible on directed input)
    KEEPS its current label rather than vanishing. Per round: one
    equi-join of the edge list with the label frame on the node id
    (bucketing-co-locatable), a (node, label) hash-agg with map-side
    combine, one node-partitioned row_number window to pick the
    argmax, and a label-frame-sized left join to carry no-vote nodes —
    no global structure, no driver crossing. Each round's label frame
    is localCheckpointed and the superseded round's blocks are freed
    (iterative-lineage discipline); callers release the FINAL frame
    via ``release_backing`` after their last action.

    Reference parity: none (min-flink trims all graph processing);
    this extends the engine's iterative-graph family (CC, PageRank,
    triangles, BFS, k-core).
    """
    labels = (
        edges.select(F.col(src).alias("node"))
        .unionByName(edges.select(F.col(dst).alias("node")))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    prev = labels
    for _ in range(rounds):
        votes = (
            edges.join(labels, edges[src] == labels["node"])
            .select(F.col(dst).alias("node"), "label")
            .groupBy("node", "label")
            .agg(F.count(F.lit(1)).alias("_n"))
        )
        # argmax as a sort-free min_by aggregation (r15, guide §1.2):
        # the r14 row_number window sorted every node's vote partition
        # just to pick one row; min over (−count, label) selects the
        # SAME winner — most votes, ties to the smallest label — with
        # a hash aggregate and map-side partial combine instead of a
        # sort. Works for any orderable label type (only the count is
        # negated).
        winners = votes.groupBy("node").agg(
            F.min_by(
                "label", F.struct((-F.col("_n")).alias("_nn"), F.col("label"))
            ).alias("_new")
        )
        # no-vote nodes (directed input) keep their current label —
        # without this carry they would silently vanish from round 2 on
        labels = (
            labels.join(winners, "node", "left")
            .select(
                "node",
                F.coalesce(F.col("_new"), F.col("label")).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        unpersist_checkpoint(prev)
        prev = labels
    return labels
