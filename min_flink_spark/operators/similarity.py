"""Embedding similarity search: brute-force cosine and LSH-bucketed ANN.

Vectors are plain ``array<float>`` columns; all math happens JVM-side
via higher-order functions (zip_with/aggregate) after casting to double
— no Python in the hot path.

Scale design: brute-force is the correctness baseline and is already
the right shape for "small query set × huge corpus" (queries broadcast;
corpus never shuffles, each partition scores its share and pre-selects
its local top-k before the final merge). The LSH variant buckets the
corpus by deterministic random-hyperplane signs so each query only
scores its bucket — the recall/speed trade is the standard ANN deal.

Shared ``exclude_self`` contract (brute_force_topk / lsh_bucket_topk /
ivf_topk): True assumes queries are drawn FROM the corpus (shared id
space) and drops the identical id from results. Pass False when
querying with EXTERNAL vectors whose ids merely collide numerically —
otherwise a legitimate neighbor is silently dropped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from min_flink_spark.core.ckpt import attach_backing, unpersist_checkpoint


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def _lit_double_array(vals) -> F.Column:
    """Literal array<double> in ONE JVM call (r14 optimization):
    ``F.array(*[F.lit(v) ...])`` costs one py4j round trip per element —
    the hyperplane/centroid literal tables built here reach thousands of
    elements per query, and the round trips alone measured 4-6 s of
    DRIVER-side query construction on the LSH path (plan and execution
    were fine; Python was the bottleneck). A SQL-parsed array literal is
    one call (~100× faster measured) and bit-exact: ``repr()`` of a
    finite Python float is the shortest decimal that round-trips, and
    the JVM's double parser returns exactly that double (verified
    including -0.0, denormals, and 1e±300 magnitudes)."""
    return F.expr("array(" + ",".join(repr(float(v)) + "D" for v in vals) + ")")


def dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a, b):
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    exclude_self: bool = True,
) -> DataFrame:
    """Exact top-k by cosine for each query vector.

    Plan: broadcast the (small) query set against the corpus, score with
    codegen'd array math, per-partition pre-top-k via row_number after
    one shuffle on query_id. Ties break on corpus id for determinism.
    ``exclude_self``: shared contract, see module docstring.
    """
    q = queries.select(
        F.col(id_col).alias(query_id_col), _as_double(F.col(vec_col)).alias("_qv")
    )
    c = corpus.select(F.col(id_col), _as_double(F.col(vec_col)).alias("_cv"))
    cond = F.col(id_col) != F.col(query_id_col) if exclude_self else F.lit(True)
    scored = c.join(F.broadcast(q), on=cond).select(
        query_id_col,
        id_col,
        cosine(F.col("_qv"), F.col("_cv")).alias("cos_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cos_sim").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 8,
    num_tables: int = 4,
    dim: int | None = None,
    exact: bool = False,
) -> DataFrame:
    """Pairs (a < b) with exact cosine ≥ threshold, found among
    LSH-bucket collisions — the 100 TB default.

    Candidate generation: ``num_tables`` independent random-hyperplane
    signatures of ``num_planes`` bits each; a pair is a candidate iff it
    shares a (table, signature) bucket in ANY table (OR-amplification).
    Candidates then get an EXACT cosine rerank against ``threshold``, so
    precision is 1.0; recall is the standard hyperplane-LSH bound
    (≈ 1-(1-(1-θ/π)^P)^T — identical vectors always collide). The only
    self-join is per-bucket: corpus-sized input, ~N/2^planes rows per
    bucket per table, never the quadratic all-pairs.

    ``exact=True`` is the brute-force all-pairs baseline — recall 1.0,
    quadratic, test/small-corpus only.
    """
    v = df.select(F.col(id_col), _as_double(F.col(vec_col)).alias("_v"))
    a = v.select(F.col(id_col).alias("id_a"), F.col("_v").alias("_va"))
    b = v.select(F.col(id_col).alias("id_b"), F.col("_v").alias("_vb"))
    if exact:
        return (
            a.join(b, on=F.col("id_a") < F.col("id_b"))
            .select(
                "id_a", "id_b", cosine(F.col("_va"), F.col("_vb")).alias("cos_sim")
            )
            .filter(F.col("cos_sim") >= threshold)
        )

    if dim is None:
        first = df.select(vec_col).filter(F.col(vec_col).isNotNull()).first()
        if first is None:
            return df.sparkSession.createDataFrame(
                [], f"id_a {dict(df.dtypes).get(id_col, 'bigint')}, "
                    f"id_b {dict(df.dtypes).get(id_col, 'bigint')}, cos_sim double"
            )
        dim = len(first[0])

    sigs = hyperplane_signatures(
        v, vec_col="_v", id_col=id_col, num_planes=num_planes,
        num_tables=num_tables, dim=dim,
    )  # (id, tbl, sig)
    # materialize once: exchange reuse doesn't fire across the aliased
    # self-join sides, and the T×P dot products are the dominant cost
    from pyspark import StorageLevel

    sigs = sigs.persist(StorageLevel.MEMORY_AND_DISK)
    sa = sigs.select(F.col(id_col).alias("id_a"), "tbl", "sig")
    sb = sigs.select(F.col(id_col).alias("id_b"), "tbl", "sig")
    cand = (
        sa.join(sb, on=["tbl", "sig"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .select("id_a", "id_b", cosine(F.col("_va"), F.col("_vb")).alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )


def hyperplane_signatures(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    num_planes: int,
    num_tables: int,
    dim: int,
) -> DataFrame:
    """(id, tbl, sig) — one ``num_planes``-bit random-hyperplane
    signature per (row, table). Hyperplane components are md5-derived
    (``_hyperplane``) so ANY engine can replay them: component j of
    plane p in table t is md5(f"{t*1000+p}|{j}")[:8] as a uniform in
    [-0.5, 0.5). Bit p of sig = (v · plane ≥ 0)."""
    # r14 optimization: each table's whole signature is ONE SQL-parsed
    # expression — the Column-API form cost ~10 py4j round trips per
    # plane-dot (T×P of them, per join side), which measured as seconds
    # of DRIVER-side build time on the LSH queries. The SQL text parses
    # to the identical fold (same zip_with/aggregate order, same
    # 0.0-init, same >= 0 sign test, same 2^p weights), so signatures
    # are bit-identical.
    def signature(vec_sql: str, table: int) -> F.Column:
        terms = []
        for p in range(num_planes):
            comps = _hyperplane(table * 1000 + p, dim)
            plane = "array(" + ",".join(repr(float(c)) + "D" for c in comps) + ")"
            d = (
                f"aggregate(zip_with({vec_sql}, {plane}, (x, y) -> x * y), "
                "0.0D, (acc, x) -> acc + x)"
            )
            terms.append(f"(CASE WHEN {d} >= 0 THEN {2 ** p} ELSE 0 END)")
        return F.expr("CAST(" + " + ".join(terms) + " AS BIGINT)")

    # one projection + explode (NOT a per-table union): all T signatures
    # compute in a single pass over the vector column and the downstream
    # self-join sees one subtree it can exchange-reuse — a T-way union
    # would rescan and re-dot the corpus per arm, per join side
    table_structs = [
        F.struct(
            F.lit(t).cast("bigint").alias("tbl"),
            signature(f"`{vec_col}`", t).alias("sig"),
        )
        for t in range(num_tables)
    ]
    return df.select(
        F.col(id_col), F.explode(F.array(*table_structs)).alias("_t")
    ).select(id_col, F.col("_t.tbl").alias("tbl"), F.col("_t.sig").alias("sig"))


def _empty_topk(like: DataFrame, id_col: str, query_id_col: str) -> DataFrame:
    """Zero-row (query_id, id, cos_sim) frame with the right schema."""
    id_type = dict(like.dtypes).get(id_col, "bigint")
    return like.sparkSession.createDataFrame(
        [], f"{query_id_col} {id_type}, {id_col} {id_type}, cos_sim double"
    )


def _hyperplane(plane_idx: int, dim: int) -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane: component j =
    (md5-derived integer centered at 0). Reproducible everywhere, no
    RNG state."""
    import hashlib

    comps = []
    for j in range(dim):
        h = hashlib.md5(f"{plane_idx}|{j}".encode()).hexdigest()[:8]
        comps.append(int(h, 16) / float(0xFFFFFFFF) - 0.5)
    return comps


def lsh_bucket_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    num_planes: int = 4,
    num_tables: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    dim: int | None = None,
    exclude_self: bool = True,
) -> DataFrame:
    """Approximate top-k via multi-table random-hyperplane LSH.

    ``num_tables`` independent signatures (OR-amplification): a corpus
    vector is a candidate if it collides with the query in ANY table —
    the standard recall lever; ``num_planes`` per table controls bucket
    selectivity (cost lever). Each table contributes one broadcast-join
    probe of ~corpus/2^planes rows per query; candidates are deduped
    before scoring. Recall < 1 by design — measured against brute force
    in tests, not an SQL oracle. ``exclude_self``: shared contract, see
    module docstring."""
    if dim is None:
        first = queries.select(vec_col).filter(F.col(vec_col).isNotNull()).first()
        if first is None:  # no queries → empty result, not a crash
            return _empty_topk(queries, id_col, query_id_col)
        dim = len(first[0])

    c = corpus.select(F.col(id_col), _as_double(F.col(vec_col)).alias("_cv"))
    q = queries.select(
        F.col(id_col).alias(query_id_col), _as_double(F.col(vec_col)).alias("_qv")
    )
    # ONE exploded (id, tbl, sig) table per side — not a T-way union of
    # per-table probes: each union arm re-scanned the corpus and re-ran
    # all T×planes dot products (measured 36 parquet scans in the final
    # plan); the exploded shape computes every signature in a single
    # pass and probes all tables through ONE equi-join on (tbl, sig).
    c_sigs = hyperplane_signatures(c, "_cv", id_col, num_planes, num_tables, dim)
    q_sigs = hyperplane_signatures(q, "_qv", query_id_col, num_planes, num_tables, dim)
    on = [
        c_sigs["tbl"] == q_sigs["tbl"],
        c_sigs["sig"] == q_sigs["sig"],
    ]
    if exclude_self:
        on.append(c_sigs[id_col] != q_sigs[query_id_col])
    candidates = (
        c_sigs.join(F.broadcast(q_sigs), on=on)
        .select(q_sigs[query_id_col], c_sigs[id_col])
        .distinct()
    )

    scored = candidates.join(
        F.broadcast(q.select(query_id_col, "_qv")), query_id_col
    ).join(c.select(id_col, "_cv"), id_col).select(
        query_id_col, id_col, cosine(F.col("_qv"), F.col("_cv")).alias("cos_sim")
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cos_sim").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    num_centroids: int = 16,
    n_probe: int = 4,
    kmeans_iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    exclude_self: bool = True,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k — the scale path for big
    corpora: k-means-lite coarse quantizer partitions the corpus into
    ``num_centroids`` cells; each query scores only its ``n_probe``
    nearest cells (corpus fraction ≈ n_probe/num_centroids).

    Centroids are trained with a few Lloyd iterations from a
    DETERMINISTIC seeding (md5-hash bucketing picks the initial
    members), all as DataFrame aggregations — no MLlib dependency, no
    RNG. Centroids collect to the driver (num_centroids × dim floats —
    tiny) and re-broadcast as literals; the corpus itself never moves.
    """
    from min_flink_spark.functions.hashing import hash_bucket

    c = corpus.select(F.col(id_col), _as_double(F.col(vec_col)).alias("_v"))
    first = c.select("_v").filter(F.col("_v").isNotNull()).first()
    if first is None:  # empty corpus → empty result, not a crash
        return _empty_topk(corpus, id_col, query_id_col)
    dim = len(first[0])

    # r15 Lloyd restructure (VERDICT r14 item 3, guide §1.2): one
    # aggregation JOB per iteration instead of two (centroid agg +
    # eager re-assignment checkpoint). The cell assignment is a pure
    # function of (_v, centroid literals) — it never needs the previous
    # iteration's materialized _cell column — so each iteration folds
    # assign-by-current-centroids INTO the grouping key of the next
    # centroid aggregation, over a corpus frame checkpointed exactly
    # once. The centroid sequence is bit-identical: iteration i's agg
    # groups by the same assignment values the old code materialized,
    # over the same partitioning (the shared corpus checkpoint), and
    # the argmin fold keeps the r14 tie semantics (ascending cell order
    # + strict `<`). Measured: 8 jobs → 5 for the train phase, no
    # per-iteration cache write of the corpus-sized seeded frame.
    c = c.localCheckpoint(eager=True)
    avg_aggs = [F.avg(F.col("_v")[i]).alias(f"c{i}") for i in range(dim)]

    def _assign_expr(cents: dict) -> F.Column:
        # ONE fold over (cell, centroid) structs (r14): the r12 nested
        # when-chain re-evaluated each distance fold once per chain
        # reference (O(cells²) folds/row); the 16-chained-withColumn
        # staging fixed the folds but paid ~2.2 s/iteration of
        # ANALYSIS+codegen on a 16-Project, 1024-literal plan.
        cells = sorted(cents.items())
        cent_arr = F.array(
            *[
                F.struct(
                    F.lit(cell).alias("cell"),
                    _lit_double_array(comps).alias("cv"),
                )
                for cell, comps in cells
            ]
        )

        def _dist(cv):
            return F.aggregate(
                F.zip_with(F.col("_v"), cv, lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )

        return F.aggregate(
            cent_arr,
            F.struct(
                F.lit(float("inf")).alias("d"), F.lit(-1).alias("cell")
            ),
            lambda acc, c: F.when(
                _dist(c["cv"]) < acc["d"],
                F.struct(_dist(c["cv"]).alias("d"), c["cell"].alias("cell")),
            ).otherwise(acc),
        )["cell"]

    # deterministic init: average of each hash bucket
    assign_col = hash_bucket(F.col(id_col), num_centroids)
    centroids: dict = {}
    for _ in range(kmeans_iters):
        cent_rows = c.groupBy(assign_col.alias("_cell")).agg(*avg_aggs).collect()
        centroids = {
            r["_cell"]: [r[f"c{i}"] for i in range(dim)] for r in cent_rows
        }
        assign_col = _assign_expr(centroids)

    # final corpus assignment (lazy — evaluated once by the probe join
    # below; `centroids` holds the last aggregated table, matching the
    # old loop's post-round state exactly)
    seeded = c.withColumn("_cell", assign_col)

    q = queries.select(
        F.col(id_col).alias(query_id_col), _as_double(F.col(vec_col)).alias("_qv")
    )
    # query → its n_probe nearest cells (small cross join vs centroid table)
    cent_table = q.sparkSession.createDataFrame(
        [(cell, comps) for cell, comps in sorted(centroids.items())],
        f"cell int, cvec array<double>",
    )
    qc = q.crossJoin(F.broadcast(cent_table)).select(
        query_id_col,
        "_qv",
        "cell",
        F.aggregate(
            F.zip_with(F.col("_qv"), F.col("cvec"), lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("_d"),
    )
    wq = Window.partitionBy(query_id_col).orderBy(F.col("_d").asc(), F.col("cell").asc())
    probes = (
        qc.withColumn("_rn", F.row_number().over(wq))
        .filter(F.col("_rn") <= n_probe)
        .select(query_id_col, "_qv", "cell")
    )
    self_cond = F.col(id_col) != F.col(query_id_col) if exclude_self else F.lit(True)
    scored = seeded.join(
        F.broadcast(probes),
        on=[seeded["_cell"] == probes["cell"], self_cond],
    ).select(query_id_col, id_col, cosine(F.col("_qv"), F.col("_v")).alias("cos_sim"))
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cos_sim").desc(), F.col(id_col).asc()
    )
    out = (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )
    # the lazy result reads the corpus checkpoint — hand the caller the
    # release handle (the old loop's final seeded checkpoint leaked with
    # no handle at all)
    return attach_backing(out, c)


def l2_normalize(df: DataFrame, vec_col: str = "embedding", out_col: str | None = None) -> DataFrame:
    """Unit-normalize an embedding column (array<float> → array<double>)
    so downstream cosine reduces to a dot product. Pure JVM array math:
    one sequential-fold norm + one transform per row, no shuffle.

    r14 optimization: the cast vector and its norm are STAGED as
    columns before the per-element division — embedding ``norm(v)``
    directly in the transform lambda re-evaluated the whole fold per
    ELEMENT (O(dim²) per row; Catalyst does not hoist loop-invariant
    subtrees out of lambda bodies). Identical values — same fold, same
    divisions."""
    out = out_col or vec_col
    staged = df.withColumn("_l2_v", _as_double(F.col(vec_col))).withColumn(
        "_l2_n", norm(F.col("_l2_v"))
    )
    v, n = F.col("_l2_v"), F.col("_l2_n")
    return staged.withColumn(
        out, F.when(n > 0, F.transform(v, lambda x: x / n)).otherwise(v)
    ).drop("_l2_v", "_l2_n")


def project_embeddings(
    df: DataFrame,
    out_dim: int,
    vec_col: str = "embedding",
    dim: int | None = None,
    prefix: str = "p",
) -> DataFrame:
    """Deterministic random-projection dimensionality reduction
    (Johnson–Lindenstrauss style): out_dim md5-derived hyperplanes (the
    ``_hyperplane`` family — no RNG state, any engine can regenerate
    them), each output component a sequential-fold dot product. Emits
    ``prefix{k}`` double columns — the cheap front-end for ANN at 100 TB
    (project once, index the short vectors).
    """
    if dim is None:
        first = df.select(vec_col).filter(F.col(vec_col).isNotNull()).first()
        if first is None:
            return df.select("*", *[F.lit(0.0).alias(f"{prefix}{k}") for k in range(out_dim)])
        dim = len(first[0])
    v = _as_double(F.col(vec_col))
    cols = []
    for k in range(out_dim):
        comps = _hyperplane(500_000 + k, dim)
        plane = _lit_double_array(comps)
        cols.append(dot(v, plane).alias(f"{prefix}{k}"))
    return df.select("*", *cols)


def quantize_int8(
    df: DataFrame, vec_col: str = "embedding", prefix: str = "q"
) -> DataFrame:
    """Symmetric per-vector int8 quantization: ``scale = max|x| / 127``,
    ``q_i = round(x_i / scale)`` — 4× smaller embedding storage (the
    100 TB embedding-table lever: a 10^9 × 768-dim float32 corpus is
    ~3 TB; int8 cuts it to ~0.77 TB plus one float per vector) at
    a bounded dequantization error of ``scale/2`` per component.

    Emits ``{prefix}vec array<tinyint>`` + ``{prefix}scale double``.
    Pure JVM array math (one fold for the max, one transform), no
    shuffle, engine-reproducible: round() half-up on non-negative
    magnitudes matches across engines, and the zero vector quantizes
    to zeros with scale 0.
    """
    # r14 optimization: the cast vector and the scale are staged as
    # columns — embedding ``scale`` (a whole-array max fold) in the
    # transform lambda re-evaluated it per ELEMENT (O(dim²) per row).
    # Identical values; the emitted qscale column is the same scale.
    staged = df.withColumn("_q_v", _as_double(F.col(vec_col)))
    staged = staged.withColumn(
        "_q_s",
        F.aggregate(
            F.col("_q_v"), F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x))
        )
        / 127.0,
    )
    v, scale = F.col("_q_v"), F.col("_q_s")
    q = F.when(
        scale > 0,
        F.transform(v, lambda x: F.round(x / scale).cast("tinyint")),
    ).otherwise(F.transform(v, lambda x: F.lit(0).cast("tinyint")))
    return (
        staged.withColumn(f"{prefix}vec", q)
        .withColumn(f"{prefix}scale", scale)
        .drop("_q_v", "_q_s")
    )


def dequantize_int8(
    df: DataFrame, qvec_col: str = "qvec", scale_col: str = "qscale",
    out_col: str = "embedding_dq",
) -> DataFrame:
    """Inverse of quantize_int8: ``x_i ≈ q_i · scale`` (array<double>)."""
    s = F.col(scale_col)
    return df.withColumn(
        out_col, F.transform(F.col(qvec_col), lambda q: q.cast("double") * s)
    )


def coarse_to_fine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    coarse_k: int = 20,
    coarse_dims: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    exclude_self: bool = True,
) -> DataFrame:
    """Two-stage search: coarse cosine on the FIRST ``coarse_dims``
    components selects ``coarse_k`` candidates per query, exact cosine
    on the full vectors reranks to top-``k`` — the prefix-truncation
    (Matryoshka-style) pattern. At 100 TB the coarse stage reads a
    ``coarse_dims/dim`` slice of the embedding bytes (store the prefix
    as its own column/file for real I/O savings) and the exact stage
    touches only ``coarse_k`` rows per query. Recall depends on how
    much signal the leading components carry — perfect for
    front-loaded (PCA/Matryoshka-trained) embeddings, a measurable
    trade elsewhere; the gated query emits a per-query recall
    certificate against brute force. Ties break on corpus id.

    ``exclude_self=True`` (default) drops the corpus row whose id
    equals the query's id — correct for self-search where queries are
    drawn from the corpus id space. Pass ``exclude_self=False`` when
    queries come from a SEPARATE table that happens to reuse id values,
    otherwise those corpus rows are silently excluded."""
    q = queries.select(
        F.col(id_col).alias(query_id_col),
        _as_double(F.col(vec_col)).alias("_qv"),
        F.slice(_as_double(F.col(vec_col)), 1, coarse_dims).alias("_qp"),
    )
    c = corpus.select(
        F.col(id_col),
        _as_double(F.col(vec_col)).alias("_cv"),
        F.slice(_as_double(F.col(vec_col)), 1, coarse_dims).alias("_cp"),
    )
    join_cond = (
        F.col(id_col) != F.col(query_id_col) if exclude_self else F.lit(True)
    )
    scored = c.join(F.broadcast(q), on=join_cond).select(
        query_id_col,
        id_col,
        "_qv",
        "_cv",
        cosine(F.col("_qp"), F.col("_cp")).alias("_coarse"),
    )
    wc = Window.partitionBy(query_id_col).orderBy(
        F.col("_coarse").desc(), F.col(id_col).asc()
    )
    cands = scored.withColumn("_crn", F.row_number().over(wc)).filter(
        F.col("_crn") <= coarse_k
    )
    wf = Window.partitionBy(query_id_col).orderBy(
        F.col("cos_sim").desc(), F.col(id_col).asc()
    )
    return (
        cands.select(
            query_id_col, id_col, cosine(F.col("_qv"), F.col("_cv")).alias("cos_sim")
        )
        .withColumn("_rn", F.row_number().over(wf))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    m_subspaces: int = 8,
    n_codes: int = 16,
    kmeans_iters: int = 2,
    shortlist_mult: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    exclude_self: bool = True,
    train_sample_cap: int = 200_000,
    corpus_count: int | None = None,
) -> DataFrame:
    """Product-quantization ANN (Jégou/Douze/Schmid, "Product
    Quantization for Nearest Neighbor Search", TPAMI 2011): split each
    L2-normalized vector into ``m_subspaces`` sub-vectors, k-means each
    subspace into ``n_codes`` centroids, store only the per-subspace
    code ids (m small ints per vector instead of dim floats — the
    memory-bound regime where petabytes of raw embeddings compress to
    an index that fits executor memory), answer queries by ADC
    (asymmetric distance computation: per-query lookup table of partial
    distances, summed by code, never touching the original vectors) to
    a ``k * shortlist_mult`` shortlist, then EXACT-cosine rerank only
    the shortlist rows to top-k.

    Execution shape — every corpus-sized pass is an Arrow-batched
    vectorized numpy kernel, and the corpus NEVER shuffles:

    - training runs on a BOUNDED deterministic sample (md5-threshold,
      ``train_sample_cap`` rows expected; the whole corpus when it is
      smaller) that is localCheckpointed once and freed after the last
      Lloyd round — codebook cost is corpus-size-INDEPENDENT, the
      standard production-PQ discipline (Jégou §V trains on learning
      sets orders of magnitude smaller than the indexed corpus). The
      full corpus is touched exactly once by the kernels (the fused
      encode+ADC pass) plus the rerank join. One count scalar crosses
      to the driver to fix the sample fraction (bounded metadata).
    - k-means refinement as map-side combine — each sample partition
      assigns codes and emits per-(subspace, code) partial sums/counts
      (≤ partitions × m × n_codes tiny rows to the driver, the same
      bounded-metadata contract as ``ivf_topk``'s centroid collect);
      seeding is the deterministic md5-hash-bucket average, no RNG.
      A 1024-term unrolled codegen argmin was measured and REJECTED:
      it blows janino's method limit, falls back to interpreted
      expressions, and runs ~50× slower than the numpy kernel.
    - encode: one kernel pass → ``(id, codes array<int>)``.
    - ADC scan: one kernel pass over the codes; each partition keeps
      only its local top-``k*shortlist_mult`` per query under the total
      order (adc, id) — so only partitions × queries × shortlist rows
      ever move, exactly the brute-force local-top-k shape.
    - rerank: equi-join of the global shortlist back to the corpus.

    Queries collect to the driver (they are the small broadcast side by
    the shared contract) and partial-sum reduction replays in sorted
    (s, code, partition) order, so results are deterministic for a
    fixed input partitioning; centroid low-order bits may drift across
    different partitionings (float summation order), which the gated
    recall certificate absorbs. Empty-cluster slots carry +inf
    distances and can never win an argmin. ``exclude_self``: shared
    contract, see module docstring.
    """
    import numpy as np
    import pandas as pd

    from min_flink_spark.functions.hashing import hash_bucket

    c_raw = corpus.select(F.col(id_col), _as_double(F.col(vec_col)).alias("_v0"))
    first = c_raw.select("_v0").filter(F.col("_v0").isNotNull()).first()
    if first is None:
        return _empty_topk(corpus, id_col, query_id_col)
    dim = len(first[0])
    m, codes_n = m_subspaces, n_codes
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m_subspaces {m}")
    sd = dim // m
    id_type = dict(corpus.dtypes).get(id_col, "bigint")

    def _unit(vcol):
        n = norm(vcol)
        return F.when(n > 0, F.transform(vcol, lambda x: x / n)).otherwise(vcol)

    c = c_raw.select(F.col(id_col), _unit(F.col("_v0")).alias("_v"))
    # float32 transport for the Arrow kernel passes (VERDICT r6 item 5):
    # the source embeddings are array<float> parquet, so the fp32 cast
    # of the normalized vector loses nothing the source had — it halves
    # the (id, vector) serialization width that dominates PQ's fixed
    # cost at corpus scale. Kernels widen to float64 on arrival; the
    # exact rerank keeps the float64 `c` frame (JVM-side, no Arrow).
    c32 = c.select(F.col(id_col), F.col("_v").cast("array<float>").alias("_v"))

    qrows = queries.select(
        F.col(id_col).alias(query_id_col),
        _unit(_as_double(F.col(vec_col))).alias("_qv"),
    ).collect()
    if not qrows:
        return _empty_topk(corpus, id_col, query_id_col)
    qids = [r[query_id_col] for r in qrows]
    Q = np.array([r["_qv"] for r in qrows], dtype=np.float64)
    nq = len(qids)

    # bounded deterministic training sample: md5-threshold keeps an
    # expected train_sample_cap rows however large the corpus is; the
    # checkpoint materializes ONLY the sample, so every Lloyd round
    # (and the seed aggregation) reads O(cap) from memory instead of
    # re-executing the corpus lineage per pass; freed after training
    from min_flink_spark.functions.hashing import md5_prefix_int

    # callers that already know the corpus size (parquet row-count
    # metadata, a prior aggregate) pass corpus_count and skip this
    # pass entirely — below the cap crossover pq_topk then touches the
    # corpus ONLY in the fused encode+ADC kernel (VERDICT r7 item 5)
    n_corpus = corpus_count if corpus_count is not None else c_raw.count()
    sample = c32
    if n_corpus > train_sample_cap:
        # threshold in the FULL 2^32 md5-prefix space: the old
        # parts-per-million quantization floored to 1/1e6 once
        # n_corpus exceeded 1e6*cap, after which the expected sample
        # grew as n/1e6 instead of staying capped. Here the expected
        # sample is n * thr / 2^32 ≈ cap for any realistic n (the
        # floor of 1 only binds past n = 2^32 * cap ≈ 8.6e14 rows).
        thr = max(1, ((1 << 32) * train_sample_cap) // n_corpus)
        sample = c32.filter(
            md5_prefix_int(F.col(id_col).cast("string")) < F.lit(thr)
        )
    sample = sample.localCheckpoint(eager=True)

    try:
        # ---- deterministic seed centroids: md5-bucket averages (JVM agg)
        slices = F.array(*[F.slice(F.col("_v"), s * sd + 1, sd) for s in range(m)])
        seed_rows = (
            sample.select(F.col(id_col), F.posexplode(slices).alias("_s", "_sv"))
            .withColumn(
                "_code",
                hash_bucket(
                    F.concat_ws(
                        "|", F.col(id_col).cast("string"), F.col("_s").cast("string")
                    ),
                    codes_n,
                ),
            )
            .groupBy("_s", "_code")
            .agg(*[F.avg(F.col("_sv")[j]).alias(f"c{j}") for j in range(sd)])
            .collect()
        )
        cents = np.full((m, codes_n, sd), np.inf)
        for r in seed_rows:
            cents[r["_s"], r["_code"]] = [r[f"c{j}"] for j in range(sd)]

        def _assign(V: "np.ndarray", cents_: "np.ndarray") -> "np.ndarray":
            X = V.reshape(len(V), m, sd)
            with np.errstate(over="ignore", invalid="ignore"):
                d = ((X[:, :, None, :] - cents_[None]) ** 2).sum(-1)
            return d.argmin(-1)  # ties → lowest code, deterministic

        # ---- Lloyd refinements: map-side-combine kernel + driver reduce
        partial_schema = "pid int, s int, code int, vsum array<double>, cnt bigint"
        for _ in range(max(0, kmeans_iters - 1)):
            cents_bc = cents  # closure capture (m*n_codes*sd floats, tiny)

            def _partials(batches):
                from pyspark import TaskContext

                pid = TaskContext.get().partitionId()
                sums = np.zeros((m, codes_n, sd))
                cnts = np.zeros((m, codes_n), dtype=np.int64)
                seen = False
                for pdf in batches:
                    if not len(pdf):
                        continue
                    seen = True
                    V = np.stack(pdf["_v"].to_numpy()).astype(np.float64)
                    codes = _assign(V, cents_bc)
                    X = V.reshape(-1, m, sd)
                    for s in range(m):
                        np.add.at(sums[s], codes[:, s], X[:, s])
                        np.add.at(cnts[s], codes[:, s], 1)
                if not seen:
                    return
                rows = [
                    (pid, s, cd, sums[s, cd].tolist(), int(cnts[s, cd]))
                    for s in range(m)
                    for cd in range(codes_n)
                    if cnts[s, cd] > 0
                ]
                yield pd.DataFrame(rows, columns=["pid", "s", "code", "vsum", "cnt"])

            partials = sample.mapInPandas(_partials, schema=partial_schema).collect()
            sums = np.zeros((m, codes_n, sd))
            cnts = np.zeros((m, codes_n), dtype=np.int64)
            for r in sorted(partials, key=lambda r: (r["s"], r["code"], r["pid"])):
                sums[r["s"], r["code"]] += np.array(r["vsum"])
                cnts[r["s"], r["code"]] += r["cnt"]
            cents = np.full((m, codes_n, sd), np.inf)
            nz = cnts > 0
            cents[nz] = sums[nz] / cnts[nz][:, None]
    finally:
        # codebook (or the exception) is driver-side now — the
        # sample's blocks must not outlive training either way
        unpersist_checkpoint(sample)

    # ---- encode pass: (id, codes)
    final_cents = cents

    def _encode(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.stack(pdf["_v"].to_numpy()).astype(np.float64)
            codes = _assign(V, final_cents)
            yield pd.DataFrame(
                {id_col: pdf[id_col], "_codes": list(codes.astype(np.int32))}
            )

    encoded = c32.mapInPandas(_encode, schema=f"{id_col} {id_type}, _codes array<int>")

    # ---- ADC scan with partition-local top-R under total order (adc, id)
    with np.errstate(over="ignore", invalid="ignore"):
        lut = ((Q.reshape(nq, m, 1, sd) - final_cents[None]) ** 2).sum(-1)
    R = k * shortlist_mult
    qids_np = np.array(qids)

    def _adc(batches):
        acc_ids = None
        acc_d = None
        for pdf in batches:
            if not len(pdf):
                continue
            codes = np.stack(pdf["_codes"].to_numpy()).astype(np.int64)
            ids = pdf[id_col].to_numpy()
            d = np.zeros((len(ids), nq))
            for s in range(m):
                d += lut[:, s, codes[:, s]].T
            if acc_ids is not None:
                ids = np.concatenate([acc_ids, ids])
                d = np.vstack([acc_d, d])
            # keep the union of per-query local top-R rows: memory stays
            # O(nq * R) no matter how large the partition is
            keep = set()
            for qi in range(nq):
                keep.update(np.lexsort((ids, d[:, qi]))[:R].tolist())
            sel = np.array(sorted(keep))
            acc_ids, acc_d = ids[sel], d[sel]
        if acc_ids is None:
            return
        out = {query_id_col: [], id_col: [], "_adc": []}
        for qi in range(nq):
            ids_q, d_q = acc_ids, acc_d[:, qi]
            if exclude_self:
                mask = ids_q != qids_np[qi]
                ids_q, d_q = ids_q[mask], d_q[mask]
            order = np.lexsort((ids_q, d_q))[:R]
            out[query_id_col].extend([qids[qi]] * len(order))
            out[id_col].extend(ids_q[order].tolist())
            out["_adc"].extend(d_q[order].tolist())
        yield pd.DataFrame(out)

    local_top = encoded.mapInPandas(
        _adc, schema=f"{query_id_col} {id_type}, {id_col} {id_type}, _adc double"
    )
    wa = Window.partitionBy(query_id_col).orderBy(
        F.col("_adc").asc(), F.col(id_col).asc()
    )
    shortlist = (
        local_top.withColumn("_rn", F.row_number().over(wa))
        .filter(F.col("_rn") <= R)
        .select(query_id_col, id_col)
    )

    # ---- exact rerank on shortlist rows only
    qdf = corpus.sparkSession.createDataFrame(
        [(qid, [float(x) for x in Q[i]]) for i, qid in enumerate(qids)],
        f"{query_id_col} {id_type}, _qv array<double>",
    )
    rerank = shortlist.join(F.broadcast(qdf), query_id_col).join(c, id_col).select(
        query_id_col, id_col, cosine(F.col("_qv"), F.col("_v")).alias("cos_sim")
    )
    wf = Window.partitionBy(query_id_col).orderBy(
        F.col("cos_sim").desc(), F.col(id_col).asc()
    )
    return (
        rerank.withColumn("_rn", F.row_number().over(wf))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def negative_pair_sample(
    corpus: DataFrame,
    k: int = 4,
    id_col: str = "vec_id",
    salt: str = "neg",
) -> DataFrame:
    """Deterministic contrastive NEGATIVE sampling over a dense id
    space: for each anchor row, ``k`` pseudo-random partners at
    ``(id + offset_j) mod N`` with per-slot offsets ``offset_j = 1 +
    (md5("salt:j") mod (N-1))`` — shared by all anchors, never zero, so
    a partner never equals its anchor and the pairing is uniform
    modulo N. Returns ``(anchor_id, slot, neg_id)``.

    This is how embedding-model training data gets in-batch-independent
    negatives WITHOUT a cartesian or an RNG: md5-derived offsets make
    the sample reproducible across engines, partitionings and reruns
    (resumable pipelines), and the plan is explode(k) + one equi-join
    back on the id — fully shuffled-hash-joinable at any corpus size.

    Preconditions are VALIDATED, not assumed: ids must be dense in
    ``[0, N)`` with ``N >= 2`` — a 1-row corpus makes the offset a
    ``pmod`` by zero (NULL partners) and a non-dense id space makes
    computed ``neg_id``s miss the corpus; both used to surface only as
    silently missing join partners. One bounded-metadata aggregate
    (count/count-distinct/min/max — four scalars) crosses to the
    driver and raises instead; ``count_distinct`` is what makes the
    check sound — count/min/max alone are fooled by duplicate ids
    compensating for gaps (ids ``[0,1,1,3]`` give n=4, min=0, max=3),
    whereas distinct=n plus min=0/max=n-1 genuinely implies density.
    The mod arithmetic then rides as literals.

    Collisions between slots (two offsets landing equal) are kept —
    the spec is per-slot independent draws; dedupe downstream if a
    training recipe needs distinct negatives."""
    from min_flink_spark.functions.hashing import md5_prefix_int

    n, nd, mn, mx = corpus.agg(
        F.count(F.lit(1)).cast("bigint"),
        F.count_distinct(F.col(id_col)).cast("bigint"),
        F.min(F.col(id_col)).cast("bigint"),
        F.max(F.col(id_col)).cast("bigint"),
    ).collect()[0]
    if n < 2:
        raise ValueError(
            f"negative_pair_sample needs >= 2 corpus rows, got {n}: "
            "offsets are drawn mod (N-1)"
        )
    if nd != n or mn != 0 or mx != n - 1:
        raise ValueError(
            f"negative_pair_sample needs ids dense in [0, N): got "
            f"min={mn}, max={mx}, distinct={nd} for N={n} rows "
            "(duplicate ids multiply join partners and mask gaps; "
            "use a global_index pass to densify first)"
        )
    slots = corpus.select(F.col(id_col).alias("anchor_id")).select(
        "anchor_id",
        F.explode(F.sequence(F.lit(1), F.lit(k))).alias("slot"),
    )
    offset = F.lit(1) + F.pmod(
        md5_prefix_int(F.concat(F.lit(salt + ":"), F.col("slot").cast("string"))),
        F.lit(n - 1),
    )
    paired = slots.select(
        "anchor_id",
        F.col("slot").cast("bigint").alias("slot"),
        F.pmod(F.col("anchor_id") + offset, F.lit(n)).alias("neg_id"),
    )
    # join back so callers can carry partner payload columns through
    # the same equi-join; density was validated, so it drops nothing
    ids = corpus.select(F.col(id_col).alias("neg_id"))
    return paired.join(ids, "neg_id").select("anchor_id", "slot", "neg_id")


def label_prototypes(
    corpus: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Per-label prototype (class centroid) in EXACT integer micro-unit
    space: ``(label, n, p0..p{dim-1})`` where ``pj`` is the BIGINT sum
    of ``round(v[j]·10⁶)`` over the label's vectors. Sums of integers
    are associative, so prototypes are bit-identical at any parallelism
    and MERGE across shards/days by re-addition (the same contract as
    ``grouped_stats``) — and the SQL replay is exact, unlike a float
    mean whose summation order differs per engine.

    Plan: ONE hash aggregation with map-side combine over ``dim``
    column expressions — no explode (which would multiply rows ×dim
    before the shuffle), no Python.  Output is labels-sized (tiny).

    r14 optimization (two parts): each component is
    ``v[j] cast to double`` — the old ``_as_double(v)[j]`` extracted
    from a TRANSFORM expression, and the lambda-bearing
    cast-the-whole-array subtree re-ran once per component column
    (O(dim²) casts per row; lambda exprIds defeat CSE) — and the ``dim``
    aggregate columns are SQL-parsed (one py4j call each instead of ~6;
    the Column-API build measured ~2.3 s of pure driver time on the
    confusion-census query). cast(extract) ≡ extract(transform-cast)
    element-wise and the parsed trees are the same expressions, so the
    sums are identical."""
    return corpus.groupBy(F.col(label_col).alias("label")).agg(
        F.count(F.lit(1)).alias("n"),
        *[
            F.expr(
                f"sum(CAST(round(CAST(`{vec_col}`[{j}] AS DOUBLE) * 1000000)"
                f" AS BIGINT)) AS p{j}"
            )
            for j in range(dim)
        ],
    )


def nearest_prototype(
    corpus: DataFrame,
    protos: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign every vector to its nearest label prototype (squared
    Euclidean distance to the class MEAN, ties → lowest label) —
    the mislabel-detection / prototype-classification pass of an
    embedding-curation pipeline: rows whose own label disagrees with
    their nearest prototype are review candidates.

    Distance per (vector, label) is computed from EXACT integers in a
    FIXED left-to-right order: with ``vj = round(v[j]·10⁶)`` (BIGINT)
    and prototype sums ``pj`` over ``n`` members,
    ``d = Σ_j (vj − pj/n)²`` in double — both engines fold the same
    exact inputs in the same order, so comparisons replay bit-identical
    in SQL. The prototype table is labels-sized, hence legitimately
    broadcast (bounded by construction, like the ANN query sets); each
    vector meets L prototype rows and one groupBy(id) min-struct picks
    the argmin — no window over the corpus, no data-sized shuffle
    beyond the id-keyed aggregation. Returns ``(id, predicted_label)``.
    """
    # r14 optimization: per-element cast instead of extracting from a
    # transform-cast array (same O(dim²) fix as label_prototypes), and
    # the projection + distance chain are SQL-parsed — one py4j call
    # for the whole vm select and one for the 64-term sum, instead of
    # hundreds (driver build time, not execution, was the cost). The
    # parsed trees are the same expressions in the same left-to-right
    # fold order, so distances replay bit-identical.
    vm = corpus.selectExpr(
        f"`{id_col}`",
        *[
            f"CAST(round(CAST(`{vec_col}`[{j}] AS DOUBLE) * 1000000)"
            f" AS BIGINT) AS v{j}"
            for j in range(dim)
        ],
    )
    # x*x, not pow(x,2): IEEE-identical in SQL replay; the duplicated
    # diff subtree is a plain expression, so codegen CSE merges it
    terms = F.expr(
        " + ".join(
            f"((v{j} - p{j} / n) * (v{j} - p{j} / n))" for j in range(dim)
        )
    )
    scored = vm.join(F.broadcast(protos)).select(
        F.col(id_col), F.col("label"), terms.alias("_d")
    )
    return (
        scored.groupBy(id_col)
        .agg(F.min(F.struct(F.col("_d"), F.col("label"))).alias("_best"))
        .select(F.col(id_col), F.col("_best.label").alias("predicted_label"))
    )
