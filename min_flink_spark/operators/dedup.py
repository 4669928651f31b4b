"""Deduplication operators for training-data pipelines.

Five strategies, all shuffle-architected for 100 TB:

- **exact**: one hash-agg on a content fingerprint (md5 of normalized
  text); canonical row = min doc_id per fingerprint — a single shuffle,
  map-side partial agg.
- **MinHash + LSH**: shingle → K minhashes (K agg columns over ONE
  shingle explosion — no K× row replication) → B bands → self-join on
  (band, band_key). Only same-bucket docs ever meet, so the join is
  linear-ish in corpus size instead of the quadratic all-pairs.
- **SimHash**: per-token 32-bit hash, bitwise ±1 vote → one agg; near
  dups share the simhash (or differ in few bits).
- **n-gram Jaccard**: exact similarity via inverted-index join on
  shingles (pairs only materialize for docs sharing a shingle).
- **embedding cosine**: see operators/similarity.py.

Cross-engine determinism: every hash is md5-based (identical in Spark,
DuckDB, and any other engine), never engine-private ``hash()``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from min_flink_spark.functions.hashing import md5_prefix_int
from min_flink_spark.functions.text import fingerprint, tokens


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one row (min id) per normalized-content fingerprint."""
    keyed = df.withColumn("_fp", fingerprint(F.col(text_col)))
    rec = F.struct(*[F.col(c) for c in df.columns])
    out = keyed.groupBy("_fp").agg(F.min_by(rec, F.col(id_col)).alias("_rec"))
    return out.select(*[F.col(f"_rec.{c}").alias(c) for c in df.columns])


def shingles(df: DataFrame, text_col: str, id_col: str, n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per document, fully JVM-side.

    The token array is projected ONCE before the shingle transform —
    referencing ``tokens(text)`` inside the lambda would re-run the
    regex split per sequence element (O(tokens²) splits per doc).
    ``array_distinct`` dedupes within the doc, so no cross-row distinct
    (and its shuffle) is needed afterwards.
    """
    toks_df = df.select(F.col(id_col), tokens(F.col(text_col)).alias("_toks"))
    sh = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.size("_toks") - n, F.lit(0))),
            lambda i: F.concat_ws(" ", F.slice("_toks", i + 1, n)),
        )
    )
    return toks_df.select(F.col(id_col), F.explode(sh).alias("shingle")).filter(
        F.size(F.split(F.col("shingle"), " ")) == n
    )


def dedup_substrings(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    df_cap: int = 1000,
) -> DataFrame:
    """Span-level exact-substring dedup (the ExactSubstr technique):
    every ``k``-token substring that repeats ANYWHERE in the corpus is
    kept only at its first occurrence (ordered by ``(doc_id, pos)``) —
    all later occurrences have their token span removed and the
    documents are rebuilt around the holes. Catches the cross-document
    boilerplate that document- and paragraph-level dedup miss (shared
    footers, license blocks, quoted chunks).

    Returns ``(id, text, n_kept, n_tokens)``. The rebuilt ``text`` is
    in NORMALIZED token space — ``tokens()`` lowercases and splits on
    non-alphanumerics, so casing and punctuation are gone even for
    documents with no duplicated spans. Use the rebuilt text when the
    downstream consumer tokenizes anyway (training shards), or use
    ``n_kept / n_tokens`` as a duplication score to FILTER documents
    while keeping their original text (the curation-pipeline example
    does the latter). Overlapping duplicated spans merge naturally:
    coverage is a DISTINCT set of token positions, not intervals.

    Scale shape: one shingle explosion → hash-agg occurrence counts →
    per-shingle first-occurrence window bounded by ``df_cap`` (shingles
    repeating more than ``df_cap`` times are boilerplate left to
    paragraph dedup / repetition signals — an unbounded hot shingle
    would otherwise funnel one window partition), then position-level
    anti-join + per-doc rebuild. Never all-pairs, never a driver
    collect.
    """
    # NB (r14 optimization round, measured NEGATIVE): the token table
    # feeds three consumers and the shingle table two, so persisting
    # them looks like the jaccard/banded-signature win — but measured
    # at sf0.1 it is SLOWER (7.5 s vs 5.1 s): the shingle table is
    # data×k-sized and its cache write costs more than the re-explode
    # (the recompute-vs-materialize knob lands the other way than
    # ngram_jaccard_pairs', whose persisted table is pre-capped and
    # narrower). Left unpersisted deliberately.
    toks_df = df.select(F.col(id_col), tokens(F.col(text_col)).alias("_toks"))
    # 1-based shingle start positions; sequence() DESCENDS when end <
    # start, so short docs need the explicit empty-array guard
    pos_arr = F.when(
        F.size("_toks") >= k, F.sequence(F.lit(1), F.size("_toks") - k + 1)
    ).otherwise(F.array().cast("array<int>"))
    sh = toks_df.select(
        F.col(id_col), "_toks", F.explode(pos_arr).alias("pos")
    ).select(
        F.col(id_col),
        "pos",
        F.concat_ws(" ", F.slice("_toks", F.col("pos"), k)).alias("shingle"),
    )
    dup_shingles = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("_c"))
        .filter((F.col("_c") >= 2) & (F.col("_c") <= df_cap))
        .select("shingle")
    )
    w = Window.partitionBy("shingle").orderBy(F.col(id_col).asc(), F.col("pos").asc())
    dup_occ = (
        sh.join(dup_shingles, "shingle")
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") > 1)
        .select(id_col, "pos")
    )
    covered = dup_occ.select(
        F.col(id_col),
        F.explode(F.sequence(F.col("pos"), F.col("pos") + k - 1)).alias("cpos"),
    ).distinct()
    toks_pos = toks_df.select(
        F.col(id_col), F.posexplode("_toks").alias("_i0", "tok")
    ).select(F.col(id_col), (F.col("_i0") + 1).alias("pos"), "tok")
    kept = toks_pos.join(
        covered,
        on=[
            toks_pos[id_col] == covered[id_col],
            toks_pos["pos"] == covered["cpos"],
        ],
        how="left_anti",
    )
    rebuilt = kept.groupBy(id_col).agg(
        F.concat_ws(
            " ",
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "tok"))),
                lambda s: s["tok"],
            ),
        ).alias("_text"),
        F.count(F.lit(1)).alias("_n_kept"),
    )
    base = toks_df.select(
        F.col(id_col), F.size("_toks").cast("bigint").alias("n_tokens")
    )
    return (
        base.join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("_text"), F.lit("")).alias(text_col),
            F.coalesce(F.col("_n_kept"), F.lit(0)).cast("bigint").alias("n_kept"),
            "n_tokens",
        )
    )


MINHASH_PRIME = 2147483647  # 2^31 − 1


def minhash_signatures(
    sh: DataFrame, id_col: str = "doc_id", num_hashes: int = 16
) -> DataFrame:
    """K minhashes per doc as K agg columns over one shingle table.

    ONE md5 per shingle yields two 32-bit integers (a, b); permutation i
    is the affine family h_i = (a·(i+1) + b) mod (2^31−1) — the standard
    minhash construction, engine-independent (md5 + integer arithmetic),
    and 16× cheaper than hashing per permutation.
    """
    a = md5_prefix_int(F.col("shingle"), 1)
    b = md5_prefix_int(F.col("shingle"), 9)
    aggs = [
        F.min(F.pmod(a * (i + 1) + b, F.lit(MINHASH_PRIME))).alias(f"mh{i}")
        for i in range(num_hashes)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def lsh_bands(
    sigs: DataFrame, id_col: str = "doc_id", num_hashes: int = 16, bands: int = 4
) -> DataFrame:
    """Fold the signature into ``bands`` bucket keys (rows = K/bands).

    ONE projection + explode, NOT a union of per-band branches: Spark
    does no common-subplan elimination across union arms, so a B-way
    union re-runs the whole shingle+minhash aggregation B times (and 2B
    times across a self-join) — measured 8× redundant scans in the
    round-1 plan. The exploded shape computes signatures once and lets
    the self-join reuse one exchange.
    """
    if num_hashes % bands != 0:
        raise ValueError(
            f"num_hashes ({num_hashes}) must be divisible by bands ({bands}): "
            "a remainder would silently drop trailing minhashes and weaken "
            "LSH sensitivity"
        )
    rows_per_band = num_hashes // bands
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.md5(
                F.concat_ws(
                    ",",
                    *[F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)],
                )
            ).alias("band_key"),
        )
        for b in range(bands)
    ]
    return sigs.select(
        F.col(id_col), F.explode(F.array(*band_structs)).alias("_b")
    ).select(id_col, F.col("_b.band").alias("band"), F.col("_b.band_key").alias("band_key"))


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    persist_bands: bool = True,
) -> DataFrame:
    """Candidate near-duplicate pairs (id_a < id_b) via MinHash LSH.

    ``persist_bands`` materializes the (id, band, band_key) table before
    the self-join: Spark's exchange reuse does not fire across the
    aliased join sides, so without it the whole shingle+minhash pipeline
    — the dominant cost — executes twice. The band table is narrow
    (id + 32-char key per band) and spills to disk if needed; callers
    running many corpora in one session can clearCache() between runs.
    """
    sh = shingles(df, text_col, id_col, shingle_n)
    sigs = minhash_signatures(sh, id_col, num_hashes)
    bnd = lsh_bands(sigs, id_col, num_hashes, bands)
    if persist_bands:
        from pyspark import StorageLevel

        bnd = bnd.persist(StorageLevel.MEMORY_AND_DISK)
    a = bnd.alias("a")
    b = bnd.alias("b")
    return (
        a.join(
            b,
            on=[
                F.col("a.band") == F.col("b.band"),
                F.col("a.band_key") == F.col("b.band_key"),
                F.col(f"a.{id_col}") < F.col(f"b.{id_col}"),
            ],
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b")
        )
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    df_cap: int | None = 1000,
    persist_shingles: bool = True,
) -> DataFrame:
    """Jaccard similarity over shingle sets via inverted-index join;
    emits (doc_a, doc_b, jaccard) for pairs ≥ threshold.

    ``df_cap`` (default ON) drops shingles appearing in more than that
    many documents BEFORE the self-join — one stop-phrase shingle shared
    by 1M docs would otherwise materialize ~10¹² join pairs. Jaccard is
    computed over the FILTERED shingle sets on both sides (standard
    stop-shingle removal; set sizes are post-filter), so the self-join's
    per-shingle fan-out is bounded by df_cap². Pass ``df_cap=None`` for
    unfiltered exact Jaccard (test/small-corpus only).

    ``persist_shingles``: the shingle table feeds THREE consumers (both
    self-join sides + the size agg), so the tokenize+explode re-runs ~3×
    without it. RE-MEASURED r14 on the Zipfian sf0.1 corpus: persist now
    WINS (min 5.0 s vs 6.4 s noop-sink — the r13 corpus rewrite made
    shingling ~3× costlier than the 31-word corpus this knob was
    originally measured on), so the default flipped to ON; recompute
    remains the right call only when the shingle table outsizes cluster
    storage — the classic recompute-vs-materialize knob, exposed rather
    than hardcoded. The cache entry is
    held by Spark's CacheManager for the session (it is NOT freed when
    the result is dropped); callers running many corpora in one session
    should ``spark.catalog.clearCache()`` between runs, same as the
    minhash ``persist_bands`` contract.
    """
    sh = shingles(df, text_col, id_col, shingle_n)
    if persist_shingles:
        from pyspark import StorageLevel

        sh = sh.persist(StorageLevel.MEMORY_AND_DISK)
    if df_cap is not None:
        hot = (
            sh.groupBy("shingle")
            .agg(F.count("*").alias("_df"))
            .filter(F.col("_df") > df_cap)
            .select("shingle")
        )
        # the frequent set is small by construction (each member exceeds
        # df_cap docs) — anti-join it away; AQE picks broadcast when tiny
        sh = sh.join(hot, "shingle", "left_anti")
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(
            b,
            on=[
                F.col("a.shingle") == F.col("b.shingle"),
                F.col(f"a.{id_col}") < F.col(f"b.{id_col}"),
            ],
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b")
        )
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col(id_col).alias("doc_b"), F.col("n_sh").alias("nb"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 32) -> DataFrame:
    """32-bit SimHash per doc: token hash = first 8 md5 hex digits;
    bit b of the result = sign of Σ_tokens (±1 per bit b). One explode +
    one agg; bit votes are ``bits`` agg columns (no bit-table join).

    NB (r14 optimization round, measured): the 32 vote columns share one
    ``md5_prefix_int(tok)`` subtree each, and codegen subexpression
    elimination DOES merge them (plain deterministic expressions are
    semanticEquals across separately-built copies — unlike the
    lambda-bearing HOF trees fixed elsewhere this round). Staging the
    hash behind an extra Project measured SLOWER (1.79 vs 1.32 s at
    sf0.1), so the inline form stays."""
    tok = df.select(
        F.col(id_col), F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("tok")
    )
    h = md5_prefix_int(F.col("tok"))
    votes = [
        F.sum(
            (F.shiftright(h, b).bitwiseAND(F.lit(1)) * 2 - 1).cast("bigint")
        ).alias(f"v{b}")
        for b in range(bits)
    ]
    voted = tok.groupBy(id_col).agg(*votes)
    sim = None
    for b in range(bits):
        bit = F.when(F.col(f"v{b}") > 0, F.lit(2**b).cast("bigint")).otherwise(F.lit(0))
        sim = bit if sim is None else sim + bit
    return voted.select(F.col(id_col), sim.alias("simhash"))


def keep_best_per_cluster(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    quality_col: str = "quality",
    src: str = "doc_a",
    dst: str = "doc_b",
) -> DataFrame:
    """End-to-end near-dup REMOVAL: resolve pair evidence into clusters
    (connected components) and keep exactly one representative per
    cluster — the highest-``quality_col`` doc, ties to the smallest id.
    Docs that appear in no pair are their own (size-1) cluster, so the
    output is the full deduplicated corpus, not just the contested part.

    Returns one row per KEPT doc: all ``docs`` columns plus
    ``component`` (cluster id = min member id) and ``cluster_size``.

    Scale: components are O(E)-per-round label propagation
    (operators/graph.py); the representative pick is one hash shuffle
    on ``component`` with per-cluster windows (cluster sizes are small
    by construction — they're near-dup groups, not the corpus).
    """
    from min_flink_spark.operators.graph import connected_components

    comps = connected_components(pairs, src=src, dst=dst)
    labeled = docs.join(
        comps, docs[id_col] == comps["node"], "left"
    ).select(
        *[docs[c] for c in docs.columns],
        F.coalesce(comps["component"], docs[id_col]).alias("component"),
    )
    w = Window.partitionBy("component").orderBy(
        F.col(quality_col).desc(), F.col(id_col).asc()
    )
    wc = Window.partitionBy("component")
    return (
        labeled.withColumn("_rn", F.row_number().over(w))
        .withColumn("cluster_size", F.count(F.lit(1)).over(wc))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def near_dup_index(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """Narrow, append-only NEAR-DUP INDEX rows for a corpus slice:
    ``(id, band, band_key, sig array<bigint>)`` — one row per (doc,
    band), carrying the full minhash signature for estimator reranks.
    This is the durable artifact an incremental pipeline persists so
    the corpus TEXT is never rescanned (the fuzzy analog of the exact
    fingerprint index in queries/llm.py:q_incremental_dedup)."""
    sh = shingles(df, text_col, id_col, shingle_n)
    sigs = minhash_signatures(sh, id_col, num_hashes)
    bnd = lsh_bands(sigs, id_col, num_hashes, bands)
    sig_arr = sigs.select(
        F.col(id_col),
        F.array(*[F.col(f"mh{i}") for i in range(num_hashes)]).alias("sig"),
    )
    return bnd.join(sig_arr, id_col)


def incremental_near_dup(
    new_df: DataFrame,
    index: DataFrame | None,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    threshold: float = 0.5,
) -> tuple[DataFrame, DataFrame]:
    """Fuzzy dedup of a NEW batch against an accumulated corpus without
    rescanning it: candidates come from the stored band index
    (``near_dup_index`` rows), similarity from the stored signatures
    (standard MinHash estimate: fraction of agreeing components — an
    unbiased Jaccard estimator), so the old corpus costs one narrow
    join, never a text pass. Within-batch near-dups are caught by the
    same join (new rows participate on both sides; ``id_a < id_b``
    dedupes the symmetric pair).

    Returns ``(matches, new_index_rows)``: matches =
    ``(new_id, matched_id, est_jaccard ≥ threshold)``; callers append
    ``new_index_rows`` to the stored index (exactly-once via
    ``idempotent_foreach_batch`` on a stream).

    Scale: the band join touches only colliding buckets; the index is
    (bands × 44 bytes)-narrow per doc; estimator rerank is a zip_with
    over two 16-long arrays — no shingle recomputation for old docs.

    The returned ``new_index_rows`` frame is persisted
    (MEMORY_AND_DISK) so the matches join and the caller's index append
    share one computation; the CALLER owns the persisted lifetime and
    must ``unpersist()`` it once both outputs are materialized (on a
    long-running stream, do this inside the foreach_batch body —
    otherwise cached blocks accumulate across micro-batches until the
    ContextCleaner happens to reclaim them).
    """
    new_idx = near_dup_index(new_df, text_col, id_col, num_hashes, bands, shingle_n)
    from pyspark import StorageLevel

    new_idx = new_idx.persist(StorageLevel.MEMORY_AND_DISK)
    old = index.withColumn("_new", F.lit(False)) if index is not None else None
    pool = new_idx.withColumn("_new", F.lit(True))
    if old is not None:
        pool = pool.unionByName(old)
    n = new_idx.alias("n")
    o = pool.alias("o")
    same_band = [
        F.col("n.band") == F.col("o.band"),
        F.col("n.band_key") == F.col("o.band_key"),
    ]
    # old docs pair with any new doc; new docs pair once (id_a < id_b)
    eligible = F.when(
        F.col("o._new"), F.col(f"o.{id_col}") < F.col(f"n.{id_col}")
    ).otherwise(F.col(f"o.{id_col}") != F.col(f"n.{id_col}"))
    agree = F.aggregate(
        F.zip_with(
            F.col("n.sig"),
            F.col("o.sig"),
            lambda x, y: F.when(x == y, F.lit(1)).otherwise(F.lit(0)),
        ),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    matches = (
        n.join(o, on=same_band + [eligible])
        .select(
            F.col(f"n.{id_col}").alias("new_id"),
            F.col(f"o.{id_col}").alias("matched_id"),
            (agree.cast("double") / num_hashes).alias("est_jaccard"),
        )
        .distinct()
        .filter(F.col("est_jaccard") >= threshold)
    )
    # new_idx never carried the _new tag (it was added to `pool`), so
    # return it directly — the stored-index schema is exactly
    # near_dup_index's output.
    return matches, new_idx


def simhash_hamming_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 32,
    bands: int = 4,
) -> DataFrame:
    """SimHash near-dup PAIRS via the pigeonhole band trick (the
    classic web-dedup scheme): any two signatures within Hamming
    distance d < bands must agree EXACTLY on at least one of the
    ``bands`` bit-slices, so candidates come from per-band equality
    joins — never an all-pairs Hamming scan — and the exact
    ``bit_count(xor)`` check on candidates gives precision 1.0.
    Returns (id_a, id_b, hamming) with id_a < id_b.

    Scale: each band join groups the corpus into 2^(bits/bands)
    buckets; candidate volume is Σ_bucket n², bounded the same way the
    MinHash band join is. Requires ``max_hamming < bands`` for
    guaranteed recall 1.0 (pigeonhole); looser thresholds need more
    bands."""
    if max_hamming >= bands:
        raise ValueError(
            f"pigeonhole recall guarantee needs max_hamming < bands "
            f"(got {max_hamming} >= {bands})"
        )
    sigs = simhash(df, text_col=text_col, id_col=id_col, bits=bits)
    width = bits // bands
    mask = (1 << width) - 1
    slices = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftright(F.col("simhash"), b * width)
                .bitwiseAND(F.lit(mask))
                .alias("key"),
            )
            for b in range(bands)
        ]
    )
    banded = sigs.select(
        F.col(id_col), F.col("simhash"), F.explode(slices).alias("s")
    ).select(id_col, "simhash", F.col("s.band").alias("band"), F.col("s.key").alias("key"))
    # r14 optimization: materialize the banded signatures before the
    # self-join — exchange reuse does not fire across the aliased join
    # sides, so without this the whole tokenize+simhash pipeline (the
    # dominant cost) executed TWICE. Same contract as minhash_lsh_pairs'
    # persist_bands: the table is narrow (id, sig, band, key), spills to
    # disk if needed; callers running many corpora in one session can
    # clearCache() between runs. Measured at sf0.1: 13.1 s → ~7 s.
    from pyspark import StorageLevel

    banded = banded.persist(StorageLevel.MEMORY_AND_DISK)
    a = banded.select(
        F.col(id_col).alias("id_a"), F.col("simhash").alias("sig_a"), "band", "key"
    )
    b = banded.select(
        F.col(id_col).alias("id_b"), F.col("simhash").alias("sig_b"), "band", "key"
    )
    cand = (
        a.join(b, ["band", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sig_a", "sig_b")
        .distinct()
    )
    hamming = F.bit_count(
        F.col("sig_a").bitwiseXOR(F.col("sig_b"))
    ).cast("bigint")
    return cand.select(
        "id_a", "id_b", hamming.alias("hamming")
    ).filter(F.col("hamming") <= max_hamming)
