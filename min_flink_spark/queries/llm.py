"""LLM training-data pipeline queries: dedup, similarity, text analysis,
multimodal plumbing — the north-star extension surface.

Oracle strategy: every hash is md5/sha256 (bit-identical across
engines), so even MinHash/LSH and SimHash have EXACT DuckDB oracles —
the whole signature computation is replayed in SQL. Long oracle
statements are generated programmatically to keep both sides in sync.

The documents table has no natural duplicates (500 distinct texts at
sf0.01), so dedup queries build their corpus as documents ∪ mutated
copy (doc_id+100000): exact copies for exact-dedup, tail-truncated
copies for near-dup detection. The same construction runs in the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from min_flink_spark.functions import text as T
from min_flink_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash,
)
from min_flink_spark.operators.multimodal import extract_features, media_from_text
from min_flink_spark.operators.similarity import (
    brute_force_topk,
    lsh_bucket_topk,
    near_dup_pairs,
)
from min_flink_spark.registry import query
from min_flink_spark.sources import load_table

# ---------------------------------------------------------------------------
# shared SQL fragments (kept in lockstep with functions/text.py)
# ---------------------------------------------------------------------------

SQL_TOKS = "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> length(x) > 0)"

# corpus with exact duplicate copies / near-duplicate (truncated) copies
SQL_CORPUS_EXACT = """
  SELECT doc_id, text, lang, source, n_chars FROM documents
  UNION ALL
  SELECT doc_id + 100000, text, lang, source, n_chars FROM documents
"""
SQL_CORPUS_NEAR = """
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000, substr(text, 1, greatest(length(text) - 25, 10)) FROM documents
"""

SQL_SHINGLES = f"""
  tokens AS (
    SELECT doc_id, {SQL_TOKS} AS toks FROM corpus
  ),
  shingles AS (
    SELECT DISTINCT doc_id,
           concat_ws(' ', toks[i + 1], toks[i + 2], toks[i + 3]) AS shingle
    FROM tokens, LATERAL (SELECT unnest(generate_series(0, greatest(len(toks) - 3, 0))) AS i) g
    WHERE i + 3 <= len(toks)
  )
"""


def _spark_near_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    mutated = docs.select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.substring(
            "text", 1, F.greatest(F.length("text") - 25, F.lit(10))
        ).alias("text"),
    )
    return docs.unionByName(mutated)


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------


@query(
    "text_stats",
    oracle=f"""
    SELECT doc_id,
           CAST(len({SQL_TOKS}) AS BIGINT) AS n_tokens,
           CAST(len(list_filter(string_split_regex(text, '\\s+'), x -> length(x) > 0)) AS BIGINT)
             AS n_ws_tokens,
           CAST(len({SQL_TOKS}) + length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) AS BIGINT)
             AS n_bpe_tokens,
           CASE WHEN len({SQL_TOKS}) > 0
                THEN CAST(list_sum(list_transform({SQL_TOKS}, x -> length(x))) AS DOUBLE)
                     / len({SQL_TOKS})
                ELSE 0.0 END AS avg_tok_len,
           least(len({SQL_TOKS}) / 100.0, 1.0) * 0.5 +
           least(CASE WHEN len(list_distinct({SQL_TOKS})) > 0
                      THEN CAST(len(list_intersect(list_distinct({SQL_TOKS}),
                           ['the','a','and','of','to','in','is','it'])) AS DOUBLE)
                           / len(list_distinct({SQL_TOKS}))
                      ELSE 0.0 END * 4.0, 1.0) * 0.5 AS quality
    FROM documents
    """,
)
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (3 tokenizers), length stats, quality score — all
    JVM column expressions (functions/text.py).

    r14 optimization: the token array is projected ONCE per row and
    every stat reads the column — the single-expression form rebuilt
    ``tokens(text)`` (regex split + HOF filter, fresh lambda exprIds →
    no Catalyst CSE) up to 6× per row across the five outputs. Staged
    form measured ~15% faster at sf0.1, bit-identical values (same
    expressions over the same array)."""
    t = F.col("text")
    toks = F.col("_toks")
    n = F.size(toks)
    return (
        load_table(spark, sf_dir, "documents")
        .withColumn("_toks", T.tokens(t))
        .withColumn("_d", F.array_distinct(toks))
        .select(
            "doc_id",
            n.cast("bigint").alias("n_tokens"),
            T.whitespace_token_count(t).cast("bigint").alias("n_ws_tokens"),
            (n + T.punct_char_count(t)).cast("bigint").alias("n_bpe_tokens"),
            T.avg_token_len_of(toks).alias("avg_tok_len"),
            T.quality_score_of(toks, F.col("_d")).alias("quality"),
        )
    )


def _lang_case_sql() -> str:
    score = {
        lang: (
            f"len(list_intersect(list_distinct({SQL_TOKS}), "
            f"[{', '.join(repr(w) for w in T.STOPWORDS[lang])}]))"
        )
        for lang in T.LANG_PRIORITY
    }
    clauses = []
    for lang in T.LANG_PRIORITY:
        conds = [f"{score[lang]} > 0"] + [
            f"{score[lang]} >= {score[o]}" for o in T.LANG_PRIORITY if o != lang
        ]
        clauses.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    return "CASE " + " ".join(clauses) + " ELSE 'unknown' END"


@query(
    "language_id",
    oracle=f"""
    SELECT doc_id, lang, {_lang_case_sql()} AS guessed_lang
    FROM documents
    """,
)
def q_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-hit language heuristic; oracle is the same CASE chain.

    r14 optimization: the distinct-token array and the four per-language
    scores are staged as columns, then the CASE chain reads the score
    COLUMNS — the single-expression form re-evaluated
    ``array_distinct(tokens(text))`` once per score reference (~16× per
    row: 4 langs × up to 4 references each in the chain's conditions),
    because fresh lambda exprIds defeat Catalyst CSE. Identical values
    (same chain over the same scores)."""
    df = load_table(spark, sf_dir, "documents").withColumn(
        "_d", F.array_distinct(T.tokens(F.col("text")))
    )
    for lang in T.LANG_PRIORITY:
        df = df.withColumn(f"_s_{lang}", T.stopword_hits_of(F.col("_d"), lang))
    guess = T.language_guess_of(
        {lang: F.col(f"_s_{lang}") for lang in T.LANG_PRIORITY}
    )
    return df.select("doc_id", "lang", guess.alias("guessed_lang"))


@query(
    "doc_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fp
    FROM documents
    """,
)
def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents").select(
        "doc_id", T.fingerprint(F.col("text")).alias("fp")
    )


# ---------------------------------------------------------------------------
# dedup
# ---------------------------------------------------------------------------


@query(
    "dedup_exact",
    oracle=f"""
    WITH corpus AS ({SQL_CORPUS_EXACT}),
    keyed AS (
      SELECT *, md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fp
      FROM corpus
    )
    SELECT min_by(doc_id, doc_id) AS doc_id,
           min_by(lang, doc_id) AS lang,
           min_by(source, doc_id) AS source
    FROM keyed GROUP BY fp
    """,
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on corpus ∪ exact copies: one hash-agg, min-id
    canonical — the 2×500 corpus collapses back to 500."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    copies = docs.withColumn("doc_id", F.col("doc_id") + 100000)
    corpus = docs.unionByName(copies)
    return exact_dedup(corpus, "text", "doc_id").select("doc_id", "lang", "source")


def _minhash_oracle(num_hashes: int = 16, bands: int = 4) -> str:
    rows = num_hashes // bands
    a = "CAST(('0x' || substr(md5(shingle), 1, 8)) AS BIGINT)"
    b = "CAST(('0x' || substr(md5(shingle), 9, 8)) AS BIGINT)"
    mh_cols = ",\n           ".join(
        f"min(({a} * {i + 1} + {b}) % 2147483647) AS mh{i}"
        for i in range(num_hashes)
    )
    band_selects = " UNION ALL ".join(
        "SELECT doc_id, {b} AS band, md5(concat_ws(',', {cols})) AS band_key FROM sigs".format(
            b=b, cols=", ".join(f"mh{b * rows + r}" for r in range(rows))
        )
        for b in range(bands)
    )
    return f"""
    WITH corpus AS ({SQL_CORPUS_NEAR}),
    {SQL_SHINGLES},
    sigs AS (
      SELECT doc_id,
           {mh_cols}
      FROM shingles GROUP BY doc_id
    ),
    bands AS ({band_selects})
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
    """


@query("dedup_minhash_lsh", oracle=_minhash_oracle())
def q_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(16)+LSH(4 bands) candidate pairs over corpus ∪ truncated
    copies; the ENTIRE signature pipeline is replayed in the DuckDB
    oracle (md5-based permutations are engine-independent)."""
    return minhash_lsh_pairs(
        _spark_near_corpus(spark, sf_dir), "text", "doc_id", num_hashes=16, bands=4
    )


@query(
    "ngram_jaccard_pairs",
    oracle=f"""
    WITH corpus AS ({SQL_CORPUS_NEAR}),
    {SQL_SHINGLES},
    kept AS (
      -- replay of the operator's df_cap=1000 stop-shingle filter
      SELECT s.doc_id, s.shingle FROM shingles s
      JOIN (SELECT shingle, count(*) AS c FROM shingles GROUP BY 1) d
        ON d.shingle = s.shingle
      WHERE d.c <= 1000
    ),
    sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sh FROM kept GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(count(*) AS BIGINT) AS inter
      FROM kept a JOIN kept b
        ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           CAST(inter AS DOUBLE) / (sa.n_sh + sb.n_sh - inter) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE CAST(inter AS DOUBLE) / (sa.n_sh + sb.n_sh - inter) >= 0.5
    """,
)
def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-gram Jaccard ≥ 0.5 via inverted-index join with the production
    df_cap stop-shingle filter ON (the oracle replays the same cap; at
    this corpus size no shingle exceeds it, so values equal exact
    Jaccard while the plan exercises the capped path)."""
    return ngram_jaccard_pairs(
        _spark_near_corpus(spark, sf_dir), threshold=0.5, text_col="text",
        id_col="doc_id", df_cap=1000,
    )


@query(
    "simhash_docs",
    oracle=f"""
    WITH corpus AS (SELECT doc_id, text FROM documents),
    tok AS (
      SELECT DISTINCT doc_id, t AS tok
      FROM (SELECT doc_id, unnest({SQL_TOKS}) AS t FROM corpus)
    ),
    hashed AS (
      SELECT doc_id, CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT) AS h FROM tok
    ),
    votes AS (
      SELECT doc_id, b.bit,
             sum(CASE WHEN (h >> b.bit) & 1 = 1 THEN 1 ELSE -1 END) AS v
      FROM hashed, (SELECT unnest(generate_series(0, 31)) AS bit) b
      GROUP BY doc_id, b.bit
    )
    SELECT doc_id,
           CAST(sum(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << bit) ELSE 0 END) AS BIGINT)
             AS simhash
    FROM votes GROUP BY doc_id
    """,
)
def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash per document; md5-derived token hashes keep the
    Spark and DuckDB bit votes identical."""
    return simhash(
        load_table(spark, sf_dir, "documents").select("doc_id", "text"),
        "text",
        "doc_id",
        bits=32,
    )


# ---------------------------------------------------------------------------
# embedding similarity
# ---------------------------------------------------------------------------


@query(
    "embedding_cosine_topk",
    oracle="""
    SELECT query_id, vec_id, cos_sim FROM (
      SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
             list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) AS cos_sim,
             row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) DESC,
                        c.vec_id ASC) AS rn
      FROM (SELECT * FROM embeddings WHERE vec_id < 10) q
      JOIN embeddings c ON c.vec_id != q.vec_id
    ) t WHERE rn <= 5
    """,
)
def q_embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 for 10 query vectors: broadcast queries,
    JVM-side zip_with/aggregate math, per-query row_number."""
    emb = load_table(spark, sf_dir, "embeddings")
    return brute_force_topk(
        emb, emb.filter(F.col("vec_id") < 10), k=5, id_col="vec_id", vec_col="embedding"
    )


@query(
    "embedding_near_dup_pairs",
    oracle="""
    WITH corpus AS (
      SELECT vec_id, embedding FROM embeddings
      UNION ALL
      SELECT vec_id + 100000, embedding FROM embeddings WHERE vec_id < 50
    ),
    v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM corpus
    ),
    planes AS (
      -- replay of operators/similarity._hyperplane: component j of plane
      -- p in table t = md5("{t*1000+p}|{j}")[:8] as uniform in [-0.5,0.5)
      SELECT tbl, p,
             list_transform(range(0, 64, 1), j ->
               ('0x' || substr(md5(CAST(tbl*1000 + p AS VARCHAR) || '|'
                                   || CAST(j AS VARCHAR)), 1, 8))::BIGINT
               / 4294967295.0 - 0.5) AS plane
      FROM range(0, 4, 1) t(tbl), range(0, 8, 1) pp(p)
    ),
    sigs AS (
      SELECT vec_id, tbl,
             CAST(sum(CASE WHEN list_dot_product(v.v, planes.plane) >= 0
                           THEN CAST(pow(2, p) AS BIGINT) ELSE 0 END) AS BIGINT) AS sig
      FROM v CROSS JOIN planes GROUP BY vec_id, tbl
    ),
    cand AS (
      SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
      FROM sigs a JOIN sigs b
        ON a.tbl = b.tbl AND a.sig = b.sig AND a.vec_id < b.vec_id
    )
    SELECT c.id_a, c.id_b, round(list_cosine_similarity(va.v, vb.v), 6) AS cos_sim
    FROM cand c
    JOIN v va ON va.vec_id = c.id_a
    JOIN v vb ON vb.vec_id = c.id_b
    WHERE list_cosine_similarity(va.v, vb.v) >= 0.95
    """,
)
def q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine ≥ 0.95 pairs over embeddings ∪ 50 exact copies (the base
    table's max pairwise cosine is ~0.51, so matches are exactly the
    planted duplicates).

    Runs the production LSH-bucketed path (4 tables × 8 hyperplanes —
    NOT the quadratic all-pairs baseline); the oracle replays the same
    md5-derived bucketing, so both sides compute identical candidate
    sets before the exact cosine rerank. Identical vectors collide in
    every table, so the planted duplicates are found with recall 1.
    """
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    copies = emb.filter(F.col("vec_id") < 50).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    # emitted cos_sim is 6dp-rounded on both sides: Spark's fold-based
    # cosine and DuckDB's list_cosine_similarity normalize differently
    # (norm·norm vs sqrt(norm²·norm²)) and drift by ulps around 1.0;
    # the ≥0.95 filter itself compares raw values, far from any drift
    pairs = near_dup_pairs(
        emb.unionByName(copies), threshold=0.95,
        num_planes=8, num_tables=4, dim=64,
    )
    return pairs.withColumn("cos_sim", F.round("cos_sim", 6))


@query(
    "substring_dedup",
    oracle=f"""
    WITH corpus AS ({SQL_CORPUS_NEAR}),
    tk AS (
      SELECT doc_id, {SQL_TOKS} AS toks FROM corpus
    ),
    shpos AS (
      SELECT doc_id, toks,
             unnest(range(1, CASE WHEN len(toks) >= 8
                                  THEN len(toks) - 8 + 2 ELSE 1 END)) AS pos
      FROM tk
    ),
    sh AS (
      SELECT doc_id, pos, array_to_string(toks[pos:pos+7], ' ') AS shingle
      FROM shpos
    ),
    counts AS (SELECT shingle, count(*) AS c FROM sh GROUP BY shingle),
    dup_occ AS (
      SELECT doc_id, pos FROM (
        SELECT s.doc_id, s.pos,
               row_number() OVER (PARTITION BY s.shingle
                                  ORDER BY s.doc_id, s.pos) AS rn
        FROM sh s JOIN counts c ON s.shingle = c.shingle
                                AND c.c BETWEEN 2 AND 1000
      ) WHERE rn > 1
    ),
    covered AS (
      SELECT DISTINCT doc_id, unnest(range(0, 8)) + pos AS cpos FROM dup_occ
    ),
    tpos AS (
      SELECT doc_id, toks, unnest(range(1, len(toks) + 1)) AS pos FROM tk
    ),
    toks_pos AS (SELECT doc_id, pos, toks[pos] AS tok FROM tpos),
    kept AS (
      SELECT t.doc_id, t.pos, t.tok FROM toks_pos t
      LEFT JOIN covered c ON t.doc_id = c.doc_id AND t.pos = c.cpos
      WHERE c.doc_id IS NULL
    )
    SELECT tk.doc_id AS doc_id,
           coalesce(string_agg(k.tok, ' ' ORDER BY k.pos), '') AS text,
           CAST(count(k.tok) AS BIGINT) AS n_kept,
           CAST(len(tk.toks) AS BIGINT) AS n_tokens
    FROM tk LEFT JOIN kept k ON tk.doc_id = k.doc_id
    GROUP BY tk.doc_id, len(tk.toks)
    """,
)
def q_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level exact-substring dedup (operators/dedup.dedup_substrings):
    repeated 8-token substrings keep only their first corpus occurrence;
    later occurrences are cut and the documents rebuilt around the
    holes. Run over the near-dup corpus (originals ∪ tail-truncated
    copies) so each copy's shared prefix is removed while originals
    survive intact. The oracle replays the whole pipeline — shingle
    counts, first-occurrence window, position coverage, rebuild — in
    SQL."""
    from min_flink_spark.operators.dedup import dedup_substrings

    corpus = _spark_near_corpus(spark, sf_dir)
    return dedup_substrings(corpus, k=8, df_cap=1000)


# Brute-force top-5 neighbor lists per query vector, replayed genuinely in
# DuckDB — the SQL-checkable half of the ANN recall certificates below.
# bf_ids is carried as a comma-joined STRING, not a LIST: the driver's
# canonicalizer pandas-sorts every output column and crashes on list
# cells (round-3 red rows), so driver-checked queries must emit
# scalar-only columns.
SQL_BF_TOP5 = """
    bf AS (
      SELECT query_id,
             string_agg(vec_id::VARCHAR, ',' ORDER BY vec_id) AS bf_ids
      FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
               row_number() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY list_cosine_similarity(q.embedding::DOUBLE[],
                                                 c.embedding::DOUBLE[]) DESC,
                          c.vec_id ASC) AS rn
        FROM (SELECT * FROM embeddings WHERE vec_id < 10) q
        JOIN embeddings c ON c.vec_id != q.vec_id
      ) t WHERE rn <= 5 GROUP BY query_id
    )
"""


def _ann_recall_certificate(
    emb: DataFrame, ann: DataFrame, bound: float
) -> DataFrame:
    """(query_id, bf_ids, recall_ok): per-query brute-force top-5 id
    lists (the oracle replays these exactly in SQL) plus one corpus-wide
    micro-recall flag for the approximate result. The driver's hash
    match therefore verifies BOTH that Spark's brute force agrees with
    DuckDB's and that the ANN index achieves recall ≥ bound — a real
    gate on an intentionally approximate operator. bf_ids is a
    comma-joined string (ids sorted numerically) because the driver's
    canonicalizer cannot sort list cells."""
    queries = emb.filter(F.col("vec_id") < 10)
    # r14 optimization: bf feeds TWO consumers (the recall mark join
    # and the bf_ids groupBy) and each re-ran the whole brute-force
    # scoring pass without this; the frame is k×|queries| rows (50) so
    # the cache is trivially bounded. Same session-cache contract as
    # persist_bands (clearCache() between corpora).
    from pyspark import StorageLevel

    bf = brute_force_topk(emb, queries, k=5).persist(StorageLevel.MEMORY_AND_DISK)
    marked = bf.select("query_id", "vec_id").join(
        ann.select("query_id", "vec_id").withColumn("_hit", F.lit(1)),
        ["query_id", "vec_id"],
        "left",
    )
    recall = marked.agg(
        (
            F.sum(F.coalesce("_hit", F.lit(0))).cast("double")
            / F.count(F.lit(1))
            >= F.lit(bound)
        ).alias("recall_ok")
    )
    return (
        bf.groupBy("query_id")
        .agg(
            F.concat_ws(
                ",",
                F.transform(
                    F.sort_array(F.collect_list("vec_id")),
                    lambda x: x.cast("string"),
                ),
            ).alias("bf_ids")
        )
        .crossJoin(F.broadcast(recall))
    )


@query(
    "ann_lsh_topk",
    oracle=f"""
    WITH {SQL_BF_TOP5}
    SELECT query_id, bf_ids, TRUE AS recall_ok FROM bf
    """,
)
def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate top-k, driver-checked via a recall
    certificate (see _ann_recall_certificate): 8 tables × 4 planes on
    near-uniform vectors measures micro-recall 0.52-0.82 across SFs;
    the gate sits at 0.45 so a genuine index regression reds the row
    while sub-ulp environment drift cannot (tests/test_llm_ops.py:85
    asserts the tighter aggregate bound)."""
    emb = load_table(spark, sf_dir, "embeddings")
    ann = lsh_bucket_topk(
        emb, emb.filter(F.col("vec_id") < 10), k=5, num_planes=4, num_tables=8, dim=64
    )
    return _ann_recall_certificate(emb, ann, bound=0.45)


# ---------------------------------------------------------------------------
# multimodal plumbing
# ---------------------------------------------------------------------------


@query(
    "media_byte_stats",
    oracle="""
    SELECT doc_id AS media_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           sha256(text) AS sha256
    FROM documents
    """,
)
def q_media_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column pipeline: text→binary media table → Arrow-batched
    mapInPandas feature kernel (decode stubbed, plumbing real); byte
    length + sha256 oracle-checked."""
    media = media_from_text(load_table(spark, sf_dir, "documents"))
    return extract_features(media, fake=True).select("media_id", "n_bytes", "sha256")


@query(
    "ann_ivf_topk",
    oracle=f"""
    WITH {SQL_BF_TOP5}
    SELECT query_id, bf_ids, TRUE AS recall_ok FROM bf
    """,
)
def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-k (deterministic k-means-lite coarse
    quantizer, n_probe cells per query) — the big-corpus ANN path,
    driver-checked via the recall certificate (4/16 cells probed
    measures micro-recall 0.44-0.68 across SFs; the gate sits at 0.35
    so a genuine quantizer regression reds the row while k-means avg
    summation-order drift under a different partitioning cannot;
    tests/test_llm_ops.py:111 asserts the tighter aggregate bound)."""
    from min_flink_spark.operators.similarity import ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    ann = ivf_topk(
        emb, emb.filter(F.col("vec_id") < 10), k=5, num_centroids=16, n_probe=4
    )
    return _ann_recall_certificate(emb, ann, bound=0.35)


@query(
    "ann_pq_topk",
    oracle=f"""
    WITH {SQL_BF_TOP5}
    SELECT query_id, bf_ids, TRUE AS recall_ok FROM bf
    """,
)
def q_ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (operators/similarity.pq_topk): 8
    subspaces × 32 codes, md5-seeded deterministic k-means, ADC
    shortlist (20×k) + exact-cosine rerank — the memory-bound ANN path
    (codes are m small ints per vector; the raw vectors are touched
    only for the rerank joins). Driver-checked via the recall
    certificate: measured micro-recall 0.78-0.94 across SFs on
    near-uniform vectors (PQ's hardest case — no subspace structure to
    exploit); the gate sits at 0.55 so a genuine codebook/ADC
    regression reds the row while centroid low-order summation drift
    under a different partitioning cannot (tests/test_llm_ops.py
    asserts the tighter aggregate bound)."""
    from min_flink_spark.operators.similarity import pq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    ann = pq_topk(
        emb,
        emb.filter(F.col("vec_id") < 10),
        k=5,
        n_codes=32,
        shortlist_mult=20,
        kmeans_iters=3,
    )
    return _ann_recall_certificate(emb, ann, bound=0.55)


@query(
    "levenshtein_rerank",
    oracle=f"""
    WITH corpus AS ({SQL_CORPUS_NEAR}),
    {SQL_SHINGLES},
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM shingles GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
      FROM shingles a JOIN shingles b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT doc_a, doc_b FROM inter
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b
      WHERE CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) >= 0.5
    )
    SELECT p.doc_a, p.doc_b,
           CAST(levenshtein(substr(ca.text, 1, 80), substr(cb.text, 1, 80)) AS BIGINT)
             AS edit_dist
    FROM pairs p
    JOIN corpus ca ON ca.doc_id = p.doc_a
    JOIN corpus cb ON cb.doc_id = p.doc_b
    """,
)
def q_levenshtein_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate-then-rerank: cheap shingle-Jaccard candidates, exact
    edit distance only on the candidate pairs (Levenshtein is O(len²) —
    NEVER run it all-pairs; prefix-bounded to keep the cost fixed)."""
    from min_flink_spark.operators.dedup import ngram_jaccard_pairs

    corpus = _spark_near_corpus(spark, sf_dir)
    pairs = ngram_jaccard_pairs(corpus, threshold=0.5).select("doc_a", "doc_b")
    ta = corpus.select(
        F.col("doc_id").alias("doc_a"), F.substring("text", 1, 80).alias("_ta")
    )
    tb = corpus.select(
        F.col("doc_id").alias("doc_b"), F.substring("text", 1, 80).alias("_tb")
    )
    return (
        pairs.join(ta, "doc_a")
        .join(tb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.levenshtein("_ta", "_tb").cast("bigint").alias("edit_dist"),
        )
    )


@query(
    "embedding_normalize_project",
    oracle="""
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings WHERE vec_id < 300
    ),
    n AS (
      SELECT vec_id, v,
             sqrt(list_reduce(list_transform(v, x -> x * x), (a, b) -> a + b)) AS nrm
      FROM v
    ),
    planes AS (
      -- replay of operators/similarity._hyperplane family 500000+k
      SELECT k,
             list_transform(range(0, 64, 1), j ->
               ('0x' || substr(md5(CAST(500000 + k AS VARCHAR) || '|'
                                   || CAST(j AS VARCHAR)), 1, 8))::BIGINT
               / 4294967295.0 - 0.5) AS plane
      FROM range(0, 4, 1) t(k)
    ),
    proj AS (
      SELECT n.vec_id, n.v, n.nrm, p.k,
             list_reduce(list_transform(range(1, 65, 1), i -> n.v[i] * p.plane[i]),
                         (a, b) -> a + b) AS d
      FROM n CROSS JOIN planes p
    )
    SELECT vec_id,
           v[1] / nrm AS n0, v[2] / nrm AS n1, v[3] / nrm AS n2,
           max(CASE WHEN k = 0 THEN d END) AS p0,
           max(CASE WHEN k = 1 THEN d END) AS p1,
           max(CASE WHEN k = 2 THEN d END) AS p2,
           max(CASE WHEN k = 3 THEN d END) AS p3
    FROM proj
    GROUP BY vec_id, n0, n1, n2
    """,
)
def q_embedding_normalize_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding utilities (operators/similarity.py): L2 normalization
    (first 3 components emitted) + deterministic 64→4 random projection
    (Johnson–Lindenstrauss front-end for ANN). Every value is a
    sequential fold / single division on identical inputs — bit-exact
    across engines, no rounding needed."""
    from min_flink_spark.operators.similarity import l2_normalize, project_embeddings

    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 300)
    out = project_embeddings(emb, out_dim=4, dim=64)
    out = l2_normalize(out, "embedding", out_col="_nv")
    return out.select(
        "vec_id",
        F.col("_nv")[0].alias("n0"),
        F.col("_nv")[1].alias("n1"),
        F.col("_nv")[2].alias("n2"),
        "p0", "p1", "p2", "p3",
    )


@query(
    "media_frame_sampling",
    oracle="""
    WITH media AS (
      SELECT doc_id AS media_id, 1000 * (doc_id % 120 + 1) AS duration_ms
      FROM documents
    )
    SELECT media_id, CAST(i AS INT) AS frame_idx,
           (i * duration_ms) // 8 AS frame_ts_ms
    FROM media, LATERAL (SELECT unnest(generate_series(0, 7)) AS i) g
    """,
)
def q_media_frame_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plumbing (operators/multimodal.py:
    sample_frames): 8 evenly-spaced frame timestamps per clip with
    synthetic durations (doc_id-derived — the container has no real
    media). Exact integer arithmetic, fully SQL-replayable; the ffmpeg
    frame-grab kernel is the documented stub point."""
    from min_flink_spark.operators.multimodal import sample_frames

    media = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id"),
        F.struct(
            F.lit("video/fake").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            (1000 * (F.col("doc_id") % 120 + 1)).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )
    return sample_frames(media, n_frames=8)


SQL_FP = "md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')))"


@query(
    "incremental_dedup",
    oracle=f"""
    WITH old AS (
      SELECT doc_id, text FROM documents WHERE doc_id < 250
    ),
    injected AS (
      SELECT doc_id + 200000 AS doc_id, text FROM documents
      WHERE doc_id < 250 AND doc_id % 5 = 0
    ),
    batch AS (
      SELECT doc_id, text FROM documents WHERE doc_id >= 250
      UNION ALL SELECT doc_id, text FROM injected
    ),
    idx AS (SELECT DISTINCT {SQL_FP} AS fp FROM old),
    fresh AS (
      SELECT b.doc_id, {SQL_FP} AS fp FROM batch b
      WHERE NOT EXISTS (SELECT 1 FROM idx WHERE idx.fp = {SQL_FP})
    )
    SELECT CAST(min(doc_id) AS BIGINT) AS doc_id, fp
    FROM fresh GROUP BY fp
    """,
)
def q_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingestion dedup: a NEW batch (which contains replays
    of already-ingested docs) is deduped against the existing corpus's
    fingerprint index WITHOUT rescanning the old text — an anti-join on
    the fingerprint column — then exact-deduped within itself (min-id
    canonical). This is how a running 100 TB pipeline admits daily
    deltas: the index is a narrow (fp) table, the old corpus never
    moves, and both steps are single hash shuffles on fp."""
    from min_flink_spark.functions.text import fingerprint

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    old = docs.filter(F.col("doc_id") < 250)
    injected = docs.filter((F.col("doc_id") < 250) & (F.col("doc_id") % 5 == 0)).select(
        (F.col("doc_id") + 200000).alias("doc_id"), "text"
    )
    batch = docs.filter(F.col("doc_id") >= 250).unionByName(injected)
    idx = old.select(fingerprint(F.col("text")).alias("fp")).distinct()
    fresh = batch.withColumn("fp", fingerprint(F.col("text"))).join(
        idx, "fp", "left_anti"
    )
    return fresh.groupBy("fp").agg(F.min("doc_id").alias("doc_id")).select("doc_id", "fp")


@query(
    "conversation_assembly",
    oracle="""
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           string_agg(event_type, '>' ORDER BY ts, event_id) AS convo,
           min(ts) AS started_at,
           max(ts) AS ended_at
    FROM events GROUP BY user_id
    """,
)
def q_conversation_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chat/fine-tune data assembly: collapse a user's event stream into
    ONE ordered conversation record (the per-thread "messages" array of
    an SFT corpus).  Spark's ``collect_list`` has no intra-group order
    guarantee, so the canonical pattern is collect structs keyed by
    (ts, event_id) and ``array_sort`` them — struct comparison is
    lexicographic by field position, and event_id is unique, so the
    order is total and deterministic under any partitioning.

    Scale: one shuffle on user_id; per-group state is one conversation,
    which is bounded by definition of the use case (a thread must fit
    in a training example).  The sorted array never crosses executors
    un-aggregated."""
    ev = load_table(spark, sf_dir, "events")
    ordered = F.array_sort(F.collect_list(F.struct("ts", "event_id", "event_type")))
    return ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.array_join(
            F.transform(ordered, lambda x: x["event_type"]), ">"
        ).alias("convo"),
        F.min("ts").alias("started_at"),
        F.max("ts").alias("ended_at"),
    )


@query(
    "semantic_dedup_survivors",
    oracle="""
    WITH RECURSIVE corpus AS (
      SELECT vec_id, embedding FROM embeddings
      UNION ALL
      SELECT vec_id + 100000, embedding FROM embeddings WHERE vec_id < 50
    ),
    v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM corpus
    ),
    planes AS (
      SELECT tbl, p,
             list_transform(range(0, 64, 1), j ->
               ('0x' || substr(md5(CAST(tbl*1000 + p AS VARCHAR) || '|'
                                   || CAST(j AS VARCHAR)), 1, 8))::BIGINT
               / 4294967295.0 - 0.5) AS plane
      FROM range(0, 4, 1) t(tbl), range(0, 8, 1) pp(p)
    ),
    sigs AS (
      SELECT vec_id, tbl,
             CAST(sum(CASE WHEN list_dot_product(v.v, planes.plane) >= 0
                           THEN CAST(pow(2, p) AS BIGINT) ELSE 0 END) AS BIGINT) AS sig
      FROM v CROSS JOIN planes GROUP BY vec_id, tbl
    ),
    cand AS (
      SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
      FROM sigs a JOIN sigs b
        ON a.tbl = b.tbl AND a.sig = b.sig AND a.vec_id < b.vec_id
    ),
    pairs AS (
      SELECT c.id_a, c.id_b FROM cand c
      JOIN v va ON va.vec_id = c.id_a
      JOIN v vb ON vb.vec_id = c.id_b
      WHERE list_cosine_similarity(va.v, vb.v) >= 0.95
    ),
    edges AS (
      SELECT id_a AS u, id_b AS w FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ),
    walk (node, component) AS (
      SELECT u, u FROM edges
      UNION
      SELECT e.u, wk.component FROM edges e JOIN walk wk ON e.w = wk.node
      WHERE wk.component < e.u OR wk.component < e.w
    ),
    comp AS (SELECT node, min(component) AS c FROM walk GROUP BY node)
    SELECT CAST(corpus.vec_id AS BIGINT) AS vec_id
    FROM corpus LEFT JOIN comp ON corpus.vec_id = comp.node
    WHERE comp.node IS NULL OR comp.c = corpus.vec_id
    """,
)
def q_semantic_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEMANTIC dedup end-to-end — the three LLM-pipeline stages
    composed: LSH-bucketed embedding near-dup pairs (cosine ≥ 0.95,
    never all-pairs) → pointer-jumping connected components → keep the
    min-id representative per cluster (singletons pass through). On
    the planted corpus (embeddings ∪ 50 exact copies) the survivors
    are exactly the original vec_ids. The oracle replays every stage:
    md5 hyperplane bucketing, exact cosine rerank, recursive-CTE
    closure, min-per-component selection."""
    from min_flink_spark.operators.graph import connected_components
    from min_flink_spark.operators.similarity import near_dup_pairs

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    copies = emb.filter(F.col("vec_id") < 50).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    corpus = emb.unionByName(copies)
    pairs = near_dup_pairs(
        corpus, threshold=0.95, num_planes=8, num_tables=4, dim=64
    ).select(F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b"))
    comp = connected_components(pairs)
    removed = comp.filter(F.col("component") != F.col("node")).select("node")
    return corpus.join(
        removed, corpus.vec_id == removed.node, "left_anti"
    ).select("vec_id")


def _incremental_near_dup_oracle(num_hashes: int = 16, bands: int = 4) -> str:
    rows = num_hashes // bands
    a = "CAST(('0x' || substr(md5(shingle), 1, 8)) AS BIGINT)"
    b = "CAST(('0x' || substr(md5(shingle), 9, 8)) AS BIGINT)"
    mh_cols = ",\n           ".join(
        f"min(({a} * {i + 1} + {b}) % 2147483647) AS mh{i}"
        for i in range(num_hashes)
    )
    band_selects = " UNION ALL ".join(
        "SELECT doc_id, {b} AS band, md5(concat_ws(',', {cols})) AS band_key FROM sigs".format(
            b=b_, cols=", ".join(f"mh{b_ * rows + r}" for r in range(rows))
        )
        for b_ in range(bands)
    )
    agree = " + ".join(
        f"(CASE WHEN sa.mh{i} = sb.mh{i} THEN 1 ELSE 0 END)"
        for i in range(num_hashes)
    )
    return f"""
    WITH corpus AS ({SQL_CORPUS_NEAR}),
    {SQL_SHINGLES},
    sigs AS (
      SELECT doc_id,
           {mh_cols}
      FROM shingles GROUP BY doc_id
    ),
    bands AS ({band_selects}),
    cand AS (
      SELECT DISTINCT n.doc_id AS new_id, o.doc_id AS matched_id
      FROM bands n JOIN bands o
        ON n.band = o.band AND n.band_key = o.band_key
      WHERE n.doc_id >= 100000
        AND ((o.doc_id < 100000) OR (o.doc_id >= 100000 AND o.doc_id < n.doc_id))
    )
    SELECT c.new_id, c.matched_id,
           CAST({agree} AS DOUBLE) / {num_hashes} AS est_jaccard
    FROM cand c
    JOIN sigs sa ON sa.doc_id = c.new_id
    JOIN sigs sb ON sb.doc_id = c.matched_id
    WHERE CAST({agree} AS DOUBLE) / {num_hashes} >= 0.5
    """


@query("incremental_near_dup_matches", oracle=_incremental_near_dup_oracle())
def q_incremental_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy INCREMENTAL dedup: a new batch (truncated copies) checked
    against the accumulated corpus's NEAR-DUP INDEX
    (operators/dedup.py:near_dup_index — narrow (id, band, band_key,
    sig) rows) with the MinHash agreement estimator as the rerank. The
    corpus text is never rescanned: the old side costs one band join
    against stored rows. The oracle replays signatures, banding,
    eligibility, and the estimator exactly."""
    from min_flink_spark.operators.dedup import incremental_near_dup, near_dup_index

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    index = near_dup_index(docs)
    batch = docs.select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.substring(
            "text", 1, F.greatest(F.length("text") - 25, F.lit(10))
        ).alias("text"),
    )
    matches, _new_rows = incremental_near_dup(batch, index, threshold=0.5)
    return matches


@query(
    "embedding_quantize_int8",
    oracle="""
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    s AS (
      SELECT vec_id, v,
             list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
      FROM v
    ),
    q AS (
      SELECT vec_id, scale,
             CASE WHEN scale > 0
                  THEN list_transform(v, x -> CAST(round(x / scale) AS BIGINT))
                  ELSE list_transform(v, x -> CAST(0 AS BIGINT)) END AS qv
      FROM s
    )
    SELECT CAST(vec_id AS BIGINT) AS vec_id,
           CAST(list_sum(qv) AS BIGINT) AS q_sum,
           CAST(list_min(qv) AS BIGINT) AS q_min,
           CAST(list_max(qv) AS BIGINT) AS q_max,
           CAST(round(scale * 1000000000) AS BIGINT) AS scale_e9
    FROM q
    """,
)
def q_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 embedding quantization under the gate
    (operators/similarity.py:quantize_int8 — 4× smaller embedding
    storage at bounded scale/2 per-component error; measured cosine
    (original, dequantized) ≥ 0.99995 on the test corpus). The output
    certificate is exact integers: component sum / min / max of the
    int8 vector plus the nano-scaled quantization scale — any
    quantizer regression flips a value. Both engines compute scale =
    max|x|/127 (order-independent max, one division) and round
    half-away-from-zero, so the certificate is bit-stable."""
    from min_flink_spark.operators.similarity import quantize_int8

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    q = quantize_int8(emb)
    qv = F.col("qvec")
    return q.select(
        "vec_id",
        F.aggregate(
            qv, F.lit(0).cast("bigint"), lambda acc, x: acc + x.cast("bigint")
        ).alias("q_sum"),
        F.array_min(qv).cast("bigint").alias("q_min"),
        F.array_max(qv).cast("bigint").alias("q_max"),
        F.round(F.col("qscale") * 1000000000).cast("bigint").alias("scale_e9"),
    )


@query(
    "coarse_to_fine_topk",
    oracle="""
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    q AS (SELECT vec_id AS query_id, v AS qv, v[1:48] AS qp
          FROM v WHERE vec_id < 10),
    c AS (SELECT vec_id, v AS cv, v[1:48] AS cp FROM v),
    coarse AS (
      SELECT q.query_id, c.vec_id, q.qv, c.cv,
             row_number() OVER (
               PARTITION BY q.query_id
               ORDER BY list_cosine_similarity(q.qp, c.cp) DESC, c.vec_id ASC
             ) AS crn
      FROM q JOIN c ON c.vec_id != q.query_id
    ),
    fine AS (
      SELECT query_id, vec_id,
             round(list_cosine_similarity(qv, cv), 6) AS cos_sim,
             row_number() OVER (
               PARTITION BY query_id
               ORDER BY list_cosine_similarity(qv, cv) DESC, vec_id ASC
             ) AS rn
      FROM coarse WHERE crn <= 50
    )
    SELECT query_id, vec_id, cos_sim FROM fine WHERE rn <= 5
    """,
)
def q_coarse_to_fine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage (Matryoshka-style prefix) search under the gate:
    coarse cosine on the first 48 of 64 dims keeps 50 candidates per
    query, exact cosine reranks to top-5 (measured recall@5 = 0.98 vs
    brute force on this corpus — random embeddings are the worst case;
    front-loaded embeddings recall higher at smaller prefixes). The
    oracle replays BOTH stages, so candidate selection and rerank are
    hash-checked, not just the final list. Same 6dp-cosine contract as
    embedding_cosine_topk."""
    from min_flink_spark.operators.similarity import coarse_to_fine_topk

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    out = coarse_to_fine_topk(
        emb, emb.filter(F.col("vec_id") < 10), k=5, coarse_k=50, coarse_dims=48
    )
    return out.withColumn("cos_sim", F.round("cos_sim", 6))


@query(
    "model_quality_scores",
    oracle="""
    WITH scored AS (
      SELECT doc_id, source,
             CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT)
               / 4294967296.0 AS model_score
      FROM documents
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(CASE WHEN model_score >= 0.5 THEN 1 END) AS BIGINT)
             AS n_keep,
           CAST(round(sum(round(model_score * 1000000)) ) AS BIGINT)
             AS score_sum_e6
    FROM scored GROUP BY source
    """,
)
def q_model_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model scoring AT SCALE under the gate: the inference plumbing
    (operators/inference.py — mapInPandas iterator form, model loaded
    once per task, Arrow-batched scoring) runs end-to-end with the
    deterministic stand-in model; per-source keep rates and micro-unit
    score sums are hash-checked against the oracle's replay. Swap
    fake_quality_scorer for a real classifier factory and the plan,
    schema, and batching are identical."""
    from min_flink_spark.operators.inference import (
        fake_quality_scorer,
        score_with_model,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    scored = score_with_model(docs, fake_quality_scorer("text"))
    return scored.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count(F.when(F.col("model_score") >= 0.5, 1)).alias("n_keep"),
        F.round(F.sum(F.round(F.col("model_score") * 1000000)))
        .cast("bigint")
        .alias("score_sum_e6"),
    )


@query(
    "contrastive_negative_pairs",
    oracle="""
    WITH n AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM embeddings),
    slots AS (
      SELECT e.vec_id AS anchor_id, CAST(s.slot AS BIGINT) AS slot, n.nn
      FROM embeddings e
      CROSS JOIN n
      CROSS JOIN (SELECT unnest(generate_series(1, 4)) AS slot) s
    )
    SELECT anchor_id, slot,
           (anchor_id + 1 +
            (CAST(('0x' || substr(md5('neg:' || CAST(slot AS VARCHAR)), 1, 8))
                  AS BIGINT) % (nn - 1))) % nn AS neg_id
    FROM slots
    """,
)
def q_contrastive_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic contrastive negative sampling
    (operators/similarity.negative_pair_sample): k=4 md5-derived
    partners per anchor over the dense embedding id space — how an
    embedding-model training pipeline draws reproducible negatives
    without a cartesian, an RNG, or a shuffle wider than
    explode(k)+equi-join. The oracle replays the offset arithmetic
    verbatim; every column is an integer, so the hash is exact at any
    parallelism."""
    from min_flink_spark.operators.similarity import negative_pair_sample

    emb = load_table(spark, sf_dir, "embeddings")
    return negative_pair_sample(emb, k=4)


def _bpe_apply_sql(inner: str, b: str) -> str:
    """SQL twin of one ``_merge_pair`` application (double-space rule)
    with the pair pulled from the 1-row CTE ``b``."""
    return (
        f"replace(trim(replace(' ' || replace({inner}, ' ', '  ') || ' ', "
        f"' ' || (SELECT replace(pair, ' ', '  ') FROM {b}) || ' ', "
        f"' ' || (SELECT replace(pair, ' ', '') FROM {b}) || ' ')), '  ', ' ')"
    )


def _bpe_round_sql(r: int) -> str:
    return f"""
p{r} AS (
  SELECT pair, CAST(sum(cnt) AS BIGINT) AS total FROM (
    SELECT unnest(list_transform(range(1, len(string_split(sym,' '))),
                  i -> string_split(sym,' ')[i] || ' ' ||
                       string_split(sym,' ')[i+1])) AS pair,
           cnt
    FROM w{r}
  ) GROUP BY pair
),
b{r} AS (SELECT pair, total, {r} AS rank FROM p{r}
         ORDER BY total DESC, pair ASC LIMIT 1),
w{r + 1} AS (
  -- double-space separators so the replace chains adjacent
  -- occurrences: exact forward-scan BPE (operators/pipeline._merge_pair)
  SELECT replace(trim(replace(' ' || replace(sym, ' ', '  ') || ' ',
                              ' ' || replace(b.pair, ' ', '  ') || ' ',
                              ' ' || replace(b.pair, ' ', '') || ' ')),
                 '  ', ' ') AS sym, cnt
  FROM w{r} CROSS JOIN b{r} b
)"""


@query(
    "bpe_merge_training",
    oracle=f"""
    WITH tok AS (
      SELECT unnest({SQL_TOKS}) AS word FROM documents
    ),
    w1 AS (
      SELECT array_to_string(string_split(word, ''), ' ') AS sym,
             CAST(count(*) AS BIGINT) AS cnt
      FROM tok GROUP BY word
    ),
    {_bpe_round_sql(1)},
    {_bpe_round_sql(2)},
    {_bpe_round_sql(3)}
    SELECT CAST(rank AS BIGINT) AS merge_rank, pair, total FROM (
      SELECT * FROM b1 UNION ALL SELECT * FROM b2 UNION ALL SELECT * FROM b3
    ) ORDER BY merge_rank
    """,
)
def q_bpe_merge_training(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE tokenizer training, 3 greedy merge rounds
    (operators/pipeline.bpe_train_merges): one corpus pass reduces to
    the word-TYPE table, then every round is an explode + weighted
    hash-agg + 1-row top-1 broadcast-back on vocabulary-sized data.
    The oracle replays all three rounds in SQL — pair counting, the
    (count, pair) tie rule, and the forward-scan non-overlapping merge
    application are bit-identical, so a training divergence in ANY
    round flips the hash."""
    from min_flink_spark.functions.text import tokens
    from min_flink_spark.operators.pipeline import bpe_train_merges

    docs = load_table(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode(tokens(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return bpe_train_merges(words, rounds=3)


@query(
    "bpe_tokenized_lengths",
    oracle=f"""
    WITH tok AS (
      SELECT unnest({SQL_TOKS}) AS word FROM documents
    ),
    w1 AS (
      SELECT array_to_string(string_split(word, ''), ' ') AS sym,
             CAST(count(*) AS BIGINT) AS cnt
      FROM tok GROUP BY word
    ),
    {_bpe_round_sql(1)},
    {_bpe_round_sql(2)},
    {_bpe_round_sql(3)},
    docs_tok AS (
      SELECT doc_id, unnest({SQL_TOKS}) AS word FROM documents
    ),
    applied AS (
      SELECT doc_id,
        len(string_split({_bpe_apply_sql(_bpe_apply_sql(_bpe_apply_sql(
            "array_to_string(string_split(word, ''), ' ')", "b1"), "b2"), "b3")},
            ' ')) AS n
      FROM docs_tok
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(n) AS BIGINT) AS n_bpe_syms
    FROM applied GROUP BY doc_id
    """,
)
def q_bpe_tokenized_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The APPLY side of the trained BPE model: the 3 learned merges
    tokenize every document and per-doc BPE-symbol counts come out —
    the sequence-length accounting step every packing/budgeting
    pipeline runs. Plan: merges apply to the word-TYPE table (one
    projection chaining the ordered replaces via aggregate over the
    broadcast model), then doc words join the typed lengths on the
    word key — the model is O(rounds) and the expensive string work
    happens once per TYPE, not per token occurrence."""
    from min_flink_spark.functions.text import tokens
    from min_flink_spark.operators.pipeline import (
        bpe_apply_merges,
        bpe_train_merges,
    )

    from min_flink_spark.core.ckpt import add_backing, carry_backing

    docs = load_table(spark, sf_dir, "documents")
    doc_words = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("word")
    )
    # r13: the type table feeds BOTH the trainer and the apply leg —
    # checkpoint it once so lineage recomputation can't multiply the
    # corpus tokenize (the pre-fix executed plan held NINE text scans;
    # now: one for this checkpoint + one for the per-token doc_words
    # leg, which genuinely needs doc_id). Backing rides the result.
    types = (
        doc_words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=True)
    )
    merges = bpe_train_merges(types, rounds=3)
    applied = bpe_apply_merges(types.select("word"), merges)
    typed = applied.select(
        "word", F.size(F.split(F.col("sym"), " ")).alias("n")
    )
    result = (
        doc_words.join(typed, "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n").alias("n_bpe_syms"),
        )
    )
    result = carry_backing(result, applied)
    # the types checkpoint rides alongside the carried merge rounds
    # (public helper, not a private-list append — ADVICE r13)
    return add_backing(result, types)


@query(
    "split_leakage_report",
    oracle=f"""
    WITH pairs AS (
      SELECT * FROM ({_minhash_oracle()}) t
    ),
    corpus2 AS (SELECT doc_id FROM ({SQL_CORPUS_NEAR})),
    split AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5('sp:' || CAST(doc_id AS VARCHAR)), 1, 8))
                  AS BIGINT) % 10 < 8 AS is_train
      FROM corpus2
    )
    SELECT CAST(count(*) AS BIGINT) AS n_candidate_pairs,
           CAST(count(*) FILTER (WHERE sa.is_train != sb.is_train) AS BIGINT)
             AS n_cross_split_pairs
    FROM pairs
    JOIN split sa ON sa.doc_id = pairs.doc_a
    JOIN split sb ON sb.doc_id = pairs.doc_b
    """,
)
def q_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test LEAKAGE audit: after a deterministic 80/20 doc split,
    count MinHash-LSH near-dup candidate pairs that CROSS the split
    boundary — each one is an eval answer sitting in the training set.
    Run over the near-dup corpus (originals ∪ truncated copies) so
    cross-split leaks genuinely exist to be caught. Composition of the
    banded candidate generator (never all-pairs) with the md5 split;
    two narrow joins on the doc key; the oracle replays signatures,
    banding, split, and the boundary test."""
    from min_flink_spark.functions.hashing import md5_prefix_int
    from min_flink_spark.operators.dedup import minhash_lsh_pairs

    corpus = _spark_near_corpus(spark, sf_dir)
    pairs = minhash_lsh_pairs(corpus, "text", "doc_id").select("doc_a", "doc_b")
    split = corpus.select(
        "doc_id",
        (
            F.pmod(
                md5_prefix_int(
                    F.concat(F.lit("sp:"), F.col("doc_id").cast("string"))
                ),
                F.lit(10),
            )
            < 8
        ).alias("is_train"),
    )
    sa = split.select(F.col("doc_id").alias("doc_a"), F.col("is_train").alias("ta"))
    sb = split.select(F.col("doc_id").alias("doc_b"), F.col("is_train").alias("tb"))
    joined = pairs.join(sa, "doc_a").join(sb, "doc_b")
    return joined.agg(
        F.count(F.lit(1)).alias("n_candidate_pairs"),
        F.sum(
            F.when(F.col("ta") != F.col("tb"), 1).otherwise(0)
        ).cast("bigint").alias("n_cross_split_pairs"),
    )


@query(
    "image_header_dims",
    oracle="""
    SELECT doc_id AS media_id,
           CASE WHEN doc_id % 2 = 0 THEN 'image/png'
                ELSE 'image/gif' END AS mime,
           CAST(16 + doc_id % 1000 AS INTEGER) AS width,
           CAST(16 + (doc_id * 7) % 800 AS INTEGER) AS height
    FROM documents
    """,
)
def q_image_header_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REAL image-header parser under the driver gate: PNG and GIF
    headers are SYNTHESIZED in-plan from deterministic per-doc
    dimensions (binary construction via hex/unhex codegen — big-endian
    u32 IHDR fields for PNG, little-endian u16s for GIF), then
    operators/multimodal.image_dimensions parses them back on the
    Arrow batch path. The oracle states the generator's ground truth,
    so mime detection, endianness, and field offsets are all
    value-checked — if the parser misread a single byte the dims
    wouldn't round-trip. (Pixel DECODE stays honestly stubbed; header
    parsing is the codec-free part and it is real.)"""
    from min_flink_spark.operators.multimodal import image_dimensions

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    w = (16 + F.col("doc_id") % 1000).cast("int")
    h = (16 + (F.col("doc_id") * 7) % 800).cast("int")
    hex_u32 = lambda c: F.lpad(F.hex(c), 8, "0")  # noqa: E731
    le_u16 = lambda c: F.concat(  # little-endian u16 hex  # noqa: E731
        F.substring(F.lpad(F.hex(c), 4, "0"), 3, 2),
        F.substring(F.lpad(F.hex(c), 4, "0"), 1, 2),
    )
    png = F.unhex(
        F.concat(
            F.lit("89504E470D0A1A0A"),  # signature
            F.lit("0000000D49484452"),  # IHDR length + type
            hex_u32(w),
            hex_u32(h),
        )
    )
    gif = F.unhex(
        F.concat(F.lit("474946383961"), le_u16(w), le_u16(h))  # 'GIF89a'
    )
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 2 == 0, png).otherwise(gif).alias("payload"),
    )
    return image_dimensions(media)


@query(
    "audio_wav_stats",
    oracle="""
    SELECT doc_id AS media_id,
           CASE WHEN doc_id % 97 = 0 THEN -1
                ELSE CAST(sr AS INTEGER) END AS sample_rate,
           CASE WHEN doc_id % 97 = 0 THEN -1
                ELSE CAST(1 + doc_id % 2 AS INTEGER) END AS channels,
           CASE WHEN doc_id % 97 = 0 THEN -1
                ELSE CAST(CASE WHEN doc_id % 3 = 0 THEN 8 ELSE 16 END
                          AS INTEGER) END AS bits,
           CASE WHEN doc_id % 97 = 0 THEN -1
                ELSE CAST((100 + doc_id % 10000) * 1000 // sr AS BIGINT)
                END AS duration_ms
    FROM (
      SELECT doc_id,
             CASE doc_id % 5 WHEN 0 THEN 8000 WHEN 1 THEN 16000
                             WHEN 2 THEN 22050 WHEN 3 THEN 44100
                             ELSE 48000 END AS sr
      FROM documents
    )
    """,
)
def q_audio_wav_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REAL audio-header parser under the driver gate — the audio
    counterpart of ``image_header_dims``: RIFF/WAVE headers are
    SYNTHESIZED in-plan from deterministic per-doc PCM parameters
    (hex/unhex codegen — little-endian u16/u32 fields, an extra LIST
    chunk ahead of ``fmt `` so the chunk WALK is load-bearing, and a
    ``data`` size declared without its payload, the object-storage
    header-fetch shape), then operators/multimodal.audio_stats parses
    them back on the Arrow batch path. Every 97th doc carries a
    truncated non-WAVE payload and must quarantine. The oracle states
    the generator's ground truth, so endianness, chunk offsets,
    word-alignment stepping, and the frames→duration integer math are
    all value-checked. The OPERATOR emits true nulls for quarantined
    rows; the gate row coalesces them to -1 on both sides because the
    driver materializes a nullable-int oracle column as float64
    (fetchdf) and would dtype-mismatch the hash. (Sample DECODE stays
    honestly stubbed; header parsing is the codec-free part and it is
    real.)"""
    from min_flink_spark.operators.multimodal import audio_stats

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    d = F.col("doc_id")
    sr = (
        F.when(d % 5 == 0, 8000)
        .when(d % 5 == 1, 16000)
        .when(d % 5 == 2, 22050)
        .when(d % 5 == 3, 44100)
        .otherwise(48000)
        .cast("bigint")
    )
    ch = (1 + d % 2).cast("bigint")
    bits = F.when(d % 3 == 0, 8).otherwise(16).cast("bigint")
    block_align = ((ch * bits) / 8).cast("bigint")
    n_frames = (100 + d % 10000).cast("bigint")
    data_size = n_frames * block_align
    byte_rate = sr * block_align

    def le(c, width_bytes):  # little-endian hex of a bigint column
        hx = F.lpad(F.hex(c), 2 * width_bytes, "0")
        return F.concat(
            *[
                F.substring(hx, 2 * i + 1, 2)
                for i in reversed(range(width_bytes))
            ]
        )

    wav = F.unhex(
        F.concat(
            F.lit("52494646"),  # 'RIFF'
            # declared chunk content after this field: 'WAVE'(4) +
            # LIST hdr+INFO(12) + fmt hdr+body(24) + data hdr(8) + data
            le(data_size + 48, 4),
            F.lit("57415645"),  # 'WAVE'
            F.lit("4C495354"), le(F.lit(4).cast("bigint"), 4),  # 'LIST' len=4
            F.lit("494E464F"),  # 'INFO'
            F.lit("666D7420"), le(F.lit(16).cast("bigint"), 4),  # 'fmt ' len=16
            le(F.lit(1).cast("bigint"), 2),  # PCM
            le(ch, 2),
            le(sr, 4),
            le(byte_rate, 4),
            le(block_align, 2),
            le(bits, 2),
            F.lit("64617461"),  # 'data'
            le(data_size, 4),
        )
    )
    media = docs.select(
        d.alias("media_id"),
        F.when(d % 97 == 0, F.unhex(F.lit("52494646"))).otherwise(wav).alias(
            "payload"
        ),
    )
    parsed = audio_stats(media)
    return parsed.select(
        "media_id",
        *[
            F.coalesce(F.col(cq), F.lit(-1).cast(t)).alias(cq)
            for cq, t in (
                ("sample_rate", "int"),
                ("channels", "int"),
                ("bits", "int"),
                ("duration_ms", "bigint"),
            )
        ],
    )


@query(
    "video_mp4_stats",
    oracle="""
    SELECT doc_id AS media_id,
           CASE WHEN doc_id % 89 = 0 THEN -1
                ELSE CAST(ts AS INTEGER) END AS timescale,
           CASE WHEN doc_id % 89 = 0 THEN -1
                ELSE CAST((1000 + (doc_id * 13) % 1000000) * 1000 // ts
                          AS BIGINT) END AS duration_ms
    FROM (
      SELECT doc_id,
             CASE doc_id % 4 WHEN 0 THEN 600 WHEN 1 THEN 1000
                             WHEN 2 THEN 90000 ELSE 48000 END AS ts
      FROM documents
    )
    """,
)
def q_video_mp4_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REAL video-header parser under the driver gate — completing
    the image/audio/VIDEO header triad: ISO-BMFF (MP4) containers are
    SYNTHESIZED in-plan from deterministic per-doc movie parameters
    (hex/unhex codegen — big-endian box sizes, an interleaved ``free``
    box and a ``udta`` sibling ahead of ``mvhd`` so the box WALK is
    load-bearing, and both mvhd version 0 (u32 fields) and version 1
    (u64 times/duration) alternating by doc parity), then
    operators/multimodal.video_stats walks the boxes back on the Arrow
    batch path. Every 89th doc carries an mdat-only payload (no ftyp)
    and must quarantine (coalesced to -1 on both sides — the
    fetchdf nullable-int trap, as audio_wav_stats). The oracle states
    the generator's ground truth, so box-size arithmetic, version
    dispatch, field offsets, and units→ms integer math are all
    value-checked. (Frame DECODE is ffmpeg's job and stays honestly
    out of scope; duration/timescale extraction needs no codec and is
    real.)"""
    from min_flink_spark.operators.multimodal import video_stats

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    d = F.col("doc_id")
    ts = (
        F.when(d % 4 == 0, 600)
        .when(d % 4 == 1, 1000)
        .when(d % 4 == 2, 90000)
        .otherwise(48000)
        .cast("bigint")
    )
    du = (1000 + (d * 13) % 1000000).cast("bigint")
    hex8 = lambda c: F.lpad(F.hex(c), 8, "0")  # big-endian u32  # noqa: E731
    hex16 = lambda c: F.lpad(F.hex(c), 16, "0")  # big-endian u64  # noqa: E731
    common = F.concat(
        F.lit("000000106674797069736F6D00000200"),  # ftyp isom
        F.lit("0000000866726565"),  # free box (walk must skip it)
    )
    moov_v0 = F.concat(
        F.lit("0000002C6D6F6F76"),  # moov size 44
        F.lit("0000000875647461"),  # udta sibling before mvhd
        F.lit("0000001C6D766864"),  # mvhd size 28
        F.lit("00000000"),  # version 0 + flags
        F.lit("0000000000000000"),  # creation + modification (u32 each)
        hex8(ts),
        hex8(du),
    )
    moov_v1 = F.concat(
        F.lit("000000386D6F6F76"),  # moov size 56
        F.lit("0000000875647461"),
        F.lit("000000286D766864"),  # mvhd size 40
        F.lit("01000000"),  # version 1 + flags
        F.lit("0000000000000000" * 2),  # creation + modification (u64 each)
        hex8(ts),
        hex16(du),
    )
    mp4 = F.unhex(
        F.concat(common, F.when(d % 2 == 0, moov_v0).otherwise(moov_v1))
    )
    media = docs.select(
        d.alias("media_id"),
        F.when(d % 89 == 0, F.unhex(F.lit("000000086D646174")))
        .otherwise(mp4)
        .alias("payload"),
    )
    parsed = video_stats(media)
    return parsed.select(
        "media_id",
        F.coalesce(F.col("timescale"), F.lit(-1).cast("int")).alias("timescale"),
        F.coalesce(F.col("duration_ms"), F.lit(-1).cast("bigint")).alias(
            "duration_ms"
        ),
    )


@query(
    "er_candidate_features",
    oracle=f"""
    WITH corpus AS ({SQL_CORPUS_NEAR}),
    {SQL_SHINGLES},
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM shingles GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
      FROM shingles a
      JOIN shingles b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    cand AS (
      SELECT doc_a, doc_b,
             CAST(round(CAST(n_inter AS DOUBLE)
                        / (sa.n_sh + sb.n_sh - n_inter) * 1000000)
                  AS BIGINT) AS jaccard_micro
      FROM inter
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b
      WHERE CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) >= 0.3
    )
    SELECT c.doc_a, c.doc_b, c.jaccard_micro,
           CAST(levenshtein(substr(ca.text, 1, 60), substr(cb.text, 1, 60))
                AS BIGINT) AS edit_dist,
           CAST(round(CAST(least(length(ca.text), length(cb.text)) AS DOUBLE)
                      / greatest(length(ca.text), length(cb.text)) * 1000000)
                AS BIGINT) AS len_ratio_micro
    FROM cand c
    JOIN corpus ca ON ca.doc_id = c.doc_a
    JOIN corpus cb ON cb.doc_id = c.doc_b
    """,
)
def q_er_candidate_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution feature table: blocked candidate pairs
    (inverted-index shingle Jaccard ≥ 0.3 — never all-pairs) scored
    with the classic match features — set Jaccard, prefix-bounded edit
    distance (O(len²), so only on candidates), and length ratio — the
    input a pairwise match classifier trains on. Ratios ride as
    micro-ints so the feature values hash exactly; every join is an
    equi-join on the pair/doc keys."""
    from min_flink_spark.operators.dedup import ngram_jaccard_pairs

    corpus = _spark_near_corpus(spark, sf_dir)
    pairs = ngram_jaccard_pairs(corpus, threshold=0.3).select(
        "doc_a",
        "doc_b",
        F.round(F.col("jaccard") * 1000000).cast("bigint").alias("jaccard_micro"),
    )
    ta = corpus.select(
        F.col("doc_id").alias("doc_a"),
        F.substring("text", 1, 60).alias("_ta"),
        F.length("text").alias("_la"),
    )
    tb = corpus.select(
        F.col("doc_id").alias("doc_b"),
        F.substring("text", 1, 60).alias("_tb"),
        F.length("text").alias("_lb"),
    )
    return (
        pairs.join(ta, "doc_a")
        .join(tb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "jaccard_micro",
            F.levenshtein("_ta", "_tb").cast("bigint").alias("edit_dist"),
            F.round(
                F.least("_la", "_lb").cast("double")
                / F.greatest("_la", "_lb")
                * 1000000
            ).cast("bigint").alias("len_ratio_micro"),
        )
    )


@query(
    "simhash_hamming_pairs",
    oracle=f"""
    WITH corpus AS ({SQL_CORPUS_NEAR}),
    tok AS (
      SELECT DISTINCT doc_id, t AS tok
      FROM (SELECT doc_id, unnest({SQL_TOKS}) AS t FROM corpus)
    ),
    hashed AS (
      SELECT doc_id, CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT) AS h
      FROM tok
    ),
    votes AS (
      SELECT doc_id, b.bit,
             sum(CASE WHEN (h >> b.bit) & 1 = 1 THEN 1 ELSE -1 END) AS v
      FROM hashed, (SELECT unnest(generate_series(0, 31)) AS bit) b
      GROUP BY doc_id, b.bit
    ),
    sigs AS (
      SELECT doc_id,
             CAST(sum(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << bit)
                           ELSE 0 END) AS BIGINT) AS simhash
      FROM votes GROUP BY doc_id
    ),
    banded AS (
      SELECT doc_id, simhash, b.band, (simhash >> (b.band * 8)) & 255 AS key
      FROM sigs, (SELECT unnest(generate_series(0, 3)) AS band) b
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
             a.simhash AS sig_a, b.simhash AS sig_b
      FROM banded a JOIN banded b
        ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
    )
    SELECT CAST(bit_count(xor(sig_a, sig_b)) AS BIGINT) AS hamming,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(min(id_a) AS BIGINT) AS min_id_a,
           CAST(max(id_b) AS BIGINT) AS max_id_b
    FROM cand WHERE bit_count(xor(sig_a, sig_b)) <= 3
    GROUP BY 1
    """,
)
def q_simhash_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs via the pigeonhole band trick
    (operators/dedup.simhash_hamming_pairs) — the classic web-scale
    dedup: Hamming ≤ 3 over 32-bit signatures means the pair agrees
    exactly on ≥1 of 4 byte slices, so candidates come from per-band
    equality joins (recall 1.0 by pigeonhole, never an all-pairs
    Hamming scan) and the exact bit_count(xor) rerank gives precision
    1.0. Run over the near-dup corpus where truncated copies sit a few
    bits away; the oracle replays signatures, banding, and the Hamming
    cut bit for bit."""
    from min_flink_spark.operators.dedup import simhash_hamming_pairs

    corpus = _spark_near_corpus(spark, sf_dir)
    pairs = simhash_hamming_pairs(corpus, max_hamming=3)
    # synthetic docs share a tight vocabulary, so signatures cluster and
    # the pair set is large at high SF — the gate row carries the
    # per-distance DISTRIBUTION (plus id extrema), which pins the same
    # computation without shipping millions of pairs through the
    # comparator
    return pairs.groupBy("hamming").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.min("id_a").alias("min_id_a"),
        F.max("id_b").alias("max_id_b"),
    )


def _proto_oracle(dim: int = 64) -> str:
    psums = ", ".join(f"sum(v[{j + 1}]) AS p{j}" for j in range(dim))
    # one term per component, SAME left-to-right fold as the Spark
    # expression tree; x*x (not pow) for IEEE identity
    terms = " + ".join(
        f"(CAST(v[{j + 1}] AS DOUBLE) - CAST(p{j} AS DOUBLE) / CAST(n AS DOUBLE))"
        f" * (CAST(v[{j + 1}] AS DOUBLE) - CAST(p{j} AS DOUBLE) / CAST(n AS DOUBLE))"
        for j in range(dim)
    )
    return f"""
    WITH vm AS (
      SELECT vec_id, label,
             list_transform(embedding,
               x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS v
      FROM embeddings
    ),
    p AS (
      SELECT label, count(*) AS n, {psums}
      FROM vm GROUP BY label
    ),
    d AS (
      SELECT vm.vec_id, vm.label AS label, p.label AS cand,
             ({terms}) AS dist
      FROM vm CROSS JOIN p
    ),
    best AS (
      SELECT vec_id, label, cand,
             row_number() OVER (
               PARTITION BY vec_id ORDER BY dist ASC, cand ASC) AS rn
      FROM d
    )
    SELECT CAST(label AS INT) AS label,
           CAST(cand AS INT) AS predicted_label,
           CAST(count(*) AS BIGINT) AS n
    FROM best WHERE rn = 1 GROUP BY 1, 2
    """


@query("prototype_label_agreement", oracle=_proto_oracle())
def q_prototype_label_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prototype-based label verification (operators/similarity.
    label_prototypes + nearest_prototype) — the embedding-curation
    mislabel-detection pass: per-label class centroids in EXACT integer
    micro-unit space (bit-identical at any parallelism, mergeable
    across shards like grouped_stats), then every vector is assigned to
    its nearest prototype by squared Euclidean distance to the class
    mean (exact-integer inputs folded left-to-right, so the DuckDB
    replay is bit-identical; ties → lowest label). The gate row is the
    (label, predicted_label) confusion census — off-diagonal cells are
    the review queue. Plan: ONE map-side-combine hash agg for the
    prototypes (no explode — dim column expressions), a labels-sized
    broadcast into the corpus (bounded by construction), one id-keyed
    min-struct argmin, one tiny count agg. The corpus is scanned twice
    and never sorted; nothing data-sized crosses a nested loop."""
    from min_flink_spark.operators.similarity import (
        label_prototypes,
        nearest_prototype,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    protos = label_prototypes(emb, dim=64)
    pred = nearest_prototype(emb, protos, dim=64)
    return (
        emb.select("vec_id", "label")
        .join(pred, "vec_id")
        .groupBy(
            F.col("label").cast("int").alias("label"),
            F.col("predicted_label").cast("int").alias("predicted_label"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
