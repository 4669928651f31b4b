"""Corpus-statistics pipeline queries: TF-IDF and deterministic
sampling — standard pre-training data-curation steps.

Sampling uses md5-hash thresholds, NOT rand(): reproducible across
runs, engines, and cluster sizes, and stable under repartitioning —
the only sampling that is auditable at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from min_flink_spark.functions.hashing import hash_bucket
from min_flink_spark.functions.text import tokens
from min_flink_spark.registry import query
from min_flink_spark.sources import load_table

SQL_TOKS = "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> length(x) > 0)"


@query(
    "tfidf_top_terms",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest({SQL_TOKS}) AS term FROM documents
    ),
    tf AS (
      SELECT doc_id, term, CAST(count(*) AS BIGINT) AS cnt FROM tok GROUP BY 1, 2
    ),
    doclen AS (
      SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS len FROM tf GROUP BY 1
    ),
    df AS (
      SELECT term, CAST(count(*) AS BIGINT) AS n_docs FROM tf GROUP BY 1
    ),
    n AS (SELECT CAST(count(*) AS BIGINT) AS total FROM documents)
    SELECT doc_id, term, tfidf FROM (
      SELECT tf.doc_id, tf.term,
             round((CAST(tf.cnt AS DOUBLE) / doclen.len)
                   * ln(CAST(n.total AS DOUBLE) / df.n_docs), 6) AS tfidf,
             row_number() OVER (PARTITION BY tf.doc_id
                                ORDER BY round((CAST(tf.cnt AS DOUBLE) / doclen.len)
                                         * ln(CAST(n.total AS DOUBLE) / df.n_docs), 6) DESC,
                                         tf.term ASC) AS rn
      FROM tf
      JOIN doclen ON tf.doc_id = doclen.doc_id
      JOIN df ON tf.term = df.term
      CROSS JOIN n
    ) t WHERE rn <= 3
    """,
)
def q_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document — ONE tokenize, window-derived
    statistics (r13 restructure).

    The r12 form derived doclen/df as three groupBys over the same tf
    frame and leaned on ReuseExchange to dedupe the (doc, term)
    shuffle; profiled at sf1 (PERF.md r13), Catalyst's column pruning
    specializes each leg's aggregate (the df leg drops `cnt`
    entirely), the exchanges stop being identical, reuse never fires,
    and the corpus was TOKENIZED THREE TIMES — the regex explode over
    2.7M tokens dominated the 5.7-6.9 s wall. Now the per-term
    document frequency and per-doc length are WINDOW aggregates over
    the single tf frame: same shuffle budget (one on (doc, term), one
    on term, one on doc — the doc-length window and the top-k window
    share one exchange), zero joins, and exactly one tokenize pass.
    The document-count scalar still rides a broadcast cross join from
    a column-pruned count scan, never a driver collect. No broadcast
    hints anywhere: vocabulary cardinality is unbounded on a web
    corpus (10^8-10^9 terms at 100 TB)."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("cnt"))
    n = docs.agg(F.count(F.lit(1)).alias("total"))
    w_term = Window.partitionBy("term")
    w_doc = Window.partitionBy("doc_id")
    scored = (
        tf.withColumn("n_docs", F.count(F.lit(1)).over(w_term))
        .withColumn("len", F.sum("cnt").over(w_doc))
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            # 6dp-rounded on BOTH sides, and the rounded value is also the
            # top-k sort key: ln() drifts by ulps across engines, and an
            # unrounded sort key could swap near-tied rank-3/4 rows (row
            # membership bug, not just a hash bug)
            F.round(
                (F.col("cnt").cast("double") / F.col("len"))
                * F.log(F.col("total").cast("double") / F.col("n_docs")),
                6,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "term", "tfidf")
    )




@query(
    "deterministic_sample",
    oracle="""
    SELECT event_id, user_id, event_type, value FROM events
    WHERE CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 10
    """,
)
def q_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~10% reproducible sample keyed on event_id."""
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(hash_bucket(F.col("event_id"), 100) < 10).select(
        "event_id", "user_id", "event_type", "value"
    )


@query(
    "stratified_sample",
    oracle="""
    SELECT event_id, event_type, value FROM events
    WHERE CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100
          < CASE event_type WHEN 'purchase' THEN 50 WHEN 'error' THEN 50 ELSE 5 END
    """,
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum rates (oversample rare/valuable strata) — same
    hash-threshold primitive, rate chosen per event_type."""
    ev = load_table(spark, sf_dir, "events")
    rate = (
        F.when(F.col("event_type") == "purchase", 50)
        .when(F.col("event_type") == "error", 50)
        .otherwise(5)
    )
    return ev.filter(hash_bucket(F.col("event_id"), 100) < rate).select(
        "event_id", "event_type", "value"
    )


@query(
    "per_domain_cap",
    oracle="""
    SELECT doc_id, source, n_chars FROM (
      SELECT doc_id, source, n_chars,
             row_number() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC) AS rn
      FROM documents
    ) t WHERE rn <= 10
    """,
)
def q_per_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Absolute per-source document cap (operators/pipeline.cap_per_group):
    at most 10 docs per source by deterministic md5 rank — bounds any
    single domain regardless of its share (domain_mix handles ratios).
    WindowGroupLimit keeps the per-group top-k ahead of the shuffle."""
    from min_flink_spark.operators.pipeline import cap_per_group

    docs = load_table(spark, sf_dir, "documents")
    return cap_per_group(docs, ["source"], "doc_id", k=10).select(
        "doc_id", "source", "n_chars"
    )


# ---------------------------------------------------------------------------
# training-data pipeline: PII / repetition / quality / decontamination /
# packing (operators/pipeline.py)
# ---------------------------------------------------------------------------

# PII-bearing corpus: deterministic synthetic contacts appended to the
# docs (the synthetic corpus itself contains no PII). Kept verbatim in
# both engines.
SQL_PII_CORPUS = """
  SELECT doc_id,
         text || ' contact user' || doc_id || '@example.com or +1 555 000 '
              || doc_id || ' from 10.0.' || (doc_id % 256) || '.7' AS text
  FROM documents
"""
SQL_EMAIL = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
SQL_PHONE = "\\+[0-9][0-9 -]{7,}[0-9]"
SQL_IPV4 = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"


@query(
    "pii_redaction",
    oracle=f"""
    WITH corpus AS ({SQL_PII_CORPUS})
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{SQL_EMAIL}')) AS INT) AS n_emails,
           CAST(len(regexp_extract_all(text, '{SQL_PHONE}')) AS INT) AS n_phones,
           CAST(len(regexp_extract_all(text, '{SQL_IPV4}')) AS INT) AS n_ips,
           regexp_replace(
             regexp_replace(
               regexp_replace(text, '{SQL_EMAIL}', '[EMAIL]', 'g'),
               '{SQL_PHONE}', '[PHONE]', 'g'),
             '{SQL_IPV4}', '[IP]', 'g') AS text
    FROM corpus
    """,
)
def q_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub pass (operators/pipeline.py:redact_pii): emails/intl
    phones/IPv4 → typed placeholders + per-category counts. Patterns
    live in the Java-regex ∩ RE2 subset so the oracle replays them
    verbatim; pure codegen, scan-parallel."""
    from min_flink_spark.operators.pipeline import redact_pii

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"), F.col("doc_id"), F.lit("@example.com or +1 555 000 "),
            F.col("doc_id"),
            F.lit(" from 10.0."), F.col("doc_id") % 256, F.lit(".7"),
        ).alias("text"),
    )
    return redact_pii(docs).select("doc_id", "n_emails", "n_phones", "n_ips", "text")


@query(
    "repetition_signals",
    oracle=f"""
    WITH corpus AS (
      SELECT doc_id,
             CASE WHEN doc_id % 2 = 0 THEN text || ' ' || text ELSE text END AS text
      FROM documents
    ),
    t AS (SELECT doc_id, {SQL_TOKS} AS toks FROM corpus),
    g AS (
      SELECT doc_id,
             CASE WHEN len(toks) >= 2 THEN
               list_transform(range(0, len(toks) - 1, 1),
                              i -> toks[i + 1] || ' ' || toks[i + 2])
             ELSE [] END AS g2,
             CASE WHEN len(toks) >= 3 THEN
               list_transform(range(0, len(toks) - 2, 1),
                              i -> toks[i + 1] || ' ' || toks[i + 2] || ' ' || toks[i + 3])
             ELSE [] END AS g3
      FROM t
    )
    SELECT doc_id,
           CASE WHEN len(g2) > 0
                THEN 1 - len(list_distinct(g2)) / CAST(len(g2) AS DOUBLE)
                ELSE 0.0 END AS dup_2gram_frac,
           CASE WHEN len(g3) > 0
                THEN 1 - len(list_distinct(g3)) / CAST(len(g3) AS DOUBLE)
                ELSE 0.0 END AS dup_3gram_frac
    FROM g
    """,
)
def q_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style duplicate-n-gram fractions over a corpus where every
    even doc is self-doubled (planted repetition). Ratios are exact
    int/int divisions — bit-stable."""
    from min_flink_spark.operators.pipeline import repetition_signals

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(
            F.col("doc_id") % 2 == 0, F.concat("text", F.lit(" "), "text")
        ).otherwise(F.col("text")).alias("text"),
    )
    return repetition_signals(docs).select("doc_id", "dup_2gram_frac", "dup_3gram_frac")


@query(
    "quality_filter_flags",
    oracle=f"""
    WITH t AS (SELECT doc_id, {SQL_TOKS} AS toks, text FROM documents),
    g AS (
      SELECT doc_id, toks,
             CASE WHEN len(toks) >= 2 THEN
               list_transform(range(0, len(toks) - 1, 1),
                              i -> toks[i + 1] || ' ' || toks[i + 2])
             ELSE [] END AS g2
      FROM t
    ),
    m AS (
      SELECT doc_id,
             len(toks) AS n_words,
             CASE WHEN len(toks) > 0
                  THEN list_reduce(list_transform(toks, x -> length(x)), (a, b) -> a + b)
                       / CAST(len(toks) AS DOUBLE)
                  ELSE 0.0 END AS avg_len,
             CASE WHEN len(g2) > 0
                  THEN 1 - len(list_distinct(g2)) / CAST(len(g2) AS DOUBLE)
                  ELSE 0.0 END AS dup2
      FROM g
    )
    SELECT doc_id,
           n_words >= 10 AS ok_min_words,
           avg_len <= 12.0 AS ok_word_len,
           dup2 <= 0.5 AS ok_repetition,
           (n_words >= 10 AND avg_len <= 12.0 AND dup2 <= 0.5) AS keep
    FROM m
    """,
)
def q_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4/Gopher composite keep/drop with auditable per-rule flags
    (operators/pipeline.py:quality_filter). Thresholds compare exact
    int/int divisions, so the booleans are engine-stable."""
    from min_flink_spark.operators.pipeline import quality_filter

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return quality_filter(docs).select(
        "doc_id", "ok_min_words", "ok_word_len", "ok_repetition", "keep"
    )


@query(
    "contamination_overlap",
    oracle=f"""
    WITH train AS (
      SELECT doc_id, text FROM documents WHERE doc_id % 97 != 0
    ),
    eval_docs AS (
      -- planted leak: eval set = held-out docs ∪ verbatim copies of 10
      SELECT doc_id, text FROM documents WHERE doc_id % 97 = 0
      UNION ALL
      SELECT doc_id + 500000, text FROM documents WHERE doc_id < 10
    ),
    tr_tok AS (SELECT doc_id, {SQL_TOKS} AS toks FROM train),
    tr_sh AS (
      SELECT DISTINCT doc_id,
             concat_ws(' ', toks[i+1], toks[i+2], toks[i+3], toks[i+4],
                            toks[i+5], toks[i+6], toks[i+7], toks[i+8]) AS shingle
      FROM tr_tok, LATERAL (SELECT unnest(generate_series(0, greatest(len(toks) - 8, 0))) AS i) g
      WHERE i + 8 <= len(toks)
    ),
    -- replay the operator's df_cap=1000 stop-shingle filter: a shingle
    -- in >1000 train docs is dropped BEFORE counting on the Spark side,
    -- so the oracle must drop it too (latent divergence at scale even
    -- though no sf0.01 shingle reaches the cap)
    hot AS (
      SELECT shingle FROM tr_sh GROUP BY shingle HAVING count(*) > 1000
    ),
    tr_kept AS (
      SELECT t.* FROM tr_sh t LEFT JOIN hot h ON t.shingle = h.shingle
      WHERE h.shingle IS NULL
    ),
    ev_tok AS (SELECT doc_id, {SQL_TOKS} AS toks FROM eval_docs),
    ev_sh AS (
      SELECT DISTINCT
             concat_ws(' ', toks[i+1], toks[i+2], toks[i+3], toks[i+4],
                            toks[i+5], toks[i+6], toks[i+7], toks[i+8]) AS shingle
      FROM ev_tok, LATERAL (SELECT unnest(generate_series(0, greatest(len(toks) - 8, 0))) AS i) g
      WHERE i + 8 <= len(toks)
    )
    SELECT t.doc_id,
           CAST(count(*) AS BIGINT) AS n_shingles,
           CAST(sum(CASE WHEN e.shingle IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_matched,
           sum(CASE WHEN e.shingle IS NOT NULL THEN 1 ELSE 0 END)
             / CAST(count(*) AS DOUBLE) AS overlap_frac
    FROM tr_kept t LEFT JOIN ev_sh e ON t.shingle = e.shingle
    GROUP BY t.doc_id
    """,
)
def q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (operators/pipeline.py:
    contamination_overlap): 8-gram overlap of every train doc against an
    eval set containing 10 planted verbatim train docs — those come back
    with overlap_frac 1.0, clean docs ≈ 0. Inverted-index semi-join,
    never an all-pairs comparison."""
    from min_flink_spark.operators.pipeline import contamination_overlap

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    train = docs.filter(F.col("doc_id") % 97 != 0)
    evalset = docs.filter(F.col("doc_id") % 97 == 0).unionByName(
        docs.filter(F.col("doc_id") < 10).select(
            (F.col("doc_id") + 500000).alias("doc_id"), "text"
        )
    )
    return contamination_overlap(train, evalset, n=8, df_cap=1000)


@query(
    "sequence_packing",
    oracle="""
    WITH RECURSIVE src AS (
      SELECT doc_id,
             CAST(len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                  x -> length(x) > 0)) AS BIGINT) AS n_tokens,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 32
                  AS BIGINT) AS bucket
      FROM documents
    ),
    d AS (
      SELECT *, row_number() OVER (PARTITION BY bucket ORDER BY doc_id) AS rn
      FROM src
    ),
    packed AS (
      SELECT bucket, rn, doc_id, n_tokens,
             CAST(0 AS BIGINT) AS bin,
             CAST(0 AS BIGINT) AS "offset",
             least(n_tokens, 512) AS used
      FROM d WHERE rn = 1
      UNION ALL
      SELECT d.bucket, d.rn, d.doc_id, d.n_tokens,
             CASE WHEN p.used + least(d.n_tokens, 512) > 512 AND p.used > 0
                  THEN p.bin + 1 ELSE p.bin END,
             CASE WHEN p.used + least(d.n_tokens, 512) > 512 AND p.used > 0
                  THEN 0 ELSE p.used END,
             CASE WHEN p.used + least(d.n_tokens, 512) > 512 AND p.used > 0
                  THEN least(d.n_tokens, 512)
                  ELSE p.used + least(d.n_tokens, 512) END
      FROM packed p JOIN d ON d.bucket = p.bucket AND d.rn = p.rn + 1
    )
    SELECT doc_id, n_tokens, bucket, bin, "offset" FROM packed
    """,
)
def q_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy 512-token sequence packing into training bins
    (operators/pipeline.py:pack_sequences): md5-bucketed, packed in
    doc_id order per bucket via one Arrow applyInPandas — sequential
    only within a bucket, parallel across buckets. The oracle replays
    the greedy fold with a recursive CTE."""
    from min_flink_spark.operators.pipeline import pack_sequences
    from min_flink_spark.functions.text import token_count

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", token_count(F.col("text")).cast("bigint").alias("n_tokens")
    )
    return pack_sequences(docs, capacity=512, num_buckets=32)


@query(
    "paragraph_dedup",
    oracle="""
    WITH corpus AS (
      SELECT doc_id,
             'subscribe to our newsletter<P>' || text ||
             '<P>all rights reserved 2024' AS text
      FROM documents
    ),
    paras AS (
      SELECT doc_id, i AS pos, parts[i + 1] AS para,
             md5(trim(parts[i + 1])) AS pkey
      FROM (SELECT doc_id, string_split(text, '<P>') AS parts FROM corpus),
           LATERAL (SELECT unnest(generate_series(0, len(parts) - 1)) AS i) g
      WHERE length(trim(parts[i + 1])) >= 1
    ),
    hot AS (
      SELECT pkey FROM paras GROUP BY pkey HAVING count(DISTINCT doc_id) > 1
    ),
    kept AS (
      SELECT p.* FROM paras p LEFT JOIN hot h ON p.pkey = h.pkey
      WHERE h.pkey IS NULL
    ),
    agg AS (
      SELECT doc_id,
             string_agg(para, '<P>' ORDER BY pos) AS text,
             CAST(count(*) AS BIGINT) AS n_paras_kept
      FROM kept GROUP BY doc_id
    )
    SELECT c.doc_id, coalesce(a.text, '') AS text,
           CAST(coalesce(a.n_paras_kept, 0) AS BIGINT) AS n_paras_kept
    FROM (SELECT DISTINCT doc_id FROM corpus) c
    LEFT JOIN agg a ON c.doc_id = a.doc_id
    """,
)
def q_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level paragraph dedup (operators/pipeline.py:
    dedup_paragraphs — the C4 boilerplate-removal move): every doc gets
    a shared header/footer planted; paragraphs appearing in more than
    one document are dropped corpus-wide and the docs reassembled in
    original order. Two hash-shuffles, nothing quadratic."""
    from min_flink_spark.operators.pipeline import dedup_paragraphs

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.lit("subscribe to our newsletter<P>"),
            F.col("text"),
            F.lit("<P>all rights reserved 2024"),
        ).alias("text"),
    )
    return dedup_paragraphs(docs, sep="<P>", df_cap=1)


@query(
    "epoch_shuffle_index",
    oracle="""
    SELECT doc_id,
           CAST(row_number() OVER (
               ORDER BY md5('epoch-0:' || CAST(doc_id AS VARCHAR)), doc_id
           ) AS BIGINT) AS epoch_pos
    FROM documents
    """,
)
def q_epoch_shuffle_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic epoch shuffle for training: every doc gets a
    reproducible position in a seeded global permutation (order by
    md5(seed || id)). The oracle IS the single-partition row_number;
    the Spark plan is `operators.relational.global_index` — range
    partition + per-partition offsets, so no task ever sees more than
    1/N of the data (a naive global window would funnel 100 TB through
    one task)."""
    from min_flink_spark.operators.relational import global_index

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    shuffle_key = F.md5(F.concat(F.lit("epoch-0:"), F.col("doc_id").cast("string")))
    out = global_index(
        docs, order_by=[shuffle_key, F.col("doc_id")], index_col="epoch_pos"
    )
    return out.select("doc_id", "epoch_pos")


# Target mixture for the documents corpus: boost src0, keep src1 at
# half weight of src0, thin every other source. Integer weights — the
# whole rate computation stays in exact integer arithmetic.
MIX_TARGETS = {f"src{i}": (6 if i == 0 else 3 if i == 1 else 1) for i in range(20)}


@query(
    "domain_mix_sample",
    oracle=f"""
    WITH counts AS (
      SELECT source, count(*) AS c FROM documents GROUP BY source
    ),
    tw AS (
      SELECT * FROM (VALUES {", ".join(f"('{s}', {w})" for s, w in sorted(MIX_TARGETS.items()))}) t(source, w)
    ),
    j AS (SELECT counts.source, c, w FROM counts JOIN tw USING (source)),
    scale AS (SELECT min(c * 1000 // w) AS k FROM j),
    rates AS (
      SELECT source, least(1000000, w * k * 1000000 // (c * 1000)) AS t
      FROM j, scale
    )
    SELECT d.doc_id, d.source FROM documents d
    JOIN rates r ON d.source = r.source
    WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
          % 1000000 < r.t
    """,
)
def q_domain_mix_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain mixing: deterministically downsample each source to
    target mixture weights (waterfilling — scale to the binding
    source, never upsample). All rate arithmetic is integer, so the
    SQL replay is exact; row choice is the md5-threshold primitive."""
    from min_flink_spark.operators.pipeline import domain_mix

    docs = load_table(spark, sf_dir, "documents")
    return domain_mix(
        docs, source_col="source", id_col="doc_id", targets=MIX_TARGETS
    ).select("doc_id", "source")


@query(
    "corpus_drift_report",
    oracle="""
    WITH newc AS (
      SELECT doc_id,
             CASE WHEN doc_id % 7 = 0 THEN NULL
                  ELSE length(substr(text, 1, greatest(length(text) - 25, 10)))
             END AS n_chars
      FROM documents WHERE doc_id % 10 <> 0
    ),
    o AS (
      SELECT 'n_chars' AS col_name, CAST(count(*) AS BIGINT) AS n_old,
             CAST(sum(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_old,
             CAST(sum(n_chars) AS DOUBLE) / count(n_chars) AS mean_old,
             CAST(min(n_chars) AS DOUBLE) AS min_old,
             CAST(max(n_chars) AS DOUBLE) AS max_old
      FROM documents
    ),
    nn AS (
      SELECT 'n_chars' AS col_name, CAST(count(*) AS BIGINT) AS n_new,
             CAST(sum(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_new,
             CAST(sum(n_chars) AS DOUBLE) / count(n_chars) AS mean_new,
             CAST(min(n_chars) AS DOUBLE) AS min_new,
             CAST(max(n_chars) AS DOUBLE) AS max_new
      FROM newc
    )
    SELECT o.col_name AS column_name,
           n_old, nulls_old, mean_old, min_old, max_old,
           n_new, nulls_new, mean_new, min_new, max_new,
           mean_new - mean_old AS mean_delta,
           CAST(nulls_new AS DOUBLE) / n_new - CAST(nulls_old AS DOUBLE) / n_old
             AS null_rate_delta
    FROM o JOIN nn ON o.col_name = nn.col_name
    """,
)
def q_corpus_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus promotion gate: stats drift between the current snapshot
    and a candidate (here: a mutated corpus with 10% of docs dropped,
    truncated text, and nulls injected every 7th doc). One aggregation
    pass per side, one row per audited column. Means are exact (integer
    sums < 2^53 accumulate exactly in doubles, single final division),
    so the report — including the deltas — is bit-stable."""
    from min_flink_spark.operators.pipeline import drift_report

    docs = load_table(spark, sf_dir, "documents")
    new = (
        docs.filter(F.col("doc_id") % 10 != 0)
        .select(
            "doc_id",
            F.when(F.col("doc_id") % 7 == 0, F.lit(None).cast("bigint"))
            .otherwise(
                F.length(
                    F.substring(
                        "text", 1, F.greatest(F.length("text") - 25, F.lit(10))
                    )
                ).cast("bigint")
            )
            .alias("n_chars"),
        )
    )
    rep = drift_report(docs, new, numeric_cols=["n_chars"])
    # avg() skips nulls in both engines; count(*) includes them
    return rep.select(
        F.col("column").alias("column_name"),
        "n_old", "nulls_old", "mean_old", "min_old", "max_old",
        "n_new", "nulls_new", "mean_new", "min_new", "max_new",
        "mean_delta", "null_rate_delta",
    )


@query(
    "length_bucketed_batches",
    oracle=f"""
    WITH lens AS (
      SELECT doc_id, CAST(len({SQL_TOKS}) AS BIGINT) AS n_tokens FROM documents
    ),
    cuts AS (
      SELECT quantile_cont(n_tokens, 0.25) AS q1,
             quantile_cont(n_tokens, 0.5)  AS q2,
             quantile_cont(n_tokens, 0.75) AS q3
      FROM lens
    ),
    assigned AS (
      SELECT doc_id, n_tokens,
             CASE WHEN n_tokens <= q1 THEN 0
                  WHEN n_tokens <= q2 THEN 1
                  WHEN n_tokens <= q3 THEN 2
                  ELSE 3 END AS bucket
      FROM lens, cuts
    )
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(n_tokens) AS BIGINT) AS min_tokens,
           CAST(max(n_tokens) AS BIGINT) AS max_tokens,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens
    FROM assigned GROUP BY bucket
    """,
)
def q_length_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batching for inference/training: quartile cuts
    over token counts (exact percentiles — the 4-scalar result rides a
    broadcast back, never a collect of data), docs assigned to buckets,
    per-bucket stats. Buckets of similar-length sequences minimize
    padding waste; at 100 TB swap the exact quantile for the t-digest
    approx (same plan shape, one pass)."""
    docs = load_table(spark, sf_dir, "documents")
    lens = docs.select(
        "doc_id", F.size(tokens(F.col("text"))).cast("bigint").alias("n_tokens")
    )
    cuts = lens.agg(
        F.expr("percentile(n_tokens, 0.25)").alias("q1"),
        F.expr("percentile(n_tokens, 0.5)").alias("q2"),
        F.expr("percentile(n_tokens, 0.75)").alias("q3"),
    )
    assigned = lens.crossJoin(F.broadcast(cuts)).select(
        "doc_id",
        "n_tokens",
        F.when(F.col("n_tokens") <= F.col("q1"), 0)
        .when(F.col("n_tokens") <= F.col("q2"), 1)
        .when(F.col("n_tokens") <= F.col("q3"), 2)
        .otherwise(3)
        .cast("bigint")
        .alias("bucket"),
    )
    return assigned.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("n_tokens").alias("min_tokens"),
        F.max("n_tokens").alias("max_tokens"),
        F.sum("n_tokens").alias("total_tokens"),
    )


@query(
    "weighted_sample_topk",
    oracle="""
    WITH keyed AS (
      SELECT doc_id, source, n_chars,
             round(
               ln((CAST(('0x' || substr(md5('ws:' || CAST(doc_id AS VARCHAR)), 1, 8))
                   AS BIGINT) + 1) / 4294967297.0) / n_chars,
               6) + 0.0 AS es_key
      FROM documents WHERE n_chars > 0
    )
    SELECT doc_id, source, n_chars, es_key
    FROM keyed ORDER BY es_key DESC, doc_id LIMIT 100
    """,
)
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis–Spirakis):
    key = ln(u)/w with u an md5-derived uniform in (0,1], take the
    global top-k by key — the standard one-pass distributed weighted
    reservoir, here weighting docs by length. Deterministic (md5, not
    rand), so resumable and engine-replayable; the global top-k is
    TakeOrderedAndProject (k rows per partition to the driver merge,
    never a global sort). ln() drifts by ulps across engines, so the
    key is rounded to 6dp on BOTH sides and doc_id breaks ties — the
    SELECTION, not just the hash, is bit-stable."""
    from min_flink_spark.functions.hashing import md5_prefix_int
    from min_flink_spark.operators.relational import top_k

    docs = load_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    u = (
        md5_prefix_int(F.concat(F.lit("ws:"), F.col("doc_id").cast("string"))) + 1
    ) / F.lit(4294967297.0)
    keyed = docs.select(
        "doc_id",
        "source",
        "n_chars",
        # "+ 0.0" on both sides: a key that rounds to zero keeps its
        # sign bit differently across engines (Spark +0.0, DuckDB -0.0
        # — equal under ==, DIFFERENT under repr/hash); IEEE addition
        # of +0.0 canonicalizes -0.0 to +0.0 everywhere
        (F.round(F.log(u) / F.col("n_chars"), 6) + F.lit(0.0)).alias("es_key"),
    )
    return top_k(
        keyed, k=100, order_by=[F.col("es_key").desc(), F.col("doc_id").asc()]
    )


@query(
    "unigram_surprisal_score",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest({SQL_TOKS}) AS term FROM documents
    ),
    freq AS (
      SELECT term, CAST(count(*) AS BIGINT) AS cnt FROM tok GROUP BY term
    ),
    n AS (SELECT CAST(count(*) AS BIGINT) AS total FROM tok),
    scored AS (
      SELECT tok.doc_id,
             CAST(round(-ln(CAST(freq.cnt AS DOUBLE) / n.total) * 1000000)
                  AS BIGINT) AS s_u
      FROM tok JOIN freq ON tok.term = freq.term CROSS JOIN n
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(s_u) AS DOUBLE) / 1000000.0 / count(*) AS avg_surprisal
    FROM scored GROUP BY doc_id
    """,
)
def q_unigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-model-proxy quality score: per-doc mean unigram
    surprisal -ln p(token) under the corpus's own unigram distribution
    (the KenLM-perplexity-lite every curation stack runs — high
    surprisal = rare-token soup, low = boilerplate). Per-token
    surprisal is quantized to exact integer micro-units BEFORE the
    per-doc sum (FIXTURES §3 toolbox #1): a double sum of ln values is
    accumulation-order-dependent, a bigint sum is exact, so the score
    is bit-stable. The corpus token total rides a broadcast scalar — no
    collect. The freq join carries NO broadcast hint: the unigram table
    is vocabulary-sized (unbounded on a web corpus), so a forced hint
    is a 100 TB OOM — AQE broadcasts it while small and shuffles on
    `term` when not."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
    freq = tok.groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
    n = tok.agg(F.count(F.lit(1)).alias("total"))
    scored = (
        tok.join(freq, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            F.round(
                -F.log(F.col("cnt").cast("double") / F.col("total")) * 1000000
            )
            .cast("bigint")
            .alias("s_u"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        (F.sum("s_u").cast("double") / 1000000.0 / F.count(F.lit(1))).alias(
            "avg_surprisal"
        ),
    )


@query(
    "text_chunking",
    oracle=f"""
    WITH tk AS (
      SELECT doc_id, {SQL_TOKS} AS toks FROM documents
    ),
    st AS (
      SELECT doc_id, toks, unnest(range(0, len(toks), 48)) AS start FROM tk
    ),
    -- suppress a start whose previous window already covered the end
    -- (its chunk would be a strict subset of the previous chunk)
    numbered AS (
      SELECT doc_id, toks, start,
             row_number() OVER (PARTITION BY doc_id ORDER BY start) - 1 AS chunk_id
      FROM st WHERE start = 0 OR start - 48 + 64 < len(toks)
    )
    SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
           array_to_string(toks[start + 1:start + 64], ' ') AS chunk_text,
           CAST(least(64, len(toks) - start) AS BIGINT) AS n_tokens
    FROM numbered
    """,
)
def q_text_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking (operators/pipeline.chunk_text): 64-token
    windows every 48 tokens (16-token overlap) — the context-window
    prep for embedding/RAG pipelines. Narrow codegen op, no shuffle;
    the oracle replays starts/slices with DuckDB range+list slicing."""
    from min_flink_spark.operators.pipeline import chunk_text

    docs = load_table(spark, sf_dir, "documents")
    return chunk_text(docs, "text", "doc_id", chunk_tokens=64, stride=48)


@query(
    "zscore_standardized_values",
    oracle="""
    WITH u AS (
      SELECT event_id, event_type, value,
             CAST(round(value * 1000000) AS BIGINT) AS vu
      FROM events
    ),
    stats AS (
      SELECT event_type,
             CAST(sum(CAST(vu AS DECIMAL(18,0))) AS DOUBLE)
               / count(*) / 1000000.0 AS mu,
             -- cast BEFORE multiplying: bigint vu*vu overflows int64
             -- for |value| > ~3037 (vu > 3.04e9)
             CAST(sum(CAST(vu AS DECIMAL(18,0)) * CAST(vu AS DECIMAL(18,0)))
                  AS DOUBLE)
               / count(*) / 1000000000000.0 AS msq
      FROM u GROUP BY event_type
    )
    SELECT u.event_id, u.event_type,
           CASE WHEN s.msq - s.mu * s.mu <= 0 THEN 0.0
                ELSE (u.value - s.mu) / sqrt(s.msq - s.mu * s.mu) END AS z
    FROM u JOIN stats s ON u.event_type = s.event_type
    """,
)
def q_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score standardization with ENGINE-EXACT moments:
    sums ride the integer micro-unit plan (bigint per-row, decimal
    accumulator — a double sum is accumulation-order-dependent and
    would drift), then mean/variance/σ/z are derived through the
    IDENTICAL double op tree on both sides, so even sqrt and the final
    division are bit-identical with no rounding. Population variance;
    degenerate groups (σ² ≤ 0 after cancellation) emit z = 0."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    vu = F.round(F.col("value") * 1000000).cast("bigint")
    u = ev.withColumn("vu", vu)
    n = F.count(F.lit(1))
    stats = u.groupBy("event_type").agg(
        (F.sum(F.col("vu").cast("decimal(18,0)")).cast("double") / n / 1000000.0)
        .alias("mu"),
        (
            # decimal operands BEFORE the multiply — bigint vu*vu wraps
            # silently for |value| > ~3037
            F.sum(
                F.col("vu").cast("decimal(18,0)") * F.col("vu").cast("decimal(18,0)")
            ).cast("double")
            / n
            / 1000000000000.0
        ).alias("msq"),
    )
    var = F.col("msq") - F.col("mu") * F.col("mu")
    return (
        u.join(stats, "event_type")
        .select(
            "event_id",
            "event_type",
            F.when(var <= 0, F.lit(0.0))
            .otherwise((F.col("value") - F.col("mu")) / F.sqrt(var))
            .alias("z"),
        )
    )


@query(
    "minmax_normalized_values",
    oracle="""
    WITH cuts AS (
      SELECT event_type, min(value) AS mn, max(value) AS mx
      FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type,
           CASE WHEN c.mx = c.mn THEN 0.5
                ELSE (e.value - c.mn) / (c.mx - c.mn) END AS value_01
    FROM events e
    -- null-SAFE join: the operator keeps NULL group keys (eqNullSafe),
    -- so the oracle must too
    JOIN cuts c ON e.event_type IS NOT DISTINCT FROM c.event_type
    """,
)
def q_minmax_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group min-max scaling (operators/pipeline.normalize_minmax):
    bit-exact across engines without any rounding — min/max are
    order-independent and the single division is IEEE-exact."""
    from min_flink_spark.operators.pipeline import normalize_minmax

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    return normalize_minmax(ev, "value", ["event_type"], out_col="value_01").select(
        "event_id", "event_type", "value_01"
    )


@query(
    "train_val_test_split",
    oracle="""
    WITH b AS (
      SELECT doc_id, source,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 AS bk
      FROM documents
    )
    SELECT doc_id, source,
           CASE WHEN bk < 90 THEN 'train'
                WHEN bk < 95 THEN 'val'
                ELSE 'test' END AS split
    FROM b
    """,
)
def q_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/5/5 corpus split (operators/pipeline.
    split_train_val_test): disjoint + exhaustive by construction, and a
    doc's split never changes when other docs are added — the
    eval-contamination safety property random shuffles lack."""
    from min_flink_spark.operators.pipeline import split_train_val_test

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    return split_train_val_test(docs, "doc_id", (90, 5, 5))


@query(
    "chunk_retrieval_topk",
    oracle=f"""
    WITH tk AS (
      SELECT doc_id, {SQL_TOKS} AS toks FROM documents
    ),
    st AS (
      SELECT doc_id, toks, unnest(range(0, len(toks), 48)) AS start FROM tk
    ),
    chunks AS (
      SELECT doc_id * 1000 + (row_number() OVER (PARTITION BY doc_id ORDER BY start) - 1)
               AS chunk_key,
             doc_id,
             toks[start + 1:start + 64] AS ctoks
      FROM st WHERE start = 0 OR start - 48 + 64 < len(toks)
    ),
    sig AS (
      SELECT chunk_key, doc_id,
             ('0x' || substr(md5(t.tok), 1, 8))::BIGINT % 16 AS b,
             CASE WHEN ('0x' || substr(md5(t.tok), 9, 1))::BIGINT % 2 = 0
                  THEN 1.0 ELSE -1.0 END AS s
      FROM chunks, unnest(ctoks) AS t(tok)
    ),
    vec AS (
      SELECT c.chunk_key, c.doc_id,
             list(CAST(coalesce(cell.v, 0.0) AS DOUBLE) ORDER BY r.i) AS v
      FROM chunks c
      CROSS JOIN range(0, 16) r(i)
      LEFT JOIN (
        SELECT chunk_key, b, sum(s) AS v FROM sig GROUP BY chunk_key, b
      ) cell ON cell.chunk_key = c.chunk_key AND cell.b = r.i
      GROUP BY c.chunk_key, c.doc_id
    ),
    q AS (SELECT * FROM vec WHERE doc_id < 3
            AND sqrt(list_dot_product(v, v)) > 0),
    c AS (SELECT * FROM vec WHERE doc_id >= 3
            AND sqrt(list_dot_product(v, v)) > 0)
    SELECT query_id, chunk_key, round(cos_sim, 6) AS cos_sim FROM (
      SELECT q.chunk_key AS query_id, c.chunk_key AS chunk_key,
             list_cosine_similarity(q.v, c.v) AS cos_sim,
             row_number() OVER (
               PARTITION BY q.chunk_key
               ORDER BY list_cosine_similarity(q.v, c.v) DESC,
                        c.chunk_key ASC) AS rn
      FROM q JOIN c ON true
    ) t WHERE rn <= 3
    """,
)
def q_chunk_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full retrieval pipeline in one plan: sliding-window chunking
    (chunk_text) → deterministic hashing-trick embeddings (one md5 per
    token, ±1 votes into 16 buckets — exact integer-valued doubles, so
    the sums are engine-exact) → brute-force cosine top-3 of corpus
    chunks per query chunk (docs 0-2 query, the rest corpus; zero-norm
    vectors excluded from both sides). Every stage replayed in SQL —
    chunking, feature hashing, ranking. Swap the hash embed for a real
    model and LSH/IVF for brute force at scale; the plan shape is
    unchanged."""
    from min_flink_spark.operators.pipeline import chunk_text
    from min_flink_spark.operators.similarity import brute_force_topk, norm

    dim = 16
    docs = load_table(spark, sf_dir, "documents")
    chunks = chunk_text(docs, "text", "doc_id", chunk_tokens=64, stride=48).select(
        (F.col("doc_id") * 1000 + F.col("chunk_id")).alias("chunk_key"),
        "doc_id",
        "chunk_text",
    )

    # r14 optimization: ONE md5 per token, staged as an array of
    # (bucket, sign) structs BEFORE the vote fold — the old form
    # embedded the md5 subtrees in the zip_with lambda, so each token's
    # hash was recomputed once per vector ELEMENT (2 md5 × dim=16 → 32
    # md5 evaluations per token). Same buckets, same signs, same fold
    # order → identical vectors.
    tok_hash = F.transform(tokens(F.col("chunk_text")), lambda t: F.md5(t))
    tok_bs = F.transform(
        tok_hash,
        lambda h: F.struct(
            F.pmod(
                F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint"), F.lit(dim)
            ).alias("b"),
            F.when(
                F.conv(F.substring(h, 9, 1), 16, 10).cast("bigint") % 2 == 0,
                F.lit(1.0),
            )
            .otherwise(F.lit(-1.0))
            .alias("s"),
        ),
    )

    def step(acc, p):
        return F.zip_with(
            acc,
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda x, i: x
            + F.when(i.cast("bigint") == p["b"], p["s"]).otherwise(F.lit(0.0)),
        )

    vec = chunks.select(
        "chunk_key",
        "doc_id",
        F.aggregate(
            tok_bs,
            F.array_repeat(F.lit(0.0), dim),
            step,
        ).alias("v"),
    ).filter(norm(F.col("v")) > 0)
    q = vec.filter(F.col("doc_id") < 3)
    c = vec.filter(F.col("doc_id") >= 3)
    out = brute_force_topk(
        c, q, k=3, id_col="chunk_key", vec_col="v",
        query_id_col="query_id", exclude_self=False,
    )
    return out.withColumn("cos_sim", F.round("cos_sim", 6))


@query(
    "winsorized_values",
    oracle="""
    WITH cuts AS (
      SELECT event_type,
             quantile_cont(value, 0.05) AS lo,
             quantile_cont(value, 0.95) AS hi
      FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type,
           least(greatest(e.value, c.lo), c.hi) AS value
    FROM events e JOIN cuts c ON e.event_type = c.event_type
    """,
)
def q_winsorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group winsorization (operators/pipeline.winsorize): values
    clamped to the [p05, p95] band of their event_type — exact
    interpolated cut points (Spark `percentile` ≡ DuckDB
    `quantile_cont`, bit-identical), one aggregation + clamp."""
    from min_flink_spark.operators.pipeline import winsorize

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    return winsorize(ev, "value", ["event_type"], 0.05, 0.95)


@query(
    "heavy_hitter_terms",
    oracle=f"""
    WITH tok AS (
      SELECT unnest({SQL_TOKS}) AS term FROM documents
    )
    SELECT term, cnt, TRUE AS in_sketch FROM (
      SELECT term, CAST(count(*) AS BIGINT) AS cnt,
             row_number() OVER (ORDER BY count(*) DESC, term ASC) AS rn
      FROM tok GROUP BY term
    ) t WHERE rn <= 20
    """,
)
def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters: exact global top-20 terms (one hash-agg + top-k)
    PLUS a sketch certificate: `in_sketch` asserts each exact heavy
    hitter appears in a one-pass bounded-memory m=100-counter
    Misra-Gries superset (operators/pipeline.misra_gries_summary —
    the deterministic KPS-class sketch; every item with frequency
    > N/(m+1) ≈ 1% is guaranteed present). The rank-20 term sits at
    ~3.3% ≫ that threshold, so a FALSE can only mean the sketch path
    broke. The certificate is a LAZY broadcast left-join against the
    ≤ m-row summary (VERDICT r9 item 3: the old `freqItems(...)
    .first()` ran an eager treeAggregate job at query-CONSTRUCTION
    time — freqItems is an action, it can never sit inside the plan;
    the MG twin keeps the whole certificate declarative). At 100 TB
    the sketch runs first and the exact count runs only over its ≤ m
    candidates;
    here both run in full so the driver checks them against each
    other."""
    from min_flink_spark.operators.pipeline import misra_gries_summary

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(F.explode(tokens(F.col("text"))).alias("term"))
    exact = (
        tok.groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("term").asc())
        .limit(20)  # TakeOrderedAndProject: k-heap per partition, no global sort
    )
    # ≤ m = 100 summary rows by construction (data-independent bound),
    # so the broadcast hint never touches an SF-scaling frame
    sketch = misra_gries_summary(tok, "term", m=100).withColumnRenamed(
        "item", "term"
    )
    return exact.join(F.broadcast(sketch), "term", "left").select(
        "term", "cnt", F.col("est").isNotNull().alias("in_sketch")
    )


# HTML-wrapped corpus: deterministic synthetic markup around each doc
# (the synthetic corpus is plain text). Every 3rd doc carries a script
# block; the entity tail exercises decode order (&amp; last).
SQL_HTML_CORPUS = """
  SELECT doc_id,
         '<html><head><title>Doc ' || doc_id
         || '</title><STYLE>p { color: red; }</STYLE></head><body><h1>Heading '
         || doc_id || '</h1><p>' || text || '</p>'
         || CASE WHEN doc_id % 3 = 0
                 THEN '<script type="text/javascript">var x = ' || doc_id || ';</script>'
                 ELSE '' END
         || '<p>Fish &amp; chips &lt;b&gt; &quot;q&quot; &#39;s&nbsp;end</p></body></html>'
           AS html
  FROM documents
"""


@query(
    "html_text_extraction",
    oracle=f"""
    WITH corpus AS ({SQL_HTML_CORPUS}),
    stripped AS (
      SELECT doc_id,
             trim(regexp_replace(
               replace(replace(replace(replace(replace(replace(
                 regexp_replace(
                   regexp_replace(html,
                     '(?i)<(?:script|style)[^>]*>[\\s\\S]*?</(?:script|style)>',
                     ' ', 'g'),
                   '<[^>]*>', ' ', 'g'),
                 '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''),
                 '&nbsp;', ' '), '&amp;', '&'),
               '\\s+', ' ', 'g')) AS text
      FROM corpus
    )
    SELECT doc_id, text, CAST(length(text) AS BIGINT) AS n_chars FROM stripped
    """,
)
def q_html_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML → visible text (functions/text.strip_html): script/style
    blocks dropped with contents, tags stripped, common entities
    decoded (&amp; last so it can't re-create entities), whitespace
    collapsed — the CommonCrawl-style extraction fast path, pure
    codegen regex. The oracle replays the identical regex chain."""
    from min_flink_spark.functions.text import strip_html

    docs = load_table(spark, sf_dir, "documents")
    html = F.concat(
        F.lit("<html><head><title>Doc "),
        F.col("doc_id"),
        F.lit("</title><STYLE>p { color: red; }</STYLE></head><body><h1>Heading "),
        F.col("doc_id"),
        F.lit("</h1><p>"),
        F.col("text"),
        F.lit("</p>"),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.lit('<script type="text/javascript">var x = '),
                F.col("doc_id"),
                F.lit(";</script>"),
            ),
        ).otherwise(F.lit("")),
        F.lit("<p>Fish &amp; chips &lt;b&gt; &quot;q&quot; &#39;s&nbsp;end</p></body></html>"),
    )
    clean = strip_html(html)
    return docs.select(
        "doc_id",
        clean.alias("text"),
        F.length(clean).cast("bigint").alias("n_chars"),
    )


# URL-bearing corpus: deterministic synthetic links appended to docs
# (the synthetic corpus has no URLs of its own). Kept verbatim in both
# engines; every 4th doc gets a blocklisted host.
SQL_URL_CORPUS = """
  SELECT doc_id,
         text || ' see https://WWW.Example' || (doc_id % 10)
              || '.com/page/' || doc_id
              || CASE WHEN doc_id % 4 = 0
                      THEN ' and http://spam.bad-site.net/x?y=' || doc_id
                      ELSE '' END AS text
  FROM documents
"""


@query(
    "url_domain_filter",
    oracle=f"""
    WITH corpus AS ({SQL_URL_CORPUS}),
    extracted AS (
      SELECT doc_id,
             list_transform(
               regexp_extract_all(text,
                 'https?://(?:[^/\\s@]+@)?([a-zA-Z0-9-]+(?:\\.[a-zA-Z0-9-]+)*)', 1),
               h -> regexp_replace(lower(h), '^www\\.', '')
             ) AS domains
      FROM corpus
    ),
    flagged AS (
      SELECT doc_id,
             CAST(len(domains) AS BIGINT) AS n_urls,
             list_sort(list_distinct(domains)) AS uniq,
             len(list_filter(domains, d -> d = 'spam.bad-site.net')) > 0
               AS blocked
      FROM extracted
    )
    SELECT doc_id, n_urls, array_to_string(uniq, ',') AS domains_csv
    FROM flagged WHERE NOT blocked
    """,
)
def q_url_domain_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Web-corpus hygiene: extract+normalize URL domains (lowercase,
    strip www.), drop docs citing a blocklisted host — the standard
    domain-blocklist pass of a crawl pipeline. Pure codegen regex/array
    exprs; the domain list is serialized sorted-distinct-CSV for the
    gate (the driver's canonicalizer cannot sort list cells)."""
    from min_flink_spark.functions.text import extract_domains

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" see https://WWW.Example"), F.col("doc_id") % 10,
            F.lit(".com/page/"), F.col("doc_id"),
            F.when(
                F.col("doc_id") % 4 == 0,
                F.concat(F.lit(" and http://spam.bad-site.net/x?y="), F.col("doc_id")),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    extracted = docs.select("doc_id", extract_domains(F.col("text")).alias("domains"))
    flagged = extracted.select(
        "doc_id",
        F.size("domains").cast("bigint").alias("n_urls"),
        F.array_sort(F.array_distinct("domains")).alias("uniq"),
        F.exists("domains", lambda d: d == F.lit("spam.bad-site.net")).alias("blocked"),
    )
    return flagged.filter(~F.col("blocked")).select(
        "doc_id", "n_urls", F.concat_ws(",", "uniq").alias("domains_csv")
    )


@query(
    "vocab_oov_rate",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest({SQL_TOKS}) AS term FROM documents
    ),
    tc AS (SELECT term, count(*) AS cnt FROM tok GROUP BY 1),
    vocab AS (SELECT term FROM tc ORDER BY cnt DESC, term ASC LIMIT 500)
    SELECT t.doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS oov_tokens,
           round(CAST(sum(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*), 6) AS oov_rate
    FROM tok t LEFT JOIN vocab v USING (term)
    GROUP BY t.doc_id
    """,
)
def q_vocab_oov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-prep vocabulary construction + per-doc OOV rate: build
    the top-V corpus vocabulary (V=500, count-desc/term-asc total order
    so the cut is deterministic), then score every document's
    out-of-vocabulary token rate — the standard coverage check before
    training a tokenizer / choosing V.

    Scale: term counts are one hash-agg on ``term``; the top-V cut is
    TakeOrderedAndProject (partial top-V per partition, V rows to the
    driver plan — never a global sort).  The vocab join IS broadcast,
    and unlike the TF-IDF df table this is safe at any corpus size: the
    broadcast side is bounded at V=500 rows BY CONSTRUCTION, not by
    data statistics.  The per-doc agg shuffles on doc_id once."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
    tc = tok.groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
    vocab = (
        tc.orderBy(F.col("cnt").desc(), F.col("term").asc())
        .limit(500)
        .select("term", F.lit(True).alias("in_vocab"))
    )
    oov = F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0)).cast("bigint")
    return (
        tok.join(F.broadcast(vocab), "term", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            oov.alias("oov_tokens"),
            F.round(oov.cast("double") / F.count(F.lit(1)), 6).alias("oov_rate"),
        )
    )


@query(
    "bigram_top_pairs",
    oracle=f"""
    WITH d AS (SELECT doc_id, {SQL_TOKS} AS toks FROM documents),
    tok AS (
      SELECT doc_id, unnest(toks) AS term,
             generate_subscripts(toks, 1) AS pos
      FROM d
    ),
    bg AS (
      SELECT a.term || ' ' || b.term AS bigram
      FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
    )
    SELECT bigram, CAST(count(*) AS BIGINT) AS cnt
    FROM bg GROUP BY 1
    ORDER BY cnt DESC, bigram ASC LIMIT 20
    """,
)
def q_bigram_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram frequency table (top-20): the first step of any
    n-gram language model / contamination fingerprint.  Adjacent-pair
    construction happens INSIDE the token array via a positional
    ``transform`` lambda — purely map-side, no positional self-join and
    no shuffle until the count agg (the oracle replays it as a
    pos+1 self-join, which is the relational equivalent).  One hash-agg
    on ``bigram`` + TakeOrderedAndProject for the top-20; ties at the
    cut break on bigram text, so row membership is deterministic."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(tokens(F.col("text")).alias("toks"))
    bigrams = toks.select(
        F.explode(
            F.expr(
                "transform(slice(toks, 1, greatest(size(toks) - 1, 0)),"
                " (t, i) -> concat(t, ' ', toks[i + 1]))"
            )
        ).alias("bigram")
    )
    return (
        bigrams.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("bigram").asc())
        .limit(20)
    )


@query(
    "recency_decay_weights",
    oracle="""
    WITH anchor AS (SELECT max(ts) AS anchor FROM events),
    w AS (
      SELECT event_type,
             CAST(round(exp(-(date_diff('microsecond', ts, anchor.anchor))
                            / 2592000000000.0) * 1000000) AS BIGINT) AS wu
      FROM events CROSS JOIN anchor
    ),
    per AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(wu) AS BIGINT) AS mass_u
      FROM w GROUP BY 1
    ),
    tot AS (SELECT CAST(sum(mass_u) AS BIGINT) AS total FROM per)
    SELECT event_type, n, mass_u,
           round(CAST(mass_u AS DOUBLE) / total, 6) AS share
    FROM per CROSS JOIN tot
    """,
)
def q_recency_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-weighted corpus mixing: each record's sampling mass decays
    exponentially with age (30-day half-life-ish constant), aggregated
    per source — the freshness-weighting step of a data-mixing pipeline
    that prefers recent crawl over stale.

    Exactness: the decay weight is quantized to integer micro-units at
    the ROW level (round(exp·1e6) → bigint) so every aggregate above it
    is an exact integer sum — the only cross-engine float op is exp()
    itself, whose ulp-level engine differences are absorbed by the
    quantization except on measure-zero boundaries (same contract as
    unigram surprisal). Age rides exact integer MICROseconds: Spark's
    timestampdiff(SECOND) measures elapsed seconds while DuckDB's
    date_diff('second') counts boundary crossings, so sub-second
    timestamps disagree at whole-second granularity — at microsecond
    granularity (the storage unit) both are the exact difference. No
    timestamp-to-double casts (TIMESTAMP_NTZ-safe).

    Scale: one scalar broadcast (the 1-row anchor), one hash-agg on the
    source key, and a whole-frame window over the per-source rows for
    the grand total — the fact is scanned exactly once."""
    ev = load_table(spark, sf_dir, "events")
    anchor = ev.agg(F.max("ts").alias("anchor"))
    wu = (
        F.round(
            F.exp(
                -F.expr("timestampdiff(MICROSECOND, ts, anchor)")
                / F.lit(2592000000000.0)
            )
            * 1000000
        )
        .cast("bigint")
        .alias("wu")
    )
    w = ev.crossJoin(F.broadcast(anchor)).select("event_type", wu)
    per = w.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.sum("wu").alias("mass_u")
    )
    # the grand total rides a whole-frame window over `per` — per is one
    # row PER SOURCE (bounded small by definition), so the implied
    # single-partition exchange moves a handful of rows and the corpus
    # pipeline runs ONCE (a scalar-agg cross join would re-derive `per`
    # and re-scan the fact for the totals leg)
    total = F.sum("mass_u").over(Window.partitionBy())
    return per.select(
        "event_type",
        "n",
        "mass_u",
        F.round(F.col("mass_u").cast("double") / total, 6).alias("share"),
    )


@query(
    "char_entropy_quality",
    oracle="""
    WITH ch AS (
      SELECT doc_id, string_split(text, '') AS chars,
             length(text) AS n_chars_text
      FROM documents
    ),
    agg AS (
      SELECT doc_id, n_chars_text, len(chars) AS n,
             CAST(list_sum(list_transform(list_distinct(chars),
               c -> CAST(round(len(list_filter(chars, x -> x = c))
                         * ln(len(list_filter(chars, x -> x = c)))
                         * 1000000.0) AS BIGINT)
             )) AS BIGINT) AS inner_sum
      FROM ch
    )
    SELECT doc_id,
           CAST(n_chars_text AS BIGINT) AS n_chars_text,
           CASE WHEN n_chars_text > 0
                THEN CAST(round((ln(CAST(n AS DOUBLE))
                                 - (CAST(inner_sum AS DOUBLE) / 1000000.0)
                                   / CAST(n AS DOUBLE)) * 1000000.0) AS BIGINT)
                ELSE NULL END AS entropy_micro
    FROM agg
    """,
)
def q_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon character entropy per document in micro-nats
    (functions/text.char_entropy_micro) — the information-density
    quality filter: near-zero = repeated filler, very high = random
    blobs, prose sits in a stable band. Computed entirely WITHIN each
    row via higher-order array expressions — zero shuffle, zero Python,
    embarrassingly parallel at any corpus size; the per-character
    ``c·ln c`` terms ride as rounded micro-nat integers so the in-row
    sum is order-free exact and the DuckDB twin replays it
    bit-identically (the surprisal/money fixed-point contract)."""
    from min_flink_spark.functions.text import char_entropy_micro

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.length("text").cast("bigint").alias("n_chars_text"),
        char_entropy_micro(F.col("text")).alias("entropy_micro"),
    )


@query(
    "scd2_user_state_intervals",
    oracle="""
    WITH o AS (
      SELECT user_id, event_type, ts, event_id,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    ),
    starts AS (
      SELECT user_id, event_type, ts, event_id FROM o
      WHERE prev_type IS DISTINCT FROM event_type
    )
    SELECT user_id, event_type, ts AS valid_from,
           lead(ts) OVER (PARTITION BY user_id
                          ORDER BY ts, event_id) AS valid_to,
           lead(ts) OVER (PARTITION BY user_id
                          ORDER BY ts, event_id) IS NULL AS is_current
    FROM starts
    """,
)
def q_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-type-2 compaction of the event changelog
    (operators/pipeline.scd2_from_changelog): per user, one validity
    interval per run of identical state (event_type as the tracked
    attribute), consecutive repeats collapsed, open interval flagged
    current — the CDC-ingestion shape every warehouse feed needs.
    One shuffle (partition by user), two window passes, no self-join;
    event_id breaks timestamp ties so the compaction is deterministic
    under any partitioning."""
    from min_flink_spark.operators.pipeline import scd2_from_changelog

    ev = load_table(spark, sf_dir, "events")
    return scd2_from_changelog(
        ev, key_cols=["user_id"], attr_cols=["event_type"], ts_col="ts",
        seq_col="event_id",
    )


@query(
    "incremental_stats_merge",
    oracle="""
    SELECT source,
           CAST(count(*) AS BIGINT) AS cnt,
           CAST(sum(n_chars) AS BIGINT) AS sum_v,
           CAST(min(n_chars) AS BIGINT) AS min_v,
           CAST(max(n_chars) AS BIGINT) AS max_v
    FROM documents GROUP BY source
    """,
)
def q_incremental_stats_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental statistics maintenance
    (operators/pipeline.grouped_stats / merge_grouped_stats): per-source
    stats computed on two disjoint corpus slices (the "stored" 80% and
    the "new-batch" 20%) then MERGED — and the oracle recomputes from
    scratch over everything, so the hash proves merge(old, delta) ≡
    full recompute bit-for-bit. Integer measures make the partials
    associative-exact; this is the mergeable-partial contract that lets
    a 100 TB corpus keep stats current by scanning only each delta."""
    from min_flink_spark.operators.pipeline import grouped_stats, merge_grouped_stats

    docs = load_table(spark, sf_dir, "documents")
    v = F.col("n_chars")
    old = grouped_stats(docs.filter(F.col("doc_id") % 5 != 0), ["source"], v)
    delta = grouped_stats(docs.filter(F.col("doc_id") % 5 == 0), ["source"], v)
    return merge_grouped_stats(old, delta)


@query(
    "snapshot_diff_statuses",
    oracle="""
    WITH old AS (
      SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id % 7 != 0
    ),
    new AS (
      SELECT doc_id,
             md5(CASE WHEN doc_id % 3 = 0 THEN text || ' [rev2]' ELSE text END) AS h
      FROM documents WHERE doc_id % 5 != 0
    )
    SELECT coalesce(old.doc_id, new.doc_id) AS doc_id,
           CASE WHEN old.h IS NULL THEN 'added'
                WHEN new.h IS NULL THEN 'removed'
                WHEN old.h != new.h THEN 'changed'
                ELSE 'unchanged' END AS status
    FROM old FULL OUTER JOIN new ON old.doc_id = new.doc_id
    """,
)
def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-feed between two corpus snapshots
    (operators/pipeline.snapshot_diff): full outer join on the doc key
    comparing content md5 → added/removed/changed/unchanged per doc —
    what an incremental re-embedding or index-refresh job consumes.
    Snapshots are carved deterministically from the documents table
    (mod-7 removals, mod-5 additions-complement, mod-3 edits) so the
    oracle rebuilds both sides exactly."""
    from min_flink_spark.operators.pipeline import snapshot_diff

    docs = load_table(spark, sf_dir, "documents")
    old = docs.filter(F.col("doc_id") % 7 != 0)
    new = docs.filter(F.col("doc_id") % 5 != 0).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 3 == 0, F.concat(F.col("text"), F.lit(" [rev2]"))
        ).otherwise(F.col("text")),
    )
    return snapshot_diff(old, new, ["doc_id"], F.md5("text"))


@query(
    "cluster_sample_events",
    oracle="""
    SELECT user_id, event_id, event_type FROM events
    WHERE CAST(('0x' || substr(md5('cs:' || CAST(user_id AS VARCHAR)), 1, 8))
               AS BIGINT) % 10 < 3
    """,
)
def q_cluster_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster sampling (operators/pipeline.cluster_sample): ~30% of
    USERS keep all their events — unit-of-analysis sampling where
    row-level Bernoulli would shear a user's history apart.
    Deterministic md5 bucketing, pure scan-level filter, zero
    shuffle."""
    from min_flink_spark.operators.pipeline import cluster_sample

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type"
    )
    return cluster_sample(ev, "user_id", buckets=10, keep=3)


@query(
    "incremental_hll_merge",
    oracle="""
    SELECT source,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_exact,
           TRUE AS est_ok
    FROM documents GROUP BY source
    """,
)
def q_incremental_hll_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-SKETCH maintenance — the approximate twin of
    incremental_stats_merge: per-source HLL sketches built on two
    disjoint corpus slices are UNIONED (hll_union_agg) and the merged
    estimate is certified against the exact distinct count
    (|est − exact| ≤ 8% or 2 absolute — ≈ 5σ of the lgk=12
    DataSketches RSE of 1.04/√4096 ≈ 1.63%; r12 NOTE: the original 2%
    bound was only ~1.25σ and a routine excursion tripped it at sf1 —
    src10 estimated 2449/2500 = 2.04% off with a bit-identical
    one-shot estimate, i.e. the merge was perfect and the BOUND was
    statistically wrong). The driver-visible output carries the EXACT
    count plus the boolean certificate, so a broken merge (e.g.
    register truncation, zeroing — shifts estimates tens of percent)
    flips a hashed value while the estimate's inherent wobble cannot.
    At 100 TB this is how distinct counts stay current per delta:
    sketches are tiny, associative, and never rescan the corpus."""
    docs = load_table(spark, sf_dir, "documents")
    old = docs.filter(F.col("doc_id") % 5 != 0).groupBy("source").agg(
        F.hll_sketch_agg("doc_id").alias("sk"),
        F.count_distinct("doc_id").alias("nd"),
    )
    delta = docs.filter(F.col("doc_id") % 5 == 0).groupBy("source").agg(
        F.hll_sketch_agg("doc_id").alias("sk"),
        F.count_distinct("doc_id").alias("nd"),
    )
    merged = (
        old.unionByName(delta)
        .groupBy("source")
        .agg(
            F.hll_union_agg("sk").alias("sk"),
            F.sum("nd").alias("n_exact"),  # slices are disjoint on doc_id
        )
    )
    est = F.hll_sketch_estimate("sk")
    return merged.select(
        "source",
        F.col("n_exact").cast("bigint").alias("n_exact"),
        (
            F.abs(est - F.col("n_exact"))
            <= F.greatest(F.lit(2.0), F.col("n_exact") * 0.08)
        ).alias("est_ok"),
    )


@query(
    "k_anonymity_report",
    oracle="""
    SELECT event_type,
           CAST(extract(hour FROM ts) AS BIGINT) AS hour_of_day,
           CAST(count(*) AS BIGINT) AS group_size,
           count(*) < 20 AS violates_k
    FROM events GROUP BY 1, 2
    """,
)
def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over a quasi-identifier tuple (event type ×
    hour of day): every equivalence class is sized and classes below
    k=20 are flagged — the release gate a privacy review runs before
    sharing event-level data. One hash aggregation; at 100 TB the
    same plan, map-side combinable."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        "event_type",
        F.hour("ts").cast("bigint").alias("hour_of_day"),
    ).agg(
        F.count(F.lit(1)).alias("group_size"),
        (F.count(F.lit(1)) < 20).alias("violates_k"),
    )


@query(
    "dp_noisy_counts",
    oracle="""
    WITH c AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1
    ),
    u AS (
      SELECT event_type, n,
             (CAST(('0x' || substr(md5('dp:' || event_type), 1, 8)) AS BIGINT)
              + 0.5) / 4294967296.0 AS uni
      FROM c
    )
    SELECT event_type, n,
           n + CAST(round(
                 -2.0 * (CASE WHEN uni < 0.5 THEN -1.0 ELSE 1.0 END)
                      * round(ln(1.0 - 2.0 * abs(uni - 0.5)) * 1000000.0)
                      / 1000000.0
               ) AS BIGINT) AS noisy_n
    FROM u
    """,
)
def q_dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differential-privacy release mechanism shape: per-group counts
    plus integer-rounded Laplace noise (scale b=2 ⇒ ε=0.5 for a
    count's sensitivity of 1) via inverse-CDF sampling. The uniform is
    md5-derived FOR THE GATE (deterministic, engine-replayable — a
    production release swaps in a CSPRNG; the mechanism, sensitivity
    accounting, and rounding pipeline are what this pins). ln() rides
    the micro-rounding contract so both engines compute the identical
    noise integer."""
    from min_flink_spark.functions.hashing import md5_prefix_int

    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    uni = (
        md5_prefix_int(F.concat(F.lit("dp:"), F.col("event_type"))) + 0.5
    ) / F.lit(4294967296.0)
    lap = (
        F.lit(-2.0)
        * F.when(uni < 0.5, F.lit(-1.0)).otherwise(F.lit(1.0))
        * F.round(F.log(1.0 - 2.0 * F.abs(uni - 0.5)) * 1000000.0)
        / 1000000.0
    )
    return c.select(
        "event_type",
        "n",
        (F.col("n") + F.round(lap).cast("bigint")).alias("noisy_n"),
    )


@query(
    "group_aware_split",
    oracle="""
    WITH assign AS (
      SELECT source,
             CASE WHEN CAST(('0x' || substr(md5('gs:' || source), 1, 8))
                       AS BIGINT) % 10 < 8 THEN 'train'
                  WHEN CAST(('0x' || substr(md5('gs:' || source), 1, 8))
                       AS BIGINT) % 10 < 9 THEN 'val'
                  ELSE 'test' END AS split
      FROM (SELECT DISTINCT source FROM documents)
    )
    SELECT a.split,
           CAST(count(DISTINCT d.source) AS BIGINT) AS n_sources,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(d.n_chars) AS BIGINT) AS n_chars
    FROM documents d JOIN assign a ON d.source = a.source
    GROUP BY a.split
    """,
)
def q_group_aware_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP-aware train/val/test split: the md5 bucket is computed on
    the SOURCE, so every document of a source lands in one split —
    the leakage-safe assignment when correlated documents share a
    provenance (doc-level splitting, train_val_test_split, would put
    near-identical siblings on both sides of the boundary).
    Assignment is a distinct-sources projection joined back on the
    group key; deterministic, resumable, engine-replayable."""
    from min_flink_spark.functions.hashing import md5_prefix_int

    docs = load_table(spark, sf_dir, "documents")
    b = F.pmod(
        md5_prefix_int(F.concat(F.lit("gs:"), F.col("source"))), F.lit(10)
    )
    assign = docs.select("source").distinct().select(
        "source",
        F.when(b < 8, "train").when(b < 9, "val").otherwise("test").alias("split"),
    )
    return (
        docs.join(assign, "source")
        .groupBy("split")
        .agg(
            F.count_distinct("source").alias("n_sources"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("n_chars"),
        )
    )


@query(
    "bigram_lm_surprisal",
    oracle=f"""
    WITH d AS (SELECT doc_id, {SQL_TOKS} AS toks FROM documents),
    tok AS (
      SELECT doc_id, unnest(toks) AS term,
             generate_subscripts(toks, 1) AS pos
      FROM d
    ),
    bg AS (
      SELECT a.doc_id, a.term AS w1, b.term AS w2
      FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
    ),
    bc AS (
      SELECT w1, w2, CAST(count(*) AS BIGINT) AS c FROM bg GROUP BY 1, 2
    ),
    lc AS (SELECT w1, CAST(sum(c) AS BIGINT) AS lt FROM bc GROUP BY w1),
    scored AS (
      SELECT bg.doc_id,
             CAST(round(-ln(CAST(bc.c AS DOUBLE) / lc.lt) * 1000000)
                  AS BIGINT) AS su
      FROM bg
      JOIN bc ON bg.w1 = bc.w1 AND bg.w2 = bc.w2
      JOIN lc ON bg.w1 = lc.w1
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           CAST(sum(su) AS DOUBLE) / 1000000.0 / count(*) AS avg_surprisal
    FROM scored GROUP BY doc_id
    """,
)
def q_bigram_lm_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model surprisal per document — the conditional
    (context-aware) upgrade of unigram_surprisal_score:
    s(w₂|w₁) = −ln(c(w₁w₂)/c(w₁·)) with the left-context total as the
    normalizer, so per-context probabilities sum to 1. Bigrams build
    inside the token array (positional transform, no self-join); the
    model tables (bigram + left-context counts) come from two hash-aggs
    and join back on the bigram key. Per-pair surprisals ride the
    micro-int contract → per-doc sums exact, one final division."""
    from min_flink_spark.functions.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    bg = docs.select("doc_id", tokens(F.col("text")).alias("toks")).select(
        "doc_id",
        F.explode(
            F.expr(
                "CASE WHEN size(toks) > 1 THEN "
                "transform(sequence(1, size(toks) - 1), "
                "          i -> struct(element_at(toks, i) AS w1, "
                "                      element_at(toks, i + 1) AS w2)) "
                "ELSE array() END"
            )
        ).alias("p"),
    ).select("doc_id", "p.w1", "p.w2")
    bc = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c"))
    lc = bc.groupBy("w1").agg(F.sum("c").alias("lt"))
    su = F.round(
        -F.log(F.col("c").cast("double") / F.col("lt")) * 1000000
    ).cast("bigint")
    scored = bg.join(bc, ["w1", "w2"]).join(lc, "w1").select("doc_id", su.alias("su"))
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        (
            F.sum("su").cast("double") / 1000000.0 / F.count(F.lit(1))
        ).alias("avg_surprisal"),
    )


@query(
    "compaction_plan_bins",
    oracle="""
    WITH files AS (
      SELECT date_trunc('day', ts) AS dt,
             CAST(event_id % 64 AS BIGINT) AS file_id,
             CAST(sum(length(props)) + 100 * count(*) AS BIGINT) AS size_bytes
      FROM events GROUP BY 1, 2
    ),
    binned AS (
      SELECT dt, file_id, size_bytes,
             CAST(floor(COALESCE(sum(size_bytes) OVER (
                    PARTITION BY dt
                    ORDER BY size_bytes DESC, file_id ASC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                  ), 0) / 4000.0) AS INTEGER) AS bin_id
      FROM files
    )
    SELECT dt, bin_id,
           CAST(count(*) AS BIGINT) AS n_files,
           CAST(sum(size_bytes) AS BIGINT) AS bin_bytes,
           CAST(max(size_bytes) AS BIGINT) AS largest_file
    FROM binned GROUP BY 1, 2
    """,
)
def q_compaction_plan_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table-maintenance compaction planning
    (operators/pipeline.py:compaction_plan): a deterministic file
    inventory is derived from events — one "file" per (day,
    event_id % 64) with a realistic byte size — and packed into
    ~4000-byte output bins per day via the sequential-fill
    first-fit-decreasing rule (one PARTITIONED window over metadata
    rows, no global sort). The gate row carries per-bin file counts,
    byte totals, and the largest member, which pins the sort order,
    the exclusive prefix sum, and the floor-division boundary exactly;
    the oracle replays the identical plan in SQL."""
    from min_flink_spark.operators.pipeline import compaction_plan

    ev = load_table(spark, sf_dir, "events")
    files = ev.groupBy(
        F.date_trunc("day", "ts").alias("dt"),
        (F.col("event_id") % 64).cast("bigint").alias("file_id"),
    ).agg(
        (F.sum(F.length("props")) + 100 * F.count(F.lit(1)))
        .cast("bigint")
        .alias("size_bytes")
    )
    planned = compaction_plan(
        files, target_bytes=4000, partition_cols=["dt"]
    )
    return planned.groupBy("dt", "bin_id").agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum("size_bytes").cast("bigint").alias("bin_bytes"),
        F.max("size_bytes").cast("bigint").alias("largest_file"),
    )


# ONE ground truth for the bottom-k family: the batch-merge query and
# the streaming-state twin (queries/streaming_q.py) must stay
# bit-identical — both decorators reference THIS constant (the same
# one-operator-three-modes-one-oracle discipline as
# SKETCH_QUANTILES_ORACLE).
KMV_DISTINCT_ORACLE = """
    WITH d AS (SELECT DISTINCT event_type, user_id FROM events),
    h AS (
      SELECT event_type, user_id,
             CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT)
               AS hash
      FROM d
    ),
    r AS (
      SELECT event_type, hash, user_id,
             row_number() OVER (
               PARTITION BY event_type ORDER BY hash, user_id) AS pos
      FROM h
    ),
    s AS (SELECT event_type, pos, hash, user_id AS id FROM r WHERE pos <= 8),
    e AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             max(hash) AS hk
      FROM s GROUP BY 1
    )
    SELECT s.event_type, CAST(s.pos AS INT) AS pos, s.hash,
           CAST(s.id AS BIGINT) AS id,
           CASE WHEN e.n < 8 OR e.hk <= 0 THEN e.n
                ELSE CAST(7 * 4294967296 // e.hk AS BIGINT) END AS distinct_est
    FROM s JOIN e USING (event_type)
    """


@query("kmv_distinct_users", oracle=KMV_DISTINCT_ORACLE)
def q_kmv_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bottom-k (KMV) sketch under the gate (operators/pipeline.
    bottom_k_sketch): per event type, the 8 smallest md5 hashes of the
    distinct user ids — at once a deterministic uniform user sample and
    the KMV distinct-count estimator, built here from TWO day-parity
    shard sketches merged by union+dedup+re-rank. The oracle computes
    the sketch DIRECTLY from all rows, so the gate row proves the
    order-statistic closure bottom-k(A∪B) ≡ merge(bottom-k(A),
    bottom-k(B)) bit-for-bit, including an id active in both shards
    counting once. Estimate arithmetic is exact-integer
    ((k−1)·2³² div h_k; exact count below k). Per-key state is k rows
    at any data size; the per-shard top-k rides WindowGroupLimit."""
    from min_flink_spark.operators.pipeline import (
        bottom_k_sketch,
        kmv_distinct_estimate,
        merge_bottom_k,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        "user_id",
        (F.dayofmonth(F.col("ts").cast("timestamp")) % 2).alias("_shard"),
    )
    parts = [
        bottom_k_sketch(
            ev.filter(F.col("_shard") == s), ["event_type"], "user_id", k=8
        )
        for s in (0, 1)
    ]
    merged = merge_bottom_k(parts, ["event_type"], k=8)
    est = kmv_distinct_estimate(merged, ["event_type"], k=8)
    return merged.join(est, "event_type").select(
        "event_type",
        F.col("pos").cast("int").alias("pos"),
        "hash",
        F.col("id").cast("bigint").alias("id"),
        "distinct_est",
    )


@query(
    "kmv_segment_overlap",
    oracle="""
    WITH d AS (SELECT DISTINCT event_type, user_id FROM events),
    h AS (
      SELECT event_type, user_id,
             CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT)
               AS hash
      FROM d
    ),
    r AS (
      SELECT event_type, hash, user_id,
             row_number() OVER (
               PARTITION BY event_type ORDER BY hash, user_id) AS pos
      FROM h
    ),
    s AS (SELECT event_type, hash, user_id AS id FROM r WHERE pos <= 16),
    segs AS (SELECT DISTINCT event_type FROM s),
    pairs AS (
      SELECT a.event_type AS key_a, b.event_type AS key_b
      FROM segs a JOIN segs b ON a.event_type < b.event_type
    ),
    members AS (
      SELECT p.key_a, p.key_b, s.hash, s.id, count(*) AS sides
      FROM pairs p
      JOIN s ON s.event_type = p.key_a OR s.event_type = p.key_b
      GROUP BY 1, 2, 3, 4
    ),
    topu AS (
      SELECT *, row_number() OVER (
        PARTITION BY key_a, key_b ORDER BY hash, id) AS upos
      FROM members
    ),
    agg AS (
      SELECT key_a, key_b,
             CAST(count(*) AS BIGINT) AS k_eff,
             CAST(sum(CASE WHEN sides = 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_inter
      FROM topu WHERE upos <= 16 GROUP BY 1, 2
    )
    SELECT key_a, key_b, k_eff, n_inter,
           CAST(100 * n_inter // k_eff AS BIGINT) AS jaccard_pct
    FROM agg
    """,
)
def q_kmv_segment_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV set operations (operators/pipeline.kmv_pair_overlap):
    pairwise audience overlap between event-type segments computed from
    their bottom-16 sketches ALONE — the k smallest hashes of two
    sketches' union are exactly bottom-k of the segment union (closure),
    and the fraction present in both sketches estimates Jaccard. At
    100 TB the data is scanned once to sketch; every pair comparison is
    sketch-sized (segments² × k rows), so adding a segment never
    rescans the corpus. All arithmetic integer-exact; the oracle
    replays sketch, union, and estimator verbatim."""
    from min_flink_spark.operators.pipeline import (
        bottom_k_sketch,
        kmv_pair_overlap,
    )

    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    sk = bottom_k_sketch(ev, ["event_type"], "user_id", k=16)
    return kmv_pair_overlap(sk, "event_type", k=16)


# ONE ground truth for the count-min family: the batch-merge query and
# the streaming-state twin (queries/streaming_q.py) must stay
# bit-identical — both decorators reference THIS constant (the
# one-operator-three-modes-one-oracle discipline of the sketch trio).
CMS_TERMS_ORACLE = f"""
    WITH tok AS (
      SELECT unnest({SQL_TOKS}) AS term FROM documents
    ),
    exact AS (
      SELECT term, CAST(count(*) AS BIGINT) AS exact_cnt,
             row_number() OVER (ORDER BY count(*) DESC, term ASC) AS rn
      FROM tok GROUP BY term
    ),
    top AS (SELECT term, exact_cnt FROM exact WHERE rn <= 10),
    dd AS (SELECT unnest([0, 1, 2, 3]) AS d),
    cells AS (
      SELECT d,
             CAST(('0x' || substr(md5(term || ':' || CAST(d AS VARCHAR)), 1, 8))
                  AS BIGINT) % 128 AS w,
             CAST(count(*) AS BIGINT) AS cnt
      FROM tok, dd GROUP BY 1, 2
    ),
    probes AS (
      SELECT t.term, t.exact_cnt, dd.d,
             CAST(('0x' || substr(md5(t.term || ':' || CAST(dd.d AS VARCHAR)), 1, 8))
                  AS BIGINT) % 128 AS w
      FROM top t, dd
    )
    SELECT p.term, p.exact_cnt,
           CAST(min(coalesce(c.cnt, 0)) AS BIGINT) AS cms_est
    FROM probes p LEFT JOIN cells c USING (d, w)
    GROUP BY 1, 2
    """


@query("cms_term_frequencies", oracle=CMS_TERMS_ORACLE)
def q_cms_term_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch under the gate (operators/pipeline.
    count_min_sketch): per-token frequency estimates from a 4×128
    counter grid built from TWO doc-id-parity shard sketches merged by
    counter addition — the third leg of the sketch trio (quantiles →
    log₂-histogram, distinct → KMV, frequencies → CMS). The probe set
    is the exact top-10 tokens (count desc, term asc — deterministic),
    and the oracle replays shard split, hashing, merge, and
    min-over-rows estimate verbatim, so the gate row proves
    merge(cms(A), cms(B)) ≡ cms(A ∪ B) bit-for-bit AND that every
    estimate carries CMS's never-undercount guarantee against the
    exact count computed alongside. At 100 TB: one token scan into a
    map-side-combined 4×128-row grid per shard; estimates touch only
    grid-sized frames."""
    from min_flink_spark.functions.text import tokens
    from min_flink_spark.operators.pipeline import (
        cms_estimate,
        count_min_sketch,
        merge_cms,
    )

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        (F.col("doc_id") % 2).alias("_shard"),
        F.explode(tokens(F.col("text"))).alias("term"),
    )
    # ONE scan builds both per-shard partials (shard rides as a sketch
    # key); the shard split for the merge happens on the GRID-sized
    # frame — in production each day's partial is its own stored table
    partials = count_min_sketch(tok, "term", keys=["_shard"])
    merged = merge_cms(
        *[partials.filter(F.col("_shard") == s).drop("_shard") for s in (0, 1)]
    )
    top = (
        tok.groupBy("term")
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
        .orderBy(F.col("exact_cnt").desc(), F.col("term").asc())
        .limit(10)
    )
    est = cms_estimate(merged, top.select("term"), "term")
    return top.join(est, "term").select("term", "exact_cnt", "cms_est")


@query(
    "kmv_rollup_distinct",
    oracle="""
    WITH d AS (SELECT DISTINCT event_type, user_id FROM events),
    h AS (
      SELECT event_type, user_id,
             CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT)
               AS hash
      FROM d
    ),
    r AS (
      SELECT event_type, hash, user_id,
             row_number() OVER (
               PARTITION BY event_type ORDER BY hash, user_id) AS pos
      FROM h
    ),
    s AS (SELECT event_type, hash, user_id AS id FROM r WHERE pos <= 12),
    -- grand-total sketch = bottom-k of the UNION of the per-type
    -- sketches' survivors (closure; duplicates collapse on (hash,id))
    u AS (SELECT DISTINCT hash, id FROM s),
    ur AS (
      SELECT hash, id, row_number() OVER (ORDER BY hash, id) AS pos FROM u
    ),
    us AS (SELECT hash, id FROM ur WHERE pos <= 12),
    per_type AS (
      SELECT event_type AS level_key, CAST(count(*) AS BIGINT) AS n,
             max(hash) AS hk
      FROM s GROUP BY 1
    ),
    total AS (
      SELECT '__ALL__' AS level_key, CAST(count(*) AS BIGINT) AS n,
             max(hash) AS hk
      FROM us
    ),
    lv AS (SELECT * FROM per_type UNION ALL SELECT * FROM total)
    SELECT level_key,
           CASE WHEN n < 12 OR hk <= 0 THEN n
                ELSE CAST(11 * 4294967296 // hk AS BIGINT) END AS distinct_est
    FROM lv
    """,
)
def q_kmv_rollup_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch ROLLUP along a key hierarchy (operators/pipeline.
    merge_bottom_k reused as the rollup combinator): per-event-type
    bottom-12 KMV sketches answer the per-type distinct-user question,
    and the GRAND-TOTAL distinct users comes from merging those same
    sketches — the data is scanned ONCE, the coarser granularity is
    derived from sketch-sized frames (the cube-over-sketches pattern:
    at 100 TB you keep per-partition/per-day sketches and roll up any
    grouping set without rescanning history). A user active in several
    event types carries the same hash everywhere and counts once in
    the total (closure dedup). Output: (level_key, distinct_est) with
    '__ALL__' as the total row; the oracle replays both levels
    verbatim, integer-exact."""
    from min_flink_spark.operators.pipeline import (
        bottom_k_sketch,
        kmv_distinct_estimate,
        merge_bottom_k,
    )

    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    per_type = bottom_k_sketch(ev, ["event_type"], "user_id", k=12)
    fine = kmv_distinct_estimate(per_type, ["event_type"], k=12).select(
        F.col("event_type").alias("level_key"), "distinct_est"
    )
    # rollup: merge the per-type sketches into one total sketch —
    # sketch-sized input, no second scan of events
    total_sketch = merge_bottom_k(
        # drop the fine key first: a user active in several event types
        # must collapse on (hash, id) in the union (closure dedup)
        [
            per_type.select(
                F.lit("__ALL__").alias("_all"), "pos", "hash", "id"
            )
        ],
        ["_all"],
        k=12,
    )
    coarse = kmv_distinct_estimate(total_sketch, ["_all"], k=12).select(
        F.col("_all").alias("level_key"), "distinct_est"
    )
    return fine.unionByName(coarse)


# ONE ground truth for the Misra-Gries family: the batch query and the
# streaming-state twin (queries/streaming_q.py) certify against the
# SAME top-10/containment/bound spec — both decorators reference THIS
# constant (the one-operator-three-modes-one-oracle discipline).
MG_HH_ORACLE = f"""
    WITH tok AS (
      SELECT unnest({SQL_TOKS}) AS term FROM documents
    ),
    exact AS (
      SELECT term, CAST(count(*) AS BIGINT) AS exact_cnt,
             row_number() OVER (ORDER BY count(*) DESC, term ASC) AS rn
      FROM tok GROUP BY term
    )
    SELECT term, exact_cnt, TRUE AS in_summary, TRUE AS within_bound
    FROM exact WHERE rn <= 10
    """


@query("mg_heavy_hitters", oracle=MG_HH_ORACLE)
def q_mg_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Misra-Gries / SpaceSaving heavy hitters under the gate
    (operators/pipeline.misra_gries_summary, m=256): the DETERMINISTIC
    bounded-memory top-k — m counters per partition in one mapInPandas
    pass, summary-sized merge, data scanned once and never shuffled.
    Certificates (the summary's exact membership depends on partition
    run order; the GUARANTEES do not): every exact-top-10 token must
    appear in the summary (containment holds because rank-10 frequency
    ≫ N/m = 0.4% here — the same margin argument as
    heavy_hitter_terms' KPS sketch), and each estimate must satisfy
    true − N/m ≤ est ≤ true (the mergeable-summaries accounting:
    every undercount unit retires m+1 count units, only N exist). A
    FALSE in either boolean is a real counter/merge defect."""
    from min_flink_spark.operators.pipeline import misra_gries_summary

    m = 256
    tok = doc_tokens(spark, sf_dir)
    summary = misra_gries_summary(tok, "term", m=m)
    return mg_certificate(tok, summary, m)


def doc_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MG family's token stream (shared by the batch and streaming
    gate queries so both certify against the same population)."""
    from min_flink_spark.functions.text import tokens as _toks

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(F.explode(_toks(F.col("text"))).alias("term"))


def mg_certificate(tok: DataFrame, summary: DataFrame, m: int) -> DataFrame:
    """The ONE copy of the MG containment/bound certificate both gate
    queries emit against MG_HH_ORACLE: exact top-10 tokens left-joined
    to the summary, with in_summary (containment above N/m) and
    within_bound (true − N/m ≤ est ≤ true) booleans. A fork of this
    block on the streaming path could drift from the shared oracle
    (same discipline as bloom_effectiveness_certificate)."""
    counts = tok.groupBy("term").agg(F.count(F.lit(1)).alias("exact_cnt"))
    top = counts.orderBy(
        F.col("exact_cnt").desc(), F.col("term").asc()
    ).limit(10)
    # N for the bound comes from the VOCAB-sized counts frame (its
    # exchange is reused by the top-10 cut) — not a third token scan.
    # It rides the plan as a 1-row cross-joined scalar (VERDICT r8
    # item 5: no eager job at query-construction time); the double
    # division n/m is the IEEE value the old driver-side literal had.
    n_total = counts.agg(F.sum("exact_cnt").alias("_n"))
    checked = top.join(
        summary.withColumnRenamed("item", "term"), "term", "left"
    ).join(n_total, how="cross")
    return checked.select(
        "term",
        "exact_cnt",
        F.col("est").isNotNull().alias("in_summary"),
        (
            F.col("est").isNotNull()
            & (F.col("est") <= F.col("exact_cnt"))
            & (F.col("est") >= F.col("exact_cnt") - F.col("_n") / F.lit(m))
        ).alias("within_bound"),
    )


# ONE ground truth for the bitmap family: the batch build and the
# streaming-state build (queries/streaming_q.py) emit the same pair
# table — both decorators reference THIS constant.
BITMAP_SEGMENT_ORACLE = """
    WITH d AS (SELECT DISTINCT event_type, user_id FROM events),
    card AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY 1
    ),
    inter AS (
      SELECT a.event_type AS key_a, b.event_type AS key_b,
             CAST(count(*) AS BIGINT) AS n_inter
      FROM d a JOIN d b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2
    )
    SELECT ca.event_type AS key_a, cb.event_type AS key_b,
           ca.n AS n_a, cb.n AS n_b,
           coalesce(i.n_inter, 0) AS n_inter,
           ca.n + cb.n - coalesce(i.n_inter, 0) AS n_union
    FROM card ca
    JOIN card cb ON ca.event_type < cb.event_type
    LEFT JOIN inter i
      ON i.key_a = ca.event_type AND i.key_b = cb.event_type
    """


@query("bitmap_segment_ops", oracle=BITMAP_SEGMENT_ORACLE)
def q_bitmap_segment_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT segment set algebra via chunked bitmap indexes
    (operators/bitmap.py) — the audience-engine counterpart to the KMV
    sketches: per event type, user membership packs into 64-id BIGINT
    words (one bit_or hash-agg over ONE scan, shard riding as an index
    key; the two day-parity partials merge by word-wise OR), and every
    pairwise |A|, |B|, |A∩B|, |A∪B| comes from popcounts over a
    chunk-frame equi-join on the word id — billion-member segments
    intersect without any row-level member join, and the answers are
    EXACT. The oracle recomputes all four numbers directly from raw
    rows (structure-independent), so a packing/merge/popcount defect
    on any word flips the hash."""
    from min_flink_spark.operators.bitmap import (
        bitmap_index,
        bitmap_pair_ops,
        merge_bitmap_indexes,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        "user_id",
        (F.dayofmonth(F.col("ts").cast("timestamp")) % 2).alias("_shard"),
    )
    # ONE scan builds both shard partials — shard rides as a SECOND
    # index key next to the segment (same discipline as the CMS/KMV
    # twins); the shard split for the merge happens on the index-sized
    # frame
    partials = bitmap_index(
        ev.withColumn("_key", F.struct("event_type", "_shard")), "_key", "user_id"
    ).select(F.col("_key.event_type").alias("event_type"),
             F.col("_key._shard").alias("_shard"), "word", "mask")
    merged = merge_bitmap_indexes(
        *[partials.filter(F.col("_shard") == s).drop("_shard") for s in (0, 1)]
    )
    return bitmap_pair_ops(merged, "event_type")


# ONE ground truth for the windowed-KMV shape: the batch range-merge
# query and the streaming-state twin (queries/streaming_q.py) emit the
# same per-day estimate table — both decorators reference THIS constant.
KMV_WINDOWED_ORACLE = """
    WITH d AS (
      SELECT DISTINCT time_bucket(INTERVAL '1 day', ts) AS day, user_id
      FROM events
    ),
    h AS (
      SELECT day, user_id,
             CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT)
               AS hash
      FROM d
    ),
    r AS (
      SELECT day, hash, user_id,
             row_number() OVER (PARTITION BY day ORDER BY hash, user_id) AS pos
      FROM h
    ),
    s AS (SELECT day, hash, user_id AS id FROM r WHERE pos <= 16),
    e AS (
      SELECT day, CAST(count(*) AS BIGINT) AS n, max(hash) AS hk
      FROM s GROUP BY 1
    )
    SELECT day AS window_start,
           CASE WHEN n < 16 OR hk <= 0 THEN n
                ELSE CAST(15 * 4294967296 // hk AS BIGINT) END AS distinct_est
    FROM e
    """


@query("kmv_windowed_distinct", oracle=KMV_WINDOWED_ORACLE)
def q_kmv_windowed_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series distinct counting — sketches × event-time windows:
    per 1-day tumbling window, the KMV distinct-user estimate from a
    bottom-16 sketch keyed by the window start. THE production shape
    for 'daily uniques' at 100 TB: each day's sketch is built from that
    day's partition alone (one WindowGroupLimit pass, per-window state
    k rows), stored, and any date-range rollup later merges the stored
    sketches (closure — see kmv_rollup_distinct) instead of rescanning
    history; an exact daily count_distinct would rescan every day it
    ever reports on. Oracle replays window bucketing, hashing, and the
    estimator verbatim, integer-exact."""
    from min_flink_spark.operators.pipeline import (
        bottom_k_sketch,
        kmv_distinct_estimate,
    )

    ev = load_table(spark, sf_dir, "events").select(
        F.window("ts", "1 day").getField("start").alias("window_start"),
        "user_id",
    )
    sk = bottom_k_sketch(ev, ["window_start"], "user_id", k=16)
    return kmv_distinct_estimate(sk, ["window_start"], k=16)


# ONE ground truth for the KEYED × windowed KMV shape: the batch
# range-merge query below and the streaming-state twin
# (queries/streaming_q.py: streaming_kmv_keyed_windowed_distinct) emit
# the same per-event-type sketch + estimate table — both decorators
# reference THIS constant (the same shared-oracle discipline as
# KMV_WINDOWED_ORACLE / CMS_WINDOWED_ORACLE).
KMV_KEYED_WINDOWED_ORACLE = """
    WITH d AS (
      SELECT DISTINCT event_type, user_id FROM events
      WHERE time_bucket(INTERVAL '1 day', ts) >= TIMESTAMP '2024-01-08'
        AND time_bucket(INTERVAL '1 day', ts) < TIMESTAMP '2024-01-15'
    ),
    h AS (
      SELECT event_type, user_id,
             CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT)
               AS hash
      FROM d
    ),
    r AS (
      SELECT event_type, hash, user_id,
             row_number() OVER (
               PARTITION BY event_type ORDER BY hash, user_id) AS pos
      FROM h
    ),
    s AS (SELECT event_type, pos, hash, user_id AS id FROM r WHERE pos <= 16),
    e AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n, max(hash) AS hk
      FROM s GROUP BY 1
    )
    SELECT s.event_type, CAST(s.pos AS INT) AS pos, s.hash,
           CAST(s.id AS BIGINT) AS id,
           CASE WHEN e.n < 16 OR e.hk <= 0 THEN e.n
                ELSE CAST(15 * 4294967296 // e.hk AS BIGINT) END AS distinct_est
    FROM s JOIN e USING (event_type)
    """


@query("kmv_keyed_windowed_distinct", oracle=KMV_KEYED_WINDOWED_ORACLE)
def q_kmv_keyed_windowed_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KEYED × windowed KMV (VERDICT r9 item 6 — the keyed axis
    composed with the windowed axis, completing the bottom-k row of
    the mode matrix): per (1-day tumbling window, event_type) a
    bottom-16 sketch is built from that day's partition alone and
    STORED — per-segment daily-unique sketches, the per-key twin of
    kmv_windowed_distinct — and a Jan 8-14 range query answers
    per-event-type distinct-user estimates by MERGING the stored
    sketches over the retained key (union + closure-dedup on
    (hash, id) + re-rank, rows examined = days × keys × k, never a
    rescan of history). The oracle sketches the range's raw rows
    DIRECTLY, so the gate row proves the keyed closure
    bottom-k(range) ≡ merge(per-day sketches) bit-for-bit — including
    a user active for one event type on several days counting once.
    Per-(window, key) state is k rows at any data size; the per-day
    top-k rides WindowGroupLimit."""
    from min_flink_spark.operators.pipeline import (
        bottom_k_sketch,
        kmv_distinct_estimate,
        merge_bottom_k,
    )

    lo = F.lit("2024-01-08").cast("timestamp_ntz")
    hi = F.lit("2024-01-15").cast("timestamp_ntz")
    ev = load_table(spark, sf_dir, "events").select(
        F.window("ts", "1 day").getField("start").alias("day"),
        "event_type",
        "user_id",
    )
    # the stored per-(day, key) partials (scan-once artifact)
    daily = bottom_k_sketch(ev, ["day", "event_type"], "user_id", k=16)
    # range query: drop the day, merge the survivors per key —
    # sketch-sized, the raw rows are never rescanned
    rng = daily.filter((F.col("day") >= lo) & (F.col("day") < hi)).drop("day")
    merged = merge_bottom_k([rng], ["event_type"], k=16)
    est = kmv_distinct_estimate(merged, ["event_type"], k=16)
    return merged.join(est, "event_type").select(
        "event_type",
        F.col("pos").cast("int").alias("pos"),
        "hash",
        F.col("id").cast("bigint").alias("id"),
        "distinct_est",
    )


# ONE ground truth for the windowed-CMS shape: the batch range-merge
# query and the streaming-state twin (queries/streaming_q.py) emit the
# same estimate table — both decorators reference THIS constant (the
# same discipline as KMV_WINDOWED_ORACLE).
CMS_WINDOWED_ORACLE = """
    WITH e AS (
      SELECT event_type FROM events
      WHERE time_bucket(INTERVAL '1 day', ts) >= TIMESTAMP '2024-01-08'
        AND time_bucket(INTERVAL '1 day', ts) < TIMESTAMP '2024-01-15'
    ),
    types AS (SELECT DISTINCT event_type FROM events),
    dd AS (SELECT unnest([0, 1, 2, 3]) AS d),
    cells AS (
      SELECT d,
             CAST(('0x' || substr(md5(event_type || ':' || CAST(d AS VARCHAR)), 1, 8))
                  AS BIGINT) % 128 AS w,
             CAST(count(*) AS BIGINT) AS cnt
      FROM e, dd GROUP BY 1, 2
    ),
    exact AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS exact_cnt
      FROM e GROUP BY 1
    ),
    probes AS (
      SELECT t.event_type,
             coalesce(x.exact_cnt, CAST(0 AS BIGINT)) AS exact_cnt,
             dd.d,
             CAST(('0x' || substr(md5(t.event_type || ':' || CAST(dd.d AS VARCHAR)), 1, 8))
                  AS BIGINT) % 128 AS w
      FROM types t LEFT JOIN exact x USING (event_type), dd
    )
    SELECT p.event_type, p.exact_cnt,
           CAST(min(coalesce(c.cnt, 0)) AS BIGINT) AS cms_est
    FROM probes p LEFT JOIN cells c USING (d, w)
    GROUP BY 1, 2
    """


@query("cms_windowed_counts", oracle=CMS_WINDOWED_ORACLE)
def q_cms_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series frequency estimation — the count-min leg of the
    summary × event-time-window symmetry (VERDICT r8 item 4; template:
    kmv_windowed_distinct): per 1-day tumbling window a 4×128 CMS grid
    keyed by the window start is built from that day's partition alone
    (one scan, keys= rides the day next to (d, w)), STORED, and any
    date range later answers frequency queries by MERGING the stored
    grids — counter addition over range × 512 rows, never a rescan of
    history (CMS merge identity: merge(day grids) ≡ grid(range rows),
    hypothesis-tested in test_properties). The gate row merges the
    Jan 8-14 grids and estimates each event type's event count in the
    range next to the exact count; all arithmetic integer-exact, the
    oracle replays bucketing, hashing, merge, and min-probe verbatim
    (cms_est ≥ exact_cnt always — one-sided error)."""
    from min_flink_spark.operators.pipeline import cms_estimate, count_min_sketch

    lo = F.lit("2024-01-08").cast("timestamp_ntz")
    hi = F.lit("2024-01-15").cast("timestamp_ntz")
    ev = load_table(spark, sf_dir, "events").select(
        F.window("ts", "1 day").getField("start").alias("day"), "event_type"
    )
    # the stored per-day partials (the expensive, scan-once artifact)
    grids = count_min_sketch(ev, "event_type", depth=4, width=128, keys=["day"])
    # range query = merge of the stored grids: grid-sized, no rescan
    merged = (
        grids.filter((F.col("day") >= lo) & (F.col("day") < hi))
        .groupBy("d", "w")
        .agg(F.sum("cnt").alias("cnt"))
    )
    types = ev.select("event_type").distinct()
    est = cms_estimate(merged, types, "event_type")
    exact = (
        ev.filter((F.col("day") >= lo) & (F.col("day") < hi))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
    )
    return est.join(exact, "event_type", "left").select(
        "event_type",
        F.coalesce(F.col("exact_cnt"), F.lit(0).cast("bigint")).alias("exact_cnt"),
        "cms_est",
    )


# ONE ground truth for the keyed × windowed CMS shape (r12: the last
# two deferred mode-matrix cells get dedicated gate rows): a 4×128
# grid per (1-day window, user segment = user_id % 3), range Jan 8-14
# merged per segment, per-(segment, type) estimates next to the exact
# counts. The batch range-merge query and its streaming-state twin
# (queries/streaming_q.py) both certify against THIS constant, which
# replays segmenting, bucketing, hashing, merge, and min-probe
# verbatim (cms_est ≥ exact_cnt always — one-sided error per segment).
CMS_KEYED_WINDOWED_ORACLE = """
    WITH e AS (
      SELECT user_id % 3 AS seg, event_type FROM events
      WHERE time_bucket(INTERVAL '1 day', ts) >= TIMESTAMP '2024-01-08'
        AND time_bucket(INTERVAL '1 day', ts) < TIMESTAMP '2024-01-15'
    ),
    segs AS (SELECT DISTINCT user_id % 3 AS seg FROM events),
    types AS (SELECT DISTINCT event_type FROM events),
    dd AS (SELECT unnest([0, 1, 2, 3]) AS d),
    cells AS (
      SELECT seg, d,
             CAST(('0x' || substr(md5(event_type || ':' || CAST(d AS VARCHAR)), 1, 8))
                  AS BIGINT) % 128 AS w,
             CAST(count(*) AS BIGINT) AS cnt
      FROM e, dd GROUP BY 1, 2, 3
    ),
    exact AS (
      SELECT seg, event_type, CAST(count(*) AS BIGINT) AS exact_cnt
      FROM e GROUP BY 1, 2
    ),
    probes AS (
      SELECT s.seg, t.event_type,
             coalesce(x.exact_cnt, CAST(0 AS BIGINT)) AS exact_cnt,
             dd.d,
             CAST(('0x' || substr(md5(t.event_type || ':' || CAST(dd.d AS VARCHAR)), 1, 8))
                  AS BIGINT) % 128 AS w
      FROM segs s CROSS JOIN types t
      LEFT JOIN exact x ON x.seg = s.seg AND x.event_type = t.event_type
      CROSS JOIN dd
    )
    SELECT p.seg, p.event_type, p.exact_cnt,
           CAST(min(coalesce(c.cnt, 0)) AS BIGINT) AS cms_est
    FROM probes p
    LEFT JOIN cells c ON c.seg = p.seg AND c.d = p.d AND c.w = p.w
    GROUP BY 1, 2, 3
    """


@query("cms_keyed_windowed_counts", oracle=CMS_KEYED_WINDOWED_ORACLE)
def q_cms_keyed_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KEYED × WINDOWED CMS — the frequency family's dedicated gate
    row for the composition the matrix footnote previously only argued
    (VERDICT r11 item "What's missing" 3): per (1-day tumbling window,
    user segment) a 4×128 grid is built from that day's partition
    alone in ONE scan (count_min_sketch keys=["day", "seg"] — the
    second retained key just widens the grid's grouping), STORED, and
    the Jan 8-14 range answers per-SEGMENT frequency questions by
    merging each segment's days (merge_cms keys=["seg"], counter
    addition over range × segments × 512 rows) and probing per
    (segment, type) (cms_estimate keys= — lookups join on
    (seg, d, w)). The production shape: 'per-cohort event-type
    frequencies over any date range' without rescanning history. All
    arithmetic integer-exact; the shared oracle replays every stage
    per segment (cms_est ≥ exact_cnt, one-sided)."""
    from min_flink_spark.operators.pipeline import (
        cms_estimate,
        count_min_sketch,
        merge_cms,
    )

    lo = F.lit("2024-01-08").cast("timestamp_ntz")
    hi = F.lit("2024-01-15").cast("timestamp_ntz")
    ev = load_table(spark, sf_dir, "events").select(
        F.window("ts", "1 day").getField("start").alias("day"),
        F.pmod(F.col("user_id"), F.lit(3)).alias("seg"),
        "event_type",
    )
    # the stored per-(day, segment) partials (scan-once artifact)
    grids = count_min_sketch(
        ev, "event_type", depth=4, width=128, keys=["day", "seg"]
    )
    # range merge over the retained segment key: grid-sized, no rescan
    merged = merge_cms(
        grids.filter((F.col("day") >= lo) & (F.col("day") < hi)).drop("day"),
        keys=["seg"],
    )
    # probe the full segments × types lattice (bounded: 3 × 6 rows —
    # the zero path matters, an untouched (seg, type) must report 0)
    segs = ev.select("seg").distinct()
    types = ev.select("event_type").distinct()
    est = cms_estimate(merged, segs.crossJoin(types), "event_type", keys=["seg"])
    exact = (
        ev.filter((F.col("day") >= lo) & (F.col("day") < hi))
        .groupBy("seg", "event_type")
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
    )
    return est.join(exact, ["seg", "event_type"], "left").select(
        "seg",
        "event_type",
        F.coalesce(F.col("exact_cnt"), F.lit(0).cast("bigint")).alias("exact_cnt"),
        "cms_est",
    )


# ONE ground truth for the windowed-bitmap retention shape: the batch
# range-merge query and the streaming-state twin (queries/
# streaming_q.py) emit the same pair table — both decorators reference
# THIS constant.
BITMAP_WINDOWED_ORACLE = """
    WITH d AS (
      SELECT DISTINCT
             CASE WHEN time_bucket(INTERVAL '1 day', ts) < TIMESTAMP '2024-01-08'
                  THEN 'w1' ELSE 'w2' END AS seg,
             user_id
      FROM events
      WHERE time_bucket(INTERVAL '1 day', ts) < TIMESTAMP '2024-01-15'
    ),
    card AS (SELECT seg, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY 1),
    inter AS (
      SELECT a.seg AS key_a, b.seg AS key_b, CAST(count(*) AS BIGINT) AS n_inter
      FROM d a JOIN d b ON a.user_id = b.user_id AND a.seg < b.seg
      GROUP BY 1, 2
    )
    SELECT ca.seg AS key_a, cb.seg AS key_b, ca.n AS n_a, cb.n AS n_b,
           coalesce(i.n_inter, 0) AS n_inter,
           ca.n + cb.n - coalesce(i.n_inter, 0) AS n_union
    FROM card ca JOIN card cb ON ca.seg < cb.seg
    LEFT JOIN inter i ON i.key_a = ca.seg AND i.key_b = cb.seg
    """


@query("bitmap_windowed_retention", oracle=BITMAP_WINDOWED_ORACLE)
def q_bitmap_windowed_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week retention, EXACT, from stored per-day bitmap
    partials — the bitmap leg of the summary × window symmetry
    (VERDICT r8 item 4): each day's (day, word, mask) index is built
    from that day's partition alone and STORED; any two date ranges
    later compare by merging their days' words (bit_or — the same
    collapse rule the streaming build uses) and popcounting, so
    'users active in week 1 AND week 2' costs two index-sized merges
    + one chunk equi-join, never a rescan or row-level member join.
    Unlike the KMV/CMS legs this one is exact — the answer IS the
    retention number, not an estimate; the oracle recomputes it from
    raw rows (structure-independent)."""
    from min_flink_spark.operators.bitmap import (
        bitmap_index,
        bitmap_pair_ops,
        merge_bitmap_indexes,
    )

    cut = F.lit("2024-01-08").cast("timestamp_ntz")
    hi = F.lit("2024-01-15").cast("timestamp_ntz")
    ev = (
        load_table(spark, sf_dir, "events")
        .select(F.window("ts", "1 day").getField("start").alias("day"), "user_id")
        .filter(F.col("day") < hi)
    )
    # the stored per-day partials (scan-once artifact)
    daily = bitmap_index(ev, "day", "user_id")
    # range merge: relabel each day's chunks by its week, bit_or words
    # — ONE merge over the relabeled frame (a per-label filter+union
    # would plan the daily build twice for byte-identical output;
    # the groupBy inside the merge already separates the segments)
    seg = daily.withColumn(
        "segment", F.when(F.col("day") < cut, F.lit("w1")).otherwise(F.lit("w2"))
    ).select("segment", "word", "mask")
    merged = merge_bitmap_indexes(seg)
    return bitmap_pair_ops(merged, "segment")


# ONE ground truth for the keyed × windowed bitmap shape: the batch
# range-merge query and its streaming-state twin
# (queries/streaming_q.py:q_streaming_bitmap_keyed_windowed_ops) emit
# the same pairwise set-algebra table over the same Jan 8-14 range —
# both decorators reference THIS constant (the
# KMV_KEYED_WINDOWED_ORACLE discipline, r11).
BITMAP_KEYED_WINDOWED_ORACLE = """
    WITH d AS (
      SELECT DISTINCT event_type, user_id FROM events
      WHERE time_bucket(INTERVAL '1 day', ts) >= TIMESTAMP '2024-01-08'
        AND time_bucket(INTERVAL '1 day', ts) < TIMESTAMP '2024-01-15'
    ),
    card AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY 1
    ),
    inter AS (
      SELECT a.event_type AS key_a, b.event_type AS key_b,
             CAST(count(*) AS BIGINT) AS n_inter
      FROM d a JOIN d b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2
    )
    SELECT ca.event_type AS key_a, cb.event_type AS key_b,
           ca.n AS n_a, cb.n AS n_b,
           coalesce(i.n_inter, 0) AS n_inter,
           ca.n + cb.n - coalesce(i.n_inter, 0) AS n_union
    FROM card ca
    JOIN card cb ON ca.event_type < cb.event_type
    LEFT JOIN inter i
      ON i.key_a = ca.event_type AND i.key_b = cb.event_type
    """


@query("bitmap_keyed_windowed_ops", oracle=BITMAP_KEYED_WINDOWED_ORACLE)
def q_bitmap_keyed_windowed_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KEYED × windowed bitmaps (VERDICT r9 item 6 — the keyed axis
    composed with the windowed axis, completing the bitmap row of the
    mode matrix): per (1-day tumbling window, event_type) an exact
    user bitmap is built from that day's partition alone and STORED —
    per-segment daily audience indexes — and a Jan 8-14 range query
    answers EXACT pairwise |A|, |B|, |A∩B|, |A∪B| between the
    segments by bit_or-merging each segment's days (word-wise OR over
    range × keys × words rows, idempotent — a user active on several
    days collapses for free) and popcounting over a chunk equi-join.
    The production shape: 'audience overlap between segments over any
    date range' without ever rescanning history or row-joining
    members. The oracle recomputes all four numbers directly from the
    range's raw rows (structure-independent), so a packing/merge/
    popcount defect on any stored word flips the hash."""
    from min_flink_spark.operators.bitmap import (
        bitmap_index,
        bitmap_pair_ops,
        merge_bitmap_indexes,
    )

    lo = F.lit("2024-01-08").cast("timestamp_ntz")
    hi = F.lit("2024-01-15").cast("timestamp_ntz")
    ev = load_table(spark, sf_dir, "events").select(
        F.window("ts", "1 day").getField("start").alias("day"),
        "event_type",
        "user_id",
    )
    # the stored per-(day, key) partials: the day rides as a SECOND
    # index key next to the segment (same keys= discipline as the
    # CMS/KMV twins — bitmap_index takes the composite list directly)
    daily = bitmap_index(ev, ["day", "event_type"], "user_id")
    # range merge over the retained key: index-sized, no rescan
    rng = daily.filter((F.col("day") >= lo) & (F.col("day") < hi)).drop("day")
    merged = merge_bitmap_indexes(rng)
    return bitmap_pair_ops(merged, "event_type")


@query(
    "mg_per_lang_top_terms",
    oracle=f"""
    WITH tok AS (
      SELECT lang, unnest({SQL_TOKS}) AS term FROM documents
    ),
    exact AS (
      SELECT lang, term, CAST(count(*) AS BIGINT) AS exact_cnt,
             row_number() OVER (PARTITION BY lang
                                ORDER BY count(*) DESC, term ASC) AS rnk
      FROM tok GROUP BY 1, 2
    )
    SELECT lang, CAST(rnk AS INT) AS rnk, term, exact_cnt,
           TRUE AS in_summary, TRUE AS within_bound
    FROM exact WHERE rnk <= 3
    """,
)
def q_mg_per_lang_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KEYED Misra-Gries — one m-counter summary PER KEY out of a
    single scan (operators/pipeline.misra_gries_summary keys=; the
    key-rides-the-sketch discipline of count_min_sketch/
    bottom_k_sketch): per-language SpaceSaving summaries at m=128,
    certified against the exact per-lang top-3.

    r13 CONTRACT REDESIGN (with the richer sf1 corpus, verdict r12
    item 3): the old contract demanded the summary match the exact
    per-lang frequency table bit-for-bit, which is only provable when
    the per-lang vocabulary fits inside m — a toy-data argument (the
    driver testdata's 31 words) that a few-thousand-word corpus
    rightly breaks. The honest contract at ANY vocabulary is the same
    containment/bound certificate mg_heavy_hitters carries: each exact
    per-lang top-3 term must appear in that lang's summary
    (containment holds whenever its frequency > N_lang/(m+1); the sf1
    corpus pins rank-3 ≥ ~2% of lang tokens vs the 0.78% threshold,
    margin ≈ 2.7×) and its estimate must satisfy
    true − N_lang/m ≤ est ≤ true (mergeable-summaries accounting,
    unconditional). At gate scale the 31-word vocabulary keeps the
    summary exact, so the booleans are trivially TRUE there too. At
    100 TB the plan is bounded by keys-in-partition × m counters in
    the one Python stage and a keys-partitioned summary-sized merge
    window — no global funnel anywhere."""
    from min_flink_spark.operators.pipeline import misra_gries_summary

    docs = load_table(spark, sf_dir, "documents")
    from min_flink_spark.functions.text import tokens as _toks

    m = 128
    tok = docs.select("lang", F.explode(_toks(F.col("text"))).alias("term"))
    summary = misra_gries_summary(tok, "term", m=m, keys=["lang"])
    counts = tok.groupBy("lang", "term").agg(
        F.count(F.lit(1)).alias("exact_cnt")
    )
    w = Window.partitionBy("lang").orderBy(
        F.col("exact_cnt").desc(), F.col("term").asc()
    )
    top = (
        counts.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
    )
    # N per lang rides the vocab-sized counts frame (no third scan)
    n_lang = counts.groupBy("lang").agg(F.sum("exact_cnt").alias("_n"))
    checked = top.join(
        summary.withColumnRenamed("item", "term"), ["lang", "term"], "left"
    ).join(n_lang, "lang")
    return checked.select(
        "lang",
        F.col("rnk").cast("int").alias("rnk"),
        "term",
        "exact_cnt",
        F.col("est").isNotNull().alias("in_summary"),
        (
            F.col("est").isNotNull()
            & (F.col("est") <= F.col("exact_cnt"))
            & (F.col("est") >= F.col("exact_cnt") - F.col("_n") / F.lit(m))
        ).alias("within_bound"),
    )


# ONE ground truth for the windowed-MG shape: the batch range-merge
# query and the streaming-state twin (queries/streaming_q.py) emit the
# same top-3 table — both decorators reference THIS constant.
MG_WINDOWED_ORACLE = """
    WITH e AS (
      SELECT event_type FROM events
      WHERE time_bucket(INTERVAL '1 day', ts) >= TIMESTAMP '2024-01-08'
        AND time_bucket(INTERVAL '1 day', ts) < TIMESTAMP '2024-01-15'
    ),
    exact AS (
      SELECT event_type AS item, CAST(count(*) AS BIGINT) AS est,
             row_number() OVER (ORDER BY count(*) DESC, event_type ASC) AS rnk
      FROM e GROUP BY 1
    )
    SELECT CAST(rnk AS INT) AS rnk, item, est
    FROM exact WHERE rnk <= 3
    """


@query("mg_windowed_top_events", oracle=MG_WINDOWED_ORACLE)
def q_mg_windowed_top_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series heavy hitters — the Misra-Gries leg of the summary ×
    event-time-window symmetry, completing the 5-family × windowed
    matrix (histogram/KMV/CMS/bitmap landed the other legs): per 1-day
    tumbling window an m=16 SpaceSaving summary of event types is
    built from that day's partition alone (misra_gries_summary
    keys=[day]), STORED, and any date range answers top-k by MERGING
    the stored summaries (merge_mg_summaries — the mergeable-summaries
    closure), never rescanning history. Because the event-type
    vocabulary (6) never exceeds m, no subtraction fires at any level
    and the merged summary is provably EXACT (the small-vocab
    guarantee) — the oracle replays the Jan 8-14 top-3 with counts and
    tie-breaks bit-for-bit. With a vocabulary above m the same plan
    degrades gracefully to the true − N/m ≤ est ≤ true band the
    unwindowed gate rows certify."""
    from min_flink_spark.operators.pipeline import (
        merge_mg_summaries,
        misra_gries_summary,
    )

    m = 16
    lo = F.lit("2024-01-08").cast("timestamp_ntz")
    hi = F.lit("2024-01-15").cast("timestamp_ntz")
    ev = load_table(spark, sf_dir, "events").select(
        F.window("ts", "1 day").getField("start").alias("day"), "event_type"
    )
    # the stored per-day partials (scan-once artifact)
    daily = misra_gries_summary(ev, "event_type", m=m, keys=["day"])
    rng = daily.filter((F.col("day") >= lo) & (F.col("day") < hi))
    merged = merge_mg_summaries(
        rng.select("item", F.col("est").alias("cnt")), m
    )
    w = Window.orderBy(F.col("est").desc(), F.col("item").asc())
    # the merged summary is ≤ m rows — the global top-3 window is
    # bounded metadata, not data (adjudicated class)
    return (
        merged.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select(F.col("rnk").cast("int").alias("rnk"), "item", "est")
    )


# ONE ground truth for the keyed × windowed MG shape (r12, the second
# of the last two deferred matrix cells): per-(1-day window, user
# segment) m=16 SpaceSaving summaries, range Jan 8-14 merged per
# segment, top-3 per segment. Per-(day, seg) vocabulary (≤ 6 event
# types) never exceeds m, so no subtraction fires at any level and
# the merged per-segment summaries are provably EXACT — ranks, counts,
# and tie-breaks replay bit-for-bit. Batch twin and streaming twin
# (queries/streaming_q.py) both reference THIS constant.
MG_KEYED_WINDOWED_ORACLE = """
    WITH e AS (
      SELECT user_id % 3 AS seg, event_type FROM events
      WHERE time_bucket(INTERVAL '1 day', ts) >= TIMESTAMP '2024-01-08'
        AND time_bucket(INTERVAL '1 day', ts) < TIMESTAMP '2024-01-15'
    ),
    exact AS (
      SELECT seg, event_type AS item, CAST(count(*) AS BIGINT) AS est,
             row_number() OVER (PARTITION BY seg
                                ORDER BY count(*) DESC, event_type ASC) AS rnk
      FROM e GROUP BY 1, 2
    )
    SELECT seg, CAST(rnk AS INT) AS rnk, item, est
    FROM exact WHERE rnk <= 3
    """


@query("mg_keyed_windowed_top_events", oracle=MG_KEYED_WINDOWED_ORACLE)
def q_mg_keyed_windowed_top_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KEYED × WINDOWED Misra-Gries — the heavy-hitter family's
    dedicated gate row for the composition the matrix footnote
    previously only argued: per (1-day tumbling window, user segment)
    an m=16 SpaceSaving summary of event types is built from that
    day's partition alone in ONE scan (misra_gries_summary
    keys=["day", "seg"] — the keys= widening), STORED, and the
    Jan 8-14 range answers per-SEGMENT top-3 by merging each segment's
    days (merge_mg_summaries keys=["seg"] — the mergeable-summaries
    closure, summary-sized rows only). Small-vocab exactness holds per
    segment (≤ 6 types < m at every level), so the oracle replays
    ranks, counts, and tie-breaks bit-for-bit; above-m vocabularies
    degrade to the same true − N/m band as the unkeyed rows."""
    from min_flink_spark.operators.pipeline import (
        merge_mg_summaries,
        misra_gries_summary,
    )

    m = 16
    lo = F.lit("2024-01-08").cast("timestamp_ntz")
    hi = F.lit("2024-01-15").cast("timestamp_ntz")
    ev = load_table(spark, sf_dir, "events").select(
        F.window("ts", "1 day").getField("start").alias("day"),
        F.pmod(F.col("user_id"), F.lit(3)).alias("seg"),
        "event_type",
    )
    # the stored per-(day, segment) partials (scan-once artifact)
    daily = misra_gries_summary(ev, "event_type", m=m, keys=["day", "seg"])
    rng = daily.filter((F.col("day") >= lo) & (F.col("day") < hi))
    merged = merge_mg_summaries(
        rng.select("seg", "item", F.col("est").alias("cnt")), m, keys=["seg"]
    )
    w = Window.partitionBy("seg").orderBy(F.col("est").desc(), F.col("item").asc())
    return (
        merged.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("seg", F.col("rnk").cast("int").alias("rnk"), "item", "est")
    )


@query(
    "mg_weighted_top_customers",
    oracle="""
    WITH spend AS (
      SELECT CAST(o_custkey AS VARCHAR) AS custkey,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS exact_spend_c
      FROM orders GROUP BY 1
    ),
    top AS (
      SELECT custkey, exact_spend_c,
             row_number() OVER (ORDER BY exact_spend_c DESC, custkey ASC)
               AS rn
      FROM spend
    )
    SELECT custkey, exact_spend_c, TRUE AS consistent
    FROM top WHERE rn <= 10
    """,
)
def q_mg_weighted_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEIGHTED SpaceSaving (misra_gries_summary weight_col=) — heavy
    hitters by REVENUE, not occurrences: m=128 counters accumulate
    integer cents of order value per customer in one scan, and every
    classical guarantee holds with N = TOTAL revenue. TPC-H spend is
    near-uniform, so unlike the token queries no customer is promised
    to clear N/m — the certificate is therefore the DISTRIBUTION-FREE
    form, TRUE for every exact-top-10 row under any data: present ⇒
    exact − N/m ≤ est ≤ exact (the accounting bound); absent ⇒
    exact ≤ N/m (absence itself proves the spend is below the
    threshold — the contrapositive of the containment guarantee). A
    FALSE either way is a real counter/merge defect. All arithmetic
    integer cents; the N/m band rides as a lazy 1-row scalar."""
    from min_flink_spark.operators.pipeline import misra_gries_summary

    m = 128
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").cast("string").alias("custkey"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("spend_c"),
    )
    summary = misra_gries_summary(
        orders, "custkey", m=m, weight_col="spend_c"
    )
    exact = orders.groupBy("custkey").agg(
        F.sum("spend_c").alias("exact_spend_c")
    )
    top = exact.orderBy(
        F.col("exact_spend_c").desc(), F.col("custkey").asc()
    ).limit(10)
    n_total = exact.agg(F.sum("exact_spend_c").alias("_n"))
    checked = top.join(
        summary.withColumnRenamed("item", "custkey"), "custkey", "left"
    ).join(n_total, how="cross")
    band = F.col("_n") / F.lit(m)
    return checked.select(
        "custkey",
        "exact_spend_c",
        F.when(
            F.col("est").isNotNull(),
            (F.col("est") <= F.col("exact_spend_c"))
            & (F.col("est") >= F.col("exact_spend_c") - band),
        )
        .otherwise(F.col("exact_spend_c") <= band)
        .alias("consistent"),
    )
