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
    """Top-3 TF-IDF terms per document. Shuffle budget: one on
    (doc, term), one on term (df — broadcast back), one on doc for the
    top-k window; the document-count scalar rides a broadcast cross
    join, never a driver collect."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("cnt"))
    doclen = tf.groupBy("doc_id").agg(F.sum("cnt").alias("len"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("n_docs"))
    n = docs.agg(F.count(F.lit(1)).alias("total"))
    scored = (
        tf.join(doclen, "doc_id")
        .join(F.broadcast(df_), "term")
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
