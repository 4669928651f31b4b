"""Multi-format source/sink round-trips (reference §2.1/§2.7 analog:
the generalized surface a Spark-first engine exposes beyond the
reference's fromElements + print)."""

import os

from pyspark.sql import functions as F

from min_flink_spark import Stream
from min_flink_spark.sources import read_csv, read_json, read_orc, read_parquet


def _df(spark):
    return spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5), (3, "c", None)],
        "id bigint, tag string, x double",
    )


def _roundtrip(spark, df, write, read):
    write(Stream(df))
    got = sorted(map(tuple, read().collect()))
    assert got == sorted(map(tuple, df.collect()))


def test_csv_roundtrip(spark, tmp_path):
    p = str(tmp_path / "csv")
    _roundtrip(
        spark,
        _df(spark),
        lambda s: s.sink_csv(p),
        lambda: read_csv(spark, p, schema="id bigint, tag string, x double"),
    )


def test_json_roundtrip(spark, tmp_path):
    p = str(tmp_path / "json")
    _roundtrip(
        spark,
        _df(spark),
        lambda s: s.sink_json(p),
        lambda: read_json(spark, p, schema="id bigint, tag string, x double"),
    )


def test_orc_roundtrip(spark, tmp_path):
    p = str(tmp_path / "orc")
    _roundtrip(spark, _df(spark), lambda s: s.sink_orc(p), lambda: read_orc(spark, p))


def test_csv_schema_first_no_inference_pass(spark, tmp_path):
    """With an explicit schema the CSV read must not trigger an
    inference job (the plan reads the given schema verbatim)."""
    p = str(tmp_path / "csv2")
    Stream(_df(spark)).sink_csv(p)
    s = read_csv(spark, p, schema="id bigint, tag string, x double")
    assert [f.dataType.simpleString() for f in s.df.schema.fields] == [
        "bigint", "string", "double",
    ]


def test_streaming_json_file_source(spark, tmp_path):
    """stream_files generalizes the file source beyond parquet: a JSON
    directory streams through an aggregation to the same totals as the
    batch read."""
    from min_flink_spark.streaming.runner import run_to_completion, stream_files

    p = str(tmp_path / "sjson")
    _df(spark).coalesce(1).write.json(p)
    s = stream_files(spark, p, "id bigint, tag string, x double", fmt="json")
    agg = s.groupBy().agg(F.count(F.lit(1)).alias("n"), F.sum("id").alias("s"))
    out = run_to_completion(agg, output_mode="complete").collect()
    assert (out[0]["n"], out[0]["s"]) == (3, 6)


def test_compact_parquet_reduces_files(spark, tmp_path):
    from min_flink_spark.sources import compact_parquet

    src, dst = str(tmp_path / "frag"), str(tmp_path / "compact")
    df = spark.createDataFrame([(i, f"v{i}") for i in range(1000)], "id bigint, v string")
    df.repartition(64).write.parquet(src)  # fragmented: 64 tiny files

    n = compact_parquet(spark, src, dst, target_file_mb=256, sort_by=["id"])
    assert n == 1  # ~30 KB of data → one file
    got = spark.read.parquet(dst)
    assert got.count() == 1000
    assert got.rdd.getNumPartitions() == 1


def test_normalize_whitespace(spark):
    from min_flink_spark.functions.text import normalize_whitespace
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "  a\x00b\tc   d\n\ne \x1f "), (2, "clean text")], "id bigint, t string"
    )
    got = {r["id"]: r["n"] for r in df.select("id", normalize_whitespace(F.col("t")).alias("n")).collect()}
    assert got[1] == "a b c d e"
    assert got[2] == "clean text"


def test_schema_evolution_merge(spark, tmp_path):
    """Data-lake reality: a column added mid-stream. mergeSchema unions
    the file schemas; old rows read NULL for the new column."""
    p = str(tmp_path / "evolve")
    spark.createDataFrame([(1, "a")], "id bigint, v string").write.parquet(p)
    spark.createDataFrame(
        [(2, "b", 9.5)], "id bigint, v string, score double"
    ).write.mode("append").parquet(p)
    got = {r["id"]: r for r in spark.read.option("mergeSchema", "true").parquet(p).collect()}
    assert got[1]["score"] is None and got[2]["score"] == 9.5


def test_corrupt_json_rows_are_quarantined(spark, tmp_path):
    """PERMISSIVE JSON parsing with a _corrupt_record column: bad rows
    land in quarantine instead of failing the pipeline — the default
    posture for 100 TB ingest where a crash on row 3 of 10^11 is not an
    option."""
    import os

    p = str(tmp_path / "raw")
    os.makedirs(p)
    with open(os.path.join(p, "data.json"), "w") as fh:
        fh.write('{"id": 1, "v": "ok"}\n')
        fh.write("{this is not json\n")
        fh.write('{"id": 3, "v": "fine"}\n')
    df = spark.read.schema("id bigint, v string, _corrupt_record string").json(p)
    rows = df.collect()
    good = [r for r in rows if r["_corrupt_record"] is None]
    bad = [r for r in rows if r["_corrupt_record"] is not None]
    assert {r["id"] for r in good} == {1, 3}
    assert len(bad) == 1 and "not json" in bad[0]["_corrupt_record"]


def test_zorder_key_matches_python_morton(spark):
    from pyspark.sql import functions as F

    from min_flink_spark.functions.hashing import zorder_key

    def spread(v):
        v &= 0xFFFF
        v = (v | (v << 8)) & 0x00FF00FF
        v = (v | (v << 4)) & 0x0F0F0F0F
        v = (v | (v << 2)) & 0x33333333
        v = (v | (v << 1)) & 0x55555555
        return v

    cases = [(0, 0), (1, 0), (0, 1), (65535, 65535), (12345, 54321), (7, 70000)]
    df = spark.createDataFrame(cases, "x long, y long")
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select("x", "y", zorder_key(F.col("x"), F.col("y")).alias("z")).collect()
    }
    for x, y in cases:
        assert got[(x, y)] == spread(x) | (spread(y) << 1)


def test_compact_parquet_zorder_clusters_row_groups(spark, tmp_path):
    """Z-ordered output must cluster both dimensions: within each
    written file, the value range of EACH column is much narrower than
    the global range (that's what makes min/max stats prune)."""
    import glob

    from min_flink_spark.sources import compact_parquet

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    spark.range(0, 4096).selectExpr(
        "id % 64 AS a", "CAST(id / 64 AS BIGINT) AS b", "id"
    ).write.parquet(src)
    compact_parquet(spark, src, dst, target_file_mb=1, zorder_by=("a", "b"))
    files = [f for f in glob.glob(f"{dst}/*.parquet")]
    assert len(files) >= 1
    # re-read each output partition file: spans must be sub-global
    import pyarrow.parquet as pq

    spans_a = []
    for f in files:
        t = pq.read_table(f, columns=["a"])
        col = t["a"].to_pylist()
        if col:
            spans_a.append(max(col) - min(col))
    # global span of a is 63; z-clustered files must average narrower
    if len(files) > 1:
        assert sum(spans_a) / len(spans_a) < 63


def test_compact_parquet_zorder_wide_range_columns(spark, tmp_path):
    """Columns far beyond 2^16 must still cluster (order-preserving
    min/max scaling — NOT a low-16-bit mask, which would be noise)."""
    import glob

    import pyarrow.parquet as pq

    from min_flink_spark.sources import compact_parquet

    src = str(tmp_path / "wsrc")
    dst = str(tmp_path / "wdst")
    # a in millions, b in billions — both wide-range
    spark.range(0, 4096).selectExpr(
        "(id % 64) * 1000000 AS a", "CAST(id / 64 AS BIGINT) * 1000000000 AS b", "id"
    ).write.parquet(src)
    compact_parquet(spark, src, dst, target_file_mb=1, zorder_by=("a", "b"))
    files = glob.glob(f"{dst}/*.parquet")
    if len(files) > 1:
        spans = []
        for f in files:
            col = pq.read_table(f, columns=["a"])["a"].to_pylist()
            if col:
                spans.append(max(col) - min(col))
        assert sum(spans) / len(spans) < 63 * 1000000


def test_compact_parquet_zorder_nan_column_survives(spark, tmp_path):
    """A NaN in a zorder column must not poison the scaling into
    all-null keys (single giant partition); the write must succeed."""
    from min_flink_spark.sources import compact_parquet

    src = str(tmp_path / "nansrc")
    dst = str(tmp_path / "nandst")
    spark.range(0, 100).selectExpr(
        "CAST(id AS DOUBLE) AS a",
        "CASE WHEN id = 7 THEN CAST('NaN' AS DOUBLE) ELSE CAST(id AS DOUBLE) END AS b",
        "id",
    ).write.parquet(src)
    compact_parquet(spark, src, dst, target_file_mb=1, zorder_by=("a", "b"))
    assert spark.read.parquet(dst).count() == 100


def test_pysource_batch_deterministic_and_sliced(spark):
    """Two reads with different partition counts produce identical row
    sets — slicing is a pure partition of the index range."""
    from min_flink_spark.sources.pysource import register_synthetic_source

    register_synthetic_source(spark)
    a = (
        spark.read.format("synthetic_events")
        .option("rows", "1000")
        .option("partitions", "1")
        .load()
    )
    b = (
        spark.read.format("synthetic_events")
        .option("rows", "1000")
        .option("partitions", "7")
        .load()
    )
    assert a.count() == b.count() == 1000
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_pysource_stream_reader_drains_bounded(spark):
    """The streaming reader exposes the full remaining range per poll:
    an AvailableNow run drains all rows once and terminates."""
    from pyspark.sql import functions as F

    from min_flink_spark.sources.pysource import register_synthetic_source
    from min_flink_spark.streaming.runner import run_to_completion

    register_synthetic_source(spark)
    s = (
        spark.readStream.format("synthetic_events")
        .option("rows", "500")
        .option("partitions", "4")
        .load()
    )
    agg = s.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    out = run_to_completion(agg, output_mode="update")
    total = sum(r["n"] for r in out.collect())
    assert total == 500


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """Corpus directories accrete columns over time; mergeSchema reads
    old + new files into one unified schema with nulls for missing
    columns — the ingestion-compatibility contract."""
    base = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], "id bigint, text string").write.parquet(
        base + "/batch=1"
    )
    spark.createDataFrame(
        [(2, "b", "en")], "id bigint, text string, lang string"
    ).write.parquet(base + "/batch=2")
    df = spark.read.option("mergeSchema", "true").parquet(base)
    assert set(df.columns) == {"id", "text", "lang", "batch"}
    rows = {r["id"]: r["lang"] for r in df.collect()}
    assert rows == {1: None, 2: "en"}


def test_csv_malformed_rows_quarantined(spark, tmp_path):
    """PERMISSIVE mode with a corrupt-record column: malformed lines
    land in the quarantine column instead of killing the job (the
    ingest-don't-crash contract for web-scale dirty data)."""
    p = tmp_path / "dirty.csv"
    p.write_text("id,score\n1,2.5\nnot_a_number_row_with,too,many,fields\n3,7.0\n")
    df = (
        spark.read.option("header", "true")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .schema("id bigint, score double, _corrupt string")
        .csv(str(p))
        # Spark disallows filtering on ONLY the corrupt-record column of
        # a raw scan; materialize first (the documented pattern)
        .cache()
    )
    good = df.filter("_corrupt IS NULL")
    bad = df.filter("_corrupt IS NOT NULL")
    assert good.count() == 2 and bad.count() == 1
    assert "too,many" in bad.first()["_corrupt"]


def test_load_table_memo_and_invalidation(spark, tmp_path):
    """ADVICE r10: load_table memoizes per (session, sf_dir, table) —
    the same DataFrame object comes back, pinning the first read's file
    listing — and invalidate_table_cache is the documented escape hatch
    when files are regenerated mid-session: after invalidation the next
    load sees the rewritten data."""
    from min_flink_spark.sources import invalidate_table_cache, load_table

    sf = str(tmp_path)
    spark.createDataFrame([(1,)], "v bigint").write.parquet(f"{sf}/events.parquet")
    first = load_table(spark, sf, "events")
    assert load_table(spark, sf, "events") is first  # memoized object
    assert first.count() == 1

    # rewrite in place: the cached plan still serves the old listing
    spark.createDataFrame([(1,), (2,)], "v bigint").write.mode("overwrite").parquet(
        f"{sf}/events.parquet"
    )
    # narrow invalidation (wrong table) drops nothing
    assert invalidate_table_cache(spark, sf_dir=sf, name="orders") == 0
    assert invalidate_table_cache(spark, sf_dir=sf, name="events") == 1
    fresh = load_table(spark, sf, "events")
    assert fresh is not first
    assert fresh.count() == 2


def test_invalidate_table_cache_refreshes_registered_views(spark, tmp_path):
    """ADVICE r11: a temp view created by register_views must not keep
    serving the pre-invalidation plan — invalidate_table_cache
    re-registers affected views against a fresh read, so the SQL path
    sees rewritten data without a manual register_views re-call."""
    from min_flink_spark.sources import invalidate_table_cache, register_views

    sf = str(tmp_path)
    spark.createDataFrame([(1,)], "v bigint").write.parquet(f"{sf}/events.parquet")
    register_views(spark, sf, ["events"])
    assert spark.sql("SELECT count(*) c FROM events").first()["c"] == 1

    spark.createDataFrame([(1,), (2,)], "v bigint").write.mode("overwrite").parquet(
        f"{sf}/events.parquet"
    )
    invalidate_table_cache(spark, sf_dir=sf, name="events")
    assert spark.sql("SELECT count(*) c FROM events").first()["c"] == 2
    spark.catalog.dropTempView("events")


def test_compact_parquet_zorder_timestamp_dimension(spark, tmp_path):
    """r13: a TIMESTAMP_NTZ zorder column must be numeric-ized
    order-preservingly (epoch micros) — Spark 4 refuses
    cast(ntz AS double), and ts × entity-id is the canonical Z-order
    pair. Each written file's ts span must be sub-global."""
    import glob

    import pyarrow.parquet as pq

    from min_flink_spark.sources import compact_parquet

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    spark.range(0, 4096).selectExpr(
        "id % 64 AS a",
        "CAST(timestamp_ntz'2024-01-01 00:00:00' + make_interval("
        "0, 0, 0, 0, 0, 0, CAST(id / 64 AS INT) * 3600) AS TIMESTAMP_NTZ)"
        " AS ts",
        "id",
    ).write.parquet(src)
    compact_parquet(spark, src, dst, target_file_mb=1, zorder_by=("a", "ts"))
    files = glob.glob(f"{dst}/*.parquet")
    assert len(files) >= 1
    out = spark.read.parquet(dst)
    assert out.count() == 4096
    spans = []
    for f in files:
        col = pq.read_table(f, columns=["ts"])["ts"].to_pylist()
        if col:
            spans.append((max(col) - min(col)).total_seconds())
    global_span = 63 * 3600.0
    if len(files) > 1:
        assert sum(spans) / len(spans) < global_span
