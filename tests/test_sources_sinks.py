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
