"""Type-system round-trip (FIXTURES §2 typed_row) + opaque-UDF paths +
accumulator/observe metrics."""

from datetime import date, datetime
from decimal import Decimal

import pandas as pd
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    ByteType,
    DateType,
    DecimalType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    ShortType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from min_flink_spark import Stream

TYPED_SCHEMA = StructType(
    [
        StructField("b", BooleanType()),
        StructField("i8", ByteType()),
        StructField("i16", ShortType()),
        StructField("i32", IntegerType()),
        StructField("i64", LongType()),
        StructField("f32", FloatType()),
        StructField("f64", DoubleType()),
        StructField("s", StringType()),
        StructField("dec", DecimalType(38, 18)),       # BigDecimal
        StructField("bigint_dec", DecimalType(38, 0)),  # BigInteger
        StructField("d", DateType()),
        StructField("ts", TimestampType()),
        StructField(
            "pojo",
            StructType(
                [StructField("name", StringType()), StructField("score", IntegerType())]
            ),
        ),
        StructField(
            "tup",
            StructType(
                [StructField("_1", StringType()), StructField("_2", IntegerType())]
            ),
        ),
        StructField("arr", ArrayType(IntegerType())),  # ListTypeInfo
        StructField(
            "either",  # Either → tagged struct
            StructType(
                [
                    StructField("tag", StringType()),
                    StructField("left", StringType()),
                    StructField("right", IntegerType()),
                ]
            ),
        ),
    ]
)

TYPED_ROW = (
    True, 7, 300, 70000, 8_000_000_000, 1.5, 2.25, "hello",
    Decimal("1.234567890123456789"), Decimal("98765432109876543210"),
    date(2024, 1, 15), datetime(2024, 1, 15, 12, 30, 45),
    Row(name="ada", score=42), Row(_1="x", _2=9), [1, 2, 3],
    Row(tag="left", left="oops", right=None),
)


def test_typed_row_roundtrip(spark):
    """Every reference type (SURVEY §1.2) lands on a Catalyst type and
    survives a round trip."""
    df = spark.createDataFrame([TYPED_ROW], TYPED_SCHEMA)
    r = df.collect()[0]
    assert r["i64"] == 8_000_000_000 and r["f64"] == 2.25
    assert r["dec"] == Decimal("1.234567890123456789")
    assert r["bigint_dec"] == Decimal("98765432109876543210")
    assert r["d"] == date(2024, 1, 15)
    assert r["pojo"]["name"] == "ada" and r["tup"]["_2"] == 9
    assert r["arr"] == [1, 2, 3] and r["either"]["tag"] == "left"


def test_field_expression_access(spark):
    """Dotted field expressions (FieldAccessorFactory.java:52-190):
    'pojo.name' and positional '_1' address nested fields."""
    df = spark.createDataFrame([TYPED_ROW], TYPED_SCHEMA)
    got = df.select(
        F.col("pojo.name").alias("n"), F.col("tup._1").alias("p0")
    ).collect()[0]
    assert got["n"] == "ada" and got["p0"] == "x"


def test_map_rows_pandas_path(spark):
    """Opaque MapFunction path: Arrow-batched mapInPandas."""
    s = Stream(spark.createDataFrame([(i,) for i in range(100)], "x int"))

    def double_even(pdf: pd.DataFrame) -> pd.DataFrame:
        out = pdf[pdf["x"] % 2 == 0].copy()
        out["y"] = out["x"] * 2
        return out[["y"]]

    rows = s.map_rows(double_even, "y int").collect()
    assert sorted(r["y"] for r in rows) == [i * 2 for i in range(0, 100, 2)]


def test_observe_accumulator(spark):
    """Accumulator analog: metrics collected during the job, no second
    pass (AccumulatorHelper.java merge-at-job-end semantics)."""
    s = Stream(spark.createDataFrame([(i,) for i in range(50)], "x int"))
    observed, obs = s.observe(
        "m", F.count(F.lit(1)).alias("rows_seen"), F.sum("x").alias("x_sum")
    )
    result = observed.filter(F.col("x") >= 0).collect()
    assert len(result) == 50
    assert obs.get["rows_seen"] == 50 and obs.get["x_sum"] == sum(range(50))


# ---- field-expression addressing (FieldAccessorFactory.java:52-190) ----


def test_positional_field_addressing(spark):
    from min_flink_spark import Stream

    df = spark.createDataFrame(
        [(1, 10.0, "a"), (1, 20.0, "b"), (2, 5.0, "c")], "k bigint, v double, tag string"
    )
    # f1/1 → second column "v"
    out = {
        r["k"]: r["v"]
        for r in Stream(df).key_by("f0").sum(1, order_by="tag").collect()
    }
    assert out == {1: 30.0, 2: 5.0}


def test_dotted_path_sum_replaces_only_nested_field(spark):
    from min_flink_spark import Stream

    df = spark.createDataFrame(
        [(1, 1, (10, "x")), (1, 2, (20, "y")), (2, 1, (7, "z"))],
        "k bigint, seq bigint, meta struct<w: bigint, s: string>",
    )
    rows = {
        r["k"]: r for r in Stream(df).key_by("k").sum("meta.w", order_by="seq").collect()
    }
    # nested field replaced by the sum; sibling field + row fields from
    # the FIRST record per key
    assert rows[1]["meta"]["w"] == 30 and rows[1]["meta"]["s"] == "x"
    assert rows[1]["seq"] == 1
    assert rows[2]["meta"]["w"] == 7 and rows[2]["meta"]["s"] == "z"


def test_dotted_path_two_levels_deep(spark):
    from min_flink_spark.functions.aggregations import keyed_agg_first_record

    df = spark.createDataFrame(
        [(1, 1, ((5, "p"), True)), (1, 2, ((6, "q"), False))],
        "k bigint, seq bigint, a struct<b: struct<c: bigint, s: string>, flag: boolean>",
    )
    r = keyed_agg_first_record(df, ["k"], "a.b.c", "max", "seq").collect()[0]
    assert r["a"]["b"]["c"] == 6       # replaced by max
    assert r["a"]["b"]["s"] == "p"     # sibling from first record
    assert r["a"]["flag"] is True      # outer sibling from first record


def test_dotted_path_min_by_whole_record(spark):
    from min_flink_spark import Stream

    df = spark.createDataFrame(
        [(1, 1, (10, "lo")), (1, 2, (3, "min")), (2, 1, (9, "only"))],
        "k bigint, seq bigint, meta struct<w: bigint, s: string>",
    )
    rows = {r["k"]: r for r in Stream(df).key_by("k").min_by("meta.w", order_by="seq").collect()}
    assert rows[1]["meta"]["s"] == "min"  # whole extremal record kept


def test_unknown_field_raises(spark):
    from min_flink_spark.functions.fields import resolve_field

    df = spark.createDataFrame([(1,)], "k bigint")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown field"):
        resolve_field(df, "nope.deep")
    with _pytest.raises(ValueError, match="out of range"):
        resolve_field(df, 5)


# ---- Either tagged struct (EitherTypeInfo.java) ----


def test_either_union_branches(spark):
    from min_flink_spark.functions.either import (
        get_left,
        get_right,
        is_left,
        union_either,
    )
    from pyspark.sql import functions as F

    nums = spark.createDataFrame([(1, 1.5), (2, 2.5)], "id bigint, x double")
    strs = spark.createDataFrame([(3, "s3")], "id bigint, s string")
    both = union_either(
        nums, strs, F.col("x"), F.col("s"), "double", "string", carry=["id"]
    )
    rows = {r["id"]: r["either"] for r in both.collect()}
    assert rows[1]["tag"] == "left" and rows[1]["left"] == 1.5 and rows[1]["right"] is None
    assert rows[3]["tag"] == "right" and rows[3]["right"] == "s3" and rows[3]["left"] is None
    lefts = both.filter(is_left(F.col("either"))).select(
        get_left(F.col("either")).alias("v")
    ).collect()
    assert sorted(r["v"] for r in lefts) == [1.5, 2.5]
    rights = both.filter(~is_left(F.col("either"))).select(
        get_right(F.col("either")).alias("v")
    ).collect()
    assert [r["v"] for r in rights] == ["s3"]


def test_python_udtf_matches_codegen_chunker(spark):
    """§2.10 UDTF surface via Spark 4's native Python UDTF API: a
    table-function chunker must agree exactly with the codegen
    chunk_text operator (which stays the hot path — the UDTF exists to
    pin the API, Arrow batching, and lateral-join plumbing)."""
    from pyspark.sql.functions import col, lit, udtf

    from min_flink_spark.operators.pipeline import chunk_text

    @udtf(returnType="chunk_id bigint, chunk_text string, n_tokens bigint")
    class Chunker:
        def eval(self, text: str, chunk_tokens: int, stride: int):
            import re

            toks = [t for t in re.split(r"[^a-z0-9]+", (text or "").lower()) if t]
            starts = [
                s
                for s in range(0, len(toks), stride)
                # previous window already reached the end → subset chunk
                if s == 0 or s - stride + chunk_tokens < len(toks)
            ]
            for i, start in enumerate(starts):
                window = toks[start : start + chunk_tokens]
                yield i, " ".join(window), len(window)

    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again and again"),
            (2, "short doc"),
            (3, ""),
        ],
        "doc_id long, text string",
    )
    got = {
        (r["doc_id"], r["chunk_id"]): (r["chunk_text"], r["n_tokens"])
        for r in df.lateralJoin(
            Chunker(col("text").outer(), lit(5), lit(3))
        ).select("doc_id", "chunk_id", "chunk_text", "n_tokens").collect()
        if r["chunk_id"] is not None
    }
    want = {
        (r["doc_id"], r["chunk_id"]): (r["chunk_text"], r["n_tokens"])
        for r in chunk_text(df, chunk_tokens=5, stride=3).collect()
    }
    assert got == want and len(want) > 3


def test_side_output_partitions_input(spark):
    """side_output is a partition: every row lands in exactly one of
    (main, side), including NULL-condition rows (→ main)."""
    from pyspark.sql import functions as F

    from min_flink_spark.core.stream import Stream

    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, -5.0), (4, 0.0)], "id bigint, v double"
    )
    main, side = Stream(df).side_output(F.col("v") > 0)
    main_ids = {r["id"] for r in main.df.collect()}
    side_ids = {r["id"] for r in side.df.collect()}
    assert side_ids == {1}
    assert main_ids == {2, 3, 4}  # NULL condition row stays in main
    assert main_ids | side_ids == {1, 2, 3, 4}
    assert main_ids & side_ids == set()
