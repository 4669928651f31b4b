"""Connected streams (streaming/connect.py): schema alignment, one-sided
keys, left-before-right delivery, and state sharing across sides."""

import pandas as pd

from min_flink_spark.streaming.connect import CoProcessFunction, connect_keyed
from min_flink_spark.streaming.runner import (
    run_to_completion,
    shuffle_partitions,
    stream_parquet,
)

L_SCHEMA = "k bigint, tag string"
R_SCHEMA = "k bigint, amount bigint, note string"


class _Recorder(CoProcessFunction):
    """Accumulates left-row count and right amount sum; also records
    the delivery order (left must precede right within a batch)."""

    state_schema = "n_left bigint, amt bigint, order_ok boolean"
    output_schema = "k bigint, n_left bigint, amt bigint, order_ok boolean"

    def process_left(self, key, rows, state):
        n, amt, ok = state or (0, 0, True)
        assert list(rows.columns) == ["tag"]  # payload unwrapped, key excluded
        return None, (n + len(rows), amt, ok)

    def process_right(self, key, rows, state):
        # left of this batch must already be folded in when right arrives
        n, amt, ok = state or (0, 0, True)
        assert list(rows.columns) == ["amount", "note"]
        return None, (n, amt + int(rows["amount"].sum()), ok)

    def finish_batch(self, key, state):
        if state is None:
            return None, None
        n, amt, ok = state
        return (
            pd.DataFrame(
                {"k": [key[0]], "n_left": [n], "amt": [amt], "order_ok": [ok]}
            ),
            state,
        )


def _stage(spark, rows, schema, path):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("overwrite").parquet(
        path
    )
    return stream_parquet(spark, path, schema)


def test_connect_aligns_schemas_and_shares_state(spark, tmp_path):
    left = _stage(
        spark,
        [(1, "a"), (1, "b"), (2, "c")],
        L_SCHEMA,
        str(tmp_path / "l"),
    )
    right = _stage(
        spark,
        [(1, 10, "x"), (3, 7, "y")],
        R_SCHEMA,
        str(tmp_path / "r"),
    )
    out = connect_keyed(left, right, ["k"], _Recorder(), output_mode="update")
    with shuffle_partitions(spark, 2):
        got = {
            r["k"]: (r["n_left"], r["amt"], r["order_ok"])
            for r in run_to_completion(out, output_mode="update").collect()
        }
    # key 1: both sides; key 2: left only; key 3: right only
    assert got == {1: (2, 10, True), 2: (1, 0, True), 3: (0, 7, True)}


def test_connect_validates_inputs(spark):
    import pytest

    from min_flink_spark.streaming.connect import CoProcessFunction, connect_keyed

    a = spark.createDataFrame([(1, "x")], "k bigint, v string")
    b = spark.createDataFrame([(1, 2)], "kk bigint, w bigint")
    with pytest.raises(ValueError, match="key columns missing"):
        connect_keyed(a, b, ["k"], CoProcessFunction())
    c = spark.createDataFrame([(1, 0)], "k bigint, _side bigint")
    with pytest.raises(ValueError, match="_side"):
        connect_keyed(a, c, ["k"], CoProcessFunction())


def test_fluent_connect_surface(spark, tmp_path):
    """Stream.connect(...).key_by(...).process(fn) ≡ connect_keyed."""
    from min_flink_spark.core.stream import Stream

    left = _stage(spark, [(1, "a"), (2, "b")], L_SCHEMA, str(tmp_path / "fl"))
    right = _stage(spark, [(1, 5, "x")], R_SCHEMA, str(tmp_path / "fr"))
    out = (
        Stream(left)
        .connect(Stream(right))
        .key_by("k")
        .process(_Recorder(), output_mode="update")
    )
    with shuffle_partitions(spark, 2):
        got = {
            r["k"]: (r["n_left"], r["amt"])
            for r in run_to_completion(out.df, output_mode="update").collect()
        }
    assert got == {1: (1, 5), 2: (1, 0)}
