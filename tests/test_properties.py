"""Property-based tests: the reference aggregate semantics hold on
arbitrary inputs, not just the hand-written fixtures.

Model: a pure-Python fold implementing the documented contract
(SumAggregator.java:68-76 / ComparableAggregator.java:72-94 —
first-seen record's fields, aggregated field replaced; minBy/maxBy
whole record with first/last tie-break). Spark plans must agree with
the model on every generated dataset.

One shared Spark session across examples (hypothesis just drives the
data); deadline disabled because Spark actions are not
microsecond-scale.
"""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from min_flink_spark.functions.aggregations import (
    keyed_agg_first_record,
    keyed_extremal_record,
    running_reduce_plan,
)

rows_strategy = st.lists(
    st.tuples(
        st.sampled_from(["a", "b", "c"]),          # key
        st.integers(min_value=-50, max_value=50),   # value
        st.sampled_from(["p", "q", "r", "s"]),      # payload
    ),
    min_size=1,
    max_size=25,
)


def to_df(spark, rows):
    # seq column = arrival order (FIXTURES §3 total-order contract)
    return spark.createDataFrame(
        [(i, k, v, p) for i, (k, v, p) in enumerate(rows)],
        "seq int, k string, v int, payload string",
    )


def model_first_record_agg(rows, op):
    out = {}
    for i, (k, v, p) in enumerate(rows):
        if k not in out:
            out[k] = {"seq": i, "v": v, "payload": p}
        else:
            cur = out[k]["v"]
            cur = cur + v if op == "sum" else (min(cur, v) if op == "min" else max(cur, v))
            out[k]["v"] = cur
    return {k: (r["seq"], r["v"], r["payload"]) for k, r in out.items()}


def model_extremal(rows, op, first):
    out = {}
    for i, (k, v, p) in enumerate(rows):
        if k not in out:
            out[k] = (i, v, p)
            continue
        _, bv, _ = out[k]
        better = v < bv if op == "min" else v > bv
        tie = v == bv
        if better or (tie and not first):
            out[k] = (i, v, p)
    return out


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=rows_strategy)
@pytest.mark.parametrize("op", ["sum", "min", "max"])
def test_first_record_agg_matches_model(spark, rows, op):
    got = {
        r["k"]: (r["seq"], r["v"], r["payload"])
        for r in keyed_agg_first_record(to_df(spark, rows), ["k"], "v", op, "seq").collect()
    }
    assert got == model_first_record_agg(rows, op)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=rows_strategy)
@pytest.mark.parametrize("op,first", [("min", True), ("min", False), ("max", True), ("max", False)])
def test_extremal_record_matches_model(spark, rows, op, first):
    got = {
        r["k"]: (r["seq"], r["v"], r["payload"])
        for r in keyed_extremal_record(
            to_df(spark, rows), ["k"], "v", op, "seq", first
        ).collect()
    }
    assert got == model_extremal(rows, op, first)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=rows_strategy)
def test_running_reduce_matches_model(spark, rows):
    got = {
        r["seq"]: r["running_sum_v"]
        for r in running_reduce_plan(to_df(spark, rows), ["k"], "v", "sum", "seq").collect()
    }
    acc: dict = {}
    for i, (k, v, _) in enumerate(rows):
        acc[k] = acc.get(k, 0) + v
        assert got[i] == acc[k], f"seq {i}"
