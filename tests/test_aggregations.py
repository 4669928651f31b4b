"""Reference keyed-aggregate semantics (SURVEY §2.4, FIXTURES §2).

- sum/min/max: aggregated field replaced; OTHER fields from the
  first-seen record per key (SumAggregator.java:68-76,
  ComparableAggregator.java:72-94).
- minBy/maxBy: whole extremal record; ties → first or last arrival
  (ComparableAggregator.java:79-86).
- running reduce: one emission per input row, monotone per key
  (StreamGroupedReduce.java:35-53).
"""

import pytest
from pyspark.sql import functions as F

from min_flink_spark import Stream

ROWS = [
    # (seq, k, v, payload)
    (1, "a", 5, "p1"),
    (2, "b", 7, "p2"),
    (3, "a", 3, "p3"),
    (4, "a", 9, "p4"),
    (5, "b", 7, "p5"),   # tie with seq=2 on v=7
    (6, "b", 1, "p6"),
    (7, "a", 3, "p7"),   # tie with seq=3 on v=3
    (8, "c", 4, "p8"),
]
SCHEMA = "seq int, k string, v int, payload string"


@pytest.fixture(scope="module")
def ks(spark):
    return Stream(spark.createDataFrame(ROWS, SCHEMA)).key_by("k")


def by_key(rows):
    return {r["k"]: r for r in rows}


def test_sum_keeps_first_record_fields(ks):
    got = by_key(ks.sum("v", order_by="seq").collect())
    assert (got["a"]["v"], got["a"]["seq"], got["a"]["payload"]) == (20, 1, "p1")
    assert (got["b"]["v"], got["b"]["payload"]) == (15, "p2")
    assert (got["c"]["v"], got["c"]["payload"]) == (4, "p8")


def test_min_max_replace_field_only(ks):
    mn = by_key(ks.min("v", order_by="seq").collect())
    assert (mn["a"]["v"], mn["a"]["payload"], mn["a"]["seq"]) == (3, "p1", 1)
    mx = by_key(ks.max("v", order_by="seq").collect())
    assert (mx["a"]["v"], mx["a"]["payload"]) == (9, "p1")


def test_min_by_whole_record_tie_first(ks):
    got = by_key(ks.min_by("v", order_by="seq").collect())
    # key a: v=3 at seq 3 and 7; first wins
    assert (got["a"]["seq"], got["a"]["payload"]) == (3, "p3")


def test_min_by_tie_last(ks):
    got = by_key(ks.min_by("v", order_by="seq", first=False).collect())
    assert (got["a"]["seq"], got["a"]["payload"]) == (7, "p7")


def test_max_by_tie_first_and_last(ks):
    got = by_key(ks.max_by("v", order_by="seq").collect())
    assert (got["b"]["seq"], got["b"]["payload"]) == (2, "p2")
    got = by_key(ks.max_by("v", order_by="seq", first=False).collect())
    assert (got["b"]["seq"], got["b"]["payload"]) == (5, "p5")


def test_running_reduce_emission_history(ks):
    rows = ks.running_reduce("v", "sum", order_by="seq").collect()
    assert len(rows) == len(ROWS)  # one emission per input record
    a = [(r["seq"], r["running_sum_v"]) for r in sorted(rows, key=lambda r: r["seq"]) if r["k"] == "a"]
    assert a == [(1, 5), (3, 8), (4, 17), (7, 20)]


def test_running_min(ks):
    rows = ks.running_reduce("v", "min", order_by="seq", alias="m").collect()
    b = [(r["seq"], r["m"]) for r in sorted(rows, key=lambda r: r["seq"]) if r["k"] == "b"]
    assert b == [(2, 7), (5, 7), (6, 1)]


def test_reduce_rows_fold(spark, ks):
    def concat_payloads(pdf):
        import pandas as pd

        return pd.DataFrame(
            {"k": [pdf["k"].iloc[0]], "joined": ["|".join(pdf["payload"])], "v": [int(pdf["v"].sum())]}
        )

    got = by_key(
        ks.reduce_rows(concat_payloads, "k string, joined string, v long", order_by="seq").collect()
    )
    assert got["a"]["joined"] == "p1|p3|p4|p7"
    assert got["a"]["v"] == 20


def test_events_table_semantics(spark, sf_dir):
    ev = Stream(spark.read.parquet(f"{sf_dir}/events.parquet"))
    out = ev.key_by("user_id").sum("value", order_by="event_id").collect()
    assert len(out) > 0


def test_max_by_tie_first_timestamp_order(spark):
    """Regression: the window fallback (non-numeric order column) must
    tie-break (max, first=True) toward the EARLIEST arrival."""
    from datetime import datetime

    df = spark.createDataFrame(
        [
            ("k", datetime(2024, 1, 1), 10.0, "early"),
            ("k", datetime(2024, 1, 2), 10.0, "late"),
        ],
        "k string, ts timestamp, v double, tag string",
    )
    from min_flink_spark.functions.aggregations import keyed_extremal_record

    first = keyed_extremal_record(df, ["k"], "v", "max", "ts", first=True).collect()[0]
    assert first["tag"] == "early"
    last = keyed_extremal_record(df, ["k"], "v", "min", "ts", first=False).collect()[0]
    assert last["tag"] == "late"


def test_keyed_float_sum_is_partition_invariant(spark):
    """r12 (found by the sf1 leg): a plain F.sum(double) adds partial
    aggregates in partition order, so the result ULP-drifts with the
    physical split. The ordered-fold path must return bit-identical
    sums at ANY partitioning — and equal the arrival-order running sum
    (the reference's StreamGroupedReduce semantics)."""
    from functools import reduce

    from min_flink_spark.functions.aggregations import keyed_agg_first_record

    vals = [0.1 * i + 0.07 for i in range(200)]
    rows = [(i % 3, i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k int, oid bigint, v double")
    outs = []
    for parts in (1, 7, 32):
        out = keyed_agg_first_record(
            df.repartition(parts), ["k"], "v", "sum", "oid"
        )
        outs.append({r["k"]: r["v"] for r in out.collect()})
    assert outs[0] == outs[1] == outs[2]
    # equals the sequential left fold in oid order, bit-for-bit
    for k in (0, 1, 2):
        seq = reduce(
            lambda acc, r: acc + r[2],
            sorted((r for r in rows if r[0] == k), key=lambda r: r[1]),
            0.0,
        )
        assert repr(outs[0][k]) == repr(seq)


def test_ordered_float_fold_group_size_guard(spark):
    """r13 (verdict r12 item 2): the arrival-ordered float fold
    buffers each group as an array, so a group past
    fold_max_group_rows must FAIL LOUDLY with the remediation named —
    not degrade toward a collect_list executor OOM. At the bound it
    still computes; past it, the raise carries the knob names."""
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from min_flink_spark.functions.aggregations import keyed_agg_first_record

    rows = [(1, i, float(i)) for i in range(5)] + [(2, 0, 1.5)]
    df = spark.createDataFrame(rows, "k int, oid bigint, v double")

    # At the bound: group of 5 with bound 5 computes normally.
    ok = keyed_agg_first_record(df, ["k"], "v", "sum", "oid", fold_max_group_rows=5)
    got = {r["k"]: r["v"] for r in ok.collect()}
    assert got == {1: 10.0, 2: 1.5}

    # Past the bound: loud failure naming the bound and the outs.
    import pytest

    bad = keyed_agg_first_record(df, ["k"], "v", "sum", "oid", fold_max_group_rows=4)
    with pytest.raises(SparkRuntimeException) as exc:
        bad.collect()
    msg = str(exc.value)
    assert "fold_max_group_rows" in msg and "order_by=None" in msg

    # Waived guard (None): computes regardless of group size.
    waived = keyed_agg_first_record(
        df, ["k"], "v", "sum", "oid", fold_max_group_rows=None
    )
    assert {r["k"]: r["v"] for r in waived.collect()} == {1: 10.0, 2: 1.5}


def test_fold_guard_counts_buffered_rows_not_nonnull_values(spark):
    """ADVICE r13: collect_list buffers a struct for EVERY group row —
    struct() is never null even when the value is — so the guard must
    compare TOTAL rows (count(1)) against fold_max_group_rows, not
    count(field). A null-heavy group whose non-null count is under the
    bound but whose row count is over it must still trip the guard:
    that is exactly the memory the bound exists to cap."""
    import pytest
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from min_flink_spark.functions.aggregations import keyed_agg_first_record

    # group 1: 6 rows, only 3 non-null values — bound 5 must trip on
    # the 6 buffered rows, even though count(v) = 3 <= 5
    rows = [(1, i, float(i) if i % 2 == 0 else None) for i in range(6)]
    df = spark.createDataFrame(rows, "k int, oid bigint, v double")
    bad = keyed_agg_first_record(
        df, ["k"], "v", "sum", "oid", fold_max_group_rows=5
    )
    with pytest.raises(SparkRuntimeException) as exc:
        bad.collect()
    assert "6 rows" in str(exc.value)

    # Bound 6 admits the group; the null VALUES stay in the fold and
    # null the running sum — bit-identical to the oracle's
    # list_reduce(list(value ORDER BY oid)) over a null-carrying list
    # (deliberate: filtering them Spark-side would silently diverge
    # from the replayed semantics).
    import duckdb

    ok = keyed_agg_first_record(
        df, ["k"], "v", "sum", "oid", fold_max_group_rows=6
    )
    got = ok.collect()[0]["v"]
    want = duckdb.connect().execute(
        "SELECT list_reduce(list(v ORDER BY oid), (a, b) -> a + b) FROM ("
        + "VALUES "
        + ",".join(
            f"({oid}, {'NULL' if v is None else repr(v)}::DOUBLE)"
            for _, oid, v in rows
        )
        + ") s(oid, v)"
    ).fetchone()[0]
    assert got is None and want is None
