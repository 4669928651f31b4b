"""Window semantics on hand-built micro-fixtures."""

from datetime import datetime

from pyspark.sql import functions as F

from min_flink_spark.operators.windows import session, slide, tumble


def ts(minute):
    return datetime(2024, 1, 1, 0, minute)


def make(spark, minutes):
    return spark.createDataFrame(
        [(ts(m), 1.0) for m in minutes], "ts timestamp, v double"
    )


def test_tumble_bounds(spark):
    df = make(spark, [0, 5, 10, 14, 15])
    out = {
        (r["window_start"].minute, r["window_end"].minute): r["n"]
        for r in tumble(df, "ts", "15 minutes", None, F.count("*").alias("n")).collect()
    }
    assert out == {(0, 15): 4, (15, 30): 1}


def test_slide_replication(spark):
    df = make(spark, [0])  # one event, 10-min window sliding every 5
    rows = slide(df, "ts", "10 minutes", "5 minutes", None, F.count("*").alias("n")).collect()
    starts = sorted(r["window_start"].minute for r in rows)
    # event at :00 belongs to windows starting :55(prev hour) and :00
    assert starts == [0, 55]


def test_session_gap_merge(spark):
    df = make(spark, [0, 4, 8, 30, 33])  # gap 10min → two sessions
    rows = session(df, "ts", "10 minutes", None, F.count("*").alias("n")).collect()
    got = sorted(
        (r["session_start"].minute, r["session_end"].minute, r["n"]) for r in rows
    )
    # session end = last event + gap
    assert got == [(0, 18, 3), (30, 43, 2)]


def test_count_window_block_sizes(spark):
    """Blocks are exactly n rows except the last partial block, and the
    assignment is invariant under input partitioning."""
    from pyspark.sql import functions as F

    from min_flink_spark.operators.windows import count_window

    rows = [(1, i, i, 1.0) for i in range(23)] + [(2, i, 100 + i, 2.0) for i in range(7)]
    df = spark.createDataFrame(rows, "user_id bigint, ts bigint, event_id bigint, v double")
    out = count_window(
        df.repartition(5),
        ["user_id"],
        ["ts", "event_id"],
        10,
        F.count(F.lit(1)).alias("n"),
    )
    got = {(r.user_id, r.window_id): r.n for r in out.collect()}
    assert got == {(1, 0): 10, (1, 1): 10, (1, 2): 3, (2, 0): 7}


def test_keyed_stream_fluent_windows(spark, sf_dir):
    """keyBy().tumble/session/count_window fluent surface equals the
    operator functions they wrap."""
    from pyspark.sql import functions as F

    from min_flink_spark.core.stream import Stream
    from min_flink_spark.operators.windows import tumble

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    fluent = (
        Stream(ev)
        .key_by("event_type")
        .tumble("ts", "1 day", F.count(F.lit(1)).alias("n"))
        .df
    )
    direct = tumble(ev, "ts", "1 day", ["event_type"], F.count(F.lit(1)).alias("n"))
    assert sorted(map(tuple, fluent.collect())) == sorted(map(tuple, direct.collect()))

    blocks = (
        Stream(ev)
        .key_by("user_id")
        .count_window(10, ["ts", "event_id"], F.count(F.lit(1)).alias("n"))
        .df.collect()
    )
    n_events = ev.count()
    assert sum(r["n"] for r in blocks) == n_events
    assert all(r["n"] <= 10 for r in blocks)


def test_sliding_count_window_membership(spark):
    """size=3, slide=2 over 7 ordered rows per key: window j covers
    positions [2j, 2j+3); hand-checked counts incl. the partial tail,
    and partition invariance."""
    from pyspark.sql import functions as F

    from min_flink_spark.operators.windows import sliding_count_window

    df = spark.createDataFrame(
        [(1, i) for i in range(7)], "k bigint, seq bigint"
    )
    out = {
        (r.k, r.window_id): r.n
        for r in sliding_count_window(
            df, ["k"], [F.col("seq").asc()], 3, 2, F.count(F.lit(1)).alias("n")
        ).collect()
    }
    # windows: [0,3)=3 rows, [2,5)=3, [4,7)=3, [6,9)=1 (partial)
    assert out == {(1, 0): 3, (1, 1): 3, (1, 2): 3, (1, 3): 1}
    again = {
        (r.k, r.window_id): r.n
        for r in sliding_count_window(
            df.repartition(5), ["k"], [F.col("seq").asc()], 3, 2,
            F.count(F.lit(1)).alias("n"),
        ).collect()
    }
    assert again == out
