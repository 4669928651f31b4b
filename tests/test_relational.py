"""Relational operator semantics + physical-plan assertions."""

from pyspark.sql import functions as F

from min_flink_spark.operators.relational import asof_join, broadcast_join, top_k


def test_asof_join_semantics(spark):
    quotes = spark.createDataFrame(
        [("A", 1, 10.0), ("A", 5, 11.0), ("A", 9, 12.0), ("B", 3, 20.0)],
        "sym string, t int, px double",
    )
    trades = spark.createDataFrame(
        [("A", 0), ("A", 5), ("A", 7), ("B", 2), ("B", 100), ("C", 1)],
        "sym string, t int",
    )
    out = {
        (r["sym"], r["t"]): r["r_px"]
        for r in asof_join(
            trades, quotes, on=["sym"], left_ts="t", right_ts="t", right_values=["px"]
        ).collect()
    }
    assert out[("A", 0)] is None          # no quote yet
    assert out[("A", 5)] == 11.0          # equal ts visible (non-strict)
    assert out[("A", 7)] == 11.0
    assert out[("B", 2)] is None
    assert out[("B", 100)] == 20.0
    assert out[("C", 1)] is None          # key with no right rows


def test_asof_join_strict(spark):
    quotes = spark.createDataFrame([("A", 5, 11.0)], "sym string, t int, px double")
    trades = spark.createDataFrame([("A", 5)], "sym string, t int")
    out = asof_join(
        trades, quotes, on=["sym"], left_ts="t", right_ts="t",
        right_values=["px"], strict=True,
    ).collect()
    assert out[0]["r_px"] is None  # strict: right at equal ts NOT visible


def test_top_k_per_group_ties(spark):
    df = spark.createDataFrame(
        [("g", 1, 5), ("g", 2, 5), ("g", 3, 4), ("h", 4, 1)],
        "grp string, id int, v int",
    )
    rows = top_k(
        df, k=2,
        order_by=[F.col("v").desc(), F.col("id").asc()],
        partition_by=["grp"],
    ).collect()
    got = sorted((r["grp"], r["id"]) for r in rows)
    assert got == [("g", 1), ("g", 2), ("h", 4)]


def test_broadcast_join_plan(spark, sf_dir):
    """The physical plan must contain a BroadcastHashJoin — at scale the
    fact side must not shuffle for a dimension join."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    plan = broadcast_join(
        orders, customer, on=F.col("o_custkey") == F.col("c_custkey")
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    """PushedFilters must appear in the parquet scan node."""
    df = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .filter(F.col("l_quantity") > 30)
        .select("l_orderkey", "l_quantity")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,30.0)]" in plan
    assert "ReadSchema: struct<l_orderkey:bigint,l_quantity:double>" in plan


def test_asof_join_tied_right_rows_deterministic(spark):
    """Multiple right rows at the SAME (key, ts): the carried payload
    must be stable (max payload struct wins via the third sort key),
    not partition-order-dependent."""
    left = spark.createDataFrame([(1, 100)], "k int, lts int")
    right = spark.createDataFrame(
        [(1, 50, "a"), (1, 50, "b"), (1, 50, "c")], "k int, rts int, v string"
    )
    for _ in range(3):
        out = asof_join(left, right, on=["k"], left_ts="lts", right_ts="rts",
                        right_values=["v"]).collect()
        assert len(out) == 1 and out[0]["r_v"] == "c"


def test_print_sink_reference_format(spark, capsys):
    """PrintSinkFunction.java:40-85 contract: per-record 'prefix> (a,b)'
    lines; subtask index appears only when parallelism > 1."""
    from min_flink_spark import Stream

    df = spark.createDataFrame([("hello", 1), ("hello", 2)], "w string, c int")
    Stream(df.coalesce(1).sortWithinPartitions("c")).print(prefix="wc")
    out = capsys.readouterr().out.strip().splitlines()
    assert out == ["wc> (hello,1)", "wc> (hello,2)"]

    Stream(df.repartition(4)).print(prefix="wc")
    lines = capsys.readouterr().out.strip().splitlines()
    assert len(lines) == 2
    assert all(l.startswith("wc:") and "> (hello," in l for l in lines)
    # subtask is 1-based
    assert all(int(l.split(":")[1].split(">")[0]) >= 1 for l in lines)

    Stream(df.coalesce(1)).print()
    bare = capsys.readouterr().out.strip().splitlines()
    assert set(bare) == {"(hello,1)", "(hello,2)"}


def test_salted_join_left_preserves_unmatched(spark):
    from pyspark.sql import functions as F

    from min_flink_spark.operators.skew import salted_join

    left = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "zzz")], "id long, k string"
    )
    right = spark.createDataFrame([("a", 10), ("b", 20)], "k string, v long")
    got = {
        (r["id"], r["v"])
        for r in salted_join(
            left, right, on=["k"], salt_col=F.col("id"), salts=4, how="left"
        ).collect()
    }
    assert got == {(1, 10), (2, 20), (3, None)}


def test_salted_join_rejects_right_outer(spark):
    import pytest as _pytest
    from pyspark.sql import functions as F

    from min_flink_spark.operators.skew import salted_join

    df = spark.createDataFrame([(1, "a")], "id long, k string")
    with _pytest.raises(ValueError, match="inner/left"):
        salted_join(df, df, on=["k"], salt_col=F.col("id"), how="full")


def test_salted_join_rejects_salt_column_collision(spark):
    """A pre-existing '_salt' column would be silently dropped by the
    operator's cleanup — must refuse loudly instead (ADVICE r2)."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from min_flink_spark.operators.skew import salted_agg, salted_join

    clean = spark.createDataFrame([(1, "a")], "id long, k string")
    dirty = spark.createDataFrame([(1, "a", 9)], "id long, k string, _salt long")
    for l, r in ((dirty, clean), (clean, dirty)):
        with _pytest.raises(ValueError, match="_salt"):
            salted_join(l, r, on=["k"], salt_col=F.col("id"))
    with _pytest.raises(ValueError, match="_salt"):
        salted_agg(dirty, ["_salt"], {"n": ("count", "id")}, salt_col=F.col("id"))


def test_salted_join_null_salt_rows_survive(spark):
    from pyspark.sql import functions as F

    from min_flink_spark.operators.skew import salted_join

    left = spark.createDataFrame(
        [(1, "a"), (None, "b")], "id long, k string"
    )
    right = spark.createDataFrame([("a", 10), ("b", 20)], "k string, v long")
    got = {
        (r["id"], r["v"])
        for r in salted_join(left, right, on=["k"], salt_col=F.col("id"), salts=4).collect()
    }
    assert got == {(1, 10), (None, 20)}


def test_detect_skew_ranks_heavy_keys(spark):
    from min_flink_spark.operators.skew import detect_skew

    rows = [(i, "hot") for i in range(80)] + [(i, f"k{i % 4}") for i in range(20)]
    df = spark.createDataFrame(rows, "id long, k string")
    top = detect_skew(df, ["k"], top=2).collect()
    assert top[0]["k"] == "hot"
    assert top[0]["n_rows"] == 80
    assert abs(top[0]["share"] - 0.8) < 1e-9


def test_global_rank_matches_unpartitioned_row_number(spark):
    """global_rank's range-partition + offset-self-join decomposition
    must equal row_number() OVER (ORDER BY ...) exactly — including
    with duplicate order values, skewed distributions, and more
    partitions than rows."""
    from pyspark.sql import Window

    from min_flink_spark.operators.relational import global_rank

    rows = [(i, (i * 37) % 11, f"u{i}") for i in range(500)]
    df = spark.createDataFrame(rows, "id long, v long, name string")
    order = [F.col("v").desc(), F.col("id").asc()]
    got = {
        r["id"]: (r["_grank"], r["_total"])
        for r in global_rank(df, order, total_col="_total").collect()
    }
    w = Window.orderBy(*order)
    want = {
        r["id"]: r["rn"]
        for r in df.withColumn("rn", F.row_number().over(w)).collect()
    }
    assert {k: v[0] for k, v in got.items()} == want
    assert all(v[1] == 500 for v in got.values())
    # more partitions than rows: empty range partitions must not shift offsets
    tiny = spark.createDataFrame([(3,), (1,), (2,)], "v long")
    got_tiny = sorted(
        (r["v"], r["_grank"])
        for r in global_rank(tiny, [F.col("v").asc()], num_partitions=8).collect()
    )
    assert got_tiny == [(1, 1), (2, 2), (3, 3)]


def test_global_rank_plan_reuses_range_exchange(spark):
    """The window branch and the count branch must consume the SAME
    range exchange (ReusedExchange in the final adaptive plan) — reuse
    is what guarantees both branches see identical sampled partition
    boundaries; divergent exchanges could silently misalign offsets."""
    from min_flink_spark.operators.relational import global_rank

    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 7).alias("v")
    )
    out = global_rank(df, [F.col("v").asc(), F.col("id").asc()])
    out.collect()  # AQE: reuse is visible only in the final plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in plan or "ReusedQueryStage" in plan or "TableCacheQueryStage" in plan, plan


def test_prefix_sum_over_groups_matches_global_cumsum(spark):
    """Two-level day-partitioned running sum == sum() OVER (ORDER BY t)
    over the whole frame, including negative deltas and multiple rows
    per group."""
    from pyspark.sql import Window

    from min_flink_spark.operators.relational import prefix_sum_over_groups

    rows = [(i, i // 10, 1 if i % 3 else -2) for i in range(200)]
    df = spark.createDataFrame(rows, "t long, g long, d long")
    got = {
        r["t"]: r["cum"]
        for r in prefix_sum_over_groups(
            df, F.col("g"), [F.col("t").asc()], "d", out_col="cum"
        ).collect()
    }
    w = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    want = {r["t"]: r["cum"] for r in df.withColumn("cum", F.sum("d").over(w)).collect()}
    assert got == want


# ---------------------------------------------------------------------------
# Bloom runtime filter (operators/relational.bloom_bitmask/bloom_might_contain)
# ---------------------------------------------------------------------------


def test_bloom_filter_no_false_negatives_bounded_fps(spark):
    """Every member key must pass (the Bloom guarantee the join
    correctness depends on); non-member pass-through stays near the
    analytic (1 - e^(-kn/m))^k bound."""
    from min_flink_spark.operators.relational import (
        bloom_bitmask,
        bloom_might_contain,
    )

    members = spark.range(0, 200).select(F.col("id").alias("k"))
    mask = bloom_bitmask(members, "k", m_bits=4096, k_hashes=3)
    assert len(mask) == 4096 // 64
    fact = spark.range(0, 5000).select(F.col("id").alias("k"))
    passed = {
        r["k"]
        for r in fact.filter(
            bloom_might_contain(F.col("k"), mask, 4096, 3)
        ).collect()
    }
    assert set(range(200)) <= passed, "FALSE NEGATIVE"
    # analytic fp ≈ (1-e^(-3*200/4096))^3 ≈ 0.25% of 4800 ≈ 12; allow 10x
    assert len(passed) - 200 <= 120


def test_bloom_filter_rejects_bad_width_and_is_codegen(spark):
    import pytest as _pytest

    from min_flink_spark.operators.relational import (
        bloom_bitmask,
        bloom_might_contain,
    )

    members = spark.range(0, 10).select(F.col("id").alias("k"))
    with _pytest.raises(ValueError, match="multiple of 64"):
        bloom_bitmask(members, "k", m_bits=100)
    mask = bloom_bitmask(members, "k", m_bits=256, k_hashes=2)
    probe = spark.range(0, 100).select(F.col("id").alias("k")).filter(
        bloom_might_contain(F.col("k"), mask, 256, 2)
    )
    plan = probe._jdf.queryExecution().executedPlan().toString()
    # the probe is a scan-side filter: no join, no exchange, no python
    assert "Exchange" not in plan and "Join" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_bloom_mask_from_words_rejects_mismatched_m_bits(spark):
    """ADVICE r8: a word frame built at one m_bits assembled under a
    smaller m_bits must raise a diagnosable contract error, not a bare
    IndexError (or silently drop high words under a LARGER m_bits)."""
    import pytest as _pytest

    from min_flink_spark.operators.relational import (
        bloom_mask_from_words,
        bloom_word_frame,
    )

    members = spark.range(0, 50).select(F.col("id").alias("k"))
    rows = bloom_word_frame(members, "k", m_bits=4096, k_hashes=3).collect()
    assert max(r["_word"] for r in rows) >= 256 // 64  # premise: overflows 256
    with _pytest.raises(ValueError, match="different m_bits than 256"):
        bloom_mask_from_words(rows, 256)
