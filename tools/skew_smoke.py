"""Measured skew leg: does the skew toolkit actually beat the naive plan?

The skew story so far is plan-shape argument (operators/skew.py
docstrings, README guidance: "broadcast the small side, salt the
too-big-to-broadcast hot-key regime, AQE handles the rest").  This
tool turns each claim into a number on a deliberately hostile dataset:

  fact: N rows, ONE key owning ``hot_share`` (default 30%) of them,
        the rest uniform over ``n_keys`` keys (Spark range + pure
        column exprs — no parquet, so the leg scales to any N);
  dim:  one row per key, sized past the broadcast threshold so the
        join genuinely shuffles (the "middle regime" salted_join is
        for).

Matrix measured (each timed as agg-to-one-row so driver transfer is
out of the picture; min of ``reps``):

  join-naive     plain shuffle join, AQE skew-join split DISABLED —
                 the straggler baseline
  join-aqe       plain shuffle join, AQE skew-join split ENABLED —
                 what the engine default gives you
  join-salted    operators/skew.salted_join (AQE on; salts=16)
  agg-naive      plain groupBy().sum() on the hot key distribution
  agg-salted     operators/skew.salted_agg (salts=16)

Expected honest outcomes (verify, then write them into PERF.md):
- join-naive shows the straggler tail; join-aqe should largely close
  it (AQE splits the hot partition at runtime); salted_join should be
  competitive with join-aqe and is the portable fix where AQE's
  split doesn't trigger (non-shuffle layouts, older runtimes).
- agg-naive is EXPECTED TO WIN or tie: decomposable aggregates are
  absorbed by map-side partial aggregation (the hot key reaches the
  reducer as <= n_partitions partial rows, not 0.3*N rows), so
  salting buys nothing and pays an extra shuffle-sized grouping.
  salted_agg's real use is the non-decomposable / huge-partial regime
  (exact per-key distincts, array building), not plain sums.

Usage: python tools/skew_smoke.py [--rows 40000000] [--keys 2000000]
           [--hot-share 0.3] [--salts 16] [--reps 2]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, functions as F

from min_flink_spark.operators.skew import salted_agg, salted_join
from min_flink_spark.session import get_spark


def _arg(args: list[str], flag: str, default, cast):
    if flag in args:
        k = args.index(flag)
        v = cast(args[k + 1])
        del args[k : k + 2]
        return v
    return default


def build_fact(spark, rows: int, n_keys: int, hot_share: float) -> DataFrame:
    """id-derived deterministic skew: first hot_share of ids -> key 0,
    rest uniform over [1, n_keys). Column exprs only — codegen, no UDF."""
    return spark.range(rows).select(
        F.when(F.col("id") < int(rows * hot_share), F.lit(0))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(n_keys - 1)) + 1)
        .alias("k"),
        (F.col("id") % 1000).alias("v"),
    )


def build_dim(spark, n_keys: int) -> DataFrame:
    # ~3 columns x n_keys rows; at n_keys=2M this is ~50 MB serialized,
    # past the 10 MB autoBroadcastJoinThreshold -> real shuffle join
    return spark.range(n_keys).select(
        F.col("id").alias("k"),
        F.pmod(F.xxhash64(F.col("id") + 7), F.lit(100)).alias("grp"),
        (F.col("id") * 2).alias("w"),
    )


def timed(label: str, reps: int, fn) -> float:
    best = None
    for _ in range(reps):
        t0 = time.time()
        out = fn()
        took = time.time() - t0
        best = took if best is None else min(best, took)
        print(f"  {label}: {took:.2f}s -> {out}", flush=True)
    return best


def main() -> int:
    args = list(sys.argv[1:])
    rows = _arg(args, "--rows", 40_000_000, int)
    n_keys = _arg(args, "--keys", 2_000_000, int)
    hot_share = _arg(args, "--hot-share", 0.3, float)
    salts = _arg(args, "--salts", 16, int)
    reps = _arg(args, "--reps", 2, int)

    spark = get_spark(app_name="skew-smoke")
    spark.sparkContext.setLogLevel("ERROR")
    fact = build_fact(spark, rows, n_keys, hot_share)
    dim = build_dim(spark, n_keys)

    def checksum(df: DataFrame):
        # one-row reduction: sum over a join/agg output column + count,
        # so every variant is also cross-checked for identical results
        r = df.agg(
            F.sum("w").alias("s"), F.count(F.lit(1)).alias("n")
        ).collect()[0]
        return (r["s"], r["n"])

    results: dict[str, float] = {}
    sums: dict[str, tuple] = {}

    print(f"fact={rows} rows, hot key 0 = {hot_share:.0%}, dim={n_keys} keys, salts={salts}", flush=True)

    # --- join variants -------------------------------------------------
    def run_join(skew_split: bool):
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(skew_split).lower())
        try:
            return checksum(fact.join(dim, "k", "inner"))
        finally:
            spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")

    results["join_naive_noaqe_split"] = timed(
        "join-naive (AQE skew split off)", reps, lambda: run_join(False)
    )
    sums["join_naive"] = run_join(False)
    results["join_aqe"] = timed(
        "join-aqe (default engine)", reps, lambda: run_join(True)
    )
    sums["join_aqe"] = run_join(True)
    results["join_salted"] = timed(
        f"join-salted (salts={salts})",
        reps,
        lambda: checksum(salted_join(fact, dim, ["k"], F.col("v"), salts=salts)),
    )
    sums["join_salted"] = checksum(salted_join(fact, dim, ["k"], F.col("v"), salts=salts))

    # --- agg variants ----------------------------------------------------
    def agg_checksum(df: DataFrame):
        r = df.agg(F.sum("s").alias("s"), F.count(F.lit(1)).alias("n")).collect()[0]
        return (r["s"], r["n"])

    results["agg_naive"] = timed(
        "agg-naive (plain groupBy sum)",
        reps,
        lambda: agg_checksum(fact.groupBy("k").agg(F.sum("v").alias("s"))),
    )
    results["agg_salted"] = timed(
        f"agg-salted (salts={salts})",
        reps,
        lambda: agg_checksum(
            salted_agg(fact, ["k"], {"s": ("sum", "v")}, F.col("v"), salts=salts)
        ),
    )
    # ADVICE r12: the agg variants are evidence behind operators/skew's
    # salted_agg guidance, so their results must be ASSERTED equal,
    # not just printed (v is bigint — sums are exact, order-free).
    sums["agg_naive"] = agg_checksum(fact.groupBy("k").agg(F.sum("v").alias("s")))
    sums["agg_salted"] = agg_checksum(
        salted_agg(fact, ["k"], {"s": ("sum", "v")}, F.col("v"), salts=salts)
    )

    print("\n== result cross-check (all join variants must match) ==")
    print(sums)
    assert sums["join_naive"] == sums["join_aqe"] == sums["join_salted"], "variant results differ!"
    assert sums["agg_naive"] == sums["agg_salted"], "agg variant results differ!"

    print("\n== min times ==")
    for k, v in results.items():
        print(f"{k}: {v:.2f}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
