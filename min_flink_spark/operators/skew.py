"""Skew mitigation: salted two-phase aggregation and salted joins.

MEASURED guidance (tools/skew_smoke.py, 200M rows with one key owning
30%, 2M-key dim past the broadcast threshold; PERF.md round 12):

- JOIN skew is real and the toolkit earns its keep: the straggler
  baseline ran 43.2s; AQE's skew split at DEFAULT thresholds barely
  moved it (41.5s — the 256MB threshold/64MB advisory left most of
  the hot partition intact on this layout); ``salted_join`` cut it to
  31.9s with no engine-config change, and AQE with tuned thresholds
  (64MB/32MB/factor 2) reached 29.9s. Portable fix vs config fix —
  comparable outcomes, measured.
- AGGREGATION skew over DECOMPOSABLE ops is already absorbed by
  Spark's map-side partial aggregation: the hot key reaches the
  reducer as <= n_partitions partial rows, not 0.3*N rows. Plain
  ``groupBy().sum()`` ran 4.1s where ``salted_agg`` paid 22.3s for
  its extra shuffle-sized grouping. Use ``salted_agg`` ONLY where the
  per-group partial state is itself huge (exact per-key distinct via
  two-level groupBy, array/set building) — never for plain
  sum/count/min/max.

The salt is md5-derived from a stable column (NOT rand()): identical
results on retry/replay, which matters for exactly-once sinks.

DECISION RECIPE — measure before salting (r13, both branches now
measured; ``tools/skew_smoke.py`` prints these numbers for any table
via ``--natural <sf_dir>``):

1. Compute the hottest key's row count and multiply by bytes/row from
   table stats → the hot key's shuffle-partition size.
2. Compare against what AQE's skew split needs to trigger:
   ``max(spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes
   (default 256MB), 5 × median partition size)``.
3. Hot partition BELOW the threshold → DO NOTHING. Measured on the
   sf10 parquet's natural skew (15M orders ⋈ 1.5M customer on
   o_custkey: hottest customer 24 rows ≈ 0.0005MB; 10M events
   groupBy user_id: hottest user 99 rows ≈ 0.002MB — both orders of
   magnitude under 256MB): the plain AQE join ran 1.03 s while
   ``salted_join`` paid **17.6 s** (the dim-side ×16 replication is
   pure overhead with no straggler to kill) and ``salted_agg`` paid
   1.55 s vs 0.43 s plain. Salting un-skewed data is a ~10× tax.
4. Hot partition ABOVE the threshold → let AQE's split try first
   (zero code change); reach for ``salted_join`` when AQE can't see
   the shuffle (non-shuffle layouts, older runtimes) or its default
   thresholds leave the partition intact — the synthetic 200M-row /
   30%-hot-key leg measured naive 43.2 s, AQE-default 41.5 s,
   salted_join 31.9 s.
5. ``salted_agg`` is justified ONLY by huge per-group partial state
   (exact distincts, array building) — never by decomposable
   aggregates, where map-side combine already absorbs the skew
   (measured 5× loss on the synthetic leg, 3.6× on natural sf10).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from min_flink_spark.functions.hashing import hash_bucket

_PARTIAL = {
    "sum": F.sum,
    "count": F.count,
    "min": F.min,
    "max": F.max,
}
_COMBINE = {
    "sum": F.sum,
    "count": F.sum,  # counts combine by summing partial counts
    "min": F.min,
    "max": F.max,
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_col: Column,
    salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation: groupBy(keys + salt) → groupBy(keys).

    ``aggs`` maps output name → (op, column); ``salt_col`` is any
    stable, roughly-uniform column (e.g. the row's id). Decomposable
    ops only — avg must be expressed as sum/count by the caller.

    SCOPE (measured, see module docstring): for these decomposable
    ops Spark's map-side partial aggregation already neutralizes key
    skew, and this operator is ~5x SLOWER than the plain groupBy at
    200M rows/30% hot key. It exists for callers whose first-phase
    groups carry large intermediate state (the exact-distinct
    two-level groupBy pattern, where the "salt" is the distinct value
    itself) — reach for plain ``groupBy`` first.
    """
    if "_salt" in keys:
        raise ValueError(
            "salted_agg: '_salt' is the operator's working column — "
            "rename the grouping key"
        )
    salt = hash_bucket(salt_col, salts).alias("_salt")
    partial = df.groupBy(*[F.col(k) for k in keys], salt).agg(
        *[_PARTIAL[op](col).alias(name) for name, (op, col) in aggs.items()]
    )
    return partial.groupBy(*[F.col(k) for k in keys]).agg(
        *[_COMBINE[op](name).alias(name) for name, (op, _) in aggs.items()]
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    salt_col: Column,
    salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-spread equi-join: salt the skewed LEFT side, replicate the
    small RIGHT side ``salts``× (one copy per salt value), join on
    ``on + [salt]``.

    A hot join key (one key = 30% of the fact) funnels into a single
    reducer under a plain shuffle join even with AQE splitting on some
    layouts; salting spreads every key across ``salts`` sub-partitions
    deterministically. Result row-set is identical to the direct join:
    each left row carries exactly ONE salt, and the right side covers
    all salts, so multiplicity is preserved.

    Only ``inner`` and ``left`` joins are valid — a right/full join
    would surface each unmatched right row ``salts`` times. The right
    side must be the small one (its replication is ``salts``×; if it
    fits a broadcast, use ``broadcast_join`` instead — salting is for
    the middle regime: too big to broadcast, too skewed to shuffle).
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports inner/left, got {how!r}: a right/full "
            "join would duplicate unmatched right rows across salts"
        )
    # The working column must not shadow a user column: select('*', salt)
    # would create a duplicate '_salt' and the final drop would silently
    # remove the user's — refuse loudly instead.
    for side, cols in (("left", left.columns), ("right", right.columns)):
        if "_salt" in cols:
            raise ValueError(
                f"salted_join: {side} input already has a '_salt' column — "
                "rename it; the operator uses '_salt' as its working column"
            )
    # NULL-safe salt: hash_bucket(NULL) is NULL, which would silently
    # drop (inner) or un-match (left) rows with a null salt column —
    # coalesce to a sentinel so every row lands in a real salt bucket.
    salt = hash_bucket(
        F.coalesce(salt_col.cast("string"), F.lit("∅")), salts
    ).alias("_salt")
    salted_l = left.select("*", salt)
    replicated_r = right.select(
        "*",
        F.explode(
            F.sequence(F.lit(0).cast("bigint"), F.lit(salts - 1).cast("bigint"))
        ).alias("_salt"),
    )
    return salted_l.join(replicated_r, on=on + ["_salt"], how=how).drop("_salt")


def detect_skew(
    df: DataFrame, keys: list[str], top: int = 10
) -> DataFrame:
    """Skew diagnostic: the ``top`` heaviest key groups with their row
    counts and share of the table — the number you look at before
    choosing broadcast vs salt vs AQE for a join/agg on ``keys``.

    One aggregation + a top-k (TakeOrderedAndProject); the total rides
    the same pass via a window-free broadcast cross join, so the whole
    diagnostic is two small jobs regardless of table size.
    """
    counts = df.groupBy(*[F.col(k) for k in keys]).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    total = counts.agg(F.sum("n_rows").alias("_total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            *keys,
            "n_rows",
            (F.col("n_rows").cast("double") / F.col("_total")).alias("share"),
        )
        .orderBy(F.col("n_rows").desc(), *[F.col(k) for k in keys])
        .limit(top)
    )
