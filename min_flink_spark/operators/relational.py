"""Relational operators beyond the reference's surface.

The reference has no joins/sorts/set-ops at all (SURVEY §2.5 —
``DataStream.java:42-314`` is the complete API), so these are the
generalized "Flink-capability" surface, specified by ANSI-SQL semantics
and oracle-checked. Each helper is a declarative DataFrame rewrite so
Catalyst picks the physical strategy; the scale notes on each function
are the design contract for the 100 TB target.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def broadcast_join(
    fact: DataFrame, dim: DataFrame, on: list[str] | Column, how: str = "inner"
) -> DataFrame:
    """Join with an explicit broadcast hint on the dimension side.

    At 100 TB the fact side must never shuffle for a small-dim join;
    ``F.broadcast`` pins the hash-build side regardless of stale stats.
    """
    return fact.join(F.broadcast(dim), on=on, how=how)


def top_k(
    df: DataFrame,
    k: int,
    order_by: list[Column],
    partition_by: list[str] | None = None,
) -> DataFrame:
    """Top-k rows, optionally per group.

    Per-group: one hash shuffle + per-partition sort (row_number) — no
    global sort. Global: Spark's sort-limit pushes the limit into each
    partition (TakeOrderedAndProject), so only k rows per partition
    reach the driver-side merge; pass a deterministic tie-break column
    in ``order_by`` or equal-valued rows make the cut arbitrarily.
    """
    if partition_by:
        w = Window.partitionBy(*partition_by).orderBy(*order_by)
        return (
            df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k)
            .drop("_rn")
        )
    return df.orderBy(*order_by).limit(k)


def distinct_rows(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    return (df.select(*cols) if cols else df).distinct()


def global_index(
    df: DataFrame,
    order_by: list[Column],
    index_col: str = "pos",
    num_partitions: int | None = None,
) -> DataFrame:
    """Assign each row its 1-based position in the TOTAL order given by
    ``order_by`` (callers must make the key unique — add an id tiebreak)
    without ever funneling data through one task.

    A naive ``row_number() OVER (ORDER BY ...)`` collapses the whole
    dataset into a single window partition — the canonical scale-killer
    for epoch shuffling at 100 TB. Instead:

      1. range-partition + sort within partitions on the key
         (the same machinery as a distributed ORDER BY),
      2. count rows per partition — only ``num_partitions`` longs cross
         to the driver, never data,
      3. add ``cumulative_offset[pid] + local_running_count`` per
         partition in one Arrow ``mapInPandas`` pass (narrow, preserves
         the sorted partition order).

    The result is identical to the single-partition ``row_number`` (the
    oracle replays exactly that) at O(rows/partitions) peak memory.

    Block lifetime: the checkpoint blocks belong to the INTERNAL ranged
    frame, not the returned DataFrame — and ``.unpersist()`` is a no-op
    on BOTH (localCheckpoint persists the internal RDD outside the
    cacheManager). The backing frame is exposed as
    ``result._graft_backing``: in a per-epoch loop call
    ``core.ckpt.unpersist_checkpoint(result._graft_backing)`` after
    consuming each epoch to free its blocks deterministically;
    otherwise they are freed only when the result's last reference
    drops and the ContextCleaner runs. Holding N epochs' results alive
    pins N copies.
    """
    spark = df.sparkSession
    n = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    ranged = (
        df.repartitionByRange(n, *order_by)
        .sortWithinPartitions(*order_by)
        .withColumn("_pid", F.spark_partition_id())
        # materialize once: the per-partition counts and the index pass
        # would otherwise each re-run the range shuffle
        .localCheckpoint(eager=True)
    )
    counts = {
        r["_pid"]: r["c"]
        for r in ranged.groupBy("_pid").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    out_schema = ranged.drop("_pid").schema.add(index_col, "long")
    out_cols = [f.name for f in out_schema.fields]

    def _index(batches):
        seen = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            base = offsets[int(pdf["_pid"].iloc[0])]
            pdf = pdf.drop(columns=["_pid"])
            pdf[index_col] = range(base + seen + 1, base + seen + 1 + len(pdf))
            seen += len(pdf)
            yield pdf[out_cols]

    out = ranged.mapInPandas(_index, schema=out_schema)
    out._graft_backing = ranged  # for deterministic block release (see docstring)
    return out


def global_rank(
    df: DataFrame,
    order_by: list[Column],
    rank_col: str = "_grank",
    total_col: str | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact 1-based global row rank under the TOTAL order ``order_by``
    (callers must make the key unique — add an id tiebreak), as one
    declarative all-JVM plan with no single-partition stage and no
    driver round-trip.

    ``row_number() OVER (ORDER BY ...)`` with no PARTITION BY is the
    canonical 100 TB scale-killer (one task sorts everything — the
    ``WindowExec: No Partition Defined`` warning). Equivalent rank,
    distributed:

      1. range-partition on the key (sampled skew-aware boundaries,
         the same machinery as a distributed ORDER BY),
      2. local ``row_number`` per range partition — a PARTITIONED
         window, never a global one,
      3. per-partition row counts turned into prefix offsets by a
         self-join over the ≤``num_partitions``-row count frame
         (an O(P²) triangle join on a partition-count-bounded frame —
         deliberately NOT an unpartitioned window, which would re-warn,
         and NOT a collect, so the whole thing stays one lazy plan),
      4. broadcast the offsets (bounded by partition count, not SF)
         back on partition id: rank = offset + local row number.

    Both consumers of the range exchange (the window branch and the
    count branch) are the identical exchange subplan, so Catalyst
    reuses it (``ReusedExchange`` — plan-locked by test; reuse is what
    guarantees both branches see the same sampled boundaries).

    With ``total_col`` set, the total row count rides along as a column
    from the same count frame (1-row broadcast cross join) — rank
    thresholds like ntile cut-ranks or percentile positions can then be
    computed in-plan without any driver-side count().

    Unlike :func:`global_index` (Arrow ``mapInPandas`` + bounded
    driver collect) this variant is pure JVM codegen and fully lazy;
    prefer it when the consumer is relational. ``global_index`` remains
    for callers that need the materialized-epoch / backing-block
    contract."""
    spark = df.sparkSession
    n = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32")
    )
    ranged = df.repartitionByRange(n, *order_by).withColumn(
        "_pid", F.spark_partition_id()
    )
    w = Window.partitionBy("_pid").orderBy(*order_by)
    local = ranged.withColumn("_lrn", F.row_number().over(w))
    pc = ranged.groupBy("_pid").agg(F.count(F.lit(1)).alias("_pc"))
    off = (
        pc.alias("a")
        .join(pc.alias("b"), F.col("b._pid") < F.col("a._pid"), "left")
        .groupBy(F.col("a._pid").alias("_pid"))
        .agg(F.coalesce(F.sum("b._pc"), F.lit(0)).alias("_off"))
    )
    out = local.join(F.broadcast(off), "_pid").withColumn(
        rank_col, (F.col("_off") + F.col("_lrn")).cast("bigint")
    )
    if total_col is not None:
        total = pc.agg(F.sum("_pc").cast("bigint").alias(total_col))
        out = out.crossJoin(F.broadcast(total))
    return out.drop("_pid", "_lrn", "_off")


def prefix_sum_over_groups(
    df: DataFrame,
    part_col: str | Column,
    order_by: list[Column],
    value_col: str | Column,
    out_col: str = "_cumsum",
) -> DataFrame:
    """Global running sum in ``order_by`` order WITHOUT an
    unpartitioned window, for inputs whose ``part_col`` (e.g. a
    calendar day) is domain-bounded and sorts consistently with the
    global order (every row of a lesser partition precedes every row
    of a greater one).

    Two-level decomposition: a PARTITIONED window gives the running
    sum within each partition; the carry-in from all earlier
    partitions comes from a triangle self-join over the per-partition
    totals frame — O(B²) join rows where B is the number of distinct
    partitions (days: thousands over a decade), independent of row
    count. Identical values to ``sum() OVER (ORDER BY ...)``; the
    shape survives 100× because no stage ever sees more than one
    partition's rows in one task."""
    part = F.col(part_col) if isinstance(part_col, str) else part_col
    val = F.col(value_col) if isinstance(value_col, str) else value_col
    tagged = df.withColumn("_ppart", part)
    w = (
        Window.partitionBy("_ppart")
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = tagged.withColumn("_plocal", F.sum(val).over(w))
    tot = tagged.groupBy("_ppart").agg(F.sum(val).alias("_ptot"))
    carry = (
        tot.alias("a")
        .join(tot.alias("b"), F.col("b._ppart") < F.col("a._ppart"), "left")
        .groupBy(F.col("a._ppart").alias("_ppart"))
        .agg(F.coalesce(F.sum("b._ptot"), F.lit(0)).alias("_pcarry"))
    )
    return (
        local.join(F.broadcast(carry), "_ppart")
        .withColumn(out_col, F.col("_pcarry") + F.col("_plocal"))
        .drop("_ppart", "_plocal", "_pcarry")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_values: list[str],
    strict: bool = False,
) -> DataFrame:
    """As-of join: for each left row, the latest right row with
    ``right_ts <= left_ts`` (``<`` when ``strict``) per key.

    Implemented as union → single co-partitioned window sort →
    last-non-null carry-forward, i.e. ONE shuffle on the key, linear in
    |left|+|right|. Never a range cross-join (which explodes at scale);
    equivalent to DuckDB's native ASOF JOIN used as the oracle.
    """
    lcols = left.columns
    payload = F.struct(*[F.col(c) for c in right_values])
    # Right rows sort before left rows at equal timestamp so that a
    # right row at exactly left_ts is visible (non-strict semantics);
    # strict flips the tag order.
    right_tag, left_tag = (1, 0) if strict else (0, 1)
    r = right.select(
        *[F.col(c) for c in on],
        F.col(right_ts).alias("_ts"),
        F.lit(right_tag).alias("_side"),
        payload.alias("_payload"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c not in on],
    )
    l = left.select(
        *[F.col(c) for c in on],
        F.col(left_ts).alias("_ts"),
        F.lit(left_tag).alias("_side"),
        F.lit(None).cast(r.schema["_payload"].dataType).alias("_payload"),
        *[F.col(c) for c in lcols if c not in on],
    )
    # _payload as the third sort key: right rows tied on (key, _ts)
    # would otherwise order arbitrarily, making the carried payload
    # nondeterministic (run-to-run AND vs the oracle). Left rows all
    # have a null payload, so their relative order stays irrelevant.
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("_ts"), F.col("_side"), F.col("_payload").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = r.unionByName(l).withColumn(
        "_matched", F.last(F.col("_payload"), ignorenulls=True).over(w)
    )
    out = carried.filter(F.col("_side") == left_tag).select(
        *[F.col(c) for c in lcols],
        *[F.col(f"_matched.{v}").alias(f"r_{v}") for v in right_values],
    )
    return out


def bloom_bitmask(
    keys: DataFrame, key_col: str, m_bits: int = 8192, k_hashes: int = 3
) -> list[int]:
    """Build a Bloom filter over ``keys[key_col]`` as ``m_bits/64``
    driver-side longs — the RUNTIME-FILTER build side (what Spark's own
    InjectRuntimeFilter and every warehouse's dynamic filtering do):
    the dim side's key set compresses to a fixed-size bitmask that
    broadcasts to every fact task, so fact rows that cannot join are
    dropped AT THE SCAN, before the shuffle the join would otherwise
    pay. Guarantees: NO false negatives ever (a joining row always
    passes); false positives bounded by ~(1 − e^(−k·n/m))^k.

    Hashing is the engine-portable md5 idiom (``hash_bucket`` — row i
    probes ``md5_bucket(key ‖ ':' ‖ i, m)``), so any engine can replay
    membership relationally (the gate oracle does). The build is one
    posexplode + bit_or hash-agg; only ``m_bits/64`` longs cross to the
    driver (bounded metadata, the IVF-centroid contract). m must be a
    multiple of 64.
    """
    rows = bloom_word_frame(keys, key_col, m_bits, k_hashes).collect()
    return bloom_mask_from_words(rows, m_bits)


def bloom_word_frame(
    keys: DataFrame, key_col: str, m_bits: int = 8192, k_hashes: int = 3
) -> DataFrame:
    """The build side as a DataFrame of ``(_word, _mask)`` bit-or
    partials — the ONE copy of the word/bit packing arithmetic, shared
    by the batch build (``bloom_bitmask`` collects it) and the
    streaming build (it is a plain projection + ``bit_or`` aggregation,
    so it runs verbatim as a streaming aggregation whose state is the
    m/64 words; bits only turn ON, so update-mode emissions collapse by
    a second ``bit_or``)."""
    from min_flink_spark.functions.hashing import hash_bucket

    if m_bits % 64:
        raise ValueError(f"m_bits {m_bits} not a multiple of 64")
    pos = F.array(
        *[
            hash_bucket(
                F.concat_ws(":", F.col(key_col).cast("string"), F.lit(str(i))),
                m_bits,
            )
            for i in range(k_hashes)
        ]
    )
    return (
        keys.select(F.explode(pos).alias("_pos"))
        .select(
            (F.col("_pos") / 64).cast("int").alias("_word"),
            # call_function: the SQL shiftleft takes a column shift;
            # the python wrapper's signature restricts it to int
            F.call_function(
                "shiftleft", F.lit(1).cast("bigint"), F.col("_pos") % 64
            ).alias("_bit"),
        )
        .groupBy("_word")
        .agg(F.bit_or("_bit").alias("_mask"))
    )


def bloom_mask_from_words(rows, m_bits: int) -> list[int]:
    """Assemble collected ``(_word, _mask)`` rows into the dense
    ``m_bits/64``-long bitmask (missing words are 0). Rejects word
    ids outside ``[0, m_bits/64)`` loudly — that means the word frame
    was built with a LARGER ``m_bits`` than the one passed here (a
    contract mismatch, not data corruption). The check is inherently
    one-sided: a frame built at a SMALLER m_bits has only small word
    ids and cannot be detected here — same-m_bits build/assemble/probe
    is the caller's contract, exactly as for ``bloom_might_contain``'s
    k_hashes."""
    n_words = m_bits // 64
    mask = [0] * n_words
    for r in rows:
        w = r["_word"]
        if not 0 <= w < n_words:
            raise ValueError(
                f"bloom word id {w} outside [0, {n_words}) — the word "
                f"frame was built with a different m_bits than {m_bits}"
            )
        mask[w] = r["_mask"]
    return mask


def bloom_might_contain(
    key: Column, mask: list[int], m_bits: int, k_hashes: int = 3
) -> Column:
    """Membership predicate against a ``bloom_bitmask`` — pure
    whole-stage-codegen arithmetic (array literal lookup + shift/AND
    per probe, O(1) each), no UDF, no join: the PROBE side of the
    runtime filter, applied as an ordinary ``filter`` so it rides the
    scan and prunes before any shuffle.

    CUTOVER: the mask here is a PLAN-LITERAL array — exactly right up
    to ~64K bits (1024 longs; the gate uses 8192), where the
    expression tree stays small and every probe is one in-register
    lookup. Beyond that (a 100 TB dim side wants m in the hundreds of
    megabits) plan-literal arrays die on expression-tree size and task
    binary bloat LONG before memory does — use ``bloom_probe_tag`` /
    ``bloom_probe_filter``, which keep the mask as the ``(word, mask)``
    DATA frame and probe via k broadcast equi-joins on ``pos div 64``
    (same arithmetic, same no-false-negative guarantee, fact side
    never shuffles)."""
    from min_flink_spark.functions.hashing import hash_bucket

    arr = F.array(*[F.lit(int(w)) for w in mask])
    probe = None
    for i in range(k_hashes):
        pos = hash_bucket(
            F.concat_ws(":", key.cast("string"), F.lit(str(i))), m_bits
        )
        word = F.element_at(arr, ((pos / 64).cast("int") + 1))
        hit = (
            F.call_function("shiftrightunsigned", word, pos % 64).bitwiseAND(
                F.lit(1)
            )
            == 1
        )
        probe = hit if probe is None else (probe & hit)
    return probe


def bloom_probe_tag(
    fact: DataFrame,
    key_col: str,
    words: DataFrame,
    m_bits: int,
    k_hashes: int = 3,
) -> DataFrame:
    """Large-m Bloom probe (VERDICT r8 item 3) — tag ``fact`` with a
    ``bloom_pass`` boolean WITHOUT materializing the mask in the plan:
    the filter stays as the ``(_word, _mask)`` frame
    (``bloom_word_frame`` output, m/64 rows of data, not expression
    tree), and each of the ``k_hashes`` probes is a broadcast LEFT
    equi-join on ``pos div 64`` followed by the same shift/AND bit
    test the literal path uses. The fact side NEVER shuffles — all k
    joins are broadcast-hash, pipelined in the scan stage — so this is
    the same scan-side runtime-filter shape at any m: 1M bits is a
    16K-row build side, 1G bits ~16M rows / ~256 MB (the practical
    broadcast ceiling; beyond that, bucket the words and co-partition —
    at that point Spark's native ``bloom_filter_agg`` is the better
    tool and this frame-based shape is its engine-portable twin). A
    missing word row means those 64 bits are all zero → miss
    (``coalesce`` to false). Same m_bits/k_hashes as the build or the
    probe is garbage — same contract as ``bloom_might_contain``.
    The broadcast hint is on the BOUNDED word frame (≤ m/64 rows,
    data-independent), never an SF-scaling table."""
    from min_flink_spark.functions.hashing import hash_bucket

    if m_bits % 64:
        raise ValueError(f"m_bits {m_bits} not a multiple of 64")
    # the probe plumbs fixed helper columns through the fact frame; a
    # caller column with one of these names would be silently dropped
    # by the per-iteration drop() or make the _bw equi-join ambiguous
    # (ADVICE r9) — refuse loudly instead
    reserved = {"_bp", "_bw", "_bm", "bloom_pass"} | {
        f"_hit{i}" for i in range(k_hashes)
    }
    clash = reserved.intersection(fact.columns)
    if clash:
        raise ValueError(
            f"bloom_probe_tag: fact frame columns {sorted(clash)} collide "
            "with the probe's helper columns — rename them first"
        )
    out = fact
    hits = []
    for i in range(k_hashes):
        pos = hash_bucket(
            F.concat_ws(":", F.col(key_col).cast("string"), F.lit(str(i))),
            m_bits,
        )
        # SAME alias names every iteration (dropped before the next
        # join) so all k broadcast build subplans are IDENTICAL and
        # ReuseExchange materializes the word frame ONCE, not k times
        wf = words.select(
            F.col("_word").alias("_bw"), F.col("_mask").alias("_bm")
        )
        out = (
            out.withColumn("_bp", pos)
            .withColumn("_bw", (F.col("_bp") / 64).cast("int"))
            .join(F.broadcast(wf), "_bw", "left")
            .withColumn(
                f"_hit{i}",
                F.coalesce(
                    F.call_function(
                        "shiftrightunsigned",
                        F.col("_bm"),
                        F.col("_bp") % 64,
                    ).bitwiseAND(F.lit(1))
                    == 1,
                    F.lit(False),
                ),
            )
            .drop("_bp", "_bw", "_bm")
        )
        hits.append(f"_hit{i}")
    passed = F.col(hits[0])
    for h in hits[1:]:
        passed = passed & F.col(h)
    return out.withColumn("bloom_pass", passed).drop(*hits)


def bloom_probe_filter(
    fact: DataFrame,
    key_col: str,
    words: DataFrame,
    m_bits: int,
    k_hashes: int = 3,
) -> DataFrame:
    """The production form of the large-m probe: keep only rows that
    pass all ``k_hashes`` bit tests (no false negatives ever — a
    joining row always survives). See ``bloom_probe_tag`` for the plan
    shape; the pass predicate is a conjunction, so Catalyst pushes each
    conjunct to the earliest join that can evaluate it.

    WHEN to prefilter (measured, PERF.md round 10): the probe costs
    k hashes per fact row riding the scan, so it pays only when the
    shuffle bytes it eliminates dominate — expected survivor fraction
    small (≲10%) and/or wide payload rows. On a narrow-row fact at
    ~50% selectivity the probe DOUBLED end-to-end join time at 20M
    rows; on a 1.6%-selectivity payload-bearing fact it won. (Spark's
    own bloom_filter_agg/might_contain are optimizer-internal in this
    build — not user-callable — so this frame probe is the invocable
    runtime filter; see the PERF.md A/B.)"""
    return bloom_probe_tag(fact, key_col, words, m_bits, k_hashes).filter(
        F.col("bloom_pass")
    ).drop("bloom_pass")
