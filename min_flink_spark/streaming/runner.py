"""Structured Streaming execution harness.

The reference's execution model — unbounded pipelined dataflow with
continuously-emitting keyed state (SURVEY §3) — maps onto Structured
Streaming micro-batches:

- bounded replay of a stream  → ``Trigger.AvailableNow`` (process all
  available input, then stop — the analog of the reference's
  end-of-input shutdown, ``StreamSource.java:99-140``);
- the reference's 100 ms buffer-flush cadence → processing-time trigger
  interval;
- ``print()`` sink → console sink; tests/driver use the memory sink.

``run_to_completion`` is the bounded-run entry: start, drain, return
the materialized result as a DataFrame.
"""

from __future__ import annotations

import hashlib
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


from contextlib import contextmanager

# Default state width for bounded streaming replays whose state is
# SUMMARY-sized (sketches, window panes, per-key counters over test-SF
# key counts): every shuffle partition costs a state-store instance +
# commit + an Arrow round trip PER MICRO-BATCH, so at small state the
# session's scan-parallelism default (32) is pure overhead — measured
# r14 on the streaming bitmap build: 0.84 s at 8 partitions vs 1.3-1.7 s
# at 32, steady-state. Parameterised (not a local[32] constant): on a
# cluster replaying volumes where per-key state is data-proportional
# (billions of dedup keys), set SPARK_GRAFT_STREAM_STATE_PARTITIONS to
# size partitions at ~100-500 MB of state each — the knob scales the
# same code, nothing in the queries changes.
STREAM_STATE_PARTITIONS = int(
    os.environ.get("SPARK_GRAFT_STREAM_STATE_PARTITIONS", "8")
)


@contextmanager
def shuffle_partitions(spark: SparkSession, n: int):
    """Scoped override of the shuffle width — for stateful streaming
    queries whose state-store partition count is pinned at first run.
    Restores the previous value on exit so batch queries keep the
    session default."""
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


@contextmanager
def no_data_microbatches(spark: SparkSession, enabled: bool):
    """Scoped override of ``spark.sql.streaming.noDataMicroBatches.
    enabled`` (r15, VERDICT r14 item 4). After the last input batch,
    AvailableNow runs one extra NO-DATA micro-batch to advance the
    watermark — required for operators that EMIT on watermark (append-
    mode aggregations, outer joins: their final rows only flush there),
    pure overhead for operators that emit on ARRIVAL and use the
    watermark solely for state eviction (inner interval joins,
    dropDuplicates): the profile attributed ~0.9 s of the inner
    interval join's 2.4 s bounded replay to this batch (state-store
    commit × 16 instances, zero output rows). Only wrap queries whose
    every output row is emitted by data batches — the result set is
    then provably identical; state eviction is moot because the
    bounded replay's stores are discarded at stop."""
    key = "spark.sql.streaming.noDataMicroBatches.enabled"
    prev = spark.conf.get(key)
    spark.conf.set(key, "true" if enabled else "false")
    try:
        yield
    finally:
        spark.conf.set(key, prev)


def stream_parquet(
    spark: SparkSession, path: str, schema: StructType | str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream over parquet; schema must be explicit (file
    sources cannot infer while running). ``path`` may be a directory or
    a single parquet file (staged into a scratch dir via symlink — the
    file source only accepts directories)."""
    return stream_files(spark, path, schema, "parquet", max_files_per_trigger)


def stream_files(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
    **options,
) -> DataFrame:
    """File-source stream over any format (parquet/json/csv/orc/text).
    Single files are staged into a symlink directory (the source only
    accepts directories); schema is mandatory — streaming sources cannot
    infer while running."""
    if os.path.isfile(path):
        path = _stage_file_as_dir(path)
    r = spark.readStream.schema(schema)
    if max_files_per_trigger:
        r = r.option("maxFilesPerTrigger", max_files_per_trigger)
    for k, v in options.items():
        r = r.option(k, v)
    return getattr(r, fmt)(path)


def _stage_file_as_dir(file_path: str) -> str:
    d = os.path.join(
        "/tmp/mfs_stream_stage", hashlib.sha1(file_path.encode()).hexdigest()[:12]
    )
    os.makedirs(d, exist_ok=True)
    link = os.path.join(d, os.path.basename(file_path))
    if not os.path.exists(link):
        os.symlink(file_path, link)
    return d


def run_to_completion(
    df: DataFrame,
    output_mode: str = "update",
    table: str | None = None,
    timeout_sec: int = 120,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Run a streaming DataFrame with AvailableNow to end-of-input and
    return the memory-sink contents. Update/complete mode may hold one
    row per key per batch; with a single input batch the result equals
    the batch answer. Pass ``checkpoint_dir`` to resume offsets/state/
    watermark across successive bounded runs (the reference has no
    checkpointing at all — SURVEY §0 — so this is strictly stronger).

    Heap note (measured, PERF.md r12 sf10 leg): the memory sink keeps
    every emitted row in the driver JVM — ~10M update-mode emissions
    OOM the default 8g driver heap (set SPARK_GRAFT_DRIVER_MEM=32g for
    big bounded replays). This is a TEST-HARNESS sink: production runs
    use foreachBatch into a durable sink (see exactly_once_sink) and
    never route data through the driver."""
    name = table or f"mem_{uuid.uuid4().hex[:8]}"
    w = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
    )
    if checkpoint_dir:
        w = w.option("checkpointLocation", checkpoint_dir)
    q = w.start()
    try:
        if not q.awaitTermination(timeout_sec):
            raise TimeoutError(f"streaming query {name} still running after {timeout_sec}s")
    finally:
        if q.isActive:
            q.stop()
    return df.sparkSession.table(name)


def fresh_attrs(df: DataFrame, *cols: str) -> DataFrame:
    """Rename ``cols`` to ``_<col>`` so ``df`` can be joined back onto
    another frame sharing the same memory-sink lineage.

    THE canonical home of the self-join idiom (VERDICT r11): a
    streaming memory sink's ``MemoryPlan`` leaf does not implement
    multi-instance dedup, so joining two frames derived from one
    :func:`run_to_completion` result on a common column dies with
    ``INTERNAL_ERROR Conflicting attributes``. A subquery
    ``.alias()`` does NOT help — it mints no new attribute ids — and
    a same-name re-projection would be stripped by Catalyst's
    ``RemoveRedundantAliases``. ``withColumnRenamed`` works because
    its Project mints a fresh attribute id for the renamed column, at
    ZERO extra jobs (``localCheckpoint(eager=True)`` also works but
    costs a job and holds blocks). Join on
    ``F.col(c) == F.col(f"_{c}")`` and drop the underscored columns
    in the final select."""
    for c in cols:
        df = df.withColumnRenamed(c, f"_{c}")
    return df


def run_until(
    df: DataFrame,
    batch_fn,
    predicate,
    output_mode: str = "update",
    checkpoint_dir: str | None = None,
    trigger_ms: int = 500,
    timeout_sec: int = 60,
) -> bool:
    """Run a continuous micro-batch query until ``predicate()`` is true
    (or timeout), then stop. This is the harness for pipelines that
    WAIT for something — processing-time timers in particular:
    AvailableNow never terminates once a ProcessingTimeTimeout has been
    registered (the engine keeps scheduling batches for potential timer
    fires), so bounded runs of timer pipelines must stop themselves.
    Returns whether the predicate was met."""
    import time as _time

    w = (
        df.writeStream.foreachBatch(batch_fn)
        .outputMode(output_mode)
        .trigger(processingTime=f"{trigger_ms} milliseconds")
    )
    if checkpoint_dir:
        w = w.option("checkpointLocation", checkpoint_dir)
    q = w.start()
    try:
        deadline = _time.monotonic() + timeout_sec
        while _time.monotonic() < deadline:
            if predicate():
                return True
            if not q.isActive:
                if q.exception() is not None:
                    raise q.exception()  # surface the failure, not False
                return predicate()
            _time.sleep(0.2)
        return predicate()
    finally:
        if q.isActive:
            q.stop()


def run_foreach_batch(
    df: DataFrame,
    fn,
    output_mode: str = "update",
    timeout_sec: int = 120,
    checkpoint_dir: str | None = None,
) -> None:
    """foreachBatch sink (reference addSink analog for arbitrary logic).
    Unlike the memory sink this supports checkpoint recovery, so it is
    the sink for resumable bounded runs."""
    w = df.writeStream.foreachBatch(fn).outputMode(output_mode).trigger(availableNow=True)
    if checkpoint_dir:
        w = w.option("checkpointLocation", checkpoint_dir)
    q = w.start()
    if not q.awaitTermination(timeout_sec):
        q.stop()
        raise TimeoutError("foreachBatch query timed out")


def idempotent_foreach_batch(fn, ledger_dir: str):
    """Exactly-once sink wrapper for ``foreachBatch``: Structured
    Streaming guarantees AT-LEAST-once delivery to the batch function
    (a batch is re-delivered after a crash between sink write and
    offset commit), so any side-effecting sink must dedupe on
    ``batch_id``. This wrapper keeps a file ledger of delivered ids —
    commit marker written AFTER ``fn`` returns — and skips replays:
    ``fn`` runs exactly once per batch id as long as ``fn`` itself is
    atomic-or-idempotent.

    The same pattern at scale: the ledger becomes a transactional table
    (or the sink's own (batchId, partition) dedupe key); the contract —
    dedupe on batch_id, mark AFTER the write — is identical.
    """
    os.makedirs(ledger_dir, exist_ok=True)

    def _wrapped(bdf, batch_id: int):
        marker = os.path.join(ledger_dir, f"batch-{batch_id}.done")
        if os.path.exists(marker):
            return  # replayed batch: already delivered
        fn(bdf, batch_id)
        with open(marker, "w") as fh:
            fh.write("1")

    return _wrapped


def late_data_router(ts_col: str, delay_ms: int, on_time_fn, late_fn):
    """Flink ``sideOutputLateData`` parity as a ``foreachBatch``
    wrapper: rows whose event time trails the watermark established by
    PRIOR batches route to ``late_fn`` (quarantine/metrics/backfill),
    everything else to ``on_time_fn`` — instead of Spark's silent
    in-operator drop.

    The watermark here is the standard bounded-out-of-orderness one
    (max event time seen in completed batches − delay), tracked as ONE
    driver-side scalar per query — the same bounded-metadata contract
    as the streaming oracle sinks. Classification is per micro-batch
    (rows inside one batch never mark each other late), matching
    Spark's own batch-granular watermark advance. Both downstream
    functions receive (DataFrame, batch_id).

    Restart semantics: the scalar lives in this closure, NOT in the
    checkpoint, so after a checkpointed restart the first batch
    classifies everything on-time and the watermark rebuilds from that
    batch onward — weaker than Spark/Flink, whose watermark persists
    in the checkpoint/savepoint. Callers needing restart-exact routing
    must persist ``state["max_ms"]`` alongside their sink ledger (one
    scalar; the ``exactly_once_sink`` marker directory is a natural
    home) and seed it back in before the query restarts.

    Scale: the split is two complementary filters over the same batch
    lineage (Stream.side_output); the scalar max aggregates
    executor-side — no row ever crosses to the driver. The per-batch
    ``localCheckpoint`` (one computation, three consumers) is freed in
    a ``finally`` before the next batch arrives — on a long-running
    stream leaked batch blocks would otherwise accumulate without
    bound. ``DataFrame.unpersist()`` does NOT do this (localCheckpoint
    persists the internal RDD outside the cacheManager that unpersist
    consults — verified on Spark 4.1.2), so the ``finally`` frees the
    batch's OWN checkpoint RDD, extracted from the LogicalRDD leaf of
    the checkpointed frame's plan (core.ckpt.unpersist_checkpoint) —
    targeted, so a second streaming query or a parallel job persisting
    on the same SparkContext is never swept up. The flip side of
    dropping the old context-wide sweep: blocks persisted INSIDE
    ``on_time_fn``/``late_fn`` are now the callback's own to release
    (use unpersist_checkpoint on frames it checkpoints) — a callback
    that persists per batch and never frees grows without bound on an
    unbounded stream."""
    state = {"max_ms": None}

    def route(bdf, batch_id: int) -> None:
        from pyspark.sql import functions as F

        from min_flink_spark.core.ckpt import unpersist_checkpoint
        from min_flink_spark.core.stream import Stream

        bdf = bdf.localCheckpoint(eager=True)  # one computation, three uses
        try:
            wm = state["max_ms"]
            if wm is None:
                late, on_time = None, bdf
            else:
                cutoff = wm - delay_ms
                main_s, late_s = Stream(bdf).side_output(
                    (F.unix_millis(F.col(ts_col).cast("timestamp")) < F.lit(cutoff))
                )
                late, on_time = late_s.df, main_s.df
            if late is not None:
                late_fn(late, batch_id)
            on_time_fn(on_time, batch_id)
            mx = bdf.agg(
                F.max(F.unix_millis(F.col(ts_col).cast("timestamp")))
            ).collect()[0][0]
            if mx is not None:
                state["max_ms"] = mx if wm is None else max(wm, mx)
        finally:
            # downstream fns have acted (writes/collects) by now; the
            # blocks must not outlive the batch on an unbounded stream.
            # DataFrame.unpersist() is a no-op for localCheckpoint
            # blocks, so free THIS batch's checkpoint RDD directly.
            unpersist_checkpoint(bdf, blocking=True)

    return route


def _persistent_rdd_ids(jsc) -> set:
    """Ids of currently-persisted RDDs (JVM-side registry snapshot) —
    introspection for tests asserting the no-leak contract."""
    ids = set()
    it = jsc.getPersistentRDDs().iterator()
    while it.hasNext():
        ids.add(it.next()._1())
    return ids
