"""Keyed stateful processing — the reference's hardest-to-map feature.

The reference's contract (SURVEY §2.8): per-key ``ValueState`` (the only
state kind, ``FC/api/common/state/KeyedStateStore.java:74``), a
continuously-emitting keyed reduce (``StreamGroupedReduce.java:11-54``),
and a vestigial ``KeyedProcessFunction`` (``FSJ/api/functions/
KeyedProcessFunction.java`` — processElement + onTimer, never wired to
the API). Spark-side this is ``applyInPandasWithState``: per-key
GroupState + processing-time timeouts, Arrow-batched.

``KeyedProcessFunction`` here is the user-facing class; ``process_keyed``
wires it into a streaming plan. State is a single Row matching
``state_schema`` (= ValueState semantics); ``on_timeout`` ≈ the
reference's timer callback (processing-time only — exactly the trim's
capability, ``StreamSourceContexts.java:41-47``).
"""

from __future__ import annotations

from collections.abc import Iterable
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


class KeyedProcessFunction:
    """Subclass and override. Rows arrive as pandas DataFrames per key;
    ``state`` is a tuple (or None on first call) matching state_schema."""

    #: Spark DDL schema strings
    state_schema: str = ""
    output_schema: str = ""
    #: When True, all Arrow chunks of a key's batch are concatenated
    #: before process_element — REQUIRED for order-sensitive logic
    #: (chunks arrive in shuffle order, split at
    #: spark.sql.execution.arrow.maxRecordsPerBatch; sorting within a
    #: chunk is not sorting within the batch). Costs one key-group in
    #: memory, same bound as applyInPandas.
    needs_full_group: bool = False

    def process_element(
        self, key: tuple, rows: pd.DataFrame, state: tuple | None
    ) -> tuple[pd.DataFrame | None, tuple | None]:
        """Return (output rows or None, new state or None-to-clear)."""
        raise NotImplementedError

    def on_timeout(self, key: tuple, state: tuple | None) -> tuple[pd.DataFrame | None, tuple | None]:
        return None, None


def process_keyed(
    df: DataFrame,
    keys: list[str],
    fn: KeyedProcessFunction,
    output_mode: str = "update",
    timeout_ms: int | None = None,
) -> DataFrame:
    """Wire a KeyedProcessFunction into a (streaming) grouped plan.

    One shuffle on the key; state lives in the executor-side state store
    partitioned identically, so a key's records and state are always
    co-located — the same layout the reference builds with key-group
    hash partitioning (KeyGroupStreamPartitioner.java:32-56).

    Partition-count note: the stateful shuffle width is fixed at the
    query's FIRST run (state stores cannot re-partition); each partition
    costs a state-store instance + an Arrow/Python round-trip per batch.
    Wrap query start in ``runner.shuffle_partitions(spark, n)`` to size
    it to key volume rather than the batch default."""

    def _handle(key: tuple, pdf_iter: Iterable[pd.DataFrame], state: GroupState):
        current: tuple | None = tuple(state.get) if state.exists else None
        if state.hasTimedOut:
            out, new_state = fn.on_timeout(key, current)
            if new_state is None:
                state.remove()
            else:
                state.update(new_state)
                if timeout_ms is not None:
                    state.setTimeoutDuration(timeout_ms)
            if out is not None and len(out):
                yield out
            return
        if fn.needs_full_group:
            chunks = [p for p in pdf_iter if len(p)]
            if chunks:
                merged = chunks[0] if len(chunks) == 1 else pd.concat(chunks)
                out, current = fn.process_element(key, merged, current)
                if out is not None and len(out):
                    yield out
        else:
            for pdf in pdf_iter:
                out, current = fn.process_element(key, pdf, current)
                if out is not None and len(out):
                    yield out
        if current is None:
            if state.exists:
                state.remove()
        else:
            state.update(current)
            # A live timeout keeps the micro-batch engine scheduling
            # batches until it fires — register one only while state
            # exists, or an AvailableNow run never terminates.
            if timeout_ms is not None:
                state.setTimeoutDuration(timeout_ms)

    timeout_conf = (
        GroupStateTimeout.ProcessingTimeTimeout
        if timeout_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return df.groupBy(*keys).applyInPandasWithState(
        _handle,
        outputStructType=fn.output_schema,
        stateStructType=fn.state_schema,
        outputMode=output_mode,
        timeoutConf=timeout_conf,
    )


class RunningReduceFunction(KeyedProcessFunction):
    """The reference's continuous keyed reduce, exactly: per input
    record, state ← reduce(state, value) and the updated partial is
    emitted (StreamGroupedReduce.java:35-53; first record emitted
    as-is). Order within a batch = ``order_col``.
    """

    needs_full_group = True  # running order spans all chunks of a batch

    def __init__(
        self,
        key_col: str,
        order_col: str,
        value_col: str,
        op: str = "sum",
        value_type: str = "double",
    ):
        if op not in ("sum", "min", "max"):
            raise ValueError(f"unsupported running-reduce op: {op!r}")
        self.key_col, self.order_col, self.value_col, self.op = key_col, order_col, value_col, op
        # bigint values → exact int64 state: a running DOUBLE sum is
        # accumulation-order-dependent and can't be replayed bit-exactly
        # by another engine; fixed-point callers pre-scale to ints
        self.value_type = value_type
        self.state_schema = f"acc {value_type}"
        self.output_schema = (
            f"{key_col} bigint, {order_col} bigint, "
            f"{value_col} {value_type}, running {value_type}"
        )

    def process_element(self, key, rows, state):
        import numpy as np

        rows = rows.sort_values(self.order_col)
        np_type = "int64" if self.value_type == "bigint" else "float64"
        v = rows[self.value_col].to_numpy(dtype=np_type)
        # vectorized running aggregate, seeded with prior state: the
        # per-record emission contract with none of the per-row Python
        if self.op == "sum":
            running = np.cumsum(v)
            if state is not None:
                running = running + state[0]
        elif self.op == "min":
            running = np.minimum.accumulate(
                np.minimum(v, state[0]) if state is not None else v
            )
        else:  # max
            running = np.maximum.accumulate(
                np.maximum(v, state[0]) if state is not None else v
            )
        out = pd.DataFrame(
            {
                self.key_col: key[0],
                self.order_col: rows[self.order_col].to_numpy(),
                self.value_col: v,
                "running": running,
            }
        )
        if len(running):
            last = int(running[-1]) if self.value_type == "bigint" else float(running[-1])
        else:
            last = state[0] if state else None
        return out, (last,)
