"""Connected streams: two keyed streams, one shared state — the
DataStream ``connect``/``CoProcessFunction`` surface.

The reference trim has no ``connect`` (SURVEY §2.5: DataStream.java
carries no two-input operator), but the capability is core to the API
family the reference descends from, and the north star is capability
parity. Spark has no two-input stateful operator either; the standard
mapping is a TAGGED UNION: align both schemas (each side's payload
columns null-padded on the other side), union, and route rows inside
one ``applyInPandasWithState`` by the tag. Key co-location is then free
— one shuffle on the key moves both streams to the same state-store
partition, exactly the layout a two-input keyed operator needs.

Delivery contract (deterministic): within each micro-batch, a key's
LEFT rows are delivered before its RIGHT rows, each side as one pandas
frame. Cross-side arrival order inside a batch is not observable —
same as the reference family's connect, which makes no inter-stream
ordering promise. Use an event-time column inside the frames when the
logic needs time order.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from min_flink_spark.streaming.stateful import KeyedProcessFunction, process_keyed


class CoProcessFunction:
    """Subclass and override. Each batch, ``process_left`` receives the
    key's left-side rows (original column names), then ``process_right``
    the right-side rows, then ``finish_batch`` fires once — emit final
    per-batch rows there when the output is a state snapshot rather
    than per-record. State threads through all three in order."""

    state_schema: str = ""
    output_schema: str = ""

    def process_left(self, key, rows: pd.DataFrame, state):
        return None, state

    def process_right(self, key, rows: pd.DataFrame, state):
        return None, state

    def finish_batch(self, key, state):
        return None, state


class _ConnectedAdapter(KeyedProcessFunction):
    needs_full_group = True  # both sides of a key must arrive together

    def __init__(self, fn: CoProcessFunction, left_cols: list, right_cols: list):
        self.fn = fn
        self.left_cols = left_cols
        self.right_cols = right_cols
        self.state_schema = fn.state_schema
        self.output_schema = fn.output_schema

    def process_element(self, key, rows: pd.DataFrame, state):
        outs = []
        left = rows[rows["_side"] == 0]
        if len(left):
            pdf = left[[f"_l_{c}" for c in self.left_cols]]
            pdf.columns = self.left_cols
            out, state = self.fn.process_left(key, pdf, state)
            if out is not None and len(out):
                outs.append(out)
        right = rows[rows["_side"] == 1]
        if len(right):
            pdf = right[[f"_r_{c}" for c in self.right_cols]]
            pdf.columns = self.right_cols
            out, state = self.fn.process_right(key, pdf, state)
            if out is not None and len(out):
                outs.append(out)
        out, state = self.fn.finish_batch(key, state)
        if out is not None and len(out):
            outs.append(out)
        merged = pd.concat(outs) if outs else None
        return merged, state


def connect_keyed(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    fn: CoProcessFunction,
    output_mode: str = "update",
    timeout_ms: int | None = None,
) -> DataFrame:
    """Connect two (streaming) DataFrames on shared key columns and
    co-process them with one state per key.

    Both inputs must carry the key columns under the same names;
    payload columns may differ freely (they are tag-prefixed in the
    union and unwrapped back to their original names before reaching
    the CoProcessFunction)."""
    missing = [
        (side, k)
        for side, df in (("left", left), ("right", right))
        for k in keys
        if k not in df.columns
    ]
    if missing:
        raise ValueError(
            f"connect_keyed: key columns missing: {missing} "
            f"(left has {left.columns}, right has {right.columns})"
        )
    reserved = [c for c in (*left.columns, *right.columns) if c == "_side"]
    if reserved:
        raise ValueError(
            "connect_keyed: '_side' is the operator's tag column — rename it"
        )
    lpay = [c for c in left.columns if c not in keys]
    rpay = [c for c in right.columns if c not in keys]
    ltypes = {f.name: f.dataType for f in left.schema.fields}
    rtypes = {f.name: f.dataType for f in right.schema.fields}
    lsel = left.select(
        *keys,
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_l_{c}") for c in lpay],
        *[F.lit(None).cast(rtypes[c]).alias(f"_r_{c}") for c in rpay],
    )
    rsel = right.select(
        *keys,
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(ltypes[c]).alias(f"_l_{c}") for c in lpay],
        *[F.col(c).alias(f"_r_{c}") for c in rpay],
    )
    unioned = lsel.unionByName(rsel)
    adapter = _ConnectedAdapter(fn, lpay, rpay)
    return process_keyed(unioned, keys, adapter, output_mode, timeout_ms)
