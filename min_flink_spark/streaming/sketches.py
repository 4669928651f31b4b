"""Streaming summary sketches — bounded per-key state (bottom-k/KMV
and Misra-Gries heavy hitters).

Completes the three-mode symmetry the log₂-histogram family
established (VERDICT r7 item 4): the bottom-k sketch already runs as a
batch operator and a partial-merge operator
(``operators/pipeline.bottom_k_sketch`` / ``merge_bottom_k``); this
module is the third execution mode — the SAME sketch maintained as
keyed streaming state, so an unbounded stream answers distinct-count
and uniform-sample questions while holding exactly ``keys × k`` rows
of state at any stream length (an exact streaming distinct-count
would hold every id ever seen).

Division of labor, 100 TB shape:

- the 32-bit md5 hash is computed SPARK-side before the stateful
  operator (``functions.hashing.md5_prefix_int`` — whole-stage
  codegen, replayable in any engine); Python only merges
  already-hashed pairs,
- per key and micro-batch, the state transition is
  ``state ← bottom-k(state ∪ batch_pairs)`` — the defining closure of
  order-statistic sketches (Bar-Yossef et al.), so the state after any
  prefix of batches equals the batch sketch of that prefix's rows,
  bit-for-bit,
- each batch emits the refreshed sketch; downstream collapses
  emissions with ``merge_bottom_k`` (idempotent: every emitted
  survivor is a member of the final population, so the merged
  bottom-k of ALL emissions equals the final sketch regardless of
  batch count).

Reference parity: keyed ValueState over a keyed stream
(FC/api/common/state/KeyedStateStore.java:74 +
StreamGroupedReduce.java:35-53 — the running keyed reduce shape, here
with a k-row ordered buffer instead of a scalar).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspark.sql.window import Window

from min_flink_spark.functions.hashing import md5_prefix_int
from min_flink_spark.streaming.stateful import KeyedProcessFunction, process_keyed


def _ddl_field_names(ddl: str) -> list[str]:
    """First token of each TOP-LEVEL comma-separated DDL field.

    A naive ``ddl.split(',')`` mis-splits any parameterized or nested
    type containing a comma — ``amt decimal(10,2)`` or
    ``m map<string,bigint>`` — and would spuriously reject a valid
    composite-key DDL at construction (ADVICE r11). Commas only
    separate fields at ``<>``/``()`` nesting depth zero, so track the
    depth instead of round-tripping through a SparkSession-dependent
    parser."""
    fields, depth, start = [], 0, 0
    for i, ch in enumerate(ddl):
        if ch in "<(":
            depth += 1
        elif ch in ">)":
            depth -= 1
        elif ch == "," and depth == 0:
            fields.append(ddl[start:i])
            start = i + 1
    fields.append(ddl[start:])
    return [f.strip().split()[0] for f in fields if f.strip()]


class BottomKFunction(KeyedProcessFunction):
    """Per-key bottom-k of (hash, id) pairs as streaming state.

    State is two parallel arrays (hashes, ids) sorted by (hash, id) —
    at most ``k`` entries per key, the documented keys × k contract.
    The key may be COMPOSITE (e.g. (window_start, event_type) for the
    streaming × keyed × windowed matrix cell): `process_keyed` already
    shuffles on the full column list, so each grouping column simply
    rides back out next to the sketch rows. Incoming rows carry ``_h``
    (32-bit md5 prefix, computed JVM-side) and ``_id``; duplicate ids
    collapse because a given id always maps to the same hash, exactly
    as the batch operator's ``distinct()``.
    """

    state_schema = "hashes array<bigint>, ids array<bigint>"
    needs_full_group = True

    def __init__(self, k: int, key_cols: "str | list[str]", key_ddl: str):
        self.k = k
        self.key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
        # fail at construction, not as an Arrow schema error deep inside
        # a micro-batch: the DDL must name exactly the key columns, in
        # order (a count or order mismatch would mislabel/miscast the
        # emitted key columns)
        ddl_names = _ddl_field_names(key_ddl)
        if ddl_names != self.key_cols:
            raise ValueError(
                f"BottomKFunction: key_ddl names {ddl_names} must match "
                f"key_cols {self.key_cols} exactly (count and order)"
            )
        self.output_schema = f"{key_ddl}, pos int, hash bigint, id bigint"

    def process_element(self, key, rows: pd.DataFrame, state):
        # VECTORIZED state transition (r12): the original built a
        # Python set of (hash, id) tuples over every batch row — the
        # measured 0.33 µs/row margin over a JVM streaming agg at 64M
        # streamed rows (PERF.md r12), while the MG sibling (whose
        # transition is a C-side value_counts) rode at control speed.
        # Same semantics, numpy-side: lexsort by (hash, id), drop
        # adjacent duplicates, keep the first k.
        import numpy as np

        h = rows["_h"].to_numpy()
        i = rows["_id"].to_numpy()
        if state is not None:
            h = np.concatenate([h, np.asarray(state[0], dtype=h.dtype)])
            i = np.concatenate([i, np.asarray(state[1], dtype=i.dtype)])
        order = np.lexsort((i, h))
        h, i = h[order], i[order]
        if len(h):
            keep = np.ones(len(h), dtype=bool)
            keep[1:] = (h[1:] != h[:-1]) | (i[1:] != i[:-1])
            h, i = h[keep][: self.k], i[keep][: self.k]
        hs, ids = [int(v) for v in h], [int(v) for v in i]
        n = len(hs)
        out = pd.DataFrame(
            {
                **{c: [key[j]] * n for j, c in enumerate(self.key_cols)},
                "pos": range(1, n + 1),
                "hash": hs,
                "id": ids,
            }
        )
        return out, (hs, ids)


def streaming_bottom_k(
    stream: DataFrame,
    key_cols: "str | list[str]",
    key_ddl: str,
    id_col: str,
    k: int,
) -> DataFrame:
    """Maintain a bottom-k (KMV) sketch per ``key_cols`` (one column or
    a composite list — ``key_ddl`` must cover them in order) over a
    keyed stream; emits the refreshed per-key sketch each micro-batch
    as ``(*keys, pos, hash, id)``. Collapse the emissions with
    ``operators.pipeline.merge_bottom_k`` after the run — see module
    docstring for why that is exact at any batch count."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    hashed = stream.select(
        *[F.col(c) for c in keys],
        md5_prefix_int(F.col(id_col).cast("string")).alias("_h"),
        F.col(id_col).alias("_id"),
    )
    fn = BottomKFunction(k, keys, key_ddl)
    return process_keyed(hashed, keys, fn, output_mode="update")


class MGFunction(KeyedProcessFunction):
    """Per-key Misra-Gries/SpaceSaving summary as streaming state —
    the heavy-hitter family's third execution mode (after batch and
    partial-merge in ``operators/pipeline.misra_gries_summary`` /
    ``merge_mg_summaries``), completing the five-family symmetry.

    State is the m counters themselves (two parallel arrays + a batch
    version), so a key holds ≤ m rows of state at ANY stream length;
    each micro-batch applies the SAME weighted update rule as the
    batch partition pass (``operators.pipeline.mg_update`` — add the
    batch's value_counts, subtract the (m+1)-th largest on overflow),
    so the guarantees compose across batches exactly as they do across
    partitions: every subtraction anywhere retires m+1 count units,
    hence est ∈ [true − N/m, true] for the key's full history.

    Emissions are NOT monotone per item (subtractions shrink counters,
    items can vanish), so the collapse rule is LAST-WRITER: each
    emission carries the state's batch ``version`` and downstream
    keeps only each key's max-version rows (``latest_mg_emissions``) —
    batch-count-invariant because the final state IS the summary of
    the whole history regardless of how the stream was batched.

    Reference parity: keyed ValueState running reduce
    (StreamGroupedReduce.java:35-53), the buffer here being m counters
    instead of a scalar.
    """

    needs_full_group = True
    state_schema = "items array<string>, cnts array<bigint>, version bigint"

    def __init__(
        self, m: int, key_cols: "str | list[str]", key_ddl: str, item_col: str
    ):
        self.m = m
        # composite keys ride exactly as in BottomKFunction (r11/r12:
        # the streaming × keyed × windowed matrix cells) — the DDL
        # must name the key columns, in order
        self.key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
        self.item_col = item_col
        ddl_names = _ddl_field_names(key_ddl)
        if ddl_names != self.key_cols:
            raise ValueError(
                f"MGFunction: key_ddl names {ddl_names} must match "
                f"key_cols {self.key_cols} exactly (count and order)"
            )
        self.output_schema = f"{key_ddl}, version bigint, item string, cnt bigint"

    def process_element(self, key, rows: pd.DataFrame, state):
        from min_flink_spark.operators.pipeline import mg_update

        counters = dict(zip(state[0], state[1])) if state is not None else {}
        version = (state[2] if state is not None else 0) + 1
        vc = rows[self.item_col].dropna().value_counts()
        counters = mg_update(
            counters, vc.index.to_numpy(dtype=object), vc.to_numpy(), self.m
        )
        n = len(counters)
        out = pd.DataFrame(
            {
                **{c: [key[i]] * n for i, c in enumerate(self.key_cols)},
                "version": [version] * n,
                "item": list(counters),
                "cnt": list(counters.values()),
            }
        )
        new_state = (
            list(counters),
            [int(v) for v in counters.values()],
            version,
        )
        return out, new_state


def streaming_misra_gries(
    stream: DataFrame,
    key_cols: "str | list[str]",
    key_ddl: str,
    item_col: str,
    m: int,
) -> DataFrame:
    """Maintain an m-counter MG summary per ``key_cols`` (one column
    or a composite list — ``key_ddl`` must cover them in order) over a
    keyed stream; emits the refreshed per-key summary each micro-batch
    as ``(*keys, version, item, cnt)``. Collapse with
    ``latest_mg_emissions`` then merge across keys (or feed per-key
    summaries straight to certificates) — see MGFunction for why the
    last-writer collapse is exact at any batch count."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    fn = MGFunction(m, keys, key_ddl, item_col)
    return process_keyed(
        stream.select(*keys, item_col), keys, fn, output_mode="update"
    )


def latest_mg_emissions(
    emitted: DataFrame, key_cols: "str | list[str]"
) -> DataFrame:
    """Keep only each key's max-version rows — the MG emission
    collapse (summaries supersede, they do not merge across versions
    of the SAME key; the key may be composite). Returns
    ``(*keys, item, cnt)``."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    w = Window.partitionBy(*keys)
    return (
        emitted.withColumn("_vmax", F.max("version").over(w))
        .filter(F.col("version") == F.col("_vmax"))
        .select(*keys, "item", "cnt")
    )
