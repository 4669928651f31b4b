"""Custom source implemented on Spark 4's Python DataSource API — the
real analog of the reference's user-defined source surface
(``StreamExecutionEnvironment.addSource(SourceFunction)``,
``FSJ/api/functions/source/SourceFunction.java:31-47``: a run loop the
engine parallelizes, plus a cancel contract).

``SyntheticEventsDataSource`` generates a deterministic event table:
row ``i`` derives every field from md5 — the engine-independent
randomness primitive the whole repo standardizes on — so the SAME rows
are reproducible in DuckDB via ``range(n)`` + md5 string arithmetic,
which is what makes a custom SOURCE oracle-checkable end-to-end.

Scale notes: ``partitions`` independent slices, each generated entirely
inside its executor task (no driver data, no coordination) — the
embarrassingly-parallel layout a 1000-executor generator needs. The
streaming reader exposes the whole remaining range as one offset window
per poll, so AvailableNow drains it in one deterministic batch.

Row recipe (0-based i, base epoch 2020-01-01T00:00:00Z):
  event_id   = i
  ts         = base + i seconds
  user_id    = md5_int32("u"+i) % 1000
  event_type = TYPES[md5_int32("t"+i) % 5]
  value      = (md5_int32("v"+i) % 1_000_000) / 1000.0   (3-dp exact)
"""

from __future__ import annotations

import hashlib
from datetime import datetime, timedelta

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

TYPES = ["view", "click", "purchase", "signup", "error"]
_BASE = datetime(2020, 1, 1)
SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, value double"
)


def _h(tag: str, i: int) -> int:
    return int(hashlib.md5(f"{tag}{i}".encode()).hexdigest()[:8], 16)


def _gen(start: int, end: int):
    for i in range(start, end):
        yield (
            i,
            _BASE + timedelta(seconds=i),
            _h("u", i) % 1000,
            TYPES[_h("t", i) % 5],
            (_h("v", i) % 1_000_000) / 1000.0,
        )


class _Slice(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


def _slices(start: int, end: int, parts: int) -> list[_Slice]:
    n = max(1, parts)
    total = end - start
    step = (total + n - 1) // n if total else 1
    return [
        _Slice(s, min(s + step, end)) for s in range(start, end, step)
    ] or [_Slice(start, end)]


class _BatchReader(DataSourceReader):
    def __init__(self, rows: int, parts: int):
        self.rows = rows
        self.parts = parts

    def partitions(self):
        return _slices(0, self.rows, self.parts)

    def read(self, partition: _Slice):
        return _gen(partition.start, partition.end)


class _StreamReader(DataSourceStreamReader):
    """Offset = {"index": n}: rows [0, n) are committed. Each poll
    exposes everything still pending, so a bounded AvailableNow run
    drains deterministically in one batch; a continuous trigger would
    re-poll as ``rows`` grows (fixed here, so the stream idles)."""

    def __init__(self, rows: int, parts: int):
        self.rows = rows
        self.parts = parts

    def initialOffset(self):
        return {"index": 0}

    def latestOffset(self):
        return {"index": self.rows}

    def partitions(self, start, end):
        return _slices(start["index"], end["index"], self.parts)

    def read(self, partition: _Slice):
        return _gen(partition.start, partition.end)

    def commit(self, end):
        pass

    def stop(self):
        pass


class SyntheticEventsDataSource(DataSource):
    """``spark.read.format("synthetic_events").option("rows", n)`` after
    ``spark.dataSource.register(SyntheticEventsDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return SCHEMA

    def _opts(self) -> tuple[int, int]:
        rows = int(self.options.get("rows", 10_000))
        parts = int(self.options.get("partitions", 8))
        if rows < 0 or parts < 1:
            raise ValueError(
                f"synthetic_events: rows must be >= 0 and partitions >= 1 "
                f"(got rows={rows}, partitions={parts})"
            )
        return rows, parts

    def reader(self, schema) -> _BatchReader:
        return _BatchReader(*self._opts())

    def streamReader(self, schema) -> _StreamReader:
        return _StreamReader(*self._opts())


def register_synthetic_source(spark) -> None:
    """Idempotent registration (re-registering the same name is fine —
    latest registration wins, matching Spark's own semantics)."""
    spark.dataSource.register(SyntheticEventsDataSource)
