"""Stream / KeyedStream — the fluent facade over Spark DataFrames.

Mirrors the reference API surface (reference
``flink-streaming-java/.../api/datastream/DataStream.java:42-314`` — map,
flatMap, filter, keyBy, reduce, sum/min/max/minBy/maxBy, print, addSink;
``KeyedStream.java:42-209``) but every method is a thin declarative
rewrite onto DataFrame operations, so Catalyst plans and Tungsten
executes. Nothing here materializes data on the driver; a Stream is a
logical plan until a sink/collect is called.

Two styles per transform:

- **expression form** (preferred, JVM-side, whole-stage-codegen):
  ``map(expr...)``, ``flat_map(array_expr)``, ``filter(cond)``;
- **row-function form** (the reference's opaque-lambda UDF path,
  reference ``FC/api/common/functions/MapFunction.java``): ``map_rows``/
  ``flat_map_rows``/``filter_rows`` run an Arrow-batched function via
  ``mapInPandas`` — the documented slow path, for logic column
  expressions cannot express.

Keyed aggregate semantics follow the reference exactly (see
``min_flink_spark/functions/aggregations.py``).
"""

from __future__ import annotations

from collections.abc import Callable, Iterable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from min_flink_spark.functions.aggregations import (
    keyed_agg_first_record,
    keyed_extremal_record,
    running_reduce_plan,
)

ColumnOrName = Column | str


def _to_cols(cols: Iterable[ColumnOrName]) -> list[Column]:
    return [F.col(c) if isinstance(c, str) else c for c in cols]


class Stream:
    """A (possibly unbounded) record stream; wraps a DataFrame plan."""

    def __init__(self, df: DataFrame):
        self.df = df

    # ---- projections / per-record transforms (reference §2.2) ----

    def map(self, *exprs: ColumnOrName) -> "Stream":
        """1→1 transform as column expressions (StreamMap.java:28-42)."""
        return Stream(self.df.select(*_to_cols(exprs)))

    def with_column(self, name: str, expr: Column) -> "Stream":
        return Stream(self.df.withColumn(name, expr))

    def map_rows(self, fn: Callable[[pd.DataFrame], pd.DataFrame], schema: Any) -> "Stream":
        """Opaque 1→1/1→N mapper over Arrow batches (MapFunction path)."""

        def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                out = fn(pdf)
                if out is not None and len(out):
                    yield out

        return Stream(self.df.mapInPandas(_run, schema=schema))

    def flat_map(self, expr: ColumnOrName, alias: str = "value", keep: list[str] | None = None) -> "Stream":
        """1→N via an array expression + explode (StreamFlatMap.java:28-51)."""
        cols = _to_cols(keep or [])
        e = expr if isinstance(expr, Column) else F.col(expr)
        return Stream(self.df.select(*cols, F.explode(e).alias(alias)))

    def flat_map_rows(self, fn: Callable[[pd.DataFrame], pd.DataFrame], schema: Any) -> "Stream":
        return self.map_rows(fn, schema)

    def filter(self, cond: Column | str) -> "Stream":
        """Predicate filter (StreamFilter.java:28-42); pushdown-friendly."""
        return Stream(self.df.filter(cond))

    where = filter

    # ---- partitioning (reference §2.3) ----

    def key_by(self, *keys) -> "KeyedStream":
        """Hash-partition by key (KeyedStream.java:42-107). In Spark the
        exchange is planned lazily by the downstream keyed operation.

        Keys take the reference's field-expression surface
        (FieldAccessorFactory.java:52-190): flat names, positional
        ``0``/``"f0"`` tuple aliases, dotted struct paths
        (``"meta.region"``), or Column objects.
        """
        from min_flink_spark.functions.fields import resolve_field

        return KeyedStream(
            self.df,
            [
                resolve_field(self.df, k) if isinstance(k, (str, int)) else k
                for k in keys
            ],
        )

    def rebalance(self, n: int | None = None) -> "Stream":
        """Round-robin redistribution (RebalancePartitioner.java)."""
        return Stream(self.df.repartition(n) if n else self.df.repartition())

    shuffle = rebalance  # ShufflePartitioner.java — same effect in Spark

    def set_parallelism(self, n: int) -> "Stream":
        return Stream(self.df.repartition(n))

    # ---- multi-stream (generalized surface, SURVEY §2.5/§7.3-4) ----

    def union(self, *others: "Stream") -> "Stream":
        out = self.df
        for o in others:
            out = out.unionByName(o.df)
        return Stream(out)

    def connect(self, other: "Stream") -> "ConnectedStreams":
        """Pair with a second stream for keyed co-processing under one
        shared state — ``a.connect(b).key_by(k).process(fn)`` (the
        ConnectedStreams surface; streaming/connect.py holds the
        tagged-union implementation and the delivery contract)."""
        return ConnectedStreams(self, other)

    def side_output(self, cond: Column | str) -> tuple["Stream", "Stream"]:
        """Split into (main, side): rows matching ``cond`` go to the
        side stream — the OutputTag pattern (late-data/error routing).

        Spark has no in-plan row routing, so this is two filters over
        the same lineage; Catalyst reuses the scan (and with
        ``.persist()`` on the input, the computed batch) for both
        branches. NULL condition rows follow SQL semantics: they match
        neither ``cond`` nor ``~cond`` and land in the MAIN stream via
        the null-safe complement, so the split is always a partition
        (main ∪ side = input, main ∩ side = ∅)."""
        c = F.expr(cond) if isinstance(cond, str) else cond
        side = self.df.filter(c)
        main = self.df.filter(~c.eqNullSafe(F.lit(True)))
        return Stream(main), Stream(side)

    # ---- sinks (reference §2.7) ----

    def print(self, prefix: str | None = None, n: int = 20) -> None:
        """PrintSinkFunction.java:40-85 analog, reference-exact line
        format via PrintSinkOutputWriter's prefix rules:

        - identifier + parallelism>1 → ``id:subtask> record``
        - identifier only            → ``id> record``
        - parallelism>1 only         → ``subtask> record``
        - neither                    → ``record``

        Records render Flink-``toString``-style: multi-field rows as
        ``(a,b)`` tuples, single-field rows bare — the acceptance
        format ``(hello,2)``. Subtask index is the (1-based) partition
        that produced the row. Driver-side and bounded to ``n`` rows;
        an unbounded per-record sink at scale belongs in
        ``add_sink``/``sink_parquet``, exactly like the reference's
        print being a debugging sink, not a data path.
        """
        cols = self.df.columns
        rows = self.df.select(
            F.spark_partition_id().alias("_pid"),
            F.struct(*[F.col(c) for c in cols]).alias("_r"),
        ).take(n)
        parallel = self.df.rdd.getNumPartitions() > 1
        for row in rows:
            r = row["_r"]
            text = str(r[0]) if len(cols) == 1 else "(" + ",".join(str(v) for v in r) + ")"
            if prefix and parallel:
                line = f"{prefix}:{row['_pid'] + 1}> {text}"
            elif prefix:
                line = f"{prefix}> {text}"
            elif parallel:
                line = f"{row['_pid'] + 1}> {text}"
            else:
                line = text
            print(line)

    def collect(self) -> list:
        return self.df.collect()

    def sink_parquet(self, path: str, mode: str = "overwrite", partition_by: list[str] | None = None) -> None:
        w = self.df.write.mode(mode)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(path)

    def sink_csv(self, path: str, mode: str = "overwrite", header: bool = True) -> None:
        self.df.write.mode(mode).option("header", str(header).lower()).csv(path)

    def sink_json(self, path: str, mode: str = "overwrite") -> None:
        self.df.write.mode(mode).json(path)

    def sink_orc(self, path: str, mode: str = "overwrite") -> None:
        self.df.write.mode(mode).orc(path)

    def add_sink(self, fn: Callable[[DataFrame], None]) -> None:
        """Custom sink (SinkFunction.java): fn receives the DataFrame."""
        fn(self.df)

    def observe(self, name: str, *metrics: Column):
        """Job-level metric side channel — the reference's accumulators
        (FC/api/common/accumulators/, merged at job end) as
        ``df.observe``: metrics piggyback on the job, no second pass.
        Returns (stream, Observation); read ``observation.get`` after an
        action."""
        from pyspark.sql import Observation

        obs = Observation(name)
        return Stream(self.df.observe(obs, *metrics)), obs


class KeyedStream(Stream):
    """Stream with key columns attached; keyed aggregates live here.

    Aggregate semantics match the reference's running-reduce family
    (StreamGroupedReduce.java:11-54, SumAggregator.java:28-76,
    ComparableAggregator.java:30-95): ``sum/min/max`` replace only the
    aggregated field and take every other field from the FIRST-seen
    record per key; ``min_by/max_by`` return the whole extremal record
    with ties broken toward the first (or last) arrival. "Arrival order"
    is an explicit total-order column (``order_by``) because a scalable
    engine cannot depend on physical row order.
    """

    def __init__(self, df: DataFrame, keys: list[ColumnOrName]):
        super().__init__(df)
        self.keys = keys
        self._key_names_cache: list[str] | None = None

    def _key_cols(self) -> list[Column]:
        return _to_cols(self.keys)

    def _key_names(self) -> list[str]:
        # resolving a Column key's name costs a driver-side plan
        # analysis (df.select(k).columns) — do it once per KeyedStream
        if self._key_names_cache is None:
            self._key_names_cache = [
                k if isinstance(k, str) else self.df.select(k).columns[0]
                for k in self.keys
            ]
        return self._key_names_cache

    # ---- direct Spark aggregation (the scalable default) ----

    def agg(self, *aggs: Column) -> Stream:
        return Stream(self.df.groupBy(*self._key_cols()).agg(*aggs))

    def count(self, alias: str = "count") -> Stream:
        return self.agg(F.count(F.lit(1)).alias(alias))

    # ---- reference-semantics aggregates (final answer of the running
    #      reduce on a bounded stream) ----

    def sum(self, field: str, order_by: str = None) -> Stream:
        return Stream(keyed_agg_first_record(self.df, self._key_names(), field, "sum", order_by))

    def min(self, field: str, order_by: str = None) -> Stream:
        return Stream(keyed_agg_first_record(self.df, self._key_names(), field, "min", order_by))

    def max(self, field: str, order_by: str = None) -> Stream:
        return Stream(keyed_agg_first_record(self.df, self._key_names(), field, "max", order_by))

    def min_by(self, field: str, order_by: str = None, first: bool = True) -> Stream:
        return Stream(keyed_extremal_record(self.df, self._key_names(), field, "min", order_by, first))

    def max_by(self, field: str, order_by: str = None, first: bool = True) -> Stream:
        return Stream(keyed_extremal_record(self.df, self._key_names(), field, "max", order_by, first))

    def running_reduce(self, field: str, op: str, order_by: str, alias: str | None = None) -> Stream:
        """Per-record emission history of the reference's continuous
        reduce (StreamGroupedReduce.java:35-53): one output row per
        input row, carrying the running aggregate so far for its key."""
        return Stream(running_reduce_plan(self.df, self._key_names(), field, op, order_by, alias))

    def reduce_rows(
        self,
        fn: Callable[[pd.DataFrame], pd.DataFrame],
        schema: Any,
        order_by: str | None = None,
    ) -> Stream:
        """Arbitrary per-key fold (ReduceFunction analog) via
        applyInPandas. ``fn`` receives one key group (sorted by
        ``order_by`` if given) and returns its reduced row(s)."""

        def _run(pdf: pd.DataFrame) -> pd.DataFrame:
            if order_by:
                pdf = pdf.sort_values(order_by)
            return fn(pdf)

        return Stream(self.df.groupBy(*self._key_cols()).applyInPandas(_run, schema=schema))

    # ---- fluent window surface (keyBy().window(...).agg(...) parity;
    #      thin wrappers over operators/windows — batch AND streaming) --

    def tumble(self, ts: str, size: str, *aggs: Column) -> Stream:
        from min_flink_spark.operators.windows import tumble as _tumble

        return Stream(_tumble(self.df, ts, size, self._key_names(), *aggs))

    def slide(self, ts: str, size: str, step: str, *aggs: Column) -> Stream:
        from min_flink_spark.operators.windows import slide as _slide

        return Stream(_slide(self.df, ts, size, step, self._key_names(), *aggs))

    def session(self, ts: str, gap: str | Column, *aggs: Column) -> Stream:
        from min_flink_spark.operators.windows import session as _session

        return Stream(_session(self.df, ts, gap, self._key_names(), *aggs))

    def count_window(self, n: int, order_by: list[str], *aggs: Column) -> Stream:
        """countWindow parity: per-key n-row tumbling blocks in
        ``order_by`` total order (pass a unique tiebreaker)."""
        from min_flink_spark.operators.windows import count_window as _cw

        return Stream(_cw(self.df, self._key_names(), order_by, n, *aggs))


class ConnectedStreams:
    """Two streams awaiting a shared key — produced by ``Stream.connect``.

    ``key_by(*keys)`` fixes the co-location key (same column names on
    both sides); ``process(fn)`` wires a CoProcessFunction
    (streaming/connect.py) and returns the output Stream."""

    def __init__(self, left: Stream, right: Stream):
        self.left = left
        self.right = right
        self._keys: list[str] | None = None

    def key_by(self, *keys: str) -> "ConnectedStreams":
        self._keys = list(keys)
        return self

    def process(
        self,
        fn,
        output_mode: str = "update",
        timeout_ms: int | None = None,
    ) -> Stream:
        if not self._keys:
            raise ValueError("connect(...).key_by(...) must precede process()")
        from min_flink_spark.streaming.connect import connect_keyed

        return Stream(
            connect_keyed(
                self.left.df, self.right.df, self._keys, fn, output_mode, timeout_ms
            )
        )
