"""min_flink_spark — a PySpark-native analytics/streaming engine.

A from-scratch engine with the query and data-processing capabilities of
the reference stream processor (weifuziang/min-flink, a teaching trim of
Apache Flink 1.11), re-expressed Spark-first:

- the reference's fluent API surface (map/flat_map/filter/key_by/reduce/
  sum/min/max/min_by/max_by/print, cf. reference
  flink-streaming-java/.../api/datastream/DataStream.java:42-314) is a
  thin facade over DataFrame ops so Catalyst/Tungsten own planning and
  execution;
- everything the trim removed but "Flink capability parity" implies
  (event-time windows, watermarks, joins, set ops, sort/limit/top-k,
  stateful process functions) is exposed directly on DataFrames;
- plus large-scale training-data pipeline operators: dedup (exact,
  MinHash+LSH, SimHash, n-gram Jaccard, embedding cosine), similarity
  search, text analysis, multimodal column plumbing.

Everything here is batch/streaming dual: bounded pipelines run as plain
DataFrame jobs; unbounded ones ride Structured Streaming.
"""

import os as _os

# Spark Python workers unpickle our stateful/pandas UDFs by importing
# this package; make sure the repo root is importable in worker
# processes regardless of the driver's cwd. Must run before the JVM
# starts (workers inherit the driver process environment in local mode;
# on a cluster, ship the package with --py-files instead).
_repo_root = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _repo_root not in _os.environ.get("PYTHONPATH", "").split(_os.pathsep):
    _os.environ["PYTHONPATH"] = (
        _repo_root + _os.pathsep + _os.environ.get("PYTHONPATH", "")
    ).rstrip(_os.pathsep)

from min_flink_spark.core.env import StreamExecutionEnvironment
from min_flink_spark.core.stream import KeyedStream, Stream
from min_flink_spark.functions.either import either_left, either_right, union_either
from min_flink_spark.functions.hashing import hash_bucket, zorder_key
from min_flink_spark.operators.bitmap import (
    bitmap_cardinality,
    bitmap_index,
    bitmap_pair_ops,
    merge_bitmap_indexes,
)
from min_flink_spark.operators.dedup import keep_best_per_cluster
from min_flink_spark.operators.graph import connected_components
from min_flink_spark.operators.pipeline import (
    bottom_k_sketch,
    cms_estimate,
    count_min_sketch,
    domain_mix,
    drift_report,
    kmv_distinct_estimate,
    log_histogram_sketch,
    merge_bottom_k,
    merge_cms,
    merge_histogram_sketches,
    misra_gries_summary,
    sketch_quantiles,
)
from min_flink_spark.operators.skew import detect_skew
from min_flink_spark.operators.relational import (
    asof_join,
    bloom_bitmask,
    bloom_might_contain,
    broadcast_join,
    global_index,
    top_k,
)
from min_flink_spark.operators.skew import salted_agg, salted_join
from min_flink_spark.operators.windows import session, slide, tumble, with_watermark
from min_flink_spark.session import get_spark
from min_flink_spark.sources import write_partitioned
from min_flink_spark.sources.bucketed import (
    cobucket_join,
    read_bucketed,
    write_bucketed,
)
from min_flink_spark.sources.pysource import SyntheticEventsDataSource
from min_flink_spark.streaming.cep import AbsenceFunction, FollowedByFunction
from min_flink_spark.streaming.connect import CoProcessFunction, connect_keyed
from min_flink_spark.streaming.event_timers import (
    EventTimeProcessFunction,
    process_keyed_event_time,
)
from min_flink_spark.streaming.stateful import KeyedProcessFunction, process_keyed

__all__ = [
    "AbsenceFunction",
    "CoProcessFunction",
    "EventTimeProcessFunction",
    "FollowedByFunction",
    "KeyedProcessFunction",
    "KeyedStream",
    "Stream",
    "StreamExecutionEnvironment",
    "asof_join",
    "bitmap_cardinality",
    "bitmap_index",
    "bitmap_pair_ops",
    "merge_bitmap_indexes",
    "bloom_bitmask",
    "bloom_might_contain",
    "bottom_k_sketch",
    "broadcast_join",
    "cms_estimate",
    "count_min_sketch",
    "kmv_distinct_estimate",
    "log_histogram_sketch",
    "merge_bottom_k",
    "merge_cms",
    "merge_histogram_sketches",
    "misra_gries_summary",
    "sketch_quantiles",
    "cobucket_join",
    "connected_components",
    "detect_skew",
    "domain_mix",
    "drift_report",
    "either_left",
    "either_right",
    "get_spark",
    "global_index",
    "hash_bucket",
    "keep_best_per_cluster",
    "process_keyed",
    "process_keyed_event_time",
    "read_bucketed",
    "salted_agg",
    "salted_join",
    "SyntheticEventsDataSource",
    "connect_keyed",
    "session",
    "slide",
    "top_k",
    "tumble",
    "union_either",
    "with_watermark",
    "write_bucketed",
    "write_partitioned",
    "zorder_key",
]

__version__ = "0.2.0"
