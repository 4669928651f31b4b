"""Streaming WordCount — the acceptance pipeline on Structured
Streaming, with the continuous keyed reduce's per-record emissions.

Mirrors what the reference's WordCount prints under running-reduce
semantics ((hello,1) then (hello,2) for duplicated input —
StreamGroupedReduce.java:35-53) by running the stateful running-count
processor over a file-source stream. Run:

    python examples/streaming_wordcount.py
"""

import os
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from min_flink_spark import get_spark
from min_flink_spark.streaming.runner import run_to_completion, stream_parquet
from min_flink_spark.functions.hashing import md5_prefix_int
from min_flink_spark.streaming.stateful import RunningReduceFunction, process_keyed


def main() -> None:
    spark = get_spark(app_name="streaming-wordcount", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")

    d = os.path.join(tempfile.mkdtemp(prefix="stream_wc_"), "lines")
    spark.createDataFrame(
        [(1, "hello world"), (2, "hello world")], "seq bigint, line string"
    ).coalesce(1).write.parquet(d)

    words = (
        stream_parquet(spark, d, "seq bigint, line string")
        .select("seq", F.explode(F.split(F.lower("line"), r"\W+")).alias("word"))
        .filter(F.col("word") != "")
        .select(
            md5_prefix_int(F.col("word")).alias("word_key"),
            F.col("word"),
            F.col("seq").alias("event_id"),
            F.lit(1.0).alias("value"),
        )
    )
    fn = RunningReduceFunction("word_key", "event_id", "value", "sum")
    emissions = run_to_completion(
        process_keyed(words.drop("word"), ["word_key"], fn, output_mode="update"),
        output_mode="update",
    )
    # join the word text back for display (batch-side lookup — the
    # streaming frame can't join the materialized sink)
    lookup = (
        spark.read.parquet(d)
        .select(F.explode(F.split(F.lower("line"), r"\W+")).alias("word"))
        .filter(F.col("word") != "")
        .select(md5_prefix_int(F.col("word")).alias("word_key"), "word")
        .distinct()
    )
    emissions.join(lookup, "word_key").orderBy("event_id", "word").select(
        "word", "event_id", F.col("running").cast("int").alias("count_so_far")
    ).show()


if __name__ == "__main__":
    main()
