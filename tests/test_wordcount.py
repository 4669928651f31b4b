"""The reference's acceptance program, re-expressed on the facade.

Reference: flink-examples/.../wordcount/WordCount.java:10-57 —
fromElements → flatMap(tokenize) → filter(word=='hello') → keyBy →
reduce(sum) → print. Expected running emissions for input
["hello world", "hello world"]: (hello,1), (hello,2); final (hello,2).
"""

from pyspark.sql import functions as F

from min_flink_spark import StreamExecutionEnvironment


def wordcount(env, lines):
    return (
        env.from_elements([(l,) for l in lines], "line string")
        .flat_map(F.split(F.lower("line"), r"\W+"), alias="word")
        .filter(F.col("word") != "")
        .with_column("count", F.lit(1))
        .key_by("word")
        .agg(F.sum("count").alias("count"))
    )


def test_wordcount_final(spark):
    env = StreamExecutionEnvironment(spark)
    rows = wordcount(env, ["hello world", "hello world"]).collect()
    got = {r["word"]: r["count"] for r in rows}
    assert got == {"hello": 2, "world": 2}


def test_wordcount_filtered_running_emissions(spark):
    """Running-reduce history: (hello,1) then (hello,2)."""
    env = StreamExecutionEnvironment(spark)
    s = (
        env.from_elements(
            [(1, "hello world"), (2, "hello world")], "seq int, line string"
        )
        .flat_map(F.split(F.lower("line"), r"\W+"), alias="word", keep=["seq"])
        .filter(F.col("word") == "hello")
        .with_column("count", F.lit(1))
        .key_by("word")
        .running_reduce("count", "sum", order_by="seq", alias="count_so_far")
    )
    rows = sorted(s.collect(), key=lambda r: r["seq"])
    assert [(r["word"], r["count_so_far"]) for r in rows] == [("hello", 1), ("hello", 2)]


def test_wordcount_documents_table(spark, sf_dir):
    env = StreamExecutionEnvironment(spark)
    s = (
        env.read_table(sf_dir, "documents")
        .flat_map(F.split(F.lower("text"), r"[^a-z0-9']+"), alias="word")
        .filter(F.length("word") > 0)
        .key_by("word")
        .count(alias="cnt")
    )
    rows = s.collect()
    assert len(rows) > 0
    assert all(r["cnt"] >= 1 for r in rows)
