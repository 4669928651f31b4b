"""WordCount — the reference's only example program, on this engine.

Reference: flink-examples/.../wordcount/WordCount.java:10-57
(fromElements → flatMap tokenizer → filter → keyBy → reduce(sum) →
print, with a parallelism change mid-pipeline). Run:

    python examples/wordcount.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from min_flink_spark import StreamExecutionEnvironment


def main() -> None:
    env = StreamExecutionEnvironment.get_execution_environment()
    (
        env.from_elements([("hello world",), ("hello world",)], "line string")
        .flat_map(F.split(F.lower("line"), r"\W+"), alias="word")
        .filter(F.col("word") != "")
        .with_column("count", F.lit(1))
        .set_parallelism(2)                      # ds.setParallelism(2)
        .key_by("word")
        .agg(F.sum("count").alias("count"))
        .print()                                  # → (hello,2), (world,2)
    )
    env.execute("wordcount")


if __name__ == "__main__":
    main()
