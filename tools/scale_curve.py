"""Engine-side scale curve: time registry queries across sf dirs.

The program's perf evidence so far rides (a) bench.py at sf0.1 and
(b) the synthetic-generator scale smoke to 80M rows for the summary
families.  This tool adds the missing third leg: REAL registry
queries timed end-to-end (plan + execute + collect, exactly what the
driver's gate does) at multiple REAL parquet scale points, so the
"would this hold at 100x?" argument for the headline query shapes is
a measured curve instead of a plan-shape reading.

Methodology: per (query, sf_dir) the query runs ``reps`` times in one
warm session (default 2) and the MIN is reported — same convention as
bench.py (min isolates code cost from box noise; the per-round BENCH
artifacts carry medians too, but a cross-SF slope wants the floor).
Row counts are printed so the output-volume component of each slope
is visible (e.g. mad_outlier_flags returns n rows — its collect cost
IS the output, not the operator).

Usage:
    python tools/scale_curve.py --sfs /root/testdata/sf0.1,/tmp/sf1,/tmp/sf10 \
        [--reps 2] [query ...]

Defaults to the 15 bench headlines. Prints one JSON line per query:
    {"query": ..., "points": {"<sf_dir>": {"sec": ..., "rows": ...}}}
and a closing summary with per-query slopes between consecutive points.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from min_flink_spark.core.ckpt import release_backing  # noqa: E402
from min_flink_spark.session import get_spark  # noqa: E402

# bench.py's 15 frozen headlines (keep in sync by name, not import —
# bench.py owns its own list and this tool must stay usable on any
# subset)
DEFAULT_QUERIES = [
    "pricing_summary",
    "revenue_by_nation",
    "shipping_priority",
    "left_join_order_item_stats",
    "window_rank_lag",
    "tumbling_window_daily",
    "session_window_4h",
    "flatmap_wordcount",
    "dedup_minhash_lsh",
    "embedding_cosine_topk",
    "streaming_running_reduce",
    "tfidf_top_terms",
    "text_stats",
    "pivot_event_counts",
    "deterministic_sample",
]


def main() -> int:
    args = list(sys.argv[1:])
    sfs = ["/root/testdata/sf0.1", "/tmp/sf1"]
    reps = 2
    if "--sfs" in args:
        k = args.index("--sfs")
        sfs = args[k + 1].split(",")
        del args[k : k + 2]
    if "--reps" in args:
        k = args.index("--reps")
        reps = int(args[k + 1])
        del args[k : k + 2]
    queries = args or DEFAULT_QUERIES

    import importlib

    entry = importlib.import_module("__spark_entry__")
    qs = entry.queries()
    spark = get_spark(app_name="scale-curve")

    results = {}
    for name in queries:
        fn = qs[name]
        points = {}
        for sf_dir in sfs:
            best, rows = None, None
            for _ in range(reps):
                t0 = time.time()
                df = fn(spark, sf_dir)
                out = df.collect()
                took = time.time() - t0
                release_backing(df)
                rows = len(out)
                best = took if best is None else min(best, took)
            points[sf_dir] = {"sec": round(best, 3), "rows": rows}
            print(
                f"{name} @ {sf_dir}: {best:.3f}s ({rows} rows)", flush=True
            )
        results[name] = points
        print(json.dumps({"query": name, "points": points}), flush=True)

    print("\n== slopes (time ratio between consecutive sf points) ==")
    for name, points in results.items():
        secs = [points[s]["sec"] for s in sfs]
        slopes = [
            f"{b / a:.2f}x" if a > 0 else "inf"
            for a, b in zip(secs, secs[1:])
        ]
        print(f"{name}: " + " -> ".join(f"{s:.3f}s" for s in secs) + "  [" + ", ".join(slopes) + "]")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
