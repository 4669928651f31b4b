"""Property-based tests: the reference aggregate semantics hold on
arbitrary inputs, not just the hand-written fixtures.

Model: a pure-Python fold implementing the documented contract
(SumAggregator.java:68-76 / ComparableAggregator.java:72-94 —
first-seen record's fields, aggregated field replaced; minBy/maxBy
whole record with first/last tie-break). Spark plans must agree with
the model on every generated dataset.

One shared Spark session across examples (hypothesis just drives the
data); deadline disabled because Spark actions are not
microsecond-scale.
"""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from min_flink_spark.functions.aggregations import (
    keyed_agg_first_record,
    keyed_extremal_record,
    running_reduce_plan,
)

rows_strategy = st.lists(
    st.tuples(
        st.sampled_from(["a", "b", "c"]),          # key
        st.integers(min_value=-50, max_value=50),   # value
        st.sampled_from(["p", "q", "r", "s"]),      # payload
    ),
    min_size=1,
    max_size=25,
)


def to_df(spark, rows):
    # seq column = arrival order (FIXTURES §3 total-order contract)
    return spark.createDataFrame(
        [(i, k, v, p) for i, (k, v, p) in enumerate(rows)],
        "seq int, k string, v int, payload string",
    )


def model_first_record_agg(rows, op):
    out = {}
    for i, (k, v, p) in enumerate(rows):
        if k not in out:
            out[k] = {"seq": i, "v": v, "payload": p}
        else:
            cur = out[k]["v"]
            cur = cur + v if op == "sum" else (min(cur, v) if op == "min" else max(cur, v))
            out[k]["v"] = cur
    return {k: (r["seq"], r["v"], r["payload"]) for k, r in out.items()}


def model_extremal(rows, op, first):
    out = {}
    for i, (k, v, p) in enumerate(rows):
        if k not in out:
            out[k] = (i, v, p)
            continue
        _, bv, _ = out[k]
        better = v < bv if op == "min" else v > bv
        tie = v == bv
        if better or (tie and not first):
            out[k] = (i, v, p)
    return out


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=rows_strategy)
@pytest.mark.parametrize("op", ["sum", "min", "max"])
def test_first_record_agg_matches_model(spark, rows, op):
    got = {
        r["k"]: (r["seq"], r["v"], r["payload"])
        for r in keyed_agg_first_record(to_df(spark, rows), ["k"], "v", op, "seq").collect()
    }
    assert got == model_first_record_agg(rows, op)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=rows_strategy)
@pytest.mark.parametrize("op,first", [("min", True), ("min", False), ("max", True), ("max", False)])
def test_extremal_record_matches_model(spark, rows, op, first):
    got = {
        r["k"]: (r["seq"], r["v"], r["payload"])
        for r in keyed_extremal_record(
            to_df(spark, rows), ["k"], "v", op, "seq", first
        ).collect()
    }
    assert got == model_extremal(rows, op, first)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=rows_strategy)
def test_running_reduce_matches_model(spark, rows):
    got = {
        r["seq"]: r["running_sum_v"]
        for r in running_reduce_plan(to_df(spark, rows), ["k"], "v", "sum", "seq").collect()
    }
    acc: dict = {}
    for i, (k, v, _) in enumerate(rows):
        acc[k] = acc.get(k, 0) + v
        assert got[i] == acc[k], f"seq {i}"


# ---- window semantics vs model --------------------------------------------

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from min_flink_spark.operators.windows import session, tumble

minutes_strategy = st.lists(
    st.integers(min_value=0, max_value=600), min_size=1, max_size=30
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(minutes=minutes_strategy)
def test_tumble_matches_model(spark, minutes):
    base = datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(base + timedelta(minutes=m),) for m in minutes], "ts timestamp"
    )
    got = {
        r["window_start"]: r["n"]
        for r in tumble(df, "ts", "15 minutes", None, F.count("*").alias("n")).collect()
    }
    model: dict = {}
    for m in minutes:
        start = base + timedelta(minutes=(m // 15) * 15)
        model[start] = model.get(start, 0) + 1
    assert got == model


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(minutes=minutes_strategy)
def test_session_matches_model(spark, minutes):
    gap_min = 10
    base = datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(base + timedelta(minutes=m),) for m in minutes], "ts timestamp"
    )
    got = sorted(
        (r["session_start"], r["session_end"], r["n"])
        for r in session(
            df, "ts", f"{gap_min} minutes", None, F.count("*").alias("n")
        ).collect()
    )
    # model: sort unique-with-duplicates, split where gap > gap_min
    ms = sorted(minutes)
    sessions, cur = [], [ms[0]]
    for m in ms[1:]:
        if m - cur[-1] <= gap_min:
            cur.append(m)
        else:
            sessions.append(cur)
            cur = [m]
    sessions.append(cur)
    model = sorted(
        (
            base + timedelta(minutes=s[0]),
            base + timedelta(minutes=s[-1] + gap_min),
            len(s),
        )
        for s in sessions
    )
    assert got == model


# ---- sequence packing vs pure-Python greedy model ----


def _pack_model(rows, capacity, num_buckets):
    """Reference implementation of the documented packing contract."""
    import hashlib

    out = {}
    buckets: dict = {}
    for doc_id, tokens in rows:
        h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16) % num_buckets
        buckets.setdefault(h, []).append((doc_id, tokens))
    for b, docs in buckets.items():
        docs.sort()
        bin_idx, used = 0, 0
        for doc_id, tokens in docs:
            t = min(tokens, capacity)
            if used > 0 and used + t > capacity:
                bin_idx, used = bin_idx + 1, 0
            out[doc_id] = (b, bin_idx, used)
            used += t
    return out


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10_000),
            st.integers(min_value=1, max_value=700),
        ),
        min_size=1,
        max_size=40,
        unique_by=lambda r: r[0],
    )
)
def test_pack_sequences_matches_model(spark, rows):
    from min_flink_spark.operators.pipeline import pack_sequences

    df = spark.createDataFrame(rows, "doc_id bigint, n_tokens bigint")
    got = {
        r["doc_id"]: (r["bucket"], r["bin"], r["offset"])
        for r in pack_sequences(df, capacity=512, num_buckets=4).collect()
    }
    assert got == _pack_model(rows, 512, 4)


# ---- nested field replacement vs model ----


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=rows_strategy)
def test_nested_sum_matches_flat_sum(spark, rows):
    """sum('meta.v') over struct-ified rows must equal sum('v') over the
    flat rows, with identical first-record carry — dotted addressing is
    pure addressing, never different semantics."""
    from pyspark.sql import functions as F

    flat = to_df(spark, rows)
    nested = flat.select(
        "seq", "k", F.struct(F.col("v").alias("v"), F.col("payload").alias("p")).alias("meta")
    )
    got_flat = {
        r["k"]: (r["v"], r["payload"])
        for r in keyed_agg_first_record(flat, ["k"], "v", "sum", "seq").collect()
    }
    got_nested = {
        r["k"]: (r["meta"]["v"], r["meta"]["p"])
        for r in keyed_agg_first_record(nested, ["k"], "meta.v", "sum", "seq").collect()
    }
    assert got_flat == got_nested


# ---- as-of join vs pure-Python model ----


def _asof_model(left, right, strict):
    """For each (k, lts): the right payload with the greatest rts
    satisfying rts <= lts (or < when strict); ties on rts take the max
    payload (the operator's deterministic third sort key)."""
    out = {}
    for k, lts in left:
        best = None
        for rk, rts, v in right:
            if rk != k:
                continue
            ok = rts < lts if strict else rts <= lts
            if ok and (best is None or (rts, v) > best):
                best = (rts, v)
        out[(k, lts)] = best[1] if best else None
    return out


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    left=st.lists(
        st.tuples(st.integers(1, 3), st.integers(0, 50)),
        min_size=1, max_size=15, unique=True,
    ),
    right=st.lists(
        st.tuples(st.integers(1, 3), st.integers(0, 50), st.sampled_from("abcd")),
        min_size=0, max_size=15, unique=True,
    ),
    strict=st.booleans(),
)
def test_asof_join_matches_model(spark, left, right, strict):
    from min_flink_spark.operators.relational import asof_join

    ldf = spark.createDataFrame(left, "k int, lts int")
    rdf = spark.createDataFrame(
        right or [(99, 0, "z")], "k int, rts int, v string"
    )  # empty right → sentinel key that matches nothing
    got = {
        (r["k"], r["lts"]): r["r_v"]
        for r in asof_join(
            ldf, rdf, on=["k"], left_ts="lts", right_ts="rts",
            right_values=["v"], strict=strict,
        ).collect()
    }
    assert got == _asof_model(left, right, strict)


# ---------------------------------------------------------------------------
# salted two-phase plans must be invisible in results (arbitrary data)
# ---------------------------------------------------------------------------


@given(rows=rows_strategy, salts=st.sampled_from([1, 3, 16]))
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_salted_agg_equals_direct_agg(spark, rows, salts):
    from pyspark.sql import functions as F

    from min_flink_spark.operators.skew import salted_agg

    df = to_df(spark, rows)
    got = {
        r["k"]: (r["s"], r["n"], r["mn"], r["mx"])
        for r in salted_agg(
            df,
            keys=["k"],
            aggs={
                "s": ("sum", "v"),
                "n": ("count", "v"),
                "mn": ("min", "v"),
                "mx": ("max", "v"),
            },
            salt_col=F.col("seq"),
            salts=salts,
        ).collect()
    }
    expected = {}
    for _, (k, v, _p) in enumerate(rows):
        s, n, mn, mx = expected.get(k, (0, 0, None, None))
        expected[k] = (
            s + v,
            n + 1,
            v if mn is None else min(mn, v),
            v if mx is None else max(mx, v),
        )
    assert got == expected


@given(rows=rows_strategy, salts=st.sampled_from([1, 4]))
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_salted_join_equals_direct_join(spark, rows, salts):
    from pyspark.sql import functions as F

    from min_flink_spark.operators.skew import salted_join

    left = to_df(spark, rows)
    right = spark.createDataFrame(
        [("a", 1), ("b", 2)], "k string, w long"
    )
    from collections import Counter

    # multiset compare: a bug that duplicates a left row per matching
    # salt replica would vanish under a plain set()
    direct = Counter(
        tuple(r) for r in left.join(right, "k", "left").select("seq", "w").collect()
    )
    salted = Counter(
        tuple(r)
        for r in salted_join(
            left, right, on=["k"], salt_col=F.col("seq"), salts=salts, how="left"
        ).select("seq", "w").collect()
    )
    assert salted == direct


@given(
    ids=st.lists(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=40, unique=True),
    parts=st.sampled_from([1, 3, 7]),
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_global_index_property(spark, ids, parts):
    """Positions equal sorted-enumerate of the md5-keyed order on
    arbitrary unique id sets and partition counts."""
    import hashlib

    from pyspark.sql import functions as F

    from min_flink_spark.operators.relational import global_index

    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    key = [F.md5(F.col("doc_id").cast("string")), F.col("doc_id")]
    got = {
        r["doc_id"]: r["pos"]
        for r in global_index(df, key, num_partitions=parts).collect()
    }
    order = sorted(ids, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
    assert got == {doc: pos + 1 for pos, doc in enumerate(order)}


# ---------------------------------------------------------------------------
# exact-substring dedup vs pure-Python model (arbitrary corpora)
# ---------------------------------------------------------------------------


def _substr_model(docs, k, df_cap):
    """Reference model of dedup_substrings: global shingle counts,
    first-(doc,pos) occurrence kept, later occurrences' spans covered,
    docs rebuilt from uncovered positions."""
    toks = {d: t.split() if t else [] for d, t in docs}
    occ = {}
    for d, t in sorted(toks.items()):
        for p in range(len(t) - k + 1):
            occ.setdefault(" ".join(t[p : p + k]), []).append((d, p))
    covered = {d: set() for d in toks}
    for sh, places in occ.items():
        if 2 <= len(places) <= df_cap:
            for d, p in sorted(places)[1:]:
                covered[d].update(range(p, p + k))
    out = {}
    for d, t in toks.items():
        kept = [tok for i, tok in enumerate(t) if i not in covered[d]]
        out[d] = (" ".join(kept), len(kept), len(t))
    return out


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=9),
            st.lists(
                st.sampled_from("abcdefg"), min_size=0, max_size=20
            ).map(" ".join),
        ),
        min_size=1,
        max_size=8,
        unique_by=lambda t: t[0],
    ),
    k=st.sampled_from([2, 3]),
)
def test_dedup_substrings_matches_model(spark, docs, k):
    from min_flink_spark.operators.dedup import dedup_substrings

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["text"], r["n_kept"], r["n_tokens"])
        for r in dedup_substrings(df, k=k, df_cap=1000).collect()
    }
    assert got == _substr_model(docs, k, 1000)


def test_conversation_assembly_partition_invariant(spark, sf_dir):
    """The ordered-collect pattern (collect structs + array_sort) must
    yield the SAME conversation string under any physical partitioning —
    the whole point of sorting inside the array instead of relying on
    collect_list order."""
    from min_flink_spark.queries import QUERIES

    base = {
        r["user_id"]: r["convo"]
        for r in QUERIES["conversation_assembly"](spark, sf_dir).collect()
    }
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").repartition(7, "event_type")
    from pyspark.sql import functions as F

    ordered = F.array_sort(F.collect_list(F.struct("ts", "event_id", "event_type")))
    redo = {
        r["user_id"]: r["convo"]
        for r in ev.groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(ordered, lambda x: x["event_type"]), ">"
            ).alias("convo")
        )
        .collect()
    }
    assert base == redo


# ---------------------------------------------------------------------------
# CEP pattern functions vs brute-force models (pure pandas — no Spark)
# ---------------------------------------------------------------------------

_cep_events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=50),   # ts_us (tiny clock)
        st.sampled_from(["click", "purchase", "view"]),
    ),
    min_size=0,
    max_size=30,
)


def _cep_frame(events):
    import pandas as pd

    return pd.DataFrame(
        {
            "ts_us": [t for t, _ in events],
            "event_id": list(range(len(events))),
            "event_type": [k for _, k in events],
        }
    )


@given(events=_cep_events, window=st.integers(min_value=1, max_value=20))
@settings(max_examples=200, deadline=None)
def test_followed_by_matches_bruteforce(events, window):
    """Single-batch FollowedByFunction ≡ per-purchase brute force:
    latest click strictly before, within the inclusive window, ties on
    ts resolved by larger event_id."""
    from min_flink_spark.streaming.cep import FollowedByFunction

    fn = FollowedByFunction("click", "purchase", window)
    out, _ = fn.process_element((7,), _cep_frame(events), None)
    got = (
        set()
        if out is None
        else {(r.purchase_id, r.click_id) for r in out.itertuples()}
    )
    want = set()
    for i, (bt, bk) in enumerate(events):
        if bk != "purchase":
            continue
        cands = [
            (at, j)
            for j, (at, ak) in enumerate(events)
            if ak == "click" and at < bt and at >= bt - window
        ]
        if cands:
            want.add((i, max(cands)[1]))
    assert got == want


@given(events=_cep_events, window=st.integers(min_value=1, max_value=20))
@settings(max_examples=200, deadline=None)
def test_absence_matches_bruteforce(events, window):
    """Single-batch AbsenceFunction ≡ brute force: a click alerts iff
    no purchase in (ts, ts+T] AND the key's max ts reaches ts+T."""
    from min_flink_spark.streaming.cep import AbsenceFunction

    fn = AbsenceFunction("click", "purchase", window)
    out, state = fn.process_element((7,), _cep_frame(events), None)
    got = set() if out is None else {r.click_id for r in out.itertuples()}
    max_ts = max((t for t, _ in events), default=0)
    want = set()
    for j, (at, ak) in enumerate(events):
        if ak != "click":
            continue
        satisfied = any(
            bk == "purchase" and at < bt <= at + window for bt, bk in events
        )
        if not satisfied and at + window <= max_ts:
            want.add(j)
    assert got == want
    # pending clicks (unsatisfied, unexpired) must stay in state
    pending = {
        j
        for j, (at, ak) in enumerate(events)
        if ak == "click"
        and not any(bk == "purchase" and at < bt <= at + window for bt, bk in events)
        and at + window > max_ts
    }
    assert set(state[1]) == pending


# ---- round-4 operator properties ----

edge_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=8),
        st.integers(min_value=0, max_value=8),
    ),
    min_size=1,
    max_size=30,
)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(edges=edge_strategy)
def test_triangle_total_divisible_by_three(spark, edges):
    """Σ per-node counts = 3 × #triangles — every triangle contributes
    exactly one count to each of its three corners, under any random
    graph (self-loops and duplicates included in the input)."""
    from min_flink_spark.operators.graph import triangle_counts

    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    rows = triangle_counts(df).collect()
    total = sum(r.n_triangles for r in rows)
    assert total % 3 == 0
    # brute-force model on the canonical simple graph
    simple = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    nodes = {v for e in simple for v in e}
    tri = sum(
        1
        for a in nodes for b in nodes for c in nodes
        if a < b < c and (a, b) in simple and (b, c) in simple and (a, c) in simple
    )
    assert total == 3 * tri


changelog_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),      # key
        st.integers(min_value=0, max_value=20),     # ts (coarse → ties)
        st.sampled_from(["A", "B", "C"]),           # state
    ),
    min_size=1,
    max_size=25,
)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=changelog_strategy)
def test_scd2_intervals_partition_timeline(spark, rows):
    """Per key: intervals are chronologically chained (each valid_to ==
    next valid_from), exactly one open interval, and adjacent intervals
    never carry the same state (compaction actually compacted)."""
    from pyspark.sql import functions as F

    from min_flink_spark.operators.pipeline import scd2_from_changelog

    df = spark.createDataFrame(
        [(k, t, s, i) for i, (k, t, s) in enumerate(rows)],
        "k bigint, t bigint, s string, seq bigint",
    ).withColumn("t", F.timestamp_seconds(F.col("t")))
    out = scd2_from_changelog(
        df, key_cols=["k"], attr_cols=["s"], ts_col="t", seq_col="seq"
    ).collect()
    by_key = {}
    for r in out:
        by_key.setdefault(r.k, []).append(r)
    for k, ivs in by_key.items():
        ivs.sort(key=lambda r: r.valid_from)
        assert sum(1 for r in ivs if r.is_current) == 1
        assert ivs[-1].valid_to is None and ivs[-1].is_current
        for a, b in zip(ivs, ivs[1:]):
            assert a.valid_to == b.valid_from
            assert a.s != b.s  # compacted: no same-state neighbors


def _bpe_scan_model(toks, left, right):
    """Reference forward-scan merge: left-to-right, non-overlapping, a
    just-merged token never re-eligible within the same pass — the rule
    subword-nmt/HF apply."""
    out, i = [], 0
    while i < len(toks):
        if i + 1 < len(toks) and toks[i] == left and toks[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(toks[i])
            i += 1
    return out


def test_bpe_merge_pair_matches_forward_scan(spark):
    """_merge_pair (double-space replace) ≡ token-array forward scan on
    every symbol sequence up to length 6 over an alphabet whose tokens
    can collide with merged output ('ab', 'aa') — the adjacent-run and
    prefix-ambiguity cases a padded single-space replace gets wrong
    ('a a a a' must become 'aa aa', not 'aa a a')."""
    import itertools

    from pyspark.sql import functions as F

    from min_flink_spark.operators.pipeline import _merge_pair

    alph = ["a", "b", "ab", "aa"]
    cases = []
    for n in range(1, 7):
        for toks in itertools.product(alph, repeat=n):
            for pair in (("a", "a"), ("a", "b"), ("ab", "a"), ("aa", "aa")):
                cases.append((" ".join(toks), pair[0] + " " + pair[1],
                              " ".join(_bpe_scan_model(list(toks), *pair))))
    df = spark.createDataFrame(cases, "sym string, pair string, want string")
    got = df.select(
        "sym", "pair", "want", _merge_pair(F.col("sym"), F.col("pair")).alias("got")
    )
    bad = got.filter(F.col("got") != F.col("want")).limit(5).collect()
    assert not bad, f"forward-scan divergence: {bad}"


def test_bpe_apply_merges_rank_order_enforced(spark):
    """bpe_apply_merges must apply merges in merge_rank order even when
    the input frame arrives shuffled: rank 1 = (a,a), rank 2 = (aa,aa)
    on 'aaaa' yields one 'aaaa' token only if rank order held; the
    reverse order leaves 'aa aa'."""
    from min_flink_spark.operators.pipeline import bpe_apply_merges

    merges = spark.createDataFrame(
        [(2, "aa aa"), (1, "a a")], "merge_rank bigint, pair string"
    ).repartition(4)
    words = spark.createDataFrame([("aaaa",), ("aab",)], "word string")
    applied = bpe_apply_merges(words, merges)
    out = {r.word: r.sym for r in applied.collect()}
    assert out == {"aaaa": "aaaa", "aab": "aa b"}
    from min_flink_spark.core.ckpt import release_backing

    release_backing(applied)  # no-op here (hand-built merges), by contract


# ---------------------------------------------------------------------------
# media header parsers: round-trip on arbitrary parameters (pure Python —
# the kernels are deterministic byte walks, so hypothesis drives them
# directly, no Spark per example)
# ---------------------------------------------------------------------------


@given(
    sr=st.integers(min_value=1, max_value=2**31 - 1),
    ch=st.integers(min_value=1, max_value=64),
    bits=st.sampled_from([8, 16, 24, 32]),
    frames=st.integers(min_value=0, max_value=2**20),
    junk=st.lists(
        st.binary(min_size=0, max_size=9), min_size=0, max_size=3
    ),
)
@settings(deadline=None)
def test_wav_roundtrip_any_params(sr, ch, bits, frames, junk):
    """parse_wav_header inverts the generator for ANY PCM parameter
    combination, with arbitrary (odd- or even-sized) foreign chunks
    injected ahead of fmt — pinning LE field packing, the word-aligned
    walk, and the frames→ms integer math."""
    from min_flink_spark.operators.multimodal import parse_wav_header

    ba = ch * bits // 8
    data_size = frames * ba
    chunks = b""
    for i, payload in enumerate(junk):
        cid = f"jk{i:02d}".encode()
        chunks += cid + len(payload).to_bytes(4, "little") + payload
        if len(payload) % 2:
            chunks += b"\x00"
    chunks += (
        b"fmt " + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little") + ch.to_bytes(2, "little")
        + sr.to_bytes(4, "little") + min(sr * ba, 2**32 - 1).to_bytes(4, "little")
        + ba.to_bytes(2, "little") + bits.to_bytes(2, "little")
    )
    chunks += b"data" + data_size.to_bytes(4, "little")
    wav = b"RIFF" + (4 + len(chunks)).to_bytes(4, "little") + b"WAVE" + chunks
    assert parse_wav_header(wav) == (sr, ch, bits, data_size // ba * 1000 // sr)


@given(
    ts=st.integers(min_value=1, max_value=2**31 - 1),
    du=st.integers(min_value=0, max_value=2**62),
    version=st.sampled_from([0, 1]),
    pre=st.lists(st.binary(min_size=0, max_size=7), min_size=0, max_size=3),
)
@settings(deadline=None)
def test_mp4_roundtrip_any_params(ts, du, version, pre):
    """parse_mp4_duration inverts the generator for any timescale/
    duration/version, with arbitrary boxes injected at top level before
    moov — pinning BE sizes, version dispatch, and units→ms math.
    Durations beyond u32 force version 1 (the real-world constraint)."""
    from min_flink_spark.operators.multimodal import parse_mp4_duration

    if du >= 2**32:
        version = 1

    def box(btype, payload):
        return (8 + len(payload)).to_bytes(4, "big") + btype + payload

    if version == 0:
        mvhd = (
            b"\x00\x00\x00\x00" + b"\x00" * 8
            + ts.to_bytes(4, "big") + du.to_bytes(4, "big")
        )
    else:
        mvhd = (
            b"\x01\x00\x00\x00" + b"\x00" * 16
            + ts.to_bytes(4, "big") + du.to_bytes(8, "big")
        )
    b = box(b"ftyp", b"isom")
    for i, p in enumerate(pre):
        b += box(f"sk{i:02d}".encode(), p)
    b += box(b"moov", box(b"mvhd", mvhd))
    assert parse_mp4_duration(b) == (ts, du * 1000 // ts)


@given(
    sizes=st.lists(st.integers(min_value=1, max_value=3000), min_size=1, max_size=60),
    target=st.integers(min_value=100, max_value=2000),
)
@settings(deadline=None)
def test_compaction_model_overflow_bound(sizes, target):
    """The sequential-fill FFD rule (the exact expression
    compaction_plan computes per partition — sort desc, exclusive
    prefix sum, floor division) keeps every bin under target + its
    largest member and isolates oversized files, for ANY inventory.
    Pure-Python replica of the window expression; the Spark plan is
    pinned to this rule by the oracle query and the targeted tests."""
    ordered = sorted(enumerate(sizes), key=lambda t: (-t[1], t[0]))
    bins = {}
    cum = 0
    for fid, sz in ordered:
        bins.setdefault(cum // target, []).append(sz)
        cum += sz
    for members in bins.values():
        assert sum(members) - max(members) < target
        if members[0] > target:
            assert len(members) == 1


# ---------------------------------------------------------------------------
# r7: mergeable log-histogram sketch — merge identity and quantile
# containment on arbitrary inputs and arbitrary 2-way splits
# ---------------------------------------------------------------------------

vals_strategy = st.lists(
    st.integers(min_value=0, max_value=1_000_000), min_size=1, max_size=40
)


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(vals=vals_strategy, cut=st.integers(min_value=0, max_value=39), q=st.sampled_from([1, 25, 50, 90, 99, 100]))
def test_sketch_merge_identity_and_quantile_containment(spark, vals, cut, q):
    import pyspark.sql.functions as F

    from min_flink_spark.operators.pipeline import (
        log_histogram_sketch,
        merge_histogram_sketches,
        sketch_quantiles,
    )

    cut = min(cut, len(vals))
    df = spark.createDataFrame([("k", v) for v in vals], "k string, vm long")
    a = spark.createDataFrame([("k", v) for v in vals[:cut]] or [("k", None)], "k string, vm long").filter("vm IS NOT NULL")
    b = spark.createDataFrame([("k", v) for v in vals[cut:]] or [("k", None)], "k string, vm long").filter("vm IS NOT NULL")
    direct = log_histogram_sketch(df, ["k"], F.col("vm"))
    merged = merge_histogram_sketches(
        log_histogram_sketch(a, ["k"], F.col("vm")),
        log_histogram_sketch(b, ["k"], F.col("vm")),
    )
    assert sorted(map(tuple, direct.collect())) == sorted(map(tuple, merged.collect()))

    got = sketch_quantiles(direct, ["k"], [q]).collect()
    assert len(got) == 1
    bin_, lo = got[0]["bin"], got[0]["lo_micro"]
    # the chosen bin must CONTAIN the exact rank-ceil(q·n/100) value
    import math
    true_v = sorted(vals)[math.ceil(q * len(vals) / 100) - 1]
    if true_v == 0:
        assert bin_ == -1 and lo == 0
    else:
        assert bin_ == true_v.bit_length() - 1
        assert lo == 2 ** bin_ and lo <= true_v < 2 * lo


# ---------------------------------------------------------------------------
# r8: count-min sketch — merge identity and never-undercount on
# arbitrary multisets and arbitrary 2-way splits
# ---------------------------------------------------------------------------

items_strategy = st.lists(
    st.integers(min_value=0, max_value=50), min_size=1, max_size=40
)


@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(items=items_strategy, cut=st.integers(min_value=0, max_value=39))
def test_cms_merge_identity_and_one_sided_error(spark, items, cut):
    import collections

    from min_flink_spark.operators.pipeline import (
        cms_estimate,
        count_min_sketch,
        merge_cms,
    )

    cut = min(cut, len(items))
    mk = lambda xs: spark.createDataFrame(  # noqa: E731
        [(str(x),) for x in xs] or [(None,)], "term string"
    ).filter("term IS NOT NULL")
    df, a, b = mk(items), mk(items[:cut]), mk(items[cut:])
    direct = count_min_sketch(df, "term", depth=3, width=16)
    merged = merge_cms(
        count_min_sketch(a, "term", depth=3, width=16),
        count_min_sketch(b, "term", depth=3, width=16),
    )
    assert sorted(map(tuple, direct.collect())) == sorted(
        map(tuple, merged.collect())
    )
    exact = collections.Counter(str(x) for x in items)
    probe = spark.createDataFrame([(t,) for t in exact], "term string")
    est = {
        r["term"]: r["cms_est"]
        for r in cms_estimate(direct, probe, "term", depth=3, width=16).collect()
    }
    assert all(est[t] >= c for t, c in exact.items())


# ---------------------------------------------------------------------------
# r8: Bloom bitmask — no false negatives on arbitrary member/probe sets
# ---------------------------------------------------------------------------


@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    members=st.lists(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=30),
    probes=st.lists(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=30),
)
def test_bloom_never_false_negative(spark, members, probes):
    import pyspark.sql.functions as F

    from min_flink_spark.operators.relational import (
        bloom_bitmask,
        bloom_might_contain,
    )

    mdf = spark.createDataFrame([(m,) for m in members], "k bigint")
    mask = bloom_bitmask(mdf, "k", m_bits=256, k_hashes=2)
    pdf = spark.createDataFrame([(p,) for p in set(probes) | set(members)], "k bigint")
    passed = {
        r["k"]
        for r in pdf.filter(bloom_might_contain(F.col("k"), mask, 256, 2)).collect()
    }
    assert set(members) <= passed


# ---------------------------------------------------------------------------
# Misra-Gries update rule (operators/pipeline.mg_update) — pure python,
# the ONE counter-update shared by batch partitions and streaming state
# ---------------------------------------------------------------------------


@given(
    stream=st.lists(st.integers(min_value=0, max_value=30), max_size=300),
    splits=st.lists(st.integers(min_value=1, max_value=50), max_size=8),
    m=st.integers(min_value=2, max_value=12),
)
@settings(max_examples=200, deadline=None)
def test_mg_update_composition_holds_classical_bounds(stream, splits, m):
    """mg_update applied over ANY batch split of a stream must keep
    the classical guarantees for the WHOLE stream: ≤ m counters,
    est ∈ [true − N/m, true], and containment for items above N/m —
    the composition argument the streaming mode (MGFunction) and the
    batch partition pass both rest on."""
    import collections
    import itertools

    from min_flink_spark.operators.pipeline import mg_update

    items = [f"t{v}" for v in stream]
    # carve the stream into batches at the given split sizes
    batches, it = [], iter(items)
    for size in splits:
        batch = list(itertools.islice(it, size))
        if batch:
            batches.append(batch)
    rest = list(it)
    if rest:
        batches.append(rest)

    counters: dict = {}
    for batch in batches:
        vc = collections.Counter(batch)
        counters = mg_update(counters, list(vc), list(vc.values()), m)

    exact = collections.Counter(items)
    n = len(items)
    assert len(counters) <= m
    for item, est in counters.items():
        assert est <= exact[item]
        assert est >= exact[item] - n / m
    for item, true in exact.items():
        if true > n / m:
            assert item in counters


def test_mg_update_skips_zero_weight_items():
    """ADVICE r9: a zero-weight item must not occupy a counter slot —
    it adds no mass but would fire the (m+1)-th-largest subtraction
    earlier than the accounting requires and emit cnt=0 summary rows.
    With m=2 and two real items, a flood of distinct zero-weight items
    must leave the real counters EXACT (no subtraction ever fires)."""
    from min_flink_spark.operators.pipeline import mg_update

    counters: dict = {}
    counters = mg_update(counters, ["a", "b"], [5, 3], m=2)
    counters = mg_update(
        counters, [f"z{i}" for i in range(10)], [0] * 10, m=2
    )
    assert counters == {"a": 5, "b": 3}


# ---------------------------------------------------------------------------
# r9: chunked bitmap index — merge identity + exact set algebra on
# arbitrary memberships (the windowed range-merge correctness rests on
# merge(bitmap(A), bitmap(B)) ≡ bitmap(A ∪ B))
# ---------------------------------------------------------------------------


@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["s1", "s2"]),
            st.integers(min_value=0, max_value=300),
        ),
        min_size=1,
        max_size=40,
    ),
    cut=st.integers(min_value=0, max_value=39),
)
def test_bitmap_merge_identity_and_exact_algebra(spark, rows, cut):
    from min_flink_spark.operators.bitmap import (
        bitmap_index,
        bitmap_pair_ops,
        merge_bitmap_indexes,
    )

    cut = min(cut, len(rows))
    mk = lambda xs: spark.createDataFrame(  # noqa: E731
        xs or [("s1", 0)], "seg string, id bigint"
    ).limit(len(xs))
    whole, a, b = mk(rows), mk(rows[:cut]), mk(rows[cut:])
    direct = bitmap_index(whole, "seg", "id")
    merged = merge_bitmap_indexes(
        bitmap_index(a, "seg", "id"), bitmap_index(b, "seg", "id")
    )
    assert sorted(map(tuple, direct.collect())) == sorted(
        map(tuple, merged.collect())
    )
    s1 = {i for s, i in rows if s == "s1"}
    s2 = {i for s, i in rows if s == "s2"}
    if s1 and s2:
        (got,) = bitmap_pair_ops(direct, "seg").collect()
        assert (got["n_a"], got["n_b"]) == (len(s1), len(s2))
        assert got["n_inter"] == len(s1 & s2)
        assert got["n_union"] == len(s1 | s2)


# ---------------------------------------------------------------------------
# r11: bottom-k (KMV) — the keyed closure behind every keyed×windowed
# mode: merging per-(day, key) sketches with the day dropped must equal
# sketching the same rows per key directly, for ARBITRARY row multisets,
# day assignments, and k (the order-statistic closure bottom-k(A ∪ B) =
# bottom-k(bottom-k(A) ∪ bottom-k(B)) composed with key retention —
# the identity kmv_keyed_windowed_distinct and its streaming twin ride)
# ---------------------------------------------------------------------------


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),   # day bucket
            st.integers(min_value=0, max_value=1),   # retained key
            st.integers(min_value=0, max_value=30),  # id (dups intended)
        ),
        min_size=1,
        max_size=60,
    ),
    k=st.integers(min_value=1, max_value=8),
)
def test_bottom_k_keyed_range_merge_identity(spark, rows, k):
    from min_flink_spark.operators.pipeline import bottom_k_sketch, merge_bottom_k

    df = spark.createDataFrame(
        [(f"d{d}", f"g{g}", i) for d, g, i in rows],
        "day string, key string, id bigint",
    )
    daily = bottom_k_sketch(df, ["day", "key"], "id", k=k)
    merged = merge_bottom_k([daily.drop("day")], ["key"], k=k)
    direct = bottom_k_sketch(df.drop("day"), ["key"], "id", k=k)
    assert sorted(
        map(tuple, merged.select("key", "pos", "hash", "id").collect())
    ) == sorted(map(tuple, direct.select("key", "pos", "hash", "id").collect()))


# --- exact_percentiles ≡ quantile_cont op tree (verdict r12 item 5) ---
#
# The operator's contract is BIT-identity with DuckDB's quantile_cont
# formula ((⌈p⌉−p)·lo + (p−⌊p⌋)·hi over 0-based pos = q·(n−1)), not
# just closeness — the r12 sf1 fix exists because Spark percentile()'s
# algebraically-equal formula differs by ULPs. Model the formula in
# Python (same IEEE ops, same order) and require repr-equality.

pct_rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),  # group key
        st.one_of(
            st.none(),
            st.floats(
                min_value=-1e6, max_value=1e6,
                allow_nan=False, allow_infinity=False,
            ),
        ),
    ),
    min_size=1,
    max_size=40,
)
qs_strategy = st.lists(
    st.sampled_from([0.0, 0.05, 0.25, 0.5, 0.75, 0.9, 0.95, 0.99, 1.0]),
    min_size=1,
    max_size=4,
    unique=True,
)


def _quantile_cont_model(vals, q):
    import math

    vs = sorted(v for v in vals if v is not None)
    if not vs:
        return None
    p = q * float(len(vs) - 1)
    lo, hi = vs[int(math.floor(p))], vs[int(math.ceil(p))]
    if math.ceil(p) == math.floor(p):
        return lo
    return (math.ceil(p) - p) * lo + (p - math.floor(p)) * hi


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=pct_rows_strategy, qs=qs_strategy)
@pytest.mark.parametrize("distributed", [False, True])
def test_exact_percentiles_matches_quantile_cont_model(spark, rows, qs, distributed):
    """Both physical strategies (per-group window sort; r13
    range-repartition + local-rank + offset-broadcast) must be
    bit-identical to the quantile_cont model — the distributed path's
    global ranks are exact, not approximate."""
    from min_flink_spark.operators.pipeline import exact_percentiles

    df = spark.createDataFrame(
        [(k, v) for k, v in rows], "k int, v double"
    )
    aliases = [f"q{j}" for j in range(len(qs))]
    out = exact_percentiles(
        df, "v", qs, aliases, keys=["k"], distributed=distributed
    )
    got = {r["k"]: [r[a] for a in aliases] for r in out.collect()}
    for k in {k for k, _ in rows}:
        vals = [v for kk, v in rows if kk == k]
        want = [_quantile_cont_model(vals, q) for q in qs]
        if all(w is None for w in want):
            # all-null group: operator drops the row (documented)
            assert k not in got
            continue
        assert [repr(x) for x in got[k]] == [repr(w) for w in want]
