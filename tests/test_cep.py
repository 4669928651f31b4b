"""CEP followed-by pattern (streaming/cep.py): tie determinism, window
boundaries, and cross-micro-batch state carry."""

import os

from pyspark.sql import functions as F

from min_flink_spark.streaming.cep import FollowedByFunction
from min_flink_spark.streaming.runner import (
    run_to_completion,
    shuffle_partitions,
    stream_parquet,
)
from min_flink_spark.streaming.stateful import process_keyed

SCHEMA = "user_id bigint, ts_us bigint, event_id bigint, event_type string"
HOUR = 3_600_000_000


def _run(spark, rows, tmpdir="/tmp"):
    src = os.path.join(tmpdir, "cep_events")
    df = spark.createDataFrame(rows, SCHEMA)
    df.coalesce(1).write.mode("overwrite").parquet(src)
    s = stream_parquet(spark, src, SCHEMA)
    fn = FollowedByFunction("click", "purchase", HOUR)
    out = process_keyed(s, ["user_id"], fn, output_mode="update")
    with shuffle_partitions(spark, 2):
        return run_to_completion(out, output_mode="update").collect()


def test_tie_on_click_ts_takes_larger_id(spark, tmp_path):
    rows = [
        (1, 1000, 11, "click"),
        (1, 1000, 12, "click"),  # same ts as 11 — must win on id
        (1, 2000, 20, "purchase"),
    ]
    got = _run(spark, rows, tmpdir=str(tmp_path))
    assert [(r.purchase_id, r.click_id) for r in got] == [(20, 12)]


def test_window_boundaries_inclusive_start_exclusive_end(spark, tmp_path):
    rows = [
        (2, 0, 1, "click"),          # exactly purchase_ts - 1h: matches
        (2, HOUR, 2, "purchase"),
        (3, 5000, 3, "click"),
        (3, 5000, 4, "purchase"),    # click NOT strictly before: no match
        (4, 0, 5, "click"),
        (4, HOUR + 1, 6, "purchase"),  # 1h+1us gap: expired
    ]
    got = {r.purchase_id: r.click_id for r in _run(spark, rows, tmpdir=str(tmp_path))}
    assert got == {2: 1}


def test_each_purchase_matches_latest_click(spark, tmp_path):
    rows = [
        (5, 1000, 1, "click"),
        (5, 2000, 2, "click"),
        (5, 3000, 3, "purchase"),  # → click 2
        (5, 4000, 4, "purchase"),  # → click 2 again (no consumption)
        (5, 5000, 5, "click"),
        (5, 6000, 6, "purchase"),  # → click 5
    ]
    got = {r.purchase_id: r.click_id for r in _run(spark, rows, tmpdir=str(tmp_path))}
    assert got == {3: 2, 4: 2, 6: 5}


def test_state_carries_across_batches(spark, tmp_path):
    """Clicks arriving in an earlier micro-batch must match purchases
    in a later one: two files, one per trigger, clicks all earlier in
    event time than every purchase."""
    src = str(tmp_path / "cep_two_batches")
    clicks = spark.createDataFrame(
        [(7, 1000, 1, "click"), (7, 2000, 2, "click")], SCHEMA
    )
    purchases = spark.createDataFrame([(7, 3000, 9, "purchase")], SCHEMA)
    # stage as two separate files so maxFilesPerTrigger=1 yields 2 batches
    clicks.coalesce(1).write.parquet(src + "/f=a")
    purchases.coalesce(1).write.parquet(src + "/f=b")
    import glob

    files = sorted(glob.glob(src + "/f=*/**/*.parquet", recursive=True))
    flat = str(tmp_path / "flat")
    os.makedirs(flat)
    for i, f in enumerate(files):
        os.link(f, os.path.join(flat, f"{i:02d}.parquet"))

    s = stream_parquet(spark, flat, SCHEMA, max_files_per_trigger=1)
    fn = FollowedByFunction("click", "purchase", HOUR)
    out = process_keyed(s, ["user_id"], fn, output_mode="update")
    with shuffle_partitions(spark, 2):
        got = run_to_completion(out, output_mode="update").collect()
    assert {(r.purchase_id, r.click_id) for r in got} == {(9, 2)}


def test_absence_alert_boundaries(spark, tmp_path):
    """A purchase exactly at click+T satisfies (no alert); expiry fires
    exactly when the key's clock reaches click+T; pending clicks near
    end-of-input emit nothing."""
    from min_flink_spark.streaming.cep import AbsenceFunction

    rows = [
        # user 1: purchase exactly at +T → satisfied, no alert
        (1, 0, 1, "click"),
        (1, HOUR, 2, "purchase"),
        # user 2: no purchase, a later event advances the clock to +T → alert
        (2, 0, 3, "click"),
        (2, HOUR, 4, "view"),
        # user 3: no purchase but clock never reaches +T → pending, no alert
        (3, 0, 5, "click"),
        (3, HOUR - 1, 6, "view"),
        # user 4: purchase too late (strictly after +T) → alert
        (4, 0, 7, "click"),
        (4, HOUR + 1, 8, "purchase"),
    ]
    src = str(tmp_path / "absence_events")
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(src)
    s = stream_parquet(spark, src, SCHEMA)
    out = process_keyed(s, ["user_id"], AbsenceFunction(), output_mode="update")
    with shuffle_partitions(spark, 2):
        got = {(r.user_id, r.click_id) for r in run_to_completion(out, output_mode="update").collect()}
    assert got == {(2, 3), (4, 7)}


def test_followed_by_state_survives_checkpoint_restart(spark, tmp_path):
    """Clicks ingested in run 1 must match purchases ingested in run 2
    of a SEPARATE bounded query sharing the checkpoint — state restores
    from the store, not from reprocessing (run 2 only reads the new
    file)."""
    src = str(tmp_path / "stream_src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    def add_file(name, rows):
        df = spark.createDataFrame(rows, SCHEMA)
        staged = str(tmp_path / ("stage_" + name))
        df.coalesce(1).write.parquet(staged)
        import glob as _glob
        import shutil

        part = _glob.glob(staged + "/*.parquet")[0]
        shutil.copy(part, os.path.join(src, name + ".parquet"))

    from min_flink_spark.streaming.runner import run_foreach_batch

    sink_dir = str(tmp_path / "sink")

    def run_once():
        s = stream_parquet(spark, src, SCHEMA)
        fn = FollowedByFunction("click", "purchase", HOUR)
        out = process_keyed(s, ["user_id"], fn, output_mode="update")

        def sink(batch_df, batch_id):
            batch_df.write.mode("append").parquet(sink_dir)

        with shuffle_partitions(spark, 2):
            run_foreach_batch(out, sink, output_mode="update", checkpoint_dir=ckpt)
        try:
            return spark.read.parquet(sink_dir).collect()
        except Exception:
            return []  # nothing emitted yet

    add_file("a", [(1, 1000, 1, "click"), (1, 2000, 2, "click")])
    first = run_once()
    assert first == []  # no purchases yet, nothing emitted

    add_file("b", [(1, 3000, 9, "purchase")])
    second = run_once()
    assert {(r.purchase_id, r.click_id) for r in second} == {(9, 2)}


def _run_times(spark, rows, tmpdir, n=3, within=HOUR):
    from min_flink_spark.streaming.cep import TimesFunction

    src = os.path.join(tmpdir, "cep_times_events")
    df = spark.createDataFrame(rows, SCHEMA)
    df.coalesce(1).write.mode("overwrite").parquet(src)
    s = stream_parquet(spark, src, SCHEMA)
    out = process_keyed(s, ["user_id"], TimesFunction("error", n, within),
                        output_mode="update")
    with shuffle_partitions(spark, 2):
        return run_to_completion(out, output_mode="update").collect()


def test_times_counts_window_inclusive_and_peers(spark, tmp_path):
    rows = [
        (1, 0, 1, "error"),          # exactly match_ts - 1h: counts
        (1, HOUR // 2, 2, "error"),
        (1, HOUR, 3, "error"),       # 3rd in [0, 1h] → fires, count 3
        (1, HOUR, 4, "error"),       # ts-peer: both see count 4
        (2, 0, 5, "error"),          # isolated pair never fires
        (2, 10 * HOUR, 6, "error"),
        (1, 1000, 7, "view"),        # other types invisible to times()
    ]
    got = sorted(
        (r.event_id, r.n_in_window) for r in _run_times(spark, rows, str(tmp_path))
    )
    assert got == [(3, 4), (4, 4)]


def test_times_window_excludes_expired(spark, tmp_path):
    rows = [
        (9, 0, 1, "error"),
        (9, HOUR + 1, 2, "error"),   # first has fallen out of [ts-1h, ts]
        (9, HOUR + 2, 3, "error"),
        (9, HOUR + 3, 4, "error"),   # 3 live errors → fires here
    ]
    got = sorted(
        (r.event_id, r.n_in_window) for r in _run_times(spark, rows, str(tmp_path))
    )
    assert got == [(4, 3)]


def test_times_state_survives_checkpoint_restart(spark, tmp_path):
    """Errors from run 1 count toward run 2's window via the state
    store (checkpointed restart), mirroring the followed-by restart
    contract."""
    import os as _os

    from min_flink_spark.streaming.cep import TimesFunction
    from min_flink_spark.streaming.runner import run_foreach_batch, stream_files

    src = str(tmp_path / "times_restart_src")
    ckpt = str(tmp_path / "times_restart_ckpt")
    b1 = spark.createDataFrame(
        [(5, 1000, 1, "error"), (5, 2000, 2, "error")], SCHEMA
    )
    b1.coalesce(1).write.mode("overwrite").parquet(src)
    got = []

    def make_query():
        s = stream_files(spark, src, SCHEMA)
        out = process_keyed(
            s, ["user_id"], TimesFunction("error", 3, HOUR), output_mode="update"
        )
        run_foreach_batch(
            out,
            lambda df, bid: got.extend(
                (r.event_id, r.n_in_window) for r in df.collect()
            ),
            output_mode="update",
            checkpoint_dir=ckpt,
        )

    with shuffle_partitions(spark, 2):
        make_query()
        assert got == []  # only 2 errors so far
        b2 = spark.createDataFrame([(5, 3000, 3, "error")], SCHEMA)
        b2.coalesce(1).write.mode("append").parquet(src)
        make_query()  # restart from checkpoint: state carries runs 1+2
    assert got == [(3, 3)]
