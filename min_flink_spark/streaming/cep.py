"""Complex-event-processing primitive: A-followed-by-B-within-T.

The reference trim carries no CEP library, but its stated capability
target (keyed stateful stream processing — SURVEY §2.8,
``FSJ/api/functions/KeyedProcessFunction.java``) is exactly what
pattern detection is built from: per-key state holding the candidate
"A" events, per-record matching against incoming "B" events. This
module implements the canonical two-step pattern (Flink CEP's
``A.followedBy(B).within(T)`` with a latest-match-wins skip strategy)
on ``applyInPandasWithState``.

Match rule (deterministic): each B event matches the LATEST preceding
A event of the same key with ``a.ts < b.ts`` and ``a.ts ≥ b.ts − T``;
ties on timestamp resolve to the larger event id. Every B emits at
most one match.

Scale notes: one shuffle on the key; state per key is the A events
inside the trailing T window only (pruned against the key's max seen
event time each batch — the event-time-ordered analog of a watermark),
so state is bounded by the pattern window, never the stream length.
Matching per batch is vectorized (lexsort + searchsorted), not
per-row Python.

Cross-batch ordering: like any event-time operator, out-of-order
arrivals across micro-batches are handled only within the window
retained by the prune; the bounded-replay oracle runs single-batch
(AvailableNow), where ordering is total.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from min_flink_spark.streaming.stateful import KeyedProcessFunction


class FollowedByFunction(KeyedProcessFunction):
    """Detect ``first_type`` followed by ``second_type`` within
    ``within_us`` microseconds, per key.

    Input rows need columns ``ts_us`` (bigint event-time micros),
    ``event_id`` (bigint) and ``event_type`` (string). Output one row
    per matched B: (key, second_id, first_id).
    """

    needs_full_group = True  # matching is order-sensitive across chunks
    state_schema = "a_ts array<bigint>, a_id array<bigint>"
    output_schema = "user_id bigint, purchase_id bigint, click_id bigint"

    def __init__(
        self,
        first_type: str = "click",
        second_type: str = "purchase",
        within_us: int = 3_600_000_000,
    ):
        self.first_type = first_type
        self.second_type = second_type
        self.within_us = within_us

    def process_element(self, key, rows: pd.DataFrame, state):
        # A candidates = carried state ∪ this batch's A events,
        # lexsorted by (ts, id) so the last element of any ts-range
        # slice is the deterministic latest-match winner.
        a_rows = rows[rows["event_type"] == self.first_type]
        a_ts = a_rows["ts_us"].to_numpy(dtype=np.int64)
        a_id = a_rows["event_id"].to_numpy(dtype=np.int64)
        if state is not None:
            a_ts = np.concatenate([np.asarray(state[0], dtype=np.int64), a_ts])
            a_id = np.concatenate([np.asarray(state[1], dtype=np.int64), a_id])
        order = np.lexsort((a_id, a_ts))
        a_ts, a_id = a_ts[order], a_id[order]

        b_rows = rows[rows["event_type"] == self.second_type]
        out = None
        if len(b_rows) and len(a_ts):
            b_ts = b_rows["ts_us"].to_numpy(dtype=np.int64)
            b_id = b_rows["event_id"].to_numpy(dtype=np.int64)
            # hi: first A with ts >= b.ts  → A's strictly before B
            hi = np.searchsorted(a_ts, b_ts, side="left")
            # lo: first A with ts >= b.ts - T (window is inclusive)
            lo = np.searchsorted(a_ts, b_ts - self.within_us, side="left")
            hit = hi > lo
            if hit.any():
                match_idx = hi[hit] - 1  # latest (ts, id) in the window
                out = pd.DataFrame(
                    {
                        "user_id": np.full(int(hit.sum()), key[0], dtype=np.int64),
                        "purchase_id": b_id[hit],
                        "click_id": a_id[match_idx],
                    }
                )

        # Prune A state to the trailing window behind this key's max
        # seen event time — older A's can never match a later B that
        # respects the window.
        max_seen = 0
        if len(rows):
            max_seen = int(rows["ts_us"].max())
        keep = a_ts >= max_seen - self.within_us
        new_state = (a_ts[keep].tolist(), a_id[keep].tolist())
        return out, new_state


class AbsenceFunction(KeyedProcessFunction):
    """Timeout pattern: emit an alert for every ``first_type`` event
    that is NOT followed by a ``second_type`` event within
    ``within_us`` — the canonical per-key timer use-case
    (InternalTimerServiceImpl.java:165-216 is the reference machinery
    this expresses; here the key's own advancing event time plays the
    watermark).

    An A event times out once the key's max seen event time passes
    ``a.ts + T`` with no B in ``(a.ts, a.ts + T]``. Satisfied A's are
    dropped silently; pending A's (still inside the horizon) stay in
    state. Feed the FULL event stream (not just A/B) so every event
    advances the key's clock.
    """

    needs_full_group = True
    state_schema = "a_ts array<bigint>, a_id array<bigint>"
    output_schema = "user_id bigint, click_id bigint"

    def __init__(
        self,
        first_type: str = "click",
        second_type: str = "purchase",
        within_us: int = 3_600_000_000,
    ):
        self.first_type = first_type
        self.second_type = second_type
        self.within_us = within_us

    def process_element(self, key, rows: pd.DataFrame, state):
        a_rows = rows[rows["event_type"] == self.first_type]
        a_ts = a_rows["ts_us"].to_numpy(dtype=np.int64)
        a_id = a_rows["event_id"].to_numpy(dtype=np.int64)
        if state is not None:
            a_ts = np.concatenate([np.asarray(state[0], dtype=np.int64), a_ts])
            a_id = np.concatenate([np.asarray(state[1], dtype=np.int64), a_id])

        # satisfaction: exists b with a.ts < b.ts <= a.ts + T
        b_ts = np.sort(
            rows.loc[rows["event_type"] == self.second_type, "ts_us"].to_numpy(
                dtype=np.int64
            )
        )
        if len(a_ts) and len(b_ts):
            nxt = np.searchsorted(b_ts, a_ts, side="right")
            has_next = nxt < len(b_ts)
            sat = has_next & (b_ts[np.minimum(nxt, len(b_ts) - 1)] <= a_ts + self.within_us)
            a_ts, a_id = a_ts[~sat], a_id[~sat]

        out = None
        # the key's clock only moves on data; an empty batch (possible
        # only via the timeout path, unused here) expires nothing
        max_seen = int(rows["ts_us"].max()) if len(rows) else 0
        expired = a_ts + self.within_us <= max_seen
        if expired.any():
            order = np.lexsort((a_id[expired],))
            out = pd.DataFrame(
                {
                    "user_id": np.full(int(expired.sum()), key[0], dtype=np.int64),
                    "click_id": a_id[expired][order],
                }
            )
        keep = ~expired
        new_state = (a_ts[keep].tolist(), a_id[keep].tolist())
        return out, new_state


class TimesFunction(KeyedProcessFunction):
    """Detect ``n`` occurrences of ``event_type_match`` within a
    trailing ``within_us`` window per key — Flink CEP's
    ``A.times(n).within(T)`` quantifier, the third member of the
    pattern family (followedBy, absence, times).

    Emits one row per matching event (the window CLOSES on it): (key,
    event_id, n_in_window) where ``n_in_window`` counts same-type
    events with ``ts ∈ [event.ts − T, event.ts]`` — identical to the
    SQL ``RANGE BETWEEN T PRECEDING AND CURRENT ROW`` frame (timestamp
    peers count regardless of id, so the answer is id-order-free and
    bit-deterministic).

    State per key is the trailing-window timestamps only (pruned
    against the key's max seen event time, like FollowedByFunction);
    counting per batch is one lexsort + two searchsorted calls."""

    needs_full_group = True
    state_schema = "x_ts array<bigint>"
    output_schema = "user_id bigint, event_id bigint, n_in_window bigint"

    def __init__(
        self,
        event_type_match: str = "error",
        n: int = 3,
        within_us: int = 3_600_000_000,
    ):
        self.event_type_match = event_type_match
        self.n = n
        self.within_us = within_us

    def process_element(self, key, rows: pd.DataFrame, state):
        x_rows = rows[rows["event_type"] == self.event_type_match]
        x_ts = x_rows["ts_us"].to_numpy(dtype=np.int64)
        x_id = x_rows["event_id"].to_numpy(dtype=np.int64)
        all_ts = x_ts
        if state is not None:
            all_ts = np.concatenate([np.asarray(state[0], dtype=np.int64), x_ts])
        all_ts = np.sort(all_ts)

        out = None
        if len(x_ts):
            hi = np.searchsorted(all_ts, x_ts, side="right")
            lo = np.searchsorted(all_ts, x_ts - self.within_us, side="left")
            cnt = hi - lo
            hit = cnt >= self.n
            if hit.any():
                out = pd.DataFrame(
                    {
                        "user_id": np.full(int(hit.sum()), key[0], dtype=np.int64),
                        "event_id": x_id[hit],
                        "n_in_window": cnt[hit].astype(np.int64),
                    }
                )

        max_seen = 0
        if len(rows):
            max_seen = int(rows["ts_us"].max())
        keep = all_ts >= max_seen - self.within_us
        return out, (all_ts[keep].tolist(),)
