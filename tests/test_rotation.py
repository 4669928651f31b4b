"""Mechanical guardrail for the driver-gate prefix rotation
(VERDICT r5 item 2: round 5 wasted its 50-slot gate by not executing
the written rotation — nothing failed, so nothing forced it).

The driver checks only the FIRST ``PREFIX`` queries of the registry
dict order per round.  These tests make a stale arrangement a CI
failure:

  (a) never-driver-checked queries must occupy the prefix — if any is
      left outside, no slot may be spent on a query with a FRESH
      driver row (only changed, never-checked, or deep-stale r1/r2
      queries may hold prefix slots while never-checked queries wait);
  (b) any query whose plan/oracle source changed since the ledger was
      written (tools/rotation_ledger.json, refreshed only when the
      prefix is rearranged) must sort ahead of every unchanged
      never-checked query — semantics changes always take the next
      driver row first.

Reverting queries/__init__.py:_PRIORITY to its round-5 arrangement
makes (a) fail: the r5 prefix held 50 already-green r3/r5-row queries
while 47 never-checked ones waited at positions 51+.
"""

import json
import pathlib

from min_flink_spark.queries import ORACLE, QUERIES
from tools.rotation_ledger import last_checked_rounds, query_hash

PREFIX = 50
DEEP_STALE = 2  # last driver row in r1/r2 counts as promotable filler

REPO = pathlib.Path(__file__).resolve().parent.parent


def _state():
    last = last_checked_rounds()
    ledger = json.load(open(REPO / "tools" / "rotation_ledger.json"))
    names = list(QUERIES)
    never = {n for n in names if n not in last}
    changed = {
        n
        for n in names
        if n in ledger
        and ledger[n]["hash"] != query_hash(n, QUERIES[n], ORACLE.get(n))
    }
    return names, last, never, changed


def test_ledger_covers_registry():
    """Every registered query must be in the ledger — a new query added
    without re-running `python tools/rotation_ledger.py --write` (and
    thereby re-thinking the prefix) fails here."""
    ledger = json.load(open(REPO / "tools" / "rotation_ledger.json"))
    missing = [n for n in QUERIES if n not in ledger]
    assert not missing, f"queries missing from rotation ledger: {missing}"


def test_prefix_spends_no_slot_on_fresh_rows_while_unchecked_wait():
    """(a): if any never-checked query sits outside the gate prefix,
    every query INSIDE the prefix must itself be never-checked,
    changed-since-ledger, or deep-stale (last row r1/r2). A fresh-row
    query occupying a slot while unchecked queries wait is exactly the
    round-5 failure."""
    names, last, never, changed = _state()
    waiting_outside, offenders = _rule_a_violations(names, last, never, changed)
    assert not offenders, (
        f"{len(waiting_outside)} never-checked queries wait outside the "
        f"{PREFIX}-slot prefix, but these fresh-row queries hold slots:\n  "
        + "\n  ".join(f"{n} (last driver row r{last[n]})" for n in offenders)
    )


def test_changed_queries_lead_unchanged_never_checked():
    """(b): a query edited since the ledger snapshot outranks every
    unchanged never-checked query — semantics changes take the next
    driver row first (the builder's changed-first rule, violated for
    the r5 BPE pair)."""
    names, last, never, changed = _state()
    if not changed:
        return
    pos = {n: i for i, n in enumerate(names)}
    frontier = min(
        (pos[n] for n in never - changed), default=len(names)
    )
    late = [n for n in changed if pos[n] > frontier]
    assert not late, (
        "changed-since-ledger queries sorted behind unchanged "
        f"never-checked ones: {late} (frontier at position {frontier}); "
        "move them to the prefix head and refresh the ledger"
    )


def _rule_a_violations(arrangement, last, never, changed):
    """The exact rule test (a) enforces, factored out so the teeth
    check below can run it on a SYNTHETIC state (VERDICT r7 item 1:
    the old self-check drew its never-checked set from the live
    ledger, which emptied for good once all 200 queries had driver
    rows, leaving the test permanently red)."""
    waiting_outside = [n for n in arrangement[PREFIX:] if n in never]
    if not waiting_outside:
        return [], []
    offenders = [
        n
        for n in arrangement[:PREFIX]
        if n not in never and n not in changed and last.get(n, 0) > DEEP_STALE
    ]
    return waiting_outside, offenders


def test_r5_arrangement_would_fail():
    """Self-check that guardrail (a) has teeth, on a synthetic state
    modeled on the round-5 failure: 50 fresh-row (r5) queries hold the
    whole prefix while 47 never-checked queries wait outside.  Built
    from fabricated names so it holds regardless of how much driver
    evidence the live ledger accumulates."""
    fresh = [f"fresh_{i:03d}" for i in range(PREFIX)]
    unchecked = [f"unchecked_{i:03d}" for i in range(47)]
    arrangement = fresh + unchecked
    last = {n: 5 for n in fresh}  # r5 rows: fresh, not deep-stale
    never = set(unchecked)
    waiting, offenders = _rule_a_violations(arrangement, last, never, set())
    assert waiting and offenders, "guardrail lost its teeth"
    # The rule must also still ACCEPT a lawful arrangement: unchecked
    # queries in the prefix, fresh rows relegated behind them.
    lawful = unchecked + fresh
    waiting, offenders = _rule_a_violations(lawful, last, never, set())
    assert not waiting and not offenders
    # And a deliberately weakened rule input (everything marked
    # changed) must disarm it — proving `changed` is what excuses a
    # fresh row, not an accident of the fixture.
    waiting, offenders = _rule_a_violations(
        arrangement, last, never, set(fresh)
    )
    assert waiting and not offenders
