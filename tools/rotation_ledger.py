"""Rotation ledger maintenance (VERDICT r5 item 2).

The driver's correctness gate checks only the FIRST 50 queries of the
registry dict order per round, so the prefix must rotate: queries whose
plan or oracle changed since their last driver row come first, then
never-checked queries, then the longest-unchecked. Round 5 proved the
rotation cannot stay a comment — the written plan was simply not
executed and a full 50-slot gate round re-checked already-green rows.

This tool makes the state machine-readable so `tests/test_rotation.py`
can enforce it:

  python tools/rotation_ledger.py          # report only
  python tools/rotation_ledger.py --write  # refresh tools/rotation_ledger.json

The ledger maps every registered query to
  - ``hash``: sha256 of its Spark plan source (inspect.getsource of the
    registered callable) + its oracle SQL text, recorded WHEN THE
    PREFIX WAS LAST SET;
  - ``last_round``: the newest CORRECTNESS_r*.json containing the query
    at ledger-write time (informational; the test recomputes live).

A query whose CURRENT hash differs from the ledger hash has changed
since the prefix was arranged — the guardrail test then requires it to
sit ahead of every never-checked query in the prefix. Refresh the
ledger ONLY when (re)arranging the prefix, never to silence the test.
"""

from __future__ import annotations

import glob
import hashlib
import inspect
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LEDGER = os.path.join(REPO, "tools", "rotation_ledger.json")


def query_hash(name: str, fn, oracle_sql: str | None) -> str:
    src = inspect.getsource(fn)
    return hashlib.sha256(
        (src + "\n---oracle---\n" + (oracle_sql or "")).encode()
    ).hexdigest()


def last_checked_rounds() -> dict[str, int]:
    last: dict[str, int] = {}
    for p in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", os.path.basename(p)).group(1))
        try:
            rows = json.load(open(p))
        except Exception:
            continue
        for k in rows:
            last[k] = max(last.get(k, 0), rnd)
    return last


def current_state():
    from min_flink_spark.queries import ORACLE, QUERIES

    last = last_checked_rounds()
    state = {}
    for name, fn in QUERIES.items():
        state[name] = {
            "hash": query_hash(name, fn, ORACLE.get(name)),
            "last_round": last.get(name),
        }
    return state


def main() -> None:
    state = current_state()
    if "--write" in sys.argv:
        with open(LEDGER, "w") as fh:
            json.dump(state, fh, indent=1, sort_keys=True)
        print(f"wrote {LEDGER} ({len(state)} queries)")
        return
    old = json.load(open(LEDGER)) if os.path.exists(LEDGER) else {}
    changed = [
        n
        for n, s in state.items()
        if n in old and old[n]["hash"] != s["hash"]
    ]
    never = [n for n, s in state.items() if s["last_round"] is None]
    stale = sorted(
        (n for n, s in state.items() if s["last_round"] is not None),
        key=lambda n: state[n]["last_round"],
    )
    print(f"registered: {len(state)}")
    print(f"changed since ledger: {len(changed)}: {changed}")
    print(f"never driver-checked: {len(never)}")
    print("stale head (oldest 10):", [(n, state[n]["last_round"]) for n in stale[:10]])


if __name__ == "__main__":
    main()
