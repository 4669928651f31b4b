"""One-shot local CI: strict oracle gate → pytest → bench → plan audit.

Usage: python tools/run_all.py [--skip-bench] [--skip-audit]

Runs each stage as a subprocess (fresh JVM per stage, like the driver
does) and stops at the first failure with a nonzero exit. This is the
exact sequence to run before ending a build session.
"""

from __future__ import annotations

import subprocess
import sys
import time

STAGES = [
    ("strict oracle gate (sf0.01)", [sys.executable, "tools/check_oracle.py", "--strict"]),
    # The ANN recall certificates carry a recall>=bound flag whose
    # margin varies with SF; re-verify the driver-visible hash at sf0.1
    # too so a bound flip can't ship (VERDICT r3 item 6).
    (
        "strict oracle gate (sf0.1, ANN certificates)",
        [
            sys.executable,
            "tools/check_oracle.py",
            "--strict",
            "/root/testdata/sf0.1",
            "ann_lsh_topk",
            "ann_ivf_topk",
        ],
    ),
    ("pytest", [sys.executable, "-m", "pytest", "tests/", "-q"]),
    ("bench (sf0.1)", [sys.executable, "bench.py"]),
    (
        "plan audit",
        [sys.executable, "tools/plan_audit.py", "/root/testdata/sf0.01", "--write", "PLAN_AUDIT.md"],
    ),
]


def main() -> None:
    skip = set()
    if "--skip-bench" in sys.argv:
        skip.add("bench (sf0.1)")
    if "--skip-audit" in sys.argv:
        skip.add("plan audit")
    for name, cmd in STAGES:
        if name in skip:
            print(f"-- {name}: skipped")
            continue
        t0 = time.monotonic()
        print(f"-- {name} ...", flush=True)
        r = subprocess.run(cmd, cwd="/root/repo")
        dt = time.monotonic() - t0
        if r.returncode != 0:
            print(f"-- {name}: FAILED (rc={r.returncode}, {dt:.0f}s)")
            sys.exit(r.returncode)
        print(f"-- {name}: ok ({dt:.0f}s)")
    print("-- all stages green")


if __name__ == "__main__":
    main()
