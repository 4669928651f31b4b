"""Equivalence guard for the staged-replay certificates.

tools/sf1_hard_cert.py re-expresses the four graph/near-dup gate
oracles as stage-materialized DuckDB (the only form evaluable at sf1,
where DuckDB's CTE re-inlining explodes the naive text). The staged
form must stay EQUIVALENT to the decorators as both evolve — this
test runs the tool end-to-end at sf0.001 (subprocess, like the
driver: fresh JVM, ~1 min) and requires 4/4 strict-ok. A drift in
either the decorator SQL or the staged stages fails here instead of
silently weakening the sf1 certificate next round.
"""

import subprocess
import sys


def test_staged_replay_matches_decorators_at_sf0001():
    proc = subprocess.run(
        [sys.executable, "tools/sf1_hard_cert.py", "/root/testdata/sf0.001"],
        capture_output=True,
        text=True,
        timeout=600,
        cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    assert "4/4 strict-ok" in proc.stdout
