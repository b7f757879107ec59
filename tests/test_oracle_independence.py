"""The sqlite independence tier, GATED in CI (round-4 verdict #2).

The reference's oracle is itself the gate: every TPC-DS query runs twice
(vanilla Spark vs Auron) and row sets must agree
(/root/reference/dev/auron-it/.../QueryResultComparator.scala:39-106).
Here the independent engine is sqlite3 executing the reference's literal
.sql files, diffed against the pandas oracles — a correlated
misreading of the SQL by the engine+oracle pair (both written by the
same author) cannot pass this tier. Round 4 proved its worth: it caught
q17's stddev-alias quirk and q39b's one-sided cov threshold, both of
which the engine-vs-pandas differential was blind to.

Runs in a subprocess (like the jit gate) at a small sf so the full
103-query sweep stays within suite budget; DIFF anywhere fails the test.
"""

import os
import subprocess
import sys

_SCRIPT = r"""
import sys
from auron_tpu.tpcds.sqlite_oracle import main
rc = main(["--sf", "0.2"])
sys.exit(rc)
"""


def test_sqlite_independence_no_diffs():
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    p = subprocess.run([sys.executable, "-c", _SCRIPT], cwd=repo, env=env,
                       capture_output=True, text=True, timeout=3600)
    tail = "\n".join(p.stdout.splitlines()[-110:])
    assert p.returncode == 0, tail + p.stderr[-1500:]
    assert "diff=0" in p.stdout.splitlines()[-1], tail
    # the tier must actually be covering the corpus, not skipping it
    total = p.stdout.splitlines()[-1]
    match = int(total.split("match=")[1].split()[0])
    assert match >= 85, total
