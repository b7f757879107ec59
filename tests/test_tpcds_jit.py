"""All 103 TPC-DS queries under WHOLE-PLAN jit (round-2 verdict #3).

The reference gates every query in CI (.github/workflows/tpcds.yml:35-60);
round 2 had only ~12 ever compiled. This runs the full runner with
jit=True on the CPU mesh in one subprocess (its own interpreter: 103
compiled whole-query programs + LLVM state exhaust host RAM unless the
jit caches are cleared per query, and a crash must not poison the suite
process). Differential vs the pandas oracles, like the eager suite.

Every query runs through the measured-capacity calibration prepass
(runtime/calibrate.py) exactly as production jit does — so this also
sweeps calibration across every operator shape in the corpus.
"""

import os
import subprocess
import sys

_SCRIPT = r"""
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
import gc
from auron_tpu.tpcds.runner import (QUERIES, generate_cached, make_session,
                                    run_query)
from auron_tpu.plan import builder

tables = generate_cached(0.2, 0, 0.0)
session = make_session(tables, 1)
fails = []
for q in QUERIES:
    try:
        r = run_query(q, session, tables, jit=True)
        if not r["match"]:
            fails.append((q, "MISMATCH"))
    except Exception as e:  # noqa: BLE001 — collect, report all at end
        fails.append((q, f"{type(e).__name__}: {str(e)[:160]}"))
    print(q, "ok" if not (fails and fails[-1][0] == q) else fails[-1][1],
          flush=True)
    builder._JIT_CACHE.clear()   # bound executable/LLVM host memory
    jax.clear_caches()
    gc.collect()
assert not fails, fails
print("ALL-103-JIT-GREEN")
"""


def test_all_103_under_whole_plan_jit():
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    p = subprocess.run([sys.executable, "-c", _SCRIPT], cwd=repo, env=env,
                       capture_output=True, text=True, timeout=5400)
    assert p.returncode == 0, p.stdout[-4000:] + p.stderr[-2000:]
    assert "ALL-103-JIT-GREEN" in p.stdout
