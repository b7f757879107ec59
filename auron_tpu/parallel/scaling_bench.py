"""Scaling-efficiency harness: rows/s at 1 vs N devices (BASELINE >80%).

Runs the shuffled-join + aggregate pipeline (BASELINE config #4 shape) over
meshes of increasing size on whatever devices exist: real TPU chips when a
slice is attached, else the virtual CPU mesh (functional validation only —
CPU "devices" share cores, so CPU efficiency numbers are not meaningful).

    python -m auron_tpu.parallel.scaling_bench --rows 1000000
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def run(rows: int, devices_list=None):
    import jax
    import jax.numpy as jnp
    import pandas as pd
    from jax.sharding import Mesh
    from auron_tpu.block import TableBlock, round_capacity
    from auron_tpu.expr.nodes import col
    from auron_tpu.parallel.partition import HashPartitioning
    from auron_tpu.parallel.spmd import run_plan_spmd
    from auron_tpu.plan import Agg, AggCall, Exchange, Join, MemoryScan

    devs = jax.devices()
    sizes = devices_list or [n for n in (1, 2, 4, 8, 16)
                             if n <= len(devs)]
    rng = np.random.default_rng(0)
    n_dim = 10_000
    fact = pd.DataFrame({
        "k": rng.integers(0, n_dim, rows).astype(np.int32),
        "v": rng.normal(size=rows),
    })
    dim = pd.DataFrame({"k2": np.arange(n_dim, dtype=np.int32),
                        "grp": (np.arange(n_dim) % 64).astype(np.int32)})

    @jax.jit
    def _sync_reduce(out):
        return sum(jnp.sum(l.ravel()[:8].astype(jnp.float32))
                   for l in jax.tree.leaves(out))

    results = []
    base_rate = None
    for n in sizes:
        mesh = Mesh(np.array(devs[:n]), ("p",))
        parts = np.array_split(np.arange(rows), n)
        cap = round_capacity(max(len(p) for p in parts))
        tables = {
            "fact": [TableBlock.from_pandas(fact.iloc[p], capacity=cap)
                     for p in parts],
            "dim": [TableBlock.from_pandas(dim)],
        }
        left = Exchange(MemoryScan("fact"), HashPartitioning(("k",), n))
        right = Exchange(MemoryScan("dim"), HashPartitioning(("k2",), n))
        joined = Join(left, right, ("k",), ("k2",), strategy="partitioned",
                      out_capacity=cap * 4)
        plan = Agg(joined, keys=(("grp", col("grp")),),
                   calls=(AggCall("s", "sum", col("v")),
                          AggCall("c", "count_star")), mode="single")
        out = run_plan_spmd(plan, mesh, tables)
        float(_sync_reduce(out))  # compile + warmup
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = run_plan_spmd(plan, mesh, tables)
            float(_sync_reduce(out))
            ts.append(time.perf_counter() - t0)
        t = float(np.median(ts))
        rate = rows / t
        if base_rate is None:
            base_rate = rate
        eff = rate / (base_rate * n)
        results.append({"devices": n, "wall_s": round(t, 4),
                        "rows_per_s": round(rate, 1),
                        "scaling_efficiency": round(eff, 3)})
        print(json.dumps(results[-1]), flush=True)
    return results


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--rows", type=int, default=1_000_000)
    a = p.parse_args()
    run(a.rows)
