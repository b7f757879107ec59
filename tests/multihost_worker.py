"""Worker process for the REAL 2-process multihost test (launched by
tests/test_multihost.py, one subprocess per "host").

Each process owns 4 virtual CPU devices; jax.distributed joins them into
one 8-device job. The worker builds ONLY its own hash partitions of the
fact table (host_local_partitions), assembles global arrays with
make_global_table (no host ever holds the whole table), runs the
flagship filter + broadcast-join + partial/exchange/final-agg plan as one
SPMD program, allgathers the sharded result, and checks it against a
locally-computed pandas oracle. Prints MULTIHOST-MATCH on success.

usage: python multihost_worker.py <process_id> <num_processes> <port>
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))  # repo root (PYTHONPATH would shadow the axon plugin)

import jax

PID, NPROC, PORT = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402


def main() -> int:
    from jax.experimental import multihost_utils as MH

    from auron_tpu.block import TableBlock
    from auron_tpu.expr.nodes import col, lit
    from auron_tpu.parallel.multihost import (global_mesh,
                                              host_local_partitions,
                                              init_multihost,
                                              make_global_table)
    from auron_tpu.parallel.partition import HashPartitioning
    from auron_tpu.parallel.spmd import run_plan_spmd
    from auron_tpu.plan.nodes import (Agg, AggCall, Exchange, Filter, Join,
                                      MemoryScan)

    assert init_multihost(f"localhost:{PORT}", NPROC, PID)
    assert jax.process_count() == NPROC, jax.process_count()
    mesh = global_mesh("p")
    n = int(mesh.devices.size)
    assert n == 4 * NPROC
    mine = host_local_partitions(n)
    assert len(mine) == 4
    # host-major contract: host 0 owns partitions 0..3, host 1 owns 4..7
    assert mine == list(range(PID * 4, PID * 4 + 4))

    # both hosts can GENERATE the whole dataset deterministically (stands
    # in for a shared filesystem) but only BUILD their own partitions
    rng = np.random.default_rng(7)
    N = 6000
    fact = pd.DataFrame({
        "k": rng.integers(0, 64, N),
        "v": rng.normal(size=N).round(3),
    })
    dim = pd.DataFrame({"k2": np.arange(64), "grp": np.arange(64) % 7})
    parts = np.array_split(np.arange(N), n)
    cap = 2048
    local = {i: TableBlock.from_pandas(fact.iloc[parts[i]], capacity=cap)
             for i in mine}
    fact_g = make_global_table(mesh, "p", local)
    empty_dim = TableBlock.from_pandas(dim.iloc[:0], capacity=128)
    dim_local = {i: (TableBlock.from_pandas(dim, capacity=128)
                     if i == 0 else empty_dim) for i in mine}
    dim_g = make_global_table(mesh, "p", dim_local)

    partial = Agg(
        Join(Filter(MemoryScan("fact"), col("v") > lit(0.0)),
             MemoryScan("dim"), ("k",), ("k2",), strategy="broadcast",
             out_capacity=cap),
        keys=(("grp", col("grp")),),
        calls=(AggCall("s", "sum", col("v")), AggCall("c", "count_star")),
        mode="partial")
    plan = Agg(Exchange(partial, HashPartitioning(("grp",), n)),
               keys=(("grp", col("grp")),),
               calls=(AggCall("s", "sum", col("v")),
                      AggCall("c", "count_star")), mode="final")

    stacked = run_plan_spmd(plan, mesh, {}, axis="p",
                            stacked_tables={"fact": fact_g, "dim": dim_g})
    # sharded result -> full host arrays on every process
    full = jax.tree.map(lambda a: np.asarray(
        MH.process_allgather(a, tiled=True)), stacked)
    frames = []
    for i in range(n):
        blk = jax.tree.map(lambda a: a[i], full)
        frames.append(blk.to_pandas())
    got = (pd.concat(frames, ignore_index=True)
           .sort_values("grp").reset_index(drop=True))

    w = fact[fact.v > 0].merge(dim, left_on="k", right_on="k2")
    want = (w.groupby("grp").agg(s=("v", "sum"), c=("v", "size"))
            .reset_index().sort_values("grp").reset_index(drop=True))
    assert (got["grp"].to_numpy() == want["grp"].to_numpy()).all()
    assert (got["c"].to_numpy() == want["c"].to_numpy()).all()
    assert np.allclose(got["s"], want["s"], rtol=1e-9)
    print(f"MULTIHOST-MATCH pid={PID} groups={len(got)}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
