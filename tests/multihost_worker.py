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
       [mode] [rss_root]

mode "rss" (round-4 verdict #6): the SAME flagship partitioned join, but
the inter-host exchange is routed through RssShuffleWriter/read_partition
over shared storage instead of in-program collectives — the reference's
Celeborn/Uniffle decoupled-shuffle path
(shuffle/rss_sort_repartitioner.rs:128, buffered_data.rs:161-202): map
tasks push murmur3-routed compressed blocks, a barrier replaces the
MapStatus commit, reducers pull only the partitions they own.
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


def main_rss(root: str) -> int:
    """Flagship partitioned join, inter-host exchange through RSS.

    Map stage: each host pushes murmur3(42)+pmod-routed compressed
    blocks of ITS OWN fact partitions (RssShuffleWriter) to the shared
    storage; host 0 pushes the dim table partitioned on the join key.
    A global-device barrier stands in for Spark's MapStatus commit.
    Reduce stage: each host pulls only the partitions it owns
    (read_partition), runs join + partial agg per partition with the
    normal executor, and pushes partial STATES to a single-partition
    shuffle; host 0 merges them with a final-mode agg and checks against
    the pandas oracle. No collective ever carries table rows — the
    exchange data plane is entirely the RSS storage, the reference's
    Celeborn/Uniffle role."""
    from jax.experimental import multihost_utils as MH

    from auron_tpu.block import TableBlock
    from auron_tpu.expr.nodes import col, lit
    from auron_tpu.io.rss import (LocalDirStorage, RssShuffleWriter,
                                  read_partition)
    from auron_tpu.parallel.multihost import (global_mesh,
                                              host_local_partitions,
                                              init_multihost)
    from auron_tpu.parallel.partition import (HashPartitioning,
                                              SinglePartitioning)
    from auron_tpu.plan import Session
    from auron_tpu.plan.execute import execute_plan
    from auron_tpu.plan.nodes import Agg, AggCall, Filter, Join, MemoryScan

    assert init_multihost(f"localhost:{PORT}", NPROC, PID)
    mesh = global_mesh("p")
    n = int(mesh.devices.size)
    mine = host_local_partitions(n)
    storage = LocalDirStorage(root)

    rng = np.random.default_rng(7)
    N = 6000
    fact = pd.DataFrame({
        "k": rng.integers(0, 64, N),
        "v": rng.normal(size=N).round(3),
    })
    dim = pd.DataFrame({"k2": np.arange(64), "grp": np.arange(64) % 7})
    parts = np.array_split(np.arange(N), n)
    cap = 2048

    # ---- map stage: push host-local partitions through RSS ----
    for i in mine:
        blk = TableBlock.from_pandas(fact.iloc[parts[i]], capacity=cap)
        w = RssShuffleWriter(storage, "app", 0, map_id=i,
                             partitioning=HashPartitioning(("k",), n))
        assert w.write(blk) > 0
    if PID == 0:
        dw = RssShuffleWriter(storage, "app", 1, map_id=0,
                              partitioning=HashPartitioning(("k2",), n))
        dw.write(TableBlock.from_pandas(dim, capacity=128))
    MH.sync_global_devices("rss-map-commit")  # MapStatus-commit analog

    # ---- reduce stage: pull owned partitions, join + partial agg ----
    partials = []
    for p in mine:
        fb = read_partition(storage, "app", 0, p, capacity=cap)
        db = read_partition(storage, "app", 1, p, capacity=128)
        if fb is None or db is None:
            continue
        s = Session()
        s.register("fact", [fb])
        s.register("dim", [db])
        plan = Agg(
            Join(Filter(MemoryScan("fact"), col("v") > lit(0.0)),
                 MemoryScan("dim"), ("k",), ("k2",), strategy="broadcast",
                 out_capacity=cap),
            keys=(("grp", col("grp")),),
            calls=(AggCall("s", "sum", col("v")),
                   AggCall("c", "count_star")), mode="partial")
        partials.extend(execute_plan(plan, s))
    pw = RssShuffleWriter(storage, "app", 2, map_id=PID,
                          partitioning=SinglePartitioning())
    for b in partials:
        pw.write(b)
    MH.sync_global_devices("rss-reduce-commit")

    if PID == 0:
        allp = read_partition(storage, "app", 2, 0)
        s = Session()
        s.register("partials", [allp])
        final = Agg(MemoryScan("partials"), keys=(("grp", col("grp")),),
                    calls=(AggCall("s", "sum", col("v")),
                           AggCall("c", "count_star")), mode="final")
        got = pd.concat([b.to_pandas() for b in execute_plan(final, s)],
                        ignore_index=True).sort_values("grp") \
            .reset_index(drop=True)
        w = fact[fact.v > 0].merge(dim, left_on="k", right_on="k2")
        want = (w.groupby("grp").agg(s=("v", "sum"), c=("v", "size"))
                .reset_index().sort_values("grp").reset_index(drop=True))
        assert (got["grp"].to_numpy() == want["grp"].to_numpy()).all()
        assert (got["c"].to_numpy() == want["c"].to_numpy()).all()
        assert np.allclose(got["s"], want["s"], rtol=1e-9)
    MH.sync_global_devices("rss-validated")
    print(f"RSS-MULTIHOST-MATCH pid={PID}", flush=True)
    return 0


if __name__ == "__main__":
    mode = sys.argv[4] if len(sys.argv) > 4 else "spmd"
    if mode == "rss":
        sys.exit(main_rss(sys.argv[5]))
    sys.exit(main())
