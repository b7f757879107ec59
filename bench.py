"""Headline benchmark: TPC-DS q03-style join+agg rows/s/chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Mirrors the reference's benchmark methodology (native engine vs the vanilla
JVM engine on the same query, README.md:100-106 => 2.02x): ``vs_baseline``
is the speedup of this engine over the vanilla in-process engine (pandas)
running the identical query on the same host — the same "accelerator vs
baseline engine" ratio Auron reports against Spark.

Workload (BASELINE.json configs #2/#3 blend): fact 8M rows x dim 100k
broadcast hash join + filter + GROUP BY(16) partial/final aggregate + sort.
"""

import json
import time

import numpy as np


def _build(n_fact, n_dim):
    import pandas as pd
    rng = np.random.default_rng(0)
    fact = pd.DataFrame({
        "k": rng.integers(0, n_dim, n_fact).astype(np.int32),
        "v": rng.normal(size=n_fact),
        "w": rng.integers(0, 1000, n_fact).astype(np.int32),
    })
    dim = pd.DataFrame({
        "k2": np.arange(n_dim, dtype=np.int32),
        "grp": (np.arange(n_dim) % 16).astype(np.int32),
    })
    return fact, dim


def _pandas_query(fact, dim):
    f = fact[fact["v"] > -1.0].merge(dim, left_on="k", right_on="k2")
    out = f.groupby("grp").agg(s=("v", "sum"), c=("v", "size"),
                               m=("w", "max")).reset_index()
    return out.sort_values("grp").reset_index(drop=True)


def _ensure_backend_alive(timeout_s: float = 600.0) -> str:
    """The axon tunnel occasionally wedges (device init never returns).
    Probe it in a SUBPROCESS under a watchdog; on a wedge, pin this
    process to CPU before jax initializes any backend, so the bench always
    emits its JSON line (labeled with the backend actually used)."""
    import subprocess
    import sys
    try:
        out = subprocess.run(
            [sys.executable, "-c",
             "import jax, jax.numpy as jnp;"
             "float(jnp.arange(4.0).sum());"
             "print(jax.default_backend())"],
            capture_output=True, text=True, timeout=timeout_s)
        backend = out.stdout.strip().splitlines()[-1] if out.stdout else ""
        if out.returncode == 0 and backend:
            return backend
    except subprocess.TimeoutExpired:
        pass
    import jax
    jax.config.update("jax_platforms", "cpu")
    return "cpu-fallback"


def main():
    import jax
    backend = _ensure_backend_alive()
    from auron_tpu.block import TableBlock, round_capacity
    from auron_tpu.expr.nodes import col, lit
    from auron_tpu.ops.sort import SortKey
    from auron_tpu.parallel.partition import SinglePartitioning
    from auron_tpu.plan import (Agg, AggCall, Exchange, Filter, Join,
                                MemoryScan, Session, Sort, execute_plan)

    n_fact, n_dim = 8_000_000, 100_000
    fact, dim = _build(n_fact, n_dim)

    cap_f = round_capacity(n_fact)
    fact_b = TableBlock.from_pandas(fact, capacity=cap_f)
    dim_b = TableBlock.from_pandas(dim, capacity=round_capacity(n_dim))

    joined = Join(Filter(MemoryScan("fact"), col("v") > lit(-1.0)),
                  MemoryScan("dim"), ("k",), ("k2",), strategy="broadcast",
                  out_capacity=cap_f)
    agg = Agg(joined, keys=(("grp", col("grp")),),
              calls=(AggCall("s", "sum", col("v")),
                     AggCall("c", "count_star"),
                     AggCall("m", "max", col("w"))),
              mode="single")
    plan = Sort(agg, (SortKey("grp"),))

    # plan-time stats (dense join probe + dense aggregation) from the
    # concrete blocks, BEFORE jit freezes everything into tracers
    from auron_tpu.plan.stats import annotate_plan
    stats_s = Session()
    stats_s.register("fact", fact_b)
    stats_s.register("dim", dim_b)
    plan = annotate_plan(plan, stats_s)

    def step(fact_block, dim_block):
        s = Session()
        s.register("fact", fact_block)
        s.register("dim", dim_block)
        return execute_plan(plan, s, annotate=False)[0]

    jitted = jax.jit(step)

    import jax.numpy as jnp

    @jax.jit
    def _sync_reduce(out):
        return sum(jnp.sum(l[:8].astype(jnp.float32))
                   for l in jax.tree.leaves(out))

    def sync(out):
        # force device completion via a host transfer: on the remote-TPU
        # tunnel backend, block_until_ready returns before execution
        # finishes, so fetch a scalar that depends on every output leaf.
        float(_sync_reduce(out))

    out = jitted(fact_b, dim_b)  # compile + warmup
    sync(out)

    # single-query latency: dispatch + device + sync round trip (on the
    # axon tunnel this is dominated by the 50-160ms per-dispatch relay)
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = jitted(fact_b, dim_b)
        sync(out)
        times.append(time.perf_counter() - t0)
    t_latency = float(np.median(times))

    # pipelined throughput: issue K dispatches back-to-back (jax dispatch
    # is async; executions serialize in-order on the device stream) and
    # sync once — the production serving mode, which amortizes host/tunnel
    # dispatch latency the way any query engine amortizes driver RPCs
    K = 10
    t0 = time.perf_counter()
    outs = [jitted(fact_b, dim_b) for _ in range(K)]
    sync(outs[-1])
    t_engine = (time.perf_counter() - t0) / K

    vt = []
    for _ in range(3):
        t0 = time.perf_counter()
        _pandas_query(fact, dim)
        vt.append(time.perf_counter() - t0)
    t_vanilla = min(vt)  # best-of: fair (cache-warm) vanilla baseline

    rows_per_s = n_fact / t_engine
    print(json.dumps({
        "metric": "q3_join_agg_rows_per_s_per_chip",
        "value": round(rows_per_s, 1),
        "unit": "rows/s/chip",
        "latency_s": round(t_latency, 4),
        "vs_baseline": round(t_vanilla / t_engine, 3),
        "backend": backend,
    }))


if __name__ == "__main__":
    main()
