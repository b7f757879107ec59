"""SPMD mesh execution == single-host execution.

The reference tests distribution via Spark local mode (multiple partitions,
one JVM; SURVEY.md §4). We test via an 8-virtual-device CPU mesh: the same
plan runs through the partition-list executor and through shard_map with
real all_to_all/all_gather collectives, and rows must match exactly.
"""

import jax
import numpy as np
import pandas as pd
import pytest
from jax.sharding import Mesh

from auron_tpu.expr.nodes import col, lit
from auron_tpu.ops.sort import SortKey
from auron_tpu.parallel.partition import HashPartitioning, SinglePartitioning
from auron_tpu.parallel.spmd import run_plan_spmd, unstack_result
from auron_tpu.plan import (Agg, AggCall, Exchange, Filter, Join, MemoryScan,
                            Project, Session, Sort)


def _mesh():
    devs = np.array(jax.devices()[:8])
    return Mesh(devs, ("p",))


from conftest import sorted_rows as _rows  # noqa: E402


@pytest.fixture
def data(rng):
    n = 4000
    fact = pd.DataFrame({
        "k": rng.integers(0, 100, n),
        "v": rng.normal(size=n).round(3),
        "w": rng.integers(0, 50, n),
    })
    dim = pd.DataFrame({"k2": np.arange(100), "grp": np.arange(100) % 9})
    return fact, dim


def _tables(fact, dim, n_parts=8):
    from auron_tpu.block import TableBlock
    cap = 1024
    parts = np.array_split(np.arange(len(fact)), n_parts)
    fact_blocks = [TableBlock.from_pandas(fact.iloc[i], capacity=cap)
                   for i in parts]
    dim_blocks = [TableBlock.from_pandas(dim, capacity=256)]
    return {"fact": fact_blocks, "dim": dim_blocks}


def test_spmd_exchange_agg(data):
    fact, dim = data
    tables = _tables(fact, dim)
    partial = Agg(MemoryScan("fact"), keys=(("k", col("k")),),
                  calls=(AggCall("s", "sum", col("v")),
                         AggCall("c", "count_star")), mode="partial")
    plan = Agg(Exchange(partial, HashPartitioning(("k",), 8)),
               keys=(("k", col("k")),),
               calls=(AggCall("s", "sum", col("v")),
                      AggCall("c", "count_star")), mode="final")
    stacked = run_plan_spmd(plan, _mesh(), tables)
    out = pd.concat([b.to_pandas() for b in unstack_result(stacked)],
                    ignore_index=True)
    want = fact.groupby("k").agg(s=("v", "sum"), c=("v", "size")).reset_index()
    assert _rows(out) == _rows(want)


def test_spmd_broadcast_join(data):
    fact, dim = data
    # dim must be spread over mesh shards; register as single partition and
    # let pad_partitions create empty shards — all_gather rebuilds the table
    tables = _tables(fact, dim)
    plan = Join(Filter(MemoryScan("fact"), col("v") > lit(0.0)),
                MemoryScan("dim"), ("k",), ("k2",), strategy="broadcast",
                out_capacity=2048)
    stacked = run_plan_spmd(plan, _mesh(), tables)
    out = pd.concat([b.to_pandas() for b in unstack_result(stacked)],
                    ignore_index=True)
    want = fact[fact["v"] > 0].merge(dim, left_on="k", right_on="k2")
    assert _rows(out) == _rows(want)


def test_spmd_partitioned_join(data):
    fact, dim = data
    tables = _tables(fact, dim)
    left = Exchange(MemoryScan("fact"), HashPartitioning(("k",), 8))
    right = Exchange(MemoryScan("dim"), HashPartitioning(("k2",), 8))
    plan = Join(left, right, ("k",), ("k2",), join_type="left",
                strategy="partitioned", out_capacity=8192)
    stacked = run_plan_spmd(plan, _mesh(), tables)
    out = pd.concat([b.to_pandas() for b in unstack_result(stacked)],
                    ignore_index=True)
    want = fact.merge(dim, left_on="k", right_on="k2", how="left")
    assert _rows(out) == _rows(want)


def test_spmd_gather_sort(data):
    fact, dim = data
    tables = _tables(fact, dim)
    plan = Sort(Exchange(MemoryScan("fact"), SinglePartitioning()),
                (SortKey("w"), SortKey("k")), fetch=25)
    stacked = run_plan_spmd(plan, _mesh(), tables)
    out = pd.concat([b.to_pandas() for b in unstack_result(stacked)],
                    ignore_index=True)
    want = fact.sort_values(["w", "k"], kind="stable").head(25)
    np.testing.assert_array_equal(out["w"].to_numpy(), want["w"].to_numpy())


def test_collective_agg_fusion(data):
    """Agg(final) over Exchange(hash same keys) with dense layout merges by
    psum — results must equal the generic shuffle path."""
    from auron_tpu.expr.nodes import col
    fact, dim = data
    tables = _tables(fact, dim)
    partial = Agg(MemoryScan("fact"), keys=(("w", col("w")),),
                  calls=(AggCall("s", "sum", col("v")),
                         AggCall("c", "count_star"),
                         AggCall("mx", "max", col("v")),
                         AggCall("a", "avg", col("v"))),
                  mode="partial", domains=(("w", (0, 50)),))
    final = Agg(Exchange(partial, HashPartitioning(("w",), 8)),
                keys=(("w", col("w")),),
                calls=partial.calls, mode="final", domains=partial.domains)
    stacked = run_plan_spmd(final, _mesh(), tables)
    out = pd.concat([b.to_pandas() for b in unstack_result(stacked)],
                    ignore_index=True)
    want = fact.groupby("w").agg(s=("v", "sum"), c=("v", "size"),
                                 mx=("v", "max"),
                                 a=("v", "mean")).reset_index()
    assert _rows(out) == _rows(want)


def test_chunked_exchange_equivalent(data):
    """EXCHANGE_CHUNKS > 1 must produce identical routing."""
    from auron_tpu import config
    fact, dim = data
    tables = _tables(fact, dim)
    plan = Exchange(MemoryScan("fact"), HashPartitioning(("k",), 8))
    base = run_plan_spmd(plan, _mesh(), tables)
    with config.conf.scoped(**{"auron.exchange.chunks": 4}):
        chunked = run_plan_spmd(plan, _mesh(), tables)
    a = pd.concat([b.to_pandas() for b in unstack_result(base)],
                  ignore_index=True)
    b = pd.concat([x.to_pandas() for x in unstack_result(chunked)],
                  ignore_index=True)
    assert _rows(a) == _rows(b)


def test_overlap_bench_variants_exact():
    """All exchange/overlap formulations produce identical exact results
    (parallel/overlap_bench.py: row all_to_all, chunked, dense+ring)."""
    from auron_tpu.parallel.overlap_bench import run
    out = run(rows=16_000, groups=64, iters=1)
    assert set(out["variants"]) == {"mono", "chunked4", "chunked8", "ring"}
    for v in out["variants"].values():
        assert v["wall_ms"] > 0
