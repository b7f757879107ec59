"""Calibrated selectivity shrink (static-shape AQE, round-3 perf work).

After a selective filter/join, most of a scan-capacity block is dead
mask yet every downstream op still pays full capacity (measured at
sf=500: a 1/1000-selective dimension filter dragged 50M-row buffers
through the whole query). The calibration prepass measures live counts
(runtime/calibrate.py record_live) and the executor compacts into a
right-sized block (ops/selection.py shrink_block). Reference analog:
Arrow's dynamic batch sizes give this for free
(/root/reference/native-engine/datafusion-ext-plans/src/filter_exec.rs).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
import pytest

from auron_tpu.config import conf
from auron_tpu.expr.nodes import col, lit
from auron_tpu.plan import nodes as PN
from auron_tpu.plan.builder import table
from auron_tpu.plan.execute import Session, execute_plan
from auron_tpu.ops.selection import shrink_block
from auron_tpu.block import TableBlock
from auron_tpu.runtime import overflow as OV


def _star(n_fact=4000, n_dim=100, seed=0):
    rng = np.random.default_rng(seed)
    fact = pd.DataFrame({
        "k": rng.integers(0, n_dim, n_fact).astype(np.int64),
        "v": rng.integers(0, 1000, n_fact).astype(np.int64),
    })
    dim = pd.DataFrame({
        "k": np.arange(n_dim, dtype=np.int64),
        "cat": (np.arange(n_dim) % 50).astype(np.int64),
    })
    return fact, dim


def _query(session):
    f = table(session, "fact")
    d = table(session, "dim")
    j = f.join(d, ["k"], ["k"])          # unique build -> probe capacity
    sel = j.filter(col("cat") == lit(3))  # ~1/50 selective
    return sel.groupby("cat").agg(total=("sum", col("v")),
                                  n=("count", col("v")))


def test_shrink_block_exact_and_overflowing():
    b = TableBlock.from_pandas(pd.DataFrame(
        {"x": np.arange(10, dtype=np.int64),
         "s": [f"r{i}" for i in range(10)]}))
    b = b.with_mask(jnp.asarray(
        np.array([0, 1, 0, 0, 1, 1, 0, 0, 0, 1], bool)))
    got = shrink_block(b, 4).to_pandas()
    assert got["x"].tolist() == [1, 4, 5, 9]          # stable order
    assert got["s"].tolist() == ["r1", "r4", "r5", "r9"]
    # undersized shrink records an overflow counter -> regrow verdict
    with OV.collect() as sc:
        shrink_block(b, 2)
    grown = OV.check(sc.meta(), sc.values(), {})
    assert grown and "auron.shrink.capacity.factor" in grown


def test_calibrated_shrink_differential_and_capacity():
    fact, dim = _star()
    session = Session()
    session.register_pandas("fact", fact)
    session.register_pandas("dim", dim)
    frame = _query(session)
    want = frame.collect(jit=False)
    got = frame.collect(jit=True)  # calibration prepass + shrink + jit
    pd.testing.assert_frame_equal(
        got.sort_values("cat").reset_index(drop=True),
        want.sort_values("cat").reset_index(drop=True))
    # oracle
    m = fact.merge(dim, on="k")
    m = m[m["cat"] == 3]
    assert int(got["total"].iloc[0]) == int(m["v"].sum())
    # the calibrated tree must carry a shrink_to on the selective filter
    cal = frame._calibrated
    shrunk = []

    def walk(n, seen=None):
        seen = seen if seen is not None else set()
        if id(n) in seen or not isinstance(n, PN.PlanNode):
            return
        seen.add(id(n))
        if getattr(n, "shrink_to", None) is not None:
            shrunk.append(n)
        import dataclasses
        for f in dataclasses.fields(n):
            v = getattr(n, f.name)
            if isinstance(v, PN.PlanNode):
                walk(v, seen)
            elif isinstance(v, tuple):
                for x in v:
                    if isinstance(x, PN.PlanNode):
                        walk(x, seen)

    walk(cal)
    assert shrunk, "no shrink_to was calibrated onto the selective nodes"
    # measured live ~4000/50 = 80 -> rounded well below the 4096 capacity
    assert min(n.shrink_to for n in shrunk) < 4000


def test_shrink_respects_min_ratio():
    fact, dim = _star()
    session = Session()
    session.register_pandas("fact", fact)
    session.register_pandas("dim", dim)
    old = conf.get("auron.shrink.min.ratio")
    try:
        conf.set("auron.shrink.min.ratio", 10**9)  # never worth it
        frame = _query(session)
        got = frame.collect(jit=True)
        m = fact.merge(dim, on="k")
        m = m[m["cat"] == 3]
        assert int(got["total"].iloc[0]) == int(m["v"].sum())
    finally:
        conf.set("auron.shrink.min.ratio", old)


def test_shrink_multi_partition_spmd_alignment():
    """Shrink capacities are recorded as the max across partitions so
    every partition compacts to the SAME static capacity (exchange lane
    shapes stay aligned)."""
    fact, dim = _star(n_fact=6000)
    session = Session()
    session.register_pandas("fact", fact, num_partitions=4)
    session.register_pandas("dim", dim)
    frame = _query(session)
    want = frame.collect(jit=False)
    got = frame.collect(jit=True)
    pd.testing.assert_frame_equal(
        got.sort_values("cat").reset_index(drop=True),
        want.sort_values("cat").reset_index(drop=True))
