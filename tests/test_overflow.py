"""Never-lose-a-row: deliberately undersize every static capacity and prove
results are still exact (regrow) or a hard error — never silently short.

The reference's analog guarantee is the grow->spill state machine
(/root/reference/native-engine/auron-memmgr/src/lib.rs:308-428): operators
cannot drop data under memory pressure. Here the traced overflow counters +
host regrow (auron_tpu/runtime/overflow.py) provide the same contract.
"""

import jax
import numpy as np
import pandas as pd
import pytest

from auron_tpu import config
from auron_tpu.block import TableBlock
from auron_tpu.plan import MemoryScan, Session
from auron_tpu.plan.builder import Frame, table
from auron_tpu.expr.nodes import col

from conftest import sorted_rows


def _fanout_tables(rng, n=512, dup=6):
    """Probe x build with guaranteed fan-out > 1 (duplicate build keys)."""
    probe = pd.DataFrame({"k": rng.integers(0, 16, n).astype(np.int64),
                          "v": rng.normal(size=n).round(3)})
    build = pd.DataFrame({
        "j": np.repeat(np.arange(16, dtype=np.int64), dup),
        "w": np.arange(16 * dup, dtype=np.int64)})
    return probe, build


def test_join_fanout_regrow_under_jit():
    """Fan-out join under whole-plan jit with default JOIN_OUT_FACTOR=1.0:
    output needs ~6x probe rows; regrow must recover every row."""
    rng = np.random.default_rng(7)
    probe, build = _fanout_tables(rng)
    s = Session()
    s.register_pandas("p", probe)
    s.register_pandas("b", build)
    f = table(s, "p").join(table(s, "b"), ("k",), ("j",))
    got = f.collect(jit=True)
    want = probe.merge(build, left_on="k", right_on="j")
    assert len(got) == len(want)
    assert sorted_rows(got) == sorted_rows(want)


def test_join_overflow_raise_mode():
    rng = np.random.default_rng(8)
    probe, build = _fanout_tables(rng)
    s = Session()
    s.register_pandas("p", probe)
    s.register_pandas("b", build)
    f = table(s, "p").join(table(s, "b"), ("k",), ("j",))
    # calibration would pre-size the join exactly (no overflow to raise):
    # disable it so the traced factor path is what executes
    with config.conf.scoped(auron__overflow__check="raise",
                            auron__jit__calibrate__capacities=False):
        with pytest.raises(RuntimeError, match="overflow"):
            f.collect(jit=True)


def test_collect_list_regrow():
    """max_len far below the true group sizes: regrow grows the plane."""
    rng = np.random.default_rng(9)
    n = 300
    df = pd.DataFrame({"g": rng.integers(0, 3, n).astype(np.int64),
                       "v": np.arange(n, dtype=np.int64)})
    s = Session()
    s.register_pandas("t", df)
    f = table(s, "t").groupby("g").agg(xs=("collect_list", col("v")))
    # AggCall default max_len=64 < ~100 rows per group -> regrow
    (b,) = f.blocks()
    mask = np.asarray(b.row_mask)
    g = np.asarray(b["g"].values)[mask]
    vals = np.asarray(b["xs#vals"].values)[mask]
    lens = np.asarray(b["xs#len"].values)[mask]
    got = {int(gi): sorted(vals[i, :lens[i]].tolist())
           for i, gi in enumerate(g)}
    want = {int(gi): sorted(vs) for gi, vs in df.groupby("g")["v"]}
    assert got == want


def test_generate_explode_regrow():
    """Explode with output capacity forced tiny via the config factor."""
    from auron_tpu.plan import Generate
    from auron_tpu.plan.execute import execute_plan
    rng = np.random.default_rng(10)
    n = 64
    lens = rng.integers(0, 8, n)
    df = pd.DataFrame({"id": np.arange(n, dtype=np.int64)})
    b = TableBlock.from_pandas(df)
    import jax.numpy as jnp
    from auron_tpu.block import Column
    from auron_tpu.dtypes import INT64
    vals = np.zeros((b.capacity, 8), np.int64)
    for i in range(n):
        vals[i, :lens[i]] = rng.integers(0, 100, lens[i])
    lcol = np.zeros(b.capacity, np.int64)
    lcol[:n] = lens
    b = b.with_columns({
        "a#vals": Column(jnp.asarray(vals), None, INT64, None),
        "a#len": Column.of(jnp.asarray(lcol), INT64)})
    s = Session()
    s.register("t", b)
    with config.conf.scoped(auron__generate__output__capacity__factor=0.05):
        f = table(s, "t")
        from auron_tpu.plan import nodes as PN
        plan = PN.Generate(f.plan, "a", kind="explode")
        got = pd.concat([x.to_pandas() for x in Frame(s, plan, 1).blocks()],
                        ignore_index=True)
    rows = []
    for i in range(n):
        for j in range(lens[i]):
            rows.append((i, vals[i, j]))
    want = pd.DataFrame(rows, columns=["id", "col"])
    assert len(got) == len(want)
    assert sorted_rows(got[["id", "col"]]) == sorted_rows(want)


def test_exchange_pair_lane_regrow_spmd():
    """Tiny pair slack + a skewed key WITHOUT the skew handler: the exchange
    lanes overflow and the SPMD runner must regrow, conserving every row."""
    from jax.sharding import Mesh
    from auron_tpu.plan import Agg, AggCall, Exchange
    from auron_tpu.parallel.partition import HashPartitioning
    from auron_tpu.parallel.spmd import run_plan_spmd, unstack_result
    rng = np.random.default_rng(11)
    n = 2048
    hot = rng.random(n) < 0.7
    keys = np.where(hot, 5, rng.integers(0, 64, n))
    fact = pd.DataFrame({"k": keys.astype(np.int32),
                         "v": np.ones(n, np.int64)})
    parts = np.array_split(np.arange(n), 8)
    tables = {"fact": [TableBlock.from_pandas(fact.iloc[i], capacity=256)
                       for i in parts]}
    mesh = Mesh(np.array(jax.devices()[:8]), ("p",))
    plan = Agg(Exchange(MemoryScan("fact"), HashPartitioning(("k",), 8)),
               (("k", col("k")),), (AggCall("c", "count_star"),),
               mode="single")
    with config.conf.scoped(auron__exchange__pair__slack=0.5):
        stacked = run_plan_spmd(plan, mesh, tables)
    got = pd.concat([b.to_pandas() for b in unstack_result(stacked)],
                    ignore_index=True)
    want = fact.groupby("k").size().rename("c").reset_index()
    assert sorted_rows(got) == sorted_rows(want)


def test_skew_heavy_block_regrow():
    """Skewed join with the heavy side-block capacity forced tiny."""
    from jax.sharding import Mesh
    from auron_tpu.plan import Join
    from auron_tpu.parallel.spmd import run_plan_spmd, unstack_result
    rng = np.random.default_rng(12)
    n = 1024
    hot = rng.random(n) < 0.6
    keys = np.where(hot, 3, rng.integers(0, 64, n))
    fact = pd.DataFrame({"k": keys.astype(np.int32),
                         "v": rng.normal(size=n).round(3)})
    # build side where the heavy key has MANY rows (stress the side-block)
    bkeys = np.concatenate([np.full(200, 3), np.arange(64)])
    dim = pd.DataFrame({"j": bkeys.astype(np.int32),
                        "w": np.arange(len(bkeys), dtype=np.int32)})
    parts = np.array_split(np.arange(n), 8)
    dparts = np.array_split(np.arange(len(dim)), 8)
    tables = {"fact": [TableBlock.from_pandas(fact.iloc[i], capacity=128)
                       for i in parts],
              "dim": [TableBlock.from_pandas(dim.iloc[i], capacity=64)
                      for i in dparts]}
    mesh = Mesh(np.array(jax.devices()[:8]), ("p",))
    plan = Join(MemoryScan("fact"), MemoryScan("dim"), ("k",), ("j",),
                join_type="inner", strategy="skewed", out_capacity=32768)
    with config.conf.scoped(auron__skew__heavy__capacity__factor=0.01):
        stacked = run_plan_spmd(plan, mesh, tables)
    got = pd.concat([b.to_pandas() for b in unstack_result(stacked)],
                    ignore_index=True)
    want = fact.merge(dim, left_on="k", right_on="j")
    assert len(got) == len(want)
    assert sorted_rows(got) == sorted_rows(want)


def test_broadcast_build_outer_multi_partition_correct():
    """ADVICE high fix: full outer join with a multi-partition probe side
    must not duplicate or fabricate build-side rows."""
    left = pd.DataFrame({"k": np.array([1, 2, 3, 4, 5], np.int64),
                         "a": np.arange(5, dtype=np.int64)})
    right = pd.DataFrame({"j": np.array([3, 4, 5, 6, 7], np.int64),
                          "b": np.arange(5, dtype=np.int64) * 10})
    s = Session()
    s.register_pandas("l", left, num_partitions=2)
    s.register_pandas("r", right)
    f = table(s, "l").join(table(s, "r"), ("k",), ("j",), how="full")
    got = f.collect()
    want = left.merge(right, left_on="k", right_on="j", how="outer")
    assert len(got) == len(want) == 7
    assert sorted_rows(got) == sorted_rows(want)


def test_null_aware_anti_multi_partition():
    """ADVICE medium fix: NOT IN with build-side NULLs must suppress every
    probe partition, not just the one the NULL hashed to."""
    left = pd.DataFrame({"k": np.arange(8, dtype=np.float64)})
    right = pd.DataFrame({"j": np.array([1.0, 2.0, np.nan])})
    s = Session()
    s.register_pandas("l", left, num_partitions=4)
    s.register_pandas("r", right, num_partitions=2)
    f = table(s, "l").join(table(s, "r"), ("k",), ("j",), how="left_anti",
                           null_aware=True)
    got = f.collect()
    # x NOT IN (1, 2, NULL) is never true
    assert len(got) == 0


def test_regrow_power_of_two_buckets():
    """Regrown knobs walk a cur*2^k ladder so repeat overflows reuse
    compiled shapes (round-2 verdict weak #7)."""
    from auron_tpu import config
    from auron_tpu.runtime.overflow import check

    base = float(config.conf.get("auron.join.output.capacity.factor"))
    # needed 1.3x capacity -> ratio*pad ~1.37 -> rounds UP to 2x
    new = check([("join", 100)], [130], {})
    assert new["auron.join.output.capacity.factor"] == base * 2
    # a second overflow from the regrown state doubles again (4x base)
    new2 = check([("join", 200)], [250], new)
    assert new2["auron.join.output.capacity.factor"] == base * 4
    # a huge overflow jumps several buckets at once, still a power of two
    new3 = check([("join", 100)], [900], {})
    assert new3["auron.join.output.capacity.factor"] == base * 16


def test_jit_calibration_measured_capacities():
    """Measured-capacity calibration (runtime/calibrate.py): a join CHAIN
    under whole-plan jit gets each expansion sized from the eager prepass
    measurement, not probe*factor compounding — and results stay exact."""
    rng = np.random.default_rng(11)
    probe, build = _fanout_tables(rng)
    s = Session()
    s.register_pandas("p", probe)
    s.register_pandas("b", build)
    s.register_pandas("b2", build.rename(columns={"j": "j2", "w": "w2"}))
    f = (table(s, "p")
         .join(table(s, "b"), ("k",), ("j",))
         .join(table(s, "b2"), ("k",), ("j2",)))
    got = f.collect(jit=True)
    want = (probe.merge(build, left_on="k", right_on="j")
            .merge(build.rename(columns={"j": "j2", "w": "w2"}),
                   left_on="k", right_on="j2"))
    assert sorted_rows(got) == sorted_rows(want)
    # the calibrated tree carries measured out_capacity hints on each join
    from auron_tpu.plan import nodes as PN
    cal = f._calibrated
    assert cal is not None

    def joins(n, acc):
        import dataclasses
        if isinstance(n, PN.Join):
            acc.append(n)
        for fld in dataclasses.fields(n):
            v = getattr(n, fld.name)
            if isinstance(v, PN.PlanNode):
                joins(v, acc)
            elif isinstance(v, tuple):
                for x in v:
                    if isinstance(x, PN.PlanNode):
                        joins(x, acc)
        return acc

    js = joins(cal, [])
    assert js and all(j.out_capacity is not None for j in js)
    # measured capacity is tight: within one rounding step of true size
    from auron_tpu.block import round_capacity
    assert max(j.out_capacity for j in js) <= round_capacity(len(want))


def test_jit_calibration_sampled_prepass():
    """Sampled calibration (auron.jit.calibrate.sample.rows): large tables
    enter the prepass as a row sample and the measured capacities scale
    back up by the shrink ratio — results stay exact (regrow corrects any
    undershoot), hints stay O(true size) not probe*factor compounding."""
    rng = np.random.default_rng(7)
    n = 4096
    probe = pd.DataFrame({"k": rng.integers(0, 16, n).astype(np.int64),
                          "v": rng.normal(size=n).round(3)})
    build = pd.DataFrame({
        "j": np.repeat(np.arange(16, dtype=np.int64), 4),
        "w": np.arange(64, dtype=np.int64)})
    s = Session()
    s.register_pandas("p", probe)
    s.register_pandas("b", build)
    f = (table(s, "p").join(table(s, "b"), ("k",), ("j",))
         .groupby("k").agg(sw=("sum", col("w"))))
    with config.conf.scoped_overrides(
            {"auron.jit.calibrate.sample.rows": 512}):
        got = f.collect(jit=True)
    want = (probe.merge(build, left_on="k", right_on="j")
            .groupby("k", as_index=False)["w"].sum()
            .rename(columns={"w": "sw"}))
    assert sorted_rows(got) == sorted_rows(want)
    # the shadow sampled the probe table (4096 > 512) and recorded ratio
    shadow = s._host_shadow
    assert shadow._sample_ratio >= 4096 / 512
    assert sum(int(b.row_mask.shape[0])
               for b in shadow.tables["p"]) <= 1024
    # small build table stays whole
    assert sum(int(np.asarray(b.row_mask).sum())
               for b in shadow.tables["b"]) == 64
    # the calibrated join hint is scaled-sample-measured: bounded by
    # ratio * sample-measured rows, far under probe*fanout compounding
    import dataclasses
    from auron_tpu.plan import nodes as PN

    def find_join(node):
        if isinstance(node, PN.Join):
            return node
        for fld in dataclasses.fields(node):
            v = getattr(node, fld.name)
            if isinstance(v, PN.PlanNode):
                j = find_join(v)
                if j is not None:
                    return j
        return None

    j = find_join(f._calibrated)
    assert j is not None and j.out_capacity is not None
    true_out = len(probe) * 4
    assert true_out <= j.out_capacity <= true_out * 8
